"""ClickHouse external-dictionary analog (``CREATE DICTIONARY`` +
``dictGet``/``dictGetOrDefault``/``dictGetOrNull``/``dictHas``).

A CH dictionary is an in-RAM hash map over a small dimension, consulted
per row from inside any expression. The Spark-first analog depends on
size, and this module implements the small end EXPRESSION-level: the
dictionary relation is collected once (bounded — see the cell cap) and
each attribute becomes an inlined SQL-UDF literal map
``__dict_<name>_<attr>(key)`` — Catalyst folds the map literal, so a
lookup costs one ``element_at`` against a broadcast-identical constant,
works in WHERE/GROUP BY/JOIN keys alike, and never schedules a join.
Beyond the cap the right plan is a broadcast JOIN (tables.load_dim +
c1_inner_equi), and registration raises saying exactly that — the same
size-dispatch discipline as plans/dispatch.py.

CH semantics kept:
- ``dictGet`` on a missing key returns the attribute's DEFAULT (the
  declared ``DEFAULT`` in the attribute clause, else the CH type zero:
  '' / 0 / epoch), never NULL.
- ``dictGetOrDefault`` takes the per-call fallback.
- ``dictGetOrNull`` surfaces the miss as NULL.
- ``dictHas`` is a boolean key probe.
- typed forms (``dictGetString``, ``dictGetInt64``, ...) resolve
  against the declared attribute type and raise on mismatch.

Registration is DDL-text-first (the pasted ``CREATE DICTIONARY``
statement), with the caller resolving the SOURCE table to a DataFrame —
the same caller-owns-IO contract as ch_mutation. Metadata (names,
attr types, defaults) lives module-global so the pure-text translation
layer can rewrite calls; the SQL UDFs themselves are per-session.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

# dictionary name -> {"key": col, "key_type": spark_ty,
#                     "attrs": {attr: (spark_ty, default_sql)}}
_DICTIONARIES: dict[str, dict] = {}

# CH attribute type -> (spark type, CH zero-default SQL literal)
_CH_TYPES: dict[str, tuple[str, str]] = {
    "String": ("STRING", "''"),
    "UInt8": ("SMALLINT", "CAST(0 AS SMALLINT)"),
    "UInt16": ("INT", "0"),
    "UInt32": ("BIGINT", "CAST(0 AS BIGINT)"),
    "UInt64": ("BIGINT", "CAST(0 AS BIGINT)"),
    "Int8": ("TINYINT", "CAST(0 AS TINYINT)"),
    "Int16": ("SMALLINT", "CAST(0 AS SMALLINT)"),
    "Int32": ("INT", "0"),
    "Int64": ("BIGINT", "CAST(0 AS BIGINT)"),
    "Float32": ("FLOAT", "CAST(0.0 AS FLOAT)"),
    "Float64": ("DOUBLE", "0.0D"),
    "Date": ("DATE", "DATE '1970-01-01'"),
    "DateTime": ("TIMESTAMP", "timestamp_seconds(0)"),
}

# inlined-literal-map budget: |rows| x |attrs| cells. A CH dictionary
# is a small dim by design; past this the plan bloats and a broadcast
# join is strictly better.
MAX_CELLS = 100_000

_DDL_RE = re.compile(
    r"^\s*CREATE\s+DICTIONARY\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][\w]*)\s*\((?P<cols>.*?)\)\s*"
    r"PRIMARY\s+KEY\s+"
    r"(?P<key>[A-Za-z_][\w]*(?:\s*,\s*[A-Za-z_][\w]*)*)",
    re.IGNORECASE | re.DOTALL,
)

_ATTR_RE = re.compile(
    r"^(?P<col>[A-Za-z_][\w]*)\s+(?P<ty>[A-Za-z_][\w]*)"
    r"(?:\s+DEFAULT\s+(?P<default>.+))?$",
    re.IGNORECASE | re.DOTALL,
)


def _split_cols(cols: str) -> list[str]:
    """Split the column clause on top-level commas (defaults may carry
    parenthesized expressions)."""
    out, depth, start = [], 0, 0
    in_str = False
    for i, ch in enumerate(cols):
        if in_str:
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
        elif ch in "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(cols[start:i].strip())
            start = i + 1
    tail = cols[start:].strip()
    if tail:
        out.append(tail)
    return out


def _sql_literal(v, spark_ty: str) -> str:
    if v is None:
        return f"CAST(NULL AS {spark_ty})"
    if spark_ty == "STRING":
        # Spark's default parser interprets backslash escapes inside
        # string literals — escape the backslash itself (same rule as
        # chdialect._param_literal) or dictionary values containing
        # one corrupt silently
        s = str(v).replace("\\", "\\\\").replace("'", "''")
        return f"'{s}'"
    if spark_ty == "DATE":
        return f"DATE '{v}'"
    if spark_ty == "TIMESTAMP":
        return f"TIMESTAMP '{v}'"
    if spark_ty in ("FLOAT", "DOUBLE"):
        return f"CAST({v!r} AS {spark_ty})"
    return f"CAST({v} AS {spark_ty})"


def register_dictionary(
    spark: "SparkSession", ddl: str, source: "DataFrame"
) -> str:
    """Parse CH ``CREATE DICTIONARY`` text and register the lookup
    functions on ``spark``. Returns the dictionary name.

    ``source`` is the resolved SOURCE relation (caller-owned IO, the
    ch_mutation contract); only the declared key + attribute columns
    are read from it. LAYOUT/LIFETIME/SOURCE clauses parse-and-ignore:
    every layout is a hash map here, and refresh is re-registration
    (idempotent CREATE OR REPLACE)."""
    from mysql_to_clickhouse_spark.functions.chdialect import (
        _strip_sql_comments,
    )

    text = _strip_sql_comments(ddl).strip().rstrip(";")
    m = _DDL_RE.match(text)
    if m is None:
        raise ValueError(
            "not a CREATE DICTIONARY statement (expected CREATE "
            "DICTIONARY <name> (col Type [DEFAULT v], ...) PRIMARY "
            "KEY <col> ...)"
        )
    name = m.group("name")
    key_names = [k.strip() for k in m.group("key").split(",")]
    attrs: dict[str, tuple[str, str]] = {}
    key_tys: dict[str, str] = {}
    for col_txt in _split_cols(m.group("cols")):
        am = _ATTR_RE.match(col_txt)
        if am is None:
            raise ValueError(f"unparseable dictionary column: {col_txt!r}")
        col, ch_ty = am.group("col"), am.group("ty")
        if ch_ty not in _CH_TYPES:
            raise ValueError(
                f"dictionary column {col}: unsupported CH type "
                f"{ch_ty!r} (supported: {sorted(_CH_TYPES)})"
            )
        spark_ty, zero = _CH_TYPES[ch_ty]
        if col in key_names:
            key_tys[col] = spark_ty
            continue
        default_sql = am.group("default")
        if default_sql is None:
            default_sql = zero
        attrs[col] = (spark_ty, default_sql.strip())
    missing_keys = [k for k in key_names if k not in key_tys]
    if missing_keys:
        raise ValueError(
            f"PRIMARY KEY column(s) {missing_keys} not among the "
            f"declared columns"
        )
    if not attrs:
        raise ValueError("dictionary declares no attribute columns")
    key_types = [key_tys[k] for k in key_names]

    cols = [*key_names, *attrs]
    rows = source.select(*cols).limit(MAX_CELLS + 1).collect()
    if len(rows) * len(attrs) > MAX_CELLS:
        raise ValueError(
            f"dictionary {name}: {len(rows)} rows x {len(attrs)} attrs "
            f"exceeds the {MAX_CELLS}-cell inlined-map budget — at this "
            f"size use the broadcast dimension join instead "
            f"(tables.load_dim + a plain equi-join; c1_inner_equi is "
            f"the operator model)"
        )

    # key rendering: single key -> plain scalar map; composite key ->
    # named_struct map (identical field names on literal and probe
    # sides — struct equality in Spark is name-sensitive)
    params = ", ".join(
        f"k{i} {ty}" for i, ty in enumerate(key_types)
    )

    def _key_literal(r) -> str:
        if len(key_names) == 1:
            return _sql_literal(r[key_names[0]], key_types[0])
        parts = ", ".join(
            f"'f{i}', {_sql_literal(r[k], key_types[i])}"
            for i, k in enumerate(key_names)
        )
        return f"named_struct({parts})"

    if len(key_names) == 1:
        probe = f"CAST(k0 AS {key_types[0]})"
    else:
        probe = "named_struct(" + ", ".join(
            f"'f{i}', CAST(k{i} AS {key_types[i]})"
            for i in range(len(key_names))
        ) + ")"

    keyed_rows = [
        r for r in rows if all(r[k] is not None for k in key_names)
    ]
    # Spark's map() literal THROWS on duplicate keys at runtime
    # (spark.sql.mapKeyDedupPolicy=EXCEPTION by default) — dedupe here,
    # last occurrence wins (the upsert reading of a repeated source
    # key; r12 ADVICE carried item). Deterministic: source order.
    by_key = {tuple(r[k] for k in key_names): r for r in keyed_rows}
    keyed_rows = list(by_key.values())
    for attr, (spark_ty, _default) in attrs.items():
        entries = [
            f"{_key_literal(r)}, {_sql_literal(r[attr], spark_ty)}"
            for r in keyed_rows
        ]
        body = (
            f"element_at(map({', '.join(entries)}), {probe})"
            if entries
            else f"CAST(NULL AS {spark_ty})"
        )
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION "
            f"`__dict_{name}_{attr}`({params}) RETURNS {spark_ty} "
            f"RETURN {body}"
        )
    keys = ", ".join(_key_literal(r) for r in keyed_rows)
    has_body = (
        f"array_contains(array({keys}), {probe})" if keys else "false"
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION `__dict_{name}_has`"
        f"({params}) RETURNS BOOLEAN RETURN coalesce({has_body}, false)"
    )
    _DICTIONARIES[name] = {
        "key": key_names,
        "key_type": key_types,
        "attrs": attrs,
    }
    return name


def drop_dictionary(name: str) -> None:
    """Forget a dictionary's translation metadata (the session temp
    functions die with the session)."""
    _DICTIONARIES.pop(name, None)


def dictionary_meta(name: str) -> dict | None:
    return _DICTIONARIES.get(name)


# typed dictGet variants -> required CH type family (None = any)
TYPED_GETS: dict[str, tuple[str, ...] | None] = {
    "dictGet": None,
    "dictGetString": ("STRING",),
    "dictGetInt8": ("TINYINT",),
    "dictGetInt16": ("SMALLINT",),
    "dictGetInt32": ("INT",),
    "dictGetInt64": ("BIGINT",),
    "dictGetUInt64": ("BIGINT",),
    "dictGetFloat32": ("FLOAT",),
    "dictGetFloat64": ("DOUBLE",),
    "dictGetDate": ("DATE",),
    "dictGetDateTime": ("TIMESTAMP",),
}


def _key_call_args(word: str, name: str, meta: dict, key_arg: str) -> str:
    """Render the lookup function's argument list from the CH key
    expression: scalar for single-key dictionaries, a ``(k1, k2)``
    tuple (or ``tuple(..)``/``struct(..)`` call — the recursive
    function pass already renamed tuple→struct) for composite keys."""
    n = len(meta["key"])
    if n == 1:
        return f"(({key_arg}))"
    t = key_arg.strip()
    low = t.lower()
    if low.startswith("struct(") and t.endswith(")"):
        inner = t[7:-1]
    elif t.startswith("(") and t.endswith(")"):
        inner = t[1:-1]
    else:
        raise ValueError(
            f"{word}: dictionary {name!r} has a {n}-part key — pass a "
            f"tuple: {word}('{name}', ..., (k1, k2))"
        )
    parts = _split_cols(inner)
    if len(parts) != n:
        raise ValueError(
            f"{word}: dictionary {name!r} key needs {n} parts, the "
            f"tuple has {len(parts)}"
        )
    return "(" + ", ".join(f"({p})" for p in parts) + ")"


def translate_dict_call(word: str, args: list[str]) -> str:
    """Rewrite a dictGet-family CALL (literal dictionary/attribute
    names) onto the registered lookup functions. Raises ValueError
    with the broadcast-join guidance when the dictionary has not been
    registered — the pre-r12 guided error, now the fallback."""
    if word == "dictHas":
        if len(args) != 2:
            raise ValueError("dictHas expects ('dict', key)")
        name = args[0].strip().strip("'\"")
        meta = _DICTIONARIES.get(name)
        if meta is None:
            raise ValueError(
                f"dictHas: no dictionary {name!r} registered "
                f"(functions/chdict.register_dictionary); at dimension "
                f"scale use a LEFT SEMI join (c4_semi) against "
                f"tables.load_dim"
            )
        call = _key_call_args(word, name, meta, args[1])
        return f"`__dict_{name}_has`{call}"
    want_default = word == "dictGetOrDefault"
    want_null = word == "dictGetOrNull"
    base = "dictGet" if (want_default or want_null) else word
    expected = TYPED_GETS.get(base)
    n_args = 4 if want_default else 3
    if len(args) != n_args:
        raise ValueError(
            f"{word} expects ('dict', 'attr', key"
            + (", default)" if want_default else ")")
        )
    name = args[0].strip().strip("'\"")
    attr = args[1].strip().strip("'\"")
    meta = _DICTIONARIES.get(name)
    if meta is None:
        raise ValueError(
            f"{word}: no dictionary {name!r} registered "
            f"(functions/chdict.register_dictionary); at dimension "
            f"scale use the broadcast dimension join — tables.load_dim "
            f"+ c1_inner_equi, or LEFT join + coalesce for defaults"
        )
    if attr not in meta["attrs"]:
        raise ValueError(
            f"{word}: dictionary {name!r} has no attribute {attr!r} "
            f"(has: {sorted(meta['attrs'])})"
        )
    spark_ty, default_sql = meta["attrs"][attr]
    if expected is not None and spark_ty not in expected:
        raise ValueError(
            f"{word}: attribute {attr!r} is {spark_ty}, not "
            f"{'/'.join(expected)}"
        )
    lookup = (
        f"`__dict_{name}_{attr}`"
        f"{_key_call_args(word, name, meta, args[2])}"
    )
    if want_null:
        return lookup
    if want_default:
        return f"coalesce({lookup}, ({args[3]}))"
    return f"coalesce({lookup}, {default_sql})"
