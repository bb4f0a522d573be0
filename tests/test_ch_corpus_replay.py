"""CH-grammar corpus replay (r11, VERDICT #4): every registered
ClickHouse statement text (the ``_S*_CH_SQL`` constants the s13-s23
operators run verbatim) is replayed through ``ch_sql`` under seeded
SEMANTICS-PRESERVING lexical permutations — keyword case flips,
whitespace runs/newlines, block/line comment injection, trailing
semicolons — and each permuted text must produce the frame the
pristine text produces.

Why this axis exists: the only wrong-answer bug class of rounds 8-10
lived in the LEXICAL rewriter (comma-join FINAL), and the fuzz
generators always emit one canonical spelling. Real users paste
queries with arbitrary case, line breaks and comments; a rewriter
regex that anchors on a single space or an exact keyword case would
pass every generator query and still corrupt a pasted one. The
permuter is quote-aware: single-quoted literals (including ''
escapes) are never touched.
"""

from __future__ import annotations

import random
import re

import pytest

from mysql_to_clickhouse_spark.verify import compare_frames
from tests.conftest import TEST_SF_DIR

SEED = 20260816
PERMS_PER_TEXT = 4

# Reserved words safe to case-flip: CH treats keywords case-
# insensitively, while FUNCTION names (countIf, toInt64, ...) are
# case-SENSITIVE — so only grammar words appear here, and only as
# whole tokens outside string literals.
_KEYWORDS = (
    "SELECT", "FROM", "WHERE", "GROUP", "ORDER", "BY", "HAVING",
    "LIMIT", "AS", "AND", "OR", "NOT", "ON", "JOIN", "LEFT", "INNER",
    "WITH", "TOTALS", "FINAL", "SAMPLE", "PREWHERE", "ARRAY", "DESC",
    "ASC", "CASE", "WHEN", "THEN", "ELSE", "END", "IN", "BETWEEN",
    "IS", "NULL", "ANY", "ALL", "USING", "DISTINCT", "OFFSET",
)
_KW_RE = re.compile(
    r"\b(" + "|".join(_KEYWORDS) + r")\b", flags=re.IGNORECASE
)
# split into quoted/unquoted segments; '' inside a literal stays inside
_QUOTE_RE = re.compile(r"('(?:[^']|'')*')")


def _map_unquoted(text: str, fn) -> str:
    """Apply ``fn`` to the segments of ``text`` OUTSIDE single-quoted
    string literals."""
    parts = _QUOTE_RE.split(text)
    return "".join(
        p if i % 2 else fn(p) for i, p in enumerate(parts)
    )


def _flip_keyword_case(text: str, rng: random.Random) -> str:
    def seg(s: str) -> str:
        def flip(m: re.Match) -> str:
            w = m.group(0)
            pick = rng.random()
            if pick < 0.4:
                return w.lower()
            if pick < 0.7:
                return w.upper()
            return w.capitalize()

        return _KW_RE.sub(flip, s)

    return _map_unquoted(text, seg)


def _mangle_whitespace(text: str, rng: random.Random) -> str:
    def seg(s: str) -> str:
        out = []
        for ch in s:
            if ch == " " and rng.random() < 0.25:
                out.append(rng.choice(["  ", "\t", "\n", " \n  ", "   "]))
            else:
                out.append(ch)
        return "".join(out)

    return _map_unquoted(text, seg)


def _inject_comments(text: str, rng: random.Random) -> str:
    """Drop a block comment into a few random inter-token gaps."""

    def seg(s: str) -> str:
        gaps = [m.start() for m in re.finditer(r" ", s)]
        if not gaps:
            return s
        chosen = sorted(
            rng.sample(gaps, min(len(gaps), rng.randint(1, 3))),
            reverse=True,
        )
        for g in chosen:
            noise = rng.choice(
                [
                    "/* hint */",
                    "/*x*/",
                    "-- trailing\n",
                    "/* a b */",
                    # quote-bearing payloads: the r11 stripper corrupted
                    # statements when an apostrophe appeared inside a
                    # comment (phantom string literal) — keep these in
                    # the pool so that bug class can't ship green again
                    "/* it's */",
                    "-- don't\n",
                    "/* o'brien's -- nested */",
                    "# can't\n",
                    "/* \"q\" `b` */",
                ]
            )
            if noise.startswith(("--", "#")):
                s = s[:g] + " " + noise + s[g + 1:]
            else:
                s = s[:g] + " " + noise + " " + s[g + 1:]
        return s

    return _map_unquoted(text, seg)


# Fixture column names safe to identifier-quote: CH treats `col` and
# "col" as the same identifier as bare col (quoting is case-preserving
# and these are already exact-case). Whole unqualified tokens only.
_QUOTABLE_IDENTS = (
    "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
    "l_discount", "l_returnflag", "l_quantity", "o_orderkey",
    "o_orderdate", "o_orderstatus", "o_custkey", "o_totalprice",
    "user_id", "event_type", "event_id", "props", "doc_id",
    "n_chars",
)
_IDENT_RE = re.compile(
    r"(?<![\w.`\"])(" + "|".join(_QUOTABLE_IDENTS) + r")(?![\w.])"
)


def _quote_identifiers(text: str, rng: random.Random) -> str:
    """Wrap a few fixture-column references in CH identifier quotes —
    backticks or ANSI double quotes (r12: the translator must map
    "col" to a Spark backtick identifier; Spark's default parser
    would read it as a STRING literal and silently constant-fold the
    column away)."""

    def seg(s: str) -> str:
        def wrap(m: re.Match) -> str:
            if rng.random() < 0.6:
                return m.group(0)
            q = rng.choice(["`", '"'])
            return f"{q}{m.group(1)}{q}"

        return _IDENT_RE.sub(wrap, s)

    return _map_unquoted(text, seg)


def _permute(text: str, rng: random.Random) -> str:
    out = text
    if rng.random() < 0.8:
        out = _flip_keyword_case(out, rng)
    if rng.random() < 0.5:
        out = _quote_identifiers(out, rng)
    if rng.random() < 0.8:
        out = _mangle_whitespace(out, rng)
    if rng.random() < 0.6:
        out = _inject_comments(out, rng)
    if rng.random() < 0.4:
        out = out.rstrip() + rng.choice([";", " ;", ";\n"])
    return out


# r12 additions (VERDICT #5): shapes the s-family texts don't reach —
# FINAL / SAMPLE / ARRAY JOIN / ANY JOIN applied to or inside
# SUBQUERIES, double-quoted identifiers, and clause combinations.
_EXTRA_TEXTS = {
    "x_final_subquery_join": """
SELECT e.user_id, count() AS c
FROM (SELECT * FROM events FINAL WHERE value > 0) AS e
GROUP BY e.user_id ORDER BY e.user_id LIMIT 50
""",
    "x_array_join_subquery": """
SELECT d, s FROM (
  SELECT doc_id AS d, splitByChar(' ', text) AS ws
  FROM documents WHERE n_chars < 300
) ARRAY JOIN ws AS s
ORDER BY d, s LIMIT 100
""",
    "x_final_sample_prewhere": """
SELECT count() AS c, uniqExact(user_id) AS u
FROM events FINAL SAMPLE 1/2 PREWHERE value > 0
WHERE event_type != 'view'
""",
    "x_prewhere_limit_by": """
SELECT user_id, event_type, value FROM events
PREWHERE value >= 0
ORDER BY user_id, value DESC, event_id LIMIT 1 BY user_id
""",
    "x_dq_identifiers": """
SELECT "user_id", countIf("value" > 50) AS big
FROM events GROUP BY "user_id" ORDER BY "user_id" LIMIT 25
""",
    "x_union_final_sample": """
SELECT user_id, toInt64(1) AS tag FROM events FINAL WHERE value > 90
UNION ALL
SELECT user_id, toInt64(2) AS tag FROM events SAMPLE 1/4 WHERE value < 5
ORDER BY user_id, tag
""",
    "x_any_join_subquery": """
SELECT l.event_type, max(r.mv) AS m FROM events AS l
LEFT ANY JOIN (SELECT user_id, max(value) AS mv FROM events
               GROUP BY user_id) AS r
ON l.user_id = r.user_id
GROUP BY l.event_type ORDER BY l.event_type
""",
}


def _corpus() -> list[tuple[str, str]]:
    from mysql_to_clickhouse_spark.operators import sqlapi

    from mysql_to_clickhouse_spark.functions.chdialect import (
        _strip_sql_comments,
        bind_params,
    )

    texts = [
        # s26's placeholders need their bindings before any permuted
        # replay — fuzz the BOUND text, the form spark.sql receives
        (
            name,
            bind_params(_strip_sql_comments(val), sqlapi._S26_PARAMS)
            if name == "_S26_CH_SQL"
            else val,
        )
        for name, val in vars(sqlapi).items()
        if name.endswith("_CH_SQL") and isinstance(val, str)
    ]
    assert len(texts) >= 14, f"corpus shrank: {sorted(n for n, _ in texts)}"
    texts += list(_EXTRA_TEXTS.items())
    return sorted(texts)


_BASELINES: dict[str, object] = {}


def _views(spark):
    from mysql_to_clickhouse_spark.functions.chdialect import (
        register_any_order,
    )
    from mysql_to_clickhouse_spark.tables import load

    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        load(spark, TEST_SF_DIR, t).createOrReplaceTempView(t)
    # keep-one rule for x_any_join_subquery's aliased right side
    register_any_order("r", "mv DESC, user_id DESC")
    # s25's dictionary: register so the dictGet family is fuzzed under
    # the same lexical permutations as every other statement text
    from mysql_to_clickhouse_spark.functions.chdict import (
        register_dictionary,
    )
    from mysql_to_clickhouse_spark.operators.sqlapi import _S25_DDL

    register_dictionary(
        spark, _S25_DDL, load(spark, TEST_SF_DIR, "nation")
    )


def _baseline(spark, name: str, text: str):
    from mysql_to_clickhouse_spark.functions.chdialect import ch_sql

    if name not in _BASELINES:
        _views(spark)
        _BASELINES[name] = ch_sql(spark, text).toPandas()
    return _BASELINES[name]


_CASES = [
    (name, text, k)
    for name, text in _corpus()
    for k in range(PERMS_PER_TEXT)
]


@pytest.mark.parametrize(
    "name,text,k", _CASES, ids=[f"{n}-p{k}" for n, _, k in _CASES]
)
def test_corpus_replay_parity(spark, name, text, k):
    from mysql_to_clickhouse_spark.functions.chdialect import ch_sql

    import zlib

    base = _baseline(spark, name, text)
    # zlib.crc32, not hash(): str hashes are salted per process and
    # would make the permutation stream non-reproducible
    rng = random.Random(SEED * 1009 + zlib.crc32(name.encode()) * 31 + k)
    permuted = _permute(text, rng)
    _views(spark)
    got = ch_sql(spark, permuted).toPandas()
    res = compare_frames(got, base)
    assert res.ok, (
        f"lexical permutation changed the result of {name}:\n"
        f"--- permuted ---\n{permuted}\n{res.detail}"
    )


# ---------------------------------------------------------------------------
# Mutation-statement replay (r12, VERDICT #5): the ch_mutation parser
# pattern-matches raw text (assignment split, WHERE boundary) — exactly
# the surface the r11 advisor found multi-assignment bugs in — so it
# gets the same permutation treatment as the SELECT corpus.
# ---------------------------------------------------------------------------

_MUTATION_TEXTS = {
    "m_update_two_cols": (
        "ALTER TABLE events UPDATE value = value / 2, "
        "event_type = 'big' WHERE value > 100"
    ),
    "m_update_swap": (
        "ALTER TABLE events UPDATE value = toFloat64(user_id), "
        "user_id = toInt64(value) WHERE user_id % 3 = 1"
    ),
    "m_update_literal_where_word": (
        "ALTER TABLE events UPDATE props = 'where it was', "
        "value = value + 1 WHERE event_type = 'view'"
    ),
    "m_delete_compound": (
        "ALTER TABLE events DELETE WHERE event_type = 'error' "
        "AND value < 50"
    ),
    "m_update_in_list": (
        "ALTER TABLE events UPDATE value = -value "
        "WHERE event_type IN ('click', 'purchase')"
    ),
}

_MUT_KEYWORDS = re.compile(
    r"\b(ALTER|TABLE|UPDATE|DELETE|WHERE|AND|OR|IN)\b"
)

_MUT_BASELINES: dict[str, object] = {}


def _mutation_base_df(spark):
    from mysql_to_clickhouse_spark.tables import load

    return load(spark, TEST_SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )


@pytest.mark.parametrize(
    "name,k",
    [(n, k) for n in sorted(_MUTATION_TEXTS) for k in range(4)],
    ids=[f"{n}-p{k}" for n in sorted(_MUTATION_TEXTS) for k in range(4)],
)
def test_mutation_replay_parity(spark, name, k):
    import zlib

    from mysql_to_clickhouse_spark.functions.chdialect import ch_mutation

    text = _MUTATION_TEXTS[name]
    df = _mutation_base_df(spark)
    if name not in _MUT_BASELINES:
        _MUT_BASELINES[name] = ch_mutation(text, df).toPandas()
    base = _MUT_BASELINES[name]
    rng = random.Random(SEED * 7919 + zlib.crc32(name.encode()) * 17 + k)
    permuted = _permute(text, rng)
    # mutation grammar words aren't in the SELECT keyword list — flip
    # them here so the statement head is case-fuzzed too
    permuted = _map_unquoted(
        permuted,
        lambda s: _MUT_KEYWORDS.sub(
            lambda m: m.group(0).lower() if rng.random() < 0.5
            else m.group(0),
            s,
        ),
    )
    got = ch_mutation(permuted, df).toPandas()
    res = compare_frames(got, base)
    assert res.ok, (
        f"lexical permutation changed the result of {name}:\n"
        f"--- permuted ---\n{permuted}\n{res.detail}"
    )
