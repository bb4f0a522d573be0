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


def _permute(text: str, rng: random.Random) -> str:
    out = text
    if rng.random() < 0.8:
        out = _flip_keyword_case(out, rng)
    if rng.random() < 0.8:
        out = _mangle_whitespace(out, rng)
    if rng.random() < 0.6:
        out = _inject_comments(out, rng)
    if rng.random() < 0.4:
        out = out.rstrip() + rng.choice([";", " ;", ";\n"])
    return out


def _corpus() -> list[tuple[str, str]]:
    from mysql_to_clickhouse_spark.operators import sqlapi

    texts = [
        (name, val)
        for name, val in vars(sqlapi).items()
        if name.endswith("_CH_SQL") and isinstance(val, str)
    ]
    assert len(texts) >= 14, f"corpus shrank: {sorted(n for n, _ in texts)}"
    return sorted(texts)


_BASELINES: dict[str, object] = {}


def _views(spark):
    from mysql_to_clickhouse_spark.tables import load

    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        load(spark, TEST_SF_DIR, t).createOrReplaceTempView(t)


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
