"""Text-pipeline expression helpers (tokenize, shingle, fingerprint) —
JVM-side array lambdas, shared by the §2.I dedup/analysis operators.

Oracle twins (o_*) emit the equivalent DuckDB list expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (documents.text is single-space separated)."""
    return F.split(_c(text), " ", -1)


def o_tokens(text: str) -> str:
    return f"string_split({text}, ' ')"


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles as strings: one per sliding window of k tokens.
    Empty array when the doc has fewer than k tokens.

    The token array binds ONCE per row inside the outer transform (the
    r13 bind-in-HOF pattern, same as x21's gate): the previous form
    inlined ``split(text)`` at every reference, and the reference
    inside the per-shingle slice lambda re-tokenized the document once
    PER SHINGLE — O(tokens²) per row across every shingle consumer
    (i2/i2b/i22/i15/i24...). Value-identical; every consumer's oracle
    hash checks it on each drive."""

    def _shingles(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(n < k, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.array_join(F.slice(toks, i, k), " "),
            )
        )

    return F.element_at(
        F.transform(F.array(tokens(text)), _shingles), 1
    )


def o_word_shingles(text: str, k: int = 3) -> str:
    t = o_tokens(text)
    return (
        f"CASE WHEN len({t}) < {k} THEN [] "
        f"ELSE list_transform(range(1, len({t}) - {k - 2}), "
        f"i -> array_to_string(({t})[i:i+{k - 1}], ' ')) END"
    )


def distinct_shingles(text: Column | str, k: int = 3) -> Column:
    return F.array_distinct(word_shingles(text, k))


def o_distinct_shingles(text: str, k: int = 3) -> str:
    return f"list_distinct({o_word_shingles(text, k)})"
