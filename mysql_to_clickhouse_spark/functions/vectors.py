"""Vector (embedding-column) expression helpers — all JVM-side lambda
expressions (transform/zip_with/aggregate), no UDFs.

Determinism: dot products and squared norms fold fixed-point bigints
(exact under any fold order), then a fixed sequence of IEEE double ops
produces the final value — bit-identical between Spark and the DuckDB
oracle twins (o_*), which state the same arithmetic via correlated
list_transform(range(dim), ...) lambdas.

Scale ranges (dim-64, elements |x| ≲ 1): dot at 1e12 → per-term ≤ 1e12,
64-term sum ≤ 6.4e13 (int64-safe); norm² at 1e9 → sum ≤ 6.4e10.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DOT_SCALE = 1e12
NORM_SCALE = 1e9


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fixed_dot(a: Column | str, b: Column | str) -> Column:
    """Exact fixed-point dot product (bigint) of two float arrays."""
    prods = F.zip_with(
        _c(a),
        _c(b),
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * F.lit(DOT_SCALE)
        ).cast("long"),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def o_fixed_dot(a: str, b: str, dim: int = 64) -> str:
    return (
        f"list_sum(list_transform(range({dim}), i -> "
        f"CAST(FLOOR(CAST(({a})[i+1] AS DOUBLE) * CAST(({b})[i+1] AS DOUBLE)"
        f" * {DOT_SCALE!r}) AS BIGINT)))"
    )


def fixed_norm_sq(a: Column | str) -> Column:
    """Exact fixed-point squared L2 norm (bigint) of a float array."""
    sq = F.transform(
        _c(a),
        lambda x: F.floor(
            x.cast("double") * x.cast("double") * F.lit(NORM_SCALE)
        ).cast("long"),
    )
    return F.aggregate(sq, F.lit(0).cast("long"), lambda acc, v: acc + v)


def o_fixed_norm_sq(a: str) -> str:
    return (
        f"list_sum(list_transform(({a}), x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)"
        f" * {NORM_SCALE!r}) AS BIGINT)))"
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(fixed_norm_sq(a).cast("double") / F.lit(NORM_SCALE))


def o_l2_norm(a: str) -> str:
    return f"sqrt(CAST({o_fixed_norm_sq(a)} AS DOUBLE) / {NORM_SCALE!r})"


def cosine(a: Column | str, b: Column | str) -> Column:
    """Deterministic cosine similarity: exact integer dot & norms, then
    the fixed IEEE sequence (dot/S) / (norm_a * norm_b)."""
    return (fixed_dot(a, b).cast("double") / F.lit(DOT_SCALE)) / (
        l2_norm(a) * l2_norm(b)
    )


def o_cosine(a: str, b: str, dim: int = 64) -> str:
    return (
        f"(CAST({o_fixed_dot(a, b, dim)} AS DOUBLE) / {DOT_SCALE!r})"
        f" / ({o_l2_norm(a)} * {o_l2_norm(b)})"
    )
