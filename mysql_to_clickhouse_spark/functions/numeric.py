"""Exact (order-independent) numeric aggregation helpers.

Problem (SURVEY.md §5.4): ``sum(double)`` is accumulation-order-dependent;
Spark's partition-parallel sums and DuckDB's differ in last ulps, which
breaks the driver's value-hash comparison. Worse, ``CAST(double AS
DECIMAL)`` itself disagrees between engines on representation ties
(Spark rounds the exact binary expansion via BigDecimal; DuckDB rounds
``value * 10^scale`` computed in double — measured 0.0046 divergence on
a 60k-row sum).

Fix: fixed-point integers via ``FLOOR``. For identical IEEE-double
inputs, ``x * 10^s`` is one IEEE multiply (bit-identical on both
engines) and ``FLOOR`` is unambiguous (no tie exists for truncation).
The bigint sum is exact and order-independent; one final cast+divide
yields a bit-identical double on both engines, for ANY partitioning or
cluster size.

Each Spark helper has a same-named ``o_*`` twin emitting the equivalent
DuckDB SQL, so query and oracle cannot drift.

Scale note: bigint sums are map-side-combinable hash aggregates — the
same shuffle shape as a plain double sum, so this costs nothing at
100 TB. Overflow headroom: scale 4 → sums stay exact below 9.2e14
(int64) and the double cast below 9e15; fine for 1e9+ rows of 1e5-scale
monetary values. Raise the scale only with the row-count budget in mind.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SUM_SCALE = 4


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fixed_point(col: Column | str, scale: int = SUM_SCALE) -> Column:
    """double → deterministic fixed-point bigint: FLOOR(x * 10^scale)."""
    return F.floor(_c(col) * F.lit(float(10**scale))).cast("long")


def o_fixed_point(expr: str, scale: int = SUM_SCALE) -> str:
    return f"CAST(FLOOR(({expr}) * {float(10 ** scale)!r}) AS BIGINT)"


def dsum(col: Column | str, scale: int = SUM_SCALE) -> Column:
    """Order-independent sum of a double column, returned as double.

    Truncates each input at ``scale`` decimal digits (deterministically);
    the oracle twin truncates identically, so results are bit-equal.
    """
    return F.sum(fixed_point(col, scale)).cast("double") / F.lit(float(10**scale))


def o_dsum(expr: str, scale: int = SUM_SCALE) -> str:
    return (
        f"CAST(SUM({o_fixed_point(expr, scale)}) AS DOUBLE)"
        f" / {float(10 ** scale)!r}"
    )


def dmean(col: Column | str, scale: int = SUM_SCALE) -> Column:
    """Order-independent mean as double: fixed-point sum / 10^s / count.

    Two IEEE divisions in a fixed order — identical on both engines.
    """
    c = _c(col)
    return (
        F.sum(fixed_point(c, scale)).cast("double")
        / F.lit(float(10**scale))
        / F.count(c)
    )


def o_dmean(expr: str, scale: int = SUM_SCALE) -> str:
    return f"{o_dsum(expr, scale)} / COUNT({expr})"


def epoch_us(col: Column | str) -> Column:
    """Timestamp → epoch microseconds (bigint).

    The canonical form for surfacing ``events.ts`` (ns parquet → Spark µs
    truncation): hashes identically on both engines (oracle twin below).
    """
    return F.unix_micros(_c(col))


def o_epoch_us(expr: str) -> str:
    # DuckDB reads ns parquet as TIMESTAMP_NS; cast to µs TIMESTAMP first
    # (truncation — same as Spark's read-time behavior for positive epochs).
    return f"epoch_us(CAST(({expr}) AS TIMESTAMP))"


def dsum_wide(col: Column | str, scale: int = SUM_SCALE) -> Column:
    """dsum with a DECIMAL(38,0) sum carrier instead of bigint — for
    summands that GROW with n (ranks, positions), where the int64
    budget n·max(x)·10^s overflows long before the data stops fitting
    a cluster. Found by scripts/stress.py at 10M rows: d48's midrank
    products grow ~n³ and blew int64; decimal(38) holds ~1e38.

    Determinism: FLOOR(x·10^s) is an exact integer-valued double; the
    double→decimal cast of an integer value is exact on both engines
    (the tie-breaking hazard only exists for fractional casts); the
    decimal sum is exact; the final decimal→double cast is correctly
    rounded of the same exact value on both engines. Still map-side
    combinable (decimal sum partials)."""
    # FLOOR(double) returns BIGINT on both engines -- the very overflow
    # this carrier avoids -- so floor is computed IN DOUBLE SPACE via
    # the exact IEEE remainder (x - x % 1.0, corrected for negatives),
    # and only the integer-valued double is cast to decimal.
    xs = _c(col) * F.lit(float(10**scale))
    fl = xs - (xs % F.lit(1.0))
    fl = F.when((xs < 0) & ((xs % F.lit(1.0)) != 0), fl - 1).otherwise(fl)
    return F.sum(fl.cast("decimal(38,0)")).cast("double") / F.lit(
        float(10**scale)
    )


def o_dsum_wide(expr: str, scale: int = SUM_SCALE) -> str:
    xs = f"(({expr}) * {float(10 ** scale)!r})"
    fl = f"({xs} - ({xs} % 1.0))"
    floor = (
        f"(CASE WHEN {xs} < 0 AND ({xs} % 1.0) <> 0"
        f" THEN {fl} - 1 ELSE {fl} END)"
    )
    return (
        f"CAST(SUM(CAST({floor} AS DECIMAL(38,0))) AS DOUBLE)"
        f" / {float(10 ** scale)!r}"
    )
