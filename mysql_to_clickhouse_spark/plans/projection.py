"""Projection selection — the ClickHouse automatic-projection analog.

CH `ALTER TABLE ... ADD PROJECTION` stores finer-grained pre-aggregates
inside each part and silently rewrites a matching query to read the
cheapest projection instead of raw rows. The Spark-first equivalent:
projections are ordinary DataFrames of mergeable partials (k1's -State
shape), registered per table with their grouping keys; `pick()` chooses
the usable projection with the fewest surplus keys (fewest rows to
re-aggregate), and `rollup()` re-aggregates its partials up to the
requested keys. k4_projection_rewrite is the driver-hash-checked proof
that the rollup algebra is exact; this module makes the CHOICE step a
tested, reusable component instead of something hand-inlined per query.

Scale: a projection's cardinality is the product of its key domains —
orders of magnitude below fact cardinality — so answering from a
projection replaces a full fact scan with a scan of thousands of rows.
Selection is pure metadata work on the driver (no data touched).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.functions.numeric import SUM_SCALE


@dataclass(frozen=True)
class Projection:
    """A registered pre-aggregate: grouping keys + partial-state frame
    holding `p_count` (bigint) and `p_sum_fp` (fixed-point bigint)."""

    name: str
    keys: tuple[str, ...]
    state: DataFrame


def pick(requested_keys: set[str] | frozenset[str], candidates: list[Projection]) -> Projection | None:
    """The usable projection with the fewest surplus keys.

    Usable = its key set is a SUPERSET of the requested grouping keys
    (partials can only be rolled UP the lattice, never split). Among
    usable candidates the fewest surplus keys wins — surplus keys are
    the rows the rollup must re-aggregate away; with equal surplus the
    name breaks the tie so selection is deterministic. Returns None when
    nothing matches (caller falls back to the raw table)."""
    req = set(requested_keys)
    usable = [p for p in candidates if req <= set(p.keys)]
    if not usable:
        return None
    return min(usable, key=lambda p: (len(set(p.keys) - req), p.name))


def rollup(proj: Projection, requested_keys: list[str]) -> DataFrame:
    """Re-aggregate a projection's partials up to `requested_keys`,
    surfacing the same (n, total_value) shape a raw-table aggregate
    would produce. Exactness: bigint partial sums are associative, so
    any rollup path through the lattice yields identical results
    (driver-hash-proven by k4)."""
    missing = set(requested_keys) - set(proj.keys)
    if missing:
        raise ValueError(
            f"projection {proj.name!r} (keys {proj.keys}) cannot answer "
            f"grouping {requested_keys}: missing {sorted(missing)}"
        )
    return proj.state.groupBy(*requested_keys).agg(
        F.sum("p_count").alias("n"),
        (F.sum("p_sum_fp").cast("double") / F.lit(float(10**SUM_SCALE))).alias(
            "total_value"
        ),
    )
