"""Two-phase parallel prefix sums — global running totals WITHOUT a
single-partition WindowExec.

A partition-less ``Window.orderBy(...)`` plans every row into ONE task:
at 100 TB that is one executor sorting the fact table while 999 idle —
the classic global-window scale-killer. The textbook fix (Blelloch's
two-phase scan, the same shape every MPP engine uses for global
ORDER-BY windows) is:

  1. ``repartitionByRange`` on the order key — each of the N range
     partitions holds a contiguous slice of the global order, so the
     sort parallelizes across all executors;
  2. a LOCAL inclusive running sum per partition (``Window.partitionBy
     (spark_partition_id())`` — N concurrent window tasks);
  3. per-partition totals (exactly N rows) collected to the driver,
     folded into EXCLUSIVE offsets, and broadcast back;
  4. global running value = local running value + partition offset.

Driver traffic is <= N rows regardless of input size, every heavy step
runs at full parallelism, and the arithmetic is integer/deterministic —
bit-identical to the one-partition form it replaces (d56 proved the
pattern; d50/e6/e12 reuse it through this module).

Correctness notes baked into the implementation:

- ``spark_partition_id()`` is recomputation-sensitive, so the locally
  scanned frame is ``localCheckpoint``-ed before its two downstream
  uses (totals aggregation + offsets join) — otherwise a lost executor
  could re-derive DIFFERENT partition ids between the two reads.
- RangePartitioner sends equal keys to the same partition, so running
  sums over duplicate keys stay contiguous; callers still pass a
  tie-broken (unique) ordering whenever peer order matters, exactly as
  they would for the single-partition window.
- Empty inputs produce an empty offsets frame and an empty join —
  no driver-side special case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_PID = "__prefix_pid"

# Partition-id pinning stores the WHOLE scanned frame. The default
# localCheckpoint level (MEMORY_AND_DISK, deserialized rows) pinned a
# 1e8-row kept set as JVM objects and OOMed the 24g driver in local
# mode (r10 p1_corpus_build postmortem); DISK_ONLY keeps the pin
# serialized off-heap-of-concern — blocks are never evicted by memory
# pressure, and lineage truncation (the determinism guarantee) is
# identical.
_PIN_LEVEL = StorageLevel.DISK_ONLY


def running_sums(
    df: DataFrame,
    order_cols: list,
    sums: dict[str, Column],
    n_range: int = 32,
) -> tuple[DataFrame, dict[str, int]]:
    """Append one INCLUSIVE global running-sum column per ``sums`` entry
    (name -> integer Column summed in global ``order_cols`` order),
    plus grand totals, without any single-partition window.

    Returns ``(frame, totals)`` where ``frame`` is ``df`` plus the
    running-sum columns and ``totals[name]`` is the full-input sum of
    each summed column (free: it is the last partition's offset plus
    its total — no extra job). Ordering columns must form the exact
    global order the caller would have given ``Window.orderBy``;
    non-column sort expressions (e.g. ``F.desc(...)``) are accepted.
    """
    names = list(sums)
    staged = df
    sum_srcs = {}
    for name in names:
        src = f"__prefix_src_{name}"
        staged = staged.withColumn(src, sums[name])
        sum_srcs[name] = src

    ranged = staged.repartitionByRange(n_range, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    wloc = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = ranged.select(
        "*",
        *[
            F.sum(sum_srcs[name]).over(wloc).alias(f"__prefix_loc_{name}")
            for name in names
        ],
    ).localCheckpoint(True, _PIN_LEVEL)  # pin pids across the two reads

    part_totals = sorted(
        loc.groupBy(_PID)
        .agg(
            *[
                F.sum(sum_srcs[name]).alias(f"t_{name}")
                for name in names
            ]
        )
        .collect(),
        key=lambda r: r[_PID],
    )
    offsets_rows = []
    acc = {name: 0 for name in names}
    for r in part_totals:
        offsets_rows.append((r[_PID], *[acc[name] for name in names]))
        for name in names:
            acc[name] += r[f"t_{name}"] or 0
    totals = dict(acc)

    off_schema = ", ".join(
        [f"{_PID} int"] + [f"__prefix_off_{name} long" for name in names]
    )
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets_rows, off_schema)
    )
    out = loc.join(off_df, _PID)
    for name in names:
        out = out.withColumn(
            name,
            (
                F.col(f"__prefix_loc_{name}")
                + F.col(f"__prefix_off_{name}")
            ).cast("long"),
        )
    drop = (
        [_PID]
        + [f"__prefix_src_{n}" for n in names]
        + [f"__prefix_loc_{n}" for n in names]
        + [f"__prefix_off_{n}" for n in names]
    )
    return out.drop(*drop), totals


def global_lag(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str,
    n_range: int = 32,
) -> DataFrame:
    """``lag(value_col) OVER (ORDER BY order_cols)`` without a
    single-partition window: local lag inside each range partition,
    then each partition's FIRST row takes the PREVIOUS partition's last
    value as its carry-in — N boundary rows collected and broadcast,
    exactly the prefix-sum offset trick specialized to lag-1. The
    global first row gets NULL, matching the window function."""
    ranged = df.repartitionByRange(n_range, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    wloc = Window.partitionBy(_PID).orderBy(*order_cols)
    loc = ranged.select(
        "*",
        F.lag(value_col).over(wloc).alias("__lag_loc"),
        F.row_number().over(wloc).alias("__lag_rn"),
    ).localCheckpoint(True, _PIN_LEVEL)  # pin pids across the two reads

    # last row's value per partition, keyed to the NEXT partition id.
    # Non-empty partitions may be sparse (range partitioner can leave
    # holes), so carries chain across empties in ascending pid order.
    lasts = sorted(
        loc.groupBy(_PID)
        .agg(
            F.max(F.struct("__lag_rn", F.col(value_col).alias("v")))[
                "v"
            ].alias("last_v")
        )
        .collect(),
        key=lambda r: r[_PID],
    )
    carries = []
    pids = [r[_PID] for r in lasts]
    for i in range(1, len(lasts)):
        carries.append((pids[i], lasts[i - 1]["last_v"]))
    value_type = dict(df.dtypes)[value_col]
    carry_df = F.broadcast(
        df.sparkSession.createDataFrame(
            carries, f"{_PID} int, __lag_carry {value_type}"
        )
    )
    out = loc.join(carry_df, _PID, "left").withColumn(
        out_col,
        F.when(F.col("__lag_rn") == 1, F.col("__lag_carry")).otherwise(
            F.col("__lag_loc")
        ),
    )
    return out.drop(_PID, "__lag_loc", "__lag_rn", "__lag_carry")


def global_row_number(
    df: DataFrame, order_cols: list, out_col: str = "rn", n_range: int = 32
) -> tuple[DataFrame, int]:
    """Global 1-based row_number over ``order_cols`` via the two-phase
    scan (running sum of 1). Returns ``(frame, total_rows)``. The
    ordering must be a unique total order for a well-defined result —
    same contract as ``row_number`` itself."""
    out, totals = running_sums(
        df, order_cols, {out_col: F.lit(1)}, n_range=n_range
    )
    return out, totals[out_col]


def _bucket_of(col: Column, bounds: list) -> Column:
    """Index of ``col`` in the bucket partition induced by sorted
    ``bounds``: the number of boundaries <= value, as a BALANCED
    comparison tree (depth ceil(log2(len+1))) so codegen evaluates
    O(log K) compares per row — a flat aggregate() over a boundary
    array would run K interpreted lambda steps per row instead."""
    def build(lo: int, hi: int) -> Column:
        # count of bounds[lo:hi] <= value
        if lo >= hi:
            return F.lit(0)
        mid = (lo + hi) // 2
        return F.when(
            col >= F.lit(bounds[mid]),
            F.lit(mid - lo + 1) + build(mid + 1, hi),
        ).otherwise(build(lo, mid))

    return build(0, len(bounds)).cast("int")


def running_sums_keyed(
    df: DataFrame,
    key: str,
    sums: dict[str, Column],
    n_buckets: int = 64,
) -> tuple[DataFrame, dict[str, int]]:
    """``running_sums`` specialized to a single NUMERIC, non-null order
    column — the common corpus-packing shape — with a strictly lighter
    plan: driver-sampled bucket boundaries replace the RangePartitioner
    (whose partition ids are recomputation-sensitive and so force a
    full DISK_ONLY localCheckpoint pin of the scanned frame in
    ``running_sums``). The bucket id here is a DETERMINISTIC column
    (balanced compare tree over boundary literals), so the two reads
    need no pin:

      1. one approxQuantile pass samples K-1 key boundaries (column-
         pruned scan);
      2. one partial-agg pass computes per-bucket totals (K rows to
         the driver, folded into exclusive offsets);
      3. ONE row shuffle: hash-partition by bucket, per-bucket window
         running sum, broadcast offset join.

    vs running_sums: no localCheckpoint materialization of the input,
    no range-sampling job over full rows, one row shuffle instead of
    two full-frame disk round-trips. Measured at the 1e8-row corpus
    tier (r12): the x21 prefix+pack stage dropped ~80 s -> ~35 s.
    Exact integer arithmetic, bit-identical to the single-partition
    window it replaces."""
    names = list(sums)
    staged = df
    for name in names:
        staged = staged.withColumn(f"__ps_src_{name}", sums[name])
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # Boundaries only set bucket BALANCE — the running-sum values are
    # bucketing-invariant (offsets are folded from the actual per-bucket
    # totals) — so a loose sketch is enough. relativeError 0.01 keeps
    # ~all 63 distinct boundaries at the 1e8 tier but runs the
    # QuantileSummaries pass 3.4x faster (5.9 s -> 1.7 s measured r14);
    # 0.02 started collapsing boundaries (48/63).
    bounds = sorted(set(staged.stat.approxQuantile(key, qs, 0.01)))
    bucket = (
        _bucket_of(F.col(key), bounds) if bounds else F.lit(0).cast("int")
    )
    bucketed = staged.withColumn("__ps_bucket", bucket)
    per_bucket = {
        r["__ps_bucket"]: r
        for r in bucketed.groupBy("__ps_bucket")
        .agg(*[F.sum(f"__ps_src_{n}").alias(f"t_{n}") for n in names])
        .collect()
    }
    offsets_rows = []
    acc = {name: 0 for name in names}
    for b in sorted(per_bucket):
        offsets_rows.append((b, *[acc[name] for name in names]))
        for name in names:
            acc[name] += per_bucket[b][f"t_{name}"] or 0
    totals = dict(acc)
    if not offsets_rows:  # empty input: empty join, no special case
        offsets_rows = [(0, *[0 for _ in names])]
    off_schema = ", ".join(
        ["__ps_bucket int"] + [f"__ps_off_{n} long" for n in names]
    )
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets_rows, off_schema)
    )
    wloc = (
        Window.partitionBy("__ps_bucket")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = bucketed.join(off_df, "__ps_bucket")
    for name in names:
        out = out.withColumn(
            name,
            (
                F.sum(f"__ps_src_{name}").over(wloc)
                + F.col(f"__ps_off_{name}")
            ).cast("long"),
        )
    drop = (
        ["__ps_bucket"]
        + [f"__ps_src_{n}" for n in names]
        + [f"__ps_off_{n}" for n in names]
    )
    return out.drop(*drop), totals
