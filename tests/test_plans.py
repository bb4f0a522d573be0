"""Physical-plan shape tests: the 100 TB properties (pushdown, pruning,
broadcast, codegen) asserted on the actual plans, per the build
brief's 'explain and iterate until it's the plan you'd want'."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.plans.explain import (
    has_codegen,
    has_pushed_filters,
    num_broadcast_joins,
    num_shuffles,
    plan_of,
    scan_read_schemas,
)
from mysql_to_clickhouse_spark.registry import all_queries
from mysql_to_clickhouse_spark.tables import load
from tests.conftest import TEST_SF_DIR

QUERIES = all_queries()


def test_filter_pushes_to_parquet_scan(spark):
    df = QUERIES["b2_filter_compare"].fn(spark, TEST_SF_DIR)
    assert has_pushed_filters(df), plan_of(df)


def test_q1_filter_pushes_and_prunes(spark):
    df = QUERIES["d1_group_basic"].fn(spark, TEST_SF_DIR)
    assert has_pushed_filters(df), plan_of(df)
    schemas = scan_read_schemas(df)
    assert schemas, "no scan found"
    # Q1 needs 7 columns; pruning must drop the rest (16-col table)
    assert all("l_orderkey" not in s for s in schemas), schemas


def test_projection_prunes_scan(spark):
    df = QUERIES["a7_schema_projection"].fn(spark, TEST_SF_DIR)
    schemas = scan_read_schemas(df)
    assert schemas and all("l_shipdate" not in s for s in schemas), schemas


def test_star_join_broadcasts_dims(spark):
    df = QUERIES["c10_star_multiway"].fn(spark, TEST_SF_DIR)
    assert num_broadcast_joins(df) >= 3, plan_of(df, "simple")


def test_q1_single_shuffle(spark):
    df = QUERIES["d1_group_basic"].fn(spark, TEST_SF_DIR)
    # one shuffle for the aggregate + one for the final tiny sort
    assert num_shuffles(df) <= 2, plan_of(df, "simple")


def test_codegen_active_on_hot_paths(spark):
    for name in ("d1_group_basic", "b1_project_compute", "c1_inner_equi"):
        df = QUERIES[name].fn(spark, TEST_SF_DIR)
        df.collect()  # AQE annotates codegen ids only in the final plan
        assert has_codegen(df), f"{name} fell out of codegen"


def test_topk_uses_take_ordered(spark):
    df = QUERIES["f2_limit_topk"].fn(spark, TEST_SF_DIR)
    assert "TakeOrderedAndProject" in plan_of(df, "simple")


def test_broadcast_threshold_covers_dims(spark):
    # orders ⋈ customer at sf0.01 must be a broadcast join (no shuffle
    # of the fact side)
    df = QUERIES["c1_inner_equi"].fn(spark, TEST_SF_DIR)
    assert num_broadcast_joins(df) >= 1, plan_of(df, "simple")


def test_bucketed_join_has_no_join_exchange(spark):
    df = QUERIES["a9_bucketed_join"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df, "simple")
    assert "SortMergeJoin" in plan, plan
    # bucketed scans feed the SMJ directly; the only allowed Exchange is
    # the final tiny aggregate's
    assert plan.count("Exchange") <= 1, plan


def test_shuffle_hash_hint_respected(spark):
    df = QUERIES["c14_shuffle_hash_join"].fn(spark, TEST_SF_DIR)
    assert "ShuffledHashJoin" in plan_of(df, "simple"), plan_of(df, "simple")


def test_window_topk_survives_planted_hot_key(spark, tmp_path):
    """Skew resilience for the window family: a key holding 50% of all
    rows must neither break e1's answer nor flood the shuffle. The
    mitigation is Spark's WindowGroupLimit pushdown — a PARTIAL top-3
    prune runs map-side BEFORE the exchange, so the hot key ships at
    most 3 rows per input partition instead of half the table."""
    import pandas as pd

    rows = []
    # hot key 7: 20,000 rows (50%), with planted price ties
    for i in range(20000):
        rows.append((100000 + i, 7, (i // 2) * 0.5))
    # 20,000 rows spread over 1,000 cold keys
    for i in range(20000):
        rows.append((200000 + i, 1000 + i % 1000, float(i % 977)))
    sdf = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    ).repartition(8)
    sdf.write.parquet(str(tmp_path / "orders.parquet"))

    df = QUERIES["e1_row_number"].fn(spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan
    # the partial prune must sit below the exchange (map-side)
    assert plan.index("Partial") > plan.index("Exchange"), plan

    got = (
        df.toPandas()
        .sort_values(["o_custkey", "rn"])
        .reset_index(drop=True)
    )
    # independent expected answer (pandas), same total order + ties
    pdf = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey", "o_totalprice"])
    pdf = pdf.sort_values(
        ["o_custkey", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True],
    )
    grp = pdf.groupby("o_custkey")
    pdf["rn"] = grp.cumcount() + 1
    # e1's window orders by (price DESC, orderkey ASC): the tiebreak
    # column makes the ordering total, so rank/dense_rank never see a
    # tie and equal row_number — matching the registered oracle
    pdf["rk"] = pdf["rn"]
    pdf["drk"] = pdf["rn"]
    want = (
        pdf[pdf["rn"] <= 3]
        .sort_values(["o_custkey", "rn"])
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(
        got.astype({"rn": "int64", "rk": "int64", "drk": "int64"}),
        want.astype({"rn": "int64", "rk": "int64", "drk": "int64"}),
    )
    # hot key's winners are exactly the planted maxima
    hot = got[got["o_custkey"] == 7]
    assert list(hot["o_totalprice"]) == [4999.5, 4999.5, 4999.0]
    assert list(hot["rn"]) == [1, 2, 3]


def test_x7_q18_single_lineitem_scan(spark):
    """Q18's agg-then-join shape must scan lineitem ONCE (the classic
    IN-subquery formulation scans it twice)."""
    df = QUERIES["x7_tpch_q18"].fn(spark, TEST_SF_DIR)
    schemas = scan_read_schemas(df)
    li_scans = [s for s in schemas if "l_orderkey" in s]
    assert len(li_scans) == 1, schemas
    # and the scan must be pruned to the two columns the agg needs
    assert all("l_extendedprice" not in s for s in li_scans), li_scans


def test_x6_q10_topn_not_global_sort(spark):
    """Q10's LIMIT 20 must plan as TakeOrdered (per-partition top-N +
    merge), never a global sort of the aggregate output."""
    df = QUERIES["x6_tpch_q10"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan


def test_x9_q22_anti_join_planned(spark):
    df = QUERIES["x9_tpch_q22"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df, "simple")
    assert "LeftAnti" in plan, plan


def test_a17_collapse_single_shuffle(spark):
    """The CollapsingMergeTree FINAL read is ONE hash aggregate —
    no window, no self-join."""
    df = QUERIES["a17_collapsing_merge"].fn(spark, TEST_SF_DIR)
    assert num_shuffles(df) <= 1, plan_of(df, "simple")
    plan = plan_of(df, "simple")
    assert "Window" not in plan and "Join" not in plan, plan


def test_d21_foreach_single_shuffle_no_explode(spark):
    """sumForEach must be one hash aggregate over 64 lanes — a
    posexplode plan (64x shuffle inflation) is the anti-pattern."""
    df = QUERIES["d21_sum_foreach"].fn(spark, TEST_SF_DIR)
    assert num_shuffles(df) <= 1, plan_of(df, "simple")
    assert "Generate" not in plan_of(df, "simple")


def test_g17_dict_get_no_fact_shuffle(spark):
    """The dictionary lookup is a broadcast probe: zero shuffle
    exchanges on the customer (fact) side."""
    df = QUERIES["g17_dict_get"].fn(spark, TEST_SF_DIR)
    assert num_shuffles(df) == 0, plan_of(df, "simple")
    assert num_broadcast_joins(df) == 1, plan_of(df, "simple")


def test_c16_merge_hint_plans_sort_merge(spark):
    df = QUERIES["c16_merge_join_hint"].fn(spark, TEST_SF_DIR)
    assert "SortMergeJoin" in plan_of(df, "simple"), plan_of(df, "simple")


def test_k4_projection_single_raw_scan(spark):
    """The projection rollup must read raw events exactly once (to build
    the projection) and re-aggregate partials — never a second raw scan."""
    df = QUERIES["k4_projection_rewrite"].fn(spark, TEST_SF_DIR)
    schemas = scan_read_schemas(df)
    assert len([s for s in schemas if "value" in s]) == 1, schemas


def test_x12_q13_aggregates_orders_before_join(spark):
    """Q13 must pre-aggregate orders to per-customer counts BEFORE the
    customer join — the join operand carries the count column, so the
    exchange ships |customers| rows, not |orders|."""
    df = QUERIES["x12_tpch_q13"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df, "simple")
    # the orders scan feeds a HashAggregate below the join
    assert "Join" in plan and "HashAggregate" in plan, plan
    schemas = scan_read_schemas(df)
    orders_scans = [s for s in schemas if "o_custkey" in s]
    assert orders_scans and all(
        "o_totalprice" not in s for s in orders_scans
    ), schemas


def test_x15_q8_single_fact_shuffle(spark):
    """Q8's seven-relation join must broadcast everything except the
    orders⋈lineitem exchange: at most one shuffled join, >=5 broadcast
    joins, and the order-date window pushed to the orders scan."""
    df = QUERIES["x15_tpch_q8"].fn(spark, TEST_SF_DIR)
    assert num_broadcast_joins(df) >= 5, plan_of(df, "simple")
    assert has_pushed_filters(df), plan_of(df)


def test_x14_q21_no_triple_lineitem_scan(spark):
    """The decorrelated Q21 reads lineitem at most twice (tag + agg) —
    never the three correlated scans of the textbook formulation."""
    df = QUERIES["x14_tpch_q21"].fn(spark, TEST_SF_DIR)
    schemas = scan_read_schemas(df)
    li_scans = [s for s in schemas if "l_suppkey" in s and "l_orderkey" in s]
    assert 1 <= len(li_scans) <= 2, schemas


def test_i25_paragraph_dedup_two_shuffles(spark):
    """C4 paragraph dedup must cost exactly the chunk-key and doc-key
    exchanges — no window over the corpus, no extra repartition."""
    df = QUERIES["i25_paragraph_dedup"].fn(spark, TEST_SF_DIR)
    assert num_shuffles(df) <= 2, plan_of(df, "simple")


def test_i4e_topk_queries_single_exchange_pruned_scan(spark):
    """The broadcast-queries serving kernel must cost exactly ONE
    exchange (the ≤ k·batches-per-query candidate re-rank window) and
    its corpus scan must read only (vec_id, embedding) — corpus rows
    never shuffle, which is the property that holds at 100 TB."""
    df = QUERIES["i4e_topk_queries"].fn(spark, TEST_SF_DIR)
    assert num_shuffles(df) <= 1, plan_of(df, "simple")
    plan = plan_of(df, "formatted")
    scan = [
        p
        for p in plan.split("\n\n")
        if "Scan parquet" in p and "ReadSchema" in p
    ]
    assert scan, plan
    # assert the pruned column set explicitly from ReadSchema (not a
    # substring-absence check, which a path containing the column name
    # would false-fail and a renamed column would silently pass)
    schema_lines = [
        ln for ln in scan[0].splitlines() if "ReadSchema" in ln
    ]
    assert schema_lines, scan[0]
    read_schema = schema_lines[0].split("ReadSchema:", 1)[1]
    assert "vec_id" in read_schema and "embedding" in read_schema, read_schema
    assert "label" not in read_schema, read_schema


def test_h19_rolling_mau_bounded_generate(spark):
    """The rolling-distinct plan explodes a bounded 7-day sequence
    (Generate over sequence(...)), never a fact-table range self-join:
    no cartesian, no BroadcastNestedLoop."""
    df = QUERIES["h19_rolling_mau"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df, "simple")
    assert "Generate explode(sequence" in plan, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_e9_running_distinct_no_expanding_distinct(spark):
    """Running distinct uses the first-seen identity: the plan contains
    plain hash aggregates + one window sum — no distinct aggregate
    inside a window frame (which would rescan per row)."""
    df = QUERIES["e9_running_distinct"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df, "simple")
    assert "Window" in plan, plan
    # the distinct work happens in groupBy aggregates before the window
    assert num_shuffles(df) <= 3, plan


def test_d42_bitmap_single_row_fold(spark):
    """Bitmap algebra is two chained folds: at most the user-key
    exchange plus the single-row merge."""
    df = QUERIES["d42_bitmap_ops"].fn(spark, TEST_SF_DIR)
    assert num_shuffles(df) <= 2, plan_of(df, "simple")


def test_k6_cascade_both_hops_partial_merge(spark):
    """The MV cascade aggregates raw->hour->day: two hash-agg exchanges
    and nothing else (no join, no window)."""
    df = QUERIES["k6_mv_cascade"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df, "simple")
    assert num_shuffles(df) <= 2, plan
    assert "Join" not in plan and "Window" not in plan, plan


def test_d56_ks_two_phase_prefix_shape(spark):
    """The KS ECDF never runs a single-partition global window: the
    cumsum stage (range-repartition + pid-partitioned local window) is
    materialized behind a localCheckpoint, so the FINAL plan must show
    only the cheap tail — a broadcast hash join against the ≤32-row
    offsets frame and a two-level global max — and no Window at all
    (a global-window formulation would surface here as
    SinglePartition→Window)."""
    df = QUERIES["d56_ks_test"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_c20_paste_join_rank_bound_before_join(spark):
    """The positional join filters to the top-20 ranks BEFORE joining,
    so the join sides are bounded; and the join itself is broadcastable
    (no sort-merge of two full fact aggregates)."""
    df = QUERIES["c20_paste_join"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df, "simple")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_i36_token_budget_single_window_shuffle(spark):
    """Token-budget sampling is one window per source partition: one
    exchange on source, no joins, no Python."""
    df = QUERIES["i36_token_budget"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df, "simple")
    assert "Window" in plan, plan
    assert num_shuffles(df) <= 1, plan_of(df, "simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_aqe_splits_planted_skew_join(spark):
    """The 100 TB skew story, executed not just configured: a planted
    80%-hot-key fact⋈fact join (broadcast disabled) must come out of
    AQE with the hot partition SPLIT — the executed plan shows
    ``SortMergeJoin(skew=true)`` over a skewed AQEShuffleRead. This is
    the runtime half of the salting strategy (c13 is the manual half):
    per-key hot spots that would stall one reducer are subdivided by
    the framework."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    ]
    old = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "65536",
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 8, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("payload-"), F.col("id"), F.lit("-" * 40)).alias("pl"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.concat(F.lit("r-"), F.col("id")).alias("pr")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 300_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_c21_or_join_no_nested_loop(spark):
    """The OR-of-keys join must execute as two broadcast equi-joins,
    never the BroadcastNestedLoopJoin the literal ON-a-OR-b form
    plans."""
    df = QUERIES["c21_or_key_join"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df, "simple")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan


def test_a31_dynamic_partition_pruning_in_plan(spark):
    """The fact scan must carry a dynamicpruning PartitionFilter built
    from the dimension join — only the matching day-directories are
    read, which is the partition-pruning story at 100 TB."""
    df = QUERIES["a31_dynamic_pruning"].fn(spark, TEST_SF_DIR)
    df.collect()  # DPP materializes in the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_s9_limit_by_windowgrouplimit_own_plan(spark):
    """s9_limit_by's OWN executed plan (not d13's, whose evidence the
    r5 docstring borrowed) must carry the WindowGroupLimit map-side
    prune: a Partial limit below the user_id exchange, so each key
    ships <= 3 rows per input partition at 100 TB."""
    df = QUERIES["s9_limit_by"].fn(spark, TEST_SF_DIR)
    df.collect()  # materialize DF ITSELF so its adaptive plan is final
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan, plan
    assert plan.index("Partial") > plan.index("Exchange"), plan


def test_plans_md_covers_every_showcase_id():
    """PLANS.md freshness guard (r5 verdict item 3): every id in
    scripts/gen_plans.py SHOWCASE must have its captured plan in
    PLANS.md, so the evidence file cannot silently go stale when a new
    kernel is added to the showcase."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(repo, "scripts", "gen_plans.py")).read()
    ids = re.findall(r'^\s*\("([a-z0-9_]+)",', src, re.M)
    assert len(ids) >= 24, ids
    plans = open(os.path.join(repo, "PLANS.md")).read()
    headers = set(re.findall(r"^## ([a-z0-9_]+)$", plans, re.M))
    missing = [i for i in ids if i not in headers]
    assert not missing, f"PLANS.md stale; run scripts/gen_plans.py: {missing}"


def test_s9b_limit_offset_by_plan_prunes_map_side(spark):
    """The two-sided rank band must still get the WindowGroupLimit
    prune from its UPPER bound (<= offset+n rows per key map-side) —
    distributed pagination's information-theoretic minimum."""
    df = QUERIES["s9b_limit_offset_by"].fn(spark, TEST_SF_DIR)
    df.limit(1).collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan, plan


def test_c22_any_join_broadcasts_deduped_right(spark):
    """CH ANY JOIN's Spark analog is dedup-right-then-broadcast: the
    keep-one aggregation must partial-combine BEFORE its exchange
    (map-side shrink, like CH's build-side hash keeping one row per
    key), and the join itself must be a BroadcastHashJoin — the fact
    side never shuffles on the join key."""
    df = QUERIES["c22_any_join"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan, plan
    # the dedup aggregate runs in partial mode below its exchange
    assert "partial_min" in plan or "partial min" in plan.lower(), plan


def test_a32_sample_filters_before_single_shuffle(spark):
    """The SAMPLE band predicate is row-local: it must evaluate inside
    the scan stage (filter below the only exchange — 7/8 of rows never
    shuffle), and the scan must prune to the 3 referenced columns."""
    df = QUERIES["a32_sample_clause"].fn(spark, TEST_SF_DIR)
    plan = plan_of(df)
    assert num_shuffles(df) == 1, plan
    assert plan.index("Filter") > plan.index("Exchange"), plan  # tree prints top-down
    schemas = scan_read_schemas(df)
    assert schemas and all("props" not in s and "ts" not in s for s in schemas), schemas


def test_s10_fill_join_broadcasts_aggregate_not_spine_shuffle(spark):
    """WITH FILL's densify join must be a BroadcastHashJoin building on
    the (already map-side-combined, tiny) aggregate — the literal spine
    never hash-shuffles against the fact table, so the fill costs one
    broadcast regardless of fact size. The sparse predicate must reach
    the parquet scan as a pushed filter."""
    df = QUERIES["s10_with_fill"].fn(spark, TEST_SF_DIR)
    df.collect()  # finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    fmt = plan_of(df)
    assert "PushedFilters" in fmt and "event_type" in fmt, fmt
