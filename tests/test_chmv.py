"""CH CREATE MATERIALIZED VIEW DDL front door (functions/chmv.py):
parse shapes, loud scope errors, and the merge==recompute property
over arbitrary batch splits."""

from __future__ import annotations

import pytest

from mysql_to_clickhouse_spark.functions.chmv import (
    create_materialized_view,
)
from mysql_to_clickhouse_spark.tables import load

from tests.conftest import TEST_SF_DIR

DDL = """
CREATE MATERIALIZED VIEW mv1 TO tgt ENGINE = AggregatingMergeTree()
ORDER BY k AS
SELECT o_orderpriority, count() AS n, sum(o_totalprice) AS s,
       avg(o_totalprice) AS a, min(o_totalprice) AS lo,
       max(o_totalprice) AS hi, uniqExact(o_custkey) AS u,
       countIf(o_orderstatus = 'F') AS nf,
       sumIf(o_totalprice, o_orderstatus = 'F') AS sf
FROM orders GROUP BY o_orderpriority
"""


def test_parse_shape(spark):
    mv = create_materialized_view(spark, DDL)
    assert mv.name == "mv1" and mv.target == "tgt"
    assert [n for n, _ in mv.keys] == ["o_orderpriority"]
    assert [(a.out, a.kind) for a in mv.aggs] == [
        ("n", "count"), ("s", "sum"), ("a", "avg"), ("lo", "min"),
        ("hi", "max"), ("u", "uniqExact"), ("nf", "count"), ("sf", "sum"),
    ]
    assert mv.aggs[6].cond is not None and mv.aggs[7].cond is not None


def test_merge_equals_recompute_any_split(spark):
    from pyspark.sql import functions as F

    orders = load(spark, TEST_SF_DIR, "orders")
    full = {
        tuple(r)[:1]: tuple(r)[1:]
        for r in create_materialized_view(spark, DDL)
        .initialize(orders)
        .read()
        .collect()
    }
    # an unrelated-to-the-group-key split into 3 uneven batches
    mv = create_materialized_view(spark, DDL)
    mv.initialize(orders.filter(F.col("o_orderkey") % 7 < 2))
    mv.apply_delta(orders.filter(F.col("o_orderkey") % 7 == 2))
    mv.apply_delta(orders.filter(F.col("o_orderkey") % 7 > 2))
    inc = {tuple(r)[:1]: tuple(r)[1:] for r in mv.read().collect()}
    assert inc == full


def test_global_agg_without_group_by(spark):
    mv = create_materialized_view(
        spark,
        "CREATE MATERIALIZED VIEW g AS "
        "SELECT count() AS n, max(o_totalprice) AS hi FROM orders",
    )
    orders = load(spark, TEST_SF_DIR, "orders")
    row = mv.initialize(orders).read().collect()[0]
    assert row["n"] == orders.count()


def test_where_applies_per_batch(spark):
    from pyspark.sql import functions as F

    orders = load(spark, TEST_SF_DIR, "orders")
    ddl = (
        "CREATE MATERIALIZED VIEW w AS SELECT o_orderpriority, "
        "count() AS n FROM orders WHERE o_orderstatus = 'F' "
        "GROUP BY o_orderpriority"
    )
    mv = create_materialized_view(spark, ddl)
    mv.initialize(orders.filter(F.col("o_orderkey") % 2 == 0))
    mv.apply_delta(orders.filter(F.col("o_orderkey") % 2 == 1))
    got = {r[0]: r[1] for r in mv.read().collect()}
    want = {
        r[0]: r[1]
        for r in orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    assert got == want


def test_ch_scalar_key_translates(spark):
    ddl = (
        "CREATE MATERIALIZED VIEW t AS SELECT toYYYYMM(o_orderdate) AS ym, "
        "count() AS n FROM orders GROUP BY toYYYYMM(o_orderdate)"
    )
    mv = create_materialized_view(spark, ddl)
    orders = load(spark, TEST_SF_DIR, "orders")
    rows = mv.initialize(orders).read().collect()
    assert all(199000 < r["ym"] < 210013 for r in rows)
    assert sum(r["n"] for r in rows) == orders.count()


@pytest.mark.parametrize(
    "ddl,msg",
    [
        ("SELECT 1", "not a CREATE MATERIALIZED"),
        ("CREATE MATERIALIZED VIEW x AS SELECT count() AS n", "FROM"),
        (
            # quantile is supported since r11 (KLL partial) but the
            # EXACT family still raises — no mergeable exact state
            "CREATE MATERIALIZED VIEW x AS SELECT quantileExact(0.5)(v) "
            "AS q FROM orders",
            "no mergeable partial",
        ),
        (
            "CREATE MATERIALIZED VIEW x AS SELECT quantile(1.5)(v) AS q "
            "FROM orders",
            "outside",
        ),
        (
            "CREATE MATERIALIZED VIEW x AS SELECT count() AS n "
            "FROM orders JOIN lineitem ON 1=1",
            "JOIN",
        ),
        (
            "CREATE MATERIALIZED VIEW x AS SELECT o_custkey, count() AS n "
            "FROM orders",
            "GROUP BY",
        ),
    ],
)
def test_loud_scope_errors(spark, ddl, msg):
    with pytest.raises(ValueError, match=msg):
        create_materialized_view(spark, ddl)


def test_apply_before_initialize_raises(spark):
    mv = create_materialized_view(
        spark,
        "CREATE MATERIALIZED VIEW y AS SELECT count() AS n FROM orders",
    )
    with pytest.raises(RuntimeError, match="initialize"):
        mv.apply_delta(load(spark, TEST_SF_DIR, "orders"))


def test_uniq_hll_state_merges_within_tolerance(spark):
    """uniq = CH uniqState/uniqMerge: the partial is a REAL mergeable
    HLL sketch. The union-of-splits estimate and the single-shot
    estimate may differ by a few counts (DataSketches sparse/dense
    promotion differs along the two paths — same as CH uniq itself,
    whose merged states are also not bit-identical to one-shot), but
    BOTH must sit within HLL tolerance of the exact count, and the
    merged path must be deterministic (re-running it reproduces the
    same estimates)."""
    from pyspark.sql import functions as F

    orders = load(spark, TEST_SF_DIR, "orders")
    ddl = (
        "CREATE MATERIALIZED VIEW u AS SELECT o_orderpriority, "
        "uniq(o_custkey) AS u FROM orders GROUP BY o_orderpriority"
    )
    single = {
        r[0]: r[1]
        for r in create_materialized_view(spark, ddl)
        .initialize(orders)
        .read()
        .collect()
    }

    def run_merged():
        mv = create_materialized_view(spark, ddl)
        mv.initialize(orders.filter(F.col("o_orderkey") % 3 == 0))
        mv.apply_delta(orders.filter(F.col("o_orderkey") % 3 == 1))
        mv.apply_delta(orders.filter(F.col("o_orderkey") % 3 == 2))
        return {r[0]: r[1] for r in mv.read().collect()}

    merged = run_merged()
    assert merged == run_merged()  # the merged path is deterministic
    exact = {
        r[0]: r[1]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey"))
        .collect()
    }
    for k in exact:
        for est in (merged[k], single[k]):
            assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_merge_recompute_property_random_splits(spark):
    """Property: for ANY partition of the source rows into batches, the
    incrementally-merged MV equals the single-shot recompute — the IVM
    correctness claim over randomized splits (deterministic seeds; the
    hash-based split is unrelated to the group key or any aggregate
    input)."""
    import random

    from pyspark.sql import functions as F

    orders = load(spark, TEST_SF_DIR, "orders")
    ddl = (
        "CREATE MATERIALIZED VIEW p AS SELECT o_orderstatus, "
        "count() AS n, sum(o_totalprice) AS s, min(o_totalprice) AS lo, "
        "max(o_totalprice) AS hi, uniqExact(o_custkey) AS u "
        "FROM orders GROUP BY o_orderstatus"
    )
    full = {
        tuple(r)[:1]: tuple(r)[1:]
        for r in create_materialized_view(spark, ddl)
        .initialize(orders)
        .read()
        .collect()
    }
    for seed in (7, 41, 1999):
        rng = random.Random(seed)
        n_batches = rng.randint(2, 5)
        salt = rng.randint(1, 1 << 30)
        bucket = F.pmod(F.xxhash64("o_orderkey", F.lit(salt)), n_batches)
        mv = create_materialized_view(spark, ddl)
        mv.initialize(orders.filter(bucket == 0))
        for b in range(1, n_batches):
            mv.apply_delta(orders.filter(bucket == b))
        inc = {tuple(r)[:1]: tuple(r)[1:] for r in mv.read().collect()}
        assert inc == full, f"seed {seed} ({n_batches} batches) diverged"


# ---------------------------------------------------------------------------
# r11: quantile KLL partials + TO-target wiring
# ---------------------------------------------------------------------------

QDDL = """
CREATE MATERIALIZED VIEW mvq TO tgt_q ENGINE = AggregatingMergeTree()
ORDER BY o_orderpriority AS
SELECT o_orderpriority, count() AS n,
       quantile(0.5)(o_totalprice) AS p50,
       quantile(0.9)(o_totalprice) AS p90,
       median(o_totalprice) AS med
FROM orders GROUP BY o_orderpriority
"""


def test_quantile_parse_shapes(spark):
    mv = create_materialized_view(spark, QDDL)
    got = [(a.out, a.kind, a.param) for a in mv.aggs]
    assert got == [
        ("n", "count", None),
        ("p50", "quantile", 0.5),
        ("p90", "quantile", 0.9),
        ("med", "quantile", 0.5),
    ]
    # parameterless CH quantile(x) defaults to the median
    mv2 = create_materialized_view(
        spark,
        "CREATE MATERIALIZED VIEW m AS SELECT quantile(o_totalprice) "
        "AS q FROM orders",
    )
    assert mv2.aggs[0].kind == "quantile" and mv2.aggs[0].param == 0.5


def test_quantile_merge_stays_in_rank_tolerance(spark):
    """KLL estimates are approximate; the merge property to pin is the
    DataSketches rank-error bound (~1.7 % at default k), checked for
    BOTH the one-pass and the delta-merged sketch against the exact
    quantile."""
    from pyspark.sql import functions as F

    orders = load(spark, TEST_SF_DIR, "orders")
    exact = {
        tuple(r)[0]: (r["e50"], r["e90"])
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("e50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("e90"),
        )
        .collect()
    }
    ranks = {
        tuple(r)[0]: sorted(v["o_totalprice"] for v in r["vs"])
        for r in orders.groupBy("o_orderpriority")
        .agg(F.collect_list(F.struct("o_totalprice")).alias("vs"))
        .collect()
    }

    def rank_of(key, value):
        vals = ranks[key]
        import bisect
        return bisect.bisect_right(vals, value) / len(vals)

    def one_pass():
        return create_materialized_view(spark, QDDL).initialize(orders)

    def merged():
        return (
            create_materialized_view(spark, QDDL)
            .initialize(orders.filter(F.col("o_orderkey") % 3 == 0))
            .apply_delta(orders.filter(F.col("o_orderkey") % 3 == 1))
            .apply_delta(orders.filter(F.col("o_orderkey") % 3 == 2))
        )

    # build+read one at a time: both MVs publish to the SAME target
    # table (the DDL's TO tgt_q), and the target always shows the
    # LATEST writer — CH semantics — so a stale handle must not be
    # read across the other's publish
    for label, build in (("one-pass", one_pass), ("merged", merged)):
        for r in build().read().collect():
            key = r["o_orderpriority"]
            assert abs(rank_of(key, r["p50"]) - 0.5) < 0.05, label
            assert abs(rank_of(key, r["p90"]) - 0.9) < 0.05, label
            # median() is its own sketch instance: KLL compaction is
            # randomized, so med ~= p50 within rank tolerance, not ==
            assert abs(rank_of(key, r["med"]) - 0.5) < 0.05, label


def test_to_target_publish_and_attach_restart(spark):
    """TO target owns the data (CH semantics): state survives in the
    catalog table, and a freshly parsed MV attach()es and continues."""
    from pyspark.sql import functions as F

    orders = load(spark, TEST_SF_DIR, "orders")
    ddl = """
    CREATE MATERIALIZED VIEW mv_r TO tgt_restart AS
    SELECT o_orderpriority, count() AS n, sum(o_totalprice) AS s
    FROM orders GROUP BY o_orderpriority
    """
    mv = create_materialized_view(spark, ddl)
    mv.initialize(orders.filter(F.col("o_orderkey") % 2 == 0))
    # the target table exists and holds PARTIAL state columns
    tgt_cols = set(spark.table("tgt_restart").columns)
    assert "p_count_n" in tgt_cols and "p_sum_s" in tgt_cols

    # "restart": a brand-new MV object from the same DDL, no initialize
    mv2 = create_materialized_view(spark, ddl).attach()
    mv2.apply_delta(orders.filter(F.col("o_orderkey") % 2 == 1))
    got = {
        r["o_orderpriority"]: (r["n"], round(r["s"], 2))
        for r in mv2.read().collect()
    }
    want = {
        r["o_orderpriority"]: (r["n"], round(r["s"], 2))
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("s"),
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        # fixed-point partial sums vs a double fold: sub-cent-scale
        # rounding differences are the documented discipline
        assert abs(got[k][1] - want[k][1]) < 0.05


def test_attach_without_target_raises(spark):
    mv = create_materialized_view(
        spark,
        "CREATE MATERIALIZED VIEW m AS SELECT count() AS n FROM orders",
    )
    with pytest.raises(RuntimeError, match="TO target"):
        mv.attach()
