"""Semantic tests for operators/stats.py (the CH statistical-aggregate
analogs d35–d41) on planted data where the right answer is computable
by hand — complementing the registry's DuckDB hash checks."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def test_retention_gates_on_cohort(spark, tmp_path):
    """A user active only in the revisit window (not the cohort window)
    must NOT count as retained — CH's r[i] = cond1 AND cond_i."""
    rows = [
        # user 1: cohort + week-1 revisit -> retained_w1
        Row(event_id=1, ts=_ts(2), user_id=1, event_type="view", value=1.0, props="{}"),
        Row(event_id=2, ts=_ts(9), user_id=1, event_type="view", value=1.0, props="{}"),
        # user 2: cohort only
        Row(event_id=3, ts=_ts(3), user_id=2, event_type="view", value=1.0, props="{}"),
        # user 3: week-1 activity but NO cohort -> not retained, not cohort
        Row(event_id=4, ts=_ts(10), user_id=3, event_type="view", value=1.0, props="{}"),
        # user 4: cohort + week-2 revisit -> retained_w2
        Row(event_id=5, ts=_ts(1), user_id=4, event_type="view", value=1.0, props="{}"),
        Row(event_id=6, ts=_ts(16), user_id=4, event_type="view", value=1.0, props="{}"),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d35_retention

    out = d35_retention(spark, sf).collect()[0]
    assert out.cohort == 3  # users 1, 2, 4
    assert out.retained_w1 == 1  # user 1 only (user 3 gated out)
    assert out.retained_w2 == 1  # user 4
    assert out.users_total == 4


def test_histogram_bins_and_extrema(spark, tmp_path):
    """Bin boundaries are half-open [lo, hi) and min/max are exact."""
    vals = [0.5, 49.9, 50.0, 99.0, 250.1]
    rows = [
        Row(event_id=i, ts=_ts(1), user_id=1, event_type="view", value=v, props="{}")
        for i, v in enumerate(vals)
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d36_histogram

    got = {r.bin: r for r in d36_histogram(spark, sf).collect()}
    assert got[0].cnt == 2 and got[0].v_min == 0.5 and got[0].v_max == 49.9
    assert got[1].cnt == 2 and got[1].v_min == 50.0  # 50.0 lands in bin 1
    assert got[5].cnt == 1 and got[5].lo == 250.0 and got[5].hi == 300.0


def test_entropy_uniform_and_degenerate(spark, tmp_path):
    """Uniform over 4 values -> 2 bits; single value -> 0 bits."""
    rows = [
        # 'view': uniform over k in {0,1,2,3} -> entropy 2 bits
        *[
            Row(event_id=i, ts=_ts(1), user_id=1, event_type="view",
                value=1.0, props='{"k": %d}' % (i % 4))
            for i in range(8)
        ],
        # 'click': all k=7 -> entropy 0
        *[
            Row(event_id=100 + i, ts=_ts(1), user_id=1, event_type="click",
                value=1.0, props='{"k": 7}')
            for i in range(5)
        ],
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d37_entropy

    got = {r.event_type: r for r in d37_entropy(spark, sf).collect()}
    assert got["view"].distinct_k == 4
    assert got["view"].entropy_bits == pytest.approx(2.0, abs=1e-5)
    assert got["click"].entropy_bits == pytest.approx(0.0, abs=1e-9)


def test_linreg_recovers_planted_line(spark, tmp_path):
    """y = 3x + 10 exactly -> slope 3, intercept 10."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(event_id=i, ts=base + dt.timedelta(days=i), user_id=1,
            event_type="view", value=3.0 * i + 10.0, props="{}")
        for i in range(10)
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d39_simple_linreg

    out = d39_simple_linreg(spark, sf).collect()[0]
    assert out.slope == pytest.approx(3.0, abs=1e-4)
    assert out.intercept == pytest.approx(10.0, abs=1e-3)


def test_cramers_v_perfect_and_independent(spark, tmp_path):
    """event_type == f(k): V = 1. Independent uniform grid: V = 0."""
    # perfect association: type 'view' <-> k%10==0, 'click' <-> k%10==1
    rows = []
    for i in range(20):
        t = "view" if i % 2 == 0 else "click"
        k = 0 if t == "view" else 1
        rows.append(
            Row(event_id=i, ts=_ts(1), user_id=1, event_type=t,
                value=1.0, props='{"k": %d}' % k)
        )
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d40_cramers_v

    out = d40_cramers_v(spark, sf).collect()[0]
    assert out.cramers_v == pytest.approx(1.0, abs=1e-5)

    # independence: every (type, k) cell equal count
    rows2 = []
    eid = 0
    for t in ("view", "click"):
        for k in (0, 1):
            for _ in range(5):
                rows2.append(
                    Row(event_id=eid, ts=_ts(1), user_id=1, event_type=t,
                        value=1.0, props='{"k": %d}' % k)
                )
                eid += 1
    sf2 = str(tmp_path / "sf2")
    spark.createDataFrame(rows2).write.parquet(f"{sf2}/events.parquet")
    out2 = d40_cramers_v(spark, sf2).collect()[0]
    assert out2.cramers_v == pytest.approx(0.0, abs=1e-5)


def test_exp_decay_weights_latest_most(spark, tmp_path):
    """The decayed avg must sit between min and max, strictly closer to
    the latest value than the plain mean when the latest is extreme, and
    equal the value exactly for a single-event user."""
    rows = [
        Row(event_id=0, ts=_ts(1), user_id=1, event_type="view", value=10.0, props="{}"),
        Row(event_id=1, ts=_ts(10), user_id=1, event_type="view", value=10.0, props="{}"),
        Row(event_id=2, ts=_ts(20), user_id=1, event_type="view", value=100.0, props="{}"),
        Row(event_id=3, ts=_ts(5), user_id=2, event_type="view", value=42.0, props="{}"),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d41_exp_decay_avg

    got = {r.user_id: r for r in d41_exp_decay_avg(spark, sf).collect()}
    mean = (10.0 + 10.0 + 100.0) / 3
    assert 10.0 < got[1].decayed_avg <= 100.0
    assert got[1].decayed_avg > mean  # recency-weighted toward the 100
    assert got[2].decayed_avg == pytest.approx(42.0)
    # anchor weight: the latest event has weight exactly 1
    assert got[1].den >= 1.0


def test_avg_weighted_hand_example(spark, tmp_path):
    """avgWeighted((p,w)) = sum(p*w)/sum(w) on a 3-row hand example."""
    rows = [
        Row(l_orderkey=1, l_partkey=1, l_suppkey=1, l_linenumber=1,
            l_quantity=2.0, l_extendedprice=10.0, l_discount=0.0, l_tax=0.0,
            l_returnflag="A", l_linestatus="O", l_shipdate=_ts(1)),
        Row(l_orderkey=2, l_partkey=1, l_suppkey=1, l_linenumber=1,
            l_quantity=6.0, l_extendedprice=40.0, l_discount=0.0, l_tax=0.0,
            l_returnflag="A", l_linestatus="O", l_shipdate=_ts(1)),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/lineitem.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d38_avg_weighted

    out = d38_avg_weighted(spark, sf).collect()[0]
    assert out.wavg_price == pytest.approx((20.0 + 240.0) / 8.0)


def test_bitmap_ops_identities(spark, tmp_path):
    """AND + ANDNOT = card(A); OR = card(A)+card(B)-AND."""
    rows = [
        _mk_ev(0, 1, "view"), _mk_ev(1, 1, "purchase"),   # user1: both
        _mk_ev(2, 2, "view"),                              # user2: view only
        _mk_ev(3, 3, "purchase"),                          # user3: purchase only
        _mk_ev(4, 4, "click"),                             # user4: neither
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d42_bitmap_ops

    out = d42_bitmap_ops(spark, sf).collect()[0]
    assert (out.card_view, out.card_purchase) == (2, 2)
    assert out.card_and == 1 and out.card_andnot == 1
    assert out.card_or == out.card_view + out.card_purchase - out.card_and == 3


def _mk_ev(eid, uid, et):
    import datetime as _dt
    from pyspark.sql import Row as _Row

    return _Row(event_id=eid, ts=_dt.datetime(2024, 1, 1), user_id=uid,
                event_type=et, value=1.0, props="{}")


def test_point_in_polygon_matches_reference_raycast():
    """The generated edge-term SQL (evaluated in DuckDB) agrees with a
    from-first-principles Python ray cast over a dense integer grid,
    including points well inside, outside, and near edges."""
    import duckdb

    from mysql_to_clickhouse_spark.operators.scalars import (
        _G29_POLY,
        _g29_edge_sql,
    )

    def ref_inside(px, py):
        n = len(_G29_POLY)
        c = 0
        for i in range(n):
            x1, y1 = _G29_POLY[i]
            x2, y2 = _G29_POLY[(i + 1) % n]
            if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (
                y2 - y1
            ) + x1:
                c += 1
        return c % 2

    con = duckdb.connect()
    expr = " + ".join(_g29_edge_sql("px", "py"))
    got = con.sql(
        f"SELECT px, py, ({expr}) % 2 AS inside "
        "FROM (SELECT x AS px, y AS py FROM range(-20, 60, 4) t1(x), "
        "range(-15, 60, 4) t2(y))"
    ).fetchall()
    assert len(got) == 20 * 19
    for px, py, inside in got:
        assert inside == ref_inside(px, py), (px, py)
    # sanity anchors
    assert ref_inside(20, 20) == 1
    assert ref_inside(-15, 5) == 0


def test_format_readable_tie_case(spark, tmp_path):
    """171136 B = 167.125 KiB — the printf tie case — must render by
    truncation as 167.12 KiB on the engine side."""
    from pyspark.sql import Row

    rows = [
        Row(c_custkey=128, c_name="x", c_nationkey=0, c_acctbal=0.0,
            c_mktsegment="BUILDING"),
        Row(c_custkey=1, c_name="y", c_nationkey=0, c_acctbal=0.0,
            c_mktsegment="BUILDING"),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/customer.parquet")

    from mysql_to_clickhouse_spark.operators.scalars import g28_format_readable

    got = {r.c_custkey: r.readable for r in g28_format_readable(spark, sf).collect()}
    assert got[128] == "167.12 KiB"   # 128*1337 = 171136 = 167.125 KiB
    assert got[1] == "1.30 KiB"       # 1337 B = 1.30566... KiB


def test_sum_distinct_folds_each_value_once(spark, tmp_path):
    rows = [
        _mk_ev(0, 1, "view"), _mk_ev(1, 2, "view"), _mk_ev(2, 3, "view"),
    ]
    # give duplicated values: 5.0, 5.0, 7.5
    rows[0] = rows[0].asDict(); rows[0]["value"] = 5.0
    rows[1] = rows[1].asDict(); rows[1]["value"] = 5.0
    rows[2] = rows[2].asDict(); rows[2]["value"] = 7.5
    from pyspark.sql import Row as R
    sf = str(tmp_path / "sf")
    spark.createDataFrame([R(**r) for r in rows]).write.parquet(
        f"{sf}/events.parquet"
    )

    from mysql_to_clickhouse_spark.operators.stats import d43_sum_distinct

    out = d43_sum_distinct(spark, sf).collect()[0]
    assert out.n_distinct_values == 2
    assert out.sum_distinct == 12.5
    assert out.avg_distinct == 6.25


def test_mad_hand_example(spark, tmp_path):
    """values 1,2,3,4,100 -> median 3, deviations 2,1,0,1,97 -> MAD 1."""
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    rows = [
        Row(event_id=i, ts=_ts(1), user_id=1, event_type="view",
            value=v, props="{}")
        for i, v in enumerate(vals)
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d44_mad

    out = d44_mad(spark, sf).collect()[0]
    assert out.median_value == 3.0
    assert out.mad_value == 1.0


def test_rank_corr_monotone_extremes(spark, tmp_path):
    """Spearman is +1 under any monotone map, -1 under anti-monotone,
    regardless of nonlinearity."""
    rows = []
    for i in range(20):
        # 'view': kv increases with value (nonlinearly) -> rho = 1
        rows.append(Row(event_id=i, ts=_ts(1), user_id=1, event_type="view",
                        value=float(i), props='{"k": %d}' % (i * i)))
        # 'click': kv decreases with value -> rho = -1
        rows.append(Row(event_id=100 + i, ts=_ts(1), user_id=1,
                        event_type="click", value=float(i),
                        props='{"k": %d}' % (400 - i * i)))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d48_rank_corr

    got = {r.event_type: r.rank_corr for r in d48_rank_corr(spark, sf).collect()}
    assert got["view"] == pytest.approx(1.0, abs=1e-9)
    assert got["click"] == pytest.approx(-1.0, abs=1e-9)


def test_theils_u_extremes(spark, tmp_path):
    """U = 1 when Y determines X exactly; U = 0 under independence."""
    rows = []
    for i in range(24):
        t = "view" if i % 2 == 0 else "click"
        k = 0 if t == "view" else 1          # Y determines X
        rows.append(Row(event_id=i, ts=_ts(1), user_id=1, event_type=t,
                        value=1.0, props='{"k": %d}' % k))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d49_theils_u

    out = d49_theils_u(spark, sf).collect()[0]
    assert out.theils_u == pytest.approx(1.0, abs=1e-6)

    rows2 = []
    eid = 0
    for t in ("view", "click"):
        for k in (0, 1):
            for _ in range(6):               # uniform grid: independent
                rows2.append(Row(event_id=eid, ts=_ts(1), user_id=1,
                                 event_type=t, value=1.0,
                                 props='{"k": %d}' % k))
                eid += 1
    sf2 = str(tmp_path / "sf2")
    spark.createDataFrame(rows2).write.parquet(f"{sf2}/events.parquet")
    out2 = d49_theils_u(spark, sf2).collect()[0]
    assert out2.theils_u == pytest.approx(0.0, abs=1e-6)


def test_auc_perfect_random_and_sklearn_free_reference(spark, tmp_path):
    """Perfect separation -> AUC 1; anti-separation -> 0; a tied/mixed
    hand example matches the brute-force pair-counting definition."""
    def build(sf_dir, pairs):
        rows = [
            Row(event_id=i, ts=_ts(1), user_id=1,
                event_type=("purchase" if lab == 1 else "click"),
                value=float(s), props="{}")
            for i, (lab, s) in enumerate(pairs)
        ]
        spark.createDataFrame(rows).write.parquet(f"{sf_dir}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d50_auc

    sf1 = str(tmp_path / "a")
    build(sf1, [(1, 10), (1, 9), (0, 2), (0, 1)])
    assert d50_auc(spark, sf1).collect()[0].auc == 1.0

    sf2 = str(tmp_path / "b")
    build(sf2, [(0, 10), (0, 9), (1, 2), (1, 1)])
    assert d50_auc(spark, sf2).collect()[0].auc == 0.0

    # mixed with ties: brute-force pair counting
    pairs = [(1, 5), (1, 3), (0, 5), (0, 2), (1, 2), (0, 4)]
    sf3 = str(tmp_path / "c")
    build(sf3, pairs)
    pos = [s for l, s in pairs if l == 1]
    neg = [s for l, s in pairs if l == 0]
    brute = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    ) / (len(pos) * len(neg))
    assert d50_auc(spark, sf3).collect()[0].auc == brute


def _ev_row(i, user, etype, value, day=2):
    return Row(
        event_id=i, ts=_ts(day), user_id=user, event_type=etype,
        value=value, props="{}",
    )


def test_ks_test_matches_brute_force(spark, tmp_path):
    """d56's integer-path D must equal a brute-force two-sample KS
    computed pointwise in Python (exact: both sides are integers until
    the single final division)."""
    a_vals = [1.0, 2.5, 2.5, 7.0, 9.0, 12.0, 3.25]
    b_vals = [0.5, 2.5, 4.0, 4.0, 8.0, 15.0, 15.0, 20.0]
    rows = [
        _ev_row(i, 1, "click", v) for i, v in enumerate(a_vals)
    ] + [
        _ev_row(100 + i, 2, "view", v) for i, v in enumerate(b_vals)
    ] + [_ev_row(999, 3, "purchase", 5.0)]  # other types must be ignored
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d56_ks_test

    out = d56_ks_test(spark, sf).collect()[0]
    na, nb = len(a_vals), len(b_vals)
    d_num = max(
        abs(sum(x <= v for x in a_vals) * nb - sum(x <= v for x in b_vals) * na)
        for v in set(a_vals) | set(b_vals)
    )
    assert out.n_a == na and out.n_b == nb
    assert out.d_num == d_num
    assert out.ks_d == d_num / (float(na) * float(nb))


def test_ks_test_identical_samples_zero(spark, tmp_path):
    """Identical click/view distributions -> D = 0 exactly."""
    rows = []
    for i, v in enumerate([1.0, 2.0, 2.0, 3.5, 8.0]):
        rows.append(_ev_row(i, 1, "click", v))
        rows.append(_ev_row(100 + i, 2, "view", v))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d56_ks_test

    out = d56_ks_test(spark, sf).collect()[0]
    assert out.d_num == 0 and out.ks_d == 0.0


def test_anova_f_matches_reference(spark, tmp_path):
    """d57's F statistic vs a plain-Python one-way ANOVA on values that
    are exact at fixed-point scale 4 (no truncation error)."""
    groups = {
        "click": [1.0, 2.0, 3.0, 4.0],
        "view": [2.5, 3.5, 4.5],
        "purchase": [10.0, 11.0, 12.0, 13.0, 14.0],
    }
    rows, i = [], 0
    for et, vs in groups.items():
        for v in vs:
            rows.append(_ev_row(i, 1, et, v))
            i += 1
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d57_anova_f

    out = d57_anova_f(spark, sf).collect()[0]
    all_v = [v for vs in groups.values() for v in vs]
    n, k = len(all_v), len(groups)
    grand = sum(all_v) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - grand) ** 2 for vs in groups.values())
    ssw = sum(
        (v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs
    )
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert out.k_groups == k and out.n_rows == n
    assert math.isclose(out.ss_between, ssb, rel_tol=1e-9)
    assert math.isclose(out.ss_within, ssw, rel_tol=1e-9)
    assert math.isclose(out.f_stat, f_ref, rel_tol=1e-9)


def test_observe_metrics_counts_nulls_and_hot(spark, tmp_path):
    """a30's observation must report the planted hot-row and NULL
    counters exactly (the fixtures carry no NULL values, so this is
    the only place the null lane is exercised)."""
    rows = [
        _ev_row(1, 1, "view", 450.0),
        _ev_row(2, 1, "view", 10.0),
        _ev_row(3, 2, "click", None),
        _ev_row(4, 2, "click", 401.5),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.scans import a30_observe_metrics

    out = a30_observe_metrics(spark, sf).collect()[0]
    assert out.rows_scanned == 4
    assert out.hot_rows == 2
    assert out.null_values == 1
    assert out.value_sum_fp == int(450.0 * 10000) + 100000 + 4015000


def test_ks_test_empty_sample_yields_null(spark, tmp_path):
    """KS with an empty second sample is undefined: ks_d must be NULL
    (not an ANSI divide-by-zero crash, not an IEEE NaN)."""
    rows = [_ev_row(i, 1, "click", float(i + 1)) for i in range(5)]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d56_ks_test

    out = d56_ks_test(spark, sf).collect()[0]
    assert out.n_a == 5 and out.n_b == 0
    assert out.d_num == 0
    assert out.ks_d is None


def test_anova_single_group_yields_null_f(spark, tmp_path):
    """One group -> F undefined -> NULL (the d56 guard discipline)."""
    rows = [_ev_row(i, 1, "view", float(i)) for i in range(4)]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d57_anova_f

    out = d57_anova_f(spark, sf).collect()[0]
    assert out.k_groups == 1 and out.f_stat is None


def test_corr_matrix_zero_variance_yields_null(spark, tmp_path):
    """A constant column has no defined correlation -> NULL, not a
    divide-by-zero."""
    rows = []
    for i in range(4):
        rows.append((1, i, 1, 1, 5.0, 10.0, 0.05, 0.0, "N", "O",
                     __import__("datetime").datetime(1996, 1, 2)))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/lineitem.parquet")

    from mysql_to_clickhouse_spark.operators.stats import d61_corr_matrix

    out = d61_corr_matrix(spark, sf).collect()[0]
    assert out.corr_qty_price is None  # both constant


def test_ks_property_random_samples(spark, tmp_path):
    """Property: for seeded random two-decimal samples, d56's integer
    path equals the brute-force pointwise KS exactly (8 deterministic
    cases — heavier per-example cost than a hypothesis sweep warrants,
    same coverage intent as the dsum property test)."""
    import random

    for case in range(8):
        rng = random.Random(987_000 + case)
        a_vals = [round(rng.uniform(0, 50), 2) for _ in range(rng.randint(1, 40))]
        b_vals = [round(rng.uniform(0, 50), 2) for _ in range(rng.randint(1, 40))]
        # force ties across samples in half the cases
        if case % 2:
            b_vals[: len(a_vals) // 2] = a_vals[: len(a_vals) // 2]
        rows = [_ev_row(i, 1, "click", v) for i, v in enumerate(a_vals)] + [
            _ev_row(1000 + i, 2, "view", v) for i, v in enumerate(b_vals)
        ]
        sf = str(tmp_path / f"sf{case}")
        spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")

        from mysql_to_clickhouse_spark.operators.stats import d56_ks_test

        out = d56_ks_test(spark, sf).collect()[0]
        na, nb = len(a_vals), len(b_vals)
        d_num = max(
            abs(
                sum(x <= v for x in a_vals) * nb
                - sum(x <= v for x in b_vals) * na
            )
            for v in set(a_vals) | set(b_vals)
        )
        assert (out.n_a, out.n_b, out.d_num) == (na, nb, d_num), f"case {case}"
        assert out.ks_d == d_num / (float(na) * float(nb)), f"case {case}"
