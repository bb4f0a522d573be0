"""Registry-wide plan hygiene: no query may silently plan a cartesian
product or an unexpected broadcast-nested-loop — the two shapes that
detonate at 100 TB. Whitelisted exceptions are the operators whose
SEMANTICS are a cross/theta join (bounded inputs by design)."""

from __future__ import annotations

import pytest

from mysql_to_clickhouse_spark.plans.explain import plan_of
from mysql_to_clickhouse_spark.registry import all_queries
from tests.conftest import SMOKE_SF_DIR

QUERIES = all_queries()

# semantics ARE a cartesian/theta join over bounded inputs:
CARTESIAN_OK = {
    "c7_cross",          # explicit cross join (5 × 25)
    "c8_theta_range",    # band join against 10 broadcast buckets
    "h4_watermark_late", # scalar (1-row) max cross join
    "i3_cosine_pairs",   # kernel op (no join; pairs inside mapInPandas)
    "i3b_cosine_zipwith",# bounded pair triangle by design
    "i6_tfidf_keywords", # scalar doc-count cross join
    "i4d_ann_ivf",       # centroid-assignment cross vs 16 broadcast rows
    "i4f_ann_index_serve",  # same 16-broadcast-row centroid assignment
                            # (build + probe sides of the persisted index)
    "i17b_topk_bound",   # scalar total-gram-count cross join (N for the bound)
    "i17c_topk_weighted",  # scalar total-weight cross join (W for the bound)
    "x9_tpch_q22",       # scalar (1-row) mean-balance cross join
    "a19_zorder_layout", # scalar (1-row) min/max-bounds cross join
    "a20_ttl_rollup",    # scalar (1-row) max-ts age cutoff cross join
    "i20_mix_rebalance", # scalar (1-row) mixture-budget cross join
    "i21_source_divergence",  # scalar (1-row) global-total cross join
    "s6_quantified_all",  # scalar (1-row) ALL-bound cross join (the decorrelation)
    "i23_bigram_surprisal",  # scalar (1-row) vocab-size cross join (smoothing V)
    "d40_cramers_v",     # contingency-grid densification cross join (|a|x|b| <= 50 post-agg rows)
    "d40b_cramers_v_corrected",  # same grid (wraps d40)
    "i27_heaps_law",     # scalar (1-row) totals cross join onto the OLS sums row
    "i28_semantic_decontam",  # corpus x broadcast eval-set scan (eval sets are small by construction)
    "d49_theils_u",      # scalar (1-row x 1-row) entropy-terms cross join
    "d62_with_totals",   # scalar (1-row) totals-row cross join (the HAVING
                         # threshold joins |groups| rows vs 1 broadcast row)
    "d62b_totals_after_having_inclusive",  # same 1-row totals cross join
    "d62c_totals_after_having_exclusive",  # same 1-row totals cross join
    "g34_edit_distance", # 25x25 dim-dim pair triangle (the pair source is
                         # a blocked candidate set in production; see doc)
}

# queries whose side effects / streaming make a plain plan dump moot
SKIP = {"h8_rate_replay", "h11_stream_stream", "h13_stream_enrich"}


@pytest.mark.parametrize("name", [n for n in QUERIES if n not in SKIP])
def test_no_unplanned_cartesian(spark, name):
    df = QUERIES[name].fn(spark, SMOKE_SF_DIR)
    plan = plan_of(df, "simple")
    if name in CARTESIAN_OK:
        return
    assert "CartesianProduct" not in plan, f"{name} planned a cartesian:\n{plan}"
    assert (
        "BroadcastNestedLoopJoin" not in plan
    ), f"{name} planned a broadcast nested loop:\n{plan}"


# ---------------------------------------------------------------------------
# No single-partition global windows (the other 100 TB detonator)
# ---------------------------------------------------------------------------

# A partition-less Window funnels its whole input into ONE task. The only
# acceptable cases are windows whose INPUT is bounded by something other
# than the data size — a fixed value domain or an explicit LIMIT — never
# by "the data happens to be small". Everything else must use the
# two-phase parallel prefix scan (plans/prefix.py).
GLOBAL_WINDOW_OK = {
    # input bounded by a fixed value domain (post-aggregate rows):
    "e4_moving_avg": "|calendar days| rows (daily pre-aggregate)",
    "s10b_with_fill_interpolate": "day-grid rows (WITH FILL sequence)",
    "d40_cramers_v": "contingency cells <= |event_type| x 10",
    "d40b_cramers_v_corrected": "same contingency grid (wraps d40)",
    "d49_theils_u": "contingency cells <= |event_type| x 10",
    "d62b_totals_after_having_inclusive": "|event_type| group rows",
    # input bounded by the operator's own capacity/limit constant:
    "i17b_topk_bound": "Misra-Gries summaries <= capacity x partitions",
    "i17c_topk_weighted": "Misra-Gries summaries <= capacity x partitions",
    "c20_paste_join": "TakeOrdered .limit(20) feeds the rank window",
}


@pytest.mark.parametrize("name", [n for n in QUERIES if n not in SKIP])
def test_no_global_window(spark, name):
    from mysql_to_clickhouse_spark.plans.explain import global_window_nodes

    df = QUERIES[name].fn(spark, SMOKE_SF_DIR)
    hits = global_window_nodes(df)
    if name in GLOBAL_WINDOW_OK:
        assert hits, (
            f"{name} is whitelisted for a global window but no longer "
            "plans one — remove it from GLOBAL_WINDOW_OK"
        )
        return
    assert not hits, (
        f"{name} plans partition-less window node(s) {hits}: every row "
        "funnels into one task at scale. Use plans/prefix.py running_sums/"
        "global_row_number/global_lag, or whitelist with a boundedness "
        "reason."
    )
