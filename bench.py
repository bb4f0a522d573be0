#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headliners mirror the BASELINE.md anchor set (DuckDB 1.0.0 measured on
this machine) so BENCH_r{N}.json is directly comparable:
q1_pricing_summary / q3_shipping_priority / q5_local_supplier /
w1_topk_per_customer / e1_daily_active / d1_dedup_docs / v1_cosine_topk.

Timing protocol: one shared SparkSession (plan/JIT overhead amortized,
as in any long-lived deployment), 1 warm-up + 3 timed runs per query,
median reported; the metric is the sum of medians over the queryset.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# headline name (BASELINE.md) → registry query id
HEADLINERS = {
    "q1_pricing_summary": "d1_group_basic",
    "q3_shipping_priority": "c12_q3_shipping",
    "q5_local_supplier": "c10_star_multiway",
    "w1_topk_per_customer": "e1_row_number",
    "e1_daily_active": "d3_count_distinct",
    "d1_dedup_docs": "i1_exact_dedup",
    "v1_cosine_topk": "i4_topk_similar",
}

WARMUPS = 1
RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from mysql_to_clickhouse_spark.registry import all_queries
    from mysql_to_clickhouse_spark.session import build_session

    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    timings: dict[str, float] = {}
    for headline, qid in HEADLINERS.items():
        fn = queries[qid].fn
        for _ in range(WARMUPS):
            fn(spark, sf_dir).collect()
        runs = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[headline] = round(statistics.median(runs), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queryset_median_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
