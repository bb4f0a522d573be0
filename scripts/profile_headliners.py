"""r13 measurement harness (guide §1): per-headliner phase timing.

For each headline query at $SPARK_GRAFT_SF_DIR:
- warm median of toPandas() (the bench protocol, for comparability)
- warm median of the noop sink (computation only, guide §1.4)
- .explain("formatted") captured to plans/r13/<headline>_<tag>.txt

Usage: python scripts/profile_headliners.py [tag] [--only name]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINERS  # noqa: E402

RUNS = 5


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

    from mysql_to_clickhouse_spark.registry import all_queries
    from mysql_to_clickhouse_spark.session import build_session

    spark = build_session(app_name="profile_headliners")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for headline, qid in HEADLINERS.items():
        if only and headline != only:
            continue
        fn = queries[qid].fn
        spark.sparkContext.setJobDescription(f"{headline}: first")
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()
        first = time.perf_counter() - t0
        df = fn(spark, sf_dir)
        from mysql_to_clickhouse_spark.plans.explain import plan_of

        with open(os.path.join(plans_dir, f"{headline}_{tag}.txt"), "w") as fh:
            fh.write(plan_of(df))
        fetch_runs, noop_runs = [], []
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"{headline}: warm fetch {i}")
            t0 = time.perf_counter()
            df.toPandas()
            fetch_runs.append(time.perf_counter() - t0)
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"{headline}: warm noop {i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            noop_runs.append(time.perf_counter() - t0)
        out[headline] = {
            "first": round(first, 4),
            "warm_fetch": round(statistics.median(fetch_runs), 4),
            "warm_noop": round(statistics.median(noop_runs), 4),
            "fetch_spread": [round(min(fetch_runs), 4), round(max(fetch_runs), 4)],
            "noop_spread": [round(min(noop_runs), 4), round(max(noop_runs), 4)],
        }
        # same inter-headliner hygiene as bench.py
        try:
            from mysql_to_clickhouse_spark.operators.llmops import release_caches
            from mysql_to_clickhouse_spark.plans.dispatch import release_probe_state

            release_caches(spark)
            release_probe_state(spark)
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    import json

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
