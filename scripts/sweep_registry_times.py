"""r13 breadth sweep: Spark-side wall time of EVERY registered query.

For each registry entry at $SPARK_GRAFT_SF_DIR (default sf0.01):
cold = build+execute+toPandas of a fresh invocation;
warm = median of 3 repeats on the same DataFrame (prepared-plan model).
Writes JSON to stdout, sorted by cold desc. Purely diagnostic — the
optimization round's checklist source.

Usage: python scripts/sweep_registry_times.py [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

    from mysql_to_clickhouse_spark.registry import all_queries
    from mysql_to_clickhouse_spark.session import build_session

    spark = build_session(app_name="sweep_registry")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, q in sorted(all_queries().items()):
        try:
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.toPandas()
            cold = time.perf_counter() - t0
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                df.toPandas()
                runs.append(time.perf_counter() - t0)
            out[name] = {
                "cold": round(cold, 3),
                "warm": round(statistics.median(runs), 3),
            }
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)

    ranked = dict(
        sorted(out.items(), key=lambda kv: kv[1].get("cold", 99), reverse=True)
    )
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_registry.json"
    with open(dest, "w") as fh:
        json.dump(ranked, fh, indent=1)
    print(json.dumps({"n": len(out), "out": dest}))


if __name__ == "__main__":
    main()
