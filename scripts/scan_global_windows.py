"""Inventory partition-less logical Window nodes across every registered
query — the single-partition-sort scale-killer scan. Run from /tmp."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

SF = os.environ.get("SCAN_SF", "/root/testdata/sf0.001")


def global_windows(df) -> list[str]:
    """Names of window expressions in logical Window nodes with an empty
    partitionSpec, from the optimized plan's JSON tree."""
    plan = json.loads(
        df._jdf.queryExecution().optimizedPlan().toJSON()
    )
    hits = []
    for node in plan:
        cls = node.get("class", "")
        if cls.endswith(".Window") or cls.endswith(".WindowGroupLimit"):
            if not node.get("partitionSpec"):
                hits.append(cls.rsplit(".", 1)[-1])
    return hits


if __name__ == "__main__":
    from mysql_to_clickhouse_spark.registry import all_queries
    from mysql_to_clickhouse_spark.session import build_session

    spark = build_session()
    flagged = {}
    for name, q in all_queries().items():
        try:
            hits = global_windows(q.fn(spark, SF))
        except Exception as e:  # noqa: BLE001
            flagged[name] = [f"ERROR {type(e).__name__}: {e}"]
            continue
        if hits:
            flagged[name] = hits
    print(json.dumps(flagged, indent=1))
    print(f"{len(flagged)} queries with partition-less Window nodes")
