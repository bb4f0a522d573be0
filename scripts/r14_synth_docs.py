"""r14: synthesize the 1e8-doc corpus once into a kept dir for p1
profiling (same deterministic synthesis as scripts/bench_scale.py /
stress_docs.py — identical bytes, reusable across profile runs)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from mysql_to_clickhouse_spark.session import build_session  # noqa: E402
from scripts.stress_docs import synth_docs_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/root/scale_docs_{N}"

spark = build_session(app_name="r14_synth", master="local[16]",
                      shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
synth_docs_spark(spark, f"{OUT}/documents.parquet", N, 12, 0)
print(f"synthesized {N:,} docs in {time.time()-t0:.0f}s at {OUT}",
      flush=True)
spark.stop()
