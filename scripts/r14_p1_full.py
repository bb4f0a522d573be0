"""r14: full x21_corpus_build at 1e8 docs, bench_scale protocol
(toPandas digest, cold + 3 fresh warm runs, inter-run GC hygiene).
Also dumps .explain('formatted') of the gate+dedup segment."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402

from mysql_to_clickhouse_spark.session import build_session  # noqa: E402
from mysql_to_clickhouse_spark.registry import all_queries  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/scale_docs_1e8"
TAG = sys.argv[2] if len(sys.argv) > 2 else "after"

spark = build_session(app_name="r14_p1_full", master="local[32]",
                      shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
q = all_queries()["x21_corpus_build"]


def run():
    t0 = time.time()
    df = q.fn(spark, SF_DIR)
    df = df.agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("n_docs").cast("long").alias("s"))
    pdf = df.toPandas()
    return time.time() - t0, pdf.iloc[0].to_dict()


t, digest = run()
print(f"x21 cold: {t:.2f}s digest={digest}", flush=True)
for i in range(3):
    spark.sparkContext._jvm.System.gc()
    time.sleep(1)
    t, _ = run()
    print(f"x21 warm {i}: {t:.2f}s", flush=True)

# plan dump of the whole query (pre-execution initial plan)
import contextlib
import io

buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    q.fn(spark, SF_DIR).explain("formatted")
with open(f"/root/repo/plans/r14/p1_corpus_build_{TAG}.txt", "w") as fh:
    fh.write(buf.getvalue())
print("plan dumped", flush=True)
spark.stop()
