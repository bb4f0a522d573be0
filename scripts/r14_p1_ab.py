"""r14: alternate OLD vs NEW x21 form in one process (drift-cancelling
A/B). Old form reconstructed inline; new form from the registry."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402

from mysql_to_clickhouse_spark.session import build_session  # noqa: E402
from mysql_to_clickhouse_spark.registry import all_queries  # noqa: E402
from mysql_to_clickhouse_spark.tables import load  # noqa: E402
from mysql_to_clickhouse_spark.plans.boundary import checkpoint_boundary  # noqa: E402
from mysql_to_clickhouse_spark.plans.dispatch import fact_bytes_estimate  # noqa: E402
from mysql_to_clickhouse_spark.plans.prefix import running_sums_keyed  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/scale_docs_1e8"

spark = build_session(app_name="r14_p1_ab", master="local[32]",
                      shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")


def old_x21():
    docs = load(spark, SF_DIR, "documents")
    toks = F.split("text", " ")
    n_words = F.size(toks).cast("long")
    flags = docs.select(
        "doc_id", "n_chars",
        F.unhex(F.md5("text")).alias("h"),
        n_words.alias("n_words"),
        (F.length("text").cast("long") - n_words + 1).alias("n_word_chars"),
        F.size(F.filter(toks, lambda w: F.length(w) <= 2))
        .cast("long").alias("n_tiny"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )
    mean_wl = F.col("n_word_chars").cast("double") / F.col("n_words")
    gated = flags.filter(
        F.col("n_words").between(5, 100000)
        & mean_wl.between(3.0, 12.0)
        & (F.col("n_tiny").cast("double") / F.col("n_words") <= 0.4)
        & (F.col("n_distinct").cast("double") / F.col("n_words") >= 0.2)
        & F.col("n_chars").between(50, 5000)
    ).select("h", "doc_id", "n_chars")
    kept = (
        gated.groupBy("h")
        .agg(F.min(F.struct("doc_id", "n_chars")).alias("kr"))
        .select("kr.*")
    )
    if fact_bytes_estimate(docs) > (2 << 30):
        kept = checkpoint_boundary(kept)
    cum, _ = running_sums_keyed(kept, "doc_id", {"cum_chars": F.col("n_chars")})
    packed = cum.withColumn(
        "shard", F.expr("CAST((cum_chars - n_chars) DIV 2000 AS BIGINT)"))
    return (
        packed.groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("n_chars").cast("long").alias("total_chars"),
             F.min("doc_id").cast("long").alias("first_doc"),
             F.max("doc_id").cast("long").alias("last_doc"))
        .select("shard", "n_docs", "total_chars", "first_doc", "last_doc")
    )


new_fn = all_queries()["x21_corpus_build"].fn


def run(fn):
    t0 = time.time()
    df = fn() if fn is old_x21 else fn(spark, SF_DIR)
    df = df.agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("n_docs").cast("long").alias("s"))
    df.toPandas()
    return time.time() - t0


import statistics
res = {"old": [], "new": []}
for i in range(3):
    for name, fn in (("old", old_x21), ("new", new_fn)):
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)
        t = run(fn)
        res[name].append(t)
        print(f"{name} run {i}: {t:.2f}s", flush=True)
for name, ts in res.items():
    print(f"{name}: median {statistics.median(ts):.2f}s "
          f"[{min(ts):.2f}..{max(ts):.2f}]", flush=True)
spark.stop()
