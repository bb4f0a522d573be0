"""r14: A/B x21 flags+gate+dedup variants at 1e8 docs (noop sink)."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402

from mysql_to_clickhouse_spark.session import build_session  # noqa: E402
from mysql_to_clickhouse_spark.tables import load  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/scale_docs_1e8"
RUNS = 3

spark = build_session(app_name="r14_p1_variants", master="local[32]",
                      shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
docs = load(spark, SF_DIR, "documents")


def timed(label, df):
    times = []
    for _ in range(RUNS):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
    print(f"{label}: median {statistics.median(times):.2f}s "
          f"[{min(times):.2f}..{max(times):.2f}]", flush=True)


# --- V0: current form (flags project + filter; pushdown re-inlines) ---
def v0_gated():
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
    return flags.filter(
        F.col("n_words").between(5, 100000)
        & mean_wl.between(3.0, 12.0)
        & (F.col("n_tiny").cast("double") / F.col("n_words") <= 0.4)
        & (F.col("n_distinct").cast("double") / F.col("n_words") >= 0.2)
        & F.col("n_chars").between(50, 5000)
    ).select("h", "doc_id", "n_chars")


# --- V1: one-bound-lambda gate (split once), md5 post-filter ---
def v1_gated():
    def gate(t):
        nw = F.size(t).cast("long")
        mean_wl = (F.length("text").cast("long") - nw + 1).cast(
            "double") / nw
        return (
            F.col("n_chars").between(50, 5000)
            & nw.between(5, 100000)
            & mean_wl.between(3.0, 12.0)
            & (F.size(F.filter(t, lambda w: F.length(w) <= 2))
               .cast("double") / nw <= 0.4)
            & (F.size(F.array_distinct(t)).cast("double") / nw >= 0.2)
        )

    keep = F.exists(F.array(F.split("text", " ")), gate)
    return docs.filter(keep).select(
        F.unhex(F.md5("text")).alias("h"), "doc_id", "n_chars"
    )


for name, g in (("V0 gate", v0_gated), ("V1 gate", v1_gated)):
    timed(name, g())

# --- dedup keeper variants on top of V1 ---
timed("V1 + min(struct)", v1_gated().groupBy("h").agg(
    F.min(F.struct("doc_id", "n_chars")).alias("kr")).select("kr.*"))
timed("V1 + min/min_by", v1_gated().groupBy("h").agg(
    F.min("doc_id").alias("doc_id"),
    F.min_by("n_chars", "doc_id").alias("n_chars")))

spark.stop()
