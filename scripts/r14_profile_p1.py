"""r14 §1 measurement: x21_corpus_build stage attribution at 1e8 docs.

Times each pipeline prefix with the noop sink (guide §1.4) plus the
full bench_scale-protocol run (toPandas digest), labelled per job
(§1.5). Usage: python scripts/r14_profile_p1.py /root/scale_docs_1e8
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402

from mysql_to_clickhouse_spark.session import build_session  # noqa: E402
from mysql_to_clickhouse_spark.registry import all_queries  # noqa: E402
from mysql_to_clickhouse_spark.tables import load  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/scale_docs_1e8"
RUNS = int(os.environ.get("R14_RUNS", "2"))

spark = build_session(app_name="r14_profile_p1", master="local[32]",
                      shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    times = []
    for _ in range(RUNS):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
    print(f"{label}: median {statistics.median(times):.2f}s "
          f"[{min(times):.2f}..{max(times):.2f}]", flush=True)
    return statistics.median(times)


docs = load(spark, SF_DIR, "documents")
toks = F.split("text", " ")
n_words = F.size(toks).cast("long")


def flags_df(with_tiny=True, with_distinct=True, with_md5=True):
    cols = [
        F.col("doc_id"),
        F.col("n_chars"),
        n_words.alias("n_words"),
        (F.length("text").cast("long") - n_words + 1).alias("n_word_chars"),
    ]
    if with_md5:
        cols.insert(2, F.unhex(F.md5("text")).alias("h"))
    if with_tiny:
        cols.append(F.size(F.filter(toks, lambda w: F.length(w) <= 2))
                    .cast("long").alias("n_tiny"))
    if with_distinct:
        cols.append(F.size(F.array_distinct(toks)).cast("long")
                    .alias("n_distinct"))
    return docs.select(*cols)


def gated(fl):
    mean_wl = F.col("n_word_chars").cast("double") / F.col("n_words")
    cond = (
        F.col("n_words").between(5, 100000)
        & mean_wl.between(3.0, 12.0)
        & F.col("n_chars").between(50, 5000)
    )
    if "n_tiny" in fl.columns:
        cond = cond & (F.col("n_tiny").cast("double") / F.col("n_words") <= 0.4)
    if "n_distinct" in fl.columns:
        cond = cond & (
            F.col("n_distinct").cast("double") / F.col("n_words") >= 0.2
        )
    sel = ["doc_id", "n_chars"]
    if "h" in fl.columns:
        sel.insert(0, "h")
    return fl.filter(cond).select(*sel)


# --- stage attribution (noop sink) ---
timed("1 scan: count only", lambda: docs.select("doc_id").write.format(
    "noop").mode("overwrite").save())
timed("2 scan+split+nwords", lambda: noop(
    flags_df(with_tiny=False, with_distinct=False, with_md5=False)))
timed("3 scan+split+md5", lambda: noop(
    flags_df(with_tiny=False, with_distinct=False)))
timed("4 +n_tiny", lambda: noop(flags_df(with_distinct=False)))
timed("5 +n_distinct (full flags)", lambda: noop(flags_df()))
timed("6 flags+gate", lambda: noop(gated(flags_df())))
timed("7 flags+gate+dedup(kept)", lambda: noop(
    gated(flags_df()).groupBy("h")
    .agg(F.min(F.struct("doc_id", "n_chars")).alias("kr")).select("kr.*")))

# --- full query, bench_scale protocol (toPandas digest) ---
qs = all_queries()
q = qs["x21_corpus_build"]


def full():
    df = q.fn(spark, SF_DIR)
    df = df.agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("n_docs").cast("long").alias("s"))
    pdf = df.toPandas()
    return pdf


spark.sparkContext.setJobDescription("8 full x21 (digest)")
t0 = time.time()
print("full cold:", f"{time.time()-t0:.2f}s after", full().to_dict(), flush=True)
print(f"full x21 cold: {time.time()-t0:.2f}s", flush=True)
for i in range(3):
    t0 = time.time()
    full()
    print(f"full x21 warm {i}: {time.time()-t0:.2f}s", flush=True)

spark.stop()
