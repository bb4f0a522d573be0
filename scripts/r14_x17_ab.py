"""r14: A/B the FINAL-collapse shape (a4/x17) — full-partition
row_number sort-window vs the max-ts-then-tiebreak two-pass aggregation.

The window form shuffles/sorts EVERY version row to keep one row per
key; the aggregation form decides with small rows (guide §8): pass 1
computes max(ts) per key (map-side-combinable primitive HashAggregate —
no struct buffers, so no SortAggregate fallback: the p1 lesson), pass 2
re-scans and keeps only rows at their key's max ts (a broadcast
semi-reduction: survivors ≈ one row per key), and the declared
row_number tiebreak (ts DESC, event_id DESC) runs on the surviving
~n_keys rows where its sort is free. Digests must be equal.

Usage: python scripts/r14_x17_ab.py --events <tier>/events.parquet
       [--customer <tier>/customer.parquet] [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True)
    ap.add_argument("--customer", default=None)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import Window, functions as F

    from mysql_to_clickhouse_spark.session import build_session

    spark = build_session(app_name="r14_x17_ab", master="local[32]",
                          shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(args.events)

    def collapse_window(df):
        w = Window.partitionBy("user_id").orderBy(
            F.desc(F.unix_micros("ts")), F.desc("event_id"))
        return (df.withColumn("rn", F.row_number().over(w))
                .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
                .select("user_id", "event_id",
                        F.unix_micros("ts").alias("ts_us"),
                        "event_type", "value"))

    def collapse_agg(df):
        ts_us = F.unix_micros("ts")
        mx = df.groupBy("user_id").agg(F.max(ts_us).alias("__mx_us"))
        surv = (df.join(F.broadcast(mx), "user_id")
                .filter(ts_us == F.col("__mx_us")))
        w = Window.partitionBy("user_id").orderBy(
            F.desc(F.unix_micros("ts")), F.desc("event_id"))
        return (surv.withColumn("rn", F.row_number().over(w))
                .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
                .select("user_id", "event_id",
                        F.unix_micros("ts").alias("ts_us"),
                        "event_type", "value"))

    def digest_a4(out):
        return tuple(out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("user_id")).cast("long").alias("s_u"),
            F.sum(F.col("event_id") % 1000000007).cast("long").alias("s_e"),
            F.sum(F.col("ts_us") % 1000000007).cast("long").alias("s_t"),
            F.round(F.sum(F.floor(F.col("value") * 1000)), 0).alias("s_v"),
        ).collect()[0])

    def x17_report(latest, cust):
        from mysql_to_clickhouse_spark.functions.numeric import dsum
        return (latest
                .withColumn("c_key", F.pmod(F.col("user_id"), F.lit(1500)) + 1)
                .join(F.broadcast(cust), F.col("c_key") == F.col("c_custkey"))
                .groupBy("c_mktsegment")
                .agg(F.count(F.lit(1)).alias("n_entities"),
                     dsum("value").alias("latest_value_sum")))

    cust = None
    if args.customer:
        cust = (spark.read.parquet(args.customer)
                .select("c_custkey", "c_mktsegment"))

    def timed(fn):
        ts = []
        d = None
        for _ in range(args.runs):
            t0 = time.time()
            d = fn()
            ts.append(time.time() - t0)
        return statistics.median(ts), ts, d

    for name, form in (("window", collapse_window), ("agg", collapse_agg)):
        spark.sparkContext.setJobDescription(f"a4 collapse: {name}")
        med, ts, d = timed(lambda: digest_a4(form(ev)))
        print(f"a4[{name}]: {med:.2f}s {['%.2f' % t for t in ts]} "
              f"digest={d}", flush=True)
        if cust is not None:
            spark.sparkContext.setJobDescription(f"x17 report: {name}")
            med, ts, d = timed(lambda: tuple(sorted(
                map(tuple, x17_report(form(ev).select("user_id", "value"),
                                      cust).collect()))))
            print(f"x17[{name}]: {med:.2f}s {['%.2f' % t for t in ts]} "
                  f"rows={d}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
