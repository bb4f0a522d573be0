"""r14: at-scale A/B for the r13 window-FRAME rewrites (e7_first_last,
e11_interpolate, c17_asof_forward) — the quadratic unbounded-FOLLOWING
forms vs the committed incrementally-maintained forms.

The quadratic forms cannot be driven at the full 1e8 tier (the old c17
at 1e8 is ~1.6e12 frame row-evaluations — hours), so the harness shows
the GROWTH LAW instead: old vs new at two sub-tiers whose per-partition
length differs 10x (quadratic ⇒ ~100x per-partition work), plus the new
form alone at 1e8 proving linear completion. Digests must match between
old and new at every co-measured tier (value identity, same check the
oracle does at fixture scale).

Usage: python scripts/r14_stress_frames.py [--events-base /root/scale_ev]
Writes docs/STRESS_FRAMES_r14.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events-base", default="/root/scale_ev")
    args = ap.parse_args()

    from pyspark.sql import Window, functions as F

    from mysql_to_clickhouse_spark.session import build_session
    from scripts.stress import synth_events_spark

    spark = build_session(app_name="r14_stress_frames", master="local[32]",
                          shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    tiers = [1_000_000, 10_000_000, 100_000_000]
    for n in tiers:
        p = f"{args.events_base}_{n}/events.parquet"
        if not os.path.isdir(p):
            synth_events_spark(spark, p, n)
            print(f"synthesized events {n:,}", flush=True)

    def events(n):
        return spark.read.parquet(f"{args.events_base}_{n}/events.parquet")

    # ---- c17_asof_forward: old [1, unboundedFollowing] vs new
    # reversed [unboundedPreceding, -1] ----
    def c17(df, old: bool):
        ev = df.filter(F.col("event_type").isin("view", "purchase"))
        tagged = ev.select(
            "user_id", "event_id",
            F.unix_micros("ts").alias("ts_us"),
            (F.col("event_type") == "view").cast("int").alias("d"),
            F.when(F.col("event_type") == "purchase",
                   F.col("event_id")).alias("p_id"),
            F.when(F.col("event_type") == "purchase",
                   F.unix_micros("ts")).alias("p_us"),
        )
        if old:
            w = (Window.partitionBy("user_id")
                 .orderBy("ts_us", "d", "event_id")
                 .rowsBetween(1, Window.unboundedFollowing))
            nxt_id = F.first("p_id", ignorenulls=True).over(w)
            nxt_us = F.first("p_us", ignorenulls=True).over(w)
        else:
            w = (Window.partitionBy("user_id")
                 .orderBy(F.desc("ts_us"), F.desc("d"), F.desc("event_id"))
                 .rowsBetween(Window.unboundedPreceding, -1))
            nxt_id = F.last("p_id", ignorenulls=True).over(w)
            nxt_us = F.last("p_us", ignorenulls=True).over(w)
        out = (tagged.select(
            "user_id", "event_id", "ts_us", "d",
            nxt_id.alias("next_purchase_id"),
            nxt_us.alias("purchase_us"))
            .filter((F.col("d") == 1)
                    & F.col("next_purchase_id").isNotNull()))
        # modular digest: sum(purchase_us) over µs timestamps overflows
        # int64 at the 1e6+ tiers; mod-p per row keeps the sum exact
        # and bounded while remaining order-insensitive
        return out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("next_purchase_id") % 1000000007)
            .cast("long").alias("s_id"),
            F.sum(F.col("purchase_us") % 1000000007)
            .cast("long").alias("s_us"))

    # ---- e11_interpolate walls: old fwd frames vs new reversed ----
    def e11(df, old: bool):
        pts = (df.filter(F.col("event_type") == "purchase")
               .select("user_id",
                       F.expr("unix_micros(ts) div 3600000000").alias("hr"),
                       "value")
               .groupBy("user_id", "hr").agg(F.max("value").alias("v")))
        span = pts.groupBy("user_id").agg(F.min("hr").alias("h0"),
                                          F.max("hr").alias("h1"))
        spine = span.select(
            "user_id", F.explode(F.sequence("h0", "h1")).alias("hr"))
        joined = spine.join(pts, ["user_id", "hr"], "left").select(
            "user_id", "hr", "v", F.col("hr").cast("double").alias("x"))
        back = Window.partitionBy("user_id").orderBy("hr").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)
        real_x = F.when(F.col("v").isNotNull(), F.col("x"))
        if old:
            fwd = Window.partitionBy("user_id").orderBy("hr").rowsBetween(
                Window.currentRow, Window.unboundedFollowing)
            x1 = F.min(real_x).over(fwd)
            v1 = F.first("v", ignorenulls=True).over(fwd)
        else:
            fwd_rev = Window.partitionBy("user_id").orderBy(
                F.desc("hr")).rowsBetween(
                Window.unboundedPreceding, Window.currentRow)
            x1 = F.min(real_x).over(fwd_rev)
            v1 = F.last("v", ignorenulls=True).over(fwd_rev)
        walls = joined.select(
            "user_id", "hr", "v", "x",
            F.max(real_x).over(back).alias("x0"),
            x1.alias("x1"),
            F.last("v", ignorenulls=True).over(back).alias("v0"),
            v1.alias("v1"))
        interp = F.col("v0") + (F.col("v1") - F.col("v0")) * (
            F.col("x") - F.col("x0")) / (F.col("x1") - F.col("x0"))
        out = walls.select(
            "user_id", "hr",
            F.when(F.col("v").isNotNull(), F.col("v"))
            .otherwise(interp).alias("vf"))
        return out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("hr").cast("long").alias("s_hr"),
            F.round(F.sum(F.floor(F.col("vf") * 1000)), 0).alias("s_v"))

    # ---- e7_first_last: old [currentRow, unboundedFollowing] last()
    # vs new whole-partition frame, on LONG synthetic partitions
    # (the fixture/tier orders shape is ~10 orders per customer, too
    # short to show the frame law; the rewrite targets long keys) ----
    def e7(df, old: bool):
        base = Window.partitionBy("k").orderBy("ord")
        w_first = base.rowsBetween(Window.unboundedPreceding,
                                   Window.currentRow)
        if old:
            w_last = base.rowsBetween(Window.currentRow,
                                      Window.unboundedFollowing)
        else:
            w_last = base.rowsBetween(Window.unboundedPreceding,
                                      Window.unboundedFollowing)
        out = df.select(
            "k", "ord", "price",
            F.first("price").over(w_first).alias("first_price"),
            F.last("price").over(w_last).alias("latest_price"))
        return out.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.floor(F.col("first_price") * 100)), 0)
            .alias("s_f"),
            F.round(F.sum(F.floor(F.col("latest_price") * 100)), 0)
            .alias("s_l"))

    def e7_table(n_rows, n_keys):
        ids = spark.range(n_rows).withColumnRenamed("id", "ord")
        h = F.abs(F.xxhash64("ord", F.lit(7)))
        return ids.select(
            "ord", (h % n_keys).alias("k"),
            (1000.0 + (h % 4990000) / 100.0).alias("price"))

    def timed(fn):
        t0 = time.time()
        row = fn().collect()[0]
        return time.time() - t0, tuple(row)

    lines = [
        "# STRESS_FRAMES — r13 window-frame rewrites at scale (r14)",
        "",
        "Old = the pre-r13 unbounded-FOLLOWING frame (Spark re-evaluates"
        " it from scratch per row: O(rows²) per partition); new = the"
        " committed r13 form (whole-partition frame for e7, reversed"
        " running frame for e11/c17 — incrementally maintained,"
        " O(rows)). Digests (count + fixed-point sums) must be equal"
        " old-vs-new at every co-measured tier. The old forms are"
        " driven only where quadratic work is feasible; the growth"
        " column is the per-partition-length law the rewrite removes."
        " events: 1,500 users → partition length = rows/1500."
        " e7 runs on a synthetic long-partition table (keys column k)"
        " because the tier orders shape is ~10 rows/customer."
        " Generated by scripts/r14_stress_frames.py.",
        "",
        "| operator | tier (rows) | partition len | old (s) | new (s) |"
        " digests equal |",
        "|---|---|---|---|---|---|",
    ]

    # c17 + e11: old at 1e6/1e7, new at all three tiers
    for name, fn in (("c17_asof_forward", c17), ("e11_interpolate", e11)):
        for n in tiers:
            plen = n // 1500 if name == "c17_asof_forward" else "≤721"
            new_t, new_d = timed(lambda: fn(events(n), old=False))
            if n <= 10_000_000 or name == "e11_interpolate":
                old_t, old_d = timed(lambda: fn(events(n), old=True))
                eq = old_d == new_d
                lines.append(
                    f"| {name} | {n:,} | {plen} | {old_t:.1f} |"
                    f" {new_t:.1f} | {eq} |")
                print(f"{name}@{n:,}: old {old_t:.1f}s new {new_t:.1f}s "
                      f"equal={eq} {new_d}", flush=True)
                assert eq, (name, n, old_d, new_d)
            else:
                lines.append(
                    f"| {name} | {n:,} | {plen} | (infeasible: ~"
                    f"{(n // 1500) ** 2 // 2 * 1500:,} frame row-evals)"
                    f" | {new_t:.1f} | — |")
                print(f"{name}@{n:,}: new {new_t:.1f}s (old infeasible)",
                      flush=True)

    for n_rows, n_keys in ((1_000_000, 1000), (10_000_000, 1000),
                           (100_000_000, 100_000)):
        t = e7_table(n_rows, n_keys)
        plen = n_rows // n_keys
        new_t, new_d = timed(lambda: e7(t, old=False))
        if plen <= 10_000:
            old_t, old_d = timed(lambda: e7(t, old=True))
            eq = old_d == new_d
            lines.append(f"| e7_first_last | {n_rows:,} | {plen:,} |"
                         f" {old_t:.1f} | {new_t:.1f} | {eq} |")
            print(f"e7@{n_rows:,}/{plen}: old {old_t:.1f}s new {new_t:.1f}s "
                  f"equal={eq}", flush=True)
            assert eq, (n_rows, old_d, new_d)
        else:
            lines.append(f"| e7_first_last | {n_rows:,} | {plen:,} |"
                         f" (infeasible) | {new_t:.1f} | — |")
            print(f"e7@{n_rows:,}/{plen}: new {new_t:.1f}s", flush=True)

    doc = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "STRESS_FRAMES_r14.md")
    with open(doc, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {doc}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
