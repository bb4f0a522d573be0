"""Stress evidence beyond the provided fixtures: synthesize a 10x-sf0.1
events table (1M rows, same schema/domains, deterministic), then run a
set of representative heavy operators BOTH ways — Spark vs the DuckDB
oracle — comparing the driver-style value hash and recording wall
times. Writes docs/STRESS.md.

Usage: python scripts/stress.py [--rows 1000000]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "d35_retention",
    "d36_histogram",
    "d37_entropy",
    "d41_exp_decay_avg",
    "d42_bitmap_ops",
    "d44_mad",
    "d48_rank_corr",
    "e9_running_distinct",
    "e10_nonneg_derivative",
    "e11_interpolate",
    "e12_running_concurrency",
    "g32_time_bucket",
    "h19_rolling_mau",
    "h20_strict_funnel",
    "h21_incremental_bitmap",
    "k6_mv_cascade",
    "k7_watermarked_mv",
    "d56_ks_test",
    "d57_anova_f",
]


def synth_events(path: str, n_rows: int) -> None:
    """Deterministic synthetic events at the FIXTURES.md schema/domains
    (30 days, 1500 users, 5 types, value 0.01-490.02, props {"k": int})
    via a hash-based counter — no RNG state, reproducible anywhere."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = np.arange(n_rows, dtype=np.int64)

    uids = ids.astype(np.uint64)

    def h(seed: int) -> "np.ndarray":
        with np.errstate(over="ignore"):
            x = uids * np.uint64(2654435761) + np.uint64(seed * 40503)
            x ^= x >> np.uint64(33)
            x *= np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> np.uint64(33)
        return x

    base_us = 1704067200000000  # 2024-01-01
    span_us = 30 * 86400000000
    ts = (
        base_us
        + (ids * (span_us // n_rows))
        + (h(1) % np.uint64(60000000)).astype(np.int64)
    ).astype(np.int64)
    user = (h(2) % np.uint64(1500)).astype(np.int64)
    types = np.array(["view", "click", "purchase", "signup", "error"])
    weights_cum = np.array([50, 75, 85, 92, 100])  # percent cumulative
    tsel = (h(3) % np.uint64(100)).astype(np.int64)[:, None] < weights_cum[None, :]
    etype = types[tsel.argmax(axis=1)]
    value = np.round(0.01 + (h(4) % np.uint64(4900100)).astype(np.int64) / 10000.0, 2)
    k = (h(5) % np.uint64(100)).astype(np.int64)
    props = np.char.add(
        np.char.add('{"k": ', k.astype(str)), "}"
    )
    table = pa.table(
        {
            "event_id": ids,
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": user,
            "event_type": etype,
            "value": value,
            "props": props,
        }
    )
    pq.write_table(table, path)


def synth_events_spark(spark, path: str, n_rows: int) -> None:
    """Distributed synthesis for row counts where single-core numpy is
    impractical (1e9+): the same schema/domains as synth_events, but
    generated inside Spark from ``spark.range`` with xxhash64-derived
    columns — deterministic (pure function of event_id), written once.
    NOTE the value streams differ from synth_events' murmur-style
    counter (different hash family); that is irrelevant to the
    harness, which compares Spark vs DuckDB on the SAME file."""
    from pyspark.sql import functions as F

    base_us = 1704067200000000  # 2024-01-01
    span_us = 30 * 86400000000
    ids = spark.range(n_rows).withColumnRenamed("id", "event_id")

    def h(seed: int):
        return F.abs(F.xxhash64(F.col("event_id"), F.lit(seed)))

    df = ids.select(
        "event_id",
        F.timestamp_micros(
            F.lit(base_us)
            + F.col("event_id") * F.lit(span_us // n_rows)
            + h(1) % F.lit(60000000)
        ).alias("ts"),
        (h(2) % F.lit(1500)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ("view", "view", "click", "purchase", "signup",
                       "error", "view", "view", "click", "view")]),
            (h(3) % F.lit(10) + 1).cast("int"),
        ).alias("event_type"),
        F.round(
            F.lit(0.01) + (h(4) % F.lit(4900100)).cast("double") / 10000.0, 2
        ).alias("value"),
        F.concat(
            F.lit('{"k": '), (h(5) % F.lit(100)).cast("string"), F.lit("}")
        ).alias("props"),
    )
    df.write.mode("overwrite").parquet(path)


def value_hash(pdf) -> str:
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    rows = sorted(tuple(str(v) for v in row) for row in pdf.itertuples(index=False))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of QUERIES to run")
    ap.add_argument("--sf-dir", default=None,
                    help="reuse an existing synthesized dir (skip synthesis)")
    ap.add_argument("--synth-spark", action="store_true",
                    help="synthesize with Spark (distributed; for 1e9+ rows)")
    args = ap.parse_args()

    import tempfile

    if args.sf_dir:
        sf_dir, gen_s = args.sf_dir, 0.0
    elif args.synth_spark:
        sf_dir = tempfile.mkdtemp(prefix="stress_sf_")
        gen_s = None  # synthesized below, after the session exists
    else:
        sf_dir = tempfile.mkdtemp(prefix="stress_sf_")
        t0 = time.time()
        synth_events(f"{sf_dir}/events.parquet", args.rows)
        gen_s = time.time() - t0

    from mysql_to_clickhouse_spark.registry import all_queries
    from mysql_to_clickhouse_spark.session import build_session
    from mysql_to_clickhouse_spark.verify import duckdb_connection

    spark = build_session(
        app_name="stress", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    if gen_s is None:
        t0 = time.time()
        synth_events_spark(spark, f"{sf_dir}/events.parquet", args.rows)
        gen_s = time.time() - t0
    con = __import__("duckdb").connect()
    ev_path = f"{sf_dir}/events.parquet"
    if os.path.isdir(ev_path):  # Spark-written dataset: glob the parts
        ev_path = f"{ev_path}/*.parquet"
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{ev_path}'")

    qs = all_queries()
    to_run = (
        [q.strip() for q in args.queries.split(",")] if args.queries else QUERIES
    )
    lines = [
        f"# STRESS — {args.rows // 100_000}x-sf0.1 synthetic evidence (generated)",
        "",
        f"Synthetic events table: **{args.rows:,} rows** (deterministic",
        "hash-counter synthesis at the FIXTURES.md schema/domains,",
        f"generated in {gen_s:.1f}s by scripts/stress.py). Each operator",
        "below ran on Spark (local[32]) AND as its DuckDB oracle on the",
        "same parquet; `hash` is the driver-style order-insensitive value",
        "hash comparison at this scale — correctness evidence 10x beyond",
        "the largest provided fixture, not just timing.",
        "",
        "| query | spark_s | duckdb_s | rows | hash |",
        "|---|---|---|---|---|",
    ]
    all_ok = True
    for name in to_run:
        q = qs[name]
        t0 = time.time()
        spdf = q.fn(spark, sf_dir).toPandas()
        spark_s = time.time() - t0
        t0 = time.time()
        opdf = con.sql(q.oracle).df()
        duck_s = time.time() - t0
        ok = value_hash(spdf) == value_hash(opdf) and len(spdf) == len(opdf)
        all_ok &= ok
        lines.append(
            f"| {name} | {spark_s:.2f} | {duck_s:.2f} | {len(spdf):,} |"
            f" {'MATCH' if ok else 'DIVERGE'} |"
        )
        print(lines[-1], flush=True)
    lines += [
        "",
        "Timing protocol caveat: these are COLD single-shot numbers — the",
        "first query carries JVM/py4j warmup and each `spark_s` includes",
        "the Arrow fetch of the full result (1M rows for e11). The",
        "steady-state comparison protocol (prepared-plan warm medians)",
        "lives in bench.py; this harness exists for hash parity at",
        "scale, not throughput.",
        "",
        "All hashes must read MATCH; a DIVERGE here is a correctness",
        "regression at scale (e.g. an overflow of a fixed-point budget)",
        "invisible at the fixture sizes.",
    ]
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "docs", f"STRESS_{args.rows}.md"),
        "w",
    ) as fh:
        fh.write("\n".join(lines) + "\n")
    print("ALL MATCH" if all_ok else "DIVERGENCE FOUND", flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
