"""Synthesize a bench_scale tier (tables + ingest layout) to a fixed
dir WITHOUT running the benchmark — lets profiling sessions and
bench_scale --sf-dir reuse one synthesis.

Usage: python scripts/synth_tier.py --rows 100000000 --out /tmp/bench_scale_1e8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, required=True)
    ap.add_argument("--vectors", type=int, default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    n = args.rows
    n_vec = args.vectors if args.vectors is not None else max(n // 1000, 2000)

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    from mysql_to_clickhouse_spark.session import build_session
    from mysql_to_clickhouse_spark.tables import (
        ensure_agg_projection,
        ensure_bucketed,
        ensure_flat_lineitem,
        ensure_projection,
    )
    from scripts.bench_scale import synth_tpch_spark
    from scripts.stress import synth_events_spark
    from scripts.stress_docs import synth_docs_spark
    from scripts.stress_vectors import synth_vectors_spark

    spark = build_session(
        app_name="synth_tier", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = args.out
    os.makedirs(sf_dir, exist_ok=True)

    t0 = time.time()
    synth_tpch_spark(spark, sf_dir, n)
    synth_events_spark(spark, f"{sf_dir}/events.parquet", n)
    synth_docs_spark(spark, f"{sf_dir}/documents.parquet", n, 12, 0)
    synth_vectors_spark(
        spark, f"{sf_dir}/embeddings.parquet", n_vec, max(64, n_vec // 1000)
    )
    print(f"synth {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    ensure_bucketed(
        spark, sf_dir, names=("lineitem", "orders", "events"),
        buckets=64, warehouse=os.path.join(sf_dir, "_layout_wh"),
        partition_cols={"lineitem": ("l_returnflag",)},
    )
    ensure_projection(
        spark, sf_dir, "orders", "o_custkey", buckets=64,
        warehouse=os.path.join(sf_dir, "_layout_wh"),
    )
    ensure_agg_projection(
        spark, sf_dir, "events", "day_user",
        warehouse=os.path.join(sf_dir, "_layout_wh"),
    )
    ensure_flat_lineitem(
        spark, sf_dir, buckets=64,
        warehouse=os.path.join(sf_dir, "_layout_wh"),
    )
    print(f"layout {time.time() - t0:.0f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
