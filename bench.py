#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headliners mirror the BASELINE.md anchor set (DuckDB 1.0.0 measured on
this machine) so BENCH_r{N}.json is directly comparable:
q1_pricing_summary / q3_shipping_priority / q5_local_supplier /
w1_topk_per_customer / e1_daily_active / d1_dedup_docs / v1_cosine_topk.

Timing protocol: one shared SparkSession (as in any long-lived
deployment). Per query we report THREE numbers:
- first_run_queries: the very first build+exec+fetch, including any
  one-time per-session cache population (e.g. v1's broadcast embedding
  matrix build) — reported, not hidden in a discarded warm-up;
- build_and_exec_queries: construct the plan and execute end to end
  (measures plan construction + Catalyst analysis + execution after
  JIT/IO warm-up);
- queries (the headline): median of 5 executions of the prepared plan —
  the steady-state cost of a resident engine (prepared-statement /
  Thrift-server model), which is the number that scales with data.
The metric value is the sum of warm medians; the other totals are
reported alongside, not hidden.

work_queries is the PRIMARY per-query series for round-over-round
comparison (r7 verdict item 4): work = max(warm_median −
job_floor_sec, 0), i.e. the floor-subtracted time actually spent on
the query's plan. The raw medians swing with the host's 0.06–0.13 s
per-job scheduling+Arrow floor — bigger than any real per-query delta
at sf0.1 — so deltas read from the raw series are noise-dominated by
construction; the work series is the one that tracks plan changes.
Raw medians stay as "queries" (the driver-contract headline and the
number comparable to BASELINE.md's end-to-end anchors).

Results are fetched via Arrow (`toPandas()`): the DuckDB anchor fetches
its result in-process columnar, so the comparable Spark path is the
Arrow columnar fetch, not Py4J row-at-a-time pickling (`collect()` adds
~250 ms of pure serialization on a 45k-row result — measured r2).

duckdb_same_host (added r11): the BASELINE.md anchor numbers were
measured 2026-08-13 on a 2.70 GHz host; the round hosts drift (the r11
box runs the SAME DuckDB 1.0.0 anchor set 1.7-4x slower — see
BASELINE.md 'Host drift'). So after the Spark side finishes (and the
JVM is stopped — each engine gets the box alone, the bench_scale.py
protocol), this harness re-measures DuckDB on the SAME headliner
shapes in the same process and reports it alongside. The ratio
vs_duckdb_same_host is the host-drift-immune series; the raw total
stays the driver-contract headline. Six headliners run their registry
oracle texts verbatim; v1 runs the BASELINE.md anchor form
(`list_cosine_similarity`, DuckDB's native kernel) because its
correctness oracle's fixed-point lambda pipeline is a hash-parity
artifact, not DuckDB's best plan (50x slower — charging that to
DuckDB would flatter Spark).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# headline name (BASELINE.md) → registry query id
HEADLINERS = {
    "q1_pricing_summary": "d1_group_basic",
    "q3_shipping_priority": "c12_q3_shipping",
    "q5_local_supplier": "c10_star_multiway",
    "w1_topk_per_customer": "e1_row_number",
    "e1_daily_active": "d3_count_distinct",
    "d1_dedup_docs": "i1_exact_dedup",
    "v1_cosine_topk": "i4_topk_similar",
}

RUNS = 5  # median of 5: v1's run-to-run spread measured ±70 ms (OS noise)

# v1's same-host DuckDB anchor form (BASELINE.md: "pairwise
# list_cosine_similarity 2,000², top-20") — DuckDB's native cosine
# kernel, NOT the fixed-point list_transform correctness oracle (that
# form exists for cross-engine hash parity and runs ~50x slower in
# DuckDB; timing it would flatter Spark).
V1_ANCHOR_SQL = """
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_cosine_similarity(a.embedding, b.embedding) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cos
FROM (SELECT *, row_number() OVER (ORDER BY cos DESC, id_a, id_b) rk
      FROM pairs) t
WHERE rk <= 20 ORDER BY rk
"""


def _duckdb_same_host(
    oracles: dict[str, str], sf_dir: str
) -> tuple[dict[str, float], dict[str, str]]:
    """Same-host DuckDB medians for the headliner shapes (see module
    docstring). Runs with the JVM already stopped — each engine gets
    the box alone, mirroring scripts/bench_scale.py."""
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{glob}'")
    medians: dict[str, float] = {}
    errors: dict[str, str] = {}
    for headline, sql in oracles.items():
        try:
            con.sql(sql).df()  # warm-up
            runs = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                con.sql(sql).df()
                runs.append(time.perf_counter() - t0)
            medians[headline] = round(statistics.median(runs), 4)
        except Exception as exc:  # noqa: BLE001 — mirror the Spark side
            errors[headline] = f"{type(exc).__name__}: {exc}"[:500]
    con.close()
    return medians, errors


def _load_prev_bench() -> tuple[str, dict] | None:
    """Latest parseable prior bench document, newest first.

    Candidates: BENCH_SELF.json (the full document this harness writes
    itself — survives even when the driver's 2000-char stdout capture
    truncates the round artifact, the r5 failure mode) then
    BENCH_r{N}.json descending. A round artifact wraps our JSON line
    under "parsed"; "parsed": null (truncated capture) and any other
    unparseable/queryless file is skipped gracefully.
    """
    import glob
    import re

    prior_files = sorted(
        glob.glob(os.path.join(REPO_ROOT, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
    )
    self_path = os.path.join(REPO_ROOT, "BENCH_SELF.json")
    for path in [self_path] + list(reversed(prior_files)):
        try:
            with open(path) as fh:
                cand = json.load(fh)
            # the round driver wraps our JSON line under "parsed";
            # `or cand` also covers "parsed": null from a truncated capture
            cand = cand.get("parsed") or cand
            if isinstance(cand, dict) and cand.get("queries"):
                return (os.path.basename(path), cand)
        except (OSError, ValueError, AttributeError):
            continue
    return None


def _compact_stdout_line(full: dict) -> str:
    """ONE compact JSON line for the driver's bounded stdout capture.

    The r5 artifact was truncated mid-object at 2000 chars (the driver
    keeps only the stdout tail), which nulled the round's machine-
    readable block. The full document now lives in BENCH_SELF.json;
    stdout carries only the driver-contract fields plus one-line
    summaries, kept well under the capture window.
    """
    vs_prev = full.get("vs_prev") or {}
    line = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "queries": full["queries"],
        "sf": full["sf"],
        # summary only: the full floor-subtracted work series (the
        # PRIMARY round-over-round numbers) lives in BENCH_SELF.json
        "work_total": full.get("work_total"),
        "job_floor_sec": full["job_floor_sec"],
        "first_run_total": full["first_run_total"],
        "build_and_exec_total": full["build_and_exec_total"],
        "vs_prev_total_delta_pct": vs_prev.get("total_delta_pct"),
        "regression_verdict": vs_prev.get("regression_verdict"),
        # host-drift-immune ratio: DuckDB anchors re-measured on THIS
        # host in this run (BASELINE.md 'Host drift')
        "duckdb_same_host_total": full.get("duckdb_same_host_total"),
        "vs_duckdb_same_host": full.get("vs_duckdb_same_host"),
        # Hard-truncate per-error text: 7 failing headliners at the
        # main() 500-char cap would alone blow the ~2000-char driver
        # capture this line exists to fit inside. Full messages stay in
        # BENCH_SELF.json.
        "errors": {
            k: v[:80] for k, v in (full.get("errors") or {}).items()
        },
        "full_doc": "BENCH_SELF.json",
    }
    return json.dumps(line)


def _vs_previous_round(
    warm: dict[str, float],
    spread: dict[str, list[float]],
    total: float,
    job_floor: float,
) -> dict | None:
    """Self-attributing noise/regression verdict vs the latest BENCH_r*.json.

    Raw warm medians swing 2x between back-to-back invocations on this
    host (measured r5: job floor alone moved 0.059 -> 0.113 with the
    machine idle), so deltas are classified on FLOOR-SUBTRACTED work:
    work = max(median - this run's own job_floor_sec, 0). That removes
    the per-job scheduling+Arrow constant, which is both the dominant
    noise term and the part that vanishes at scale (the r4 postmortem:
    w1's +46% was exactly this). A work delta is NOISE when it is
    within max(10% of prior work, half the current job floor, the
    query's observed min-max run spread); otherwise regression or
    improvement by sign. Raw medians and raw delta_pct stay in the
    artifact for transparency.
    """
    prev = _load_prev_bench()
    if prev is None:
        return None
    prev_name, prev_json = prev
    prev_floor = prev_json.get("job_floor_sec") or 0.0
    per_query = {}
    for q, cur in warm.items():
        p = prev_json.get("queries", {}).get(q)
        if p is None:
            per_query[q] = {"prev": None, "cur": cur, "verdict": "new"}
            continue
        lo, hi = spread.get(q, [cur, cur])
        delta_pct = round(100.0 * (cur - p) / p, 1) if p else None
        work_cur = max(cur - job_floor, 0.0)
        work_prev = max(p - prev_floor, 0.0)
        band = max(0.10 * work_prev, 0.5 * job_floor, hi - lo)
        if abs(work_cur - work_prev) <= band:
            verdict = "noise"
        elif work_cur > work_prev:
            verdict = "regression"
        else:
            verdict = "improvement"
        per_query[q] = {
            "prev": p,
            "cur": cur,
            "delta_pct": delta_pct,
            "work_prev": round(work_prev, 4),
            "work_cur": round(work_cur, 4),
            "noise_band": round(band, 4),
            "verdict": verdict,
        }
    prev_total = prev_json.get("value")
    total_delta = (
        round(100.0 * (total - prev_total) / prev_total, 1) if prev_total else None
    )
    regressions = [q for q, v in per_query.items() if v["verdict"] == "regression"]
    return {
        "prev_round_file": prev_name,
        "prev_total": prev_total,
        "total_delta_pct": total_delta,
        "per_query": per_query,
        "regression_verdict": (
            "regressed: " + ",".join(regressions) if regressions else "no regression"
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # size shuffle parallelism to the benchmark SF (≤600k-row shuffles);
    # at cluster scale this is ~2-3× total cores + AQE coalescing
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

    from mysql_to_clickhouse_spark.registry import all_queries
    from mysql_to_clickhouse_spark.session import build_session

    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Scheduling-floor probe: a 2-row query with the same physical shape
    # as the smallest headliner (scan → shuffle agg → Arrow fetch). Its
    # median is pure per-job overhead — task scheduling, stage wiring,
    # Arrow round-trip — with effectively zero data. Any headliner whose
    # warm median ≈ this floor is overhead-bound, not plan-bound: its
    # ratio to an in-process engine is a constant that vanishes with
    # data size, which is why d1_dedup_docs carries a waiver below.
    from pyspark.sql import functions as F

    floor_df = spark.range(2).groupBy((F.col("id") % 2).alias("k")).count()
    floor_df.toPandas()
    floor_runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        floor_df.toPandas()
        floor_runs.append(time.perf_counter() - t0)
    job_floor = round(statistics.median(floor_runs), 4)
    job_floor_spread = [round(min(floor_runs), 4), round(max(floor_runs), 4)]

    warm: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    cold: dict[str, float] = {}
    first: dict[str, float] = {}
    errors: dict[str, str] = {}
    for headline, qid in HEADLINERS.items():
        # Per-query isolation (r3 postmortem: ONE query dying at warm-up
        # crashed the whole harness → a round with no bench numbers at
        # all). A failing headliner is now reported in "errors" and the
        # rest still get measured; rc stays 0 so the JSON line lands.
        try:
            fn = queries[qid].fn
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()  # first touch: JIT/IO + caches
            first[headline] = round(time.perf_counter() - t0, 4)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.toPandas()
            cold[headline] = round(time.perf_counter() - t0, 4)
            runs = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                df.toPandas()
                runs.append(time.perf_counter() - t0)
            warm[headline] = round(statistics.median(runs), 4)
            spread[headline] = [round(min(runs), 4), round(max(runs), 4)]
        except Exception as exc:  # noqa: BLE001
            errors[headline] = f"{type(exc).__name__}: {exc}"[:500]
        # Inter-headliner hygiene — the SAME documented long-lived-
        # session discipline as scripts/bench_scale.py: release probe/
        # llmops caches and let the ContextCleaner reclaim dead
        # broadcasts NOW (periodicGC defaults to 30 min — longer than
        # this whole run). Without it the LAST headliner (v1) pays the
        # accumulated debris of the first six: measured 0.4 s isolated
        # vs 1.7-2.6 s in-loop on the r11 host. Within-headline warm
        # runs above are untouched — only the handoff releases.
        try:
            from mysql_to_clickhouse_spark.operators.llmops import (
                release_caches,
            )
            from mysql_to_clickhouse_spark.plans.dispatch import (
                release_probe_state,
            )

            release_caches(spark)
            release_probe_state(spark)
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001 — hygiene must never fail a round
            pass

    total = round(sum(warm.values()), 4)
    # Same-host DuckDB anchor (see module docstring): Spark timing is
    # done — stop the JVM so each engine measures with the box alone.
    spark.stop()
    duck_oracles = {
        h: (V1_ANCHOR_SQL if h == "v1_cosine_topk" else queries[qid].oracle)
        for h, qid in HEADLINERS.items()
    }
    # Setup failures (duckdb import, CREATE VIEW) must not lose the run:
    # all Spark measurements are already in hand, so degrade to an empty
    # same-host series with an error note and let the headline land.
    try:
        duck, duck_errors = _duckdb_same_host(duck_oracles, sf_dir)
    except Exception as exc:  # noqa: BLE001 — r12 advisor fix
        duck, duck_errors = {}, {
            "__setup__": f"{type(exc).__name__}: {exc}"[:500]
        }
    duck_total = round(sum(duck.values()), 4)
    measured_both = [h for h in warm if h in duck]
    vs_duck = (
        round(
            sum(warm[h] for h in measured_both)
            / sum(duck[h] for h in measured_both),
            3,
        )
        if measured_both and sum(duck[h] for h in measured_both) > 0
        else None
    )
    work = {h: round(max(m - job_floor, 0.0), 4) for h, m in warm.items()}
    # NOTE: _vs_previous_round reads BENCH_SELF.json, so it must run
    # BEFORE this run overwrites that file below.
    vs_prev = _vs_previous_round(warm, spread, total, job_floor)
    full = {
                "metric": "headline_queryset_median_total",
                "value": total,
                "unit": "sec",
                "queries": warm,
                # PRIMARY series for round-over-round deltas (see module
                # docstring): floor-subtracted per-query work time.
                "work_queries": work,
                "work_total": round(sum(work.values()), 4),
                "build_and_exec_queries": cold,
                "build_and_exec_total": round(sum(cold.values()), 4),
                "first_run_queries": first,
                "first_run_total": round(sum(first.values()), 4),
                "job_floor_sec": job_floor,
                "job_floor_spread": job_floor_spread,
                "query_spread": spread,
                # host-drift-immune series (r11): DuckDB re-measured on
                # THIS host right after the Spark side, JVM stopped.
                "duckdb_same_host_queries": duck,
                "duckdb_same_host_total": duck_total,
                "duckdb_same_host_errors": duck_errors,
                "vs_duckdb_same_host": vs_duck,
                "vs_prev": vs_prev,
                "errors": errors,
                "waivers": {
                    "d1_dedup_docs": (
                        "overhead-bound: warm median ~= job_floor_sec (the "
                        "measured per-job scheduling+Arrow floor of this "
                        f"Spark deployment, {job_floor}s this run) on a "
                        "5k-row table; the plan (map-side md5 -> one hash "
                        "agg shuffle) is optimal and the absolute gap to an "
                        "in-process engine is a constant that vanishes at "
                        "scale. See BASELINE.md 'Waivers'."
                    )
                },
                "sf": sf,
    }
    with open(os.path.join(REPO_ROOT, "BENCH_SELF.json"), "w") as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    print(_compact_stdout_line(full))


if __name__ == "__main__":
    main()
