"""SparkSession builder tuned for the testbed and documented for scale.

Testbed is ``local[N]`` (single JVM); the configs below are chosen so the
same logical plans survive a 1000-executor / 100 TB deployment:

- AQE on (default in Spark 4): runtime shuffle-partition coalescing,
  skew-join splitting, SMJ→BHJ upgrades. At 100 TB this is what adapts
  the static plan to real per-stage sizes.
- ``spark.sql.shuffle.partitions``: low (32) for the local testbed where
  default 200 would dominate ms-scale queries; at cluster scale set to
  ~2–3× total cores and let AQE coalesce down.
- Arrow enabled for every pandas/Python boundary (UDF and toPandas paths
  move columnar batches, not pickled rows).
- Session timezone pinned to UTC so timestamp semantics (date_trunc,
  window()) agree with the UTC-instant parquet testdata and the DuckDB
  oracle regardless of machine TZ.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import SparkSession

# Confs that only apply at JVM launch: getOrCreate silently ignores them
# when it reuses a live session, so build_session detects-and-warns.
_JVM_STARTUP_CONFS = ("spark.driver.memory",)


def build_session(
    app_name: str = "mysql-to-clickhouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores). On a real cluster pass ``master=None`` and submit normally —
    every config below is master-agnostic.

    NOTE ``spark.driver.memory`` (and any other JVM-startup conf) only
    takes effect when this call CREATES the JVM; if getOrCreate reuses
    an already-running session (tests, the verification driver) the
    setting is ignored — this function detects that case and emits a
    UserWarning naming the conf and both values. For processes you
    launch yourself, pass it via spark-submit / SPARK_GRAFT_DRIVER_MEM
    before first start.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # dims (region/nation/customer/supplier/part) all broadcast at any SF
        # where they remain dimension-sized; 64 MB is a safe cluster default.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    requested = {
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        **{
            k: v
            for k, v in (extra_conf or {}).items()
            if k in _JVM_STARTUP_CONFS
        },
    }
    preexisting = SparkSession.getActiveSession()
    spark = builder.getOrCreate()
    if preexisting is not None and preexisting is spark:
        if spark.sparkContext.master != master:
            warnings.warn(
                f"build_session reused a live SparkSession on master "
                f"{spark.sparkContext.master!r}; requested {master!r} was "
                f"ignored (JVM-startup setting)",
                UserWarning,
                stacklevel=2,
            )
        for k, want in requested.items():
            # read the JVM's actual launch conf — getOrCreate copies the
            # requested value into the session RuntimeConfig even though
            # the running JVM never saw it
            have = spark.sparkContext._conf.get(k, None)
            if have != want:
                warnings.warn(
                    f"build_session reused a live SparkSession: JVM-startup "
                    f"conf {k}={want!r} was ignored (live value: {have!r}). "
                    f"Stop the session or set it before first start.",
                    UserWarning,
                    stacklevel=2,
                )
    return spark


def release_all(spark: SparkSession) -> dict[str, int]:
    """Drain EVERY session-lifetime cache the engine holds for
    ``spark``, from one place — the hygiene API a long-lived shared
    session (or a rotating multi-tenant service) calls at a workload
    boundary so no executor memory stays pinned.

    Covers, in release order (caches that may reference other caches'
    frames go first):

    - prepared-plan registry (plans/prepared.py) — plans may reference
      dim-cached or bucketed frames, so they drop before their inputs
    - llmops MinHash signature frames + broadcast embedding matrices
    - dispatch probe memo (persisted build-side probes)
    - dimension cache (tables.load_dim persists)
    - bucketed-route table (catalog routing, no pinned memory)

    Returns a per-cache count of entries dropped, so callers (and the
    hygiene test) can assert coverage. NEW session-lifetime caches MUST
    be added here — tests/test_llmops.py asserts zero persisted RDDs
    session-wide through this function, which is exactly the assertion
    that caught the r11 dim-cache omission (shipped red because each
    cache had its own release and the test only knew about two)."""
    from mysql_to_clickhouse_spark import tables as _tables
    from mysql_to_clickhouse_spark.operators import llmops as _llmops
    from mysql_to_clickhouse_spark.plans import dispatch as _dispatch
    from mysql_to_clickhouse_spark.plans import prepared as _prepared

    counts: dict[str, int] = {}
    counts["prepared_plans"] = _prepared.invalidate(spark)
    n_sigs = len(getattr(_llmops, "_SIGS_CACHE", {}).get(spark, {}))
    n_mat = len(getattr(_llmops, "_MATRIX_CACHE", {}).get(spark, {}))
    n_wc = len(getattr(_llmops, "_WC_CACHE", {}).get(spark, {}))
    n_ckpt = len(getattr(_llmops, "_CKPT_CACHE", {}).get(spark, []))
    _llmops.release_caches(spark)
    counts["llmops_sigs"] = n_sigs
    counts["llmops_matrices"] = n_mat
    counts["llmops_wordcounts"] = n_wc
    counts["llmops_ckpts"] = n_ckpt
    n_probe = len(getattr(_dispatch, "_PROBE_MEMO", {}).get(spark, {}))
    _dispatch.release_probe_state(spark)
    counts["dispatch_probes"] = n_probe
    counts["dim_cache"] = _tables.release_dim_cache(spark)
    n_routes = len(getattr(_tables, "_BUCKET_ROUTES", {}).get(spark, {}))
    _tables.release_bucketed(spark)
    counts["bucket_routes"] = n_routes
    return counts
