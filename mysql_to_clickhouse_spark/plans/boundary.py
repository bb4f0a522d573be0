"""Stage-boundary shuffle hygiene — the engine API for long pipelines.

Spark retains every completed ShuffleMapStage's files on local disk for
the lifetime of the app (or until the driver GC happens to collect the
ShuffleDependency — by default only on the 30-minute periodic-GC tick,
and never while a live DataFrame's executed plan still pins it:
ShuffleExchangeExec memoizes its dependency). A multi-stage pipeline
over a 100 TB corpus therefore accretes shuffle files it will never
read again; on the 1e8-doc text-dedup chain that was a measured ~40 GB
— enough to ENOSPC the next operator's sorter on a ~94 GB volume
(docs/STRESS_DOCS_100000000.md). Round 6 survived by restarting the
SparkSession between chain links — a harness workaround. This module
is the engine form: an explicit, callable boundary.

``checkpoint_boundary(df)`` materializes a DataFrame to parquet, hands
back a fresh scan of it (lineage cut — the upstream plan, its cached
exchanges, and its Python/JVM object graph are no longer reachable
from the result), then force-releases every COMPLETED shuffle's map
outputs via the driver's ContextCleaner. Spark's standard lost-shuffle
recovery makes the release safe-by-recompute: if some other live
DataFrame still needs a cleaned shuffle, its next action re-runs that
map stage (verified in tests/test_boundary.py) — the failure mode is
wasted work, never a wrong answer. Don't call it while another job is
mid-flight on the same session (the reduce side would fetch-fail and
retry; correct, but noisy).

At 1000-executor scale the same calls apply unchanged: parquet
materialization goes to the cluster store, and doCleanupShuffle fans
out to every executor's BlockManager (plus the external shuffle
service) exactly as app-exit cleanup does — the API just moves that
cleanup to the pipeline's stage boundaries where the disk pressure
actually is.
"""

from __future__ import annotations

import gc
import glob
import os

from pyspark.sql import DataFrame, SparkSession

from mysql_to_clickhouse_spark.functions.tmputil import scratch_dir

__all__ = ["checkpoint_boundary", "release_shuffles", "shuffle_footprint"]


def _local_shuffle_files(spark: SparkSession) -> list[str]:
    """Every shuffle_* file under the driver-local BlockManager dirs.

    Local-mode introspection (executors == driver): the unit-test and
    single-node-harness view of the footprint doCleanupShuffle frees.
    On a real cluster the same files live on each executor; this
    helper intentionally reports only what this process can see."""
    env = spark._jvm.org.apache.spark.SparkEnv.get()
    dirs = env.blockManager().diskBlockManager().localDirs()
    files: list[str] = []
    for i in range(len(dirs)):
        root = dirs[i].getAbsolutePath()
        files.extend(
            glob.glob(os.path.join(root, "**", "shuffle_*"), recursive=True)
        )
    return files


def shuffle_footprint(spark: SparkSession) -> tuple[int, int]:
    """(n_files, n_bytes) of shuffle data currently held on local disk."""
    files = _local_shuffle_files(spark)
    total = 0
    for p in files:
        try:
            total += os.path.getsize(p)
        except OSError:  # racing the cleaner
            pass
    return len(files), total


def release_shuffles(spark: SparkSession) -> list[int]:
    """Force-release every COMPLETED shuffle's map outputs now.

    Shuffle IDs are inventoried from the on-disk file names
    (``shuffle_{id}_{map}_0.*``) rather than reflective traversal of
    MapOutputTrackerMaster's scala internals, then each is cleaned
    BLOCKING through the driver's ContextCleaner — the identical code
    path the weak-reference GC route takes, minus the wait for a
    driver GC that a live plan reference may block forever. Returns
    the released shuffle IDs.

    The inventory is taken BEFORE the GC pass: the async ContextCleaner
    thread may sweep dead shuffles the moment the GC enqueues their
    weak refs, and inventorying after it raced to an empty id list on a
    busy session (r11 flake). Cleaning an id the GC already swept is a
    no-op (doCleanupShuffle is idempotent), so inventory-first is both
    race-free and safe. A python+JVM GC still runs before the explicit
    cleans so broadcast variables and RDDs whose references truly died
    are swept in the same pass."""
    ids = sorted(
        {
            int(os.path.basename(p).split("_")[1])
            for p in _local_shuffle_files(spark)
        }
    )
    gc.collect()  # drop dead py4j handles so the JVM refs can die too
    spark._jvm.System.gc()
    jsc = spark.sparkContext._jsc.sc()
    cleaner_opt = jsc.cleaner()
    if not cleaner_opt.isDefined():  # pragma: no cover - cleaner is on
        return []  # spark.cleaner.referenceTracking=false: nothing to do
    cleaner = cleaner_opt.get()
    for sid in ids:
        cleaner.doCleanupShuffle(sid, True)
    return ids


def checkpoint_boundary(
    df: DataFrame, path: str | None = None, *, release: bool = True
) -> DataFrame:
    """Materialize ``df`` and cut the pipeline here: parquet out, fresh
    scan back, upstream shuffle files released. The returned DataFrame
    depends only on the written files — rebind your variable
    (``df = checkpoint_boundary(df)``) and the upstream plan is gone.

    ``path=None`` writes to a process-lifetime scratch dir (auto-
    removed at exit); pass a real path to keep the checkpoint as a
    restartable artifact (the a5/a24 sink discipline). ``release=False``
    skips the shuffle release when other in-flight work on the session
    still reads older shuffles and recompute would be costly."""
    spark = df.sparkSession
    if path is None:
        path = os.path.join(scratch_dir("ckpt_boundary_"), "data")
    df.write.mode("overwrite").parquet(path)
    fresh = spark.read.parquet(path)
    if release:
        del df  # this frame's pin on the upstream plan
        release_shuffles(spark)
    return fresh
