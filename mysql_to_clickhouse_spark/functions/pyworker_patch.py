"""Per-task Python-worker overhead fix: memoize import-cache invalidation.

``pyspark.worker_util.setup_spark_files`` calls
``importlib.invalidate_caches()`` unconditionally on EVERY task. With
the standard spark-submit worker layout — SPARK_HOME zip archives
(pyspark.zip, py4j-*.zip) on the worker's ``sys.path`` — CPython's
``zipimporter.invalidate_caches()`` re-reads each archive's central
directory on every call, and ``PathFinder.invalidate_caches`` walks the
whole ``sys.path_importer_cache`` doing it again. Measured on this box
(Spark 4.1.2, local[32]): **0.10-0.15 s per task**, paid by every
mapInPandas / pandas_udf / cogroup / RDD-Python task regardless of size
— the dominant cost of a small Python-boundary query and a per-task tax
on short tasks at any cluster size (guide §4: the JVM↔Python boundary).
A/B on a 1-row mapInPandas action: 0.185 s → 0.105 s median.

The invalidation exists so a worker notices NEW code shipped between
jobs (``sc.addPyFile``/``addFile``). Every such file lands in the
task's SparkFiles root directory (the JVM fetches dependencies before
the Python worker runs), bumping that directory's mtime. So the
invalidation is only OBSERVABLE when ``(root, mtime_ns(root))``
changed — which is exactly the memo key used here. Unknown state
(stat failure) falls back to always-invalidate, preserving stock
behavior.

Install happens from the package ``__init__`` when (and only when) the
package is imported inside a Python worker — i.e. while a task is
deserializing one of this engine's UDFs — so the patch:

- never touches the driver process;
- applies per worker process and survives worker reuse (which is what
  makes every SUBSEQUENT task in that worker fast);
- keeps the stock code path byte-for-byte for the stream protocol
  (the original ``setup_spark_files`` still runs; only the
  ``importlib.invalidate_caches`` callable it invokes is swapped for
  the memoized one, and restored after).

Semantics are pinned by tests/test_pyworker_patch.py: a module added
via ``addPyFile`` AFTER patched tasks ran must still import in the
next task (the mtime bump forces a real invalidation).
"""

from __future__ import annotations

import sys

_INSTALLED = False


def _memo_invalidate_factory(orig_invalidate):
    """A drop-in for ``importlib.invalidate_caches`` that only runs the
    real invalidation when the SparkFiles root changed (new/updated
    files fetched for this task)."""
    state: dict = {"key": None}

    def memo_invalidate() -> None:
        import os

        try:
            from pyspark.core.files import SparkFiles

            root = SparkFiles.getRootDirectory()
            # entry count as a second signal (r13 ADVICE): an overwrite
            # landing inside one mtime tick, or content added within an
            # already-extracted archive subdir, can miss the root-mtime
            # bump — the listdir length catches add/remove at the root
            # for one cheap extra syscall.
            key = (root, os.stat(root).st_mtime_ns, len(os.listdir(root)))
        except Exception:  # noqa: BLE001 — unknown state: never skip
            key = None
        if key is None or key != state["key"]:
            orig_invalidate()
            state["key"] = key

    memo_invalidate._m2c_state = state  # for tests
    return memo_invalidate


def install_if_worker() -> bool:
    """Patch ``pyspark.worker.setup_spark_files`` with the memoizing
    wrapper — but only when running inside a Python worker process
    (``pyspark.worker`` already imported, which the driver never does).
    Idempotent; returns True when the patch is (already) in place."""
    global _INSTALLED
    import os

    if os.environ.get("SPARK_GRAFT_NO_PYWORKER_PATCH"):
        # A/B kill switch (r14): lets the worker-patch benefit be
        # measured against stock behavior on the same build (workers
        # inherit the driver's environment in local mode; on a cluster
        # ship it via spark.executorEnv).
        return False
    if _INSTALLED:
        return True
    worker_mod = sys.modules.get("pyspark.worker")
    if worker_mod is None:
        return False
    orig_setup = getattr(worker_mod, "setup_spark_files", None)
    if orig_setup is None:
        # pyspark drift guard (r13 verdict): a release that renames or
        # inlines setup_spark_files silently de-installs the patch —
        # make that LOUD in the worker log instead of silent.
        import logging

        logging.getLogger(__name__).warning(
            "pyworker_patch INACTIVE: pyspark.worker.setup_spark_files "
            "not found (pyspark %s) — per-task importlib cache "
            "invalidation is unmemoized",
            getattr(sys.modules.get("pyspark"), "__version__", "?"),
        )
        return False
    if getattr(orig_setup, "_m2c_fast_setup", False):
        _INSTALLED = True
        return True

    import importlib

    orig_invalidate = importlib.invalidate_caches
    memo_invalidate = _memo_invalidate_factory(orig_invalidate)

    def fast_setup_spark_files(infile):
        importlib.invalidate_caches = memo_invalidate
        try:
            return orig_setup(infile)
        finally:
            importlib.invalidate_caches = orig_invalidate

    fast_setup_spark_files._m2c_fast_setup = True
    fast_setup_spark_files._m2c_orig = orig_setup  # for tests/uninstall
    worker_mod.setup_spark_files = fast_setup_spark_files
    # worker.py imports the name into its own namespace; patch the
    # source module too in case a future release calls it qualified.
    worker_util = sys.modules.get("pyspark.worker_util")
    if worker_util is not None and getattr(
        worker_util, "setup_spark_files", None
    ) is orig_setup:
        worker_util.setup_spark_files = fast_setup_spark_files
    _INSTALLED = True
    import logging

    logging.getLogger(__name__).info(
        "pyworker_patch ACTIVE (pyspark %s): importlib cache "
        "invalidation memoized on the SparkFiles root",
        getattr(sys.modules.get("pyspark"), "__version__", "?"),
    )
    return True
