"""pyworker_patch: the per-task import-cache memo (guide §4).

Covers, in order of importance:
1. semantics — a module shipped via addPyFile AFTER patched tasks ran
   still imports in the next task (the SparkFiles-root mtime bump
   forces a real invalidation);
2. the patch actually lands in reused workers once an engine UDF has
   run there;
3. the memo unit logic — invalidate on first call / changed root,
   skip on unchanged root, always-invalidate when state is unknown.
"""

from __future__ import annotations

import os
import sys

import pandas as pd


def test_memo_invalidate_unit(tmp_path, monkeypatch):
    from mysql_to_clickhouse_spark.functions.pyworker_patch import (
        _memo_invalidate_factory,
    )

    calls = {"n": 0}

    def orig():
        calls["n"] += 1

    from pyspark.core.files import SparkFiles

    monkeypatch.setattr(SparkFiles, "getRootDirectory", staticmethod(lambda: str(tmp_path)))
    memo = _memo_invalidate_factory(orig)
    memo()
    assert calls["n"] == 1  # first call always invalidates
    memo()
    memo()
    assert calls["n"] == 1  # unchanged root: skipped
    # a new file (the addPyFile flow) bumps the dir mtime → invalidate
    (tmp_path / "late.py").write_text("VALUE = 1\n")
    os.utime(tmp_path)  # belt-and-braces on coarse-mtime filesystems
    memo()
    assert calls["n"] == 2
    # unknown state (stat failure) must never skip
    monkeypatch.setattr(
        SparkFiles, "getRootDirectory", staticmethod(lambda: str(tmp_path / "gone"))
    )
    memo()
    memo()
    assert calls["n"] == 4


def test_install_noop_on_driver():
    # the driver process must never be patched: pyspark.worker is only
    # imported inside workers (and by tests that opt in). r13 ADVICE:
    # the old `is False or _INSTALLED` form was tautological — assert
    # the specific invariant instead.
    from mysql_to_clickhouse_spark.functions import pyworker_patch

    if "pyspark.worker" in sys.modules:
        import pytest

        pytest.skip("pyspark.worker already imported in this process")
    assert pyworker_patch.install_if_worker() is False
    assert pyworker_patch._INSTALLED is False
    assert "pyspark.worker" not in sys.modules  # install didn't import it


def test_pyspark_still_exposes_patched_symbol():
    """Drift guard (r13 verdict): the installed pyspark must still
    define ``setup_spark_files`` on both pyspark.worker_util (the
    source) and pyspark.worker (the import site the patch rebinds) —
    a rename/inline in a future release must fail THIS test loudly
    rather than silently de-installing the patch in workers. Imported
    in a subprocess so the driver process stays worker-module-free."""
    import subprocess

    code = (
        "import pyspark.worker_util as wu, pyspark.worker as w;"
        "assert callable(getattr(wu, 'setup_spark_files', None)), 'worker_util';"
        "assert callable(getattr(w, 'setup_spark_files', None)), 'worker';"
        "import importlib, inspect;"
        "src = inspect.getsource(wu.setup_spark_files);"
        "assert 'invalidate_caches' in src, 'memo target gone'"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_patch_lands_in_workers_and_late_addpyfile_imports(spark, tmp_path):
    # 1) run an engine-package-importing task so __init__ installs the
    #    patch in each worker it touches
    def probe(batches):
        import mysql_to_clickhouse_spark  # noqa: F401 — triggers install
        import pyspark.worker as w

        for pdf in batches:
            pass
        yield pd.DataFrame(
            {
                "pid": [os.getpid()],
                "patched": [
                    bool(getattr(w.setup_spark_files, "_m2c_fast_setup", False))
                ],
            }
        )

    df = spark.range(8).repartition(4).mapInPandas(probe, schema="pid long, patched boolean")
    df.toPandas()  # first pass: imports the package, installs
    second = df.toPandas()  # reused workers now report patched
    assert second["patched"].all(), second

    # 2) semantics: a module added AFTER those patched tasks must still
    #    import in the next task (mtime-keyed invalidation fires)
    mod = tmp_path / "m2c_late_added_mod.py"
    mod.write_text("VALUE = 42\n")
    spark.sparkContext.addPyFile(str(mod))

    def use_late(batches):
        import m2c_late_added_mod

        for pdf in batches:
            pass
        yield pd.DataFrame({"v": [m2c_late_added_mod.VALUE]})

    got = (
        spark.range(8)
        .repartition(4)
        .mapInPandas(use_late, schema="v long")
        .toPandas()["v"]
        .tolist()
    )
    assert got and all(v == 42 for v in got)
