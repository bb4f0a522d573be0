"""Scratch-directory helper: every side-effecting operator (sinks,
round-trips, replay slices, CDC state) allocates through here so the
process cleans up after itself instead of leaking /tmp dirs across
verification rounds."""

from __future__ import annotations

import atexit
import shutil
import tempfile

_CREATED: list[str] = []


def _cleanup() -> None:  # pragma: no cover - exercised at interpreter exit
    for path in _CREATED:
        shutil.rmtree(path, ignore_errors=True)


atexit.register(_cleanup)


def scratch_dir(prefix: str) -> str:
    path = tempfile.mkdtemp(prefix=prefix)
    _CREATED.append(path)
    return path
