"""Per-process scratch directories, cleaned at interpreter exit.

Format round-trip queries and DDL tests materialize writes to local
scratch space. A bare ``tempfile.mkdtemp`` per call leaks one
directory per query per run, so repeated driver/bench invocations
accumulate garbage in /tmp (reference keeps its scratch under a
session dir it deletes on tear-down — ``ql/Context.java``
``getLocalScratchDir``/``clear``). Here: one process-scoped root,
every query's scratch nests under it, ``atexit`` removes the whole
tree once.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def _cleanup() -> None:
    global _ROOT
    if _ROOT is not None:
        shutil.rmtree(_ROOT, ignore_errors=True)
        _ROOT = None


def scratch_dir(prefix: str) -> str:
    """A fresh empty directory under the process-scoped scratch root.

    Unique per call (queries may run several times in one process —
    e.g. bench warm-up + timed run — and ``mode("overwrite")`` writers
    plus unique dirs keep runs independent)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="hdp2_5_spark_scratch_")
        atexit.register(_cleanup)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
