"""Process-scoped scratch directories for queries that materialize real
tables/replay sources (q44, q47/q48, q75-q79, q84-q87, q101-q103, ...).

Every registered query that builds a SnapshotTable, a partitioned sink,
a streaming-replay source, or a checkpoint dir allocates it here instead
of bare ``tempfile.mkdtemp``: all scratch lives under ONE per-process
root that is removed at interpreter exit, so repeated harness runs
(bench N-iteration loops, correctness sweeps, pytest sessions) cannot
accumulate orphaned table copies on the temp filesystem.

Cleanup is deferred to ``atexit`` rather than per-query because the
DataFrames a query returns are LAZY — the driver/bench materializes them
after the query function has returned, so the backing files must outlive
the call. Within one process the cost is bounded: a bench run leaks at
most iterations × (scratch written per query), all reclaimed at exit.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

__all__ = ["scratch_dir"]

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh empty directory under the per-process scratch root."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="ies_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)


def session_cache_key(spark, *parts) -> tuple:
    """Memo key bound to the LIVE Spark application.

    ``id(spark)`` is not a session identity: CPython reuses the id of a
    garbage-collected session, so a later session in the same process
    could inherit memoized state bound to a stopped JVM (errors — or
    stale state if the scratch roots happen to coincide). The
    ``applicationId`` is minted per application by Spark itself and
    never reused within a machine's clock resolution (r9 verdict #6).
    """
    return (spark.sparkContext.applicationId, *parts)
