"""Process-level cache for CONSTANT Column expression trees.

Building a wide expression on the driver is not free: every ``F.*``
call is a py4j round trip, so a 64-term tree (MinHash band structs,
bloom probe positions) costs hundreds of JVM calls — measured at
0.2-1.3 s per construction on a busy driver — and the classify/fold
operators rebuild the SAME tree for every delta batch. Catalyst
expressions are immutable and name-bound (a cached ``F.col("_sig")``
resolves against whatever frame it is later attached to), so a tree
that depends only on constants can be built once per JVM and reused
across DataFrames and sessions within the process.

The cache key carries the active SparkContext's applicationId: a py4j
Column handle dies with its JVM, so entries from a stopped context
must not leak into a new one (each application re-builds once).
"""

from __future__ import annotations

from collections.abc import Callable

__all__ = ["cached_expr"]

_CACHE: dict = {}


def cached_expr(key: tuple, build: Callable):
    """Return ``build()``, memoized per (active SparkContext, key)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    app = sc.applicationId if sc is not None else None
    k = (app, *key)
    hit = _CACHE.get(k)
    if hit is None:
        hit = build()
        _CACHE[k] = hit
    return hit
