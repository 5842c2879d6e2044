"""Benchmark runner — the engine analog of the reference's Athena harness
(``src/data_derivation/query_performance/benchmark_functions.py:62-106``):
run an ordered query corpus, N iterations each, collect wall-clock and
row counts. Swaps ``wr.athena.start_query_execution`` for direct DataFrame
execution; "engine time" is wall time around the terminal action.

Two harness shapes, matching the reference:

- sequential (default): clean per-query wall times on one JVM — the
  numbers BENCH_DETAIL.json records.
- ``max_workers=N``: one thread per in-flight query, the reference's
  ThreadPoolExecutor fan-out (benchmark_functions.py:87-95). Each thread
  tags its jobs with a scheduler pool so a FAIR-mode session time-slices
  executors across concurrent queries instead of FIFO head-of-line
  blocking. Per-query wall times under concurrency include queueing —
  use them for throughput, not per-query comparisons.

Queries registered with a ``bare`` variant (operator-only, no in-query
verification harness) get it timed separately into ``bare_s`` so perf
tracking can separate the production operator's cost from the cost of
proving it correct (doubled planted corpora, exact recount twins).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .registry import REGISTRY, Query

__all__ = ["QueryStats", "run_benchmark"]


@dataclass
class QueryStats:
    name: str
    runs_s: list[float] = field(default_factory=list)
    bare_s: list[float] = field(default_factory=list)  # operator-only variant
    rows: int = 0
    error: str | None = None

    @property
    def best_s(self) -> float:
        return min(self.runs_s) if self.runs_s else float("nan")

    @property
    def mean_s(self) -> float:
        return sum(self.runs_s) / len(self.runs_s) if self.runs_s else float("nan")

    @property
    def median_s(self) -> float:
        """Median wall seconds — the round-over-round comparison metric:
        best-of-N hides regressions behind one lucky run and single-run
        numbers carry ±40% ambient swing (r3 BENCH_NOTES isolation
        re-measurements); the median of N≥3 is robust to one outlier in
        either direction."""
        import statistics

        return statistics.median(self.runs_s) if self.runs_s else float("nan")

    @property
    def best_bare_s(self) -> float:
        return min(self.bare_s) if self.bare_s else float("nan")

    @property
    def median_bare_s(self) -> float:
        import statistics

        return statistics.median(self.bare_s) if self.bare_s else float("nan")


def _time_noop(q_fn, spark: SparkSession, sf_dir: str) -> float:
    """One timed run: build the plan and materialize EVERY column via the
    noop sink — count() alone lets Catalyst prune computed columns and
    understates narrow queries."""
    t0 = time.perf_counter()
    q_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _run_one(
    q: Query,
    spark: SparkSession,
    sf_dir: str,
    iterations: int,
    warmup: bool,
    collect_rows: bool,
) -> QueryStats:
    stats = QueryStats(name=q.name)
    try:
        if warmup:
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        # rows collected once, untimed
        if collect_rows:
            stats.rows = q.spark(spark, sf_dir).count()
        for _ in range(iterations):
            stats.runs_s.append(_time_noop(q.spark, spark, sf_dir))
        if q.bare is not None:
            for _ in range(iterations):
                stats.bare_s.append(_time_noop(q.bare, spark, sf_dir))
    except Exception as exc:  # noqa: BLE001
        stats.error = f"{type(exc).__name__}: {exc}"
    return stats


def run_benchmark(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    iterations: int = 1,
    warmup: bool = True,
    collect_rows: bool = True,
    max_workers: int | None = None,
) -> dict[str, QueryStats]:
    """Execute each registered query ``iterations`` times (plus an optional
    JIT/IO warmup run) and record wall seconds. Failures are captured per
    query, not raised — mirrors the reference's warning-not-abort policy
    (benchmark_functions.py:38-48)."""
    names = list(names or sorted(REGISTRY))
    if not max_workers or max_workers <= 1:
        return {
            n: _run_one(REGISTRY[n], spark, sf_dir, iterations, warmup, collect_rows)
            for n in names
        }

    import threading
    from concurrent.futures import ThreadPoolExecutor

    def task(name: str) -> tuple[str, QueryStats]:
        # per-thread pool: with spark.scheduler.mode=FAIR the pools
        # fair-share executor slots; under default FIFO this is a no-op
        # tag. setLocalProperty is thread-local by design — this is the
        # supported way to run concurrent actions on one session.
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"bench-{threading.get_ident()}"
        )
        try:
            return name, _run_one(
                REGISTRY[name], spark, sf_dir, iterations, warmup, collect_rows
            )
        finally:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        done = dict(ex.map(task, names))
    return {n: done[n] for n in names}  # stable registration order
