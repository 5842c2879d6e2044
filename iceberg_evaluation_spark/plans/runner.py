"""Benchmark runner — the engine analog of the reference's Athena harness
(``src/data_derivation/query_performance/benchmark_functions.py:62-106``):
run an ordered query corpus, N iterations each, collect wall-clock and
row counts. Swaps ``wr.athena.start_query_execution`` for direct DataFrame
execution; "engine time" is wall time around the terminal action.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .registry import REGISTRY

__all__ = ["QueryStats", "run_benchmark"]


@dataclass
class QueryStats:
    name: str
    runs_s: list[float] = field(default_factory=list)
    rows: int = 0
    error: str | None = None

    @property
    def best_s(self) -> float:
        return min(self.runs_s) if self.runs_s else float("nan")

    @property
    def mean_s(self) -> float:
        return sum(self.runs_s) / len(self.runs_s) if self.runs_s else float("nan")


def run_benchmark(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    iterations: int = 1,
    warmup: bool = True,
    collect_rows: bool = True,
) -> dict[str, QueryStats]:
    """Execute each registered query ``iterations`` times (plus an optional
    JIT/IO warmup run) and record wall seconds. Failures are captured per
    query, not raised — mirrors the reference's warning-not-abort policy
    (benchmark_functions.py:38-48)."""
    out: dict[str, QueryStats] = {}
    for name in names or sorted(REGISTRY):
        q = REGISTRY[name]
        stats = QueryStats(name=name)
        try:
            if warmup:
                q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            # rows collected once, untimed; timed runs materialize EVERY
            # column via the noop sink — count() alone lets Catalyst prune
            # the computed columns and understates narrow queries
            if collect_rows:
                stats.rows = q.spark(spark, sf_dir).count()
            for _ in range(iterations):
                t0 = time.perf_counter()
                df = q.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                stats.runs_s.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            stats.error = f"{type(exc).__name__}: {exc}"
        out[name] = stats
    return out
