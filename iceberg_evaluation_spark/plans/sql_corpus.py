"""SQL-file corpus harness — the engine analog of the reference's Athena
benchmark notebook (``src/data_derivation/query_performance/
benchmark_functions.py:62-106``): list ``sql/*.sql`` in numeric order,
fan out one thread per query, run each N iterations, collect per-query
wall time and row counts.

Threading mirrors the reference's ``ThreadPoolExecutor`` design
(``:87-95``): a SparkSession is thread-safe, concurrent actions land in
the shared scheduler, so overlapping small queries keeps the cluster
busy the same way overlapping Athena calls did. Failures are captured
per query, not raised (reference's warning-not-abort policy, ``:38-48``).
"""

from __future__ import annotations

import os
import re
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

from ..sources import register_star_schema

__all__ = ["SqlQueryStats", "list_sql_files", "run_sql_corpus"]


@dataclass
class SqlQueryStats:
    name: str
    runs_s: list[float] = field(default_factory=list)
    rows: int = 0
    error: str | None = None

    @property
    def mean_s(self) -> float:
        return sum(self.runs_s) / len(self.runs_s) if self.runs_s else float("nan")


def list_sql_files(sql_dir: str) -> list[str]:
    """``q*.sql`` paths in numeric query order (reference
    ``query_ordering`` benchmark_functions.py:58-59)."""

    def key(p: str):
        m = re.match(r"q(\d+)", os.path.basename(p))
        return (int(m.group(1)) if m else 1 << 30, p)

    return sorted(
        (
            os.path.join(sql_dir, f)
            for f in os.listdir(sql_dir)
            if f.endswith(".sql")
        ),
        key=key,
    )


def run_sql_corpus(
    spark: SparkSession,
    sf_dir: str,
    sql_dir: str,
    iterations: int = 1,
    max_threads: int = 4,
) -> dict[str, SqlQueryStats]:
    """Run every SQL file against the registered star schema."""
    register_star_schema(spark, sf_dir)
    paths = list_sql_files(sql_dir)

    def one(path: str) -> SqlQueryStats:
        name = os.path.basename(path)[: -len(".sql")]
        stats = SqlQueryStats(name=name)
        text = open(path).read()
        try:
            for _ in range(iterations):
                t0 = time.perf_counter()
                # full execution without driver materialization: the noop
                # sink consumes every column (a bare count() would let
                # Catalyst prune computed columns), and an Observation
                # carries the row count back without collecting rows
                obs = Observation()
                (
                    spark.sql(text)
                    .observe(obs, F.count(F.lit(1)).alias("rows"))
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                stats.rows = int(obs.get["rows"])
                stats.runs_s.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — reference policy: warn, don't abort
            stats.error = f"{type(exc).__name__}: {exc}"
        return stats

    with ThreadPoolExecutor(max_workers=max_threads) as pool:
        results = list(pool.map(one, paths))
    return {s.name: s for s in results}
