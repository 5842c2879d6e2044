"""Query registry: every engine capability from SURVEY.md §2 is exposed as a
named query ``(spark, sf_dir) -> DataFrame`` paired with an ANSI-SQL oracle
string DuckDB runs on the same parquet tables.

Contract (driver): column names must match between the Spark result and the
oracle result — the compare sorts columns by name before hashing. Every
computed column is therefore aliased identically on both sides. Operators
whose raw outputs are engine-hash-specific (LSH dedup, simhash, HLL
sketches, IVF) register INVARIANT oracles instead: the query emits
exact-computable columns plus provable guarantee flags (planted-pair
recall, tolerance bounds) whose expected values the oracle derives from
the corpus — every registered query is fully hash-checkable.
``oracle=None`` (rows-only) remains supported but is currently unused.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Query", "REGISTRY", "register", "all_queries", "all_oracles"]

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    covers: str  # SURVEY §2 operator ids this query exercises
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL or None → rows-only check
    # Operator-only variant for queries whose registered form bundles
    # in-query verification (planted-duplicate corpus doubling, exact
    # recounts). The bench times it separately so perf comparisons see
    # the production operator's cost, not operator + oracle harness.
    bare: SparkQuery | None = None


REGISTRY: dict[str, Query] = {}

# Names listed here are emitted FIRST by all_queries()/all_oracles(), in this
# order; everything else follows in registration order. The driver's
# CORRECTNESS check covers only the first 50 entries of queries(), so the
# queries most in need of an independent verdict (newly added, recently
# fixed, or never yet driver-checked) must sit inside that window.
PRIORITY: list[str] = []


def register(
    name: str, covers: str, oracle: str | None, bare: SparkQuery | None = None
):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = Query(
            name=name, covers=covers, spark=fn, oracle=oracle, bare=bare
        )
        return fn

    return deco


def ordered_registry() -> list[Query]:
    """Registry entries with PRIORITY names first, then registration order."""
    head = [REGISTRY[n] for n in PRIORITY if n in REGISTRY]
    headset = set(PRIORITY)
    tail = [q for n, q in REGISTRY.items() if n not in headset]
    return head + tail


def all_queries() -> dict[str, SparkQuery]:
    return {q.name: q.spark for q in ordered_registry()}


def all_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in ordered_registry() if q.oracle is not None}
