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

# The hand-pinned window head (set by plans/__init__ each round) — exposed
# so tests can enforce the freshness SLA: pins <= 10 keeps the 50-slot
# window rotating the whole oldest cohort through every round.
PINNED_HEAD: list[str] = []


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


def derive_priority(
    names: list[str],
    history: dict[str, int],
    pinned_head: list[str] = [],
) -> list[str]:
    """Compute the CORRECTNESS-window ordering from verdict history.

    The driver checks only the FIRST 50 of ``all_queries()`` per round,
    so the window must self-refresh (r5 verdict #2: the hand-edited list
    went stale and three new queries missed their verdict). Ordering:

    1. ``pinned_head`` — hand-pinned names whose code paths changed this
       round (a small list, the only part maintained by hand);
    2. names with NO driver verdict in any ``CORRECTNESS_r*.json``
       (newly registered queries land here automatically);
    3. everything else, oldest latest-verdict round first.

    Registration order breaks ties within each class, so the result is
    deterministic for a given history.
    """
    pinned = [n for n in pinned_head if n in names]
    pinset = set(pinned)
    rest = [n for n in names if n not in pinset]
    never = [n for n in rest if n not in history]
    seen = [n for n in rest if n in history]
    seen.sort(key=lambda n: (history[n], names.index(n)))
    return pinned + never + seen


def load_correctness_history(repo_root: str) -> dict[str, int]:
    """name -> round of its latest driver verdict, from CORRECTNESS_r*.json.

    A round's verdict counts whether green or red — a red verdict still
    re-sorts high because staleness (not color) drives the window; reds
    additionally get fixed and hand-pinned. Missing/corrupt files are
    skipped so a foreign checkout degrades to registration order."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    latest: dict[str, int] = {}
    for path in sorted(_glob.glob(_os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = _json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name in data:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


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
