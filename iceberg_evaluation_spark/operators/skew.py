"""Skew-mitigation utilities for large-scale joins.

AQE's skew-join handling (enabled in :mod:`..session`) splits oversized
sort-merge partitions at runtime and covers most hot-key cases for free.
Explicit salting remains necessary when (a) the join is forced to
shuffle-hash where AQE skew handling does not apply, or (b) a handful of
keys are so hot that even a split partition's *build* side overflows —
the classic power-law key distribution of a 100 TB event/web corpus.

``salted_join`` implements the standard replicate-and-salt scheme with a
**deterministic** salt (hash of the skewed side's rows, not ``rand()``)
so results are reproducible run-to-run and the operator stays pure —
required for the oracle-comparison testing model used across this
engine.

Cost model: the replicated side is multiplied ``salt_buckets``× before
the shuffle, so pick ``salt_buckets ≈ (hottest key count) / (rows that
fit one task)`` and keep the replicated side the *smaller* input.

Measured calibration (BENCH_NOTES.md "Skew probe"): with a 30%-hot key
over 3M×2M rows on local[32], plain SMJ absorbs the skew in ~1 s while
32-bucket salting pays ~10× for the replication. Salting is the tool
for keys whose single-task state/memory would OVERFLOW (OOM/spill
death), not for mild runtime imbalance — reach for it only past the
point AQE's split-and-replicate stops applying (e.g. shuffle-hash
joins, aggregation buffers, build-side explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join robust to hot keys on the ``skewed`` side.

    The skewed side gets a deterministic per-row salt in
    ``[0, salt_buckets)``; the other side is replicated once per salt
    value. The join key becomes ``on + [salt]``, so one hot key spreads
    over ``salt_buckets`` shuffle partitions instead of one straggler
    task. Row-level semantics are identical to ``skewed.join(other, on,
    how)`` for ``inner``/``left`` joins (each skewed row still meets
    every matching ``other`` row exactly once — per its own salt copy).

    ``right``/``full`` are rejected: unmatched ``other`` rows would
    surface once per replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r} — unmatched rows "
            "on the replicated side would be duplicated per salt copy"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets))
    s = skewed.withColumn("__salt", salt.cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return s.join(o, on + ["__salt"], how).drop("__salt")
