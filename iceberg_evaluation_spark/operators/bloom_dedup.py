"""Bloom-prefiltered incremental dedup: drop incoming documents whose
fingerprint already exists in a reference corpus.

The production shape for continuously-ingested training data: the
reference corpus's fingerprints are folded into a Bloom filter ONCE (a
distributed bit-OR aggregation, driver state = ``num_bits / 64`` longs),
the filter is applied to the incoming batch as a narrow prefilter, and
only the survivors — incoming docs the filter *might* know — reach the
exact anti-join that removes false positives.  Bloom filters have no
false negatives, so the final output is exactly the anti-join result
while the shuffle-side join sees only the prefiltered slice.  At 100 TB
the reference side is billions of fingerprints: the filter (2^30 bits =
128 MiB for ~1e9 keys at ~2% fp) broadcasts where the fingerprint set
itself cannot.

Reference parity: the reference has no incremental-dedup surface; this
extends the M4/M7 dedup family (``src/data_curation/glue_jobs/
pyspark_functions.py`` uses md5 keys the same way, :144-146 in
``generate_tpcds.py``).

Hashing is the engine-portable md5 trick used across the corpus
(``conv(substr(md5(..), 1, 15), 16, 10)``): deterministic, identical in
Spark and DuckDB, no JVM-private hash in the contract.  Two probe
implementations, equal by construction (pinned in tests):

- ``literal``: the filter words become an array literal in the plan and
  each probe is ``element_at`` + bit-test — pure JVM, whole-stage
  codegen, zero Python.  Only for small filters: the plan embeds the
  array, and past a few hundred words the per-plan handling costs more
  than the Arrow transfer it avoids (measured: 2048 words ≈ +4 s/run
  at sf0.1).
- ``pandas``: the words ship as a broadcast numpy array and an
  Arrow-batched ``pandas_udf`` does the bit-tests vectorized — the
  scale path; at 100 TB the filter is MiBs-GiBs and broadcast is the
  only option anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import scalar_collect

__all__ = [
    "bloom_position_exprs",
    "build_bloom_words",
    "bloom_might_tagged",
    "bloom_prefiltered_anti_join",
]


def bloom_position_exprs(fp_col: str, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of a fingerprint, as JVM-side columns.

    ``pos_i = conv(substr(md5(concat_ws(':', fp, i)), 1, 15), 16, 10)
    % num_bits`` — 60 bits of md5 per hash, independent across ``i`` by
    seed suffix. ``concat_ws`` (not ``||``): a NULL fingerprint hashes
    like the seed string alone instead of propagating NULL — harmless
    for the final anti-join either way, but the tag column is pinned in
    tests, so the exact NULL behavior is part of the contract.
    """
    if num_bits <= 0 or num_bits % 64:
        raise ValueError("num_bits must be a positive multiple of 64")
    from ..functions.exprcache import cached_expr

    # constant tree per (fp_col, bits, k): probe batches rebuild it per
    # delta (twice — tag AND filter fold) at real driver cost otherwise
    return cached_expr(
        ("bloom_pos", fp_col, num_bits, num_hashes),
        lambda: [
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col(fp_col), F.lit(str(i)))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % num_bits
            )
            for i in range(num_hashes)
        ],
    )


def build_bloom_words(
    df: DataFrame, fp_col: str, num_bits: int, num_hashes: int
) -> list[int]:
    """Fold ``df[fp_col]`` into a Bloom filter; return its 64-bit words.

    Distributed: positions explode (×k) into ``(word_idx, bit)`` and a
    hash aggregation bit-ORs them into at most ``num_bits / 64`` rows —
    the only driver-side state.  Missing words (no bit set) are zero.
    """
    pos = df.select(
        F.explode(F.array(*bloom_position_exprs(fp_col, num_bits, num_hashes))).alias(
            "pos"
        )
    )
    # output bounded by num_bits/64 words, no join: scalar-safe
    rows = scalar_collect(
        pos.groupBy(F.expr("pos div 64").alias("w"))
        .agg(F.expr("bit_or(shiftleft(1L, cast(pos % 64 AS INT)))").alias("bits"))
    )
    words = [0] * (num_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def _with_might_literal(
    df: DataFrame, pos_cols: list[Column], words: list[int]
) -> DataFrame:
    """Add ``__might`` = every probe bit set — pure JVM.

    The filter words ride in the plan as one array literal; each probe
    stages its position then does ``element_at`` + unsigned-shift bit
    test inside whole-stage codegen.
    """
    arr = F.array(*[F.lit(w).cast("bigint") for w in words])
    staged = df.withColumn("__bloom_words", arr)
    hit = F.lit(True)
    for i, p in enumerate(pos_cols):
        staged = staged.withColumn(f"__p{i}", p)
        word = F.element_at("__bloom_words", F.expr(f"cast(__p{i} div 64 AS INT)") + 1)
        staged = staged.withColumn(f"__w{i}", word)
        # & 1, not % 2: an untouched shift (bit offset 0) keeps the word's
        # sign, and Spark's % follows the sign (-1 % 2 = -1)
        hit = hit & (
            F.expr(f"shiftrightunsigned(__w{i}, cast(__p{i} % 64 AS INT)) & 1") == 1
        )
    return staged.withColumn("__might", hit).select(*df.columns, "__might")


def bloom_might_tagged(
    incoming: DataFrame,
    words: list[int],
    fp_col: str,
    num_bits: int,
    num_hashes: int,
    probe: str = "auto",
) -> DataFrame:
    """``incoming`` plus a ``__might`` probe column — the pre-checkpoint
    stage of :func:`bloom_prefiltered_anti_join`, exposed so plan tests
    can pin the probe's execution shape (Arrow-batched, never
    row-at-a-time) before the lineage-truncating cache hides it."""
    pos_cols = bloom_position_exprs(fp_col, num_bits, num_hashes)
    if probe == "auto":
        probe = "literal" if len(words) <= 256 else "pandas"
    if probe == "literal":
        return _with_might_literal(incoming, pos_cols, words)
    if probe != "pandas":
        raise ValueError(f"unknown probe mode {probe!r}")
    from pyspark.sql.functions import pandas_udf

    sc = incoming.sparkSession.sparkContext
    # signed longs from bit_or reinterpret (never convert) to uint64:
    # a word with bit 63 set is a NEGATIVE Python int, which
    # np.array(dtype=uint64) rejects outright on NumPy >= 2.0.
    # The broadcast lives until Spark's ContextCleaner collects the
    # closure — per-batch callers in a long-lived driver share the
    # session-level cleanup cadence, same as every broadcast join.
    bwords = sc.broadcast(np.array(words, dtype=np.int64).view(np.uint64))

    @pandas_udf("boolean")
    def _might(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        w = bwords.value
        a = np.vstack(pos.to_numpy()).astype(np.int64)  # (n, k) positions
        hits = (w[a >> 6] >> (a & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(hits.all(axis=1))

    return incoming.withColumn("__might", _might(F.array(*pos_cols))).select(
        *incoming.columns, "__might"
    )


def bloom_prefiltered_anti_join(
    incoming: DataFrame,
    existing: DataFrame,
    fp_col: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 4,
    probe: str = "auto",
    words: list[int] | None = None,
) -> DataFrame:
    """Rows of ``incoming`` whose ``fp_col`` does not occur in ``existing``.

    Exactly ``incoming ANTI JOIN existing ON fp`` (the oracle): rows the
    filter does NOT know are definitely new (no false negatives) and
    bypass the join entirely; only the bloom-positive candidates — true
    duplicates plus the small false-positive slice — reach the exact
    anti-join.  ``probe``: ``literal`` (array-literal JVM bit tests),
    ``pandas`` (broadcast numpy + Arrow-batched udf; the scale path),
    or ``auto`` (literal up to 256 words — measured at sf0.1, a
    2048-literal array costs ~4 s/run in plan/codegen handling while
    the broadcast probe stays ~1 s warm at any filter size; the
    cutover keeps the pure-JVM path only where it is actually free).
    """
    reserved = {"__might", "__bloom_words"} | {
        f"__p{i}" for i in range(num_hashes)
    } | {f"__w{i}" for i in range(num_hashes)}
    clash = reserved & set(incoming.columns)
    if clash:
        raise ValueError(
            f"incoming frame uses the operator's working column names {sorted(clash)}"
        )
    if words is None:
        words = build_bloom_words(existing, fp_col, num_bits, num_hashes)
    # else: caller passes a prebuilt filter (num_bits/num_hashes must
    # match the build) — a standing artifact's filter is rebuilt only
    # when the artifact version changes, not per probe batch
    tagged = bloom_might_tagged(
        incoming, words, fp_col, num_bits, num_hashes, probe=probe
    )

    # materialize the tag ONCE (lineage-truncating cache): both branches
    # below consume it, and without this the incoming scan + k hashes /
    # Arrow probe would execute twice — doubling exactly the stage the
    # prefilter exists to make cheap
    tagged = tagged.localCheckpoint(eager=False)
    keep = [c for c in incoming.columns]
    definitely_new = tagged.filter(~F.col("__might")).select(*keep)
    candidates = tagged.filter(F.col("__might")).select(*keep)
    # Exact verification, semi-join-first (guide §3.2 shape inverted):
    # the bloom-positive slice is delta-bounded, so its fp set
    # broadcasts; semi-joining ``existing`` against it turns the
    # reference pass into a MAP-ONLY scan (no corpus-side
    # distinct/shuffle — the old ``existing.distinct()`` anti join
    # shuffled the whole reference table per probe batch), and the
    # surviving fps (≤ candidate count) broadcast back for the anti
    # join. Result identical: the anti join only asks which candidate
    # fps EXIST in ``existing``.
    cand_fps = candidates.select(fp_col).distinct()
    present = (
        existing.select(fp_col)
        .join(F.broadcast(cand_fps), on=fp_col, how="left_semi")
        .distinct()
    )
    verified_new = candidates.join(
        F.broadcast(present), on=fp_col, how="left_anti"
    ).select(*keep)
    return definitely_new.unionByName(verified_new)
