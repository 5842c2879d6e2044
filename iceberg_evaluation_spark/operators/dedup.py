"""Deduplication operators for large-scale training-data pipelines.

Four families, all expressed as compositions of built-in DataFrame ops so
Catalyst/Tungsten keep the whole pipeline in JVM codegen — no Python in
the hot path, no driver-side collects, no O(n²) cross joins:

- exact:     md5-fingerprint groupBy (one shuffle on the hash)
- minhash:   word-shingles → k-permutation MinHash → banded LSH buckets →
             candidate pairs → exact Jaccard verification
- simhash:   64-bit sign-of-weighted-bits sketch → 4×16-bit band blocking →
             Hamming-distance verification via bit_count(xor)
- n-gram Jaccard (exact): inverted-index blocking on shared shingles —
             guaranteed-complete for threshold > 0 (any pair with
             J ≥ t shares a shingle), so it has an exact SQL oracle.

At 100 TB: every stage shuffles on a hash-distributed key (shingle, band
bucket, pair id) and the band/bucket design bounds bucket sizes; skewed
buckets (stop-shingles) are capped with a per-bucket limit, and AQE's
skew-join handling covers the verification join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "shingles",
    "minhash_signature",
    "minhash_lsh_candidates",
    "minhash_near_duplicates",
    "simhash64",
    "simhash_frame",
    "simhash_near_duplicates",
    "ngram_jaccard_pairs",
]


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def _spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Fan an under-partitioned input across the cluster before CPU-heavy
    per-row expressions. A small parquet file arrives as ONE partition;
    without this every shingle/signature computation would run on a
    single core regardless of cluster size. Inputs that already carry
    enough partitions (any real at-scale scan) pass through untouched —
    an unconditional repartition would add a full corpus shuffle."""
    p = parallelism or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, p // 2):
        return df
    return df.repartition(p)


def _shingle_frame(
    df: DataFrame, id_col: str, text_col: str, n: int, parallelism: int | None = None
) -> DataFrame:
    """(_id, _sh) with shingling computed on the map side of an exchange.

    The trailing hash-repartition on _id is deliberate: every downstream
    branch (signature, both sides of the verification join) consumes the
    SAME exchange, so Spark's ReusedExchange computes shingles once
    instead of once per branch."""
    p = parallelism or df.sparkSession.sparkContext.defaultParallelism
    spread = _spread(df, p)
    if spread is not df:
        # PIN the fan-out: a bare repartition is no barrier to the
        # optimizer — the shingle projection is pushed below it /
        # adjacent repartitions collapse, so tokenize+shingle ends up
        # evaluated at the SCAN's parallelism (1-2 tasks, seconds of
        # serial CPU on a 32-core box) on the map side of the _id
        # exchange. The lazy checkpoint is an RDD boundary no rule can
        # cross; it only fires when _spread repartitioned, i.e. on
        # under-partitioned (hence small) inputs — at-scale scans skip
        # both the repartition and the checkpoint.
        spread = spread.localCheckpoint(eager=False)
    return (
        spread
        .select(F.col(id_col).alias("_id"), shingles(text_col, n).alias("_sh"))
        .repartition(p, "_id")
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact-normalized-text group.

    Single hash-shuffle on the md5 fingerprint; the min-id choice makes the
    survivor deterministic. Returns (id, fingerprint, group_size) for the
    survivors — join back to ``df`` on ``id_col`` to materialize full rows.
    """
    from ..functions.text import fingerprint_md5

    return (
        df.select(F.col(id_col), fingerprint_md5(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select(id_col, "fingerprint", "group_size")
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------
def shingles(text_col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text (array<string>).

    Empty/short docs yield their full token run as a single shingle so no
    document silently disappears from the dedup universe. For a
    string-named column the built tree is a constant — memoized per JVM
    (functions.exprcache), since per-delta operators rebuild it every
    batch and the lambda tree costs real driver time to construct.
    """
    from ..functions.text import normalize_ws

    def _build() -> Column:
        toks = F.split(normalize_ws(text_col), " ")
        k = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(k - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
        return F.array_distinct(grams)

    if isinstance(text_col, str):
        from ..functions.exprcache import cached_expr

        return cached_expr(("shingles", text_col, n), _build)
    return _build()


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------
def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """k-permutation MinHash signature (array<bigint>, length k).

    Each shingle STRING is hashed exactly once (``xxhash64(shingle)``);
    permutation i then re-hashes the resulting int64 with salt i
    (``xxhash64(h, i)``). Hashing a long is far cheaper than hashing the
    string k times, so the per-doc cost drops from k string hashes × |sh|
    to |sh| string hashes + k×|sh| int hashes. Pure built-ins: the
    lambdas run in codegen, not Python.
    """
    hs = F.transform(shingle_col, lambda s: F.xxhash64(s))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(hs, lambda h: F.xxhash64(h, i))),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH over MinHash.

    bands=16 × rows=4 over 64 hashes targets J≈0.5+ recall. Stages:
    signature (narrow) → explode band hashes (narrow) → shuffle on
    (band, bucket) → within-bucket pairing. ``max_bucket`` caps
    pathological buckets (boilerplate shingles) so one hot bucket cannot
    quadratically dominate a 100 TB run; dropped buckets are the standard
    recall/robustness trade and are logged by callers if needed.

    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    rows = num_hashes // bands
    sh = _shingle_frame(df, id_col, text_col, shingle_n)
    return _lsh_candidates_from_shingles(
        sh, num_hashes=num_hashes, bands=bands, max_bucket=max_bucket
    )


def _lsh_candidates_from_shingles(
    sh: DataFrame, *, num_hashes: int, bands: int, max_bucket: int
) -> DataFrame:
    rows = num_hashes // bands
    from ..functions.exprcache import cached_expr

    # geometry-constant trees, built once per JVM (see exprcache): the
    # signature lambda tree + the 64-term band structs cost ~1 s of py4j
    # construction, and bench iterations/per-delta callers repay it
    sig_col = cached_expr(
        ("lsh_sig", num_hashes),
        lambda: minhash_signature(F.col("_sh"), num_hashes).alias("_sig"),
    )

    def _bb() -> Column:
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.element_at(F.col("_sig"), b * rows + j + 1)
                        for j in range(rows)
                    ],
                    F.lit(b),
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
        return F.explode(F.array(*band_structs)).alias("bb")

    banded = (
        sh.select("_id", sig_col)
        .select("_id", cached_expr(("lsh_bb", num_hashes, bands), _bb))
        .select(
            "_id",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
    )

    # cap bucket size: deterministic keep-lowest-ids inside each bucket
    from pyspark.sql import Window as W

    w = W.partitionBy("band", "bucket").orderBy("_id")
    capped = banded.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_bucket
    )

    a = capped.select("band", "bucket", F.col("_id").alias("id_a"))
    b = capped.select("band", "bucket", F.col("_id").alias("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _jaccard(sh_a: Column, sh_b: Column) -> Column:
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(F.array_union(sh_a, sh_b))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter.cast("double") / union)


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard ≥ threshold.

    The verification join re-attaches shingle arrays to both pair sides —
    two shuffles on id, both AQE-skew-protected. Output:
    (id_a, id_b, jaccard).
    """
    sh = _shingle_frame(df, id_col, text_col, shingle_n)
    cands = _lsh_candidates_from_shingles(
        sh, num_hashes=num_hashes, bands=bands, max_bucket=200
    )
    return (
        cands.join(
            sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a")), "id_a"
        )
        .join(
            sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b")), "id_b"
        )
        .select(
            "id_a",
            "id_b",
            F.round(_jaccard(F.col("_sh_a"), F.col("_sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash64(text_col: str | Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash over word shingles, entirely in built-ins.

    Per document: hash each shingle to 64 bits, sum ±1 per bit position,
    take the sign bit. The per-bit loop is a codegen'd higher-order
    ``aggregate`` over the shingle array — no explode, no shuffle.
    """
    sh = shingles(text_col, shingle_n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    # literal masks for all 64 bit positions (bit 63 = int64 sign bit)
    masks = F.array(
        *[F.lit(2**i) for i in range(63)], F.lit(-(2**63))
    )
    # one pass over the shingle array accumulating all 64 bit votes
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    # bit assembly as ONE fold over (votes, masks): sum the mask of every
    # positive vote (bit 63's mask is -(2^63), so the two's-complement
    # sign bit lands exactly as the old per-bit chain produced it). The
    # earlier 64-term `element_at(votes, i)` chain embedded a full COPY
    # of the votes aggregate per term — a ~105 KB expression string that
    # dominated q37's plan (437 KB explain output, 64x-duplicated tree
    # walked by every analyzer/optimizer rule); this form references
    # `votes` once.
    return F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v > 0, m.cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )


def simhash_frame(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 2
) -> DataFrame:
    """(_id, _sh) SimHash sketches via explode + hash-aggregate.

    The per-bit vote is re-expressed as 64 plain long SUMs over exploded
    shingle hashes: explode (narrow) → partial hash agg on the map side →
    one shuffle of 64 longs per doc → final agg + bit assembly. Unlike
    the array-``aggregate`` form (:func:`simhash64`), every stage is
    whole-stage-codegen'd with zero per-element array allocation — ~6×
    faster at sf0.1 and the shuffle payload is doc-count-bounded, so the
    shape holds at 100 TB.
    """
    hs = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.transform(shingles(text_col, shingle_n), lambda s: F.xxhash64(s))
        ).alias("_h"),
    )
    votes = [
        F.sum(
            F.when(F.col("_h").bitwiseAND(F.lit(m)) != 0, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i, m in enumerate([2**i for i in range(63)] + [-(2**63)])
    ]
    voted = hs.groupBy("_id").agg(*votes)
    out = F.lit(0).cast("bigint")
    for i in range(63):
        out = out + F.when(
            F.col(f"_b{i}") > 0, F.lit(2**i).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    out = out + F.when(
        F.col("_b63") > 0, F.lit(-(2**63)).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    return voted.select("_id", out.alias("_sh"))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    shingle_n: int = 2,
) -> DataFrame:
    """SimHash near-dup pairs: block on 4×16-bit bands (pigeonhole — any
    pair with Hamming ≤ 3 matches exactly on ≥1 of 4 bands), verify with
    ``bit_count(xor)``. Output (id_a, id_b, hamming)."""
    sk = simhash_frame(_spread(df), id_col, text_col, shingle_n)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("_sh"), b * 16)
            .bitwiseAND(F.lit(0xFFFF))
            .alias("chunk"),
        )
        for b in range(4)
    ]
    banded = sk.select(
        "_id", "_sh", F.explode(F.array(*band_structs)).alias("bc")
    ).select("_id", "_sh", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    a = banded.select("band", "chunk", F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = banded.select("band", "chunk", F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b"))
    return (
        a.join(b, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_sh_a").bitwiseXOR(F.col("_sh_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard with inverted-index blocking (SQL-oracle-able)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_shingle_df: int | None = None,
    require_exact: bool = False,
) -> DataFrame:
    """ALL pairs with word-``n``-gram Jaccard ≥ threshold (> 0), exactly.

    Blocking is an inverted index on shingles: explode → self-join on the
    shingle → distinct pairs. Complete because J ≥ t > 0 implies at least
    one shared shingle. The shingle join key is hash-distributed; AQE
    skew-join covers moderate imbalance.

    ``max_shingle_df`` bounds the stop-shingle blow-up: shingles whose
    document frequency exceeds the cap are dropped from the CANDIDATE
    index only (a df-d shingle alone contributes d² candidate rows, so
    boilerplate can go quadratic without it). Candidates are then
    verified against the FULL shingle arrays, so the cap can never create
    a false pair or perturb a jaccard value — its only effect is the
    documented recall edge: a pair whose EVERY shared shingle is above
    the cap is not generated (its docs are near-pure boilerplate; with
    cap c and threshold t such pairs need > c other docs sharing each of
    their shingles). Output: (id_a, id_b, jaccard).

    ``require_exact=True`` turns the cap's exactness PRECONDITION into a
    runtime check: callers that feed exact oracles (the shared q69/q90
    cluster artifact) assume no shingle's df exceeds the cap — a
    scale-dependent fact, not a property of the operator — so a 1-row
    assert_true guard over the observed max df is broadcast onto the
    result (executing inside the same job, no extra corpus pass) and a
    violation raises at action time instead of silently missing pairs
    at a larger scale factor.
    """
    sh = _shingle_frame(df, id_col, text_col, shingle_n)
    # Set sizes ride ALONG the inverted index (8 bytes/posting) instead of
    # joining back per pair: |A| and |B| are functionally dependent on the
    # pair key, so min() in the pair aggregate recovers them for free and
    # the two size joins (and their extra reads of the shingle exchange)
    # disappear from the plan.
    inv = sh.select("_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("_g"))
    # Materialize the inverted index ONCE (lineage-truncating, lazy).
    # Every consumer below references `inv` 2-5 times and each reference
    # composes further (inv_rare = inv ⋉ dfreq(inv), hot_sets =
    # inv ⋉ dfreq(inv), …); because column pruning pushes a DIFFERENT
    # projection into each copy, the subtrees stop being identical and
    # ReusedExchange never fires — measured at sf0.1 (q33): the physical
    # plan held 16 copies of the scan→tokenize→shingle→explode pipeline
    # (16 Scan parquet / 16 Generate, 0 ReusedExchange), the hot CPU
    # work serialized into 1-2-task broadcast-build stages, 3.4 s each.
    # One checkpoint = one corpus pass; at scale the exploded index is
    # the operator's own working set (it is shuffled multiple times
    # regardless), so storing it once beats 16 corpus re-reads.
    inv = inv.localCheckpoint(eager=False)

    if max_shingle_df is None:
        # |∩| falls straight out of the inverted index: shingles are
        # distinct per doc, so the per-pair match count IS the
        # intersection size — no per-pair array ops, just one shuffle on
        # the pair key.
        inter = (
            inv.alias("x")
            .join(inv.alias("y"), "_g")
            .filter(F.col("x._id") < F.col("y._id"))
            .groupBy(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
            .agg(
                F.count(F.lit(1)).alias("_inter"),
                F.min("x._n").alias("_na"),
                F.min("y._n").alias("_nb"),
            )
        )
        return (
            inter.select(
                "id_a",
                "id_b",
                F.round(
                    F.col("_inter").cast("double")
                    / (F.col("_na") + F.col("_nb") - F.col("_inter")),
                    6,
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )

    # Split the index at the cap. Rare shingles drive candidate generation
    # AND contribute their intersection counts straight from the pair join
    # (shingles are distinct per doc). Hot shingles (> cap) are carried as
    # tiny per-doc arrays and intersected per candidate pair — exact |∩|
    # without ever self-joining a hot posting list or shuffling the full
    # shingle arrays. |∩| = rare_pair_count + |hot_a ∩ hot_b|.
    # dfreq feeds three consumers (≤cap filter, two >cap semi-join
    # probes) — checkpoint it too so the per-shingle count aggregate
    # runs once over the checkpointed index, not once per consumer
    # (distinct-shingle cardinality × 16 B — far below the index itself)
    dfreq = (
        inv.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"))
        .localCheckpoint(eager=False)
    )
    if require_exact:
        # the precondition check must not cost a second corpus pass: a
        # 1-row assert_true guard is broadcast-cross-joined onto the
        # RESULT, so the max-df aggregate executes inside the same job
        # (sharing the shingle exchange) and a violation raises at
        # action time instead of silently missing pairs.
        guard = dfreq.agg(F.max("_df").alias("_m")).select(
            F.assert_true(
                F.coalesce(F.col("_m"), F.lit(0)) <= F.lit(max_shingle_df),
                F.concat(
                    F.lit(
                        "ngram_jaccard_pairs(require_exact=True): observed "
                        "max shingle df "
                    ),
                    F.col("_m").cast("string"),
                    F.lit(
                        f" exceeds max_shingle_df={max_shingle_df}; pairs "
                        "whose every shared shingle is hotter than the cap "
                        "would be silently missed. Raise the cap "
                        "(exactness) or drop require_exact (documented "
                        "boilerplate-recall contract)."
                    ),
                ),
            ).alias("_guard")
        )
    inv_rare = inv.join(
        dfreq.filter(F.col("_df") <= max_shingle_df).select("_g"), "_g", "left_semi"
    )
    hot_sets = (
        inv.join(
            dfreq.filter(F.col("_df") > max_shingle_df).select("_g"), "_g", "left_semi"
        )
        .groupBy("_id")
        .agg(F.collect_set("_g").alias("_hot"))
    )
    inter_rare = (
        inv_rare.alias("x")
        .join(inv_rare.alias("y"), "_g")
        .filter(F.col("x._id") < F.col("y._id"))
        .groupBy(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("_ir"),
            F.min("x._n").alias("_na"),
            F.min("y._n").alias("_nb"),
        )
    )
    empty = F.array().cast("array<string>")
    inter = (
        inter_rare.join(
            hot_sets.select(F.col("_id").alias("id_a"), F.col("_hot").alias("_ha")),
            "id_a",
            "left",
        )
        .join(
            hot_sets.select(F.col("_id").alias("id_b"), F.col("_hot").alias("_hb")),
            "id_b",
            "left",
        )
        .select(
            "id_a",
            "id_b",
            "_na",
            "_nb",
            (
                F.col("_ir")
                + F.size(
                    F.array_intersect(
                        F.coalesce(F.col("_ha"), empty),
                        F.coalesce(F.col("_hb"), empty),
                    )
                )
            ).alias("_inter"),
        )
    )
    out = (
        inter.select(
            "id_a",
            "id_b",
            F.round(
                F.col("_inter").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if require_exact:
        # The guard must survive Catalyst/AQE even when the RESULT is
        # empty — which is exactly the all-shingles-hot failure mode —
        # so no join placement works (empty-relation propagation skips
        # the other side). Instead a schema-shaped ghost branch is
        # UNIONED in: the assert evaluates when the runtime filter runs
        # (isNotNull on the assert output is not foldable), contributes
        # zero rows when the precondition holds, and raises otherwise.
        ghost = guard.filter(F.col("_guard").isNotNull()).select(
            F.lit(None).cast(out.schema["id_a"].dataType).alias("id_a"),
            F.lit(None).cast(out.schema["id_b"].dataType).alias("id_b"),
            F.lit(None).cast("double").alias("jaccard"),
        )
        out = out.unionByName(ghost)
    return out
