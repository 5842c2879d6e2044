"""Similarity search over embedding columns (``array<float>``).

Baseline is exact brute-force cosine top-k: broadcast the (small) query
set against the corpus — one scan, no shuffle except the final per-query
top-k, which Catalyst executes as partial top-k per partition
(window + filter under AQE). The scale path is IVF: a coarse quantizer
assigns every vector to its nearest centroid (cells are the partition
key), queries probe only ``nprobe`` cells — at 100 TB this turns a full
scan into a pruned scan of nprobe/ncells of the data.

Dot products run through ``F.zip_with`` + ``F.aggregate`` in whole-stage
codegen after casting to double (float32 accumulation is not
reproducible across engines; double is, for 64-dim vectors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.scalar import scalar_collect

__all__ = [
    "srp_chunks",
    "cosine_topk",
    "cosine_pairs",
    "ivf_cosine_topk",
    "srp_neardup_pairs",
    "semantic_dedup",
]


def _spread(df: DataFrame) -> DataFrame:
    """Small parquet inputs arrive as one partition; fan out before the
    CPU-heavy vector math so it uses every core. Already-partitioned
    inputs pass through — no gratuitous corpus shuffle at scale."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, p // 2):
        return df
    return df.repartition(p)


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (0.0 when either is zero)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(_dot(a, b) / denom)


def _rownorm_np(M):
    """Row-normalize a numpy matrix (zero rows pass through)."""
    import numpy as np

    nrm = np.linalg.norm(M, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return M / nrm


def cells_udf(bc, n: int):
    """Arrow-batched nearest-cell assignment against a BROADCAST
    row-normalized centroid matrix: each batch is one BLAS matmul, no
    shuffle touches the vectors. Self-contained closure (broadcast
    handle + int only) — workers don't need this package on sys.path.
    Returns the ``n`` nearest 1-based cell ids per vector."""

    def _cells(v_ser):
        import numpy as _np
        import pandas as _pd

        Mn = bc.value
        A = _np.stack([_np.asarray(x, dtype="float64") for x in v_ser])
        an = _np.linalg.norm(A, axis=1, keepdims=True)
        an[an == 0] = 1.0
        sims = (A / an) @ Mn.T
        # ties break to the lower cell id (stable argsort)
        idx = _np.argsort(-sims, axis=1, kind="stable")[:, :n] + 1
        return _pd.Series([r.tolist() for r in idx])

    return F.pandas_udf(_cells, "array<int>")


def train_centroids(
    v: DataFrame,
    *,
    id_col: str,
    n_cells: int,
    kmeans_iters: int = 2,
    train_sample_mod: int | None = None,
):
    """Spherical k-means on (id, ``_v`` array<double>) rows; returns the
    row-normalized centroid matrix (numpy, n_cells × dim) or None for an
    empty input. Shared by the one-shot ``ivf_cosine_topk`` and the
    durable ``AnnState`` (build/retrain). Init is deterministic (the
    n_cells lexicographically-first vectors by id); each Lloyd round is
    one assignment pass + one skinny (cell, dim) mean shuffle; the only
    driver round-trips are the bounded n_cells×dim mean collects."""
    import numpy as np

    sc = v.sparkSession.sparkContext
    # orderBy+limit = TakeOrderedAndProject (per-partition top-k, driver
    # merge of n_cells rows) — never a global single-partition window
    cent_vecs = [
        np.asarray(r["_v"], dtype="float64")
        for r in v.orderBy(id_col).limit(n_cells).collect()
    ]
    if not cent_vecs:
        return None
    M = _rownorm_np(np.stack(cent_vecs))
    train = v
    if train_sample_mod and train_sample_mod > 1:
        train = v.filter(F.pmod(F.xxhash64(F.col(id_col)), train_sample_mod) == 0)
    # unit vectors staged as a real column so the HOF lambda doesn't
    # re-evaluate the norm per element
    train = train.withColumn("_n", _norm(F.col("_v"))).select(
        "_v",
        F.when(F.col("_n") == 0, F.col("_v"))
        .otherwise(F.transform("_v", lambda x: x / F.col("_n")))
        .alias("_vu"),
    )
    for _ in range(max(0, kmeans_iters)):
        bc_i = sc.broadcast(M)
        # bounded output (n_cells × dim rows), no join: scalar-safe
        means = scalar_collect(
            train.withColumn(
                "cell", F.element_at(cells_udf(bc_i, 1)(F.col("_v")), 1)
            )
            .select("cell", F.posexplode("_vu").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
        )
        M2 = M.copy()
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"] - 1, {})[r["pos"]] = r["m"]
        for ci, dims in by_cell.items():
            vec = np.array([dims.get(p, 0.0) for p in range(M.shape[1])])
            if np.linalg.norm(vec) > 0:
                M2[ci] = vec
        M = _rownorm_np(M2)
    return M


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for every query vector (brute force baseline).

    ``queries`` must have (query_id_col, vec_col). The query side is
    broadcast — top-k is computed with one pass over the corpus. Ties are
    broken by corpus id for determinism. Output:
    (query_id, vec_id, cosine_sim, rk).
    """
    c = _spread(corpus).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    q = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    denom = F.col("_cn") * F.col("_qn")
    sim = F.when(denom == 0, F.lit(0.0)).otherwise(
        _dot(F.col("_cv"), F.col("_qv")) / denom
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(sim, 6).alias("cosine_sim"),
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def cosine_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with sim ≥ t.

    Exact all-pairs — quadratic by definition; at 100 TB use
    ``ivf_cosine_topk``-style cell blocking or LSH instead. Output:
    (id_a, id_b, cosine_sim).
    """
    # norms are precomputed per vector, not per pair: the per-pair work
    # drops to one dot product, and the arithmetic (dot / (na*nb)) is
    # bit-identical to computing norms inline
    v = _spread(df).select(
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    )
    v = v.withColumn("_nm", _norm(F.col("_v")))
    a = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_nm").alias("_na"))
    b = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_nm").alias("_nb"))
    denom = F.col("_na") * F.col("_nb")
    sim = F.when(denom == 0, F.lit(0.0)).otherwise(
        _dot(F.col("_va"), F.col("_vb")) / denom
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(sim, 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 2,
    train_sample_mod: int | None = None,
) -> DataFrame:
    """Approximate top-k via IVF (inverted file) coarse quantization.

    Centroids start from the ``n_cells`` lexicographically-first corpus
    vectors by id (deterministic init) and are refined with
    ``kmeans_iters`` rounds of spherical k-means (Lloyd on unit vectors):
    assign via the same Arrow-batched pandas_udf used for the final
    assignment, average member unit-vectors per cell with a
    posexplode + per-(cell, dim) mean (one shuffle of n×dim skinny rows
    per round; set ``train_sample_mod=m`` to train on the deterministic
    ``xxhash64(id) % m == 0`` sample at scale), re-normalize, rebroadcast.
    Empty cells keep their previous centroid.

    Cell assignment is a **narrow** Arrow-batched pandas_udf over a
    broadcast centroid matrix: no shuffle touches the corpus, each batch
    is one BLAS matmul, and the scheme scales to any n_cells×dim
    (inlining centroids as a literal expression tree blows codegen into
    interpreted fallback and ships MB-scale task binaries; a centroid
    join would shuffle the corpus). Each query probes its ``nprobe``
    nearest cells, so the scored fraction is ~nprobe/n_cells. Output:
    (query_id, vec_id, cosine_sim, rk).
    """
    v = _spread(corpus).select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    M = train_centroids(
        v,
        id_col=id_col,
        n_cells=n_cells,
        kmeans_iters=kmeans_iters,
        train_sample_mod=train_sample_mod,
    )
    if M is None:  # empty corpus → empty result, stable schema
        return (
            queries.select(F.col(query_id_col))
            .limit(0)
            .withColumn(id_col, F.lit(None).cast(corpus.schema[id_col].dataType))
            .withColumn("cosine_sim", F.lit(0.0))
            .withColumn("rk", F.lit(0))
        )

    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(M)
    assigned = v.withColumn("cell", F.element_at(cells_udf(bc, 1)(F.col("_v")), 1))
    qv = queries.select(F.col(query_id_col), _as_double(F.col(vec_col)).alias("_qv"))
    q = qv.withColumn("cell", F.explode(cells_udf(bc, nprobe)(F.col("_qv")))).select(
        query_id_col, "_qv", "cell"
    )
    scored = assigned.join(F.broadcast(q), "cell").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("_v"), F.col("_qv")), 6).alias("cosine_sim"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    **srp_kwargs,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column.

    Blocked near-dup pair discovery via :func:`srp_neardup_pairs` (no
    O(n²) stage), then the deterministic keep-first policy: a vector is
    DROPPED when any lower-id vector is cosine-similar above
    ``threshold``; otherwise kept. Identical vectors always collide in
    every SRP band, so exact-duplicate removal is guaranteed by
    construction; near-duplicates are removed with the SRP band recall.

    The whole pipeline is integer-deterministic and engine-portable
    (inherited from ``srp_neardup_pairs``), so an exact SQL oracle can
    replay it — unlike k-means-cell SemDeDup, whose float centroid drift
    makes raw outputs hash-unstable.

    Output per input vector: ``(id_col, n_lower_nbrs, kept)`` —
    distributed join against the pair set; no driver-side state.
    """
    pairs = srp_neardup_pairs(
        df, id_col=id_col, vec_col=vec_col, threshold=threshold, **srp_kwargs
    )
    nbrs = pairs.groupBy(F.col("id_b").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_lower_nbrs")
    )
    return (
        df.select(id_col)
        .join(nbrs, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_lower_nbrs"), F.lit(0)).alias("n_lower_nbrs"),
            (F.coalesce(F.col("n_lower_nbrs"), F.lit(0)) == 0).alias("kept"),
        )
    )


def srp_chunks(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 64,
    band_bits: int = 16,
    quant_scale: int = 1_000_000,
) -> DataFrame:
    """(_id, chunk, cval): the deterministic integer SRP band signature.

    Factored out of :func:`srp_neardup_pairs` so the INCREMENTAL path
    (operators/incremental_dedup.py) can band a delta batch with the
    exact same arithmetic the persisted corpus artifact was built with —
    cross-run band equality is the whole contract. See
    srp_neardup_pairs' docstring for why every stage is integer-exact
    and engine-portable.
    """
    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    )

    # ±1 hyperplane entries from md5 parity: first hex digit <= '7' → +1
    sign_tbl = (
        spark.range(n_bits * dim)
        .select(
            (F.col("id") / dim).cast("int").alias("bit"),
            (F.col("id") % dim).cast("int").alias("pos"),
        )
        .withColumn(
            "s",
            F.when(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit("srp"), F.col("bit"), F.col("pos"))),
                    1,
                    1,
                )
                <= "7",
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
    )

    exploded = base.select(
        "_id", F.posexplode("_v").alias("pos", "_val")
    ).select(
        "_id",
        "pos",
        F.round(F.col("_val") * quant_scale, 0).cast("bigint").alias("vq"),
    )
    proj = (
        exploded.join(F.broadcast(sign_tbl), "pos")
        .groupBy("_id", "bit")
        .agg(F.sum(F.col("vq") * F.col("s")).alias("pr"))
    )
    return proj.groupBy(
        "_id", (F.col("bit") / band_bits).cast("int").alias("chunk")
    ).agg(
        F.sum(
            F.when(
                F.col("pr") >= 0,
                F.pow(F.lit(2), F.col("bit") % band_bits).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("cval")
    )


def srp_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    dim: int = 64,
    n_bits: int = 64,
    band_bits: int = 16,
    quant_scale: int = 1_000_000,
    max_bucket: int = 200,
) -> DataFrame:
    """Blocked embedding near-dup pairs via deterministic integer SRP-LSH.

    The scale path for embedding dedup (vs the all-pairs
    :func:`cosine_pairs` diagnostic): signed-random-projection LSH with a
    banded blocking join — no O(n²) stage anywhere.

    Every stage is **exactly deterministic and engine-portable**, so a
    DuckDB oracle can mirror the full pipeline bit-for-bit:

    - hyperplanes are ±1 Rademacher vectors derived from
      ``md5('srp:<bit>:<pos>')`` hex parity — no RNG, no engine-specific
      hash (both engines have md5);
    - vectors are quantized to BIGINT (``round(v*1e6)``) BEFORE
      projection, so each projection is an INTEGER sum — associative,
      order-independent, immune to float accumulation order (a double
      dot product would flip sign bits near 0 between engines);
    - signatures split into ``n_bits/band_bits`` bands; candidates are
      pairs agreeing exactly on any band (equi-join on (band, value) —
      hash-shuffle, broadcast-free, AQE-skew-safe);
    - per-(band, value) buckets are capped at ``max_bucket`` members
      (keep-lowest-id, deterministic) so a degenerate embedding cluster
      cannot go quadratic at 100 TB;
    - candidates are verified with the exact double cosine and filtered
      at ``threshold``.

    Identical vectors always share all bands, so exact-duplicate recall
    is 1.0 by construction (the property the planted-duplicate oracle
    checks); near-identical pairs match a band with probability
    ``1-(1-(1-θ/π)^band_bits)^bands``. Output: (id_a, id_b, cosine_sim).
    """
    # fan out the full-corpus scan before the projection pipeline:
    # posexplode + the ×n_bits sign join + two aggregates are narrow on
    # the input partitioning, so a 1-2-split scan would serialize the
    # whole signature computation onto 1-2 cores (measured 2.4 s of a
    # 4 s query at sf0.1). The delta path (srp_chunks called directly
    # from incremental_dedup) stays unspread — delta batches are small
    # and per-batch repartitions measured as pure overhead there.
    df = _spread(df)
    base = df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    chunks = srp_chunks(
        df,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        n_bits=n_bits,
        band_bits=band_bits,
        quant_scale=quant_scale,
    )
    w = W.partitionBy("chunk", "cval").orderBy("_id")
    capped = chunks.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max_bucket
    )
    a = capped.select("chunk", "cval", F.col("_id").alias("id_a"))
    b = capped.select("chunk", "cval", F.col("_id").alias("id_b"))
    cand = (
        a.join(b, ["chunk", "cval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
