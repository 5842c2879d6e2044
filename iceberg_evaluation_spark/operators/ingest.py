"""Gated delta ingest: quality-classify AND dedup each incoming delta
in one pass against standing artifacts — the production 100 TB ingest
loop (r5 verdict #5).

The reference's curation pipelines fold daily delta drops into standing
tables (reference src/data_curation/glue_jobs/update_tpcds.py:56-62);
an LLM-data pipeline additionally quality-gates every incoming document
(CCNet/fastText-style classifier, operators/classifier.py) and
deduplicates it against everything already ingested
(operators/incremental_dedup.py). Running those as two separate corpus
passes doubles the delta scan; :class:`GatedIngestSession` composes
them into ONE:

1. score the delta with the hashed linear classifier — a broadcast
   B-row model, two hash aggregations, no Python in the hot path;
   rows below the keep threshold are ``rejected`` and never reach the
   (more expensive) dedup stages, so the gate also PRUNES dedup work;
2. surviving rows run the standing-artifact dedup: bloom-prefiltered
   exact anti-join, band-index bucket join, exact-Jaccard verify
   against only candidate partners (never a corpus re-scan);
3. rows classified ``new`` are folded into the artifacts AND appended
   to the standing corpus table, so the next delta — the next
   micro-batch in a foreachBatch loop — sees them with no rebuild.

Model discipline mirrors the per-version cached bloom words
(incremental_dedup.DedupState.bloom_words): the weight frame is
VALIDATED ONCE per session (exactly one row per hash bucket —
classifier.validate_weights) and reused across every delta with the
check off; ``model_validations`` exposes the count so the replay
oracle can pin validate-once behavior.

Statuses: ``rejected`` (failed the quality gate — includes docs with
no scoreable features, e.g. whitespace-only text), ``exact_dup``,
``near_dup``, ``new``. Rejected and duplicate rows are NEVER appended
anywhere, so the corpus table accumulates exactly the accepted-new
rows — fingerprints_final = corpus + Σ new per delta, an arithmetic
the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables.snapshot_table import SnapshotTable
from .classifier import hashed_classifier_scores, validate_weights
from .incremental_dedup import (
    DedupState,
    SemanticState,
    incremental_neardup_dedup,
    incremental_semantic_dedup,
)

__all__ = ["GatedIngestSession", "gated_semantic_delta"]


def gated_semantic_delta(
    state: SemanticState,
    delta: DataFrame,
    corpus_lookup: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_norm: float = 0.5,
    threshold: float = 0.95,
    append_new: bool = True,
    check_lookup: bool = True,
) -> DataFrame:
    """Embedding-modality twin of :meth:`GatedIngestSession.process_delta`:
    gate each delta vector on its L2 NORM (degenerate/zero/collapsed
    embeddings are upstream-encoder failures — magnitude is the cheap
    JVM-side quality signal for unit-normalized embedding spaces), then
    run survivors through the standing SRP-band incremental dedup in the
    same pass. Rejected vectors never reach the band join and are never
    folded into the index.

    Returns ``(id, norm, status)`` with status in {'rejected', 'dup',
    'new'}; ``norm`` is round(L2, 6) — exactly replayable in SQL, so the
    gate threshold compares identical values in both engines.
    """
    d = delta.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    scored = d.withColumn(
        "norm",
        F.round(
            F.sqrt(
                F.aggregate(
                    "vec", F.lit(0.0), lambda acc, x: acc + x * x
                )
            ),
            6,
        ),
    ).localCheckpoint(eager=False)  # feeds reject AND keep branches
    # NULL norm (NULL embedding, or NULL elements poisoning the sum) is
    # the degenerate case the gate exists for: REJECT it explicitly — a
    # plain `< min_norm` filter evaluates NULL to false on both branches
    # and would silently drop the row from the output
    rejected = scored.filter(
        F.col("norm").isNull() | (F.col("norm") < min_norm)
    ).select("id", "norm", F.lit("rejected").alias("status"))
    kept = scored.filter(F.col("norm") >= min_norm)
    if hasattr(corpus_lookup, "fetch"):
        # BucketedLookup: pruned partner fetch happens inside the
        # incremental dedup (cast-to-double applies at the verify)
        lookup = corpus_lookup
    else:
        lookup = corpus_lookup.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
    deduped = incremental_semantic_dedup(
        state,
        kept,
        lookup,
        id_col="id",
        vec_col="vec",
        threshold=threshold,
        append_new=append_new,
        check_lookup=check_lookup,
    )
    return rejected.unionByName(
        deduped.join(scored.select("id", "norm"), "id").select(
            "id", "norm", "status"
        )
    )


class GatedIngestSession:
    """A standing (model, dedup-state, corpus-table) triple that
    processes deltas one foreachBatch micro-batch at a time.

    ``corpus_table`` is the standing (id, text) table the dedup
    artifacts were built FROM; the session appends accepted-new rows to
    it, keeping the partner lookup and the artifacts in sync (the
    check_lookup coverage guard holds by construction). Pass a
    ``tables.bucketed_lookup.BucketedLookup`` (the at-scale layout) and
    each delta's partner fetch file-prunes to the candidate ids'
    buckets instead of scanning the corpus per micro-batch; a plain
    ``SnapshotTable`` keeps the scan-per-delta behavior.
    """

    def __init__(
        self,
        state: DedupState,
        weights: DataFrame,
        corpus_table: SnapshotTable,
        *,
        id_col: str,
        text_col: str,
        num_buckets: int = 1024,
        bias: float = -0.05,
        keep_threshold: float = 0.5,
        dedup_threshold: float = 0.7,
        shingle_n: int | None = None,
    ):
        validate_weights(weights, num_buckets)  # once per model version
        self.model_validations = 1
        self.state = state
        self.weights = weights
        self.corpus_table = corpus_table
        self.id_col = id_col
        self.text_col = text_col
        self.num_buckets = num_buckets
        self.bias = bias
        self.keep_threshold = keep_threshold
        self.dedup_threshold = dedup_threshold
        # default to the state's own build-time geometry; an explicit
        # mismatch fails loudly at the first delta (incremental_neardup_
        # dedup validates against the state)
        self.shingle_n = state.shingle_n if shingle_n is None else shingle_n

    def update_model(self, weights: DataFrame) -> None:
        """Roll a NEW model version into the standing ingest loop.

        The replacement frame is validated exactly once (same contract
        as the constructor), so a long-running foreachBatch loop can
        swap models between micro-batches without re-paying the check
        per delta — the per-version discipline of the cached bloom
        words. ``model_validations`` counts total validations, one per
        version ever installed."""
        validate_weights(weights, self.num_buckets)
        self.model_validations += 1
        self.weights = weights

    def process_delta(
        self, delta: DataFrame, *, append_new: bool = True
    ) -> DataFrame:
        """Classify one delta; fold accepted-new rows into the state.

        Returns ``(id, prob, status)`` — one row per delta row, prob
        NULL only for unscoreable (featureless) rows, which are
        ``rejected``. Side effects under ``append_new``: new rows'
        fingerprints/bands go to the artifacts and their (id, text) to
        the corpus table, so the NEXT call sees them.
        """
        idc, txc = self.id_col, self.text_col
        d = delta.select(
            F.col(idc).alias("id"), F.col(txc).alias("text")
        ).localCheckpoint(eager=False)  # scored AND dedup'd — one lineage

        scores = hashed_classifier_scores(
            d, "text", "id", self.weights,
            num_buckets=self.num_buckets, bias=self.bias,
            threshold=self.keep_threshold,
            check_weights=False,  # validated once at session start
        )
        scored = d.join(
            scores.select("id", "prob", "label"), "id", "left"
        ).localCheckpoint(eager=False)  # feeds reject AND keep branches

        rejected = scored.filter(
            F.col("label").isNull() | (F.col("label") == "drop")
        ).select("id", "prob", F.lit("rejected").alias("status"))

        kept = scored.filter(F.col("label") == "keep")
        if hasattr(self.corpus_table, "fetch"):
            # BucketedLookup: pass it through — the partner fetch inside
            # incremental_neardup_dedup becomes a candidate-bucket
            # pruned read instead of a full corpus scan per delta
            lookup = self.corpus_table
        else:
            lookup = self.corpus_table.read().select(
                F.col(idc).alias("id"), F.col(txc).alias("text")
            )
        deduped = incremental_neardup_dedup(
            self.state,
            kept,
            lookup,
            "id",
            "text",
            threshold=self.dedup_threshold,
            shingle_n=self.shingle_n,
            append_new=append_new,
            # the lookup IS the table the artifacts mirror (both fold the
            # same accepted-new rows below), but keep the coverage guard
            # on: it turns a crash-induced artifact/table desync into a
            # loud error on the NEXT delta instead of silent recall loss
            check_lookup=True,
        )
        if append_new:
            accepted = kept.join(
                deduped.filter(F.col("status") == "new").select("id"),
                "id",
                "left_semi",
            ).select(
                F.col("id").alias(idc), F.col("text").alias(txc)
            ).localCheckpoint(eager=False)
            # "any new rows?" is already answered by the fold itself:
            # the classify-with-append path exposes its __n_new count on
            # the state (accepted == the folded set by construction —
            # both are the 'new'-status ids). Reading it from the state
            # instead of a fingerprint-table version bump keeps the gate
            # exact even when a rival session commits to the fingerprint
            # table in the same window (r11 ADVICE), and costs no jobs.
            if self.state.last_fold_new_rows:
                self.corpus_table.append(accepted)

        return rejected.unionByName(
            deduped.join(scored.select("id", "prob"), "id").select(
                "id", "prob", "status"
            )
        )
