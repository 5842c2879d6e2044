"""Gated delta ingest (operators/ingest) — classify + dedup in one pass
against standing artifacts, accepted-new rows folded back (r5 verdict #5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.incremental_dedup import build_dedup_state
from iceberg_evaluation_spark.operators.ingest import GatedIngestSession
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "pack my box with five dozen liquor jugs for the annual county fair"),
]


def _weights(spark, wt: float, n: int = 64):
    return spark.range(n).select(
        F.col("id").cast("int").alias("bucket"), F.lit(wt).alias("wt")
    )


def _session(spark, tmp_path, wt=1.0, **kw):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    table = SnapshotTable(spark, str(tmp_path / "corpus"))
    table.create_or_replace(docs)
    state = build_dedup_state(
        spark, table.read(), "doc_id", "text",
        str(tmp_path / "fp"), str(tmp_path / "bands"),
    )
    return GatedIngestSession(
        state, _weights(spark, wt), table,
        id_col="doc_id", text_col="text", num_buckets=64, **kw
    )


def test_statuses_and_gate(spark, tmp_path):
    s = _session(spark, tmp_path, wt=1.0)  # logit ~0.95 → everything keeps
    assert s.model_validations == 1
    delta = spark.createDataFrame(
        [
            (101, CORPUS[0][1]),                    # exact copy
            (102, CORPUS[1][1].replace(" ", "  ")),  # ws jitter → near
            (103, "totally fresh text about catalyst physical planning"),
            (104, "   "),                            # featureless → rejected
        ],
        "doc_id bigint, text string",
    )
    got = {r["id"]: r["status"] for r in s.process_delta(delta).collect()}
    assert got == {
        101: "exact_dup", 102: "near_dup", 103: "new", 104: "rejected",
    }
    # only the accepted-new row joined the corpus table + artifacts
    assert s.corpus_table.read().count() == len(CORPUS) + 1
    assert s.state.fingerprints.read().count() == len(CORPUS) + 1


def test_rejected_rows_are_never_folded(spark, tmp_path):
    s = _session(spark, tmp_path, wt=-1.0)  # logit ~ -1.05 → all drop
    delta = spark.createDataFrame(
        [(201, "some candidate document that fails the quality gate")],
        "doc_id bigint, text string",
    )
    got = {r["id"]: r["status"] for r in s.process_delta(delta).collect()}
    assert got == {201: "rejected"}
    assert s.corpus_table.read().count() == len(CORPUS)
    assert s.state.fingerprints.read().count() == len(CORPUS)
    # the same text re-sent later is STILL rejected (gate is the reason),
    # never exact_dup — rejected rows left no fingerprint behind
    again = spark.createDataFrame(
        [(202, "some candidate document that fails the quality gate")],
        "doc_id bigint, text string",
    )
    got2 = {r["id"]: r["status"] for r in s.process_delta(again).collect()}
    assert got2 == {202: "rejected"}


def test_accumulation_across_deltas(spark, tmp_path):
    s = _session(spark, tmp_path, wt=1.0)
    d1 = spark.createDataFrame(
        [(301, "first never seen document all about shuffle partitioning")],
        "doc_id bigint, text string",
    )
    assert {r["status"] for r in s.process_delta(d1).collect()} == {"new"}
    # same text, new id, NEXT delta → exact_dup against the grown state
    d2 = spark.createDataFrame(
        [(302, "first never seen document all about shuffle partitioning")],
        "doc_id bigint, text string",
    )
    assert {r["status"] for r in s.process_delta(d2).collect()} == {"exact_dup"}
    assert s.corpus_table.read().count() == len(CORPUS) + 1
    assert s.model_validations == 1  # still validated exactly once


def test_invalid_model_rejected_at_session_start(spark, tmp_path):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    table = SnapshotTable(spark, str(tmp_path / "c2"))
    table.create_or_replace(docs)
    state = build_dedup_state(
        spark, table.read(), "doc_id", "text",
        str(tmp_path / "fp2"), str(tmp_path / "bands2"),
    )
    with pytest.raises(ValueError, match="exactly one row per bucket"):
        GatedIngestSession(
            state, _weights(spark, 1.0, n=63), table,
            id_col="doc_id", text_col="text", num_buckets=64,
        )


def test_append_new_false_is_side_effect_free(spark, tmp_path):
    s = _session(spark, tmp_path, wt=1.0)
    vf = s.state.fingerprints.current_version()
    vc = s.corpus_table.current_version()
    d = spark.createDataFrame(
        [(401, "fresh text that would normally be folded into the state")],
        "doc_id bigint, text string",
    )
    assert {r["status"] for r in s.process_delta(d, append_new=False).collect()} == {"new"}
    assert s.state.fingerprints.current_version() == vf
    assert s.corpus_table.current_version() == vc


def test_gated_semantic_delta(spark, tmp_path):
    """Embedding twin: norm gate rejects BEFORE the band join, accepted
    news fold into the index, rejected never do."""
    from iceberg_evaluation_spark.operators.incremental_dedup import (
        build_semantic_state,
    )
    from iceberg_evaluation_spark.operators.ingest import gated_semantic_delta

    def vec(seed, scale=1.0):
        return [scale * float(((seed * 31 + i * 7) % 13) - 6) for i in range(64)]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(4)], "vec_id bigint, embedding array<double>"
    )
    state = build_semantic_state(spark, corpus, str(tmp_path / "b"))
    v0 = state.bands.current_version()
    # corpus norms are ~sqrt(64*avg(sq)) >> 1; gate at min_norm=1.0
    delta = spark.createDataFrame(
        [
            (101, vec(2)),          # exact copy → dup
            (102, vec(2, 0.001)),   # same direction, collapsed norm → rejected
            (103, vec(97)),         # fresh → new, folded
            (104, [0.0] * 64),      # zero vector → rejected
        ],
        "vec_id bigint, embedding array<double>",
    )
    got = {r["id"]: r["status"] for r in gated_semantic_delta(
        state, delta, corpus, min_norm=1.0
    ).collect()}
    assert got == {101: "dup", 102: "rejected", 103: "new", 104: "rejected"}
    assert state.bands.current_version() == v0 + 1  # only 103 folded
    # replay: 103's twin is now a dup; rejected stays rejected
    d2 = spark.createDataFrame(
        [(201, vec(97)), (202, [0.0] * 64)],
        "vec_id bigint, embedding array<double>",
    )
    got2 = {r["id"]: r["status"] for r in gated_semantic_delta(
        state, d2, corpus.unionByName(delta), min_norm=1.0, append_new=False
    ).collect()}
    assert got2 == {201: "dup", 202: "rejected"}


def test_mid_stream_model_refresh(spark, tmp_path):
    """A model rollout between micro-batches revalidates ONCE and
    changes gating from that batch on; an invalid replacement raises
    and leaves the standing model untouched."""
    s = _session(spark, tmp_path, wt=1.0)  # v1: everything keeps
    d = spark.createDataFrame(
        [(501, "a fresh document about adaptive query execution")],
        "doc_id bigint, text string",
    )
    assert {r["status"] for r in s.process_delta(d, append_new=False).collect()} == {"new"}
    # invalid rollout: rejected, old model stays live
    import pytest

    with pytest.raises(ValueError, match="exactly one row per bucket"):
        s.update_model(_weights(spark, 1.0, n=63))
    assert s.model_validations == 1
    assert {r["status"] for r in s.process_delta(d, append_new=False).collect()} == {"new"}
    # valid rollout to an all-reject model
    s.update_model(_weights(spark, -1.0))
    assert s.model_validations == 2
    assert {r["status"] for r in s.process_delta(d, append_new=False).collect()} == {"rejected"}


def test_null_embedding_is_rejected_not_dropped(spark, tmp_path):
    """Review fix: a NULL embedding (or NULL elements poisoning the
    norm) must surface as 'rejected' — a bare `< min_norm` filter
    evaluates NULL to false on both branches and loses the row."""
    from iceberg_evaluation_spark.operators.incremental_dedup import (
        build_semantic_state,
    )
    from iceberg_evaluation_spark.operators.ingest import gated_semantic_delta

    corpus = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(1, 3)],
        "vec_id bigint, embedding array<double>",
    )
    state = build_semantic_state(spark, corpus, str(tmp_path / "nb"))
    delta = spark.createDataFrame(
        [
            (11, [2.0] * 8),
            (12, None),
            (13, [1.0, None, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = {r["id"]: r["status"] for r in gated_semantic_delta(
        state, delta, corpus, min_norm=1.0, append_new=False
    ).collect()}
    assert out == {11: "new", 12: "rejected", 13: "rejected"}
