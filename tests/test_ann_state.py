"""Durable IVF ANN index (operators/ann_state): persisted centroids +
cell-partitioned inverted lists, restart-safe geometry, pruned probes,
append-without-retrain and staleness-triggered retrain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.ann_state import (
    build_ann_state,
    open_ann_state,
)
from iceberg_evaluation_spark.operators.similarity import cosine_topk


def _vectors(spark, n, dim=8, seed_shift=0):
    # deterministic structured vectors: 4 well-separated direction
    # groups plus per-id jitter, no RNG
    return spark.range(n).select(
        (F.col("id") + seed_shift).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda p: (
                F.when((p % 4) == (F.col("id") + seed_shift) % 4, 1.0)
                .otherwise(0.0)
                + ((F.col("id") + seed_shift) * (p + 1) % 97) / 970.0
            ).cast("float"),
        ).alias("embedding"),
    )


def _roots(tmp_path):
    return str(tmp_path / "cent"), str(tmp_path / "assign")


def test_full_probe_equals_brute_force(spark, tmp_path):
    """nprobe = n_cells scores the whole corpus — the persisted-index
    path must then EQUAL exact brute-force top-k, row for row."""
    corpus = _vectors(spark, 120)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=8)
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in st.topk(queries, k=5, nprobe=8).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    assert got == exact


def test_probe_reads_are_partition_pruned(spark, tmp_path):
    """The inverted-list read must be file-pruned to the probed cells —
    a 2-cell probe over a 8-cell index reads a strict minority of
    files (the BucketedLookup receipt pattern)."""
    corpus = _vectors(spark, 200)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=8)
    all_files = st.assignments._read_snapshot(
        st.assignments.current_version()
    )["files"]
    queries = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    probed = st.probe_files(queries, nprobe=2)
    assert 0 < len(probed) < len(all_files)
    assert len(st.probe_cells(queries, 2)) == 2
    # results through the pruned read match results through a full probe
    # on the overlap of probed cells (sanity: the pruned top-k is a
    # subset of the corpus, k rows returned)
    assert st.topk(queries, k=5, nprobe=2).count() == 5


def test_append_then_reopen_preserves_geometry_and_finds_delta(
    spark, tmp_path
):
    """The standing-pipeline restart shape: build, append WITHOUT
    retrain, reopen from disk (geometry from meta, not the caller), and
    the reopened index must return appended vectors for their own
    queries. Staleness flips once appends cross the threshold."""
    corpus = _vectors(spark, 100)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus, cent, assign, n_cells=4, retrain_fraction=0.5
    )
    assert st.n_at_train == 100 and not st.stale()

    delta = _vectors(spark, 60, seed_shift=1000)
    assert st.append(delta) == 60
    assert st.stale()  # 60/100 > 0.5

    st2 = open_ann_state(spark, cent, assign)
    assert (st2.n_cells, st2.dim) == (4, 8)
    assert st2.n_at_train == 100 and st2.n_appended == 60
    assert st2.stale()
    # a delta vector queried against the reopened index finds ITSELF
    q = delta.filter(F.col("vec_id") == 1001).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top1 = st2.topk(q, k=1, nprobe=4).collect()
    assert top1[0]["vec_id"] == 1001

    # retrain folds the appends into a fresh quantizer and resets counters
    assert st2.retrain() == 160
    assert st2.n_appended == 0 and not st2.stale()
    st3 = open_ann_state(spark, cent, assign)
    assert st3.n_at_train == 160
    assert st3.topk(q, k=1, nprobe=4).collect()[0]["vec_id"] == 1001


def test_open_refuses_geometry_mismatch(spark, tmp_path):
    """r7 verdict #5 applied from birth: artifacts rebuilt underneath a
    stale meta (different n_cells) must refuse to open, never silently
    probe the wrong cells."""
    import os
    import shutil

    corpus = _vectors(spark, 80)
    cent, assign = _roots(tmp_path)
    build_ann_state(spark, corpus, cent, assign, n_cells=4)
    meta_bak = str(tmp_path / "meta_bak")
    shutil.copy(os.path.join(assign, "ANN_META"), meta_bak)
    # rebuild the artifacts with DIFFERENT geometry at the same roots
    build_ann_state(spark, corpus, cent, assign, n_cells=8)
    # restore the stale meta: meta says 4 cells, artifacts carry 8
    shutil.copy(meta_bak, os.path.join(assign, "ANN_META"))
    with pytest.raises(ValueError, match="geometry mismatch"):
        open_ann_state(spark, cent, assign)


def test_empty_query_set_and_empty_corpus(spark, tmp_path):
    corpus = _vectors(spark, 40)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4)
    empty_q = corpus.limit(0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert st.topk(empty_q, k=3, nprobe=2).count() == 0
    assert st.probe_files(empty_q, 2) == []
    with pytest.raises(ValueError, match="empty corpus"):
        build_ann_state(
            spark, corpus.limit(0), str(tmp_path / "c2"), str(tmp_path / "a2")
        )


def test_open_survives_compaction_of_assignments(spark, tmp_path):
    """Maintenance commits don't re-stamp geometry; open must read the
    newest STAMPED snapshot, not the newest snapshot."""
    corpus = _vectors(spark, 100)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4)
    for i in range(3):
        st.append(_vectors(spark, 10, seed_shift=2000 + i * 10))
    st.assignments.compact(target_file_mb=64)
    st2 = open_ann_state(spark, cent, assign)
    assert st2.n_cells == 4 and st2.n_appended == 30
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert st2.topk(q, k=1, nprobe=4).collect()[0]["vec_id"] == 0


def test_retrain_rejects_concurrent_append(spark, tmp_path, monkeypatch):
    """r8 verdict #1a: a delta appended between retrain()'s version pin
    and its assignments rewrite must surface as ConcurrentCommitError —
    and a retry on fresh state trains over EVERY vector, losing none
    (mirror of test_rebucket_rejects_concurrent_append)."""
    import iceberg_evaluation_spark.operators.ann_state as mod
    from iceberg_evaluation_spark.tables.snapshot_table import (
        ConcurrentCommitError,
    )

    corpus = _vectors(spark, 100)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4)

    orig = mod.train_centroids
    fired = {}

    def train_with_rival_append(*a, **k):
        # a second session's append lands AFTER retrain pinned its
        # input version but BEFORE its rewrite commits
        if not fired:
            fired["x"] = True
            rival = open_ann_state(spark, cent, assign)
            assert rival.append(_vectors(spark, 20, seed_shift=5000)) == 20
        return orig(*a, **k)

    monkeypatch.setattr(mod, "train_centroids", train_with_rival_append)
    with pytest.raises(ConcurrentCommitError):
        st.retrain()

    # retry on FRESH state: the rival's 20 vectors are in the corpus
    st2 = open_ann_state(spark, cent, assign)
    assert st2.n_appended == 20  # log-derived, not meta-derived
    assert st2.retrain() == 120
    q = _vectors(spark, 20, seed_shift=5000).filter(
        F.col("vec_id") == 5003
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    assert st2.topk(q, k=1, nprobe=4).collect()[0]["vec_id"] == 5003


def test_mid_retrain_crash_refuses_then_repairs(spark, tmp_path, monkeypatch):
    """r8 verdict #1b + ADVICE (medium): a crash between retrain()'s
    assignments commit and its centroid commit leaves the pair
    inconsistent with an UNCHANGED geometry fingerprint. The sync-token
    witness must refuse the next open (AnnSyncError — never a silent
    probe through stale centroids), and repair_ann_state() must heal
    with every vector still probeable."""
    from iceberg_evaluation_spark.operators.ann_state import (
        AnnSyncError,
        repair_ann_state,
    )
    from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

    corpus = _vectors(spark, 100)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4)
    st.append(_vectors(spark, 60, seed_shift=1000))

    orig = SnapshotTable.create_or_replace

    def crash_on_centroid_commit(self, *a, **k):
        if self.root == cent:
            raise RuntimeError("simulated crash between the two commits")
        return orig(self, *a, **k)

    monkeypatch.setattr(
        SnapshotTable, "create_or_replace", crash_on_centroid_commit
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        st.retrain()
    monkeypatch.undo()

    # assignments carry the new token, centroids the old one → refuse
    with pytest.raises(AnnSyncError, match="sync-token mismatch"):
        open_ann_state(spark, cent, assign)

    healed = repair_ann_state(spark, cent, assign)
    assert healed.n_at_train == 160 and healed.n_appended == 0
    st2 = open_ann_state(spark, cent, assign)  # opens cleanly again
    for probe_id in (0, 1001):  # original + appended both probeable
        q = (
            _vectors(spark, 100)
            .unionByName(_vectors(spark, 60, seed_shift=1000))
            .filter(F.col("vec_id") == probe_id)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        assert st2.topk(q, k=1, nprobe=4).collect()[0]["vec_id"] == probe_id


def test_counters_derive_from_log_not_meta(spark, tmp_path):
    """r8 ADVICE (low): n_appended must survive the crash-between-
    commit-and-meta-write and the two-concurrent-appenders cases — i.e.
    it is derived from commit summaries, so a stale or even DELETED
    counter in ANN_META cannot under-report staleness."""
    import json
    import os

    corpus = _vectors(spark, 100)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus, cent, assign, n_cells=4, retrain_fraction=0.5
    )
    # two appends through two independent handles (concurrent sessions)
    open_ann_state(spark, cent, assign).append(
        _vectors(spark, 30, seed_shift=3000)
    )
    open_ann_state(spark, cent, assign).append(
        _vectors(spark, 40, seed_shift=4000)
    )
    # meta carries NO counters at all (static geometry only)
    meta = json.load(open(os.path.join(assign, "ANN_META")))
    assert "n_appended" not in meta and "n_at_train" not in meta
    st2 = open_ann_state(spark, cent, assign)
    assert (st2.n_at_train, st2.n_appended) == (100, 70)
    assert st2.stale()  # 70/100 > 0.5 — no silent retrain deferral


def _skewed_vectors(spark, n, dim=8):
    """Adversarially skewed: ~90% of vectors cluster around ONE
    direction (dim 0 dominant, small jitter), the rest spread across
    the remaining axes — vanilla k-means leaves one fat cell."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda p: (
                F.when(
                    (F.col("id") % 10 < 9) & (p == 0), 1.0
                )  # the hot direction
                .when(
                    (F.col("id") % 10 >= 9) & (p == F.col("id") % 8), 1.0
                )
                .otherwise(0.0)
                + (F.col("id") * (p + 3) % 101) / 1010.0  # per-id jitter
            ).cast("float"),
        ).alias("embedding"),
    )


def test_cell_sizes_reports_hot_cell_and_split_shrinks_probe(spark, tmp_path):
    """r8 verdict #3: the skewed corpus concentrates in one cell;
    cell_sizes() must surface it, split_cell() must cut the bytes a
    probe of that region reads, and the index stays CORRECT (full
    probe == brute force) and reopenable after the evolution."""
    corpus = _skewed_vectors(spark, 400)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4)

    sizes = st.cell_sizes()
    hot = max(sizes, key=sizes.get)
    total = sum(sizes.values())
    assert sizes[hot] > total / 4  # skew: the hot cell is over-weighted

    # a query IN the hot cell previously reads the whole fat partition
    hot_qid = (
        st.assignments.read()
        .filter(F.col("_ann_cell") == hot)
        .agg(F.min("vec_id").alias("m"))
        .collect()[0]["m"]
    )
    q = corpus.filter(F.col("vec_id") == hot_qid).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    import os

    def probe_bytes(state):
        return sum(
            os.path.getsize(os.path.join(state.assignments.root, f))
            for f in state.probe_files(q, nprobe=1)
        )

    before = probe_bytes(st)
    new_ids = st.split_cell(hot, n_sub=4)
    assert new_ids[0] == hot and len(new_ids) > 1
    assert st.n_cells == 4 + len(new_ids) - 1

    after = probe_bytes(st)
    assert after < before  # the probe no longer pays the whole fat cell
    post = st.cell_sizes()
    assert post[hot] < sizes[hot]
    assert sum(post.values()) > 0 and set(new_ids) <= set(post)

    # correctness: full probe over the evolved index == brute force
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in st.topk(queries, k=5, nprobe=st.n_cells).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    assert got == exact

    # the restart: meta, geometry stamps and sync tokens all agree
    st2 = open_ann_state(spark, cent, assign)
    assert st2.n_cells == st.n_cells
    assert st2.topk(queries, k=5, nprobe=st2.n_cells).count() == 15


def test_split_cell_rejects_concurrent_append_and_restores_meta(
    spark, tmp_path, monkeypatch
):
    """split_cell writes meta first (repair converges on it); a rival
    append between its version pin and its rewrite must surface as
    ConcurrentCommitError AND leave the meta restored, so subsequent
    opens see consistent geometry with zero healing needed."""
    import iceberg_evaluation_spark.operators.ann_state as mod
    from iceberg_evaluation_spark.tables.snapshot_table import (
        ConcurrentCommitError,
    )

    corpus = _skewed_vectors(spark, 200)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4)
    hot = max(st.cell_sizes(), key=st.cell_sizes().get)

    orig = mod.train_centroids
    fired = {}

    def train_with_rival_append(*a, **k):
        if not fired:
            fired["x"] = True
            rival = open_ann_state(spark, cent, assign)
            rival.append(_vectors(spark, 10, seed_shift=7000))
        return orig(*a, **k)

    monkeypatch.setattr(mod, "train_centroids", train_with_rival_append)
    with pytest.raises(ConcurrentCommitError):
        st.split_cell(hot, n_sub=2)
    monkeypatch.undo()

    st2 = open_ann_state(spark, cent, assign)  # opens clean, old geometry
    assert st2.n_cells == 4 and st2.n_appended == 10
    # and the split succeeds on retry over fresh state
    assert st2.split_cell(hot, n_sub=2)[0] == hot
    assert open_ann_state(spark, cent, assign).n_cells == 5


def test_int8_codec_probes_with_high_recall_and_fewer_bytes(spark, tmp_path):
    """r8 verdict #5: int8-quantized inverted lists (q57's codec inside
    the durable index). Recall vs exact brute force stays high (the
    cosine scale cancellation makes dequantized scoring the exact
    rescore of the stored vector), the full append → reopen → split
    lifecycle works on the quantized layout, and the stored bytes are
    STRICTLY below the float64 layout's for the same corpus."""
    import os

    corpus = _vectors(spark, 150)
    c8, a8 = str(tmp_path / "c8"), str(tmp_path / "a8")
    cf, af = str(tmp_path / "cf"), str(tmp_path / "af")
    st8 = build_ann_state(spark, corpus, c8, a8, n_cells=4, codec="int8")
    stf = build_ann_state(spark, corpus, cf, af, n_cells=4)

    def stored_bytes(st):
        snap = st.assignments._read_snapshot(
            st.assignments.current_version()
        )
        return sum(
            os.path.getsize(os.path.join(st.assignments.root, f))
            for f in snap["files"]
        )

    assert stored_bytes(st8) < stored_bytes(stf)

    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in st8.topk(queries, k=5, nprobe=4).collect()
    }
    # full probe: at worst the int8 rounding flips near-ties at the
    # k-boundary; recall must stay >= 4/5 per query set overall
    assert len(got & exact) >= 20  # 5 queries x >=4 of 5

    # append + reopen on the quantized layout (codec from meta)
    st8.append(_vectors(spark, 30, seed_shift=1000))
    re8 = open_ann_state(spark, c8, a8)
    assert re8.codec == "int8" and re8.n_appended == 30
    q = _vectors(spark, 30, seed_shift=1000).filter(
        F.col("vec_id") == 1001
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    assert re8.topk(q, k=1, nprobe=4).collect()[0]["vec_id"] == 1001

    # retrain and split keep the codec (storage schema round-trips)
    assert re8.retrain() == 180
    hot = max(re8.cell_sizes(), key=re8.cell_sizes().get)
    re8.split_cell(hot, n_sub=2)
    re8b = open_ann_state(spark, c8, a8)
    assert re8b.codec == "int8" and re8b.n_cells == 5
    assert re8b.topk(q, k=1, nprobe=5).collect()[0]["vec_id"] == 1001


def test_append_epoch_is_exactly_once(spark, tmp_path):
    """Streaming leg of the ANN pipeline: a replayed foreachBatch epoch
    must be skipped (marker rides in the same commit as the data, the
    IdempotentEpochSink recipe), empty batches don't consume epochs,
    per-query_id isolation holds, and a REOPENED index (fresh
    watermarks) still detects the replay from the durable markers."""
    corpus = _vectors(spark, 80)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4)

    b0 = _vectors(spark, 10, seed_shift=1000)
    b1 = _vectors(spark, 10, seed_shift=2000)
    assert st.append_epoch(b0, "s1", 0) == 10
    assert st.append_epoch(b1, "s1", 1) == 10
    assert st.append_epoch(b0, "s1", 0) == 0   # crash-replay of epoch 0
    assert st.append_epoch(b1, "s1", 1) == 0   # crash-replay of epoch 1
    assert st.append_epoch(b1.limit(0), "s1", 2) == 0  # empty batch
    # a SECOND stream's epoch numbering is independent (per-query_id)
    assert st.append_epoch(_vectors(spark, 5, seed_shift=3000), "s2", 0) == 5
    with pytest.raises(ValueError, match="query_id is required"):
        st.append_epoch(b0, "", 3)

    # restart: durable markers, not session watermarks, decide replays
    re = open_ann_state(spark, cent, assign)
    assert re.last_sink_epoch("s1") == 1 and re.last_sink_epoch("s2") == 0
    assert re.append_epoch(b1, "s1", 1) == 0
    assert re.n_appended == 25  # 10 + 10 + 5, replays excluded
    # probe a streamed vector with no exact twin in the corpus (the
    # jitter repeats for ids congruent mod 388 — 1001 has no collision)
    q = b0.filter(F.col("vec_id") == 1001).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert re.topk(q, k=1, nprobe=4).collect()[0]["vec_id"] == 1001


def test_compact_defragments_without_changing_results(spark, tmp_path):
    """Streaming epoch folds fragment the inverted lists (one file per
    touched cell per epoch); compact() bin-packs them back while
    preserving cell pruning, probe results, geometry/sync checks on
    reopen, and epoch replay detection."""
    corpus = _vectors(spark, 120)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4)
    for e in range(6):  # a day of micro-batch folds
        st.append_epoch(
            _vectors(spark, 8, seed_shift=1000 * (e + 1)), "ing", e
        )
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in st.topk(queries, k=5, nprobe=2).collect()
    }
    probed_before = len(st.probe_files(queries, nprobe=2))
    receipt = st.compact()
    assert receipt["files_after"] < receipt["files_before"]

    reopened = open_ann_state(spark, cent, assign)  # geometry+sync pass
    after = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in reopened.topk(queries, k=5, nprobe=2).collect()
    }
    assert after == before
    # the pruned probe now opens fewer fragments for the same cells
    assert len(reopened.probe_files(queries, nprobe=2)) < probed_before
    # staleness bookkeeping survives the rewrite (log-derived)
    assert reopened.n_appended == 48
    # epoch markers live in prior summaries — replay still detected
    assert (
        reopened.append_epoch(_vectors(spark, 8, seed_shift=6000), "ing", 5)
        == 0
    )
    assert (
        reopened.append_epoch(_vectors(spark, 8, seed_shift=7000), "ing", 6)
        == 8
    )


def test_maintain_runs_signal_gated_actions(spark, tmp_path):
    """maintain() applies exactly the mitigations whose signals fire —
    retrain on staleness, compact on fragmentation, expiry last — and
    the maintained index still probes exactly (full probe == brute
    force), with replay detection intact across the whole pass."""
    corpus = _vectors(spark, 120)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus, cent, assign, n_cells=4, retrain_fraction=0.1
    )
    for e in range(5):  # fragment + cross the staleness threshold
        st.append_epoch(
            _vectors(spark, 8, seed_shift=1000 * (e + 1)), "mq", e
        )
    assert st.stale()
    r = st.maintain(keep_last_snapshots=1)
    assert r["retrained"] == 160  # 120 + 5×8, replay-free
    assert not st.stale()
    # retrain rewrote everything into one commit → nothing left to
    # compact; expiry ran (splits are data-dependent, not asserted)
    assert r["compacted"] is None
    assert r["expired"] is not None
    # exactness after the full pass: probe ALL cells == brute force
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r2["query_id"], r2["vec_id"], r2["rk"])
        for r2 in st.topk(queries, k=5, nprobe=st.n_cells).collect()
    }
    full = corpus
    for e in range(5):
        full = full.unionByName(_vectors(spark, 8, seed_shift=1000 * (e + 1)))
    exact = {
        (r2["query_id"], r2["vec_id"], r2["rk"])
        for r2 in cosine_topk(full, queries, k=5).collect()
    }
    assert got == exact
    # expiry (via maintain) cannot re-open a replayed epoch
    assert st.append_epoch(_vectors(spark, 8, seed_shift=5000), "mq", 4) == 0
    reopened = open_ann_state(spark, cent, assign)
    assert reopened.last_sink_epoch("mq") == 4

    # a healthy index is a no-op pass (signal-gated, driver-side only)
    r2 = st.maintain()
    assert r2 == {
        "retrained": 0, "split_cells": [], "compacted": None,
        "expired": None,
    }


def test_maintain_splits_hot_cell_before_compact(spark, tmp_path):
    """With an aggressive hot-cell budget the pass splits the fattest
    cell (geometry grows) and THEN sees the split's new files in the
    fragmentation signal — order pinned by the receipt."""
    corpus = _vectors(spark, 200)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4)
    r = st.maintain(
        hot_cell_factor=1.01, max_splits=1, frag_files_per_cell=0.5
    )
    assert len(r["split_cells"]) == 1
    assert st.n_cells > 4
    assert r["compacted"] is not None
    assert r["compacted"]["files_after"] <= st.n_cells
    # still exact through the evolved + compacted geometry
    queries = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (x["query_id"], x["vec_id"], x["rk"])
        for x in st.topk(queries, k=5, nprobe=st.n_cells).collect()
    }
    exact = {
        (x["query_id"], x["vec_id"], x["rk"])
        for x in cosine_topk(corpus, queries, k=5).collect()
    }
    assert got == exact


def test_pq_rescored_full_probe_equals_brute_force(spark, tmp_path):
    """PQ codec end-to-end: codec + codebooks round-trip from disk, and
    the two-stage probe (PQ shortlist + exact rescore) with a
    corpus-covering shortlist EQUALS exact brute-force top-k — the
    rescore stage provably recovers everything the lossy codes gave up
    when the shortlist covers the probed set."""
    corpus = _vectors(spark, 120)  # dim 8 → pq4x16: 4 subspaces of 2
    cent, assign = _roots(tmp_path)
    build_ann_state(spark, corpus, cent, assign, n_cells=8, codec="pq4x16")
    st = open_ann_state(spark, cent, assign)
    assert st.codec == "pq4x16"
    assert st.pq_table().read().count() == 4 * 16
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in st.topk_rescored(
            queries, corpus, k=5, nprobe=8, overfetch=24
        ).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    assert got == exact
    # the stored layout is codes-only: no raw vector column on disk
    stored_cols = set(st.assignments.read().columns)
    assert "embedding" not in stored_cols and "_ann_pq" in stored_cols


def test_pq_index_streams_compacts_and_replays(spark, tmp_path):
    """The whole standing-state machinery is codec-independent: epoch
    folds are exactly-once on a PQ index, compact() defragments it, and
    retrain() reuses the persisted codebooks."""
    corpus = _vectors(spark, 100)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus, cent, assign, n_cells=4, codec="pq4x16",
        retrain_fraction=0.05,
    )
    assert st.append_epoch(_vectors(spark, 10, seed_shift=1000), "pq", 0) == 10
    assert st.append_epoch(_vectors(spark, 10, seed_shift=1000), "pq", 0) == 0
    receipt = st.compact()
    assert receipt["files_after"] <= receipt["files_before"]
    reopened = open_ann_state(spark, cent, assign)
    assert reopened.last_sink_epoch("pq") == 0
    assert reopened.stale()
    assert reopened.retrain() == 110  # codebooks reused, all vectors kept
    q = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert reopened.topk_rescored(
        q, corpus, k=3, nprobe=reopened.n_cells, overfetch=8
    ).count() == 6


def test_pq_codec_validation(spark, tmp_path):
    corpus = _vectors(spark, 40)  # dim 8
    cent, assign = _roots(tmp_path)
    with pytest.raises(ValueError, match="must divide dim"):
        build_ann_state(spark, corpus, cent, assign, codec="pq3x16")
    with pytest.raises(ValueError, match="unknown ANN storage codec"):
        build_ann_state(spark, corpus, cent, assign, codec="pq8")
    with pytest.raises(ValueError, match="outside 1..256"):
        build_ann_state(spark, corpus, cent, assign, codec="pq4x512")


def test_pq_codebooks_rebuilt_under_stale_meta_refuse(spark, tmp_path):
    """The geometry witness covers the codebook table too: a state
    rebuilt with different PQ geometry underneath a restored stale
    meta refuses on open instead of decoding with the wrong codebooks."""
    import shutil

    corpus = _vectors(spark, 60)
    cent, assign = _roots(tmp_path)
    build_ann_state(spark, corpus, cent, assign, n_cells=4, codec="pq4x16")
    meta = str(tmp_path / "stale_meta")
    shutil.copy(f"{assign}/ANN_META", meta)
    # rebuild in place with different pq geometry (new codebooks, new
    # stamps), then restore the stale meta — the mismatch must refuse
    build_ann_state(spark, corpus, cent, assign, n_cells=4, codec="pq2x8")
    shutil.copy(meta, f"{assign}/ANN_META")
    with pytest.raises(ValueError, match="geometry mismatch"):
        open_ann_state(spark, cent, assign)


def test_maintain_expires_sibling_artifact_history(spark, tmp_path):
    """maintain(keep_last_snapshots=…) bounds ALL three artifact logs —
    assignments, centroids, and (pq) codebooks — not just the big one;
    the witnesses read the newest stamped snapshot, which survives."""
    corpus = _vectors(spark, 80)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus, cent, assign, n_cells=4, codec="pq4x16",
        retrain_fraction=0.01,
    )
    for _ in range(3):  # each stale retrain adds a centroid snapshot
        st.append(_vectors(spark, 5, seed_shift=9000))
        st.maintain(keep_last_snapshots=1)
    assert len(st.centroids._snapshots()) == 1
    assert len(st.pq_table()._snapshots()) == 1
    assert len(st.assignments._snapshots()) == 1
    reopened = open_ann_state(spark, cent, assign)  # witnesses intact
    assert reopened.codec == "pq4x16"


def test_pq_split_cell_then_reopen(spark, tmp_path):
    """r9 ADVICE (high): split_cell changes n_cells, but the pq
    codebook witness must NOT carry cell geometry — after a hot-cell
    split (which maintain() runs automatically) a pq index must reopen
    cleanly and keep probing correctly."""
    corpus = _vectors(spark, 120)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4, codec="pq4x16")
    hot = max(st.cell_sizes(), key=st.cell_sizes().get)
    st.split_cell(hot, n_sub=2)
    reopened = open_ann_state(spark, cent, assign)  # must not refuse
    assert reopened.n_cells == 5 and reopened.codec == "pq4x16"
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in reopened.topk_rescored(
            queries, corpus, k=5, nprobe=5, overfetch=24
        ).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    assert got == exact


def test_maintain_split_on_pq_index_reopens(spark, tmp_path):
    """The automatic path for the same ADVICE: maintain()'s hot-cell
    split on a pq index must leave the state reopenable."""
    corpus = _vectors(spark, 120)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4, codec="pq4x16")
    receipt = st.maintain(hot_cell_factor=1.01, split_sub=2, max_splits=1)
    assert receipt["split_cells"], "hot_cell_factor ~1 must trigger a split"
    reopened = open_ann_state(spark, cent, assign)
    assert reopened.n_cells == st.n_cells


def test_rescored_falls_back_to_codec_score_for_stale_corpus(spark, tmp_path):
    """r9 ADVICE (low): ids folded into the index after the caller's
    corpus snapshot must not be silently dropped by the rescore join —
    they keep their decoded-codec score and the probe still returns k
    rows per query."""
    corpus = _vectors(spark, 100)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4, codec="pq4x16")
    late = _vectors(spark, 10, seed_shift=1000)
    st.append(late)  # indexed, but NOT in `corpus`
    q = late.filter(F.col("vec_id") == 1001).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = st.topk_rescored(q, corpus, k=5, nprobe=4, overfetch=8).collect()
    assert len(rows) == 5  # k rows despite the stale corpus
    ids = {r["vec_id"] for r in rows}
    assert 1001 in ids  # the appended near-identical vector surfaces
    assert all(r["cosine_sim"] is not None for r in rows)


def test_lloyd_reseeds_empty_clusters():
    """r9 ADVICE (low): a skewed sample must not leave dead/duplicate
    sub-centroids — every cluster ends non-empty when the sample has
    at least k distinct points."""
    import numpy as np

    from iceberg_evaluation_spark.operators.ann_state import _lloyd

    # 60 near-identical points + 4 far-flung distinct ones: the
    # evenly-spaced init lands mostly inside the tight blob, so without
    # reseeding several clusters stay dead forever
    X = np.vstack(
        [
            np.linspace(0, 0.01, 60)[:, None] * np.ones((1, 2)),
            np.array([[100.0, 0.0], [0.0, 100.0], [-100.0, 0.0], [0.0, -100.0]]),
        ]
    )
    C = _lloyd(X, k=8, iters=8)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assigned = np.unique(d2.argmin(axis=1))
    assert len(assigned) == 8, f"dead clusters: {set(range(8)) - set(assigned)}"


def test_sync_from_cdf_keeps_index_lockstep(spark, tmp_path):
    """The index-follows-corpus loop: CDF inserts fold in, deletes
    purge, updates retract-then-apply; the epoch marker doubles as the
    durable cursor so a re-sync (crash replay) applies nothing."""
    from iceberg_evaluation_spark.tables.snapshot_table import (
        MergeClause,
        SnapshotTable,
    )

    corpus = SnapshotTable(spark, str(tmp_path / "corpus"))
    corpus.create_or_replace(_vectors(spark, 100))                   # v1
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus.read(1), cent, assign, n_cells=4,
        retrain_fraction=10.0,
    )
    corpus.append(_vectors(spark, 30, seed_shift=1000))              # v2
    corpus.merge(                                                    # v3
        _vectors(spark, 100).filter(F.col("vec_id") % 5 == 0)
        .select("vec_id", F.lit(True).alias("_d")),
        on=["vec_id"],
        clause=MergeClause(
            matched_delete_condition="s._d", insert_when_not_matched=False
        ),
    )
    r = st.sync_from_cdf(
        corpus, ["vec_id"], query_id="sync", from_version=1
    )
    assert r == {"windows": 2, "folded": 30, "purged": 20}
    # index ids == final corpus ids, exactly
    idx_ids = {r["vec_id"] for r in st.assignments.read().select("vec_id").collect()}
    src_ids = {r["vec_id"] for r in corpus.read().select("vec_id").collect()}
    assert idx_ids == src_ids and len(idx_ids) == 110
    # replay: nothing to do, durable cursor from the marker log
    st2 = open_ann_state(spark, cent, assign)
    assert st2.sync_from_cdf(corpus, ["vec_id"], query_id="sync") == {
        "windows": 0, "folded": 0, "purged": 0,
    }
    # delete-only window: the marker rides the delete commit
    corpus.merge(                                                    # v4
        _vectors(spark, 30, seed_shift=1000)
        .filter(F.col("vec_id") % 3 == 0)
        .select("vec_id", F.lit(True).alias("_d")),
        on=["vec_id"],
        clause=MergeClause(
            matched_delete_condition="s._d", insert_when_not_matched=False
        ),
    )
    r = st2.sync_from_cdf(corpus, ["vec_id"], query_id="sync")
    assert r["windows"] == 1 and r["folded"] == 0 and r["purged"] == 10
    assert st2.last_sink_epoch("sync") == 4
    # probes never see a deleted id
    q = _vectors(spark, 100).filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = st2.topk(q, k=10, nprobe=4).collect()
    final = {r["vec_id"] for r in corpus.read().select("vec_id").collect()}
    assert got and {r["vec_id"] for r in got} <= final


def test_sync_from_cdf_refuses_without_bootstrap_and_past_expiry(
    spark, tmp_path
):
    from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

    corpus = SnapshotTable(spark, str(tmp_path / "corpus"))
    corpus.create_or_replace(_vectors(spark, 60))                    # v1
    cent, assign = _roots(tmp_path)
    st = build_ann_state(spark, corpus.read(1), cent, assign, n_cells=4)
    corpus.append(_vectors(spark, 10, seed_shift=500))               # v2
    with pytest.raises(ValueError, match="no sync marker"):
        st.sync_from_cdf(corpus, ["vec_id"], query_id="s2")
    corpus.append(_vectors(spark, 10, seed_shift=600))               # v3
    corpus.expire_snapshots(keep_last=1)  # v1/v2 manifests gone
    with pytest.raises(ValueError, match="expired past"):
        st.sync_from_cdf(corpus, ["vec_id"], query_id="s2", from_version=1)


def test_sync_from_cdf_is_codec_independent(spark, tmp_path):
    """The index-follows-corpus loop over a PQ-coded index: folds
    encode through the codec, purges rewrite the coded layout, probes
    rescore exactly — same receipts as float64."""
    from iceberg_evaluation_spark.tables.snapshot_table import (
        MergeClause,
        SnapshotTable,
    )

    corpus = SnapshotTable(spark, str(tmp_path / "corpus"))
    corpus.create_or_replace(_vectors(spark, 100))                   # v1
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus.read(1), cent, assign, n_cells=4,
        codec="pq4x16", retrain_fraction=10.0,
    )
    corpus.append(_vectors(spark, 20, seed_shift=2000))              # v2
    corpus.merge(                                                    # v3
        _vectors(spark, 100).filter(F.col("vec_id") % 4 == 1)
        .select("vec_id", F.lit(True).alias("_d")),
        on=["vec_id"],
        clause=MergeClause(
            matched_delete_condition="s._d", insert_when_not_matched=False
        ),
    )
    r = st.sync_from_cdf(corpus, ["vec_id"], query_id="pqsync", from_version=1)
    assert r == {"windows": 2, "folded": 20, "purged": 25}
    re = open_ann_state(spark, cent, assign)
    assert re.codec == "pq4x16"
    idx_ids = {
        r["vec_id"] for r in re.assignments.read().select("vec_id").collect()
    }
    src_ids = {r["vec_id"] for r in corpus.read().select("vec_id").collect()}
    assert idx_ids == src_ids
    # rescored probe over the synced index finds an appended vector
    q = _vectors(spark, 20, seed_shift=2000).filter(
        F.col("vec_id") == 2001
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    got = re.topk_rescored(
        q, corpus.read().select("vec_id", "embedding"), k=3, nprobe=4
    ).collect()
    assert got[0]["vec_id"] == 2001


def test_sync_from_cdf_applies_update_windows(spark, tmp_path):
    """Re-embedding shape: an UPDATE window retracts the preimage and
    folds the postimage — after sync the index serves the NEW vector
    and never the old one."""
    from iceberg_evaluation_spark.tables.snapshot_table import (
        MergeClause,
        SnapshotTable,
    )

    corpus = SnapshotTable(spark, str(tmp_path / "corpus"))
    corpus.create_or_replace(_vectors(spark, 80))                    # v1
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus.read(1), cent, assign, n_cells=4,
        retrain_fraction=10.0,
    )
    # re-embed vec 7: its new vector is (a jittered copy of) vec 40's
    new_vec = _vectors(spark, 80).filter(F.col("vec_id") == 40).select(
        F.lit(7).cast("bigint").alias("vec_id"), "embedding"
    )
    corpus.merge(                                                    # v2
        new_vec,
        on=["vec_id"],
        clause=MergeClause(
            matched_update={"embedding": "s.embedding"},
            insert_when_not_matched=False,
        ),
    )
    r = st.sync_from_cdf(corpus, ["vec_id"], query_id="upd", from_version=1)
    assert r == {"windows": 1, "folded": 1, "purged": 1}
    # exactly one row for vec 7 in the index, and it equals the NEW vector
    stored = st._unpack(
        st.assignments.read().drop("_ann_cell")
    ).filter(F.col("vec_id") == 7).collect()
    assert len(stored) == 1
    want = new_vec.collect()[0]["embedding"]
    assert [round(x, 6) for x in stored[0]["embedding"]] == [
        round(float(x), 6) for x in want
    ]
    # a probe with the NEW vector finds 7 among its top hits
    q = new_vec.select(F.col("vec_id").alias("query_id"), "embedding")
    got = {r["vec_id"] for r in st.topk(q, k=3, nprobe=4).collect()}
    assert 7 in got


# ------------------------------------------------- merge-on-read takedowns
def test_mor_delete_matches_cow_and_is_o_victims(spark, tmp_path):
    """AnnState.delete(mode='merge-on-read') writes one equality-delete
    file instead of rewriting victim-holding cells (r10 verdict #1: a
    scattered opt-out batch under COW rewrites one file per touched
    cell — r10's probe measured 32/32). Contract: probe results
    byte-identical to the COW path, write-amp receipt rewrites ZERO
    data files, every read (topk / pruned probe read / rescore) applies
    the deletes."""
    corpus = _vectors(spark, 200)
    # content-arbitrary victims scatter across every cell
    victims = corpus.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    results = {}
    for mode, sub in (("copy-on-write", "cow"), ("merge-on-read", "mor")):
        cent, assign = str(tmp_path / f"c_{sub}"), str(tmp_path / f"a_{sub}")
        st = build_ann_state(spark, corpus, cent, assign, n_cells=8)
        n = st.delete(victims, mode=mode)
        assert n == victims.count()
        snap = st.assignments._read_snapshot(
            st.assignments.current_version()
        )
        if mode == "merge-on-read":
            # O(|victims|) write shape: no data file rewritten, one
            # equality-delete artifact added, every data file carried
            assert snap["summary"]["rewritten_files"] == 0
            assert snap["summary"]["added_delete_files"] >= 1
            assert snap.get("delete_files")
        else:
            assert snap["summary"]["rewritten_files"] > 0
            assert not snap.get("delete_files")
        results[mode] = {
            (r["query_id"], r["vec_id"], r["rk"], r["cosine_sim"])
            for r in st.topk(queries, k=5, nprobe=8).collect()
        }
        # no deleted id in the results nor in the pruned probe READ
        assert all(v % 7 != 0 for (_, v, _, _) in results[mode])
        probed = st._unpack(
            st.assignments._read_snapshot_df(
                st.assignments._read_snapshot(
                    st.assignments.current_version()
                ),
                only_files=st.probe_files(queries, nprobe=8),
            )
        )
        assert probed.filter(F.col("vec_id") % 7 == 0).count() == 0
    assert results["copy-on-write"] == results["merge-on-read"]


def test_mor_delete_then_append_and_maintain_materializes(spark, tmp_path):
    """Appends after a MOR delete take a HIGHER sequence, so the delete
    file cannot kill them even when ids collide; maintain() sees the
    live equality-deletes and materializes them (compaction publishes a
    delete-free snapshot), after which split_cell is reachable again."""
    corpus = _vectors(spark, 160)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus, cent, assign, n_cells=4, retrain_fraction=10.0
    )
    victims = corpus.filter(F.col("vec_id") < 40).select("vec_id")
    assert st.delete(victims, mode="merge-on-read") == 40
    # re-insert the SAME ids with fresh vectors (takedown then re-license
    # shape): the new rows must survive the older delete file
    reinsert = _vectors(spark, 40, seed_shift=0)  # ids 0..39 again
    assert st.append_epoch(reinsert, "re", 1) == 40
    ids = {
        r["vec_id"]
        for r in st.assignments.read().select("vec_id").collect()
    }
    assert ids == {r["vec_id"] for r in corpus.select("vec_id").collect()}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="live delete files"):
        st.split_cell(1, 2)
    receipt = st.maintain()
    assert receipt["compacted"] is not None
    snap = st.assignments._read_snapshot(st.assignments.current_version())
    assert not snap.get("delete_files")
    # contents unchanged by materialization
    ids2 = {
        r["vec_id"]
        for r in st.assignments.read().select("vec_id").collect()
    }
    assert ids2 == ids
    # split is reachable again on the delete-free snapshot
    st.split_cell(sorted(st.cell_sizes())[0], 2)


def test_sync_from_cdf_merge_on_read_mode(spark, tmp_path):
    """The index-follows-corpus loop with delete_mode='merge-on-read':
    same receipts and same final contents as the COW run, but the purge
    commits are equality-delete files (write cost O(|victims|))."""
    from iceberg_evaluation_spark.tables.snapshot_table import (
        MergeClause,
        SnapshotTable,
    )

    corpus = SnapshotTable(spark, str(tmp_path / "corpus"))
    corpus.create_or_replace(_vectors(spark, 100))                   # v1
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus.read(1), cent, assign, n_cells=4,
        retrain_fraction=10.0,
    )
    corpus.append(_vectors(spark, 30, seed_shift=1000))              # v2
    corpus.merge(                                                    # v3
        _vectors(spark, 100).filter(F.col("vec_id") % 5 == 0)
        .select("vec_id", F.lit(True).alias("_d")),
        on=["vec_id"],
        clause=MergeClause(
            matched_delete_condition="s._d", insert_when_not_matched=False
        ),
    )
    r = st.sync_from_cdf(
        corpus, ["vec_id"], query_id="sync", from_version=1,
        delete_mode="merge-on-read",
    )
    assert r == {"windows": 2, "folded": 30, "purged": 20}
    snap = st.assignments._read_snapshot(st.assignments.current_version())
    assert snap.get("delete_files"), "purge must have landed as MOR"
    idx_ids = {
        r["vec_id"] for r in st.assignments.read().select("vec_id").collect()
    }
    src_ids = {r["vec_id"] for r in corpus.read().select("vec_id").collect()}
    assert idx_ids == src_ids
    # replay applies nothing; maintain materializes the delete files
    assert st.sync_from_cdf(
        corpus, ["vec_id"], query_id="sync", delete_mode="merge-on-read"
    ) == {"windows": 0, "folded": 0, "purged": 0}
    st.maintain()
    snap = st.assignments._read_snapshot(st.assignments.current_version())
    assert not snap.get("delete_files")
    idx_ids2 = {
        r["vec_id"] for r in st.assignments.read().select("vec_id").collect()
    }
    assert idx_ids2 == src_ids


def test_stale_sync_racer_cannot_purge_reinserted_id(spark, tmp_path, monkeypatch):
    """The cross-window delete/re-insert invariant (r10 verdict #6):
    window 2 deletes id X, window 3 re-inserts X with a NEW vector. A
    racer whose window range was computed BEFORE the rival finished
    (stale last_sink_epoch) must not replay window 2's delete against
    the re-inserted vector — each window's delete is marker-guarded by
    a re-read, not by 'victims are already gone'."""
    from iceberg_evaluation_spark.tables.snapshot_table import (
        MergeClause,
        SnapshotTable,
    )

    corpus = SnapshotTable(spark, str(tmp_path / "corpus"))
    corpus.create_or_replace(_vectors(spark, 60))                    # v1
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus.read(1), cent, assign, n_cells=4,
        retrain_fraction=10.0,
    )
    corpus.merge(                                                    # v2: delete X=7
        corpus.read(1).filter(F.col("vec_id") == 7)
        .select("vec_id", F.lit(True).alias("_d")),
        on=["vec_id"],
        clause=MergeClause(
            matched_delete_condition="s._d", insert_when_not_matched=False
        ),
    )
    new_vec = _vectors(spark, 60).filter(F.col("vec_id") == 40).select(
        F.lit(7).cast("bigint").alias("vec_id"), "embedding"
    )
    corpus.append(new_vec)                                           # v3: re-insert X
    # rival sync applies both windows; marker = 3
    assert st.sync_from_cdf(
        corpus, ["vec_id"], query_id="sync", from_version=1
    ) == {"windows": 2, "folded": 1, "purged": 1}

    # the racer: its range computation saw marker 1 (pre-rival), but the
    # in-loop re-read sees the true marker and skips every window whole
    racer = open_ann_state(spark, cent, assign)
    real = racer.last_sink_epoch
    calls = {"n": 0}

    def stale_first(qid):
        calls["n"] += 1
        return 1 if calls["n"] == 1 else real(qid)

    monkeypatch.setattr(racer, "last_sink_epoch", stale_first)
    r = racer.sync_from_cdf(corpus, ["vec_id"], query_id="sync")
    assert r == {"windows": 0, "folded": 0, "purged": 0}
    stored = racer._unpack(
        racer.assignments.read().drop("_ann_cell")
    ).filter(F.col("vec_id") == 7).collect()
    assert len(stored) == 1, "the re-inserted vector must survive the racer"
    want = new_vec.collect()[0]["embedding"]
    assert [round(x, 6) for x in stored[0]["embedding"]] == [
        round(float(x), 6) for x in want
    ]


def test_rescored_fallback_col_and_synced_index_reports_zero(spark, tmp_path):
    """topk_rescored(fallback_col=...) surfaces the stale-corpus
    fallback rate (r10 verdict #8): an index holding vectors a lagging
    corpus snapshot lacks reports fallbacks > 0; the SAME probe against
    the corpus the index is in lockstep with reports exactly zero."""
    from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

    corpus = SnapshotTable(spark, str(tmp_path / "corpus"))
    corpus.create_or_replace(_vectors(spark, 80))                    # v1
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus.read(1), cent, assign, n_cells=4,
        codec="pq4x16", retrain_fraction=10.0,
    )
    corpus.append(_vectors(spark, 20, seed_shift=3000))              # v2
    assert st.sync_from_cdf(
        corpus, ["vec_id"], query_id="fb", from_version=1
    )["folded"] == 20
    q = _vectors(spark, 20, seed_shift=3000).filter(
        F.col("vec_id") == 3001
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    # lagging corpus snapshot (v1): the appended ids fall back
    stale = st.topk_rescored(
        q, corpus.read(1).select("vec_id", "embedding"),
        k=5, nprobe=4, fallback_col="exact_rescored",
    )
    n_fallback = stale.filter(~F.col("exact_rescored")).count()
    assert n_fallback > 0
    # lockstep corpus (current): zero fallbacks
    synced = st.topk_rescored(
        q, corpus.read().select("vec_id", "embedding"),
        k=5, nprobe=4, fallback_col="exact_rescored",
    )
    assert synced.filter(~F.col("exact_rescored")).count() == 0
    assert synced.count() == 5


def test_sync_from_cdf_batched_windows(spark, tmp_path):
    """batch_windows=True coalesces the whole pending span into ONE net
    diff (r10 'What's missing' #3): a source committing many small CDC
    windows costs one delete + one fold instead of one-plus commits per
    source version — with contents identical to the per-version path
    (net semantics: insert-then-delete inside the span appears nowhere,
    a double re-embed nets to one retract+apply) and the same
    crash-replay exactly-once marker."""
    from iceberg_evaluation_spark.tables.snapshot_table import (
        MergeClause,
        SnapshotTable,
    )

    def make_corpus(root):
        c = SnapshotTable(spark, str(tmp_path / root))
        c.create_or_replace(_vectors(spark, 100))                    # v1
        # six small windows: appends, deletes, an insert-then-delete id
        c.append(_vectors(spark, 10, seed_shift=1000))               # v2
        c.merge(                                                     # v3
            _vectors(spark, 100).filter(F.col("vec_id") % 10 == 0)
            .select("vec_id", F.lit(True).alias("_d")),
            on=["vec_id"],
            clause=MergeClause(
                matched_delete_condition="s._d",
                insert_when_not_matched=False,
            ),
        )
        c.append(_vectors(spark, 10, seed_shift=2000))               # v4
        c.merge(                                                     # v5: delete the v4 rows again
            _vectors(spark, 10, seed_shift=2000)
            .select("vec_id", F.lit(True).alias("_d")),
            on=["vec_id"],
            clause=MergeClause(
                matched_delete_condition="s._d",
                insert_when_not_matched=False,
            ),
        )
        c.append(_vectors(spark, 5, seed_shift=3000))                # v6
        return c

    results = {}
    for mode, batched in (("pv", False), ("bw", True)):
        corpus = make_corpus(f"corpus_{mode}")
        cent = str(tmp_path / f"cent_{mode}")
        assign = str(tmp_path / f"assign_{mode}")
        st = build_ann_state(
            spark, corpus.read(1), cent, assign, n_cells=4,
            retrain_fraction=10.0,
        )
        v_before = st.assignments.current_version()
        r = st.sync_from_cdf(
            corpus, ["vec_id"], query_id="s", from_version=1,
            batch_windows=batched,
        )
        commits = st.assignments.current_version() - v_before
        assert r["windows"] == 5
        if batched:
            # net span: v4's insert-then-delete rows appear NOWHERE —
            # folded/purged are the NET counts, and the whole span cost
            # at most one delete + one fold commit
            assert r["folded"] == 15 and r["purged"] == 10
            assert r["commits"] == commits <= 2
        else:
            # per-version replays the churn literally
            assert r["folded"] == 25 and r["purged"] == 20
            assert commits == 5  # 3 folds + 2 delete commits
        results[mode] = {
            r2["vec_id"]
            for r2 in st.assignments.read().select("vec_id").collect()
        }
        # marker = span end either way; replay applies nothing
        assert st.last_sink_epoch("s") == 6
        replay = st.sync_from_cdf(
            corpus, ["vec_id"], query_id="s", batch_windows=batched
        )
        assert replay["windows"] == 0
        assert replay["folded"] == 0 and replay["purged"] == 0
        src = {
            r2["vec_id"] for r2 in corpus.read().select("vec_id").collect()
        }
        assert results[mode] == src
    assert results["pv"] == results["bw"]


def test_mor_delete_is_codec_independent(spark, tmp_path):
    """MOR takedown over a PQ-coded index: the equality-delete file
    holds id keys, the anti join applies BEFORE decode, and the decoded
    probe serves only survivors — same contract as float64."""
    corpus = _vectors(spark, 160)
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus, cent, assign, n_cells=4, codec="pq4x16",
    )
    victims = corpus.filter(F.col("vec_id") % 3 == 0).select("vec_id")
    n = st.delete(victims, mode="merge-on-read")
    assert n == victims.count()
    snap = st.assignments._read_snapshot(st.assignments.current_version())
    assert snap["summary"]["rewritten_files"] == 0
    assert snap.get("delete_files")
    q = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = st.topk(q, k=8, nprobe=4).collect()
    assert got and all(r["vec_id"] % 3 != 0 for r in got)
    # rescored path through the live delete files, against the reduced
    # corpus: k rows, zero fallbacks, no victim
    kept = corpus.filter(F.col("vec_id") % 3 != 0)
    resc = st.topk_rescored(
        q, kept, k=5, nprobe=4, fallback_col="exact"
    ).collect()
    assert len(resc) == 10 and all(r["exact"] for r in resc)
    assert all(r["vec_id"] % 3 != 0 for r in resc)
    # reopen + maintain materializes; contents unchanged
    re = open_ann_state(spark, cent, assign)
    re.maintain()
    snap = re.assignments._read_snapshot(re.assignments.current_version())
    assert not snap.get("delete_files")
    ids = {r["vec_id"] for r in re.assignments.read().select("vec_id").collect()}
    assert ids == {
        r["vec_id"] for r in kept.select("vec_id").collect()
    }


def test_window_class_from_manifest_routes_only_when_sound(spark, tmp_path):
    """The zero-job window router: append and delete windows classify
    straight from the snapshot summary/manifest stats; merge windows
    (which may mix all change classes) defer to the row-level probe.
    A sync through manifest-routed windows must land the same receipts
    and index contents as the probe path (the lockstep test's shape)."""
    from iceberg_evaluation_spark.operators.ann_state import (
        _window_class_from_manifest,
    )
    from iceberg_evaluation_spark.tables.snapshot_table import (
        MergeClause,
        SnapshotTable,
    )

    corpus = SnapshotTable(spark, str(tmp_path / "corpus"))
    corpus.create_or_replace(_vectors(spark, 60))                    # v1
    corpus.append(_vectors(spark, 20, seed_shift=1000))              # v2
    corpus.delete_keys(
        _vectors(spark, 60).filter(F.col("vec_id") % 6 == 0)
        .select("vec_id"),
        on=["vec_id"],
    )                                                                # v3
    corpus.merge(                                                    # v4
        _vectors(spark, 20, seed_shift=1000)
        .filter(F.col("vec_id") % 2 == 0)
        .select("vec_id", F.lit(True).alias("_d")),
        on=["vec_id"],
        clause=MergeClause(
            matched_delete_condition="s._d", insert_when_not_matched=False
        ),
    )
    # manifest verdicts: append → insert-only, delete → delete-only,
    # merge → undecidable without a probe
    assert _window_class_from_manifest(corpus, 1, 2) == (False, True)
    assert _window_class_from_manifest(corpus, 2, 3) == (True, False)
    assert _window_class_from_manifest(corpus, 3, 4) is None

    # end-to-end: a sync spanning all three window classes lands the
    # exact receipts and leaves index ids == corpus ids
    cent, assign = _roots(tmp_path)
    st = build_ann_state(
        spark, corpus.read(1), cent, assign, n_cells=4,
        retrain_fraction=10.0,
    )
    r = st.sync_from_cdf(corpus, ["vec_id"], query_id="s", from_version=1)
    assert r == {"windows": 3, "folded": 20, "purged": 20}
    idx_ids = {
        row["vec_id"]
        for row in st.assignments.read().select("vec_id").collect()
    }
    src_ids = {
        row["vec_id"] for row in corpus.read().select("vec_id").collect()
    }
    assert idx_ids == src_ids
