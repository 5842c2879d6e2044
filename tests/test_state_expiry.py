"""Snapshot expiry vs standing state (r8 verdict #6): expire_snapshots
can erase the STAMPED manifests every geometry witness scans for
(maintenance commits don't re-stamp). All three durable state families
— BucketedLookup, DedupState, AnnState — must then degrade exactly as
documented: open trusts the meta file (latest_summary_value returns
None → the guard skips), every probe stays CORRECT (expiry never
changes live content), and a surviving stamp keeps being cross-checked.
Never a wrong probe, never a spurious refusal after routine
maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.ann_state import (
    build_ann_state,
    open_ann_state,
)
from iceberg_evaluation_spark.operators.incremental_dedup import (
    build_dedup_state,
    incremental_neardup_dedup,
    open_dedup_state,
)
from iceberg_evaluation_spark.tables.bucketed_lookup import (
    BucketedLookup,
    latest_summary_value,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "pack my box with five dozen liquor jugs for the annual county fair"),
    (3, "sphinx of black quartz judge my vow said the museum curator today"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_lookup_opens_and_prunes_after_full_stamp_expiry(spark, tmp_path):
    """Full expiry of stamped history (only an unstamped compaction
    snapshot survives): open must fall back to LOOKUP_META — documented
    at latest_summary_value — and the fetch stays pruned AND correct."""
    root = str(tmp_path / "lk")
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id")).alias("text"),
    )
    lk = BucketedLookup.create(spark, docs, root, "doc_id", "text", n_buckets=8)
    lk.append(
        spark.range(300, 320).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("body "), F.col("id")).alias("text"),
        )
    )
    lk.table.compact(target_file_mb=64)  # newest snapshot: UNSTAMPED
    assert lk.table.expire_snapshots(keep_last=1) >= 0
    assert latest_summary_value(lk.table, "lookup_geometry") is None

    re = BucketedLookup.open(spark, root)  # meta is the source of truth
    assert re.n_buckets == 8
    ids = spark.createDataFrame([(5,), (311,)], "doc_id bigint")
    got = {r["doc_id"]: r["text"] for r in re.fetch(ids).collect()}
    assert got[5] == "body 5" and got[311] == "body 311"
    # pruning still applies: a one-id fetch reads a strict file subset
    one = spark.createDataFrame([(5,)], "doc_id bigint")
    all_files = re.table._read_snapshot(re.table.current_version())["files"]
    assert 0 < len(re.fetch_files(one)) < len(all_files)


def test_lookup_checks_surviving_stamp_after_partial_expiry(spark, tmp_path):
    """Partial expiry (a stamped snapshot survives): the geometry guard
    must still fire against the newest SURVIVING stamp — a stale meta
    refuses, a matching one opens."""
    import os
    import shutil

    import pytest

    root = str(tmp_path / "lk2")
    docs = _docs(spark)
    lk = BucketedLookup.create(spark, docs, root, "doc_id", "text", n_buckets=4)
    meta_bak = str(tmp_path / "meta_bak")
    shutil.copy(os.path.join(root, "LOOKUP_META"), meta_bak)
    lk.rebucket(16)                       # stamped: bucket:16 geometry
    lk.table.expire_snapshots(keep_last=1)  # the 16-bucket stamp SURVIVES
    shutil.copy(meta_bak, os.path.join(root, "LOOKUP_META"))  # stale meta: 4
    with pytest.raises(ValueError, match="geometry mismatch"):
        BucketedLookup.open(spark, root)


def test_dedup_state_classifies_after_full_stamp_expiry(spark, tmp_path):
    """Dedup state after band-index compaction + expiry: open falls
    back to DEDUP_META and a delta still classifies exactly (planted
    exact-dup / near-dup / new)."""
    st = build_dedup_state(
        spark, _docs(spark), "doc_id", "text",
        str(tmp_path / "fp"), str(tmp_path / "bands"),
    )
    st.bands.compact(target_file_mb=64)      # unstamped maintenance
    st.fingerprints.compact(target_file_mb=64)
    st.bands.expire_snapshots(keep_last=1)
    st.fingerprints.expire_snapshots(keep_last=1)
    assert latest_summary_value(st.bands, "dedup_geometry") is None

    re = open_dedup_state(
        spark, str(tmp_path / "fp"), str(tmp_path / "bands")
    )
    assert (re.max_bucket, re.shingle_n) == (200, 3)
    delta = _docs(spark, [
        (101, DOCS[0][1]),                    # exact
        (102, DOCS[1][1].replace(" ", "  ")), # near (J=1 after ws-norm)
        (103, "completely unrelated text about spark physical plans"),
    ])
    got = {r["id"]: r["status"] for r in incremental_neardup_dedup(
        re, delta, _docs(spark), "doc_id", "text"
    ).collect()}
    assert got == {101: "exact_dup", 102: "near_dup", 103: "new"}


def test_ann_state_probes_after_full_stamp_expiry(spark, tmp_path):
    """ANN state after compaction + expiry: geometry stamp and sync
    tokens are gone (None → guards skip, meta is truth), probes stay
    correct, and the log-derived counters degrade CONSERVATIVELY —
    n_at_train 0 means stale() reports True, scheduling the retrain
    that restores exact bookkeeping. Never a wrong probe."""
    def vecs(n, shift=0):
        return spark.range(n).select(
            (F.col("id") + shift).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda p: (
                    F.when((p % 4) == (F.col("id") + shift) % 4, 1.0)
                    .otherwise(0.0)
                    + ((F.col("id") + shift) * (p + 1) % 97) / 970.0
                ).cast("float"),
            ).alias("embedding"),
        )

    cent, assign = str(tmp_path / "cent"), str(tmp_path / "assign")
    st = build_ann_state(spark, vecs(100), cent, assign, n_cells=4)
    st.append(vecs(20, shift=1000))
    st.assignments.compact(target_file_mb=64)  # unstamped maintenance
    st.assignments.expire_snapshots(keep_last=1)
    assert latest_summary_value(st.assignments, "ann_geometry") is None
    assert latest_summary_value(st.assignments, "ann_sync_token") is None

    re = open_ann_state(spark, cent, assign)   # no refusal: meta is truth
    assert (re.n_cells, re.dim) == (4, 8)
    assert re.stale()  # conservative: erased baseline → schedule retrain
    q = vecs(20, shift=1000).filter(F.col("vec_id") == 1001).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert re.topk(q, k=1, nprobe=4).collect()[0]["vec_id"] == 1001
    # retrain restores exact bookkeeping and re-stamps everything
    assert re.retrain() == 120
    re2 = open_ann_state(spark, cent, assign)
    assert (re2.n_at_train, re2.n_appended) == (120, 0) and not re2.stale()
    assert re2.topk(q, k=1, nprobe=4).collect()[0]["vec_id"] == 1001


def test_rollup_refresh_refuses_after_base_expiry(spark, tmp_path):
    """A rollup that lagged beyond the base's snapshot retention has no
    diff basis: refresh()/refresh_cdf() must refuse with the rebuild
    guidance (the sync_replica pattern), never a raw FileNotFoundError
    or a silently-wrong fold — and rebuild() recovers exactly."""
    import pytest

    from iceberg_evaluation_spark.tables.rollup import MaterializedRollup
    from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

    base = SnapshotTable(spark, str(tmp_path / "base"))
    base.create_or_replace(
        spark.createDataFrame(
            [(i, "g%d" % (i % 3), i * 10) for i in range(30)],
            "id long, g string, v long",
        )
    )
    roll = MaterializedRollup(
        spark, str(tmp_path / "roll"), base, group_cols=["g"], sum_cols=["v"]
    )
    roll.rebuild()
    for j in range(4):  # base keeps moving while the rollup sleeps
        base.append(
            spark.createDataFrame(
                [(100 + 10 * j + i, "g0", 7) for i in range(5)],
                "id long, g string, v long",
            )
        )
    base.expire_snapshots(keep_last=2)  # checkpoint's manifest is gone
    with pytest.raises(ValueError, match="expired past the rollup"):
        roll.refresh()
    with pytest.raises(ValueError, match="expired past the rollup"):
        roll.refresh_cdf(["id"])
    roll.rebuild()  # the documented recovery
    got = {(r["g"], r["n_rows"], r["sum_v"]) for r in roll.read().collect()}
    exp = {
        (r["g"], r["n"], r["s"])
        for r in base.read()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == exp


def test_rollup_refresh_within_retention_still_works(spark, tmp_path):
    """Expiry that RETAINS the checkpoint's manifest must not disturb
    the incremental fold — the refusal is for genuine lag only."""
    from iceberg_evaluation_spark.tables.rollup import MaterializedRollup
    from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

    base = SnapshotTable(spark, str(tmp_path / "base2"))
    base.create_or_replace(
        spark.createDataFrame(
            [(i, "g%d" % (i % 2), i) for i in range(20)],
            "id long, g string, v long",
        )
    )
    roll = MaterializedRollup(
        spark, str(tmp_path / "roll2"), base, group_cols=["g"], sum_cols=["v"]
    )
    roll.rebuild()
    base.append(
        spark.createDataFrame([(100, "g0", 5)], "id long, g string, v long")
    )
    base.expire_snapshots(keep_last=2)  # keeps v1 (checkpoint) + v2
    assert roll.refresh() == 1
    assert sum(r["n_rows"] for r in roll.read().collect()) == 21
