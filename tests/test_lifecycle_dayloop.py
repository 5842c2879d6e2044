"""Lifecycle day-loop receipts (r9 verdict #8): a standing ANN index
living through days of [epoch folds + takedown deletes + maintain()]
must keep its DAILY cost receipts flat in corpus size — delete rewrites
bounded by the deleted ids' file locality, probe reads bounded by the
compacted per-cell layout, snapshot log bounded by retention. Wall
times live in tools/probe_lifecycle_dayloop.py (BENCH_NOTES table);
this pins the IO receipts the flatness claim rests on."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.ann_state import (
    build_ann_state,
    open_ann_state,
)


def _vectors(spark, lo, hi, dim=8):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda p: (
                F.when(p == F.col("id") % dim, 1.0).otherwise(0.0)
                + (F.col("id") * (p + 3) % 97) / 970.0
            ),
        ).alias("embedding"),
    )


def test_dayloop_receipts_stay_bounded(spark, tmp_path):
    st = build_ann_state(
        spark, _vectors(spark, 0, 400),
        str(tmp_path / "cent"), str(tmp_path / "assign"),
        n_cells=4, retrain_fraction=10.0,  # no retrain: isolate the loop
    )
    q = _vectors(spark, 0, 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hi = 400
    probe_files_per_day = []
    all_deleted: set[int] = set()
    for day in range(1, 4):
        # fold two epochs (delta-sized, appends fragments)
        st.append_epoch(_vectors(spark, hi, hi + 20), "loop", day * 10)
        st.append_epoch(_vectors(spark, hi + 20, hi + 40), "loop", day * 10 + 1)
        hi += 40
        # takedown a slice spanning old and new ids
        victims = (
            spark.range(0, hi)
            .filter((F.col("id") + day) % 97 == 0)
            .select(F.col("id").alias("vec_id"))
        )
        victim_ids = {r["vec_id"] for r in victims.collect()}
        all_deleted |= victim_ids
        n_victim = len(victim_ids)
        a = st.assignments
        files_before = len(a._read_snapshot(a.current_version())["files"])
        assert st.delete(victims) > 0
        summ = a._read_snapshot(a.current_version())["summary"]
        # the delete rewrote only files that held a victim — strictly
        # fewer than the table's files once fragments accumulate, and
        # never more than the victim count itself needs
        assert 0 < summ["rewritten_files"] <= files_before
        assert summ["deleted_rows"] <= n_victim
        st.maintain(keep_last_snapshots=3)
        # retention bounds the log regardless of the day's commit count
        assert len(a._snapshots()) <= 3
        probe_files_per_day.append(len(st.probe_files(q, nprobe=2)))
    # maintain()'s compaction keeps the pruned probe read flat: the
    # final day's probe touches no more files than the first day's
    # (fragmentation would make this grow by ~cells × epochs)
    assert probe_files_per_day[-1] <= probe_files_per_day[0] + 2
    # correctness through the whole lifecycle: reopen from disk, no
    # deleted id in any probe, every query still gets k rows
    re = open_ann_state(
        spark, str(tmp_path / "cent"), str(tmp_path / "assign")
    )
    got = re.topk(q, k=5, nprobe=4).collect()
    assert len(got) == 15
    assert not ({r["vec_id"] for r in got} & all_deleted)
