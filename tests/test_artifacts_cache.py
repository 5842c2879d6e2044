"""Build-once copy-per-use artifact cache (plans/_artifacts.py, r10
verdict #5): the verify legs of the standing-state queries open fresh
COPIES of memoized pristine artifacts, so bench iterations stop
re-paying corpus-wide builds — and, critically, a run that MUTATES its
copy can never contaminate the next run (the planted-invariant oracles
depend on every invocation starting pristine)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_evaluation_spark.plans._artifacts import pristine_copy
from iceberg_evaluation_spark.plans._tmpdirs import scratch_dir
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable


def test_pristine_copy_builds_once_and_isolates_mutation(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        root = scratch_dir("pc_test_")
        SnapshotTable(spark, root).create_or_replace(
            spark.range(10).select(F.col("id"))
        )
        return [root]

    (r1,) = pristine_copy(spark, "sfX", "pc_test", build)
    (r2,) = pristine_copy(spark, "sfX", "pc_test", build)
    assert calls["n"] == 1, "builder must run once per (app, sf, tag)"
    assert r1 != r2, "every call returns a fresh copy"

    # mutate copy 1: delete half the rows and append junk
    t1 = SnapshotTable(spark, r1)
    t1.delete_keys(spark.range(5).select("id"), on=["id"])
    t1.append(spark.range(100, 103).select(F.col("id")))
    assert t1.read().count() == 8

    # copy 2 and a third fresh copy are untouched pristine state
    assert SnapshotTable(spark, r2).read().count() == 10
    (r3,) = pristine_copy(spark, "sfX", "pc_test", build)
    assert SnapshotTable(spark, r3).read().count() == 10
    assert calls["n"] == 1

    # a different tag or sf_dir is a different template
    (r4,) = pristine_copy(spark, "sfY", "pc_test", build)
    assert calls["n"] == 2
    assert SnapshotTable(spark, r4).read().count() == 10
