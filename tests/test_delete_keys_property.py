"""Property-based delete_keys check: for ANY table content (duplicate
keys allowed — band indexes hold many rows per id), ANY victim set
(present, absent, or mixed), and EITHER mode, the post-delete content
must equal the exact multiset filter, COW and MOR must agree
byte-for-byte, re-deleting must be a no-op, and compaction must
materialize MOR deletes without changing content."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

rows_st = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 99)), min_size=1, max_size=12
)
victims_st = st.lists(st.integers(0, 10), min_size=0, max_size=6)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows_st, victims_st, st.booleans())
def test_delete_keys_equals_exact_filter(
    spark, tmp_path_factory, rows, victims, partitioned
):
    mk = lambda r: spark.createDataFrame(r, "k int, v int")
    vs = set(victims)
    expect = Counter((k, v) for k, v in rows if k not in vs)
    n_expect_deleted = len(rows) - sum(expect.values())

    results = {}
    for mode in ("copy-on-write", "merge-on-read"):
        t = SnapshotTable(
            spark, str(tmp_path_factory.mktemp(f"dk_{mode[:3]}"))
        )
        if partitioned:
            from pyspark.sql import functions as F

            t.create_or_replace(
                mk(rows).withColumn("p", F.pmod("k", F.lit(2))),
                partition_by=["p"],
            )
            proj = lambda df: Counter(
                (r["k"], r["v"]) for r in df.select("k", "v").collect()
            )
        else:
            t.create_or_replace(mk(rows))
            proj = lambda df: Counter(
                (r["k"], r["v"]) for r in df.collect()
            )
        vdf = spark.createDataFrame([(x,) for x in victims] or [(None,)], "k int")
        if not victims:
            vdf = vdf.limit(0)
        n = t.delete_keys(vdf, on=["k"], mode=mode)
        assert n == n_expect_deleted
        assert proj(t.read()) == expect
        # idempotent: the same victims again match nothing
        ver = t.current_version()
        assert t.delete_keys(vdf, on=["k"], mode=mode) == 0
        assert t.current_version() == ver
        t.compact()
        assert proj(t.read()) == expect
        assert not t._read_snapshot(t.current_version())["delete_files"]
        results[mode] = proj(t.read())
    assert results["copy-on-write"] == results["merge-on-read"]
