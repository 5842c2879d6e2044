"""Property-based SCD2 check (exceeds the reference's test strategy,
SURVEY §5): for ANY sequence of CDC batches — arbitrary keys, duplicate
timestamps across batches, late arrivals, updates in any order — applying
``scd2_complex`` batch-by-batch must land the table in exactly the state
of the declarative LEAD-window rebuild over the union of all rows
(last-applied batch wins per (pk, ts))."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_evaluation_spark.operators.scd2 import (
    SENTINEL_TS,
    bulk_insert,
    scd2_complex,
)
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

BASE = datetime(2022, 1, 1)
SENT = datetime.fromisoformat(SENTINEL_TS)

row_st = st.tuples(
    st.sampled_from(["A", "B", "C"]),  # pk
    st.integers(min_value=0, max_value=9),  # day offset → ts
    st.integers(min_value=0, max_value=99),  # value
)
# update batches must be unique on (pk, ts) — the merge-cardinality
# precondition the reference also imposes; the FULL LOAD must be unique
# per pk (bulk insert is a straight insert, one open row per key —
# reference pyspark_functions.py:21-31 makes the same assumption)
full_load_st = st.lists(row_st, min_size=1, max_size=3, unique_by=lambda r: r[0])
batch_st = st.lists(row_st, min_size=1, max_size=4, unique_by=lambda r: (r[0], r[1]))
batches_st = st.tuples(full_load_st, st.lists(batch_st, min_size=0, max_size=3)).map(
    lambda t: [t[0], *t[1]]
)


def _expected(batch_rows: list[list[tuple]]) -> set[tuple]:
    """Declarative rebuild: last batch wins per (pk, ts), then LEAD."""
    latest: dict[tuple, int] = {}
    for batch in batch_rows:
        for pk, day, val in batch:
            latest[(pk, day)] = val
    out = set()
    by_pk: dict[str, list[tuple]] = {}
    for (pk, day), val in latest.items():
        by_pk.setdefault(pk, []).append((day, val))
    for pk, versions in by_pk.items():
        versions.sort()
        for i, (day, val) in enumerate(versions):
            start = BASE + timedelta(days=day)
            end = (
                BASE + timedelta(days=versions[i + 1][0])
                if i + 1 < len(versions)
                else SENT
            )
            out.add((pk, val, start, end, end == SENT))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batches=batches_st)
def test_scd2_complex_equals_declarative_rebuild(spark, tmp_path_factory, batches):
    tmp = tmp_path_factory.mktemp("scd2prop")
    table = SnapshotTable(spark, str(tmp / "t"))

    def df(rows):
        return spark.createDataFrame(
            [
                (pk, val, BASE + timedelta(days=day), "U")
                for pk, day, val in rows
            ],
            "pk string, quantity int, extraction_timestamp timestamp, op string",
        )

    bulk_insert(table, df(batches[0]))
    for batch in batches[1:]:
        scd2_complex(table, df(batch))

    actual = {
        (
            r["pk"],
            r["quantity"],
            r["extraction_timestamp"],
            r["end_datetime"],
            r["is_current"],
        )
        for r in table.read().collect()
    }
    assert actual == _expected(batches)


# ---------------------------------------------------------------------------
# the reference's duality: for IN-ORDER delivery (every batch strictly
# newer than all applied rows — the scd2_simple precondition,
# pyspark_functions.py:40-137) the simple and complex paths must land
# the identical table, and both must equal the declarative rebuild
# ---------------------------------------------------------------------------
ordered_batches_st = st.tuples(
    st.lists(row_st, min_size=1, max_size=3, unique_by=lambda r: r[0]),
    st.lists(
        st.lists(row_st, min_size=1, max_size=3, unique_by=lambda r: r[0]),
        min_size=0,
        max_size=2,
    ),
).map(
    # shift batch i's day offsets into its own strictly-later decade
    lambda t: [
        [(pk, day + 10 * i, val) for (pk, day, val) in batch]
        for i, batch in enumerate([t[0], *t[1]])
    ]
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batches=ordered_batches_st)
def test_scd2_simple_equals_complex_for_inorder_batches(
    spark, tmp_path_factory, batches
):
    from iceberg_evaluation_spark.operators.scd2 import scd2_simple

    def run(apply_fn, tag):
        table = SnapshotTable(
            spark, str(tmp_path_factory.mktemp(f"scd2_{tag}"))
        )
        full, *rest = batches
        bulk_insert(table, _df(spark, full))
        for batch in rest:
            apply_fn(table, _df(spark, batch))
        return {
            (r["pk"], r["value"], r["start_datetime"], r["end_datetime"], r["is_current"])
            for r in table.read().collect()
        }

    def _df(s, rows):
        return s.createDataFrame(
            [
                (pk, val, BASE + timedelta(days=day), "U")
                for (pk, day, val) in rows
            ],
            "pk string, value int, extraction_timestamp timestamp, op string",
        )

    simple = run(scd2_simple, "simple")
    complex_ = run(scd2_complex, "complex")
    assert simple == complex_
    assert simple == _expected(batches)


# ---------------------------------------------------------------------------
# adversarial MERGE properties: NULL merge keys end-to-end (the
# eqNullSafe file-pruning path), and the documented semantics of
# duplicate source keys when cardinality validation is switched off
# ---------------------------------------------------------------------------
merge_key_st = st.sampled_from([None, 1, 2, 3])
target_st = st.lists(
    st.tuples(merge_key_st, st.integers(0, 99)),
    min_size=1,
    max_size=6,
    unique_by=lambda r: r[0],
)
source_st = st.lists(
    st.tuples(merge_key_st, st.integers(100, 199)),
    min_size=1,
    max_size=4,
    unique_by=lambda r: r[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(target=target_st, source=source_st)
def test_merge_null_keys_property(spark, tmp_path_factory, target, source):
    """For ANY target/source with NULL-able merge keys (target spread
    across many files), MERGE must land exactly the model state: matched
    keys (NULL matches NULL via eqNullSafe) updated, unmatched source
    keys inserted, unmatched target rows untouched — never a duplicate,
    never a stale carried row."""
    from iceberg_evaluation_spark.tables.snapshot_table import (
        MergeClause,
        SnapshotTable,
    )

    table = SnapshotTable(spark, str(tmp_path_factory.mktemp("nullmerge") / "t"))
    tdf = spark.createDataFrame(target, "k int, v int")
    # one row per file: every key (incl. NULL) exercises file pruning
    table.create_or_replace(tdf.repartition(len(target), "k"))
    sdf = spark.createDataFrame(source, "k int, v int")
    table.merge(sdf, on=["k"], clause=MergeClause(matched_update={"v": "s.v"}))

    expect = dict(target)
    expect.update(dict(source))
    got = [(r["k"], r["v"]) for r in table.read().collect()]
    assert len(got) == len(expect), f"duplicate or lost rows: {sorted(got, key=str)}"
    assert dict(got) == expect


def test_merge_duplicate_source_keys_unvalidated_semantics(spark, tmp_path_factory):
    """validate_source_unique=True raises on duplicate source keys (the
    Iceberg/Spark MERGE cardinality rule). With validation explicitly
    off, the full-outer implementation multiplies the matched target row
    (one output per matching source row) — pin that documented trade so
    it can never silently change."""
    import pytest

    from iceberg_evaluation_spark.tables.snapshot_table import (
        MergeClause,
        SnapshotTable,
    )

    table = SnapshotTable(spark, str(tmp_path_factory.mktemp("dupsrc") / "t"))
    table.create_or_replace(spark.createDataFrame([(1, 0), (2, 0)], "k int, v int"))
    dup_src = spark.createDataFrame([(1, 10), (1, 11), (3, 12)], "k int, v int")

    with pytest.raises(ValueError, match="duplicate keys"):
        table.merge(dup_src, on=["k"], clause=MergeClause(matched_update={"v": "s.v"}))

    table.merge(
        dup_src,
        on=["k"],
        clause=MergeClause(matched_update={"v": "s.v"}),
        validate_source_unique=False,
    )
    got = sorted((r["k"], r["v"]) for r in table.read().collect())
    # k=1 duplicated (once per source row), k=2 untouched, k=3 inserted
    assert got == [(1, 10), (1, 11), (2, 0), (3, 12)]


# ---------------------------------------------------------------------------
# Incremental rollup: ANY sequence of appends folded batch-by-batch must
# equal the from-scratch aggregate of the final table state.
# ---------------------------------------------------------------------------
rollup_batch_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),  # group
        st.integers(min_value=-50, max_value=50),  # value (signed!)
    ),
    min_size=1,
    max_size=5,
)
rollup_seq_st = st.lists(rollup_batch_st, min_size=1, max_size=4)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batches=rollup_seq_st)
def test_rollup_any_append_sequence_equals_full(spark, tmp_path_factory, batches):
    from pyspark.sql import functions as F

    from iceberg_evaluation_spark.tables.rollup import MaterializedRollup

    tmp = tmp_path_factory.mktemp("rollprop")
    rid = iter(range(10_000))

    def df(batch):
        return spark.createDataFrame(
            [(next(rid), g, v) for g, v in batch], "id long, g string, v long"
        )

    base = SnapshotTable(spark, str(tmp / "base"))
    base.create_or_replace(df(batches[0]))
    roll = MaterializedRollup(
        spark, str(tmp / "roll"), base, group_cols=["g"], sum_cols=["v"]
    )
    roll.rebuild()
    for batch in batches[1:]:
        base.append(df(batch))
        n = roll.refresh()
        assert n == len(batch)
    got = sorted((r["g"], r["n_rows"], r["sum_v"]) for r in roll.read().collect())
    exp = sorted(
        (r["g"], r["n"], r["s"])
        for r in base.read()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    )
    assert got == exp
