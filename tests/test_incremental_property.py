"""Property-based incremental-scan check: for ANY sequence of append
batches (arbitrary sizes, duplicate values, interleaved content-neutral
compactions), ``read_incremental(i, j)`` must return exactly the multiset
union of the rows appended by snapshots i+1..j — never a leaked base row,
never a lost or duplicated appended row."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

# each batch is a list of (k, v) rows; duplicates allowed WITHIN and
# ACROSS batches — incremental read is positional (files), not keyed
batch_st = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 99)), min_size=1, max_size=4
)
scenario_st = st.tuples(
    batch_st,  # initial create
    st.lists(st.tuples(batch_st, st.booleans()), min_size=1, max_size=4),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scenario_st)
def test_incremental_equals_appended_union(spark, tmp_path_factory, scenario):
    base, steps = scenario
    t = SnapshotTable(spark, str(tmp_path_factory.mktemp("incr")))
    mk = lambda rows: spark.createDataFrame(rows, "k int, v int")
    t.create_or_replace(mk(base))

    # append_versions[i] = (version, rows) for each appended batch;
    # interleave compactions (content-neutral) when the flag is set
    appended: list[tuple[int, list]] = []
    for rows, do_compact in steps:
        v = t.append(mk(rows))
        appended.append((v, rows))
        if do_compact:
            t.compact(target_files=1)

    first_v = 1  # the create snapshot
    # check every (i, j) range over the appended versions
    versions = [first_v] + [v for v, _ in appended]
    for a in range(len(versions)):
        for b in range(a, len(versions)):
            lo, hi = versions[a], versions[b]
            expect = Counter()
            for v, rows in appended:
                if lo < v <= hi:
                    expect.update(rows)
            got = Counter(
                (r["k"], r["v"]) for r in t.read_incremental(lo, hi).collect()
            )
            assert got == expect, f"range ({lo}, {hi}]"
