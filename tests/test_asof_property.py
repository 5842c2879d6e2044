"""Property test: asof_join ≡ brute-force per-probe maximum over all
versions with version_ts <= probe_ts, on randomized inputs (hypothesis
drives key collisions, ties at equal timestamps, and no-match cases)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_evaluation_spark.operators.asof import asof_join

BASE = datetime(2024, 1, 1)

probe_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 40)),  # (key, minutes)
    min_size=0,
    max_size=25,
)
version_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 40), st.floats(0, 100)),
    min_size=0,
    max_size=25,
    unique_by=lambda r: (r[0], r[1]),  # versions unique per (key, ts)
)


def brute_force(probes, versions):
    out = {}
    for i, (k, pm) in enumerate(probes):
        cands = [(vm, val) for (vk, vm, val) in versions if vk == k and vm <= pm]
        out[i] = max(cands) if cands else None
    return out


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@given(probes=probe_rows, versions=version_rows)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_brute_force(spark, probes, versions):
    p_df = spark.createDataFrame(
        [(i, k, BASE + timedelta(minutes=m)) for i, (k, m) in enumerate(probes)],
        "probe_id int, k int, ts timestamp",
    )
    v_df = spark.createDataFrame(
        [(k, BASE + timedelta(minutes=m), float(v)) for (k, m, v) in versions],
        "k int, vts timestamp, val double",
    )
    got = {
        r["probe_id"]: (r["matched_ts"], r["val"])
        for r in asof_join(p_df, v_df, ["k"], "ts", "vts", ["val"]).collect()
    }
    want = brute_force(probes, versions)
    assert set(got) == set(range(len(probes)))
    for i, exp in want.items():
        if exp is None:
            assert got[i] == (None, None)
        else:
            vm, val = exp
            assert got[i] == (BASE + timedelta(minutes=vm), val)
