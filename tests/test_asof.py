"""asof_join semantics: inclusive equal-ts match, null for no-prior,
inner filtering, collision guard."""

from __future__ import annotations

from datetime import datetime

import pytest

from iceberg_evaluation_spark.operators.asof import asof_join

TS = lambda s: datetime.fromisoformat(s)  # noqa: E731


@pytest.fixture()
def frames(spark):
    probes = spark.createDataFrame(
        [
            (1, 100, TS("2024-01-01 10:00:00")),  # after v1, before v2
            (2, 100, TS("2024-01-01 12:00:00")),  # exactly at v2 → inclusive
            (3, 200, TS("2024-01-01 08:00:00")),  # before any version → null
            (4, 300, TS("2024-01-01 09:00:00")),  # key with no versions at all
        ],
        "event_id int, user_id int, ts timestamp",
    )
    versions = spark.createDataFrame(
        [
            (100, TS("2024-01-01 09:00:00"), 1.0),
            (100, TS("2024-01-01 12:00:00"), 2.0),
            (200, TS("2024-01-01 09:00:00"), 3.0),
        ],
        "user_id int, vts timestamp, val double",
    )
    return probes, versions


def test_left_semantics(spark, frames):
    probes, versions = frames
    got = {
        r["event_id"]: (r["matched_ts"], r["val"])
        for r in asof_join(
            probes, versions, ["user_id"], "ts", "vts", ["val"]
        ).collect()
    }
    assert got == {
        1: (TS("2024-01-01 09:00:00"), 1.0),
        2: (TS("2024-01-01 12:00:00"), 2.0),  # equal ts matches (inclusive)
        3: (None, None),
        4: (None, None),
    }


def test_inner_drops_unmatched(spark, frames):
    probes, versions = frames
    ids = sorted(
        r["event_id"]
        for r in asof_join(
            probes, versions, ["user_id"], "ts", "vts", ["val"], how="inner"
        ).collect()
    )
    assert ids == [1, 2]


def test_value_column_collision_raises(spark, frames):
    probes, versions = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(probes, versions.withColumnRenamed("val", "ts"),
                  ["user_id"], "ts", "vts", ["ts"])


def test_null_payload_from_latest_version_propagates(spark):
    """The latest matching version's NULL payload must come through as NULL,
    not be papered over by an older version's non-null value (regression:
    per-column last(ignorenulls) carry)."""
    probes = spark.createDataFrame(
        [(1, 100, TS("2024-01-01 11:00:00"))],
        "event_id int, user_id int, ts timestamp",
    )
    versions = spark.createDataFrame(
        [
            (100, TS("2024-01-01 09:00:00"), 1.0),
            (100, TS("2024-01-01 10:00:00"), None),  # latest before probe
        ],
        "user_id int, vts timestamp, val double",
    )
    [row] = asof_join(probes, versions, ["user_id"], "ts", "vts", ["val"]).collect()
    assert row["matched_ts"] == TS("2024-01-01 10:00:00")
    assert row["val"] is None  # NULL payload of the matched version, not 1.0
