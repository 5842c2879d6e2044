"""As-of (point-in-time) join — the operator behind "value as of time t".

Spark has no ASOF JOIN; the naive encoding (theta join on ``l.ts >=
r.ts`` + keep-latest) plans as a nested-loop or an exploding range join.
This implements the scale-correct **union + ordered window** form:

1. tag version rows (0) and probe rows (1), union them;
2. one window per key ordered by (ts, tag): ``last_value(..., ignore
   nulls)`` carries the latest version's payload forward onto every
   probe row at or after it (versions sort before probes at equal ts →
   inclusive match);
3. keep probe rows.

Cost: ONE hash shuffle on the key + a per-key sort — the same price as
a co-partitioned join, with no |probes|×|versions| intermediate. This is
the standard event-time enrichment pattern for CDC/SCD2 consumption
("which version was current when this event happened").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    probes: DataFrame,
    versions: DataFrame,
    on: list[str],
    probe_ts: str,
    version_ts: str,
    value_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """For each probe row, attach the latest version with
    ``version_ts <= probe_ts`` per key.

    Returns all probe columns plus ``matched_ts`` and the requested
    ``value_cols`` (null when no version precedes the probe — "left"
    semantics; pass how="inner" to drop unmatched probes).

    ``versions`` must be unique per (on…, version_ts) — pre-dedup with
    ``dedup_latest`` otherwise; duplicate version timestamps would make
    the match nondeterministic in ANY as-of join definition.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left/inner, got {how!r}")
    clash = set(value_cols) & set(probes.columns)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} collide with probe columns — alias "
            "the version payload before joining"
        )

    p = probes.withColumn("__tag", F.lit(1)).withColumn("__ts", F.col(probe_ts))
    v = versions.select(
        *on,
        F.col(version_ts).alias("__vts"),
        *[F.col(c) for c in value_cols],
    ).withColumn("__tag", F.lit(0)).withColumn("__ts", F.col("__vts"))

    # align schemas for the union
    for c in probes.columns:
        if c not in v.columns:
            v = v.withColumn(c, F.lit(None).cast(probes.schema[c].dataType))
    for c in value_cols + ["__vts"]:
        if c not in p.columns:
            p = p.withColumn(c, F.lit(None).cast(v.schema[c].dataType))

    unioned = p.select(*v.columns).unionByName(v)
    w = (
        W.partitionBy(*on)
        .orderBy("__ts", "__tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Carry ONE struct keyed on the always-non-null __vts rather than
    # last(ignorenulls) per value column: a per-column carry cannot tell
    # "no version row yet" from "latest version's value IS NULL" and would
    # silently substitute an older non-null value, making value_cols
    # disagree with matched_ts. The struct is non-null exactly on version
    # rows, so NULL payload fields propagate from the correct version.
    payload = F.when(
        F.col("__tag") == 0,
        F.struct(
            F.col("__vts").alias("__vts"),
            *[F.col(c).alias(c) for c in value_cols],
        ),
    )
    carried = unioned.select(
        *unioned.columns,
        F.last(payload, ignorenulls=True).over(w).alias("__m"),
    )
    out = (
        carried.filter(F.col("__tag") == 1)
        .select(
            *probes.columns,
            F.col("__m.__vts").alias("matched_ts"),
            *[F.col(f"__m.{c}").alias(c) for c in value_cols],
        )
    )
    if how == "inner":
        out = out.filter(F.col("matched_ts").isNotNull())
    return out
