"""Custom stateful streaming operator: session windows with gap timeout.

The batch form of sessionization (plans/corpus_analytics.py::q27) is a
gaps-and-islands window; on an unbounded stream the same semantics need
per-key state — implemented here with ``applyInPandasWithState``
(Arrow-batched, GroupState with event-time timeout), the Spark primitive
for operators the built-in windowed aggregations can't express.

Semantics: events for a user belong to one session while consecutive
event times are ≤ ``gap`` apart; a session is EMITTED once the event
-time watermark passes its last event + gap (no more in-order events can
extend it). Output rows match the batch q27 aggregate: (user_id,
n_events, session_start, session_end, duration_s, total_value).

Scale notes: state per key is one open session (constant size — counts
and bounds, never the events themselves); the stream shuffles once on
the grouping key; watermark-driven timeout bounds total state by live
key cardinality, independent of stream length. The worker closure is
self-contained (no package imports) so any driver can run it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["sessionize_stream"]


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Stateful session aggregation over a streaming (or batch) DataFrame.

    ``events`` needs (key_col, ts_col, value_col). Returns the closed
    sessions stream; with ``availableNow`` triggers the final batch also
    flushes sessions whose timeout falls beyond the data's end.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} bigint, n_events bigint, session_start timestamp, "
        "session_end timestamp, duration_s bigint, total_value double"
    )
    state_schema = "start long, last long, n long, cents long"
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        # self-contained: imports inside, no module-level references
        import pandas as pd

        (user_id,) = key
        closed = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n, cents = state.get
                closed.append((user_id, n, start, last, (last - start) // 1_000_000, cents))
                state.remove()
        else:
            rows = []
            for pdf in pdfs:
                for t, v in zip(pdf["__ts_us"], pdf["__cents"]):
                    rows.append((int(t), int(v)))
            rows.sort()
            if state.exists:
                start, last, n, cents = state.get
            else:
                start = last = n = cents = None
            for t, v in rows:
                if start is None:
                    start, last, n, cents = t, t, 1, v
                elif t - last > gap_us:
                    closed.append(
                        (user_id, n, start, last, (last - start) // 1_000_000, cents)
                    )
                    start, last, n, cents = t, t, 1, v
                else:
                    last = max(last, t)
                    n += 1
                    cents += v
            if start is not None:
                state.update((start, last, n, cents))
                state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    key_col: [c[0] for c in closed],
                    "n_events": [c[1] for c in closed],
                    "session_start": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[3], unit="us") for c in closed],
                    "duration_s": [c[4] for c in closed],
                    "total_value": [c[5] / 100.0 for c in closed],
                }
            )

    from pyspark.sql import functions as F

    prepped = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(key_col),
            F.col(ts_col),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.round(F.col(value_col) * 100, 0).cast("long").alias("__cents"),
        )
    )
    return prepped.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
