"""Execution-infrastructure corpus: REAL Structured Streaming runs,
skew-salted joins, and bucketed (exchange-free) joins — surfaces that
were previously exercised only by tests, registered here as driver-
verifiable queries with exact SQL oracles.

The streaming queries (q75/q76) start genuine ``readStream`` →
``writeStream`` jobs (memory sink, ``availableNow`` trigger, multiple
micro-batches via ``maxFilesPerTrigger``) and return the sink table, so
the driver's oracle check validates end-to-end streaming semantics —
cross-batch dedup state and watermarked window aggregation — not a
batch re-phrasing. The skew/bucketed queries (q77/q78) must produce
results IDENTICAL to the plain join the oracle runs; the value under
test is the physical strategy (salt spread, no Exchange), pinned
separately by tests/test_skew.py and tests/test_bucketed.py.

Reference parity: the reference evaluates engines on batch CDC merges
(src/data_derivation — daily file drops); streaming replay of the same
drops is the natural Spark extension per SURVEY.md §2.10.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from ..sources import load_table
from ..sources.bucketed import read_bucketed, write_bucketed
from ..tables.snapshot_table import MergeClause, SnapshotTable
from ._exact import exact_sum, sql_sum
from ._tmpdirs import scratch_dir, session_cache_key
from .registry import register

_EV_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


# q84's bare (operator-only) variant reuses the last replay dir built for
# the same (session, sf_dir) so BENCH_DETAIL's verify_split separates the
# streaming JOIN's cost from the replay-harness write — the registered
# query always rebuilds so its end-to-end time stays comparable.
_REPLAY_MEMO: dict[tuple[int, str], str] = {}


def _replay_dir(
    df: DataFrame, prefix: str, n_files: int = 4, memo_key: str | None = None
) -> str:
    """Materialize a DataFrame as an n-file parquet 'stream source' dir.

    ``n_files`` PINS the micro-batch count: with maxFilesPerTrigger=k the
    replay runs exactly ceil(n_files/k) data batches regardless of the
    ambient parquet layout of the source table — replay cost must not
    track file-count drift in the testdata.
    """
    out = scratch_dir(prefix=prefix)
    df.repartition(n_files, "event_id").write.mode("overwrite").parquet(out)
    if memo_key is not None:
        _REPLAY_MEMO[session_cache_key(df.sparkSession, memo_key)] = out
    return out


def _stream_state_partitions(spark: SparkSession) -> str:
    """Shuffle-partition count to PIN for stateful streaming runs.

    A stream-stream join commits 4 state stores per state partition per
    micro-batch; with tiny per-batch data the commit overhead dominates
    (measured at sf0.1: 32 partitions → 10-13 s, 8 → ~3.2 s, and the
    run-to-run swing collapses). State-partition count is a real scale
    tunable — size it to state volume, not to the session's batch
    shuffle width. Override: spark.ies.streaming.statePartitions.
    """
    return spark.conf.get("spark.ies.streaming.statePartitions", "8")


class _pinned_shuffle_partitions:
    """Temporarily pin spark.sql.shuffle.partitions for a stream run.

    The state-partition count is frozen into the checkpoint at query
    start from this conf, so the pin must cover .start(); it is restored
    after the stream drains. (Session-global: under the opt-in threaded
    bench a concurrently-planned batch query could briefly see the
    pinned width — harmless for correctness, only plan width.)
    """

    def __init__(self, spark: SparkSession, n: str):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


def _run_stream(result: DataFrame, sink: str, output_mode: str) -> None:
    """Drain a streaming DataFrame into a memory sink, to completion."""
    spark = result.sparkSession
    with _pinned_shuffle_partitions(spark, _stream_state_partitions(spark)):
        q = (
            result.writeStream.format("memory")
            .queryName(sink)
            .outputMode(output_mode)
            .option(
                "checkpointLocation", scratch_dir(prefix=f"{sink}_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)


# ---------------------------------------------------------------------------
# q75: STREAMING exactly-once dedup — replay the events table with planted
#      exact-duplicate deliveries (every 10th event re-delivered), run a
#      real watermarked dropDuplicates stream over a multi-file source in
#      multiple micro-batches, and return the sink. Duplicate pairs are
#      co-partitioned by event_id into the same source file, so each pair
#      meets inside one micro-batch and the surviving row is well-defined
#      (the copies are bit-identical). Oracle: the dedup must restore the
#      original events table exactly — including raw µs timestamps,
#      which agree bit-for-bit across engines because load_table
#      normalizes every source layout (ns-longs or timestamp[us]) to
#      the same session-UTC µs timestamps DuckDB reads natively.
#      Scale: dropDuplicates state is bounded by the watermark horizon ×
#      key arrival rate; the planted re-deliveries model at-least-once
#      ingestion (Kafka/file redelivery) at any volume.
# ---------------------------------------------------------------------------
@register(
    "q75_streaming_dedup",
    covers="streaming dedup-exact S1",
    oracle="SELECT event_id, ts, user_id, event_type, value FROM events",
)
def q75_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.incremental import dedup_stream

    ev = load_table(spark, sf_dir, "events").select(*_EV_COLS)
    redelivered = ev.unionByName(ev.filter(F.col("event_id") % 10 == 0))
    src = _replay_dir(redelivered, "q75_replay_")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)  # force >1 micro-batch
        .parquet(src)
    )
    deduped = dedup_stream(stream, keys=["event_id"], ts_col="ts")
    sink = f"q75_sink_{uuid.uuid4().hex[:8]}"
    _run_stream(deduped, sink, "append")
    return spark.table(sink).select(*_EV_COLS)


# ---------------------------------------------------------------------------
# q76: STREAMING watermarked tumbling-window aggregation — the q25 shape
#      executed as a genuine stream (watermark + event-time window +
#      exact cents-sum, which is streaming-safe: sum of BIGINTs).
#      Complete output mode makes every window visible at drain time so
#      the oracle can check the full set; production pipelines use
#      append mode + the watermark to emit-and-evict finalized windows
#      (that path is pinned by tests/test_streaming_multimodal.py).
# ---------------------------------------------------------------------------
@register(
    "q76_streaming_window_totals",
    covers="streaming A1 streaming-shape",
    oracle=f"""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       event_type,
       count(*) AS n,
       {sql_sum('value')} AS total_value
FROM events
GROUP BY 1, 2
""",
)
def q76_streaming_window_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(*_EV_COLS)
    src = _replay_dir(ev, "q76_replay_")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )
    sink = f"q76_sink_{uuid.uuid4().hex[:8]}"
    _run_stream(agg, sink, "complete")
    return spark.table(sink)


# ---------------------------------------------------------------------------
# q77: skew-salted fact⋈dim join — lineitem joined to supplier through
#      operators.skew.salted_join (deterministic per-row salt on the fact
#      side, dim replicated per salt), aggregated to national revenue.
#      The salt MUST be semantics-neutral: the oracle runs the plain
#      join, so any row lost/duplicated by the salting shows up as a
#      hash mismatch. tests/test_skew.py pins the physical claims.
# ---------------------------------------------------------------------------
@register(
    "q77_salted_skew_join",
    covers="skew J1 A1",
    oracle=f"""
SELECT s_nationkey,
       count(*) AS n_items,
       {sql_sum('l_extendedprice * (1 - l_discount)', 10000)} AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
""",
)
def q77_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, sup, on=["l_suppkey"], salt_buckets=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q78: bucketed co-located join — orders and lineitem materialized as
#      16-bucket tables on the order key (the write pays the shuffle
#      ONCE), then joined bucket-to-bucket and aggregated by order
#      priority. tests/test_bucketed.py pins that the bucketed join plan
#      contains ZERO Exchange; this query pins that the exchange-free
#      plan computes exactly what the oracle's plain join computes.
# ---------------------------------------------------------------------------
@register(
    "q78_bucketed_colocated_join",
    covers="bucketing J1 A1 S2 S6",
    oracle=f"""
SELECT o_orderpriority,
       count(*) AS n_items,
       {sql_sum('l_extendedprice * (1 - l_discount)', 10000)} AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
)
def q78_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = scratch_dir(prefix="q78_bucketed_")
    tag = uuid.uuid4().hex[:8]
    ord_tbl, li_tbl = f"q78_orders_{tag}", f"q78_lineitem_{tag}"
    write_bucketed(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ),
        ord_tbl,
        os.path.join(base, "orders"),
        bucket_cols=["o_orderkey"],
        n_buckets=16,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        li_tbl,
        os.path.join(base, "lineitem"),
        bucket_cols=["l_orderkey"],
        n_buckets=16,
        sort_cols=["l_orderkey"],
    )
    o = read_bucketed(spark, ord_tbl)
    li = read_bucketed(spark, li_tbl)
    joined = o.join(li, o.o_orderkey == li.l_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q79: STREAMING corpus ingest with dedup-on-ingest — the shape of a
#      training-data pipeline's front door: documents arrive as a stream
#      (with at-least-once redeliveries, planted here as doc_id+1e6
#      copies of every 5th doc), and each micro-batch MERGEs its
#      fingerprint summary into a snapshot table (min-id survivor,
#      count accumulated). Composes §2.10 streaming + the M-family
#      MERGE + exact dedup in one driver-verified query.
#      The merge is COMMUTATIVE (least/sum), so the result is
#      independent of how the file source batches arrivals — that is
#      what makes an exact oracle possible for a streaming ingest.
#      Scale: per batch the merge rewrites only files containing
#      matched fingerprints (COW pruning); state lives in the table,
#      not the stream, so executor memory stays flat at any volume.
# ---------------------------------------------------------------------------
@register(
    "q79_streaming_ingest_dedup",
    covers="streaming dedup-exact M5-shape S5 S7 A1",
    oracle="""
WITH c AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
)
SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_seen
FROM c GROUP BY md5(text)
""",
)
def q79_streaming_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    redelivered = docs.unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    src = scratch_dir(prefix="q79_replay_")
    # copies land in DIFFERENT files than their originals (partition by
    # doc_id), so redeliveries typically arrive in a later micro-batch
    # and the cross-batch merge path is genuinely exercised
    redelivered.repartition(4, "doc_id").write.mode("overwrite").parquet(src)

    table = SnapshotTable(spark, scratch_dir(prefix="q79_tbl_"))

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        summary = (
            batch_df.select(F.md5("text").alias("fp"), "doc_id")
            .groupBy("fp")
            .agg(
                F.min("doc_id").alias("keep_id"),
                F.count(F.lit(1)).alias("n_seen"),
            )
        )
        if not table.exists():
            table.create_or_replace(summary)
        else:
            table.merge(
                summary,
                on=["fp"],
                clause=MergeClause(
                    matched_update={
                        "keep_id": "least(t.keep_id, s.keep_id)",
                        "n_seen": "t.n_seen + s.n_seen",
                    },
                ),
            )

    stream = (
        spark.readStream.schema(redelivered.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .outputMode("update")
        .option("checkpointLocation", scratch_dir(prefix="q79_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return table.read().select("fp", "keep_id", "n_seen")


# ---------------------------------------------------------------------------
# q84: STREAMING stream-stream interval join — view→purchase attribution.
#      Two independent readStream sources over the same replayed events
#      (views and purchases), watermarked on both sides, inner-joined on
#      user_id with a 30-minute event-time range — the canonical
#      Structured Streaming stream-stream join (state on both sides,
#      append-mode emission). The oracle is the batch interval join:
#      the streamed result must be IDENTICAL pair-for-pair.
#      Watermark note: the replay files interleave event time (they are
#      partitioned by event_id, not ts), so the delay is set beyond the
#      corpus time span to guarantee no row is dropped as late — the
#      exactness contract under replay. Production sets the delay to the
#      real lateness horizon and state stays bounded by
#      (delay + interval) × per-key arrival rate.
# ---------------------------------------------------------------------------
def _q84(spark: SparkSession, sf_dir: str, fresh_replay: bool = True) -> DataFrame:
    # replay only the two event types the join consumes — the operator
    # under test is the stream-stream join, not a stream-side filter
    ev = load_table(spark, sf_dir, "events").select(*_EV_COLS).filter(
        F.col("event_type").isin("view", "purchase")
    )
    memo = _REPLAY_MEMO.get(session_cache_key(spark, f"q84:{sf_dir}"))
    if fresh_replay or memo is None or not os.path.isdir(memo):
        src = _replay_dir(ev, "q84_replay_", memo_key=f"q84:{sf_dir}")
    else:
        src = memo

    def _src() -> DataFrame:
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )

    views = (
        _src()
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "60 days")
    )
    purchases = (
        _src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "60 days")
    )
    joined = views.join(
        purchases,
        F.expr(
            "user_id = p_user AND purchase_ts >= view_ts "
            "AND purchase_ts <= view_ts + interval 30 minutes"
        ),
    ).select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")

    sink = f"q84_sink_{uuid.uuid4().hex[:8]}"
    _run_stream(joined, sink, "append")
    return spark.table(sink)


def _q84_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-only: the streaming join over an already-built replay dir
    (the registered run's, memoized) — verify_split's run_s is the join,
    verify_s the replay-harness write."""
    return _q84(spark, sf_dir, fresh_replay=False)


register(
    "q84_stream_stream_join",
    covers="streaming J1 J7 J10 streaming-shape",
    oracle="""
SELECT a.user_id,
       a.event_id AS view_id,
       b.event_id AS purchase_id,
       a.ts AS view_ts,
       b.ts AS purchase_ts
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'view' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
""",
    bare=_q84_bare,
)(_q84)


# ---------------------------------------------------------------------------
# q106: STREAMING ingest classification against PERSISTED dedup artifacts
#       — the deployment shape of q104: the corpus's fingerprint + band
#       artifacts stand still while a delta REPLAYS AS A REAL STREAM
#       (multi-file parquet source, maxFilesPerTrigger, availableNow);
#       each micro-batch runs the incremental classifier in foreachBatch
#       and appends its (id, status) verdicts to a snapshot-table sink.
#       State writes are DISABLED during the stream (append_new=False):
#       classification against a static artifact is batch-order-
#       independent, so the per-row oracle is exact at ANY scale factor
#       even when the delta contains duplicate texts (the fold-back
#       path, which IS order-sensitive across batches, is q104's
#       separately-verified job). Composition under test: Structured
#       Streaming × table layer × bloom prefilter × LSH band index.
# ---------------------------------------------------------------------------
# operator-only variant (bench run_s): the streaming classification over
# a memoized state + replay dir — the continuously-running ingest shape;
# the registered query's artifact build + replay-dir write is verify_s.
_Q106_CACHE: dict = {}


def _q106_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.incremental import IdempotentEpochSink
    from ..operators.incremental_dedup import (
        build_dedup_state,
        incremental_neardup_dedup,
    )
    from .corpus_text import _q104_delta

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    key = session_cache_key(spark, sf_dir)
    hit = _Q106_CACHE.get(key)
    if hit is None:
        state = build_dedup_state(
            spark, docs, "doc_id", "text",
            scratch_dir("q106b_fp_"), scratch_dir("q106b_bands_"),
        )
        src = scratch_dir(prefix="q106b_replay_")
        _q104_delta(docs).repartition(4, "doc_id").write.mode(
            "overwrite"
        ).parquet(src)
        hit = (state, src)
        _Q106_CACHE[key] = hit
    state, src = hit

    sink = SnapshotTable(spark, scratch_dir(prefix="q106b_sink_"))
    esink = IdempotentEpochSink(sink, query_id="q106b")

    def classify(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = incremental_neardup_dedup(
            state, batch_df, docs, "doc_id", "text", append_new=False
        )
        esink.write(out, epoch_id)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(classify)
        .outputMode("update")
        .option("checkpointLocation", scratch_dir(prefix="q106b_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sink.read().select(F.col("id").alias("doc_id"), "status")


@register(
    "q106_streaming_artifact_dedup",
    covers="streaming dedup-incremental dedup-bloom table-layer S5 S7 J5 J6",
    bare=_q106_bare,
    oracle="""
WITH delta AS (
  SELECT doc_id + 2000000 AS doc_id, text
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, md5(text) AS text
  FROM documents WHERE doc_id % 10 = 1
  UNION ALL
  SELECT doc_id + 4000000 AS doc_id, replace(text, ' ', '  ') AS text
  FROM documents WHERE doc_id % 10 = 2
)
SELECT d.doc_id,
       CASE WHEN EXISTS (SELECT 1 FROM documents c WHERE c.text = d.text)
              THEN 'exact_dup'
            WHEN EXISTS (SELECT 1 FROM documents c WHERE
                   trim(regexp_replace(lower(c.text), '\\s+', ' ', 'g')) =
                   trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')))
              THEN 'near_dup'
            ELSE 'new' END AS status
FROM delta d
""",
)
def q106_streaming_artifact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.incremental import IdempotentEpochSink
    from ..operators.incremental_dedup import (
        build_dedup_state,
        incremental_neardup_dedup,
    )
    from .corpus_text import _q104_delta

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # the state is READ-ONLY in this query (append_new=False below) and
    # the replay source is immutable once written, so the registered leg
    # shares the bare leg's session memo outright — no copy needed, and
    # the corpus-wide build stops being re-paid per bench iteration
    # (r10 verdict #5). 4 files pins the micro-batch count (2 per
    # trigger → 2 data batches).
    key = session_cache_key(spark, sf_dir)
    hit = _Q106_CACHE.get(key)
    if hit is None:
        state = build_dedup_state(
            spark, docs, "doc_id", "text",
            scratch_dir("q106_fp_"), scratch_dir("q106_bands_"),
        )
        src = scratch_dir(prefix="q106_replay_")
        _q104_delta(docs).repartition(4, "doc_id").write.mode(
            "overwrite"
        ).parquet(src)
        hit = (state, src)
        _Q106_CACHE[key] = hit
    state, src = hit

    delta = _q104_delta(docs)

    sink = SnapshotTable(spark, scratch_dir(prefix="q106_sink_"))
    # exactly-once sink (r7): replayed micro-batches are skipped
    esink = IdempotentEpochSink(sink, query_id="q106")

    def classify(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = incremental_neardup_dedup(
            state, batch_df, docs, "doc_id", "text", append_new=False
        )
        esink.write(out, epoch_id)

    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(classify)
        .outputMode("update")
        .option("checkpointLocation", scratch_dir(prefix="q106_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sink.read().select(F.col("id").alias("doc_id"), "status")


# ---------------------------------------------------------------------------
# q109: STREAMING stateful sessionization (applyInPandasWithState) —
#       the custom-stateful-operator surface (streaming/sessionize.py,
#       previously pinned only by tests) under the driver's oracle gate.
#       The events table replays as TWO time-ranged micro-batches
#       (earlier half first — the second file is written after the
#       first, so the file source's mtime ordering pins batch order),
#       with per-user session state carried ACROSS the batch boundary.
#       Determinism contract: timestamps are second-truncated up front
#       (q27's ns-round-vs-truncate hazard rule), the watermark delay
#       exceeds the corpus span (no late drops, no timeouts — replay
#       exactness, same as q84), so the emitted set is exactly the
#       GAP-CLOSED sessions: every session of a user except their final
#       one, which stays open in state. The oracle derives that set from
#       the q27 gaps-and-islands rebuild minus each user's last island.
# ---------------------------------------------------------------------------
@register(
    "q109_streaming_sessionize",
    covers="streaming W3 W5 A1 streaming-shape mapInPandas",
    oracle=f"""
WITH ev AS (
  SELECT user_id, date_trunc('second', ts) AS ts, value FROM events
), flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_idx
  FROM flagged
), sess AS (
  SELECT user_id, session_idx,
         CAST(count(*) AS BIGINT) AS n_events,
         min(ts) AS session_start,
         max(ts) AS session_end,
         CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s,
         {sql_sum('value')} AS total_value
  FROM numbered GROUP BY user_id, session_idx
)
SELECT user_id, n_events, session_start, session_end, duration_s, total_value
FROM sess
WHERE session_idx < (SELECT max(s2.session_idx) FROM sess s2
                     WHERE s2.user_id = sess.user_id)
""",
)
def q109_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.sessionize import sessionize_stream

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("second", "ts").alias("ts"), "value"
    )
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    cutoff = (int(lo) + int(hi)) // 2
    src = scratch_dir(prefix="q109_replay_")
    # two sequential single-file writes: mtime order pins micro-batch
    # order, so the later half arrives in batch 2 and sessions spanning
    # the cutoff exercise genuine cross-batch state continuation
    ev.filter(F.unix_micros("ts") <= cutoff).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    ev.filter(F.unix_micros("ts") > cutoff).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = sessionize_stream(
        stream, gap_seconds=1800, watermark="60 days"
    )
    sink = f"q109_sink_{uuid.uuid4().hex[:8]}"
    _run_stream(sessions, sink, "append")
    return spark.table(sink).select(
        "user_id", "n_events", "session_start", "session_end",
        "duration_s", "total_value",
    )


# ---------------------------------------------------------------------------
# q115: GATED streaming ingest — quality-classify AND dedup each delta in
#       ONE pass against standing artifacts (r5 verdict #5: q112's
#       broadcast classifier folded into q106's foreachBatch ingest
#       loop). Two deltas replay as two micro-batches (q109's mtime
#       pinning); the session validates the B-row model ONCE (pinned by
#       the model_validations column), gates each batch (rejected rows
#       never reach the dedup joins), dedups survivors against the
#       persisted fingerprint/band artifacts, and folds accepted-new
#       rows into BOTH the artifacts and the standing corpus table —
#       delta 2's md5-copies of delta 1's accepted rows land exact_dup,
#       its copies of REJECTED rows stay rejected (never folded), and
#       the final table sizes pin the accumulation arithmetic.
#       Classes (gate keep iff round(prob,4) >= 0.49, q112's model):
#         d1 %10=0 raw copy        → exact_dup | rejected
#         d1 %10=1 md5(text)       → new       | rejected
#         d1 %10=2 doubled spaces  → near_dup  | rejected (exact if no ws)
#         d2 %10=1 same md5(text)  → exact_dup if d1 twin accepted,
#                                    rejected if d1 twin rejected
#         d2 %10=3 md5(text||'x')  → new       | rejected
#       Dup-vs-new truth is raw/normalized text equality against the
#       standing universe at each batch start (q104's exactness
#       argument), so the whole two-batch replay is SQL-derivable.
# ---------------------------------------------------------------------------
_Q115_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_Q115_TOKS = f"regexp_split_to_array({_Q115_NORM}, ' ')"
_Q115_KEEP = 0.49


def _q115_delta1(docs: DataFrame) -> DataFrame:
    return (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 1).select(
                (F.col("doc_id") + 3_000_000).alias("doc_id"),
                F.md5("text").alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 2).select(
                (F.col("doc_id") + 4_000_000).alias("doc_id"),
                F.regexp_replace("text", " ", "  ").alias("text"),
            )
        )
    )


def _q115_delta2(docs: DataFrame) -> DataFrame:
    return (
        docs.filter(F.col("doc_id") % 10 == 1)
        .select(
            (F.col("doc_id") + 5_000_000).alias("doc_id"),
            F.md5("text").alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 3).select(
                (F.col("doc_id") + 6_000_000).alias("doc_id"),
                F.md5(F.concat(F.col("text"), F.lit("x"))).alias("text"),
            )
        )
    )


def _q115_session(spark: SparkSession, docs: DataFrame, tag: str):
    from ..operators.classifier import demo_weight_vector
    from ..operators.incremental_dedup import build_dedup_state
    from ..operators.ingest import GatedIngestSession
    from ..tables.bucketed_lookup import BucketedLookup

    # the standing corpus lives ID-BUCKETED (r7: candidate-pruned
    # partner reads) so each micro-batch's near-dup partner fetch
    # file-prunes to the candidate ids' buckets instead of scanning
    # the corpus once per delta
    corpus = BucketedLookup.create(
        spark, docs, scratch_dir(f"q115{tag}_corpus_"),
        "doc_id", "text", n_buckets=16,
    )
    # the band index stays UNPARTITIONED here by the sizing rule
    # (BENCH_NOTES "Gated ingest-loop scale probe"): partitioning pays
    # only when a delta's touched partitions << total partitions, and at
    # sf-scale a delta's ~16·|delta| band keys touch every partition —
    # measured +2.5–4 s/delta of pure overhead. q126 carries the
    # partitioned configuration; the at-scale pruning claim is pinned by
    # the pruned_files receipt test, not by toy-scale wall clock.
    state = build_dedup_state(
        spark, corpus.read(), "doc_id", "text",
        scratch_dir(f"q115{tag}_fp_"), scratch_dir(f"q115{tag}_bands_"),
    )
    return GatedIngestSession(
        state,
        demo_weight_vector(spark, 1024),
        corpus,
        id_col="doc_id",
        text_col="text",
        num_buckets=1024,
        keep_threshold=_Q115_KEEP,
    )


# operator-only variant (bench run_s): ONE gated delta pass against a
# memoized session — the steady-state ingest cost. The registered
# query's state build + streaming replay harness is verify_s.
_Q115_CACHE: dict = {}


def _q115_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    key = session_cache_key(spark, sf_dir)
    session = _Q115_CACHE.get(key)
    if session is None:
        session = _q115_session(spark, docs, "b")
        _Q115_CACHE[key] = session
    return session.process_delta(_q115_delta1(docs), append_new=False)


@register(
    "q115_gated_streaming_ingest",
    covers="streaming dedup-incremental dedup-bloom classifier-inference "
           "table-layer S5 S7 J1 J5 J6 A1 A9",
    bare=_q115_bare,
    oracle=f"""
WITH d1 AS (
  SELECT doc_id + 2000000 AS doc_id, text
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, md5(text) AS text
  FROM documents WHERE doc_id % 10 = 1
  UNION ALL
  SELECT doc_id + 4000000 AS doc_id, replace(text, ' ', '  ') AS text
  FROM documents WHERE doc_id % 10 = 2
), d2 AS (
  SELECT doc_id + 5000000 AS doc_id, md5(text) AS text
  FROM documents WHERE doc_id % 10 = 1
  UNION ALL
  SELECT doc_id + 6000000 AS doc_id, md5(text || 'x') AS text
  FROM documents WHERE doc_id % 10 = 3
), all_d AS (
  SELECT * FROM d1 UNION ALL SELECT * FROM d2
), base AS (
  SELECT doc_id, {{toks}} AS t FROM all_d WHERE {{norm}} <> ''
), uni AS (
  SELECT doc_id, u AS f FROM base, unnest(t) AS s(u)
), bi AS (
  SELECT doc_id, u AS f
  FROM (SELECT doc_id,
               list_transform(range(0, len(t) - 1),
                              i -> t[i+1] || ' ' || t[i+2]) AS bl
        FROM base WHERE len(t) >= 2),
       unnest(bl) AS s(u)
), feats AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % 1024 AS INT)
           AS bucket
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
), w AS (
  SELECT CAST(b AS INT) AS bucket,
         (CAST(('0x' || substr(md5('w' || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT)
          % 2001 - 1000) / 1000.0 AS wt
  FROM range(0, 1024) AS r(b)
), probs AS (
  SELECT f.doc_id,
         round(1.0 / (1.0 + exp(-round(-0.05 + sum(w.wt) / count(*), 4))), 4)
           AS prob
  FROM feats f JOIN w USING (bucket)
  GROUP BY f.doc_id
), cls1 AS (
  SELECT d.doc_id,
         CASE WHEN p.prob IS NULL OR p.prob < {_Q115_KEEP} THEN 'rejected'
              WHEN EXISTS (SELECT 1 FROM documents c WHERE c.text = d.text)
                THEN 'exact_dup'
              WHEN EXISTS (SELECT 1 FROM documents c WHERE
                     trim(regexp_replace(lower(c.text), '\\s+', ' ', 'g')) =
                     trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')))
                THEN 'near_dup'
              ELSE 'new' END AS status
  FROM d1 d LEFT JOIN probs p USING (doc_id)
), u2 AS (
  SELECT text FROM documents
  UNION ALL
  SELECT d.text FROM d1 d JOIN cls1 USING (doc_id) WHERE cls1.status = 'new'
), cls2 AS (
  SELECT d.doc_id,
         CASE WHEN p.prob IS NULL OR p.prob < {_Q115_KEEP} THEN 'rejected'
              WHEN EXISTS (SELECT 1 FROM u2 c WHERE c.text = d.text)
                THEN 'exact_dup'
              WHEN EXISTS (SELECT 1 FROM u2 c WHERE
                     trim(regexp_replace(lower(c.text), '\\s+', ' ', 'g')) =
                     trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')))
                THEN 'near_dup'
              ELSE 'new' END AS status
  FROM d2 d LEFT JOIN probs p USING (doc_id)
), c1 AS (
  SELECT CAST(count(*) AS BIGINT) AS d1_total,
         CAST(coalesce(sum(CASE WHEN status = 'rejected' THEN 1 END), 0)
           AS BIGINT) AS d1_rejected,
         CAST(coalesce(sum(CASE WHEN status = 'exact_dup' THEN 1 END), 0)
           AS BIGINT) AS d1_exact,
         CAST(coalesce(sum(CASE WHEN status = 'near_dup' THEN 1 END), 0)
           AS BIGINT) AS d1_near,
         CAST(coalesce(sum(CASE WHEN status = 'new' THEN 1 END), 0)
           AS BIGINT) AS d1_new
  FROM cls1
), c2 AS (
  SELECT CAST(count(*) AS BIGINT) AS d2_total,
         CAST(coalesce(sum(CASE WHEN status = 'rejected' THEN 1 END), 0)
           AS BIGINT) AS d2_rejected,
         CAST(coalesce(sum(CASE WHEN status = 'exact_dup' THEN 1 END), 0)
           AS BIGINT) AS d2_exact,
         CAST(coalesce(sum(CASE WHEN status = 'near_dup' THEN 1 END), 0)
           AS BIGINT) AS d2_near,
         CAST(coalesce(sum(CASE WHEN status = 'new' THEN 1 END), 0)
           AS BIGINT) AS d2_new
  FROM cls2
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS corpus_docs,
       c1.*, c2.*,
       (SELECT CAST(count(*) AS BIGINT) FROM documents)
         + c1.d1_new + c2.d2_new AS fingerprints_final,
       (SELECT CAST(count(*) AS BIGINT) FROM documents)
         + c1.d1_new + c2.d2_new AS corpus_rows_final,
       CAST(1 AS BIGINT) AS model_validations
FROM c1, c2
""".replace("{toks}", _Q115_TOKS).replace("{norm}", _Q115_NORM),
)
def q115_gated_streaming_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import demo_weight_vector
    from ..operators.incremental_dedup import (
        build_dedup_state,
        open_dedup_state,
    )
    from ..operators.ingest import GatedIngestSession
    from ..tables.bucketed_lookup import BucketedLookup
    from ._artifacts import pristine_copy

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # pristine corpus lookup + dedup state built once per session; the
    # streaming run below folds accepted rows into both, so each
    # invocation mutates a fresh copy (r10 verdict #5: these two builds
    # were the bulk of the verify leg, re-paid per bench iteration)
    def _build() -> list[str]:
        c_root = scratch_dir("q115_corpus_")
        fp, bands = scratch_dir("q115_fp_"), scratch_dir("q115_bands_")
        BucketedLookup.create(
            spark, docs, c_root, "doc_id", "text", n_buckets=16
        )
        # band index unpartitioned by the sizing rule — see
        # _q115_session's comment
        build_dedup_state(spark, docs, "doc_id", "text", fp, bands)
        return [c_root, fp, bands]

    c_root, fp_root, band_root = pristine_copy(spark, sf_dir, "q115", _build)
    session = GatedIngestSession(
        open_dedup_state(spark, fp_root, band_root),
        demo_weight_vector(spark, 1024),
        BucketedLookup.open(spark, c_root),
        id_col="doc_id",
        text_col="text",
        num_buckets=1024,
        keep_threshold=_Q115_KEEP,
    )

    src = scratch_dir(prefix="q115_replay_")
    # two sequential single-file writes: mtime order pins micro-batch
    # order (q109's pattern); the explicit utime bump makes the ordering
    # robust even on coarse-mtime filesystems — delta 2 MUST arrive
    # after delta 1's accepted rows are folded into the state
    _q115_delta1(docs).coalesce(1).write.mode("overwrite").parquet(src)
    import glob as _glob
    import time as _time

    first = set(_glob.glob(os.path.join(src, "*.parquet")))
    _q115_delta2(docs).coalesce(1).write.mode("append").parquet(src)
    late = _time.time() + 3600
    for p in set(_glob.glob(os.path.join(src, "*.parquet"))) - first:
        os.utime(p, (late, late))

    from ..streaming.incremental import IdempotentEpochSink

    sink = SnapshotTable(spark, scratch_dir(prefix="q115_sink_"))
    # exactly-once sink (r7): epoch ids ride in the snapshot summary so
    # a crash-replayed micro-batch is skipped, never double-appended
    esink = IdempotentEpochSink(sink, query_id="q115")

    def classify(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = session.process_delta(batch_df, append_new=True)
        esink.write(out, epoch_id)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(classify)
        .outputMode("update")
        .option("checkpointLocation", scratch_dir(prefix="q115_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    res = sink.read()
    is_d1 = F.col("id") < 5_000_000

    def cnt(cond, name):
        return F.coalesce(F.sum(F.when(cond, 1)), F.lit(0)).cast(
            "bigint"
        ).alias(name)

    agg = res.agg(
        cnt(is_d1, "d1_total"),
        cnt(is_d1 & (F.col("status") == "rejected"), "d1_rejected"),
        cnt(is_d1 & (F.col("status") == "exact_dup"), "d1_exact"),
        cnt(is_d1 & (F.col("status") == "near_dup"), "d1_near"),
        cnt(is_d1 & (F.col("status") == "new"), "d1_new"),
        cnt(~is_d1, "d2_total"),
        cnt(~is_d1 & (F.col("status") == "rejected"), "d2_rejected"),
        cnt(~is_d1 & (F.col("status") == "exact_dup"), "d2_exact"),
        cnt(~is_d1 & (F.col("status") == "near_dup"), "d2_near"),
        cnt(~is_d1 & (F.col("status") == "new"), "d2_new"),
    )
    return (
        docs.agg(F.count(F.lit(1)).cast("bigint").alias("corpus_docs"))
        .crossJoin(agg)
        .withColumn(
            "fingerprints_final",
            F.lit(session.state.fingerprints.count_rows()).cast("bigint"),
        )
        .withColumn(
            "corpus_rows_final",
            F.lit(
                (
                    session.corpus_table.table
                    if hasattr(session.corpus_table, "table")
                    else session.corpus_table
                ).count_rows()
            ).cast("bigint"),
        )
        .withColumn(
            "model_validations",
            F.lit(session.model_validations).cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# q127: EXACTLY-ONCE SINK semantics under replay — the IdempotentEpochSink
#       driven through the at-least-once failure sequence foreachBatch
#       can produce (crash between sink write and checkpoint commit →
#       the SAME epoch is delivered again; a restart can also re-deliver
#       an older epoch). Two epochs are applied, then three replays (same
#       epoch twice, stale epoch once) are offered and must be SKIPPED:
#       the sink table ends exactly = batch0 ∪ batch1, per-row
#       hash-checked, with the applied/skipped receipts pinned. The
#       epoch markers ride in the snapshot summary — the same atomic
#       commit as the data — so the check cannot diverge from the write
#       across a crash (tests/test_sessionize_stream.py pins the
#       crash-ordering unit cases; this query gives the semantics a
#       driver verdict).
# ---------------------------------------------------------------------------
@register(
    "q127_exactly_once_sink",
    covers="streaming-shape table-layer S5 S7 S9 P3 P5",
    oracle="""
SELECT doc_id,
       CAST(2 AS BIGINT) AS applied_epochs,
       CAST(3 AS BIGINT) AS skipped_replays,
       CAST(1 AS BIGINT) AS last_epoch,
       CAST(2 AS BIGINT) AS sink_commits
FROM documents WHERE doc_id % 3 < 2
""",
)
def q127_exactly_once_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.incremental import IdempotentEpochSink

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)

    table = SnapshotTable(spark, scratch_dir(prefix="q127_sink_"))
    sink = IdempotentEpochSink(table, query_id="q127")
    applied = int(sink.write(b0, 0)) + int(sink.write(b1, 1))
    skipped = sum(
        1
        for ok in (
            sink.write(b0, 0),   # crash-replay of epoch 0
            sink.write(b1, 1),   # crash-replay of epoch 1
            sink.write(b1, 0),   # stale epoch after restart
        )
        if not ok
    )
    return table.read().select(
        "doc_id",
        F.lit(applied).cast("bigint").alias("applied_epochs"),
        F.lit(skipped).cast("bigint").alias("skipped_replays"),
        F.lit(sink.last_epoch()).cast("bigint").alias("last_epoch"),
        F.lit(table.history().count()).cast("bigint").alias("sink_commits"),
    )


# ---------------------------------------------------------------------------
# q129: DURABLE ANN INDEX STATE — the similarity-search leg of the
#       standing pipeline made restart-safe (r7 verdict #2; mirrors
#       q126's dedup-state shape). Build the IVF index once over the
#       corpus head (centroid table + cell-PARTITIONED inverted lists +
#       geometry meta), fold a delta in WITHOUT retraining (one
#       broadcast-matmul pass over the delta), then REOPEN the state
#       from disk — geometry from the artifacts, never the caller — and
#       serve top-k through the reopened index. IVF raw rows are
#       engine/float-order specific, so the oracle is the q38-style
#       CONTRACT: exactly k rows per query, recall >= 3/5 vs the exact
#       in-query brute-force twin over the FULL corpus (head + delta —
#       a probe that missed the un-retrained appends would fail), the
#       probe read partition-pruned to the probed cells (IO receipt:
#       probe_files strict subset), reopened geometry intact, and the
#       staleness signal raised (delta fraction 20% > threshold 10%).
#       Scale shape: daily cost is |delta| + probed cells, never the
#       corpus; the retrain full pass is amortized behind stale().
# ---------------------------------------------------------------------------
_Q129_BUILD: dict = {}


def _q129_state(spark: SparkSession, sf_dir: str):
    from types import SimpleNamespace

    from ..operators.ann_state import build_ann_state, open_ann_state
    from ._artifacts import pristine_copy

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    head = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    mkey = session_cache_key(spark, sf_dir, "q129")

    # The index build (k-means train + full-corpus assignment + delta
    # fold) is deterministic from the parquet inputs and the query never
    # mutates the artifacts after it, so it is pristine-copy material
    # (r10 verdict #5 harness-cost control, same shape as q137): build
    # once per session, reopen a hardlinked copy per invocation. The
    # build-time geometry scalars the restart check compares against are
    # memoized alongside the roots (they are what build_ann_state's
    # in-memory object reported before any reopen).
    def _build() -> list[str]:
        cent = scratch_dir(prefix="q129_cent_")
        assign = scratch_dir(prefix="q129_assign_")
        st = build_ann_state(
            spark, head, cent, assign,
            n_cells=16, retrain_fraction=0.1,
        )
        n_appended = st.append(delta)
        _Q129_BUILD[mkey] = SimpleNamespace(
            n_cells=st.n_cells, dim=st.dim, n_at_train=st.n_at_train,
            n_appended=st.n_appended, appended_rows=n_appended,
        )
        return [cent, assign]

    cent, assign = pristine_copy(spark, sf_dir, "q129", _build)
    built = _Q129_BUILD[mkey]
    # the restart: a fresh object, geometry read back from disk
    reopened = open_ann_state(spark, cent, assign)
    return built, reopened, built.appended_rows


_Q129_CACHE: dict = {}


def _q129_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-only variant: ONE top-k probe through an already-built,
    already-reopened index — the daily production shape. The state
    build + exact brute-force recall twin in the registered form is
    verification harness (verify_s)."""
    key = session_cache_key(spark, sf_dir)
    if key not in _Q129_CACHE:
        _Q129_CACHE[key] = _q129_state(spark, sf_dir)
    _, reopened, _ = _Q129_CACHE[key]
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = reopened.topk(queries, k=5, nprobe=6)
    return approx.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("k_returned")
    )


@register(
    "q129_durable_ann_state",
    covers="similarity-ivf similarity-state table-layer S5 S6 S7 J5 A2 P5",
    bare=_q129_bare,
    oracle="""
SELECT vec_id AS query_id,
       CAST(5 AS BIGINT) AS k_returned,
       TRUE AS recall_ok,
       TRUE AS pruned_probe_ok,
       TRUE AS reopened_geometry_ok,
       TRUE AS stale_after_delta,
       (SELECT CAST(count(*) FILTER (WHERE vec_id % 5 <> 0) AS BIGINT)
        FROM embeddings) AS n_at_train,
       (SELECT CAST(count(*) FILTER (WHERE vec_id % 5 = 0) AS BIGINT)
        FROM embeddings) AS n_appended
FROM embeddings WHERE vec_id < 5
""",
)
def q129_durable_ann_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk

    st, reopened, n_appended = _q129_state(spark, sf_dir)
    _Q129_CACHE[session_cache_key(spark, sf_dir)] = (st, reopened, n_appended)

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = reopened.topk(queries, k=5, nprobe=6)
    # recall twin: exact brute force over the FULL corpus (head+delta)
    exact = cosine_topk(emb, queries, k=5).select("query_id", "vec_id")
    matches = (
        approx.join(exact, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    # IO receipt: the probe reads a strict subset of the inverted-list
    # files (partition pruning), never the corpus
    all_files = reopened.assignments._read_snapshot(
        reopened.assignments.current_version()
    )["files"]
    probed = reopened.probe_files(queries, nprobe=6)
    pruned_ok = 0 < len(probed) < len(all_files)
    geometry_ok = (
        reopened.n_cells == st.n_cells
        and reopened.dim == st.dim
        and reopened.n_at_train == st.n_at_train
        and reopened.n_appended == st.n_appended
    )
    return (
        approx.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k_returned"))
        .join(matches, "query_id", "left")
        .select(
            "query_id",
            "k_returned",
            (F.coalesce(F.col("_m"), F.lit(0)) >= 3).alias("recall_ok"),
            F.lit(pruned_ok).alias("pruned_probe_ok"),
            F.lit(geometry_ok).alias("reopened_geometry_ok"),
            F.lit(reopened.stale()).alias("stale_after_delta"),
            F.lit(reopened.n_at_train).cast("bigint").alias("n_at_train"),
            F.lit(n_appended).cast("bigint").alias("n_appended"),
        )
    )


# ---------------------------------------------------------------------------
# q131: INT8-QUANTIZED ANN INDEX — q57's symmetric int8 codec composed
#       with the durable IVF state (r8 verdict #5): the inverted lists
#       store quantized vectors (array<tinyint> + per-vector scale), so
#       a probe moves ~4-8× fewer bytes at 100 TB. Scoring dequantizes;
#       for cosine the per-vector scale cancels, so the dequantized
#       score IS the full-precision rescore of the stored vector — the
#       only loss is the int8 rounding, and the recall contract is the
#       same as q129's (k rows per query, recall >= 3/5 vs the exact
#       brute-force twin over the raw corpus). The probe-bytes receipt
#       is checked against q38's float64-layout state over the SAME
#       corpus and cells: the quantized probe must move LESS THAN HALF
#       the bytes (measured 0.41× at sf0.01, headroom to the 0.5 pin;
#       raw arrays approach 1/8 at scale where parquet overhead
#       amortizes). Reopen round-trips the codec from ANN_META.
# ---------------------------------------------------------------------------
def _q131_state(spark: SparkSession, sf_dir: str):
    from ..operators.ann_state import build_ann_state, open_ann_state

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cent = scratch_dir(prefix="q131_cent8_")
    assign = scratch_dir(prefix="q131_assign8_")
    build_ann_state(spark, emb, cent, assign, n_cells=16, codec="int8")
    # the restart: codec comes back from the meta, not the caller
    return open_ann_state(spark, cent, assign)


_Q131_CACHE: dict = {}


def _q131_cached(spark: SparkSession, sf_dir: str):
    key = session_cache_key(spark, sf_dir)
    if key not in _Q131_CACHE:
        _Q131_CACHE[key] = _q131_state(spark, sf_dir)
    return _Q131_CACHE[key]


def _q131_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-only variant: ONE pruned probe through the quantized
    index (state build amortized; the float64 comparison twin and the
    exact recall twin are verification harness)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = _q131_cached(spark, sf_dir).topk(queries, k=5, nprobe=6)
    return approx.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("k_returned")
    )


@register(
    "q131_int8_ann_index",
    covers="similarity-ivf similarity-state similarity-ann quantization S5 S6 J5 A2 P5",
    bare=_q131_bare,
    oracle="""
SELECT vec_id AS query_id,
       CAST(5 AS BIGINT) AS k_returned,
       TRUE AS recall_ok,
       TRUE AS probe_bytes_ok,
       TRUE AS reopened_codec_ok
FROM embeddings WHERE vec_id < 5
""",
)
def q131_int8_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.similarity import cosine_topk
    from .corpus_text import _q38_index

    st8 = _q131_cached(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = st8.topk(queries, k=5, nprobe=6)
    exact = cosine_topk(emb, queries, k=5).select("query_id", "vec_id")
    matches = (
        approx.join(exact, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_m"))
    )

    # probe-bytes receipt vs the float64 layout (q38's state — same
    # corpus, same n_cells): the quantized probe must move < half
    stf = _q38_index(spark, sf_dir)

    def _probe_bytes(st):
        return sum(
            os.path.getsize(os.path.join(st.assignments.root, f))
            for f in st.probe_files(queries, nprobe=6)
        )

    b8, bf = _probe_bytes(st8), _probe_bytes(stf)
    probe_bytes_ok = b8 > 0 and b8 * 2 < bf
    return (
        approx.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k_returned"))
        .join(matches, "query_id", "left")
        .select(
            "query_id",
            "k_returned",
            (F.coalesce(F.col("_m"), F.lit(0)) >= 3).alias("recall_ok"),
            F.lit(probe_bytes_ok).alias("probe_bytes_ok"),
            F.lit(st8.codec == "int8").alias("reopened_codec_ok"),
        )
    )


# ---------------------------------------------------------------------------
# q132: STREAMING ANN INGEST — the streaming leg of the durable
#       similarity pipeline: a REAL readStream → foreachBatch job folds
#       embedding micro-batches into the persisted IVF index through
#       AnnState.append_epoch, the exactly-once epoch fold (the
#       IdempotentEpochSink recipe applied to the index: the epoch
#       marker commits atomically WITH the assigned rows, so a
#       crash-replayed micro-batch is detected in the snapshot log and
#       skipped — receipt-checked here by replaying the final epoch
#       after the stream). The index is then REOPENED from disk and
#       probed: every streamed query vector finds itself in its own
#       top-k through the pruned read, the log-derived append counter
#       equals the streamed row count exactly (replays excluded), and
#       the staleness signal is raised (delta fraction 33% > threshold
#       10%) — the cue for the amortized retrain. Scale shape: each
#       micro-batch costs one broadcast-matmul assignment pass over the
#       batch + one append into its touched cells; no corpus read, no
#       retrain, no full-log rescan (per-query version watermark).
# ---------------------------------------------------------------------------
def _q132_run(spark: SparkSession, sf_dir: str):
    from ..operators.ann_state import build_ann_state, open_ann_state

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    head = emb.filter(F.col("vec_id") % 4 != 0)
    delta = emb.filter(F.col("vec_id") % 4 == 0)
    cent = scratch_dir(prefix="q132_cent_")
    assign = scratch_dir(prefix="q132_assign_")
    st = build_ann_state(
        spark, head, cent, assign, n_cells=16, retrain_fraction=0.1
    )

    src = scratch_dir(prefix="q132_replay_")
    # 4 files pins the micro-batch count (2 per trigger → 2 batches)
    delta.repartition(4, "vec_id").write.mode("overwrite").parquet(src)
    applied: list[tuple[int, int]] = []

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        n = st.append_epoch(batch_df, "q132", epoch_id)
        if n:
            applied.append((int(epoch_id), n))

    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", scratch_dir(prefix="q132_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # the crash-replay: re-offer the final epoch — the durable marker,
    # not session state, must skip it (0 rows folded)
    last_epoch = max(e for e, _ in applied)
    replays_skipped = int(
        st.append_epoch(delta.limit(50), "q132", last_epoch) == 0
    )
    reopened = open_ann_state(spark, cent, assign)
    return reopened, applied, replays_skipped


_Q132_CACHE: dict = {}


def _q132_cached(spark: SparkSession, sf_dir: str):
    key = session_cache_key(spark, sf_dir)
    if key not in _Q132_CACHE:
        _Q132_CACHE[key] = _q132_run(spark, sf_dir)
    return _Q132_CACHE[key]


def _q132_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-only variant: ONE pruned probe through the
    stream-ingested, reopened index."""
    reopened, _, _ = _q132_cached(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(
        (F.col("vec_id") % 4 == 0) & (F.col("vec_id") < 20)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    return reopened.topk(queries, k=5, nprobe=6).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("k_returned")
    )


@register(
    "q132_streaming_ann_ingest",
    covers="similarity-state streaming table-layer S5 S6 S7 J5 A2 P5",
    bare=_q132_bare,
    oracle="""
SELECT vec_id AS query_id,
       CAST(5 AS BIGINT) AS k_returned,
       TRUE AS self_in_topk,
       CAST(2 AS BIGINT) AS epochs_applied,
       CAST(1 AS BIGINT) AS replays_skipped,
       (SELECT CAST(count(*) FILTER (WHERE vec_id % 4 = 0) AS BIGINT)
        FROM embeddings) AS n_appended,
       TRUE AS stale_after_stream
FROM embeddings WHERE vec_id % 4 = 0 AND vec_id < 20
""",
)
def q132_streaming_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    reopened, applied, replays_skipped = _q132_cached(spark, sf_dir)
    _Q132_CACHE[session_cache_key(spark, sf_dir)] = (reopened, applied, replays_skipped)

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(
        (F.col("vec_id") % 4 == 0) & (F.col("vec_id") < 20)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    approx = reopened.topk(queries, k=5, nprobe=6)
    # every streamed vector finds ITSELF in its own top-k through the
    # reopened, pruned index (self-cosine is exactly 1.0; an exact-dup
    # twin elsewhere in the corpus can outrank on the id tie-break but
    # not push self out of the top k here)
    self_hits = (
        approx.filter(F.col("query_id") == F.col("vec_id"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_s"))
    )
    return (
        approx.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k_returned"))
        .join(self_hits, "query_id", "left")
        .select(
            "query_id",
            "k_returned",
            (F.coalesce(F.col("_s"), F.lit(0)) >= 1).alias("self_in_topk"),
            F.lit(len(applied)).cast("bigint").alias("epochs_applied"),
            F.lit(replays_skipped).cast("bigint").alias("replays_skipped"),
            F.lit(reopened.n_appended).cast("bigint").alias("n_appended"),
            F.lit(reopened.stale()).alias("stale_after_stream"),
        )
    )


# ---------------------------------------------------------------------------
# q133: RETENTION-SAFE EXACTLY-ONCE MAINTENANCE — the standing-state
#       lifecycle a year-long 100 TB ingest loop actually runs:
#       (1) a quiet stream's epoch markers scroll past the retention
#       horizon (rival writers keep committing; expire_snapshots drops
#       every marker-bearing manifest) — the RESTARTED sink must still
#       skip its crash-replayed epoch, via the per-query_id floor that
#       expiry carries forward into the epoch_marks/ sidecar BEFORE
#       deleting a manifest; (2) the streaming ANN index accretes one
#       file per touched cell per epoch fold — AnnState.compact()
#       bin-packs the inverted lists back (cell pruning, geometry and
#       probe results intact, receipt-checked here by comparing the
#       pre/post top-k row sets), and a FULL expiry of the stamped
#       history afterwards still cannot re-open the replayed epoch.
#       Scale shape: the floor is one tiny sidecar read; compact is one
#       partition-preserving rewrite; expiry GCs the dropped fragments'
#       bytes for real.
# ---------------------------------------------------------------------------
def _q133_run(spark: SparkSession, sf_dir: str):
    from ..operators.ann_state import build_ann_state, open_ann_state
    from ..streaming.incremental import IdempotentEpochSink

    # -- sink leg: markers outlive retention through the carried floor
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < 5000
    ).select("event_id", "event_type", "value")
    sink = SnapshotTable(spark, scratch_dir(prefix="q133_sink_"))
    s = IdempotentEpochSink(sink, query_id="q133_sink")
    for e in range(3):
        s.write(ev.filter(F.col("event_id") % 5 == e), e)
    for _ in range(8):  # rival writer rolls the log past every marker
        sink.append(ev.filter(F.col("event_id") % 5 == 3))
    sink.expire_snapshots(keep_last=3)
    restarted = IdempotentEpochSink(sink, query_id="q133_sink")
    sink_floor = restarted.last_epoch()
    sink_replay_skipped = (
        restarted.write(ev.filter(F.col("event_id") % 5 == 1), 2) is False
    )
    sink_resumed = restarted.write(
        ev.filter(F.col("event_id") % 5 == 4), 3
    )

    # -- ANN leg: defragment the stream-fed inverted lists, then expire
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    head = emb.filter(F.col("vec_id") % 3 != 0)
    cent = scratch_dir(prefix="q133_cent_")
    assign = scratch_dir(prefix="q133_assign_")
    st = build_ann_state(spark, head, cent, assign, n_cells=8)
    for e in range(4):  # four micro-batch folds fragment the cells
        st.append_epoch(
            emb.filter(F.col("vec_id") % 12 == 3 * e), "q133_ann", e
        )
    queries = head.filter(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk_before = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in st.topk(queries, k=5, nprobe=3).collect()
    }
    receipt = st.compact()
    ann_defragmented = receipt["files_after"] < receipt["files_before"]
    # full expiry: ONLY the compact snapshot survives; every epoch
    # marker and the build stamp are carried into the sidecar floor
    st.assignments.expire_snapshots(keep_last=1)
    ann_floor = st.assignments.sink_epoch_floors().get("q133_ann", -1)
    reopened = open_ann_state(spark, cent, assign)
    topk_after = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in reopened.topk(queries, k=5, nprobe=3).collect()
    }
    ann_replay_skipped = (
        reopened.append_epoch(
            emb.filter(F.col("vec_id") % 12 == 9), "q133_ann", 3
        )
        == 0
    )
    ann_resumed_rows = reopened.append_epoch(
        emb.filter(F.col("vec_id") % 3 == 0).withColumn(
            "vec_id", F.col("vec_id") + 10_000_000
        ),
        "q133_ann",
        4,
    )
    return {
        "sink": sink,
        "reopened": reopened,
        "queries": queries,
        "sink_floor": sink_floor,
        "sink_replay_skipped": sink_replay_skipped,
        "sink_resumed": bool(sink_resumed),
        "ann_defragmented": ann_defragmented,
        "ann_probe_identical": topk_after == topk_before,
        "ann_floor": ann_floor,
        "ann_replay_skipped": ann_replay_skipped,
        "ann_resumed_rows": int(ann_resumed_rows),
    }


_Q133_CACHE: dict = {}


def _q133_cached(spark: SparkSession, sf_dir: str) -> dict:
    key = session_cache_key(spark, sf_dir)
    if key not in _Q133_CACHE:
        _Q133_CACHE[key] = _q133_run(spark, sf_dir)
    return _Q133_CACHE[key]


def _q133_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-only variant: one pruned probe through the compacted,
    expiry-survived index."""
    r = _q133_cached(spark, sf_dir)
    return (
        r["reopened"]
        .topk(r["queries"], k=5, nprobe=3)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("k_returned"))
    )


@register(
    "q133_retention_exactly_once",
    covers="streaming table-layer similarity-state M8 M9 S7 A2 P5",
    bare=_q133_bare,
    oracle="""
SELECT
  (SELECT CAST(count(*) FILTER (WHERE event_id % 5 IN (0, 1, 2, 4))
             + 8 * count(*) FILTER (WHERE event_id % 5 = 3) AS BIGINT)
   FROM events WHERE event_id < 5000) AS sink_rows,
  CAST(2 AS BIGINT) AS sink_floor,
  TRUE AS sink_replay_skipped,
  TRUE AS sink_resumed,
  TRUE AS ann_defragmented,
  TRUE AS ann_probe_identical,
  CAST(3 AS BIGINT) AS ann_floor,
  TRUE AS ann_replay_skipped,
  (SELECT CAST(count(*) AS BIGINT) FROM embeddings
   WHERE vec_id % 3 = 0) AS ann_resumed_rows
""",
)
def q133_retention_exactly_once(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    r = _q133_cached(spark, sf_dir)
    return r["sink"].read().agg(
        F.count(F.lit(1)).cast("bigint").alias("sink_rows")
    ).select(
        "sink_rows",
        F.lit(r["sink_floor"]).cast("bigint").alias("sink_floor"),
        F.lit(r["sink_replay_skipped"]).alias("sink_replay_skipped"),
        F.lit(r["sink_resumed"]).alias("sink_resumed"),
        F.lit(r["ann_defragmented"]).alias("ann_defragmented"),
        F.lit(r["ann_probe_identical"]).alias("ann_probe_identical"),
        F.lit(r["ann_floor"]).cast("bigint").alias("ann_floor"),
        F.lit(r["ann_replay_skipped"]).alias("ann_replay_skipped"),
        F.lit(r["ann_resumed_rows"]).cast("bigint").alias("ann_resumed_rows"),
    )


# ---------------------------------------------------------------------------
# q134: PRODUCT-QUANTIZED ANN INDEX + EXACT RESCORE — the byte-minimal
#       probe layout for 100 TB embedding corpora: the inverted lists
#       store m=16 tinyint codes per vector against persisted
#       sub-codebooks (a third artifact table, trained once at build on
#       a bounded sample), so a probe moves ~dim·8/m× fewer bytes than
#       float64 (measured sf0.1: 0.05× float64, 0.22× int8 — receipts
#       pinned below at 4× / 2× headroom). PQ alone is lossy, so the
#       probe is the standard two-stage shape (AnnState.topk_rescored):
#       shortlist k×6 through the pruned PQ read, then rescore the
#       shortlist EXACTLY against the raw corpus — a |shortlist|-row
#       join, never a corpus scan — and re-rank to top-k. Recall
#       contract matches q129/q131 (k rows per query, ≥ 3/5 exact-top-5
#       hits vs the brute-force twin). Reopen round-trips codec AND
#       codebooks from disk (geometry-stamped like every artifact).
# ---------------------------------------------------------------------------
def _q134_state(spark: SparkSession, sf_dir: str):
    from ..operators.ann_state import build_ann_state, open_ann_state

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cent = scratch_dir(prefix="q134_centpq_")
    assign = scratch_dir(prefix="q134_assignpq_")
    build_ann_state(spark, emb, cent, assign, n_cells=16, codec="pq16x16")
    # the restart: codec and codebooks come back from disk, not the caller
    return open_ann_state(spark, cent, assign)


_Q134_CACHE: dict = {}


def _q134_cached(spark: SparkSession, sf_dir: str):
    key = session_cache_key(spark, sf_dir)
    if key not in _Q134_CACHE:
        _Q134_CACHE[key] = _q134_state(spark, sf_dir)
    return _Q134_CACHE[key]


def _q134_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-only variant: ONE two-stage probe (PQ shortlist through
    the pruned read + exact rescore of the shortlist)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = _q134_cached(spark, sf_dir).topk_rescored(
        queries, emb, k=5, nprobe=6, overfetch=6
    )
    return approx.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("k_returned")
    )


@register(
    "q134_pq_ann_rescore",
    covers="similarity-ivf similarity-state similarity-ann quantization S5 S6 J1 J5 A2 P5",
    bare=_q134_bare,
    oracle="""
SELECT vec_id AS query_id,
       CAST(5 AS BIGINT) AS k_returned,
       TRUE AS recall_ok,
       TRUE AS probe_bytes_ok,
       TRUE AS reopened_codec_ok,
       CAST(0 AS BIGINT) AS codec_fallbacks
FROM embeddings WHERE vec_id < 5
""",
)
def q134_pq_ann_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.similarity import cosine_topk
    from .corpus_text import _q38_index

    stpq = _q134_cached(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # fallback_col surfaces the stale-corpus fallback rate (r10 verdict
    # #8): the rescore corpus here IS the index's build input, so the
    # receipt must be exactly zero — a non-zero count in production is
    # the "corpus snapshot lags the index, re-sync before serving" alarm
    approx = stpq.topk_rescored(
        queries, emb, k=5, nprobe=6, overfetch=6, fallback_col="_exact"
    ).localCheckpoint(eager=False)
    n_fallbacks = approx.filter(~F.col("_exact")).count()
    approx = approx.drop("_exact")
    exact = cosine_topk(emb, queries, k=5).select("query_id", "vec_id")
    matches = (
        approx.join(exact, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_m"))
    )

    # probe-bytes receipts vs BOTH denser layouts over the same corpus
    # and cells: q131's int8 state and q38's float64 state
    st8 = _q131_cached(spark, sf_dir)
    stf = _q38_index(spark, sf_dir)

    def _probe_bytes(st):
        return sum(
            os.path.getsize(os.path.join(st.assignments.root, f))
            for f in st.probe_files(queries, nprobe=6)
        )

    bpq, b8, bf = _probe_bytes(stpq), _probe_bytes(st8), _probe_bytes(stf)
    probe_bytes_ok = bpq > 0 and bpq * 2 < b8 and bpq * 4 < bf
    return (
        approx.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k_returned"))
        .join(matches, "query_id", "left")
        .select(
            "query_id",
            "k_returned",
            (F.coalesce(F.col("_m"), F.lit(0)) >= 3).alias("recall_ok"),
            F.lit(probe_bytes_ok).alias("probe_bytes_ok"),
            F.lit(stpq.codec == "pq16x16").alias("reopened_codec_ok"),
            F.lit(n_fallbacks).cast("bigint").alias("codec_fallbacks"),
        )
    )


# ---------------------------------------------------------------------------
# q135: TAKEDOWN PROPAGATION THROUGH STANDING STATE (r9 verdict #1) —
#       the one operator family a real 100 TB pipeline hits early that
#       nothing here provided: an opt-out / contamination / license
#       takedown must purge a document from the corpus AND from every
#       derived artifact, or deleted content keeps matching as a
#       "duplicate" partner and keeps surfacing in ANN results. The
#       corpus delete is the reference's own delete-aware MERGE (M5,
#       updating_db_with_deltas_iceberg.ipynb cell 26); table_changes
#       turns it into a CDF delete window; takedown_ids + 
#       propagate_takedown fan the ids out to the dedup band index, the
#       id-bucketed lookup and the ANN inverted lists — since r11 all
#       three legs run MERGE-ON-READ (one equality-delete file per
#       artifact, O(|victims|) write cost however the victims scatter;
#       every probe below reads THROUGH the live delete files), with a
#       durable ledger recording per-artifact completion and a resume
#       re-run that must skip everything without touching any artifact.
#       The bloom prefilter is compensated by construction (stale bits
#       discharge against the REDUCED fingerprint table; see
#       DedupState.apply_deletes).
#
#       Oracle: the REDUCED-corpus contract, fully hash-checked —
#       probe copies of deleted docs classify 'new' (exact copies AND
#       whitespace near-dups: even the near-dup channel must forget),
#       copies of kept docs still classify exact_dup/near_dup, the ANN
#       probe returns k rows per query with NO deleted id (and the
#       pruned probe read itself contains none — the receipt), and the
#       per-artifact removed-row counts equal the oracle's recount.
# ---------------------------------------------------------------------------
def _q135_artifacts(spark: SparkSession, sf_dir: str):
    """Fresh copies of the pristine pre-takedown standing state (corpus
    table v1, dedup band index, id-bucketed lookup, ANN index), built
    once per session and copied per invocation (r10 verdict #5: the
    bench median-of-3 re-paid the three standing builds per iteration;
    the registered runs MUTATE their artifacts — corpus MERGE delete,
    per-artifact purges, ledger writes). Shared by q135 and q139."""
    from ..operators.ann_state import build_ann_state, open_ann_state
    from ..operators.incremental_dedup import (
        build_dedup_state,
        open_dedup_state,
    )
    from ..tables.bucketed_lookup import BucketedLookup
    from ._artifacts import pristine_copy

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )

    def _build() -> list[str]:
        corpus_root = scratch_dir(prefix="q135_corpus_")
        fp, bands = scratch_dir("q135_fp_"), scratch_dir("q135_bands_")
        lk_root = scratch_dir("q135_lk_")
        cent, assign = scratch_dir("q135_cent_"), scratch_dir("q135_assign_")
        SnapshotTable(spark, corpus_root).create_or_replace(docs)  # v1
        build_dedup_state(spark, docs, "doc_id", "text", fp, bands)
        BucketedLookup.create(
            spark, docs, lk_root, "doc_id", "text", n_buckets=16
        )
        build_ann_state(spark, emb, cent, assign, n_cells=16)
        return [corpus_root, fp, bands, lk_root, cent, assign]

    corpus_root, fp, bands, lk_root, cent, assign = pristine_copy(
        spark, sf_dir, "q135", _build
    )
    return (
        SnapshotTable(spark, corpus_root),
        open_dedup_state(spark, fp, bands),
        BucketedLookup.open(spark, lk_root),
        open_ann_state(spark, cent, assign),
    )


def _q135_state(spark: SparkSession, sf_dir: str):
    from ..operators.changelog import table_changes
    from ..operators.takedown import propagate_takedown, takedown_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_t, state, lk, ast = _q135_artifacts(spark, sf_dir)
    # the takedown: M5 delete-aware MERGE removes doc_id % 17 == 3  (v2)
    corpus_t.merge(
        docs.filter(F.col("doc_id") % 17 == 3).select(
            "doc_id", F.lit(True).alias("_drop")
        ),
        on=["doc_id"],
        clause=MergeClause(
            matched_delete_condition="s._drop",
            insert_when_not_matched=False,
        ),
    )
    ids = takedown_ids(table_changes(corpus_t, ["doc_id"], 1, 2), "doc_id")
    # merge-on-read end-to-end (r10 verdict #1): takedown victims are
    # content-arbitrary and scatter across every partition layout —
    # band hashes, id buckets, ANN cells alike — so every purge lands
    # as an equality-delete file (write cost O(|victims|)), and the
    # probe legs below read THROUGH the live delete files (the MOR read
    # path is what the driver hash-checks). The ledger makes completion
    # durable (r10 verdict #3); the resume re-run must skip every
    # artifact without touching it.
    ledger = SnapshotTable(spark, scratch_dir("q135_ledger_"))
    receipt = propagate_takedown(
        ids, dedup_state=state, ann_state=ast, lookups=[lk],
        mode="merge-on-read", ledger=ledger,
    )
    versions = (
        state.fingerprints.current_version(),
        state.bands.current_version(),
        ast.assignments.current_version(),
        lk.table.current_version(),
    )
    again = propagate_takedown(
        ids, dedup_state=state, ann_state=ast, lookups=[lk],
        mode="merge-on-read", ledger=ledger,
    )
    receipt["_resume_ok"] = bool(
        sorted(again["skipped"]) == ["ann", "dedup", "lookup_0"]
        and again["dedup"] == receipt["dedup"]
        and versions
        == (
            state.fingerprints.current_version(),
            state.bands.current_version(),
            ast.assignments.current_version(),
            lk.table.current_version(),
        )
    )
    return state, lk, ast, receipt


_Q135_CACHE: dict = {}


def _q135_cached(spark: SparkSession, sf_dir: str):
    key = session_cache_key(spark, sf_dir)
    if key not in _Q135_CACHE:
        _Q135_CACHE[key] = _q135_state(spark, sf_dir)
    return _Q135_CACHE[key]


def _q135_probe(spark: SparkSession, sf_dir: str, state, lk, ast) -> DataFrame:
    """The post-takedown serving path: classify a probe delta against
    the reduced artifacts (the purged BucketedLookup IS the partner
    source) and probe the ANN index with the DELETED docs' own
    vectors."""
    from ..operators.incremental_dedup import incremental_neardup_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    delta = (
        docs.filter(F.col("doc_id") % 17 == 3)
        .select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 17 == 5).select(
                (F.col("doc_id") + 6_000_000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 17 == 7).select(
                (F.col("doc_id") + 7_000_000).alias("doc_id"),
                F.regexp_replace("text", " ", "  ").alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 17 == 3).select(
                (F.col("doc_id") + 8_000_000).alias("doc_id"),
                F.regexp_replace("text", " ", "  ").alias("text"),
            )
        )
    )
    classified = incremental_neardup_dedup(
        state, delta, lk, "doc_id", "text", append_new=False
    ).select(F.col("id").alias("probe_id"), "status")

    # ANN: the deleted docs' own vectors as queries — every query must
    # still get k results and NONE may be a deleted id; the pruned
    # probe READ itself must contain no deleted id either
    queries = emb.filter(F.col("vec_id") % 17 == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ast.topk(queries, k=5, nprobe=4).localCheckpoint(eager=False)
    n_q = queries.count()
    full_k = (
        got.groupBy("query_id").count().filter(F.col("count") == 5).count()
        == n_q
    )
    no_deleted = got.filter(F.col("vec_id") % 17 == 3).isEmpty()
    probed = ast.assignments._read_snapshot_df(
        ast.assignments._read_snapshot(ast.assignments.current_version()),
        only_files=ast.probe_files(queries, nprobe=4),
    )
    read_clean = probed.filter(F.col("vec_id") % 17 == 3).isEmpty()
    ann_purged_ok = bool(full_k and no_deleted and read_clean)
    lookup_purged_ok = lk.fetch(
        emb.select(F.col("vec_id").alias("doc_id"))
    ).filter(F.col("doc_id") % 17 == 3).isEmpty()
    return classified.select(
        "probe_id",
        "status",
        F.lit(ann_purged_ok).alias("ann_purged_ok"),
        F.lit(bool(lookup_purged_ok)).alias("lookup_purged_ok"),
    )


def _q135_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-only variant: the post-takedown classification + probe
    over memoized purged artifacts — the standing serve path; the
    corpus build + CDF propagation is the registered form's harness."""
    state, lk, ast, _ = _q135_cached(spark, sf_dir)
    return _q135_probe(spark, sf_dir, state, lk, ast)


@register(
    "q135_takedown_propagation",
    covers=(
        "takedown delete-propagation dedup-incremental similarity-ivf "
        "change-data-feed table-layer M5-shape S5 S7 J4 J5 J6 A1"
    ),
    bare=_q135_bare,
    oracle=f"""
WITH kept AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 3
),
delta AS (
  SELECT doc_id + 5000000 AS probe_id, text
  FROM documents WHERE doc_id % 17 = 3
  UNION ALL
  SELECT doc_id + 6000000, text
  FROM documents WHERE doc_id % 17 = 5
  UNION ALL
  SELECT doc_id + 7000000, replace(text, ' ', '  ')
  FROM documents WHERE doc_id % 17 = 7
  UNION ALL
  SELECT doc_id + 8000000, replace(text, ' ', '  ')
  FROM documents WHERE doc_id % 17 = 3
),
-- the testdata holds GENUINE near-dup pairs (J≈0.9-0.99), so the
-- near-dup channel is the exact word-3-gram Jaccard >= 0.7 against the
-- REDUCED corpus (q33's shingle twin), not just whitespace equality —
-- a copy of a deleted doc whose only near twin was ALSO deleted must
-- come back 'new'
ksh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
                                      i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM (SELECT doc_id,
               regexp_split_to_array(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
        FROM kept)
),
dsh AS (
  SELECT probe_id, text,
         list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
                                      i -> array_to_string(t[i+1:i+3], ' '))) AS s
  FROM (SELECT probe_id, text,
               regexp_split_to_array(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
        FROM delta)
),
-- inverted-index blocking (q33's recipe): only shingle-sharing pairs
-- are Jaccard-scored, which is complete for any threshold > 0
cand AS (
  SELECT DISTINCT dex.probe_id, kex.doc_id
  FROM (SELECT probe_id, unnest(s) AS g FROM dsh) dex
  JOIN (SELECT doc_id, unnest(s) AS g FROM ksh) kex ON dex.g = kex.g
),
near AS (
  SELECT c.probe_id,
         max(CASE WHEN CAST(len(list_intersect(k.s, p.s)) AS DOUBLE)
                  / greatest(len(list_distinct(list_concat(k.s, p.s))), 1)
                  >= 0.7
             THEN 1 ELSE 0 END) AS is_near
  FROM cand c
  JOIN ksh k ON k.doc_id = c.doc_id
  JOIN dsh p ON p.probe_id = c.probe_id
  GROUP BY c.probe_id
)
SELECT d.probe_id,
       CASE WHEN EXISTS (SELECT 1 FROM kept c WHERE c.text = d.text)
              THEN 'exact_dup'
            WHEN coalesce(n.is_near, 0) = 1
              THEN 'near_dup'
            ELSE 'new' END AS status,
       TRUE AS ann_purged_ok,
       TRUE AS lookup_purged_ok,
       (SELECT CAST(count(*) AS BIGINT) FROM documents
        WHERE doc_id % 17 = 3) AS n_taken_down,
       (SELECT CAST(count(*) AS BIGINT) FROM documents
        WHERE doc_id % 17 = 3) AS fp_rows_removed,
       (SELECT CAST(16 * count(*) AS BIGINT) FROM documents
        WHERE doc_id % 17 = 3) AS band_rows_removed,
       (SELECT CAST(count(*) AS BIGINT) FROM documents
        WHERE doc_id % 17 = 3) AS lookup_rows_removed,
       (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        WHERE vec_id % 17 = 3) AS ann_rows_removed,
       TRUE AS ledger_resume_ok
FROM dsh d LEFT JOIN near n ON n.probe_id = d.probe_id
""",
)
def q135_takedown_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    state, lk, ast, receipt = _q135_state(spark, sf_dir)
    _Q135_CACHE[session_cache_key(spark, sf_dir)] = (state, lk, ast, receipt)
    probe = _q135_probe(spark, sf_dir, state, lk, ast)
    n_del = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 17 == 3
    ).count()
    return probe.select(
        "*",
        F.lit(n_del).cast("bigint").alias("n_taken_down"),
        F.lit(receipt["dedup"]["fingerprint_rows"]).cast("bigint").alias(
            "fp_rows_removed"
        ),
        F.lit(receipt["dedup"]["band_rows"]).cast("bigint").alias(
            "band_rows_removed"
        ),
        F.lit(receipt["lookup_0_rows"]).cast("bigint").alias(
            "lookup_rows_removed"
        ),
        F.lit(receipt["ann_rows"]).cast("bigint").alias("ann_rows_removed"),
        F.lit(receipt["_resume_ok"]).alias("ledger_resume_ok"),
    )


# ---------------------------------------------------------------------------
# q137: CDF-DRIVEN ANN INDEX SYNC — the capstone composition of the
#       standing similarity pipeline: the corpus table commits (append
#       + delete-aware MERGE), and AnnState.sync_from_cdf keeps the
#       index in LOCKSTEP by consuming the table's own change feed —
#       inserts fold in exactly-once (q132's epoch recipe), deletes
#       purge the inverted lists (q135's takedown surface), and the
#       EPOCH MARKER IS THE CURSOR (the source version stamps the
#       window's last commit, so a crash-replayed sync applies nothing
#       — receipt-checked by a second sync call). Contract oracle in
#       the q129 style: every probe of the synced-then-REOPENED index
#       returns k rows, recall >= 3/5 vs exact brute force over the
#       FINAL corpus state, no deleted id ever surfaces, and the
#       windows/folded/purged receipts equal the oracle's recount.
#       Scale shape: per-window cost is |window changes| (one
#       delta-sized fold + one victim-local pruned rewrite), never the
#       corpus — the daily "index follows corpus" loop at 100 TB.
# ---------------------------------------------------------------------------
def _q137_run(spark: SparkSession, sf_dir: str):
    from ..operators.ann_state import build_ann_state, open_ann_state
    from ._artifacts import pristine_copy

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )

    # pristine corpus v1 + built index, copied per invocation (the run
    # mutates both: corpus append/merge, index folds/purges) — r10
    # verdict #5 harness-cost control
    def _build() -> list[str]:
        corpus_root = scratch_dir(prefix="q137_corpus_")
        cent = scratch_dir(prefix="q137_cent_")
        assign = scratch_dir(prefix="q137_assign_")
        t = SnapshotTable(spark, corpus_root)
        t.create_or_replace(emb.filter(F.col("vec_id") % 3 != 0))    # v1
        build_ann_state(
            spark, t.read(1), cent, assign, n_cells=16,
            retrain_fraction=10.0,  # isolate the sync loop from retrain
        )
        return [corpus_root, cent, assign]

    corpus_root, cent, assign = pristine_copy(spark, sf_dir, "q137", _build)
    corpus = SnapshotTable(spark, corpus_root)
    st = open_ann_state(spark, cent, assign)
    corpus.append(emb.filter(F.col("vec_id") % 3 == 0))              # v2
    corpus.merge(                                                    # v3
        emb.filter(F.col("vec_id") % 7 == 1).select(
            "vec_id", F.lit(True).alias("_d")
        ),
        on=["vec_id"],
        clause=MergeClause(
            matched_delete_condition="s._d", insert_when_not_matched=False
        ),
    )
    receipt = st.sync_from_cdf(
        corpus, ["vec_id"], query_id="q137", from_version=1
    )
    # the crash-replay: a fresh sync over the same head must apply
    # nothing (the marker log IS the durable cursor)
    replay = st.sync_from_cdf(corpus, ["vec_id"], query_id="q137")
    reopened = open_ann_state(spark, cent, assign)
    return corpus, reopened, receipt, replay


_Q137_CACHE: dict = {}


def _q137_cached(spark: SparkSession, sf_dir: str):
    key = session_cache_key(spark, sf_dir)
    if key not in _Q137_CACHE:
        _Q137_CACHE[key] = _q137_run(spark, sf_dir)
    return _Q137_CACHE[key]


def _q137_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(
        (F.col("vec_id") < 10) & (F.col("vec_id") % 7 != 1)
    ).select(F.col("vec_id").alias("query_id"), "embedding")


def _q137_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-only variant: ONE pruned probe through the synced,
    reopened index — the serve path of the standing loop."""
    _, reopened, _, _ = _q137_cached(spark, sf_dir)
    return reopened.topk(
        _q137_queries(spark, sf_dir), k=5, nprobe=6
    ).groupBy("query_id").agg(F.count(F.lit(1)).alias("k_returned"))


@register(
    "q137_cdf_ann_sync",
    covers=(
        "similarity-ivf similarity-state change-data-feed takedown "
        "delete-propagation table-layer S5 S7 M5-shape J5 A2"
    ),
    bare=_q137_bare,
    oracle="""
SELECT vec_id AS query_id,
       CAST(5 AS BIGINT) AS k_returned,
       TRUE AS recall_ok,
       TRUE AS no_deleted_ok,
       CAST(2 AS BIGINT) AS windows_applied,
       CAST(0 AS BIGINT) AS replay_windows,
       (SELECT CAST(count(*) FILTER (WHERE vec_id % 3 = 0) AS BIGINT)
        FROM embeddings) AS folded,
       (SELECT CAST(count(*) FILTER (WHERE vec_id % 7 = 1) AS BIGINT)
        FROM embeddings) AS purged
FROM embeddings WHERE vec_id < 10 AND vec_id % 7 <> 1
""",
)
def q137_cdf_ann_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk

    corpus, reopened, receipt, replay = _q137_run(spark, sf_dir)
    _Q137_CACHE[session_cache_key(spark, sf_dir)] = (
        corpus, reopened, receipt, replay,
    )
    queries = _q137_queries(spark, sf_dir)
    final = corpus.read().select("vec_id", "embedding")
    approx = reopened.topk(queries, k=5, nprobe=6).localCheckpoint(
        eager=False
    )
    exact = cosine_topk(final, queries, k=5).select("query_id", "vec_id")
    matches = (
        approx.join(exact, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    no_deleted = bool(approx.filter(F.col("vec_id") % 7 == 1).isEmpty())
    return (
        approx.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k_returned"))
        .join(matches, "query_id", "left")
        .select(
            "query_id",
            "k_returned",
            (F.coalesce(F.col("_m"), F.lit(0)) >= 3).alias("recall_ok"),
            F.lit(no_deleted).alias("no_deleted_ok"),
            F.lit(receipt["windows"]).cast("bigint").alias("windows_applied"),
            F.lit(replay["windows"]).cast("bigint").alias("replay_windows"),
            F.lit(receipt["folded"]).cast("bigint").alias("folded"),
            F.lit(receipt["purged"]).cast("bigint").alias("purged"),
        )
    )


# ---------------------------------------------------------------------------
# q138: LIFECYCLE DAY-LOOP (r10 verdict #2) — the full standing-pipeline
#       composition the reference's own tutorial runs daily
#       (updating_db_with_deltas_iceberg.ipynb cells 26-45), moved from
#       tool receipts (tools/probe_lifecycle_dayloop.py) to the same
#       driver-checked oracle bar as every other claim: THREE days of
#       [corpus append + delete-aware MERGE takedown + CDF-driven index
#       sync (merge-on-read purges) + signal-gated maintain()], then the
#       index is REOPENED in the q129 style and a FULL probe must equal
#       exact brute force over the surviving corpus, row for row.
#
#       Scale shape being certified: each day's index cost is one
#       delta-sized fold + one O(|victims|) equality-delete write (the
#       MOR purge receipt: zero data files rewritten), maintain()
#       materializes the delete files (so probes stop paying the anti
#       join) and bounds the snapshot log via retention. Then a
#       CATCH-UP: two more corpus windows land while the sync loop is
#       down and ONE batched sync (batch_windows=True) applies the
#       whole span as a net diff in ≤2 index commits — day-4 inserts
#       that day 5 deletes appear in NEITHER count — and its MOR
#       delete files stay live into the final probe, so the closing
#       full-probe-equals-brute-force recount also certifies the
#       merge-on-read read path. The final replay sync applies ZERO
#       windows (the epoch marker IS the durable cursor across all
#       five days and the maintenance rewrites between them). Day and
#       batch receipts ride in the hash-checked result as booleans +
#       exact totals.
# ---------------------------------------------------------------------------
def _q138_run(spark: SparkSession, sf_dir: str):
    from ..operators.ann_state import build_ann_state, open_ann_state
    from ._artifacts import pristine_copy

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )

    # pristine day-0 state (corpus v1 + built index), copied per
    # invocation — the three-day loop below mutates both heavily
    def _build() -> list[str]:
        corpus_root = scratch_dir(prefix="q138_corpus_")
        cent = scratch_dir(prefix="q138_cent_")
        assign = scratch_dir(prefix="q138_assign_")
        t = SnapshotTable(spark, corpus_root)
        t.create_or_replace(emb.filter(F.col("vec_id") % 9 <= 3))    # v1
        build_ann_state(spark, t.read(1), cent, assign, n_cells=8)
        return [corpus_root, cent, assign]

    corpus_root, cent, assign = pristine_copy(spark, sf_dir, "q138", _build)
    corpus = SnapshotTable(spark, corpus_root)
    st = open_ann_state(spark, cent, assign)
    days = []
    totals = {"windows": 0, "folded": 0, "purged": 0}
    for day in (1, 2, 3):
        corpus.append(emb.filter(F.col("vec_id") % 9 == 3 + day))    # v2d
        corpus.merge(                                                # v2d+1
            corpus.read().filter(F.col("vec_id") % 17 == day).select(
                "vec_id", F.lit(True).alias("_d")
            ),
            on=["vec_id"],
            clause=MergeClause(
                matched_delete_condition="s._d",
                insert_when_not_matched=False,
            ),
        )
        r = st.sync_from_cdf(
            corpus, ["vec_id"], query_id="q138",
            from_version=1 if day == 1 else None,
            delete_mode="merge-on-read",
        )
        for k in totals:
            totals[k] += r[k]
        a = st.assignments
        # the day's purge landed as an equality-delete file (zero data
        # files rewritten — the O(|victims|) write shape)...
        snap = a._read_snapshot(a.current_version())
        mor_live = bool(snap.get("delete_files")) and (
            int(snap["summary"].get("rewritten_files", -1)) == 0
        )
        st.maintain(keep_last_snapshots=4)
        # ...and maintain materialized it (delete-free snapshot), so
        # the serving probes pay no anti join
        materialized = not a._read_snapshot(a.current_version()).get(
            "delete_files"
        )
        days.append({"mor_live": mor_live, "materialized": materialized})
    # catch-up: two more corpus windows (an append day and a takedown
    # day) land while the sync loop is DOWN, then ONE batched sync
    # applies the whole span as a net diff (sync_from_cdf
    # batch_windows=True) — at most one delete + one fold commit for
    # any number of pending source windows, marker = span end. The
    # batch's MOR delete files stay LIVE into the final probe below,
    # so the closing full-probe-equals-brute-force recount also
    # certifies the merge-on-read read path end-to-end.
    corpus.append(emb.filter(F.col("vec_id") % 9 == 7))              # v8
    corpus.merge(                                                    # v9
        corpus.read().filter(F.col("vec_id") % 17 == 4).select(
            "vec_id", F.lit(True).alias("_d")
        ),
        on=["vec_id"],
        clause=MergeClause(
            matched_delete_condition="s._d",
            insert_when_not_matched=False,
        ),
    )
    v_before = st.assignments.current_version()
    batch = st.sync_from_cdf(
        corpus, ["vec_id"], query_id="q138",
        delete_mode="merge-on-read", batch_windows=True,
    )
    batch["commits_le2"] = bool(
        st.assignments.current_version() - v_before <= 2
        and batch.get("commits", 99) <= 2
    )
    replay = st.sync_from_cdf(
        corpus, ["vec_id"], query_id="q138", delete_mode="merge-on-read"
    )
    reopened = open_ann_state(spark, cent, assign)
    # retention budget 4 + the batch's ≤2 post-maintain commits
    bounded = len(st.assignments._snapshots()) <= 7
    return corpus, reopened, days, totals, batch, replay, bounded


_Q138_CACHE: dict = {}


def _q138_cached(spark: SparkSession, sf_dir: str):
    key = session_cache_key(spark, sf_dir)
    if key not in _Q138_CACHE:
        _Q138_CACHE[key] = _q138_run(spark, sf_dir)
    return _Q138_CACHE[key]


def _q138_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _q138_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-only variant: ONE full probe through the reopened index
    after three days of lifecycle — the standing serve path."""
    _, reopened, _, _, _, _, _ = _q138_cached(spark, sf_dir)
    return reopened.topk(
        _q138_queries(spark, sf_dir), k=5, nprobe=reopened.n_cells
    ).groupBy("query_id").agg(F.count(F.lit(1)).alias("k_returned"))


@register(
    "q138_lifecycle_dayloop",
    covers=(
        "similarity-ivf similarity-state change-data-feed takedown "
        "delete-propagation maintenance table-layer S5 S7 M5-shape "
        "M8 M9 A2"
    ),
    bare=_q138_bare,
    oracle="""
SELECT vec_id AS query_id,
       CAST(5 AS BIGINT) AS k_returned,
       TRUE AS recall_ok,
       TRUE AS no_deleted_ok,
       CAST(6 AS BIGINT) AS windows_applied,
       CAST(0 AS BIGINT) AS replay_windows,
       (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        WHERE vec_id % 9 IN (4, 5, 6)) AS folded,
       (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        WHERE (vec_id % 17 = 1 AND vec_id % 9 <= 4)
           OR (vec_id % 17 = 2 AND vec_id % 9 <= 5)
           OR (vec_id % 17 = 3 AND vec_id % 9 <= 6)) AS purged,
       CAST(2 AS BIGINT) AS batch_windows_applied,
       -- the batch is a NET diff: day-4 inserts that day 5 deletes
       -- (vec_id%9=7 AND vec_id%17=4) appear in NEITHER count
       (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        WHERE vec_id % 9 = 7 AND vec_id % 17 <> 4) AS batch_folded,
       (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        WHERE vec_id % 17 = 4 AND vec_id % 9 <= 6) AS batch_purged,
       TRUE AS batch_commits_le2,
       TRUE AS mor_purges_ok,
       TRUE AS maintain_materialized_ok,
       TRUE AS snapshots_bounded
FROM embeddings WHERE vec_id < 10
""",
)
def q138_lifecycle_dayloop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk

    corpus, reopened, days, totals, batch, replay, bounded = _q138_run(
        spark, sf_dir
    )
    _Q138_CACHE[session_cache_key(spark, sf_dir)] = (
        corpus, reopened, days, totals, batch, replay, bounded,
    )
    queries = _q138_queries(spark, sf_dir)
    final = corpus.read().select("vec_id", "embedding")
    # FULL probe (nprobe = n_cells): after three days of folds, MOR
    # purges, materializations, retention expiry and possible
    # retrain/splits, the reopened index's contents must equal the
    # surviving corpus EXACTLY — so the full probe equals brute force
    # row for row (the sharper deterministic contract; approximation
    # quality at partial nprobe is q38/q129/q137's certification)
    approx = reopened.topk(
        queries, k=5, nprobe=reopened.n_cells
    ).localCheckpoint(eager=False)
    exact = cosine_topk(final, queries, k=5).select("query_id", "vec_id")
    matches = (
        approx.join(exact, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    no_deleted = bool(
        approx.join(final.select("vec_id"), "vec_id", "left_anti").isEmpty()
    )
    return (
        approx.groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k_returned"))
        .join(matches, "query_id", "left")
        .select(
            "query_id",
            "k_returned",
            (F.coalesce(F.col("_m"), F.lit(0)) == 5).alias("recall_ok"),
            F.lit(no_deleted).alias("no_deleted_ok"),
            F.lit(totals["windows"]).cast("bigint").alias("windows_applied"),
            F.lit(replay["windows"]).cast("bigint").alias("replay_windows"),
            F.lit(totals["folded"]).cast("bigint").alias("folded"),
            F.lit(totals["purged"]).cast("bigint").alias("purged"),
            F.lit(batch["windows"]).cast("bigint").alias(
                "batch_windows_applied"
            ),
            F.lit(batch["folded"]).cast("bigint").alias("batch_folded"),
            F.lit(batch["purged"]).cast("bigint").alias("batch_purged"),
            F.lit(batch["commits_le2"]).alias("batch_commits_le2"),
            F.lit(all(d["mor_live"] for d in days)).alias("mor_purges_ok"),
            F.lit(all(d["materialized"] for d in days)).alias(
                "maintain_materialized_ok"
            ),
            F.lit(bool(bounded)).alias("snapshots_bounded"),
        )
    )


# ---------------------------------------------------------------------------
# q139: TAKEDOWN AUDIT + LEDGER RESUME — the compliance close-out over
#       q135's machinery: the ledger proves a propagation RAN
#       (process evidence), takedown_audit proves the artifacts are
#       CLEAN (content evidence), and together they close the failure
#       the in-memory receipt could not survive (r10 verdict #3). The
#       scenario is the real one: a takedown propagation dies after
#       the first artifact (here: only the dedup leg runs before the
#       "crash"); the audit then shows exactly which artifacts still
#       leak and how many rows; the resume re-propagation skips the
#       ledger-recorded leg without touching it and completes the
#       rest merge-on-read; the closing audit reads THROUGH the live
#       equality-delete files and reports all-zero. Audit cost is
#       scoped to the id set (bucket-pruned lookup fetch, column-pruned
#       id scans + one semi-join each), never a corpus recount.
# ---------------------------------------------------------------------------
def _q139_run(spark: SparkSession, sf_dir: str):
    from ..operators.changelog import table_changes
    from ..operators.takedown import (
        propagate_takedown,
        takedown_audit,
        takedown_ids,
    )

    corpus_t, state, lk, ast = _q135_artifacts(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_t.merge(                                                  # v2
        docs.filter(F.col("doc_id") % 17 == 5).select(
            "doc_id", F.lit(True).alias("_drop")
        ),
        on=["doc_id"],
        clause=MergeClause(
            matched_delete_condition="s._drop",
            insert_when_not_matched=False,
        ),
    )
    ids = takedown_ids(
        table_changes(corpus_t, ["doc_id"], 1, 2), "doc_id"
    ).localCheckpoint(eager=False)
    arts = dict(dedup_state=state, ann_state=ast, lookups=[lk])
    before = takedown_audit(ids, **arts)
    ledger = SnapshotTable(spark, scratch_dir("q139_ledger_"))
    # the "crash": only the first artifact's leg lands (+ ledger row)
    propagate_takedown(
        ids, dedup_state=state, mode="merge-on-read", ledger=ledger
    )
    mid = takedown_audit(ids, **arts)
    # the resume: full propagation against the same ledger — the dedup
    # leg must be skipped from the ledger, the rest completes MOR
    resumed = propagate_takedown(
        ids, mode="merge-on-read", ledger=ledger, **arts
    )
    after = takedown_audit(ids, **arts)
    return before, mid, after, resumed


_Q139_CACHE: dict = {}


def _q139_cached(spark: SparkSession, sf_dir: str):
    key = session_cache_key(spark, sf_dir)
    if key not in _Q139_CACHE:
        _Q139_CACHE[key] = _q139_run(spark, sf_dir)
    return _Q139_CACHE[key]


def _q139_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-only variant: ONE scoped audit over the already-clean
    artifacts — the recurring compliance check a pipeline schedules."""
    from ..operators.changelog import table_changes
    from ..operators.takedown import takedown_audit, takedown_ids

    before, mid, after, resumed = _q139_cached(spark, sf_dir)
    return spark.createDataFrame(
        sorted((k, int(v)) for k, v in after.items()),
        "artifact string, leaked bigint",
    )


@register(
    "q139_takedown_audit",
    covers=(
        "takedown delete-propagation dedup-incremental similarity-ivf "
        "table-layer change-data-feed M5-shape S5 S7 J5 A2"
    ),
    bare=_q139_bare,
    oracle="""
WITH d AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents
           WHERE doc_id % 17 = 5),
     e AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings
           WHERE vec_id % 17 = 5)
SELECT 'ann' AS artifact,
       e.n AS leaked_before,
       e.n AS leaked_mid,
       CAST(0 AS BIGINT) AS leaked_after,
       FALSE AS resume_skipped
FROM e
UNION ALL
SELECT 'dedup', 17 * d.n, CAST(0 AS BIGINT), CAST(0 AS BIGINT), TRUE
FROM d
UNION ALL
SELECT 'lookup_0', d.n, d.n, CAST(0 AS BIGINT), FALSE
FROM d
""",
)
def q139_takedown_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    before, mid, after, resumed = _q139_run(spark, sf_dir)
    _Q139_CACHE[session_cache_key(spark, sf_dir)] = (
        before, mid, after, resumed,
    )
    skipped = set(resumed["skipped"])
    rows = [
        (
            art,
            int(before[art]),
            int(mid[art]),
            int(after[art]),
            art in skipped,
        )
        for art in sorted(before)
    ]
    return spark.createDataFrame(
        rows,
        "artifact string, leaked_before bigint, leaked_mid bigint, "
        "leaked_after bigint, resume_skipped boolean",
    )
