#!/usr/bin/env python
"""Ingest-loop scale probe (r6 verdict #7): replay N fixed-size deltas
through GatedIngestSession against a base corpus and a 10x replica, and
measure per-delta wall + partner-fetch file IO. The claim under test:
per-delta cost is DELTA-proportional, (near-)flat in corpus size — now
measured, not argued from plan shape. Results table lives in
BENCH_NOTES.md ("Gated ingest-loop scale probe").

Usage: python tools/probe_ingest_scale.py [--deltas 3] [--delta-rows 500]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_evaluation_spark.operators.classifier import (  # noqa: E402
    demo_weight_vector,
)
from iceberg_evaluation_spark.operators.incremental_dedup import (  # noqa: E402
    build_dedup_state,
)
from iceberg_evaluation_spark.operators.ingest import GatedIngestSession  # noqa: E402
from iceberg_evaluation_spark.session import get_spark  # noqa: E402
from iceberg_evaluation_spark.sources import load_table  # noqa: E402
from iceberg_evaluation_spark.tables.bucketed_lookup import BucketedLookup  # noqa: E402


def replicate(docs, times: int):
    """times x the corpus with shifted ids and per-replica text suffixes
    (keeps near-dup density constant instead of multiplying it)."""
    parts = [
        docs.select(
            (F.col("doc_id") + 10_000_000 * i).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica-{i}")).alias("text"),
        )
        for i in range(times)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mk_delta(docs, n_rows: int, wave: int):
    """Fixed-size delta: ~1/3 exact dups, ~1/3 whitespace near-dups,
    ~1/3 genuinely new rows (md5-scrambled text)."""
    third = n_rows // 3
    base = docs.orderBy("doc_id").limit(n_rows)
    shift = 50_000_000 + wave * 1_000_000
    return (
        base.limit(third).select(
            (F.col("doc_id") + shift).alias("doc_id"), "text"
        )
        .unionByName(
            base.limit(2 * third).offset(third).select(
                (F.col("doc_id") + shift + 100_000).alias("doc_id"),
                F.regexp_replace("text", " ", "  ").alias("text"),
            )
        )
        .unionByName(
            base.offset(2 * third).select(
                (F.col("doc_id") + shift + 200_000).alias("doc_id"),
                F.md5(
                    F.concat(F.col("text"), F.lit(f"wave{wave}"))
                ).alias("text"),
            )
        )
    )


def run_scale(spark, docs, label: str, n_deltas: int, delta_rows: int,
              n_buckets: int):
    work = tempfile.mkdtemp(prefix=f"probe_ingest_{label}_")
    docs = docs.localCheckpoint()
    n_corpus = docs.count()

    t0 = time.time()
    lookup = BucketedLookup.create(
        spark, docs, os.path.join(work, "corpus"), "doc_id", "text",
        n_buckets=n_buckets,
    )
    # index partitioning follows the sizing rule (BENCH_NOTES): a probe
    # delta's ~16·|delta| band keys touch EVERY partition at this scale,
    # so the default measures the unpartitioned index; pass
    # --index-partitions N to measure the partitioned trade-off
    ip = None
    if "--index-partitions" in sys.argv:
        ip = int(sys.argv[sys.argv.index("--index-partitions") + 1])
    state = build_dedup_state(
        spark, lookup.read(), "doc_id", "text",
        os.path.join(work, "fp"), os.path.join(work, "bands"),
        index_partitions=ip,
    )
    build_s = time.time() - t0
    session = GatedIngestSession(
        state, demo_weight_vector(spark, 1024), lookup,
        id_col="doc_id", text_col="text", num_buckets=1024,
        keep_threshold=0.0,  # gate wide open: the probe measures dedup IO
    )
    total_files = len(
        lookup.table._read_snapshot(lookup.table.current_version())["files"]
    )
    per_delta = []
    for wave in range(n_deltas):
        delta = mk_delta(docs, delta_rows, wave).localCheckpoint()
        t0 = time.time()
        out = session.process_delta(delta, append_new=True)
        counts = {
            r["status"]: r["n"]
            for r in out.groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        wall = time.time() - t0
        per_delta.append((wall, counts))
    return {
        "label": label,
        "corpus": n_corpus,
        "build_s": round(build_s, 2),
        "corpus_files": total_files,
        "per_delta": [
            (round(w, 2), c) for w, c in per_delta
        ],
    }


def main():
    n_deltas = 3
    delta_rows = 500
    argv = sys.argv[1:]
    if "--deltas" in argv:
        n_deltas = int(argv[argv.index("--deltas") + 1])
    if "--delta-rows" in argv:
        delta_rows = int(argv[argv.index("--delta-rows") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(app_name="probe_ingest_scale")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    for times, label, buckets in ((1, "1x", 16), (10, "10x", 64)):
        corpus = docs if times == 1 else replicate(docs, times)
        r = run_scale(spark, corpus, label, n_deltas, delta_rows, buckets)
        print(
            f"{r['label']}: corpus={r['corpus']} files={r['corpus_files']} "
            f"build={r['build_s']}s"
        )
        for i, (w, c) in enumerate(r["per_delta"]):
            print(f"  delta {i + 1} ({delta_rows} rows): {w}s  {c}")
    spark.stop()


if __name__ == "__main__":
    main()
