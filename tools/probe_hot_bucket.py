#!/usr/bin/env python
"""Hot-bucket stress probe (r7 verdict #4): measure how the bucketed
lookup's partner-fetch cost degrades when an adversarial corpus piles
into ONE bucket, and what rebucket() (bucket evolution) restores.
Results table lives in BENCH_NOTES.md ("Hot-bucket probe").

Usage: python tools/probe_hot_bucket.py [--rows 200000]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_evaluation_spark.session import get_spark  # noqa: E402
from iceberg_evaluation_spark.tables.bucketed_lookup import (  # noqa: E402
    BucketedLookup,
)


def build_skewed(spark, rows, n_buckets, hot_bucket, hot_frac, root):
    """hot_frac of the corpus hashes into hot_bucket; the rest spreads."""
    n_hot = int(rows * hot_frac)
    hot_ids = (
        spark.range(1, rows * n_buckets * 4)
        .filter(F.pmod(F.xxhash64("id"), n_buckets) == hot_bucket)
        .limit(n_hot)
    )
    cold = spark.range(10_000_000, 10_000_000 + rows - n_hot)
    docs = (
        hot_ids.unionByName(cold)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("body text padding for doc "), F.col("id"))
            .alias("text"),
        )
    )
    lk = BucketedLookup.create(
        spark, docs, root, "doc_id", "text", n_buckets=n_buckets
    )
    return lk, [r["id"] for r in hot_ids.limit(5).collect()]


def fetch_cost(lk, spark, ids):
    ids_df = spark.createDataFrame([(i,) for i in ids[:1]], "doc_id bigint")
    files = lk.fetch_files(ids_df)
    t0 = time.time()
    n = lk.fetch(ids_df).count()
    wall = time.time() - t0
    return len(files), n, wall


def main():
    rows = 200_000
    argv = sys.argv[1:]
    if "--rows" in argv:
        rows = int(argv[argv.index("--rows") + 1])
    spark = get_spark(app_name="probe_hot_bucket")
    work = tempfile.mkdtemp(prefix="probe_hot_")

    # uniform control: same corpus size, no skew
    lk_u, probe_u = build_skewed(
        spark, rows, 64, 7, 1 / 64, os.path.join(work, "uniform")
    )
    fu, nu, wu = fetch_cost(lk_u, spark, probe_u)
    print(f"uniform64: fetch files={fu} rows={nu} wall={wu:.2f}s")

    # adversarial: half the corpus in one of 64 buckets
    lk_h, probe_h = build_skewed(
        spark, rows, 64, 7, 0.5, os.path.join(work, "hot")
    )
    fh, nh, wh = fetch_cost(lk_h, spark, probe_h)
    print(f"hot64(50%): fetch files={fh} rows={nh} wall={wh:.2f}s")
    sizes = lk_h.bucket_sizes()
    print(
        f"  hot bucket bytes={sizes[7]:,} "
        f"median bucket bytes={sorted(sizes.values())[len(sizes)//2]:,}"
    )

    # mitigation: bucket evolution 64 -> 1024
    t0 = time.time()
    lk_r = lk_h.rebucket(1024)
    rewall = time.time() - t0
    fr, nr, wr = fetch_cost(lk_r, spark, probe_h)
    print(
        f"rebucket1024: rewrite={rewall:.2f}s "
        f"fetch files={fr} rows={nr} wall={wr:.2f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
