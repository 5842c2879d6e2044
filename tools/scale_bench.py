#!/usr/bin/env python
"""Data-scale parallelism probe (r11 verdict ask #5): time the heavy
OPERATOR families on a gen_scale.py corpus at the configured core
count, noop-sink materialized, so c8-vs-c32 ratios measure the engine's
data-path scaling rather than the sf0.1 driver floor.

Raw operators, not registered queries: the registered corpus embeds
planted-data verification legs that a synthetic scaled corpus does not
satisfy. Each probe is the query family's production operator on the
family's real input table.

    SPARK_GRAFT_CPUS=32 python tools/scale_bench.py --sf /tmp/scale_sf1
    SPARK_GRAFT_CPUS=8  python tools/scale_bench.py --sf /tmp/scale_sf1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--only", default=None, help="comma-separated probe subset")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from iceberg_evaluation_spark.operators.bloom_dedup import (
        bloom_prefiltered_anti_join,
        build_bloom_words,
    )
    from iceberg_evaluation_spark.operators.dedup import (
        minhash_near_duplicates,
        ngram_jaccard_pairs,
        simhash_near_duplicates,
    )
    from iceberg_evaluation_spark.operators.scd2 import scd2_complex
    from iceberg_evaluation_spark.operators.similarity import srp_neardup_pairs
    from iceberg_evaluation_spark.operators.span_dedup import (
        duplicated_span_metrics,
    )
    from iceberg_evaluation_spark.session import get_spark
    from iceberg_evaluation_spark.sources import load_table
    from iceberg_evaluation_spark.tables.rollup import MaterializedRollup
    from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

    spark = get_spark(app_name="scale-bench")
    sf = args.sf
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    li = load_table(spark, sf, "lineitem")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    scratch = tempfile.mkdtemp(prefix="scale-bench-")

    def p_jaccard():
        noop(
            ngram_jaccard_pairs(
                docs, "doc_id", "text", threshold=0.5, max_shingle_df=1000
            )
        )

    def p_minhash():
        noop(minhash_near_duplicates(docs, "doc_id", "text", threshold=0.7))

    def p_simhash():
        noop(simhash_near_duplicates(docs, "doc_id", "text"))

    def p_span():
        noop(duplicated_span_metrics(docs, "text", "doc_id"))

    def p_srp():
        noop(srp_neardup_pairs(emb, threshold=0.8))

    def p_bloom():
        fp = docs.select(F.md5("text").alias("fp"), "doc_id")
        words = build_bloom_words(fp, "fp", 1 << 17, 4)
        probe = docs.select(
            F.md5(F.concat(F.col("text"), F.lit("x"))).alias("fp"), "doc_id"
        )
        noop(bloom_prefiltered_anti_join(probe, fp, "fp", words=words))

    def p_merge():
        t = SnapshotTable(spark, os.path.join(scratch, f"m{time.time_ns()}"))
        t.create_or_replace(li.limit(0))
        t.append(li)
        # delta = 1% of keys, re-priced — the daily-merge shape
        delta = (
            li.filter(F.col("l_orderkey") % 100 == 0)
            .withColumn("l_extendedprice", F.col("l_extendedprice") * 1.01)
            .groupBy("l_orderkey", "l_linenumber")
            .agg(
                *[
                    F.first(c).alias(c)
                    for c in li.columns
                    if c not in ("l_orderkey", "l_linenumber")
                ]
            )
        )
        from iceberg_evaluation_spark.tables.snapshot_table import MergeClause

        t.merge(
            delta,
            on=["l_orderkey", "l_linenumber"],
            clause=MergeClause(
                matched_update={"l_extendedprice": "s.l_extendedprice"}
            ),
        )

    def p_scd2():
        t = SnapshotTable(spark, os.path.join(scratch, f"s{time.time_ns()}"))
        base = (
            load_table(spark, sf, "orders")
            .select(
                F.col("o_orderkey").alias("id"),
                F.col("o_totalprice").alias("val"),
                F.col("o_orderdate").alias("extraction_timestamp"),
            )
        )
        scd2_complex(t, base, keys=["id"])
        upd = base.filter(F.col("id") % 50 == 0).withColumn(
            "extraction_timestamp",
            F.col("extraction_timestamp") + F.expr("interval 400 days"),
        )
        scd2_complex(t, upd, keys=["id"])

    def p_rollup():
        t = SnapshotTable(spark, os.path.join(scratch, f"r{time.time_ns()}"))
        t.create_or_replace(li.filter(F.col("l_orderkey") % 10 != 0))
        ru = MaterializedRollup(
            spark,
            os.path.join(scratch, f"ru{time.time_ns()}"),
            t,
            group_cols=["l_returnflag", "l_linestatus"],
            sum_cols=["l_quantity", "l_extendedprice"],
        )
        ru.rebuild()
        t.append(li.filter(F.col("l_orderkey") % 10 == 0))
        ru.refresh()

    probes = {
        "jaccard": p_jaccard,
        "minhash": p_minhash,
        "simhash": p_simhash,
        "span": p_span,
        "srp": p_srp,
        "bloom": p_bloom,
        "merge": p_merge,
        "scd2": p_scd2,
        "rollup": p_rollup,
    }
    if args.only:
        keep = set(args.only.split(","))
        probes = {k: v for k, v in probes.items() if k in keep}

    out = {}
    for name, fn in probes.items():
        runs = []
        for _ in range(args.iters):
            spark.sparkContext.setJobDescription(f"scale:{name}")
            t0 = time.monotonic()
            fn()
            runs.append(round(time.monotonic() - t0, 2))
        out[name] = runs
        print(f"{name}: {runs}", file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": sf,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "probes": out,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
