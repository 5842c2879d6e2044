#!/usr/bin/env python
"""End-to-end training-data pipeline over the documents corpus:

    quality filter → repetition filter → LM-perplexity filter →
    PII scrub → exact dedup → substring-span dedup →
    contamination filter → chunk → near-dup chunk stats →
    sequence packing → train/val/test split + temperature mixture +
    stratified eval sample (+ semantic dedup on the embeddings table)

    python examples/training_data_pipeline.py [SF_DIR]

Every stage is the same operator the oracle-checked corpus queries use;
this script shows how they compose into one lazy plan per stage output.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.contamination import contamination_check
from iceberg_evaluation_spark.operators.dedup import exact_dedup
from iceberg_evaluation_spark.operators.similarity import semantic_dedup
from iceberg_evaluation_spark.operators.text_ops import (
    pii_scrub,
    repetition_metrics,
    text_quality,
)
from iceberg_evaluation_spark.session import get_spark
from iceberg_evaluation_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="training-data-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 0. incremental-ingest gate: a simulated new batch (one third of the
    # corpus + replayed copies) is deduped AGAINST the already-ingested
    # corpus via the Bloom-prefiltered anti-join before anything else runs
    from iceberg_evaluation_spark.functions.text import fingerprint_md5
    from iceberg_evaluation_spark.operators.bloom_dedup import (
        bloom_prefiltered_anti_join,
    )

    fp = docs.select("doc_id", fingerprint_md5("text").alias("fingerprint"))
    batch = fp.filter(F.col("doc_id") % 3 == 0)
    corpus_fp = fp.filter(F.col("doc_id") % 3 != 0).select("fingerprint")
    n_new = bloom_prefiltered_anti_join(batch, corpus_fp, "fingerprint").count()

    # 1. quality gate: keep docs scoring >= 0.5 on the heuristic panel
    quality = text_quality(docs)
    kept_ids = quality.filter(F.col("quality_score") >= 0.5).select("doc_id")
    docs_q = docs.join(kept_ids, "doc_id", "left_semi")
    n1 = docs_q.count()

    # 1b. repetition gate: drop Gopher-style repetitious documents
    rep_ok = repetition_metrics(docs_q).filter(~F.col("repetitive")).select("doc_id")
    docs_q = docs_q.join(rep_ok, "doc_id", "left_semi")
    n1b = docs_q.count()

    # 1c. LM-perplexity gate: drop the worst-scoring tail (top-256
    # unigram model fit on the surviving docs, broadcast to the scorer)
    from iceberg_evaluation_spark.operators.lm import unigram_lm_score

    lm_ok = (
        unigram_lm_score(docs_q).filter(F.col("nll_bits") <= 12.0).select("doc_id")
    )
    docs_q = docs_q.join(lm_ok, "doc_id", "left_semi")
    n1c = docs_q.count()

    # 1d. PII audit (this corpus is synthetic-clean; a production run
    # would substitute the redacted text for flagged docs)
    n_pii = pii_scrub(docs_q).filter(F.col("pii_found")).count()

    # 2. exact dedup: one survivor per normalized-text group
    survivors = exact_dedup(docs_q, "text", "doc_id").select("doc_id")
    docs_d = docs_q.join(survivors, "doc_id", "left_semi")
    n2 = docs_d.count()

    # 2a. substring-span audit: how much of the surviving corpus is
    # covered by verbatim cross-document >= 8-token spans
    from iceberg_evaluation_spark.operators.span_dedup import duplicated_span_metrics

    span_cov = duplicated_span_metrics(docs_d).agg(
        F.round(F.avg("dup_ratio"), 4).alias("mean_span_dup")
    ).collect()[0]["mean_span_dup"]

    # 2b. contamination gate: drop training docs sharing any word-8-gram
    # with the held-out eval split (doc_id % 10 == 0)
    ev = docs_d.filter(F.col("doc_id") % 10 == 0)
    tr = docs_d.filter(F.col("doc_id") % 10 != 0)
    clean = (
        contamination_check(tr, ev, n=8)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    n2b = tr.join(clean, "doc_id", "left_semi").count()

    # 2c. semantic dedup over the embeddings table (SRP-blocked keep-first)
    emb = load_table(spark, sf_dir, "embeddings")
    n_emb_kept = semantic_dedup(emb, threshold=0.95).filter("kept").count()

    # 3-5. chunk → dedup stats → pack → split (registry operators run on
    # the full table; in a production pipeline they'd take docs_d)
    from iceberg_evaluation_spark.plans.corpus_text import (
        q58_document_chunks,
        q59_chunk_dedup_stats,
        q60_sequence_packing,
        q63_dataset_split_mixture,
    )

    n_chunks = q58_document_chunks(spark, sf_dir).count()
    dup = q59_chunk_dedup_stats(spark, sf_dir).agg(
        F.round(F.avg("dup_ratio"), 4).alias("mean_dup_ratio")
    ).collect()[0]["mean_dup_ratio"]
    n_packs = q60_sequence_packing(spark, sf_dir).count()
    split = {
        (r["source"], r["split"]): r["n_docs"]
        for r in q63_dataset_split_mixture(spark, sf_dir).collect()
    }
    n_train = sum(v for (s, sp), v in split.items() if sp == "train")
    n_val = sum(v for (s, sp), v in split.items() if sp == "val")
    n_test = sum(v for (s, sp), v in split.items() if sp == "test")

    # 6. mixture design + eval sampling on the surviving corpus
    from iceberg_evaluation_spark.functions.text import token_count_ws
    from iceberg_evaluation_spark.operators.mixture import temperature_mixture_weights
    from iceberg_evaluation_spark.operators.sampling import stratified_exact_sample

    sizes = docs_d.groupBy("source").agg(
        F.sum(token_count_ws("text")).cast("bigint").alias("n_tokens")
    )
    weights = temperature_mixture_weights(sizes).orderBy(F.desc("boost"))
    top_boost = weights.select("source", "boost").first()
    n_eval_sample = stratified_exact_sample(
        docs_d.select("doc_id", "source", "lang"), ["source", "lang"],
        frac_permille=100, salt="heldout",
    ).count()

    # 7. corpus analysis + selection signals on the surviving corpus
    from iceberg_evaluation_spark.operators.dsir import dsir_importance_weights
    from iceberg_evaluation_spark.operators.keywords import tfidf_top_terms

    top_terms = {
        r["source"]: r["term"]
        for r in tfidf_top_terms(docs_d, "text", "doc_id", "source", top_k=1).collect()
    }
    dsir = dsir_importance_weights(
        docs_d.withColumn("__is_target", F.col("lang") == "en"),
        "text",
        "doc_id",
        "__is_target",
    )
    n_dsir_pos = dsir.filter(F.col("dsir_score") > 0).count()

    # 8. final assembly: deterministic epoch shuffle into shards, then
    # export as WebDataset tar shards via the custom connector — the
    # layout a multimodal trainer consumes; read back through the same
    # connector as the delivery check
    from iceberg_evaluation_spark.operators.shuffle_shards import (
        epoch_shard_shuffle,
    )
    from iceberg_evaluation_spark.plans._tmpdirs import scratch_dir
    from iceberg_evaluation_spark.sources.wds import (
        register_wds,
        write_wds_shards,
    )

    sharded = epoch_shard_shuffle(
        docs_d.select("doc_id", "text"), n_shards=4, epoch=0
    )
    wds_dir = scratch_dir(prefix="pipeline_wds_")
    write_wds_shards(
        sharded.select(
            "doc_id", F.encode("text", "UTF-8").alias("payload"), "shard"
        ).repartition(4, "shard"),
        wds_dir,
        "doc_id",
        "payload",
    )
    register_wds(spark)
    n_delivered = (
        spark.read.format("wds").option("path", wds_dir).load().count()
    )

    print(f"documents:            {n0}")
    print(f"novel docs in simulated ingest batch: {n_new}")
    print(f"after quality gate:   {n1}")
    print(f"after repetition gate:{n1b}")
    print(f"after LM-ppl gate:    {n1c}")
    print(f"docs flagged for PII: {n_pii}")
    print(f"after exact dedup:    {n2}")
    print(f"mean cross-doc span coverage: {span_cov}")
    print(f"train docs clean of eval 8-grams: {n2b}")
    print(f"embeddings kept by semantic dedup: {n_emb_kept}/{emb.count()}")
    print(f"chunks (32/24):       {n_chunks}")
    print(f"mean chunk dup ratio: {dup}")
    print(f"packs (256 tokens):   {n_packs}")
    print(f"split train/val/test: {n_train}/{n_val}/{n_test}")
    print(f"most-boosted source:  {top_boost['source']} ({top_boost['boost']}x)")
    print(f"stratified eval sample (10%): {n_eval_sample}")
    print(f"top tf-idf term per source: {top_terms}")
    print(f"docs weighted toward target by DSIR: {n_dsir_pos}")
    print(f"delivered via WebDataset shards: {n_delivered}")

    spark.stop()


if __name__ == "__main__":
    main()
