#!/usr/bin/env python
"""Regenerate COVERAGE.md's operator→queries table from the query registry.

Each registered query declares the SURVEY §2 operator ids (and
training-data-pipeline extension tags) it covers; this tool inverts that
into the judge-facing inventory table. The hand-written tail section
("## Surface not expressible as a driver query") is preserved verbatim.

Run after any registry change: python tools/coverage_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_evaluation_spark.plans import REGISTRY  # noqa: E402

# canonical row order + operator descriptions (SURVEY §2 ids first,
# then pipeline extension tags)
DESCRIPTIONS = [
    ("S1", "Parquet file scan"),
    ("S2", "Catalog/table-name scan (temp views + spark.sql)"),
    ("S4", "CSV source (explicit schema)"),
    ("json-orc-source", "JSON-lines + ORC sources (schema-first, fingerprinted round-trip)"),
    ("wds-source", "WebDataset tar-shard connector (custom Python Data Source, partition-per-shard)"),
    ("S5", "CTAS / create-or-replace sink (snapshot table)"),
    ("S6", "Partitioned parquet sink + partition-pruned scan-back"),
    ("S7", "Append sink"),
    ("S8", "DDL: view/database registration"),
    ("S9", "Snapshot history metadata scan"),
    ("S10", "Time-travel read (version / as-of-timestamp)"),
    ("P1", "Column projection"),
    ("P2", "Derived-column append"),
    ("P3", "Filter shapes (eq, BETWEEN, IN, LIKE, null, OR-of-ANDs)"),
    ("P4", "Row sampling (deterministic modulo variant)"),
    ("P5", "Literals / casts in projection"),
    ("J1", "Inner equi-join"),
    ("J2", "Explicit equi-join (MERGE source shape)"),
    ("J3", "Left outer join"),
    ("J4", "Full outer join"),
    ("J5", "Left semi join (EXISTS/IN)"),
    ("J6", "Left anti join (NOT EXISTS)"),
    ("J7", "Theta/range predicates in joins"),
    ("J8", "Lag/lead neighbors (idiomatic form of rank self-join)"),
    ("J9", "Cross-join of scalar aggregates"),
    ("J10", "Date-interval range join"),
    ("M1", "Bulk insert with SCD2 columns"),
    ("M2", "SCD2 simple (in-order batch)"),
    ("M3", "SCD2 complex (late/multiple updates)"),
    ("M4", "Latest-record dedup"),
    ("M5-shape", "Delete-aware conditional MERGE"),
    ("M6", "Update-set synthesis"),
    ("M7", "md5 composite key"),
    ("M8", "Bin-pack compaction"),
    ("M9", "Drop/purge + snapshot expiry + orphan GC (maintenance lifecycle)"),
    ("A1", "Hash group-by agg"),
    ("A2", "Global/scalar agg"),
    ("A3", "count(DISTINCT)"),
    ("A4", "Multi-column DISTINCT pre-agg"),
    ("A5", "ROLLUP"),
    ("A6", "GROUPING() indicator"),
    ("A7", "stddev_samp"),
    ("A8", "HAVING"),
    ("A9", "Conditional agg pivot"),
    ("A10", "Agg over UNION ALL of channels"),
    ("W1", "rank()/row_number() over partition"),
    ("W2", "Windowed agg, unbounded frame"),
    ("W3", "Running-total frame"),
    ("W4", "Running max"),
    ("W5", "lead()/lag() with default"),
    ("W6", "Window-on-aggregate composition"),
    ("O1", "Global multi-key ORDER BY"),
    ("O2", "LIMIT top-k"),
    ("O3", "Deterministic SCD2 audit ordering"),
    ("U1", "UNION ALL"),
    ("U2", "INTERSECT (distinct)"),
    ("U3", "EXCEPT (distinct)"),
    ("dedup-exact", "Exact dedup (hash-groupBy)"),
    ("dedup-minhash-lsh", "MinHash + banded LSH near-dup"),
    ("dedup-simhash", "SimHash (64-bit, band blocking)"),
    ("dedup-ngram-jaccard", "Exact n-gram Jaccard (inverted index, df-capped)"),
    ("dedup-embedding-cosine", "Embedding-cosine near-dup pairs"),
    ("dedup-srp-lsh", "Blocked embedding near-dup (deterministic SRP-LSH)"),
    ("dedup-semantic", "SemDeDup-style semantic dedup (SRP-blocked keep-first)"),
    ("dedup-substring", "Exact substring-span dedup (hashed k-token windows, Lee et al.)"),
    ("dedup-bloom", "Bloom-prefiltered incremental dedup vs reference corpus"),
    ("takedown", "Takedown driven end-to-end from a CDF delete window"),
    ("delete-propagation", "Corpus deletes purged from every standing artifact"),
    ("maintenance", "Signal-gated standing-state maintenance (retrain / split / MOR materialization / compaction / retention) inside a multi-day lifecycle loop"),
    ("training-shuffle", "Deterministic epoch shard shuffle (seeded global permutation)"),
    (
        "dedup-incremental",
        "Incremental cross-run near-dup dedup vs persisted fingerprint+band artifacts",
    ),
    ("contamination", "Benchmark-contamination check (word-8-gram overlap)"),
    ("pii-redaction", "PII scrub (email/phone/IP count + redact)"),
    ("repetition", "Repetition filters (Gopher top-gram / dup-trigram fracs)"),
    ("mixture", "Mixture design: weighted resampling + temperature-smoothed weights"),
    ("lm-score", "Unigram-LM perplexity scoring (broadcast top-V model)"),
    ("tfidf", "TF-IDF keyword extraction (corpus df + per-group top-k)"),
    ("dsir", "DSIR importance weights (hashed-bigram target/raw log-ratio)"),
    ("similarity-ann", "Brute-force cosine top-k (exact baseline)"),
    ("quantization", "int8 vector codec (q57 symmetric per-vector scheme; composed with the durable ANN index in q131)"),
    ("similarity-ivf", "IVF cosine top-k, k-means centroids (scale path)"),
    ("text-quality", "Quality scoring (length/punct/stopword)"),
    ("token-count", "Whitespace + BPE-ish token counting"),
    ("fingerprint", "Document fingerprints (md5 + rolling k-gram winnowing)"),
    ("lang-id", "Language-ID heuristic"),
    ("text-analysis", "Text analysis surface"),
    ("scalar-census", "Scalar function census (§2.9)"),
    ("multimodal-binary", "Binary payload + typed metadata"),
    ("multimodal-decode", "Decode/feature-extract (stubbed codec)"),
    ("mapInPandas", "Arrow-batched Python stage"),
    ("streaming-shape", "Stream-shaped event analytics (batch form)"),
    ("streaming", "Real Structured Streaming run (readStream → availableNow → sink)"),
    ("skew", "Skew-mitigated salted join (deterministic salt)"),
    ("bucketing", "Bucketed tables / exchange-free co-located join"),
    ("table-layer", "Snapshot table end-to-end"),
    ("incremental-view", "Incrementally-maintained materialized rollup (delta-cost refresh)"),
    ("change-data-feed", "Row-level changelog between snapshot versions (CDF: insert/delete/update pre+post images, file-diff pruned)"),
    ("cdc-consumer", "CDF replica sync (apply_changes: one delete-aware MERGE per window, cost |changes|)"),
    ("cdc-cursor", "Durable CDC consumer cursor (init_replica/sync_replica: restart-safe applied-version tracking, out-of-order windows refuse)"),
    ("similarity-state", "Durable IVF ANN index (persisted centroids + cell-partitioned inverted lists, append-without-retrain, staleness-gated retrain)"),
    ("classifier-inference", "Hashed linear classifier inference (fastText-shape quality gate, broadcast B-row model)"),
    ("schema-evolution", "Schema evolution end-to-end (add/backfill/rename-recipe/drop + time travel)"),
    ("hidden-partitioning", "Hidden-partition transforms (days/hours/months/years/bucket/truncate): source-column predicates prune through the layout, composed with manifest min/max stats"),
    ("metadata-scan", "$partitions metadata table (per-partition file/record/byte rollup from manifest-embedded stats, zero footer IO)"),
    ("M9-shape", "Key-delete with transform-pruned candidate scan (takedown cost bounded by victim buckets)"),
    ("training-curriculum", "Curriculum export (global score order as range shards, one wide shuffle)"),
]

PREAMBLE = """# COVERAGE — SURVEY.md §2 operator inventory → query corpus

Generated from the query registry (`iceberg_evaluation_spark/plans`): every
registered query declares which SURVEY §2 operators (and training-data-pipeline
extensions) it covers. ✓ = full DuckDB oracle in `oracle_sql()`; rows-only =
approximate/non-SQL-expressible by design, driver records the weaker check.

| §2 / extension | operator | queries |
|---|---|---|
"""

TAIL_MARKER = "## Surface not expressible as a driver query"


def main() -> None:
    by_tag: dict[str, list[str]] = {}
    for q in REGISTRY.values():
        label = q.name if q.oracle is not None else f"{q.name} (rows-only)"
        for tag in q.covers.split():
            by_tag.setdefault(tag, []).append(label)

    known = {t for t, _ in DESCRIPTIONS}
    unknown = set(by_tag) - known
    if unknown:
        raise SystemExit(f"covers tags missing a DESCRIPTIONS row: {sorted(unknown)}")

    lines = [PREAMBLE]
    for tag, desc in DESCRIPTIONS:
        qs = sorted(by_tag.get(tag, []))
        if not qs:
            continue
        lines.append(f"| {tag} | {desc} | {', '.join(qs)} |\n")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(path) as f:
        old = f.read()
    tail = old[old.index(TAIL_MARKER):] if TAIL_MARKER in old else ""
    with open(path, "w") as f:
        f.writelines(lines)
        f.write("\n")
        f.write(tail)
    print(f"COVERAGE.md regenerated: {len(lines) - 1} operator rows, {len(REGISTRY)} queries")


if __name__ == "__main__":
    main()
