from .registry import Query, REGISTRY, register, all_queries, all_oracles
from . import registry as _registry

# importing the corpus modules populates REGISTRY
from . import corpus_core  # noqa: E402,F401
from . import corpus_analytics  # noqa: E402,F401
from . import corpus_text  # noqa: E402,F401
from . import corpus_curation  # noqa: E402,F401
from . import corpus_multimodal  # noqa: E402,F401
from . import corpus_scale  # noqa: E402,F401
from . import corpus_quality  # noqa: E402,F401

# The driver's per-round CORRECTNESS check covers only the FIRST 50 entries
# of queries(). Round-4 window (r3 verdict "next round" #1): FRONT-LOAD the
# six queries that have never received a driver verdict (q98-q103 — round
# 3's window was exactly consumed rotating the stale round-1 set), then the
# eight queries ADDED this round (q104-q111: incremental text/embedding/
# streaming ingest, epoch shard shuffle, incremental rollup, streaming
# sessionize, JSON/ORC and WebDataset round-trips), then every query whose
# code path round 4 touched (q84/q75/q76/q79 streaming state-partition pin;
# q46 real-codec routing + feature schema; q69/q90 require_exact ghost
# guard; q44/q86 snapshot-table commit self-heal; q96/q97 selection
# sharding; q33/q36/q37 dedup.py signature change; q91/q92 multimodal
# module edits; q72/q80 srp_chunks refactor). The remaining slots backfill
# round-2-era verdicts, preferring the table/scale/multimodal queries whose
# scratch-dir allocation changed this round. Everything outside the window
# has a round-3 verdict at HEAD-equivalent code or is r2-green untouched,
# and ALL 109 are locally green in tests/test_oracle_parity.py at HEAD.
_registry.PRIORITY[:] = [
    # flagship stays first (driver entry() smoke-checks it anyway)
    "q01_pricing_summary",
    # --- never driver-checked (r3 verdict's #1 ask) ---
    "q98_bloom_incremental_dedup",
    "q99_tfidf_keywords",
    "q100_dsir_importance",
    "q101_stats_pruned_scan",
    "q102_merge_on_read_pipeline",
    "q103_partitioned_table_scan",
    # --- new this round ---
    "q104_incremental_crossrun_dedup",
    "q105_incremental_semantic_ingest",
    "q106_streaming_artifact_dedup",
    "q107_epoch_shard_shuffle",
    "q108_incremental_rollup",
    "q109_streaming_sessionize",
    "q110_source_format_roundtrips",
    "q111_wds_shard_roundtrip",
    # --- code paths changed in round 4 ---
    "q84_stream_stream_join",
    "q46_multimodal_features",
    "q75_streaming_dedup",
    "q76_streaming_window_totals",
    "q79_streaming_ingest_dedup",
    "q69_neardup_clusters",
    "q90_leakage_safe_split",
    "q44_scd2_table_pipeline",
    "q86_incremental_scan",
    "q97_budget_selection",
    "q96_stratified_sample",
    "q36_minhash_neardup",
    "q37_simhash_neardup",
    "q33_ngram_jaccard_pairs",
    "q91_bmp_decode",
    "q92_wav_decode",
    # --- round-2-era verdicts, refreshed (scratch-dir/table-layer first) ---
    "q47_time_travel",
    "q48_compaction",
    "q49_partitioned_sink",
    "q50_csv_source",
    "q85_zorder_compaction",
    "q87_rollback",
    "q40_scd2_rebuild",
    "q41_latest_event_per_user",
    "q42_composite_pk",
    "q43_update_synthesis",
    "q77_salted_skew_join",
    "q78_bucketed_colocated_join",
    "q45_multimodal_metadata",
    "q35_embedding_neardup_pairs",
    "q38_ivf_cosine_topk",
    "q53_asof_join",
    "q80_semantic_dedup",
    "q57_embedding_quantize",
    "q72_blocked_embedding_neardup",
]
# (q54_sketch_stats / q63_dataset_split_mixture / q81_contamination_check / q82_pii_redaction / q83_repetition_metrics /
# q88_cube_grouping / q89_mixture_resample rotated out to fit q105-q109 —
# r2-green, untouched, locally oracle-checked at HEAD.)

__all__ = ["Query", "REGISTRY", "register", "all_queries", "all_oracles"]
