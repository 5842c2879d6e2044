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

# The driver's per-round CORRECTNESS check covers only the FIRST 50 entries of
# queries(). Round 1 checked registration order, leaving the entire
# curation/table layer (q40-q50), the late text-pipeline queries (q57-q60,
# q63, q69), IVF (q38) and multimodal (q45-q46) without a driver verdict.
# This list rotates those to the front — together with every query fixed or
# added since the last driver check (q64/q67 cast fixes; q36/q37/q54 new
# invariant oracles; q71-q86 new this round) — and pushes long-green trivia
# past position 50 (those were all hash_match=true in CORRECTNESS_r01 and
# stay covered by tests/test_oracle_parity.py locally).
_registry.PRIORITY[:] = [
    # flagship stays first (driver entry() smoke-checks it anyway)
    "q01_pricing_summary",
    # --- never driver-checked in round 1 (registration positions 50-67) ---
    "q40_scd2_rebuild",
    "q41_latest_event_per_user",
    "q42_composite_pk",
    "q43_update_synthesis",
    "q44_scd2_table_pipeline",
    "q47_time_travel",
    "q48_compaction",
    "q49_partitioned_sink",
    "q50_csv_source",
    "q45_multimodal_metadata",
    "q46_multimodal_features",
    "q57_embedding_quantize",
    "q58_document_chunks",
    "q59_chunk_dedup_stats",
    "q60_sequence_packing",
    "q63_dataset_split_mixture",
    "q69_neardup_clusters",
    "q38_ivf_cosine_topk",
    # --- hash-FAILed in round 1, fixed this round: need fresh verdicts ---
    "q64_case_scalar_subqueries",
    "q67_grouping_sets",
    # --- rows-only in round 1; invariant oracles added this round ---
    "q36_minhash_neardup",
    "q37_simhash_neardup",
    "q54_sketch_stats",
    # --- new this round ---
    "q71_yoy_cross_channel",
    "q72_blocked_embedding_neardup",
    "q73_cross_channel_intersect",
    "q74_rank_selfjoin_chain",
    "q75_streaming_dedup",
    "q76_streaming_window_totals",
    "q77_salted_skew_join",
    "q78_bucketed_colocated_join",
    "q79_streaming_ingest_dedup",
    "q80_semantic_dedup",
    "q81_contamination_check",
    "q82_pii_redaction",
    "q83_repetition_metrics",
    "q84_stream_stream_join",
    "q85_zorder_compaction",
    "q86_incremental_scan",
    "q87_rollback",
    "q88_cube_grouping",
    "q89_mixture_resample",
    "q90_leakage_safe_split",
    # --- representative coverage of the already-green surface (multi-op) ---
    "q52_flagship_composite",
    "q61_cumulative_crossover",
    "q53_asof_join",
    "q27_event_sessions",
    "q33_ngram_jaccard_pairs",
    "q35_embedding_neardup_pairs",
    "q34_ann_cosine_topk",
    "q32_exact_dedup",
    "q30_text_quality",
    "q31_language_id",
    "q39_rolling_fingerprint",
    "q55_exact_percentiles",
    "q62_json_props",
    "q65_native_pivot",
    "q66_unpivot_metrics",
    "q68_rank_family",
    "q08_rollup_grouping",
    "q05_rank_parts_in_brand",
    "q04_running_revenue",
]

__all__ = ["Query", "REGISTRY", "register", "all_queries", "all_oracles"]
