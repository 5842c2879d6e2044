import os as _os

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
# of queries(). Since round 6 the window DERIVES ITSELF from the committed
# CORRECTNESS_r*.json history (r5 verdict #2: the hand-edited r5 list went
# stale and q112-q114 missed their verdict): never-driver-checked queries
# sort first automatically, then oldest-latest-verdict first. Only the
# small PINNED head below — queries whose code paths THIS round touched —
# is maintained by hand each round.
_R6_PINNED = [
    # flagship stays first (driver entry() smoke-checks it anyway)
    "q01_pricing_summary",
    # snapshot-table VERSION-lock ownership-token hardening (r6)
    "q44_scd2_table_pipeline",
    "q86_incremental_scan",
    "q47_time_travel",
    "q48_compaction",
    # classifier weights validation + incremental-dedup state/drop-count
    # changes + wds tmp sweep + curriculum empty-input fix (r6)
    "q112_classifier_inference",
    "q114_curriculum_export",
    "q104_incremental_crossrun_dedup",
    "q105_incremental_semantic_ingest",
    "q106_streaming_artifact_dedup",
    "q111_wds_shard_roundtrip",
    # read_where's partition matcher generalized for spec evolution (r6)
    # — re-verify the standing pruning queries under the new matcher
    "q103_partitioned_table_scan",
    "q49_partitioned_sink",
    "q85_zorder_compaction",
    "q101_stats_pruned_scan",
    # rollup _partial/update gained sketch-column branches (r6)
    "q108_incremental_rollup",
]
# (q113/q115–q122, the other r6 additions, carry no driver verdict yet
# and therefore sort into the window automatically — that is the
# derive_priority contract, no hand edit needed.)
_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
_HISTORY = _registry.load_correctness_history(_REPO_ROOT)
_registry.PRIORITY[:] = _registry.derive_priority(
    list(_registry.REGISTRY), _HISTORY, _R6_PINNED
)

__all__ = ["Query", "REGISTRY", "register", "all_queries", "all_oracles"]
