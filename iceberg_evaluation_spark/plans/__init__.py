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
_R7_PINNED = [
    # flagship stays first (driver entry() smoke-checks it anyway)
    "q01_pricing_summary",
    # pointer-flip manifest re-verify + publish hardening touch every
    # commit path; re-verify the deepest multi-commit pipeline plus the
    # branch/tag queries whose code changed (r7 ADVICE fixes)
    "q44_scd2_table_pipeline",
    "q122_snapshot_tags",
    "q123_wap_branch_publish",
    # changelog/rollup CDF changes (append-window CDF, group-scoped
    # sketch maintenance) + q120's widened tolerance (r7)
    "q118_change_data_feed",
    "q119_rollup_cdf_maintenance",
    "q120_sketch_rollup",
    # candidate-pruned partner reads rewire the incremental/gated dedup
    # partner fetch (r7 verdict #3)
    "q104_incremental_crossrun_dedup",
    "q105_incremental_semantic_ingest",
    "q115_gated_streaming_ingest",
    "q117_gated_semantic_ingest",
]
# 11 pins + the r7 additions (never checked → auto-sorted next) + the
# 35 r3-era stale verdicts = ≤ 50: the whole backlog clears this round
# (r6 verdict #1 — the pin budget is the one manual discipline left).
_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
_HISTORY = _registry.load_correctness_history(_REPO_ROOT)
_registry.PRIORITY[:] = _registry.derive_priority(
    list(_registry.REGISTRY), _HISTORY, _R7_PINNED
)

__all__ = ["Query", "REGISTRY", "register", "all_queries", "all_oracles"]
