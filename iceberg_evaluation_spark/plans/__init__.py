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
#
# FRESHNESS SLA (r7 verdict #4): with a 50-slot window over this corpus,
# keeping the pin budget ≤ 10 makes "no driver verdict older than 3
# rounds" the steady-state fixed point — the auto-sort rotates the whole
# oldest cohort through each round. Exceeding the pin budget silently
# ages the tail; don't.
_R10_PINNED = [
    # flagship stays first (driver entry() smoke-checks it anyway)
    "q01_pricing_summary",
    # ann_state changes this round: pq codebook witness excludes
    # n_cells (split-then-reopen), topk_rescored left-join fallback,
    # AnnState.delete — q134 is the pq contract query, q38 the durable
    # float64 path (also rekeyed its session cache)
    "q134_pq_ann_rescore",
    "q38_ivf_cosine_topk",
    # sink_epoch_floors gained the supersede-race rescan — q127 is the
    # exactly-once sink contract query
    "q127_exactly_once_sink",
    # DedupState gained apply_deletes (and its artifacts the delete_keys
    # commit shape) — q104 is the standing-dedup contract query
    "q104_incremental_crossrun_dedup",
    # rewritten this round (de-vacuized result sets, r9 verdict #5)
    "q12_except_customers",
    "q15_not_exists_anti_join",
]
# 7 pins + 3 new (q135/q136/q137, never checked → auto-sorted in) = 10
# of 50; the remaining 40 slots pull the WHOLE 39-query r7 cohort
# forward (their verdicts age out of the ≤-3-rounds SLA after this
# round) plus the oldest r8 — the freshness SLA's steady state holds.
_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
_HISTORY = _registry.load_correctness_history(_REPO_ROOT)
_registry.PINNED_HEAD[:] = _R10_PINNED
_registry.PRIORITY[:] = _registry.derive_priority(
    list(_registry.REGISTRY), _HISTORY, _R10_PINNED
)

__all__ = ["Query", "REGISTRY", "register", "all_queries", "all_oracles"]
