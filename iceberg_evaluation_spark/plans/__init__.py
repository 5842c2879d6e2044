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
_R9_PINNED = [
    # flagship stays first (driver entry() smoke-checks it anyway)
    "q01_pricing_summary",
    # CDF feed pads typed nulls now (r8 ADVICE); q118 is the feed
    # contract query, q128 its deepest consumer (also gained the
    # summary_extra-threaded cursor stamp path)
    "q118_change_data_feed",
    "q128_cdf_replica_sync",
    # ann_state overhaul: sync-token witness, log-derived counters,
    # int8 codec plumbing, split_cell — q129 is the durable-state
    # contract query; q38 was rebased onto the durable index
    "q129_durable_ann_state",
    "q38_ivf_cosine_topk",
    # epoch-marker floor (expire_snapshots carry-forward) rewired the
    # sink's and the index's replay scans — q127 is the sink contract
    # query; rollup refresh gained the expired-history refusal
    "q127_exactly_once_sink",
    "q119_rollup_cdf_maintenance",
]
# 7 pins + 5 new (q130-q134, never checked → auto-sorted in) = 12 of 50;
# the remaining 38 slots pull the oldest (r6-era, then r7) verdicts
# forward — the ≤-3-rounds freshness SLA's steady state.
_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
_HISTORY = _registry.load_correctness_history(_REPO_ROOT)
_registry.PINNED_HEAD[:] = _R9_PINNED
_registry.PRIORITY[:] = _registry.derive_priority(
    list(_registry.REGISTRY), _HISTORY, _R9_PINNED
)

__all__ = ["Query", "REGISTRY", "register", "all_queries", "all_oracles"]
