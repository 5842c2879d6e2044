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
_R8_PINNED = [
    # flagship stays first (driver entry() smoke-checks it anyway)
    "q01_pricing_summary",
    # changelog append-safe set + diff-path pruning changed (r8 ADVICE:
    # drop_column windows now take the endpoint diff)
    "q118_change_data_feed",
    # rollup group-scoped sketch rebuild is now snapshot-pinned to the
    # window endpoint (r8 ADVICE)
    "q119_rollup_cdf_maintenance",
    "q120_sketch_rollup",
    "q124_sketch_rollup_cdf",
    # IdempotentEpochSink query_id became required (r8 ADVICE); q127 is
    # its contract query, q115 its deepest consumer
    "q127_exactly_once_sink",
    "q115_gated_streaming_ingest",
]
# 7 pins + 2 new (q128/q129, never checked → auto-sorted in) + the 36
# r5-era verdicts = 45 of 50; the remaining slots pull the oldest r6
# verdicts forward. After this round no verdict predates r6.
_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
_HISTORY = _registry.load_correctness_history(_REPO_ROOT)
_registry.PINNED_HEAD[:] = _R8_PINNED
_registry.PRIORITY[:] = _registry.derive_priority(
    list(_registry.REGISTRY), _HISTORY, _R8_PINNED
)

__all__ = ["Query", "REGISTRY", "register", "all_queries", "all_oracles"]
