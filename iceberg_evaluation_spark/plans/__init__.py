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
_R11_PINNED = [
    # flagship stays first (driver entry() smoke-checks it anyway)
    "q01_pricing_summary",
    # the round's code paths: q135 runs the takedown merge-on-read
    # with a durable ledger + resume re-run; q137's sync_from_cdf
    # gained the marker-guarded per-window delete, delete_mode route,
    # and window batching. The second wave's table-layer changes
    # (TIMESTAMP_MICROS writes, manifest stats, merge discovery
    # pre-prune) get their driver verdicts through the six NEW queries
    # q138-q143, which auto-sort into the head as never-checked.
    "q135_takedown_propagation",
    "q137_cdf_ann_sync",
]
# 3 pins + 6 new (q138-q143, never checked → auto-sorted in) = 9 of
# 50; the remaining 41 slots pull the WHOLE 41-query r8 cohort forward
# (their verdicts age out of the ≤-3-rounds SLA after this round) —
# exactly full. The r11 second wave dropped the q134/q38/q44 pins
# (r10-verdicted; the merge path q44 rides is driver-checked through
# q143's discovery-prune receipts instead).
_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
_HISTORY = _registry.load_correctness_history(_REPO_ROOT)
_registry.PINNED_HEAD[:] = _R11_PINNED
_registry.PRIORITY[:] = _registry.derive_priority(
    list(_registry.REGISTRY), _HISTORY, _R11_PINNED
)

__all__ = ["Query", "REGISTRY", "register", "all_queries", "all_oracles"]
