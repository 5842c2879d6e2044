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
    # and window batching; q44 rides the merge() discovery pre-prune
    # and the TIMESTAMP_MICROS table writes added in the second wave
    "q135_takedown_propagation",
    "q137_cdf_ann_sync",
    "q44_scd2_table_pipeline",
]
# 4 pins + 5 new (q138-q142, never checked → auto-sorted in) = 9 of
# 50; the remaining 41 slots pull the WHOLE 41-query r8 cohort forward
# (their verdicts age out of the ≤-3-rounds SLA after this round) —
# exactly full, so the r11 second wave dropped the q134/q38 pins
# (r10-verdicted, module untouched since) for the new table-layer
# queries and the merge-path anchor q44.
_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
_HISTORY = _registry.load_correctness_history(_REPO_ROOT)
_registry.PINNED_HEAD[:] = _R11_PINNED
_registry.PRIORITY[:] = _registry.derive_priority(
    list(_registry.REGISTRY), _HISTORY, _R11_PINNED
)

__all__ = ["Query", "REGISTRY", "register", "all_queries", "all_oracles"]
