from .registry import Query, REGISTRY, register, all_queries, all_oracles

# importing the corpus modules populates REGISTRY
from . import corpus_core  # noqa: E402,F401
from . import corpus_analytics  # noqa: E402,F401
from . import corpus_text  # noqa: E402,F401
from . import corpus_curation  # noqa: E402,F401
from . import corpus_multimodal  # noqa: E402,F401

__all__ = ["Query", "REGISTRY", "register", "all_queries", "all_oracles"]
