from .registry import REGISTRY, QuerySpec, query

# Importing the plan modules populates REGISTRY.
from . import relational  # noqa: E402,F401
from . import analytic  # noqa: E402,F401
from . import north_star  # noqa: E402,F401
from . import workloads  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import pipeline_ops  # noqa: E402,F401
from . import lakehouse  # noqa: E402,F401
from . import corpus_ops  # noqa: E402,F401
from . import mining_ops  # noqa: E402,F401
from . import inference_ops  # noqa: E402,F401
from . import science_ops  # noqa: E402,F401
from . import behavior_ops  # noqa: E402,F401
from . import warehouse_ops  # noqa: E402,F401
from . import stats_ops  # noqa: E402,F401
from . import quant_ops  # noqa: E402,F401
from . import lexical_ops  # noqa: E402,F401

# Every CHECK_WINDOW base name must correspond to a registered query —
# otherwise a window slot is silently wasted and an unintended entry slides
# into the externally-checked block. Hard error, not an assert: the guard
# must survive python -O. Capability-gated entries (streaming_queries.
# GATED_ENTRIES, e.g. the TWS pair registers only where google.protobuf
# exists) are exempt when their capability is absent — pinning them into a
# window must not make the whole package unimportable on a host that
# legitimately cannot register them.
from .registry import CHECK_WINDOW, public_name  # noqa: E402

_gated = {
    name
    for name, cap in streaming_queries.GATED_ENTRIES.items()
    if not streaming_queries.CAPABILITIES[cap]
}
_missing = [
    b for b in CHECK_WINDOW if public_name(b) not in REGISTRY and b not in _gated
]
if _missing:
    raise ValueError(f"CHECK_WINDOW names without a registration: {_missing}")
del _missing, _gated

__all__ = [
    "REGISTRY", "QuerySpec", "query",
    "relational", "analytic", "north_star", "workloads", "streaming_queries",
    "pipeline_ops", "lakehouse", "corpus_ops", "mining_ops",
    "inference_ops", "science_ops", "behavior_ops", "warehouse_ops",
    "stats_ops", "quant_ops", "lexical_ops",
]
