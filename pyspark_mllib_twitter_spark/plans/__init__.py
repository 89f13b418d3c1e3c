from .registry import REGISTRY, QuerySpec, query

# Importing the plan modules populates REGISTRY.
from . import relational  # noqa: E402,F401
from . import analytic  # noqa: E402,F401
from . import north_star  # noqa: E402,F401
from . import workloads  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import pipeline_ops  # noqa: E402,F401

__all__ = [
    "REGISTRY", "QuerySpec", "query",
    "relational", "analytic", "north_star", "workloads", "streaming_queries",
    "pipeline_ops",
]
