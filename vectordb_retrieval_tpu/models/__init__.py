"""Index families and the algorithm registry.

Registry parity with the reference's ``ALGORITHM_REGISTRY`` /
``get_algorithm_instance`` factory (reference: src/algorithms/__init__.py:25-47)
and the modular ``INDEXER_REGISTRY``/``SEARCHER_REGISTRY``
(reference: src/algorithms/modular.py:85-106).
"""

from typing import Any, Dict, Type

from vectordb_retrieval_tpu.models.base import (  # noqa: F401
    BaseAlgorithm,
    BaseIndexer,
    BaseSearcher,
    IndexArtifact,
    INDEXER_REGISTRY,
    SEARCHER_REGISTRY,
    register_indexer,
    register_searcher,
)

# Importing these modules populates the indexer/searcher registries.
from vectordb_retrieval_tpu.models import flat  # noqa: F401,E402
from vectordb_retrieval_tpu.models import factory  # noqa: F401,E402
from vectordb_retrieval_tpu.models import lsh as _lsh  # noqa: E402
from vectordb_retrieval_tpu.models import graph as _graph  # noqa: E402
from vectordb_retrieval_tpu.models import sharded as _sharded  # noqa: E402
from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm  # noqa: E402
from vectordb_retrieval_tpu.models.exact import ExactSearch  # noqa: E402
from vectordb_retrieval_tpu.models.approximate import ApproximateSearch  # noqa: E402
from vectordb_retrieval_tpu.models.covertree import CoverTree  # noqa: E402

ALGORITHM_REGISTRY: Dict[str, Type[BaseAlgorithm]] = {
    "exact": ExactSearch,
    "ExactSearch": ExactSearch,
    "approx": ApproximateSearch,
    "ApproximateSearch": ApproximateSearch,
    "composite": CompositeAlgorithm,
    "CompositeAlgorithm": CompositeAlgorithm,
    "modular": CompositeAlgorithm,
    "lsh": _lsh.LSH,
    "LSH": _lsh.LSH,
    "hnsw": _graph.HNSW,
    "HNSW": _graph.HNSW,
    "covertree": CoverTree,
    "CoverTree": CoverTree,
    "CoverTreeV2_2": CoverTree,
}


def get_algorithm_instance(
    algorithm_type: str, dimension: int, **params: Any
) -> BaseAlgorithm:
    """Factory: name -> configured instance (reference __init__.py:37-47)."""
    if algorithm_type not in ALGORITHM_REGISTRY:
        raise ValueError(
            f"unknown algorithm type {algorithm_type!r}; "
            f"known: {sorted(ALGORITHM_REGISTRY)}"
        )
    cls = ALGORITHM_REGISTRY[algorithm_type]
    return cls(dimension=dimension, **params)
