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
from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm  # noqa: E402
from vectordb_retrieval_tpu.models.exact import ExactSearch  # noqa: E402
from vectordb_retrieval_tpu.models.approximate import ApproximateSearch  # noqa: E402

ALGORITHM_REGISTRY: Dict[str, Type[BaseAlgorithm]] = {
    "exact": ExactSearch,
    "ExactSearch": ExactSearch,
    "approx": ApproximateSearch,
    "ApproximateSearch": ApproximateSearch,
    "composite": CompositeAlgorithm,
    "CompositeAlgorithm": CompositeAlgorithm,
    "modular": CompositeAlgorithm,
}


def _register_optional() -> None:
    """Populate registries from submodules added over successive rounds."""
    try:
        from vectordb_retrieval_tpu.models import lsh

        ALGORITHM_REGISTRY.setdefault("lsh", lsh.LSH)
        ALGORITHM_REGISTRY.setdefault("LSH", lsh.LSH)
    except ImportError:
        pass
    try:
        from vectordb_retrieval_tpu.models import graph  # noqa: F401

        ALGORITHM_REGISTRY.setdefault("hnsw", graph.HNSW)
        ALGORITHM_REGISTRY.setdefault("HNSW", graph.HNSW)
    except ImportError:
        pass
    try:
        from vectordb_retrieval_tpu.models.covertree import CoverTree

        ALGORITHM_REGISTRY.setdefault("covertree", CoverTree)
        ALGORITHM_REGISTRY.setdefault("CoverTree", CoverTree)
        ALGORITHM_REGISTRY.setdefault("CoverTreeV2_2", CoverTree)
    except ImportError:
        pass


def get_algorithm_instance(
    algorithm_type: str, dimension: int, **params: Any
) -> BaseAlgorithm:
    """Factory: name -> configured instance (reference __init__.py:37-47)."""
    try:
        _register_optional()
    except ImportError:
        pass
    if algorithm_type not in ALGORITHM_REGISTRY:
        raise ValueError(
            f"unknown algorithm type {algorithm_type!r}; "
            f"known: {sorted(ALGORITHM_REGISTRY)}"
        )
    cls = ALGORITHM_REGISTRY[algorithm_type]
    return cls(dimension=dimension, **params)
