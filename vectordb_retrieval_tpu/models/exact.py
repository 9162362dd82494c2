"""ExactSearch: brute-force exact k-NN algorithm (the ground-truth oracle).

Parity with reference src/algorithms/exact_search.py:6-78, built as a
flat-artifact composite over the device-resident MXU scan.
"""

from __future__ import annotations

from typing import Any

from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm


class ExactSearch(CompositeAlgorithm):
    def __init__(self, dimension: int, metric: str = "l2", **params: Any):
        super().__init__(
            dimension=dimension,
            metric=metric,
            indexer={"type": "BruteForceIndexer"},
            searcher={"type": "LinearSearcher"},
            name="ExactSearch",
            **params,
        )
