"""ApproximateSearch: factory-grammar ANN algorithm.

Parity with reference src/algorithms/approximate_search.py:6-87 (the generic
``index_factory`` wrapper with runtime ``nprobe``), as a composite over
:class:`FactoryIndexer` + :class:`ANNSearcher`.
"""

from __future__ import annotations

from typing import Any

from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm


class ApproximateSearch(CompositeAlgorithm):
    def __init__(
        self,
        dimension: int,
        metric: str = "l2",
        index_type: str = "IVF100,Flat",
        nprobe: int = 10,
        list_dtype: str = None,
        exact_rescore: bool = None,
        **params: Any,
    ):
        indexer = {
            "type": "FactoryIndexer",
            "index_key": index_type,
            "nprobe": nprobe,
        }
        if list_dtype is not None:
            indexer["list_dtype"] = list_dtype
        if exact_rescore is not None:
            indexer["exact_rescore"] = exact_rescore
        super().__init__(
            dimension=dimension,
            metric=metric,
            indexer=indexer,
            searcher={"type": "ANNSearcher", "nprobe": nprobe},
            name="ApproximateSearch",
            **params,
        )
