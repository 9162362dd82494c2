"""CompositeAlgorithm: adapts an (indexer, searcher) pair to BaseAlgorithm.

Contract parity with reference src/algorithms/modular.py:554-622: the pair is
instantiated from the string-keyed registries via config dicts, and both
components' ``describe()`` output is folded into reported parameters.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from vectordb_retrieval_tpu.models.base import (
    BaseAlgorithm,
    INDEXER_REGISTRY,
    SEARCHER_REGISTRY,
)


def _instantiate(registry: Dict[str, Any], config: Dict[str, Any], role: str):
    if not isinstance(config, dict) or "type" not in config:
        raise ValueError(f"{role} config must be a dict with a 'type' key: {config!r}")
    cfg = dict(config)
    type_name = cfg.pop("type")
    if type_name not in registry:
        raise ValueError(
            f"unknown {role} type {type_name!r}; known: {sorted(registry)}"
        )
    return registry[type_name](**cfg)


class CompositeAlgorithm(BaseAlgorithm):
    """BaseAlgorithm facade over a registry-resolved indexer+searcher pair."""

    def __init__(
        self,
        dimension: int,
        indexer: Optional[Dict[str, Any]] = None,
        searcher: Optional[Dict[str, Any]] = None,
        metric: str = "l2",
        name: Optional[str] = None,
        **params: Any,
    ):
        super().__init__(dimension=dimension, metric=metric, **params)
        if indexer is None or searcher is None:
            raise ValueError(
                "CompositeAlgorithm requires both 'indexer' and 'searcher' configs"
            )
        # Components inherit the algorithm metric unless they pin their own.
        indexer = {"metric": metric, **indexer}
        searcher = {"metric": metric, **searcher}
        self.indexer = _instantiate(INDEXER_REGISTRY, indexer, "indexer")
        self.searcher = _instantiate(SEARCHER_REGISTRY, searcher, "searcher")
        if name:
            self.name = name
        self.artifact = None

    def build_index(self, vectors: np.ndarray) -> None:
        self.artifact = self.indexer.build(vectors, self.dimension)
        self.searcher.attach(self.artifact)
        self.is_built = True

    def batch_search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        if not self.is_built:
            raise RuntimeError("index not built")
        n = self.artifact.metadata.get("n_vectors", 0)
        self.record_operation(
            "ndis",
            self.searcher.estimated_ops_per_query(n) * int(queries.shape[0]),
        )
        return self.searcher.batch_search(queries, k)

    @property
    def supports_pipelined_search(self) -> bool:
        return hasattr(self.searcher, "device_batch_search")

    def device_kernel(self, q, k: int):
        """Traceable search kernel when the searcher provides one."""
        kernel = getattr(self.searcher, "device_kernel", None)
        if kernel is None:
            raise NotImplementedError
        return kernel(q, k)

    @property
    def has_device_kernel(self) -> bool:
        return hasattr(self.searcher, "device_kernel")

    def record_stream_ops(self, n_queries: int) -> None:
        """Analytic op accounting for kernel-fused query streams (the fused
        path bypasses batch_search, so the counter is applied here)."""
        n = self.artifact.metadata.get("n_vectors", 0) if self.artifact else 0
        self.record_operation(
            "ndis", self.searcher.estimated_ops_per_query(n) * int(n_queries)
        )

    def device_batch_search(self, queries: np.ndarray, k: int):
        """Non-blocking dispatch: ``(dists_dev, ids_dev, n_rows)``.

        Used by the experiment timing loop to pipeline query batches through
        the device without a host round-trip per batch.
        """
        if not self.is_built:
            raise RuntimeError("index not built")
        n = self.artifact.metadata.get("n_vectors", 0)
        self.record_operation(
            "ndis",
            self.searcher.estimated_ops_per_query(n) * int(queries.shape[0]),
        )
        return self.searcher.device_batch_search(queries, k)

    def get_parameters(self) -> Dict[str, Any]:
        p = super().get_parameters()
        p["indexer"] = self.indexer.describe()
        p["searcher"] = self.searcher.describe()
        return p

    # Persistence delegates to the indexer pair when supported (added per
    # family; flat artifacts serialise trivially as .npz — see persist.py).
    def save_index(self, path: str, context: Optional[Dict[str, Any]] = None) -> None:
        from vectordb_retrieval_tpu.models import persist

        if self.artifact is None:
            raise RuntimeError("nothing to save: index not built")
        persist.save_artifact(self.artifact, path, context or {})

    def load_index(self, path: str, context: Optional[Dict[str, Any]] = None) -> None:
        from vectordb_retrieval_tpu.models import persist

        self.artifact = persist.load_artifact(path, context or {})
        self.searcher.attach(self.artifact)
        self.is_built = True
