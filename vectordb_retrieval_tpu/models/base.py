"""Core contracts: algorithm ABC, index artifact, indexer/searcher registries.

Parity surface (contracts only, TPU-native internals):
  * ``BaseAlgorithm``  -> reference src/algorithms/base_algorithm.py:5-123
  * ``IndexArtifact``  -> reference src/algorithms/modular.py:19-25
  * ``BaseIndexer`` / ``BaseSearcher`` + string-keyed registries
                       -> reference src/algorithms/modular.py:28-106

TPU-first differences from the reference:
  * ``IndexArtifact.data`` is a *pytree of device arrays* (plus static host
    metadata), so any artifact can be sharded with ``jax.sharding`` and fed
    to jit-compiled search functions directly.
  * Search implementations are pure jitted functions; the classes here are
    thin host-side wrappers handling numpy I/O, padding and compile caching.
  * Memory accounting reads actual device-buffer ``nbytes`` instead of the
    reference's introspection heuristics (experiment_runner.py:490-744).
"""

from __future__ import annotations

import time
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple, Type

import jax
import numpy as np


@dataclass
class IndexArtifact:
    """A built index: ``kind`` discriminates the payload schema.

    ``data`` holds device arrays (a dict pytree); ``metadata`` holds static,
    host-side facts (metric, dimension, counts, knobs) that searchers need.
    """

    kind: str
    data: Dict[str, Any]
    metadata: Dict[str, Any] = field(default_factory=dict)

    def device_nbytes(self) -> int:
        """Total bytes of device buffers in this artifact (honest HBM cost)."""
        total = 0
        for leaf in jax.tree_util.tree_leaves(self.data):
            if hasattr(leaf, "nbytes"):
                total += int(leaf.nbytes)
        return total


class BaseAlgorithm(ABC):
    """Common interface every retrieval algorithm implements.

    Contract parity with reference base_algorithm.py:30-120: ``build_index``,
    ``search``, ``batch_search``, operation counters, and optional
    ``save_index``/``load_index`` persistence hooks.
    """

    def __init__(self, dimension: int, metric: str = "l2", **params: Any):
        self.dimension = int(dimension)
        self.metric = metric
        self.params: Dict[str, Any] = dict(params)
        self.name = self.__class__.__name__
        self.is_built = False
        self._operations: Dict[str, int] = {}

    # -- build/search ---------------------------------------------------
    @abstractmethod
    def build_index(self, vectors: np.ndarray) -> None:
        """Build the index over ``vectors [N, d]`` (blocks until done)."""

    @abstractmethod
    def batch_search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return ``(distances [B, k], indices [B, k])``, ascending distance."""

    def search(self, query: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Single query convenience; defaults to a batch of one."""
        q = np.asarray(query, dtype=np.float32).reshape(1, -1)
        d, i = self.batch_search(q, k)
        return d[0], i[0]

    # -- operation counters (reference base_algorithm.py:91-96) ---------
    def record_operation(self, key: str, value: int = 1) -> None:
        self._operations[key] = self._operations.get(key, 0) + int(value)

    def get_operations(self) -> Dict[str, int]:
        return dict(self._operations)

    def reset_operations(self) -> None:
        self._operations = {}

    # -- persistence hooks (reference base_algorithm.py:98-120) ---------
    def save_index(self, path: str, context: Optional[Dict[str, Any]] = None) -> None:
        raise NotImplementedError(f"{self.name} does not support save_index")

    def load_index(self, path: str, context: Optional[Dict[str, Any]] = None) -> None:
        raise NotImplementedError(f"{self.name} does not support load_index")

    @property
    def supports_persistence(self) -> bool:
        return type(self).save_index is not BaseAlgorithm.save_index

    # -- reporting ------------------------------------------------------
    def get_parameters(self) -> Dict[str, Any]:
        return {"name": self.name, "metric": self.metric, **self.params}

    def index_memory_bytes(self) -> int:
        """Honest HBM footprint; subclasses expose their artifact."""
        art = getattr(self, "artifact", None)
        if isinstance(art, IndexArtifact):
            return art.device_nbytes()
        return 0


class BaseIndexer(ABC):
    """Builds an :class:`IndexArtifact` from raw vectors."""

    def __init__(self, metric: str = "l2", **params: Any):
        self.metric = metric
        self.params = dict(params)

    @abstractmethod
    def build(self, vectors: np.ndarray, dimension: int) -> IndexArtifact:
        ...

    def describe(self) -> Dict[str, Any]:
        return {"type": self.__class__.__name__, "metric": self.metric, **self.params}


class BaseSearcher(ABC):
    """Attaches to an artifact and serves batched queries."""

    def __init__(self, metric: str = "l2", **params: Any):
        self.metric = metric
        self.params = dict(params)
        self.artifact: Optional[IndexArtifact] = None

    @abstractmethod
    def attach(self, artifact: IndexArtifact) -> None:
        ...

    @abstractmethod
    def batch_search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        ...

    def search(self, query: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        d, i = self.batch_search(
            np.asarray(query, dtype=np.float32).reshape(1, -1), k
        )
        return d[0], i[0]

    def describe(self) -> Dict[str, Any]:
        return {"type": self.__class__.__name__, "metric": self.metric, **self.params}

    def estimated_ops_per_query(self, n_database: int) -> int:
        """Analytic distance-op estimate (reference metrics.py:240-262)."""
        return int(n_database)


INDEXER_REGISTRY: Dict[str, Type[BaseIndexer]] = {}
SEARCHER_REGISTRY: Dict[str, Type[BaseSearcher]] = {}


def register_indexer(name: str) -> Callable[[Type[BaseIndexer]], Type[BaseIndexer]]:
    def deco(cls: Type[BaseIndexer]) -> Type[BaseIndexer]:
        INDEXER_REGISTRY[name] = cls
        return cls

    return deco


def register_searcher(name: str) -> Callable[[Type[BaseSearcher]], Type[BaseSearcher]]:
    def deco(cls: Type[BaseSearcher]) -> Type[BaseSearcher]:
        SEARCHER_REGISTRY[name] = cls
        return cls

    return deco


def pad_batch(queries: np.ndarray, buckets: Tuple[int, ...] = ()) -> Tuple[np.ndarray, int]:
    """Pad a query batch up to a size bucket to bound jit recompilation.

    Returns the padded batch and the original row count. Buckets default to
    powers of two; real rows always come first so results slice cleanly.
    """
    b = queries.shape[0]
    target = 1
    while target < b:
        target *= 2
    for bucket in buckets:
        if bucket >= b:
            target = bucket
            break
    if target == b:
        return queries, b
    pad = np.zeros((target - b, queries.shape[1]), dtype=queries.dtype)
    return np.concatenate([queries, pad], axis=0), b


def timed_blocking(fn: Callable[[], Any]) -> Tuple[Any, float]:
    """Run ``fn``, materialise all device results, return (result, seconds).

    Honest timing under JAX async dispatch (SURVEY.md section 7 hard-part
    (e)): dispatch is not completion, and on some runtimes even
    ``block_until_ready`` returns before device work finishes — only host
    materialisation is trustworthy, so results are pulled with
    ``np.asarray`` inside the timer.
    """
    import numpy as _np

    start = time.perf_counter()
    out = fn()
    out = jax.tree_util.tree_map(
        lambda x: _np.asarray(x) if hasattr(x, "device") else x, out
    )
    return out, time.perf_counter() - start
