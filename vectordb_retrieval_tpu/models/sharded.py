"""Sharded index family: multi-chip IVF (flat/PQ/SQ8) and graph indexers.

Model-layer wrappers over the ``parallel/`` scale-out kernels
(SURVEY.md section 2.3 breadth — the reference has no distributed runtime,
so these are at-parity-plus surfaces). Artifacts carry a runtime-only
``mesh`` attribute; loaded-from-disk artifacts are re-sharded over the
current devices on attach (same pattern as ``flat_sharded``,
models/flat.py).

Kinds: ``ivf_flat_sharded`` / ``ivf_pq_sharded`` / ``ivf_sq8_sharded`` /
``graph_sharded`` — all served by ``ANNSearcher`` with runtime ``nprobe``
/ ``efSearch`` overrides like their single-chip counterparts.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vectordb_retrieval_tpu.models.base import (
    BaseIndexer,
    IndexArtifact,
    register_indexer,
)


def reshard_artifact(artifact: IndexArtifact) -> None:
    """Give a loaded ``*_sharded`` artifact a mesh over the current devices
    and re-place its stacked ``[n_shards, ...]`` arrays along ``db``."""
    from vectordb_retrieval_tpu.parallel import make_mesh

    n_shards = int(artifact.metadata.get("n_shards", 0)) or None
    mesh = make_mesh(n_shards)
    for key, val in artifact.data.items():
        arr = np.asarray(val)
        artifact.data[key] = jax.device_put(
            jnp.asarray(arr),
            NamedSharding(mesh, P("db", *([None] * (arr.ndim - 1)))),
        )
    artifact.mesh = mesh


def _normalized(vectors: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(vectors, dtype=np.float32)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(norms, 1e-12)


@register_indexer("ShardedIVFIndexer")
class ShardedIVFIndexer(BaseIndexer):
    """One independent IVF partition per mesh device (flat/PQ/SQ8 payload).

    ``index_key`` uses the FAISS grammar subset ``IVF{n},Flat|PQ{m}|SQ8``;
    ``nlist`` is PER SHARD (each shard trains its own coarse quantizer and,
    for coded payloads, its own PQ codebooks / SQ ranges).
    """

    def __init__(
        self,
        metric: str = "l2",
        index_key: str = "IVF64,Flat",
        nprobe: int = 8,
        n_devices: int = 0,
        seed: int = 123,
        train_iters: int = 20,
        pq_rotations: int = 0,
        **params: Any,
    ):
        super().__init__(metric=metric, **params)
        self.index_key = index_key
        self.nprobe = int(nprobe)
        self.n_devices = int(n_devices)  # 0 = all
        self.seed = int(seed)
        self.train_iters = int(train_iters)
        # per-list residual rotations for the PQ payload (each shard
        # learns rotations against its OWN codebooks; see factory.py)
        self.pq_rotations = int(pq_rotations)

    def build(self, vectors: np.ndarray, dimension: int) -> IndexArtifact:
        from vectordb_retrieval_tpu.models.factory import parse_index_key
        from vectordb_retrieval_tpu.parallel import (
            build_sharded_ivf_coded,
            build_sharded_ivf_flat,
            make_mesh,
        )

        spec = parse_index_key(self.index_key)
        if spec["nlist"] is None or spec["opq"]:
            raise ValueError(
                "ShardedIVFIndexer needs IVF{n},Flat|PQ{m}|SQ8 "
                f"(got {self.index_key!r})"
            )
        x = (
            _normalized(vectors)
            if self.metric == "cosine"
            else np.ascontiguousarray(vectors, dtype=np.float32)
        )
        mesh = make_mesh(self.n_devices or None)
        if spec["coding"] == "flat":
            data, build_meta = build_sharded_ivf_flat(
                x, mesh, spec["nlist"],
                seed=self.seed, train_iters=self.train_iters,
            )
        else:
            data, build_meta = build_sharded_ivf_coded(
                x, mesh, spec["nlist"], coding=spec["coding"],
                m=spec["m"] or 8,
                seed=self.seed, train_iters=self.train_iters,
                pq_rotations=self.pq_rotations,
            )
        art = IndexArtifact(
            kind=f"ivf_{spec['coding']}_sharded",
            data=jax.block_until_ready(data),
            metadata={
                "metric": self.metric,
                "dimension": int(dimension),
                "n_vectors": int(x.shape[0]),
                "normalize_queries": self.metric == "cosine",
                "index_key": self.index_key,
                "nprobe": self.nprobe,
                **build_meta,
            },
        )
        art.mesh = mesh  # runtime-only; reshard_artifact restores on load
        return art


@register_indexer("ShardedGraphIndexer")
class ShardedGraphIndexer(BaseIndexer):
    """One beam-search graph per mesh device + collective merge."""

    def __init__(
        self,
        metric: str = "l2",
        M: int = 16,
        efConstruction: int = 200,
        efSearch: int = 100,
        n_devices: int = 0,
        seed: int = 42,
        mode: str = "auto",  # auto | node | block (models/graph semantics)
        block_size: int = 128,
        **params: Any,
    ):
        super().__init__(metric=metric, **params)
        self.M = int(M)
        self.efConstruction = int(efConstruction)
        self.efSearch = int(efSearch)
        self.n_devices = int(n_devices)
        self.seed = int(seed)
        if mode not in ("auto", "node", "block"):
            raise ValueError("mode must be 'auto', 'node' or 'block'")
        self.mode = mode
        self.block_size = int(block_size)

    def build(self, vectors: np.ndarray, dimension: int) -> IndexArtifact:
        from vectordb_retrieval_tpu.models.graph import _BLOCK_AUTO_THRESHOLD
        from vectordb_retrieval_tpu.parallel import (
            build_sharded_block_graph,
            build_sharded_graph,
            make_mesh,
        )

        x = (
            _normalized(vectors)
            if self.metric == "cosine"
            else np.ascontiguousarray(vectors, dtype=np.float32)
        )
        mesh = make_mesh(self.n_devices or None)
        per = -(-x.shape[0] // mesh.shape["db"])
        use_block = self.mode == "block" or (
            self.mode == "auto" and per > _BLOCK_AUTO_THRESHOLD
        )
        if use_block:
            data, build_meta = build_sharded_block_graph(
                x, mesh, M=self.M, block_size=self.block_size,
                seed=self.seed,
            )
        else:
            data, build_meta = build_sharded_graph(
                x, mesh, M=self.M, seed=self.seed
            )
        art = IndexArtifact(
            kind="graph_sharded",
            data=jax.block_until_ready(data),
            metadata={
                "metric": self.metric,
                "dimension": int(dimension),
                "n_vectors": int(x.shape[0]),
                "normalize_queries": self.metric == "cosine",
                "M": self.M,
                "efConstruction": self.efConstruction,
                "efSearch": self.efSearch,
                **build_meta,
            },
        )
        art.mesh = mesh
        return art
