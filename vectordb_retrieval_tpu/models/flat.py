"""Flat (exact) index: raw vectors on device + streamed MXU scan.

Replaces reference components #3/#9/#14 (SURVEY.md section 2): FAISS
``IndexFlat`` (exact_search.py:26-78), ``BruteForceIndexer``
(modular.py:121-133) and the NumPy ``LinearSearcher`` (modular.py:312-390).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vectordb_retrieval_tpu.models.base import (
    BaseIndexer,
    BaseSearcher,
    IndexArtifact,
    pad_batch,
    register_indexer,
    register_searcher,
)
from vectordb_retrieval_tpu.data.storage import corpus_to_device
from vectordb_retrieval_tpu.ops import distances as dops


@register_indexer("BruteForceIndexer")
class BruteForceIndexer(BaseIndexer):
    """Stores raw float32 vectors as a device-resident ``flat`` artifact.

    For ``cosine`` the database is L2-normalised once at build time and the
    artifact instructs searchers to normalise queries (parity with reference
    modular.py:121-133 + HNSWIndexer's ``normalize_queries`` metadata).
    """

    def build(self, vectors: np.ndarray, dimension: int) -> IndexArtifact:
        # memmap/BigStore corpora stream to device chunk-by-chunk
        # (data/storage.corpus_to_device) — host RSS stays O(chunk).
        dev = corpus_to_device(vectors)
        if self.metric == "cosine":
            dev = dops.normalize(dev)
        sqn = dops.sq_norms(dev) if self.metric == "l2" else None
        data = {"vectors": dev}
        if sqn is not None:
            data["sqnorms"] = sqn
        return IndexArtifact(
            kind="flat",
            data=jax.block_until_ready(data),
            metadata={
                "metric": self.metric,
                "dimension": int(dimension),
                "n_vectors": int(dev.shape[0]),
                "normalize_queries": self.metric == "cosine",
            },
        )


@register_indexer("ShardedFlatIndexer")
class ShardedFlatIndexer(BaseIndexer):
    """Flat index sharded row-wise over all available devices.

    The multi-chip scale-out surface (SURVEY.md section 2.3): database rows
    spread over the mesh ``db`` axis with NamedSharding; LinearSearcher then
    serves queries with the collective-merge kernel
    (parallel/sharded.sharded_exact_search). On a single device this
    degrades gracefully to the local scan.
    """

    def __init__(self, metric: str = "l2", n_devices: int = 0, **params):
        super().__init__(metric=metric, **params)
        self.n_devices = int(n_devices)  # 0 = all

    def build(self, vectors: np.ndarray, dimension: int) -> IndexArtifact:
        from vectordb_retrieval_tpu.parallel import make_mesh, shard_database

        x = np.ascontiguousarray(vectors, dtype=np.float32)
        if self.metric == "cosine":
            norms = np.linalg.norm(x, axis=1, keepdims=True)
            x = x / np.maximum(norms, 1e-12)
        n_dev = self.n_devices or len(jax.devices())
        mesh = make_mesh(n_dev)
        sharded, n = shard_database(x, mesh)
        art = IndexArtifact(
            kind="flat_sharded",
            data={"vectors": jax.block_until_ready(sharded)},
            metadata={
                "metric": self.metric,
                "dimension": int(dimension),
                "n_vectors": int(n),
                "normalize_queries": self.metric == "cosine",
                "n_devices": int(n_dev),
            },
        )
        art.mesh = mesh  # runtime-only (not persisted; re-built on load)
        return art


@register_searcher("LinearSearcher")
class LinearSearcher(BaseSearcher):
    """Exact scan over a ``flat`` artifact via the streamed MXU kernel,
    or over a ``flat_sharded`` artifact via the collective top-k merge."""

    def attach(self, artifact: IndexArtifact) -> None:
        if artifact.kind not in ("flat", "flat_sharded"):
            raise ValueError(
                f"LinearSearcher requires a 'flat' artifact, got {artifact.kind!r}"
            )
        if artifact.kind == "flat_sharded" and not hasattr(artifact, "mesh"):
            # loaded from disk: re-shard over the current devices
            from vectordb_retrieval_tpu.parallel import make_mesh, shard_database

            mesh = make_mesh(artifact.metadata.get("n_devices") or None)
            sharded, _ = shard_database(
                np.asarray(artifact.data["vectors"])[
                    : artifact.metadata["n_vectors"]
                ],
                mesh,
            )
            artifact.data["vectors"] = sharded
            artifact.mesh = mesh
        self.artifact = artifact

    def device_kernel(self, qd: "jnp.ndarray", k: int):
        """Traceable search kernel: device queries in, device results out.

        Composable under an outer jit (the experiment runner folds repeats
        and batches into one compiled program around this)."""
        meta = self.artifact.metadata
        metric = meta.get("metric", self.metric)
        if meta.get("normalize_queries"):
            qd = dops.normalize(qd)
        n = meta["n_vectors"]
        eff_k = min(k, n)
        score_metric = metric if metric != "cosine" else "ip"
        if self.artifact.kind == "flat_sharded":
            from vectordb_retrieval_tpu.parallel import sharded_exact_search

            return sharded_exact_search(
                qd,
                self.artifact.data["vectors"],
                n,
                eff_k,
                self.artifact.mesh,
                metric=score_metric,
            )
        # refine=True: fused overfetch + accurate rescoring so near-ties at
        # the k boundary resolve exactly (dops.rescore_l2 docstring)
        return dops.exact_search(
            qd,
            self.artifact.data["vectors"],
            eff_k,
            metric=score_metric,
            db_sqnorms=self.artifact.data.get("sqnorms"),
            refine=True,
        )

    def device_batch_search(self, queries: np.ndarray, k: int):
        """Dispatch without blocking: returns (dists_dev, ids_dev, n_rows)."""
        if self.artifact is None:
            raise RuntimeError("searcher not attached to an artifact")
        q = np.ascontiguousarray(queries, dtype=np.float32)
        padded, b = pad_batch(q)
        dists, ids = self.device_kernel(jnp.asarray(padded), k)
        return dists, ids, b

    def batch_search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        dists, ids, b = self.device_batch_search(queries, k)
        d = np.asarray(dists)[:b]
        i = np.asarray(ids)[:b]
        if d.shape[1] < k:  # pad to requested k (reference pads with inf/-1)
            pad = k - d.shape[1]
            d = np.pad(d, ((0, 0), (0, pad)), constant_values=np.inf)
            i = np.pad(i, ((0, 0), (0, pad)), constant_values=-1)
        return d, i
