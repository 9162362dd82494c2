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
from vectordb_retrieval_tpu.ops import distances as dops


@register_indexer("BruteForceIndexer")
class BruteForceIndexer(BaseIndexer):
    """Stores raw float32 vectors as a device-resident ``flat`` artifact.

    For ``cosine`` the database is L2-normalised once at build time and the
    artifact instructs searchers to normalise queries (parity with reference
    modular.py:121-133 + HNSWIndexer's ``normalize_queries`` metadata).
    """

    def build(self, vectors: np.ndarray, dimension: int) -> IndexArtifact:
        x = np.ascontiguousarray(vectors, dtype=np.float32)
        dev = jax.device_put(jnp.asarray(x))
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
                "n_vectors": int(x.shape[0]),
                "normalize_queries": self.metric == "cosine",
            },
        )


@register_searcher("LinearSearcher")
class LinearSearcher(BaseSearcher):
    """Exact scan over a ``flat`` artifact via the streamed MXU kernel."""

    def attach(self, artifact: IndexArtifact) -> None:
        if artifact.kind != "flat":
            raise ValueError(
                f"LinearSearcher requires a 'flat' artifact, got {artifact.kind!r}"
            )
        self.artifact = artifact

    def device_batch_search(self, queries: np.ndarray, k: int):
        """Dispatch without blocking: returns (dists_dev, ids_dev, n_rows).

        Lets the experiment loop pipeline batches (async dispatch) and block
        once — essential when per-call device latency is high.
        """
        if self.artifact is None:
            raise RuntimeError("searcher not attached to an artifact")
        meta = self.artifact.metadata
        metric = meta.get("metric", self.metric)
        q = np.ascontiguousarray(queries, dtype=np.float32)
        padded, b = pad_batch(q)
        qd = jnp.asarray(padded)
        if meta.get("normalize_queries"):
            qd = dops.normalize(qd)
        n = meta["n_vectors"]
        eff_k = min(k, n)
        score_metric = metric if metric != "cosine" else "ip"
        # refine=True: fused overfetch + accurate rescoring so near-ties at
        # the k boundary resolve exactly (dops.rescore_l2 docstring)
        dists, ids = dops.exact_search(
            qd,
            self.artifact.data["vectors"],
            eff_k,
            metric=score_metric,
            db_sqnorms=self.artifact.data.get("sqnorms"),
            refine=True,
        )
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
