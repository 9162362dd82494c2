"""Graph (HNSW-class) index family wrappers.

Config parity with the reference's HNSW surfaces:
  * ``HNSWIndexer`` (reference modular.py:136-179): knobs ``M`` /
    ``efConstruction`` / ``efSearch`` map onto graph degree ``R = 2M``
    (HNSW level-0 convention), build quality (exact graph — efConstruction
    is accepted and recorded but the TPU build is already exact), and beam
    width;
  * ``HNSW`` algorithm (reference hnsw.py:6-141) with the cosine
    normalise-then-IP handling (hnsw.py:56-67).

The artifact kind is ``graph``; ``ANNSearcher``/``FaissSearcher`` serve it
with runtime ``efSearch`` override, matching how the reference pairs
``hnsw_l2`` indexers with ``faiss_l2`` searchers
(configs/benchmark_config.yaml:126-129).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vectordb_retrieval_tpu.models.base import (
    BaseIndexer,
    IndexArtifact,
    register_indexer,
)
from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm
from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.ops import graph as gops


@register_indexer("GraphIndexer")
@register_indexer("HNSWIndexer")
class GraphIndexer(BaseIndexer):
    def __init__(
        self,
        metric: str = "l2",
        M: int = 16,
        efConstruction: int = 200,
        efSearch: int = 100,
        n_entry: int = 0,
        seed: int = 42,
        **params: Any,
    ):
        super().__init__(metric=metric, **params)
        self.M = int(M)
        self.efConstruction = int(efConstruction)
        self.efSearch = int(efSearch)
        self.n_entry = int(n_entry)  # 0 = auto (scales with N)
        self.seed = int(seed)

    def build(self, vectors: np.ndarray, dimension: int) -> IndexArtifact:
        x = jnp.asarray(np.ascontiguousarray(vectors, dtype=np.float32))
        if self.metric == "cosine":
            x = dops.normalize(x)
        n = x.shape[0]
        degree = min(2 * self.M, max(n - 1, 1))
        adjacency = gops.build_knn_graph(x, degree)
        # coarse-quantizer entries replace HNSW's upper layers; scale ~N/64
        # so clustered corpora stay reachable (pick_entry_points docstring)
        n_entry = self.n_entry or min(2048, max(16, n // 64))
        entries = gops.pick_entry_points(x, min(n_entry, n), seed=self.seed)
        # NOTE: bf16 scoring copies were tried and reverted — TPU gathers of
        # sub-32-bit rows fall off a performance cliff (measured ~100x
        # slower beams); f32 rows + precomputed norms it is.
        return IndexArtifact(
            "graph",
            jax.block_until_ready(
                {
                    "vectors": x,
                    "sqnorms": dops.sq_norms(x),
                    "adjacency": adjacency,
                    "entry_ids": entries,
                }
            ),
            {
                "metric": self.metric,
                "dimension": int(dimension),
                "n_vectors": int(x.shape[0]),
                "normalize_queries": self.metric == "cosine",
                "M": self.M,
                "degree": int(degree),
                "efConstruction": self.efConstruction,
                "efSearch": self.efSearch,
            },
        )


def graph_artifact_search(
    artifact: IndexArtifact,
    q: jax.Array,
    k: int,
    metric: str,
    ef_search: int,
) -> Tuple[jax.Array, jax.Array]:
    meta = artifact.metadata
    n = meta["n_vectors"]
    # efSearch -> beam width: our flat beam needs ~1.25x HNSW's heap size
    # for the same recall (no hierarchy); calibrated on 20k random 64d
    # (beam 128 -> 0.938 recall vs FAISS efSearch=100 -> 0.916, BASELINE.md)
    ef = max(int(ef_search * 1.25), k, 16)
    ef = min(ef, n)
    # wide expansion + few iterations: per-iteration fixed costs (gathers)
    # dominate on TPU, so fewer/wider steps beat many narrow ones
    # (measured: E=48/it=5 -> 3.1k QPS @ 0.944 vs E=16/it=20 -> 1.9k @ 0.937)
    expand = min(48, ef)
    iters = max(4, -(-ef // expand) + 2)
    fetch_k = min(k + 8, ef)
    dists, ids = gops.graph_search(
        q,
        artifact.data["vectors"],
        artifact.data["adjacency"],
        artifact.data["entry_ids"],
        fetch_k,
        ef=ef,
        expand=expand,
        iters=iters,
        metric=metric,
        sqnorms=artifact.data.get("sqnorms"),
    )
    full = artifact.data.get("full_vectors")
    if full is not None and artifact.data["vectors"].dtype != jnp.float32:
        # exact rescoring of the bf16-scored candidates
        cd = dops.rescore(q, full, ids, "l2" if metric == "l2" else "ip")
        vals, sel = dops.top_k_smallest(cd, min(k, fetch_k))
        ids = jnp.take_along_axis(ids, sel, axis=1)
        ids = jnp.where(jnp.isfinite(vals), ids, -1)
        return vals, ids
    return dists[:, :k], ids[:, :k]


class HNSW(CompositeAlgorithm):
    """Standalone HNSW-class algorithm (reference hnsw.py:6-141)."""

    def __init__(
        self,
        dimension: int,
        metric: str = "l2",
        M: int = 16,
        efConstruction: int = 200,
        efSearch: int = 100,
        **params: Any,
    ):
        super().__init__(
            dimension=dimension,
            metric=metric,
            indexer={
                "type": "GraphIndexer",
                "M": M,
                "efConstruction": efConstruction,
                "efSearch": efSearch,
            },
            searcher={"type": "ANNSearcher", "efSearch": efSearch},
            name="HNSW",
            **params,
        )
