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
        nbr_table: str = "auto",  # auto | on | off
        nbr_table_budget_mb: int = 2048,
        nbr_table_dtype: str = "auto",  # auto | bf16 | int8
        **params: Any,
    ):
        super().__init__(metric=metric, **params)
        self.M = int(M)
        self.efConstruction = int(efConstruction)
        self.efSearch = int(efSearch)
        self.n_entry = int(n_entry)  # 0 = auto (scales with N)
        self.seed = int(seed)
        self.nbr_table = str(nbr_table)
        self.nbr_table_budget_mb = int(nbr_table_budget_mb)
        self.nbr_table_dtype = str(nbr_table_dtype)

    def build(self, vectors: np.ndarray, dimension: int) -> IndexArtifact:
        x = jnp.asarray(np.ascontiguousarray(vectors, dtype=np.float32))
        if self.metric == "cosine":
            x = dops.normalize(x)
        n = x.shape[0]
        degree = min(2 * self.M, max(n - 1, 1))
        adjacency = gops.build_knn_graph(x, degree)
        # coarse-quantizer entries replace HNSW's upper layers; a dense
        # seed (~N/10, capped) lands the beam 1-2 hops from the answers so
        # 3-4 iterations suffice (scripts/exp_beam_table_tune.py)
        n_entry = self.n_entry or min(2048, max(16, n // 10))
        entries = gops.pick_entry_points(x, min(n_entry, n), seed=self.seed)
        data = {
            "vectors": x,
            "sqnorms": dops.sq_norms(x),
            "adjacency": adjacency,
            "entry_ids": entries,
        }
        # bf16 neighbour-vector table: turns the beam's scattered-row
        # vector gather into contiguous block rows (graph_search docstring).
        # Plain bf16 *row* gathers of the corpus were tried in round 1 and
        # reverted (sub-32-byte rows hit a gather cliff); table rows are
        # R*d elements, far past the cliff.
        bf16_mb = n * degree * int(dimension) * 2 / 1e6
        int8_mb = bf16_mb / 2
        dtype = self.nbr_table_dtype
        if dtype == "auto":
            # prefer bf16 (no quantisation in routing); drop to the int8
            # (SQ8-coded) table when only it fits the HBM budget — half
            # the gather bytes at a ~0 recall cost thanks to the exact
            # final rescore
            dtype = (
                "bf16" if bf16_mb <= self.nbr_table_budget_mb else "int8"
            )
        table_mb = bf16_mb if dtype == "bf16" else int8_mb
        use_table = self.nbr_table == "on" or (
            self.nbr_table == "auto" and table_mb <= self.nbr_table_budget_mb
        )
        if use_table:
            nbr_vecs, nbr_sqn, nbr_vmin, nbr_step = gops.build_neighbor_table(
                x, adjacency,
                dtype="int8" if dtype == "int8" else jnp.bfloat16,
            )
            data["nbr_vecs"] = nbr_vecs
            data["nbr_sqn"] = nbr_sqn
            if nbr_vmin is not None:
                data["nbr_vmin"] = nbr_vmin
                data["nbr_step"] = nbr_step
        return IndexArtifact(
            "graph",
            jax.block_until_ready(data),
            {
                "metric": self.metric,
                "dimension": int(dimension),
                "n_vectors": int(x.shape[0]),
                "normalize_queries": self.metric == "cosine",
                "M": self.M,
                "degree": int(degree),
                "efConstruction": self.efConstruction,
                "efSearch": self.efSearch,
                "nbr_table": bool(use_table),
            },
        )


def beam_geometry(n: int, degree: int, ef_search: int, k: int):
    """Shared beam-search geometry ``(ef, expand, keep, iters)``.

    efSearch -> beam width: our flat beam needs ~1.25x HNSW's heap size
    for the same recall (no hierarchy); calibrated on 20k random 64d
    (beam 128 -> 0.94 recall vs FAISS efSearch=100 -> 0.916, BASELINE.md).
    Geometry from the round-2 sweep (scripts/exp_beam_table_tune.py):
    ~1536 scored rows per iteration (W = 1536/R), insert cap ~0.75*ef,
    3 iterations at 20k growing with log-ish N (deeper hop chains).
    Single source of truth for the serving path, the sharded path and
    the op-count estimator — tune here, everywhere follows.
    """
    ef = max(int(ef_search * 1.25), k + 8, 16)
    ef = min(ef, n)
    expand = min(max(8, min(ef, 1536 // max(degree, 1))), ef)
    keep = max(k, (3 * ef) // 4)
    iters = 3 + (n > 50_000) + (n > 500_000)
    iters = max(iters, -(-ef // keep) + 1)
    return ef, expand, keep, iters


def graph_artifact_search(
    artifact: IndexArtifact,
    q: jax.Array,
    k: int,
    metric: str,
    ef_search: int,
) -> Tuple[jax.Array, jax.Array]:
    meta = artifact.metadata
    n = meta["n_vectors"]
    degree = int(meta.get("degree", artifact.data["adjacency"].shape[1]))
    ef, expand, keep, iters = beam_geometry(n, degree, ef_search, k)
    nbr_vecs = artifact.data.get("nbr_vecs")
    dists, ids = gops.graph_search(
        q,
        artifact.data["vectors"],
        artifact.data["adjacency"],
        artifact.data["entry_ids"],
        k,
        ef=ef,
        expand=expand,
        iters=iters,
        metric=metric,
        sqnorms=artifact.data.get("sqnorms"),
        cand_keep=keep,
        nbr_vecs=nbr_vecs,
        nbr_sqn=artifact.data.get("nbr_sqn"),
        rescore=nbr_vecs is not None,  # quantised routing -> exact re-rank
        nbr_vmin=artifact.data.get("nbr_vmin"),
        nbr_step=artifact.data.get("nbr_step"),
    )
    return dists, ids


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
