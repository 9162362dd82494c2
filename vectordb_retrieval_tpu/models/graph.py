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


# auto mode switches to the memory-parity block layout above this row
# count: the node-level neighbour table costs R x corpus there (9.4x at
# 1M — the round-2 memory finding) while block-slab gathers are already
# the fast shape
_BLOCK_AUTO_THRESHOLD = 50_000

# default boundary-spill fraction for block-mode builds (set from the
# round-3 msmarco-shape sweep; override per-indexer with `spill:`)
_DEFAULT_SPILL = 0.0

# default member-slab dtype for block-mode builds ("auto" resolution):
# bf16 mean-centred residual slabs halve the wave-DMA bytes (the beam's
# binding cost) at ~1e-3 recall (round-3 sweeps, msmarco + SIFT shapes)
_DEFAULT_SLAB_DTYPE = "bf16"


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
        mode: str = "auto",  # auto | node | block
        block_size: int = 0,  # block mode: target rows per block (0 = auto)
        spill: float = -1.0,  # block mode: boundary-row clone fraction (<0 = auto)
        slab_dtype: str = "auto",  # block mode: f32 | bf16 member slabs
        reverse_edges: int = -1,  # node mode: incoming-link slots (<0 = M)
        **params: Any,
    ):
        super().__init__(metric=metric, **params)
        self.M = int(M)
        # node mode: HNSW inserts links BIDIRECTIONALLY; the RNG-pruned
        # kNN graph leaves boundary rows with no incoming edge — a hard
        # recall ceiling (0.930 at any efSearch on the glove-shaped
        # surrogate) that ops/graph.add_reverse_edges removes. -1 resolves
        # to 2M (full forward degree): the glove-surrogate sweep
        # (scripts/exp_glove_geometry.py) measured rev=2M at 0.9840 vs
        # rev=M at 0.9727 under the same ef=125/iters=4 geometry — the
        # rev=M default was the round-3 committed row's 0.9602-vs-0.9750
        # reference gap; richer backlinks close it for 1.33x table memory.
        self.reverse_edges = int(2 * M if reverse_edges < 0 else reverse_edges)
        self.efConstruction = int(efConstruction)
        self.efSearch = int(efSearch)
        self.n_entry = int(n_entry)  # 0 = auto (scales with N)
        self.seed = int(seed)
        self.nbr_table = str(nbr_table)
        self.nbr_table_budget_mb = int(nbr_table_budget_mb)
        self.nbr_table_dtype = str(nbr_table_dtype)
        if mode not in ("auto", "node", "block"):
            raise ValueError("mode must be 'auto', 'node' or 'block'")
        self.mode = mode
        self.block_size = int(block_size)
        # SOAR-style boundary spilling (ops/graph.build_block_graph spill):
        # cloning the lowest-margin rows into their runner-up block raises
        # recall-at-fixed-probes (the routed layout's dominant leak) for
        # `spill` x corpus extra memory. Default measured round 3 at
        # msmarco shape (scripts/exp_block_geometry.py).
        self.spill = _DEFAULT_SPILL if spill < 0 else float(spill)
        if slab_dtype not in ("auto", "f32", "bf16"):
            raise ValueError("slab_dtype must be 'auto', 'f32' or 'bf16'")
        # bf16 slabs halve the wave-DMA bytes (the block beam's binding
        # cost) and the split-query kernel keeps scoring exact w.r.t. the
        # stored values; the only loss is the bf16 rounding of the stored
        # vectors themselves (~1e-3 recall at msmarco shape, measured
        # round 3). auto resolves to the measured default.
        self.slab_dtype = _DEFAULT_SLAB_DTYPE if slab_dtype == "auto" else slab_dtype

    def _block_geom(self, n: int, d: int):
        # default 128-row blocks: on fat-tailed (radius-heterogeneous)
        # corpora fine blocks are decisively more row-efficient at the
        # high-recall end (+0.010 recall at equal rows scanned vs 256-row
        # blocks on the calibrated msmarco surrogate), and the huge-wave
        # geometry (block_geometry: up-to-96-slab waves, <=2-3
        # iterations) recovers the per-probe overhead that used to favour
        # coarse blocks — measured 0.9869 @ 8.3k QPS vs the coarse-block
        # best of 0.983 @ 6.8k at the same shape.
        # EXCEPT when a 128-row slab falls under the DMA-issue knee: the
        # manual slab ring is issue-bound (flat ~230 GB/s) on <64 KB
        # copies (scripts/exp_slab_ring.py), so narrow-d shapes coarsen
        # to 256 rows — measured A/B at the SIFT shape
        # (round3_sift_block256_probe): the 256-row frontier dominates at
        # the high-recall end (0.9919 @ 28.9k QPS at ef64 vs the 128-row
        # 0.9930 @ 14.1k), and one wave replaces two at ef>=64.
        if self.block_size:
            block = self.block_size
        else:
            itemsize = 2 if self.slab_dtype == "bf16" else 4
            block = 256 if 128 * d * itemsize < 65536 else 128
        n_blocks = max(1, -(-n // block))
        # entry-graph degree 8: the push's adjacency/blocks/cd gathers
        # scale with W*R, and with 96-slab waves a degree-8 graph already
        # offers 768 candidates to refill a 192-slot frontier — recall is
        # FLAT from degree 8 to 32 at msmarco shape while QPS rises
        # 8.4k -> 13.0k (degree sweep, round 3). The node-mode beam keeps
        # its 2M degree (its per-pop fan-out IS the search's row budget).
        degree = max(4, min(8, n_blocks - 1))
        return n_blocks, degree

    def _build_block(self, x: jax.Array, dimension: int) -> IndexArtifact:
        """Memory-parity large-N layout (ops/graph.build_block_graph)."""
        n = x.shape[0]
        n_blocks, degree = self._block_geom(n, int(x.shape[1]))
        parts = gops.build_block_graph(
            x, n_blocks, degree, seed=self.seed, spill=self.spill,
            slab_dtype=self.slab_dtype,
        )
        return self._package_block(parts, dimension, n)

    def _build_block_stream(self, store, dimension: int) -> IndexArtifact:
        """Out-of-core block build: memmap/BigStore corpus streamed in two
        sequential passes (ops/graph.build_block_graph_stream); host RSS
        O(chunk), device peak O(corpus) (the resident build transiently
        needs 2x corpus HBM for the slab gather)."""
        n = int(store.shape[0])
        n_blocks, degree = self._block_geom(n, dimension)
        parts = gops.build_block_graph_stream(
            store, n_blocks, degree, seed=self.seed,
            normalize=self.metric == "cosine", spill=self.spill,
            slab_dtype=self.slab_dtype,
        )
        art = self._package_block(parts, dimension, n)
        art.metadata["built_streaming"] = True
        return art

    def _package_block(self, parts, dimension: int, n: int) -> IndexArtifact:
        entries, entry_block, slot_ids, list_vecs, list_sqn, adj, mu = parts
        data = {
            "entries": entries,
            "entry_block": entry_block,
            "slot_ids": slot_ids,
            "list_vecs": list_vecs,
            "list_sqnorms": list_sqn,
            "entry_adj": adj,
        }
        if mu is not None:  # bf16 residual slabs carry f32 block means
            data["list_mu"] = mu
        return IndexArtifact(
            "graph",
            jax.block_until_ready(data),
            {
                "metric": self.metric,
                "dimension": int(dimension),
                "n_vectors": int(n),
                "normalize_queries": self.metric == "cosine",
                "M": self.M,
                "degree": int(adj.shape[1]),
                "efConstruction": self.efConstruction,
                "efSearch": self.efSearch,
                "mode": "block",
                "n_blocks": int(slot_ids.shape[0]),
                "n_entries": int(entries.shape[0]),
                "block_len": int(slot_ids.shape[1]),
                "spill": float(self.spill),
                "slab_dtype": str(list_vecs.dtype),
            },
        )

    def _block_selfcheck(self, artifact: IndexArtifact, x: jax.Array) -> float:
        """Routing-quality probe: recall@10 of a 256-row sample vs exact.

        Cluster routing needs cluster structure: on structureless
        (i.i.d. gaussian) corpora the true neighbours of a row scatter
        uniformly across blocks and block recall collapses (measured 0.35
        at 60k random 64d vs 0.99 on the SIFT-shaped surrogate). The probe
        costs one exact scan + one block search over 256 rows."""
        n = x.shape[0]
        idx = np.linspace(0, n - 1, num=min(256, n), dtype=np.int64)
        sample = x[jnp.asarray(idx)]
        metric = "ip" if self.metric in ("ip", "cosine") else "l2"
        _, gt = dops.exact_search(sample, x, 10, metric=metric)
        _, got = graph_artifact_search(
            artifact, sample, 10, metric, self.efSearch
        )
        from vectordb_retrieval_tpu.bench.metrics import recall_at_k

        return float(recall_at_k(np.asarray(gt), np.asarray(got), 10))

    def _selfcheck_stream(self, artifact: IndexArtifact, store) -> float:
        """Out-of-core variant of _block_selfcheck: sample rows + streamed
        exact GT (O(chunk) memory, data/storage.streamed_exact_search)."""
        from vectordb_retrieval_tpu.data.storage import (
            _read_chunk, streamed_exact_search,
        )

        n = int(store.shape[0])
        idx = np.linspace(0, n - 1, num=min(256, n), dtype=np.int64)
        sample = np.stack([_read_chunk(store, int(i), int(i) + 1)[0]
                           for i in idx]).astype(np.float32)
        metric = "ip" if self.metric in ("ip", "cosine") else "l2"
        norm = self.metric == "cosine"
        if norm:
            sample /= np.maximum(
                np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
            )
        _, gt = streamed_exact_search(
            sample, store, 10, metric=metric, normalize=norm
        )
        _, got = graph_artifact_search(
            artifact, jnp.asarray(sample), 10, metric, self.efSearch
        )
        from vectordb_retrieval_tpu.bench.metrics import recall_at_k

        return float(recall_at_k(np.asarray(gt), np.asarray(got), 10))

    def build(self, vectors: np.ndarray, dimension: int) -> IndexArtifact:
        from vectordb_retrieval_tpu.data.storage import (
            corpus_to_device, is_out_of_core,
        )

        if is_out_of_core(vectors):
            # >RAM/>HBM corpora: two-pass streamed block build (node mode
            # would need the corpus resident for its knn graph + beam table)
            art = self._build_block_stream(vectors, dimension)
            check = self._selfcheck_stream(art, vectors)
            art.metadata["selfcheck_recall"] = round(float(check), 4)
            return art
        x = corpus_to_device(vectors)
        if self.metric == "cosine":
            x = dops.normalize(x)
        n = x.shape[0]
        if self.mode == "block" or (
            self.mode == "auto" and n > _BLOCK_AUTO_THRESHOLD
        ):
            art = self._build_block(x, dimension)
            check = self._block_selfcheck(art, x)
            art.metadata["selfcheck_recall"] = round(float(check), 4)
            if check >= 0.85 or self.mode == "block":
                if check < 0.85:
                    import logging

                    logging.getLogger(__name__).warning(
                        "block-mode graph self-check recall %.2f < 0.85 "
                        "(structureless corpus?); mode='block' was "
                        "explicit so keeping it", check,
                    )
                return art
            # auto + structureless corpus: node-level beam handles it
            del art
        degree = min(2 * self.M, max(n - 1, 1))
        adjacency = gops.build_knn_graph(
            x, degree, reverse_edges=self.reverse_edges
        )
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
        degree = int(adjacency.shape[1])  # forward + reverse slots
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
    # 4 base iterations: the glove-surrogate sweep (exp_glove_geometry.py)
    # showed the 3-iteration beam is budget-starved well short of its
    # graph's reachable recall (0.974 -> 0.984 at iters=4, rev=2M), and
    # sub-50k QPS columns are tunnel-dispatch-floor-bound so the extra
    # wave is ~free in committed rows.
    iters = 4 + (n > 50_000) + (n > 500_000)
    iters = max(iters, -(-ef // keep) + 1)
    return ef, expand, keep, iters


def block_geometry(n_blocks: int, ef_search: int, k: int,
                   block_len: int = 128):
    """Block-mode beam geometry ``(efb, expand, iters)``.

    efSearch maps to a ROW budget (total member rows scored =
    ``expand * iters * block_len`` ~= 245 * efSearch), calibrated at the
    msmarco parity point: on the difficulty-calibrated 384d surrogate,
    efSearch=100 must land the reference's committed hnsw row (recall
    0.9857 — reference benchmark_summary.md:44, M=16 efSearch=100), and
    ef*245 rows gives 0.9869 there (round-3 frozen-surrogate sweep,
    L=128). The row cost per efSearch is ~15x HNSW's (~16 rows/ef):
    block-granular routing trades row efficiency for contiguous
    MXU-shaped scans — the TPU side of SURVEY.md section 7 hard-part (b).

    Waves are as wide as the probe budget allows (up to 96 slabs, <=2-3
    iterations): per-iteration overhead (frontier merge + masks)
    dominates below ~32 slabs/wave, and the huge-wave split measured
    0.9869 @ 8.3k QPS vs 0.9890 @ 4.6k for the same rows in 48-slab
    waves.
    """
    probes = max(8, min(-(-(ef_search * 245) // max(block_len, 1)),
                        n_blocks))
    iters = max(1, -(-probes // 96))
    expand = -(-probes // iters)
    efb = min(max(2 * expand, 48), n_blocks)
    return efb, expand, iters


def graph_artifact_search(
    artifact: IndexArtifact,
    q: jax.Array,
    k: int,
    metric: str,
    ef_search: int,
) -> Tuple[jax.Array, jax.Array]:
    meta = artifact.metadata
    n = meta["n_vectors"]
    if meta.get("mode") == "block":
        efb, expand, iters = block_geometry(
            int(meta["n_blocks"]), ef_search, k,
            block_len=int(meta.get("block_len", 128)),
        )
        return gops.block_graph_search(
            q,
            artifact.data["entries"],
            artifact.data["entry_block"],
            artifact.data["slot_ids"],
            artifact.data["list_vecs"],
            artifact.data["list_sqnorms"],
            artifact.data["entry_adj"],
            artifact.data.get("list_mu"),
            k=k,
            efb=efb,
            expand=expand,
            iters=iters,
            metric=metric,
            dedup=float(meta.get("spill", 0.0)) > 0.0,
        )
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
