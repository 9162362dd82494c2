"""LSH index family: custom multi-table LSH + binary-Hamming LSH.

Parity surface:
  * ``LSHIndexer`` / ``LSHSearcher`` — reference src/algorithms/lsh.py:27-301:
    sign-hash (cosine) or E2LSH floor-hash (L2), multi-table voting candidate
    gather, exact rerank, optional brute-force fallback. The collision
    guarantee story carries over: for cosine, P[collision per bit] =
    1 - theta/pi; for E2LSH, the standard p(w) of Datar et al. — voting
    across T tables concentrates true neighbours at the top of the candidate
    list (reference lsh.py:31-39 docstring).
  * ``BinaryLSHIndexer`` (+ ANNSearcher-compatible ``binary_lsh`` artifact) —
    reference ``FaissLSHIndexer`` (modular.py:182-221) and the FaissSearcher
    LSH rerank path (modular.py:455-534): Hamming top ``k x multiplier``
    candidates then exact rescoring.
"""

from __future__ import annotations

from typing import Any, Tuple

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
from vectordb_retrieval_tpu.ops import lsh as lshops

# binary-LSH rerank strategy crossover: above this many candidates per
# query the gather-based exact rerank (ops/lsh.rerank, ~0.2 us/row HLO
# gathers) loses to the gather-free dense threshold pass
# (ops/lsh.hamming_threshold_rerank)
_GATHER_RERANK_MAX_CANDS = 256


@register_indexer("LSHIndexer")
class LSHIndexer(BaseIndexer):
    def __init__(
        self,
        metric: str = "l2",
        num_tables: int = 12,
        hash_size: int = 18,
        bucket_width: float = 4.0,
        seed: int = 42,
        **params: Any,
    ):
        super().__init__(metric=metric, **params)
        if hash_size > 30:
            raise ValueError("hash_size must be <= 30 (int32 key packing)")
        self.num_tables = int(num_tables)
        self.hash_size = int(hash_size)
        self.bucket_width = float(bucket_width)
        self.seed = int(seed)

    def build(self, vectors: np.ndarray, dimension: int) -> IndexArtifact:
        x = jnp.asarray(np.ascontiguousarray(vectors, dtype=np.float32))
        if self.metric == "cosine":
            x = dops.normalize(x)
        proj = lshops.make_projections(
            self.seed, self.num_tables, self.hash_size, int(dimension)
        )
        data = {"vectors": x, "projections": proj}
        if self.metric == "cosine":
            keys = lshops.sign_keys(x, proj)
        else:
            offsets = lshops.make_offsets(
                self.seed, self.num_tables, self.hash_size, self.bucket_width
            )
            keys = lshops.e2lsh_keys(x, proj, offsets, self.bucket_width)
            data["offsets"] = offsets
        data["db_keys"] = keys
        return IndexArtifact(
            "lsh",
            jax.block_until_ready(data),
            {
                "metric": self.metric,
                "dimension": int(dimension),
                "n_vectors": int(x.shape[0]),
                "normalize_queries": self.metric == "cosine",
                "num_tables": self.num_tables,
                "hash_size": self.hash_size,
                "bucket_width": self.bucket_width,
            },
        )


@register_searcher("LSHSearcher")
class LSHSearcher(BaseSearcher):
    def __init__(
        self,
        metric: str = "l2",
        candidate_multiplier: float = 8.0,
        fallback_to_bruteforce: bool = True,
        **params: Any,
    ):
        super().__init__(metric=metric, **params)
        self.candidate_multiplier = float(candidate_multiplier)
        self.fallback_to_bruteforce = bool(fallback_to_bruteforce)

    def attach(self, artifact: IndexArtifact) -> None:
        if artifact.kind != "lsh":
            raise ValueError(f"LSHSearcher needs an 'lsh' artifact, got {artifact.kind!r}")
        self.artifact = artifact

    def _n_candidates(self, k: int, n: int) -> int:
        c = max(int(np.ceil(self.candidate_multiplier * k)), k)
        return min(c, n)

    def device_kernel(self, q: "jnp.ndarray", k: int):
        """Traceable LSH search: hash -> vote -> rerank, with the
        brute-force fallback as a ``lax.cond`` — the exact-scan branch only
        *executes* when some query lacks k collision candidates, preserving
        the reference's fallback semantics (lsh.py:242-283) inside one
        compiled program."""
        art = self.artifact
        meta = art.metadata
        metric = "ip" if meta["metric"] in ("ip", "cosine") else "l2"
        if meta.get("normalize_queries"):
            q = dops.normalize(q)
        if meta["metric"] == "cosine":
            qkeys = lshops.sign_keys(q, art.data["projections"])
        else:
            qkeys = lshops.e2lsh_keys(
                q,
                art.data["projections"],
                art.data["offsets"],
                meta["bucket_width"],
            )
        n = meta["n_vectors"]
        eff_k = min(k, n)
        n_cand = self._n_candidates(eff_k, n)
        votes, cand = lshops.vote_candidates(qkeys, art.data["db_keys"], n_cand)
        cand = jnp.where(votes > 0, cand, -1)  # vote 0 => no collision
        dists, ids = lshops.rerank(
            q, art.data["vectors"], cand, eff_k, metric=metric
        )
        if not self.fallback_to_bruteforce:
            return dists, ids

        short = jnp.sum(ids >= 0, axis=1) < eff_k  # [B]

        def with_fallback(args):
            dists, ids = args
            fd, fi = dops.exact_search(
                q, art.data["vectors"], eff_k, metric=metric, refine=True
            )
            return (
                jnp.where(short[:, None], fd, dists),
                jnp.where(short[:, None], fi, ids),
            )

        return jax.lax.cond(
            jnp.any(short), with_fallback, lambda a: a, (dists, ids)
        )

    def batch_search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self.artifact is None:
            raise RuntimeError("searcher not attached")
        q_np = np.ascontiguousarray(queries, dtype=np.float32)
        padded, b = pad_batch(q_np)
        dists, ids = self.device_kernel(jnp.asarray(padded), k)
        out_d = np.asarray(dists)[:b]
        out_i = np.asarray(ids)[:b].astype(np.int64)
        eff_k = out_d.shape[1]
        if eff_k < k:
            out_d = np.pad(out_d, ((0, 0), (0, k - eff_k)), constant_values=np.inf)
            out_i = np.pad(out_i, ((0, 0), (0, k - eff_k)), constant_values=-1)
        return out_d, out_i

    def estimated_ops_per_query(self, n_database: int) -> int:
        # votes are key compares, not distance ops; rerank is the ndis cost
        if self.artifact is None:
            return n_database
        return self._n_candidates(10, n_database)


@register_indexer("BinaryLSHIndexer")
@register_indexer("FaissLSHIndexer")
class BinaryLSHIndexer(BaseIndexer):
    """Binary hyperplane hashing (FAISS ``IndexLSH`` equivalent)."""

    def __init__(self, metric: str = "l2", num_bits: int = 256, seed: int = 42,
                 **params: Any):
        super().__init__(metric=metric, **params)
        self.num_bits = int(num_bits)
        self.seed = int(seed)

    def build(self, vectors: np.ndarray, dimension: int) -> IndexArtifact:
        x = jnp.asarray(np.ascontiguousarray(vectors, dtype=np.float32))
        if self.metric == "cosine":
            x = dops.normalize(x)
        key = jax.random.PRNGKey(self.seed)
        proj = jax.random.normal(
            key, (int(dimension), self.num_bits), dtype=jnp.float32
        )
        bits = (
            jax.lax.dot_general(
                x, proj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            > 0
        )
        words = lshops.pack_bits(bits)
        return IndexArtifact(
            "binary_lsh",
            jax.block_until_ready(
                {"vectors": x, "words": words, "projections": proj}
            ),
            {
                "metric": self.metric,
                "dimension": int(dimension),
                "n_vectors": int(x.shape[0]),
                "normalize_queries": self.metric == "cosine",
                "num_bits": self.num_bits,
                "index_kind": "lsh",  # triggers searcher rerank (modular.py:215-221)
            },
        )


def binary_lsh_search(
    artifact: IndexArtifact,
    q: jax.Array,
    k: int,
    metric: str,
    multiplier: float,
) -> Tuple[jax.Array, jax.Array]:
    """Hamming candidates + exact rerank over a ``binary_lsh`` artifact."""
    n = artifact.metadata["n_vectors"]
    proj = artifact.data["projections"]
    bits = (
        jax.lax.dot_general(
            q, proj, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        > 0
    )
    qwords = lshops.pack_bits(bits)
    n_cand = min(max(int(np.ceil(multiplier * k)), k), n)
    ham, cand = lshops.hamming_candidates(
        qwords, artifact.data["words"], n_cand
    )
    if n_cand > _GATHER_RERANK_MAX_CANDS:
        # recall-matched operating points need thousands of candidates
        # per query; per-row gathers (~0.2 us/row) lose to a gather-free
        # dense pass there (ops/lsh.hamming_threshold_rerank). The
        # radius-threshold candidate set is the argsort cut plus
        # Hamming ties — a superset, recall can only improve.
        return lshops.hamming_threshold_rerank(
            q, qwords, artifact.data["vectors"], artifact.data["words"],
            ham[:, -1:], k, metric=metric,
        )
    return lshops.rerank(q, artifact.data["vectors"], cand, k, metric=metric)


from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm  # noqa: E402


class LSH(CompositeAlgorithm):
    """Standalone LSH algorithm (reference src/algorithms/lsh.py:304-362):
    the indexer/searcher pair wrapped as a BaseAlgorithm."""

    def __init__(
        self,
        dimension: int,
        metric: str = "l2",
        num_tables: int = 12,
        hash_size: int = 18,
        bucket_width: float = 4.0,
        seed: int = 42,
        candidate_multiplier: float = 8.0,
        fallback_to_bruteforce: bool = True,
        **params: Any,
    ):
        super().__init__(
            dimension=dimension,
            metric=metric,
            indexer={
                "type": "LSHIndexer",
                "num_tables": num_tables,
                "hash_size": hash_size,
                "bucket_width": bucket_width,
                "seed": seed,
            },
            searcher={
                "type": "LSHSearcher",
                "candidate_multiplier": candidate_multiplier,
                "fallback_to_bruteforce": fallback_to_bruteforce,
            },
            name="LSH",
            **params,
        )
