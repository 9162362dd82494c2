"""Factory indexer (IVF/PQ/SQ grammar) + the generic ANN searcher.

Replaces the reference's FAISS-backed components #4/#12/#13/#15
(SURVEY.md section 2.1): the ``index_factory`` grammar strings
``IVF{n},Flat`` / ``IVF{n},PQ{m}`` / ``IVF{n},SQ8`` / ``PQ{m}`` / ``SQ8``
(reference modular.py:224-289, approximate_search.py:39) are parsed into
TPU-native artifacts, and ``ANNSearcher`` (reference ``FaissSearcher``,
modular.py:393-551) dispatches on artifact kind with runtime params
(``nprobe`` from searcher params or artifact metadata, modular.py:437-441).

Registry aliases keep reference YAML configs loadable verbatim:
``FaissFactoryIndexer`` -> :class:`FactoryIndexer`,
``FaissIVFIndexer`` -> :class:`IVFIndexer`, ``FaissSearcher`` ->
:class:`ANNSearcher`.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

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
from vectordb_retrieval_tpu.ops import ivf as ivfops
from vectordb_retrieval_tpu.ops import pq as pqops
from vectordb_retrieval_tpu.ops import sq as sqops
from vectordb_retrieval_tpu.ops.kmeans import (
    kmeans_assign,
    kmeans_fit,
    training_sample,
)

_FACTORY_RE = re.compile(
    r"^(?:OPQ(?P<opq>\d+),)?(?:IVF(?P<nlist>\d+),)?(?P<code>Flat|PQ(?P<m>\d+)|SQ8)$"
)


def parse_index_key(index_key: str) -> Dict[str, Any]:
    """Parse the factory grammar into {opq?, nlist?, coding, m?}.

    Extends the reference's FAISS grammar with the standard ``OPQ{m},``
    pre-transform prefix (learned rotation, ops/pq.opq_train)."""
    m = _FACTORY_RE.match(index_key.strip())
    if not m:
        raise ValueError(
            f"unsupported index_key {index_key!r}; expected "
            "[OPQ{m},][IVF{n},](Flat|PQ{m}|SQ8)"
        )
    out: Dict[str, Any] = {
        "nlist": None, "coding": "flat", "m": None, "opq": None,
    }
    if m.group("opq"):
        out["opq"] = int(m.group("opq"))
    if m.group("nlist"):
        out["nlist"] = int(m.group("nlist"))
    code = m.group("code")
    if code == "Flat":
        out["coding"] = "flat"
    elif code == "SQ8":
        out["coding"] = "sq8"
    else:
        out["coding"] = "pq"
        out["m"] = int(m.group("m"))
    if out["nlist"] is None and out["coding"] == "flat":
        raise ValueError("bare 'Flat' has no quantization; use BruteForceIndexer")
    return out


def _gather_slots(arr: jax.Array, slot_ids: np.ndarray) -> jax.Array:
    """Gather rows into padded [nlist, max_len, ...] layout (pad -> row 0)."""
    safe = jnp.asarray(np.where(slot_ids >= 0, slot_ids, 0))
    return arr[safe]


@register_indexer("FactoryIndexer")
@register_indexer("FaissFactoryIndexer")
class FactoryIndexer(BaseIndexer):
    """Builds quantized artifacts from an ``index_key`` grammar string."""

    def __init__(
        self,
        metric: str = "l2",
        index_key: str = "IVF100,Flat",
        nprobe: int = 10,
        train_iters: int = 20,
        seed: int = 123,
        list_dtype: str = "bf16",
        exact_rescore: bool = False,
        bucket_len: int = 0,
        pq_rotations: Any = 0,
        **params: Any,
    ):
        super().__init__(metric=metric, **params)
        self.index_key = index_key
        self.nprobe = int(nprobe)
        self.train_iters = int(train_iters)
        self.seed = int(seed)
        # bucket-length cap for the bucketed list layout (0 = per-coding
        # default). Coded payloads (PQ/SQ8) default tighter: padding
        # inflates BOTH the stored codes and the decode-on-read work, and
        # the decode transient is bucket-shape-agnostic, so short buckets
        # are nearly free there (measured 1.44 -> ~1.14 pad at
        # IVF1024/1M, -20% index bytes and decode FLOPs); flat lists keep
        # long buckets for big contiguous slab gathers.
        self.bucket_len = int(bucket_len)
        if list_dtype not in ("bf16", "f32"):
            raise ValueError("list_dtype must be 'bf16' or 'f32'")
        self.list_dtype = list_dtype
        # opt-in: keep an f32 corpus copy for an exact re-rank of the final
        # candidates (recovers the ~0.5% recall bf16 scoring noise costs, at
        # +1x corpus memory — the memory-parity default skips it)
        self.exact_rescore = bool(exact_rescore)
        # per-list block-diagonal residual rotations for IVF-PQ (block
        # size in dims; 0 = off; 'auto' = build-time held-out MSE A/B
        # decides — see _residual_coding). Beyond the FAISS grammar:
        # aligns each list's residual frame to the SHARED codebook
        # (ops/pq.train_per_list_rotations); storage [nlist, d/bs, bs, bs].
        if isinstance(pq_rotations, str) and pq_rotations.lower() == "auto":
            self.pq_rotations: Any = "auto"
        else:
            self.pq_rotations = int(pq_rotations)

    # pq_rotations='auto' decision threshold: enable per-list rotations
    # only when they cut HELD-OUT residual reconstruction MSE by >= this
    # fraction. Measured regimes (scripts/exp_manifold_structure.py):
    # shared-frame gaussian surrogates ~0.00-0.02 (rotations recall-neutral,
    # ~16% decode QPS cost); per-list-oriented manifolds >= 0.3 (rotations
    # cut quantisation error many-fold). 0.05 separates them with margin.
    PQ_ROT_AUTO_GAIN = 0.05

    def _residual_coding(
        self,
        residuals: jax.Array,
        assignments: jax.Array,
        nlist: int,
        m: int,
        meta: Dict[str, Any],
        seed: int,
    ) -> Tuple[Optional[jax.Array], jax.Array]:
        """``(rotations | None, codebooks)`` for IVF-PQ residual coding,
        resolving ``pq_rotations='auto'`` via the held-out MSE A/B
        (ops/pq.rotation_gain); the decision + measured gain land in
        ``meta['pq_rot_auto']`` so benchmark artifacts record WHY."""
        want = self.pq_rotations
        if want == "auto":
            bs = pqops.auto_rotation_block(int(residuals.shape[1]))
            gain, err_p, err_r, rots, cb_rot = pqops.rotation_gain(
                residuals, assignments, nlist, m, bs,
                seed=seed, iters=self.train_iters,
            )
            enabled = gain >= self.PQ_ROT_AUTO_GAIN
            meta["pq_rot_auto"] = {
                "bs": bs,
                "gain": round(float(gain), 4),
                "err_plain": float(err_p),
                "err_rot": float(err_r),
                "threshold": self.PQ_ROT_AUTO_GAIN,
                "enabled": bool(enabled),
            }
            if enabled:
                meta["pq_rot_bs"] = bs
                return rots, cb_rot
            return None, pqops.pq_train(
                residuals, m, seed=seed, iters=self.train_iters
            )
        if want:
            meta["pq_rot_bs"] = int(want)
            rots, cb = pqops.train_per_list_rotations(
                residuals, assignments, nlist, m, int(want),
                seed=seed, iters=self.train_iters,
            )
            return rots, cb
        return None, pqops.pq_train(
            residuals, m, seed=seed, iters=self.train_iters
        )

    def build(self, vectors: np.ndarray, dimension: int) -> IndexArtifact:
        spec = parse_index_key(self.index_key)
        # Out-of-core corpora with compressed payloads build fully
        # streaming (sample-trained quantizers + chunked encode): neither
        # host nor device ever holds the raw corpus — the >RAM/>HBM path.
        from vectordb_retrieval_tpu.data.storage import is_out_of_core

        if (
            is_out_of_core(vectors)
            and spec["nlist"] is not None
            and spec["coding"] in ("pq", "sq8")
            and not spec["opq"]
        ):
            return self._build_ivf_stream(vectors, spec)
        # memmap/BigStore inputs stream to device in bounded chunks
        # (data/storage.py); host RSS stays O(chunk) for >RAM corpora.
        x = corpus_to_device(vectors)
        if self.metric == "cosine":
            x = dops.normalize(x)
        n, d = x.shape

        meta: Dict[str, Any] = {
            "metric": self.metric,
            "dimension": int(d),
            "n_vectors": int(n),
            "normalize_queries": self.metric == "cosine",
            "index_key": self.index_key,
            "nprobe": self.nprobe,
        }

        rotation = None
        if spec["opq"]:
            # learn the OPQ rotation on a training sample, rotate the corpus
            sample = training_sample(n, 256, self.seed ^ 0x09)
            train_x = x if sample is None else x[sample]
            rotation, _ = pqops.opq_train(
                train_x, spec["opq"], seed=self.seed, iters=self.train_iters
            )
            x = jax.lax.dot_general(
                x, rotation, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            meta["opq_m"] = spec["opq"]

        if spec["nlist"] is None:
            art = self._build_flat_coded(x, spec, meta)
        else:
            art = self._build_ivf(x, spec, meta)
        if rotation is not None:
            art.data["opq_rotation"] = jax.block_until_ready(rotation)
        return art

    # -- flat-coded (PQ{m} / SQ8 without IVF) ---------------------------
    def _build_flat_coded(
        self, x: jax.Array, spec: Dict[str, Any], meta: Dict[str, Any]
    ) -> IndexArtifact:
        n = x.shape[0]
        sample = training_sample(n, 256, self.seed)
        train_x = x if sample is None else x[sample]
        if spec["coding"] == "pq":
            m = spec["m"]
            codebooks = pqops.pq_train(
                train_x, m, seed=self.seed, iters=self.train_iters
            )
            codes = pqops.pq_encode(x, codebooks)
            sqn = pqops.pq_code_sqnorms(codes, codebooks)
            data = {
                "codes": codes,
                "codebooks": codebooks,
                "code_sqnorms": sqn,
            }
            meta["m"] = m
            return IndexArtifact("pq", jax.block_until_ready(data), meta)
        vmin, step = sqops.sq_train(x)
        codes = sqops.sq_encode(x, vmin, step)
        x_hat = sqops.sq_decode(codes, vmin, step)
        sqn = jnp.sum(x_hat * x_hat, axis=-1)
        data = {
            "codes": codes,
            "vmin": vmin,
            "step": step,
            "code_sqnorms": sqn,
        }
        return IndexArtifact("sq8", jax.block_until_ready(data), meta)

    # -- out-of-core IVF (streamed build, compressed payload) ------------
    def _build_ivf_stream(
        self, store, spec: Dict[str, Any], chunk_rows: int = 262_144
    ) -> IndexArtifact:
        """IVF-PQ / IVF-SQ8 build over an out-of-core corpus.

        Quantizers (coarse k-means; PQ codebooks / SQ ranges) train on an
        evenly-spaced row sample — FAISS semantics, which also trains on a
        sample (reference approximate_search.py trains via index.train on
        the provided set). The corpus then streams through the device one
        chunk at a time for assignment + encoding; only the codes (4-32x
        smaller) are retained. Peak host AND device memory is
        O(chunk + codes), independent of corpus size.
        """
        from vectordb_retrieval_tpu.data.storage import _read_chunk

        n, d = (int(s) for s in store.shape)
        nlist = min(spec["nlist"], n)
        meta: Dict[str, Any] = {
            "metric": self.metric,
            "dimension": d,
            "n_vectors": n,
            "normalize_queries": self.metric == "cosine",
            "index_key": self.index_key,
            "nprobe": self.nprobe,
            "built_streaming": True,
        }

        def prep(host: np.ndarray) -> jax.Array:
            dev = jnp.asarray(
                np.ascontiguousarray(host, dtype=np.float32)
            )
            return dops.normalize(dev) if self.metric == "cosine" else dev

        # evenly spaced sample blocks for quantizer training
        target = min(n, max(nlist * 32, 65_536))
        block = 4096
        n_blocks = max(1, -(-target // block))
        stride = max(1, n // n_blocks)
        parts = [
            _read_chunk(store, s, min(s + block, n))
            for s in range(0, n, stride)
        ]
        sample = prep(np.concatenate(parts)[:target])
        del parts
        centroids, _ = kmeans_fit(
            sample, nlist, seed=self.seed, iters=self.train_iters
        )

        if spec["coding"] == "pq":
            m = spec["m"]
            meta["m"] = m
            s_assign = kmeans_assign(sample, centroids)
            rots, codebooks = self._residual_coding(
                sample - centroids[s_assign], s_assign, nlist, m, meta,
                seed=self.seed + 1,
            )
            code_w = m
        else:
            vmin, step = sqops.sq_train(sample)
            code_w = d
        del sample

        from vectordb_retrieval_tpu.data.storage import iter_chunks_any

        codes_np = np.empty((n, code_w), dtype=np.uint8)
        sqn_np = np.empty((n,), dtype=np.float32)
        assign_np = np.empty((n,), dtype=np.int32)
        for start, host in iter_chunks_any(store, chunk_rows):
            stop = start + host.shape[0]
            dev = prep(host)
            a = kmeans_assign(dev, centroids)
            if spec["coding"] == "pq":
                residuals = dev - centroids[a]
                if rots is not None:
                    c = pqops.pq_encode_rotated(residuals, a, rots, codebooks)
                else:
                    c = pqops.pq_encode(residuals, codebooks)
                sn = pqops.pq_code_sqnorms(c, codebooks)
            else:
                c = sqops.sq_encode(dev, vmin, step)
                x_hat = sqops.sq_decode(c, vmin, step)
                sn = jnp.sum(x_hat * x_hat, axis=-1)
            codes_np[start:stop] = np.asarray(c)
            sqn_np[start:stop] = np.asarray(sn)
            assign_np[start:stop] = np.asarray(a)
            del dev

        slot_ids_np, bucket_lists_np, pad_ratio = ivfops.build_bucketed_lists(
            assign_np, nlist
        )
        safe = np.where(slot_ids_np >= 0, slot_ids_np, 0)
        meta.update(
            {
                "nlist": int(nlist),
                "n_buckets": int(slot_ids_np.shape[0]),
                "pad_ratio": pad_ratio,
                "max_list_len": int(slot_ids_np.shape[1]),
                "probe_cum": [
                    int(v)
                    for v in ivfops.probe_budget_cum(bucket_lists_np, nlist)
                ],
            }
        )
        bucket_lists = jnp.asarray(bucket_lists_np)
        # Slab-wise device assembly of the bucket layout: a one-shot
        # `codes_np[safe]` host gather would coexist with the source codes
        # (2x the dominant allocation at big N). Instead the device buffer
        # is built slab-by-slab with a donated dynamic_update_slice, so
        # host overhead beyond the source codes is one ~64 MB slab.
        # (A whole-array device-side gather was tried and reverted:
        # XLA:CPU gather temporaries more than doubled peak RSS at 12M.)
        n_buckets, L = safe.shape
        slab = max(1, (64 << 20) // max(L * code_w, 1))
        upd = jax.jit(
            lambda buf, chunk, s: jax.lax.dynamic_update_slice(
                buf, chunk, (s,) + (0,) * (buf.ndim - 1)
            ),
            donate_argnums=(0,),
        )

        def assemble(src: np.ndarray, dtype) -> jax.Array:
            # src is per-ROW ([N, w] codes or [N] norms); the gather adds
            # the bucket-layout axes -> buf is [n_buckets, L, *row_shape]
            buf = jax.jit(
                lambda: jnp.zeros((n_buckets, L) + src.shape[1:], dtype)
            )()
            starts = list(range(0, max(n_buckets - slab, 0) + 1, slab))
            if starts[-1] + slab < n_buckets:
                starts.append(n_buckets - slab)  # overlapping fixed tail
            for i, s in enumerate(starts):
                buf = upd(buf, jnp.asarray(src[safe[s : s + slab]]), np.int32(s))
                if (i + 1) % 4 == 0:  # cap in-flight staging slabs
                    jax.block_until_ready(buf)
            return jax.block_until_ready(buf)

        list_codes = assemble(codes_np, jnp.uint8)
        del codes_np
        list_sqn = assemble(sqn_np, jnp.float32)
        del sqn_np, safe
        data: Dict[str, Any] = {
            "centroids": ivfops.coarse_table(centroids, bucket_lists),
            "list_centroids": centroids,  # scatter-free exact-probe table
            "bucket_lists": bucket_lists,
            "slot_ids": jnp.asarray(slot_ids_np),
            "list_codes": list_codes,
            "list_sqnorms": list_sqn,
        }
        if spec["coding"] == "pq":
            data["codebooks"] = codebooks
            if rots is not None:
                data["list_rotations"] = rots
            kind = "ivf_pq"
        else:
            data["vmin"] = vmin
            data["step"] = step
            kind = "ivf_sq8"
        return IndexArtifact(kind, jax.block_until_ready(data), meta)

    # -- IVF variants ----------------------------------------------------
    def _build_ivf(
        self, x: jax.Array, spec: Dict[str, Any], meta: Dict[str, Any]
    ) -> IndexArtifact:
        n, d = x.shape
        nlist = min(spec["nlist"], n)
        sample = training_sample(n, nlist, self.seed)
        train_x = x if sample is None else x[sample]
        centroids, _ = kmeans_fit(
            train_x, nlist, seed=self.seed, iters=self.train_iters
        )
        assignments = np.asarray(kmeans_assign(x, centroids))
        # bucketed layout: long lists split into fixed-length buckets with
        # duplicated centroid rows, so skewed partitions cannot blow up
        # padding (measured pad 6.8x -> ~1.1x on clustered 100k x 384d;
        # ops/ivf.build_bucketed_lists)
        cap = self.bucket_len or (
            256 if spec["coding"] in ("pq", "sq8") else 2048
        )
        slot_ids_np, bucket_lists_np, pad_ratio = ivfops.build_bucketed_lists(
            assignments, nlist, target_len_cap=cap
        )
        slot_ids = jnp.asarray(slot_ids_np)
        bucket_lists = jnp.asarray(bucket_lists_np)
        coarse = ivfops.coarse_table(centroids, bucket_lists)  # [n_buckets, d]
        meta.update(
            {
                "nlist": int(nlist),
                "n_buckets": int(slot_ids_np.shape[0]),
                "pad_ratio": pad_ratio,
                "max_list_len": int(slot_ids_np.shape[1]),
                "probe_cum": [
                    int(v)
                    for v in ivfops.probe_budget_cum(bucket_lists_np, nlist)
                ],
            }
        )
        data: Dict[str, Any] = {
            "centroids": coarse,
            "list_centroids": centroids,  # scatter-free exact-probe table
            "bucket_lists": bucket_lists,
            "slot_ids": slot_ids,
        }

        if spec["coding"] == "flat":
            # recorded so benchmark comparisons against reference (f32 FAISS
            # scoring) recalls can account for the bf16-list ~0.5% delta
            # when the exact re-rank is off (docs/parity.md)
            meta["exact_rescore"] = bool(self.exact_rescore)
            list_vecs = _gather_slots(x, slot_ids_np)
            data["list_sqnorms"] = jnp.sum(list_vecs * list_vecs, axis=-1)
            if self.list_dtype == "bf16":
                # bf16 list copies halve the per-probe gather traffic (the
                # bandwidth cost of IVF-Flat) at ~0.5% recall; pass
                # exact_rescore=True to keep f32 rows for an exact re-rank
                data["list_vecs"] = list_vecs.astype(jnp.bfloat16)
                if self.exact_rescore:
                    data["full_vectors"] = x
            else:
                data["list_vecs"] = list_vecs
            kind = "ivf_flat"
        elif spec["coding"] == "pq":
            m = spec["m"]
            meta["m"] = m
            assign_dev = jnp.asarray(assignments)
            residuals = x - centroids[assign_dev]
            r_sample = training_sample(n, 256, self.seed + 1)
            tr_r = residuals if r_sample is None else residuals[r_sample]
            tr_a = assign_dev if r_sample is None else assign_dev[r_sample]
            rots, codebooks = self._residual_coding(
                tr_r, tr_a, nlist, m, meta, seed=self.seed
            )
            if rots is not None:
                codes = pqops.pq_encode_rotated(
                    residuals, assign_dev, rots, codebooks
                )
                data["list_rotations"] = rots
            else:
                codes = pqops.pq_encode(residuals, codebooks)
            sqn = pqops.pq_code_sqnorms(codes, codebooks)
            data["codebooks"] = codebooks
            data["list_codes"] = _gather_slots(codes, slot_ids_np)
            data["list_sqnorms"] = _gather_slots(sqn, slot_ids_np)
            kind = "ivf_pq"
        else:  # sq8
            vmin, step = sqops.sq_train(x)
            codes = sqops.sq_encode(x, vmin, step)
            x_hat = sqops.sq_decode(codes, vmin, step)
            sqn = jnp.sum(x_hat * x_hat, axis=-1)
            data["vmin"] = vmin
            data["step"] = step
            data["list_codes"] = _gather_slots(codes, slot_ids_np)
            data["list_sqnorms"] = _gather_slots(sqn, slot_ids_np)
            kind = "ivf_sq8"
        return IndexArtifact(kind, jax.block_until_ready(data), meta)


@register_indexer("IVFIndexer")
@register_indexer("FaissIVFIndexer")
class IVFIndexer(FactoryIndexer):
    """Back-compat alias: ``index_type`` -> ``index_key``
    (reference modular.py:292-309)."""

    def __init__(self, metric: str = "l2", index_type: str = "IVF100,Flat",
                 **params: Any):
        params.pop("index_key", None)
        super().__init__(metric=metric, index_key=index_type, **params)


@register_searcher("ANNSearcher")
@register_searcher("FaissSearcher")
class ANNSearcher(BaseSearcher):
    """Serves flat/quantized/IVF artifacts; runtime ``nprobe`` override."""

    SUPPORTED = (
        "flat", "pq", "sq8", "ivf_flat", "ivf_pq", "ivf_sq8", "binary_lsh",
        "graph", "ivf_flat_sharded", "ivf_pq_sharded", "ivf_sq8_sharded",
        "graph_sharded",
    )

    def attach(self, artifact: IndexArtifact) -> None:
        if artifact.kind not in self.SUPPORTED:
            raise ValueError(
                f"ANNSearcher cannot serve artifact kind {artifact.kind!r}"
            )
        if artifact.kind.endswith("_sharded") and not hasattr(artifact, "mesh"):
            # loaded from disk: re-shard over the current devices
            from vectordb_retrieval_tpu.models.sharded import reshard_artifact

            reshard_artifact(artifact)
        self.artifact = artifact

    def _nprobe(self) -> int:
        nprobe = int(
            self.params.get("nprobe", self.artifact.metadata.get("nprobe", 10))
        )
        # bucketed lists: "probe nprobe lists" means probing every bucket of
        # the top lists. The probe budget comes from ``probe_cum`` (sum of
        # the nprobe LARGEST per-list bucket counts, ops/ivf.probe_budget_cum)
        # which guarantees coverage of the nprobe nearest lists under any
        # skew — average-based scaling did not (one giant list could consume
        # every probe slot before the second list was reached).
        meta = self.artifact.metadata
        nlist = int(meta.get("nlist", 0))
        n_buckets = int(meta.get("n_buckets", nlist))
        if nlist and n_buckets > nlist:
            cum = meta.get("probe_cum")
            if cum is None:
                bl = self.artifact.data.get("bucket_lists")
                if bl is not None:  # legacy artifact: derive once, cache
                    cum = [
                        int(v)
                        for v in ivfops.probe_budget_cum(
                            np.asarray(bl), nlist
                        )
                    ]
                    meta["probe_cum"] = cum
            if cum is not None:
                nprobe = int(cum[min(nprobe, len(cum)) - 1])
            else:  # legacy sharded artifact without bucket_lists
                nprobe = -(-nprobe * n_buckets // nlist)
        return max(1, min(nprobe, n_buckets or nprobe))

    def _probe_kwargs(self) -> dict:
        """Exact reference nprobe semantics for bucketed layouts.

        The budget from :meth:`_nprobe` GUARANTEES covering the nprobe
        nearest lists, but its slack slots spill to buckets of farther
        lists — a recall superset of the reference's ``index.nprobe``
        lists (reference modular.py:437-441) measured at +0.03 (flat) to
        +0.10 (pq) on skew-shaped corpora. Default semantics restrict the
        probe set to the top-nprobe LISTS (ops/ivf.exact_probe_mask) so
        fixed-nprobe rows compare apples-to-apples; pass
        ``nprobe_semantics: buckets`` to keep the generous superset (same
        probe cost — the spare slots are masked, not saved) for
        frontier-style sweeps where only the recall/QPS tradeoff matters.
        """
        meta = self.artifact.metadata
        nlist = int(meta.get("nlist", 0))
        n_buckets = int(meta.get("n_buckets", nlist))
        semantics = str(
            self.params.get(
                "nprobe_semantics", meta.get("nprobe_semantics", "lists")
            )
        )
        bl = self.artifact.data.get("bucket_lists")
        if (
            semantics != "lists" or not nlist or n_buckets <= nlist
            or bl is None
        ):
            return {}
        raw = int(
            self.params.get("nprobe", meta.get("nprobe", 10))
        )
        out = {
            "bucket_lists": bl,
            "nlist": nlist,
            "nprobe_lists": max(1, min(raw, nlist)),
        }
        lc = self.artifact.data.get("list_centroids")
        if lc is not None:
            # scatter-free list-distance table for exact_probe_mask
            # (segment-min over duplicated bucket rows measured ~4 ms per
            # 256-query batch; one [B, nlist] matmul replaces it)
            out["list_centroids"] = lc
        return out

    def _sharded_probe_lists(self) -> int:
        """Exact reference nprobe semantics for the sharded family: each
        shard probes its own ``nprobe`` nearest LISTS (what FAISS
        IndexShards' per-shard ``index.nprobe`` does). 0 = generous bucket
        budget (``nprobe_semantics: buckets``, or a legacy artifact with
        no ``bucket_lists``)."""
        meta = self.artifact.metadata
        semantics = str(
            self.params.get(
                "nprobe_semantics", meta.get("nprobe_semantics", "lists")
            )
        )
        if semantics != "lists" or "bucket_lists" not in self.artifact.data:
            return 0
        raw = int(self.params.get("nprobe", meta.get("nprobe", 10)))
        return max(1, min(raw, int(meta.get("nlist", 1))))

    def _score_metric(self) -> str:
        metric = self.artifact.metadata.get("metric", self.metric)
        return "ip" if metric in ("ip", "cosine") else "l2"

    def device_kernel(self, q: "jnp.ndarray", k: int):
        """Traceable search kernel (composable under an outer jit)."""
        art = self.artifact
        meta = art.metadata
        if meta.get("normalize_queries"):
            q = dops.normalize(q)
        rotation = art.data.get("opq_rotation")
        if rotation is not None:  # OPQ pre-transform (queries follow corpus)
            q = jax.lax.dot_general(
                q, rotation, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        metric = self._score_metric()
        eff_k = min(k, meta["n_vectors"])
        kind = art.kind
        d = art.data
        if kind == "flat":
            dists, ids = dops.exact_search(
                q, d["vectors"], eff_k, metric=metric,
                db_sqnorms=d.get("sqnorms"),
            )
            row_ids = d.get("row_ids")
            if row_ids is not None:  # mutable snapshot: stable-id mapping
                ids = jnp.where(
                    ids >= 0, row_ids[jnp.where(ids >= 0, ids, 0)], -1
                )
        elif kind == "pq":
            dists, ids = pqops.pq_search(
                q, d["codes"], d["codebooks"], d["code_sqnorms"], eff_k,
                metric=metric,
            )
        elif kind == "sq8":
            dists, ids = sqops.sq_search(
                q, d["codes"], d["vmin"], d["step"], d["code_sqnorms"], eff_k,
                metric=metric,
            )
        elif kind == "ivf_flat":
            dists, ids = ivfops.ivf_flat_search(
                q, d["centroids"], d["slot_ids"], d["list_vecs"],
                d["list_sqnorms"], eff_k, self._nprobe(), metric=metric,
                full_vectors=d.get("full_vectors"), **self._probe_kwargs(),
            )
        elif kind == "ivf_pq":
            rot_kw = {}
            rots = d.get("list_rotations")
            if rots is not None:
                rot_kw = dict(
                    list_rotations=rots,
                    rot_bucket_lists=d["bucket_lists"],
                )
            dists, ids = ivfops.ivf_pq_search(
                q, d["centroids"], d["slot_ids"], d["list_codes"],
                d["list_sqnorms"], d["codebooks"], eff_k, self._nprobe(),
                metric=metric, **self._probe_kwargs(), **rot_kw,
            )
        elif kind == "graph":
            from vectordb_retrieval_tpu.models.graph import graph_artifact_search

            ef = int(
                self.params.get("efSearch", meta.get("efSearch", 100))
            )
            dists, ids = graph_artifact_search(art, q, eff_k, metric, ef)
        elif kind.endswith("_sharded"):
            from vectordb_retrieval_tpu import parallel as par

            mesh = art.mesh
            if kind == "ivf_flat_sharded":
                dists, ids = par.sharded_ivf_flat_search(
                    q, d, eff_k, self._nprobe(), mesh, metric=metric,
                    nlist=int(meta.get("nlist", 0)),
                    nprobe_lists=self._sharded_probe_lists(),
                )
            elif kind == "graph_sharded":
                ef = int(
                    self.params.get("efSearch", meta.get("efSearch", 100))
                )
                if meta.get("mode") == "block":
                    from vectordb_retrieval_tpu.models.graph import (
                        block_geometry,
                    )

                    efb, expand, iters = block_geometry(
                        int(meta["n_blocks"]), ef, eff_k,
                        block_len=int(meta.get("block_len", 128)),
                    )
                    dists, ids = par.sharded_block_graph_search(
                        q, d, eff_k, mesh,
                        efb=efb, expand=expand, iters=iters, metric=metric,
                    )
                else:
                    dists, ids = par.sharded_graph_search(
                        q, d, meta["n_vectors"], eff_k, mesh,
                        ef=max(int(ef * 1.25), eff_k + 8, 16),
                        metric=metric,
                    )
            else:  # ivf_pq_sharded / ivf_sq8_sharded
                dists, ids = par.sharded_ivf_coded_search(
                    q, d, eff_k, self._nprobe(), mesh,
                    coding="pq" if kind == "ivf_pq_sharded" else "sq8",
                    metric=metric,
                    nlist=int(meta.get("nlist", 0)),
                    nprobe_lists=self._sharded_probe_lists(),
                )
        elif kind == "binary_lsh":
            from vectordb_retrieval_tpu.models.lsh import binary_lsh_search

            dists, ids = binary_lsh_search(
                art, q, eff_k, metric,
                float(self.params.get("lsh_candidate_multiplier", 32.0)),
            )
        else:  # ivf_sq8
            dists, ids = ivfops.ivf_sq_search(
                q, d["centroids"], d["slot_ids"], d["list_codes"],
                d["list_sqnorms"], d["vmin"], d["step"], eff_k, self._nprobe(),
                metric=metric, **self._probe_kwargs(),
            )
        return dists, ids

    def device_batch_search(self, queries: np.ndarray, k: int):
        """Dispatch without blocking: returns (dists_dev, ids_dev, n_rows)."""
        if self.artifact is None:
            raise RuntimeError("searcher not attached")
        q_np = np.ascontiguousarray(queries, dtype=np.float32)
        padded, b = pad_batch(q_np)
        dists, ids = self.device_kernel(jnp.asarray(padded), k)
        return dists, ids, b

    def batch_search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        dists, ids, b = self.device_batch_search(queries, k)
        out_d = np.asarray(dists)[:b]
        out_i = np.asarray(ids)[:b].astype(np.int64)
        if out_d.shape[1] < k:
            pad = k - out_d.shape[1]
            out_d = np.pad(out_d, ((0, 0), (0, pad)), constant_values=np.inf)
            out_i = np.pad(out_i, ((0, 0), (0, pad)), constant_values=-1)
        return out_d, out_i

    def estimated_ops_per_query(self, n_database: int) -> int:
        if self.artifact is None:
            return n_database
        meta = self.artifact.metadata
        if self.artifact.kind.startswith("ivf"):
            return int(
                meta.get("n_buckets", meta.get("nlist", 0))
                + self._nprobe() * meta.get("max_list_len", 0)
            )
        if self.artifact.kind == "graph":
            from vectordb_retrieval_tpu.models.graph import (
                beam_geometry,
                block_geometry,
            )

            ef_search = int(
                self.params.get("efSearch", meta.get("efSearch", 100))
            )
            if meta.get("mode") == "block":
                _, expand, iters = block_geometry(
                    int(meta["n_blocks"]), ef_search, 10,
                    block_len=int(meta.get("block_len", 128)),
                )
                return int(meta["n_blocks"]) + int(
                    expand * iters * meta.get("block_len", 0)
                )
            degree = int(meta.get("degree", 32) or 32)
            n = int(meta.get("n_vectors", n_database))
            _, expand, _, iters = beam_geometry(n, degree, ef_search, 10)
            return int(
                meta.get("n_entry", 0) or min(2048, max(16, n // 10))
            ) + int(iters * expand * degree)
        return int(n_database)
