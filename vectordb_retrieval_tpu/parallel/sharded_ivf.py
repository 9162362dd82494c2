"""Sharded IVF: one IVF partition per chip + collective top-k merge.

The standard way distributed ANN systems scale IVF (one independent
coarse-quantized index per shard of the database, query fans out to every
shard, per-shard top-k lists merge) mapped onto the TPU mesh: each device
holds its own ``[nlist, max_len]`` padded lists over its row shard, the
probe-scan runs per device inside ``shard_map``, and the ``k x P``
candidates merge via ``all_gather`` + top-k over ICI — identical collective
shape to the sharded exact search (parallel/sharded.py).

Slot ids are stored as *global* database row ids at build time, so no id
translation is needed at merge.

nprobe semantics: like the single-chip family, each shard defaults to the
exact reference "probe the nprobe nearest LISTS" semantics
(ops/ivf.exact_probe_mask over its own lists — the same per-shard
``index.nprobe`` FAISS IndexShards would apply), with the bucket probe
budget sized by the cross-shard worst case (``probe_cum``) and spare
slots masked. Pass ``nprobe_lists=0`` (searcher param
``nprobe_semantics: buckets``) for the generous superset where slack
probe slots spill to next-nearest lists.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.ops import ivf as ivfops
from vectordb_retrieval_tpu.ops import pq as pqops
from vectordb_retrieval_tpu.ops import sq as sqops
from vectordb_retrieval_tpu.ops.kmeans import kmeans_assign, kmeans_fit


def gather_merge(
    d: jax.Array, i: jax.Array, axis: str, k: int, out_k: int = 0
):
    """Inside shard_map: all_gather per-shard top-k and reduce to global
    top-k (the shared ICI collective shape of every sharded searcher).

    ``out_k`` (default ``k``) is the merged width: callers whose requested
    k exceeds the PER-SHARD candidate count must pass
    ``min(requested_k, n_shards * k)`` so cross-shard results are not
    silently truncated to one shard's worth."""
    all_d = jax.lax.all_gather(d, axis)  # [P, B, k]
    all_i = jax.lax.all_gather(i, axis)
    p = all_d.shape[0]
    b = d.shape[0]
    cat_d = jnp.transpose(all_d, (1, 0, 2)).reshape(b, p * k)
    cat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, p * k)
    md, sel = dops.top_k_smallest(cat_d, min(out_k or k, p * k))
    return md, jnp.take_along_axis(cat_i, sel, axis=1)


def _np_coarse(centroids, bucket_lists) -> np.ndarray:
    """Host-side ops/ivf.coarse_table: dead buckets (list id -1 from the
    round-4 padded layout) get 1e9 sentinel rows instead of wrapping to
    ``centroids[-1]`` (which would alias a real list's centroid under a
    wrong list id and corrupt the exact-probe segment-min)."""
    c = np.asarray(centroids)
    tab = c[np.maximum(np.asarray(bucket_lists), 0)]
    return np.where(
        (np.asarray(bucket_lists) >= 0)[:, None], tab, np.float32(1e9)
    )


def _shard_bucketed_layouts(x, n_shards, nlist, seed, train_iters):
    """Per-shard coarse training + BUCKETED list layout with global ids.

    Returns ``(layouts, max_buckets, max_len)`` where each layout is
    ``(centroids, global_slot_ids [nb, L], bucket_lists [nb])``. Bucketed
    (fixed-length, centroid-duplicating) layouts replace pad-to-longest
    here for the same reason as the single-chip family: one skewed list —
    or one skewed shard — would otherwise inflate every shard's stack.
    """
    n, d = x.shape
    per = -(-n // n_shards)
    layouts = []
    max_buckets = max_len = 1
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, n)
        if hi <= lo:
            # empty trailing shard (n << n_shards*per): one dead bucket
            # whose sentinel centroid is never probed
            layouts.append(
                (
                    np.full((1, d), 1e9, np.float32),
                    np.full((1, 8), -1, np.int32),
                    np.zeros(1, np.int32),
                    np.zeros(0, np.int32),
                )
            )
            max_len = max(max_len, 8)
            continue
        xs = jnp.asarray(x[lo:hi])
        local_nlist = min(nlist, hi - lo)
        centroids, _ = kmeans_fit(
            xs, local_nlist, seed=seed + s, iters=train_iters
        )
        assign = np.asarray(kmeans_assign(xs, centroids))
        slot_ids, bucket_lists, _ = ivfops.build_bucketed_lists(
            assign, local_nlist
        )
        slot_g = np.where(slot_ids >= 0, slot_ids + lo, -1)
        layouts.append((np.asarray(centroids), slot_g, bucket_lists, assign))
        max_buckets = max(max_buckets, slot_ids.shape[0])
        max_len = max(max_len, slot_ids.shape[1])
    return layouts, max_buckets, max_len


def _sharded_probe_cum(layouts, nlist: int) -> list:
    """Cross-shard probe-budget table (ops/ivf.probe_budget_cum semantics).

    ``cum[r]`` must cover the ``r+1`` nearest lists on EVERY shard, so take
    the elementwise max of each shard's sorted-descending per-list bucket
    counts before the cumsum."""
    worst = np.zeros(max(nlist, 1), np.int64)
    for _c, _s, bucket_lists, _a in layouts:
        counts = np.bincount(
            bucket_lists[bucket_lists >= 0], minlength=max(nlist, 1)
        )[:nlist]
        srt = np.sort(counts)[::-1]
        worst[: srt.size] = np.maximum(worst[: srt.size], srt)
    cum = np.cumsum(np.maximum(worst, 1))
    return [int(v) for v in cum]


def build_sharded_ivf_flat(
    x: np.ndarray,
    mesh: Mesh,
    nlist: int,
    seed: int = 123,
    train_iters: int = 20,
    axis: str = "db",
):
    """Per-shard IVF-Flat build; returns device-sharded arrays + metadata.

    Rows are split contiguously across the mesh axis; each shard trains its
    own ``nlist`` centroids (over its rows) and lays out padded lists whose
    slot ids are global row indices.
    """
    layouts, max_buckets, max_len = _shard_bucketed_layouts(
        x, mesh.shape[axis], nlist, seed, train_iters
    )
    n_shards = mesh.shape[axis]
    d = x.shape[1]
    # coarse table per shard is the BUCKET table (duplicated centroid rows,
    # ops/ivf.build_bucketed_lists) — skewed lists cannot blow padding up;
    # dead bucket rows carry 1e9 centroids so the coarse top-k skips them
    cent_stack = np.full((n_shards, max_buckets, d), 1e9, dtype=np.float32)
    slot_stack = np.full(
        (n_shards, max_buckets, max_len), -1, dtype=np.int32
    )
    vec_stack = np.zeros(
        (n_shards, max_buckets, max_len, d), dtype=np.float32
    )
    # dead/padding buckets map to list 0: their 1e9 centroids can never
    # win a segment-min or a probe slot ahead of a real bucket, and their
    # slots are -1 (masked in the scan) — so the exact-semantics selector
    # stays correct on ragged shards
    bl_stack = np.zeros((n_shards, max_buckets), dtype=np.int32)
    for s, (centroids, slot_g, bucket_lists, _assign) in enumerate(layouts):
        nb, ml = slot_g.shape
        cent_stack[s, :nb] = _np_coarse(centroids, bucket_lists)
        slot_stack[s, :nb, :ml] = slot_g
        bl_stack[s, :nb] = np.maximum(bucket_lists, 0)
        safe = np.where(slot_stack[s] >= 0, slot_stack[s], 0)
        vec_stack[s] = x[safe] * (slot_stack[s] >= 0)[:, :, None]
    sqn_stack = np.sum(vec_stack * vec_stack, axis=-1)

    sh = lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
    )
    return {
        "centroids": sh(cent_stack),
        "slot_ids": sh(slot_stack),
        "list_vecs": sh(vec_stack),
        "list_sqnorms": sh(sqn_stack),
        "bucket_lists": sh(bl_stack),
    }, {
        "nlist": nlist,
        "n_buckets": max_buckets,
        "max_list_len": max_len,
        "n_shards": n_shards,
        "probe_cum": _sharded_probe_cum(layouts, nlist),
    }


def _query_specs(q_axis):
    """Query/output partition specs: replicated, or data-parallel over
    ``q_axis`` (each query block merges inside its own db ring)."""
    if q_axis is None:
        return P(), (P(), P())
    return P(q_axis, None), (P(q_axis, None), P(q_axis, None))


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "metric", "mesh", "axis", "q_axis",
        "nlist", "nprobe_lists",
    ),
)
def sharded_ivf_flat_search(
    queries: jax.Array,
    data: dict,
    k: int,
    nprobe: int,
    mesh: Mesh,
    metric: str = "l2",
    axis: str = "db",
    q_axis: str = None,
    nlist: int = 0,
    nprobe_lists: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Fan-out probe scan per shard + all_gather candidate merge.

    ``nlist``/``nprobe_lists`` (with a ``bucket_lists`` entry in ``data``)
    restrict each shard to the exact reference "probe nprobe lists"
    semantics (ops/ivf.exact_probe_mask); 0 keeps the generous bucket
    budget."""
    exact_sem = bool(nprobe_lists and nlist) and "bucket_lists" in data

    def local(q, cents, slots, vecs, sqns, *bl):
        kw = (
            dict(
                bucket_lists=bl[0][0], nlist=nlist,
                nprobe_lists=nprobe_lists,
            )
            if exact_sem
            else {}
        )
        d, i = ivfops.ivf_flat_search(
            q, cents[0], slots[0], vecs[0], sqns[0], k, nprobe,
            metric=metric, **kw,
        )
        return gather_merge(d, i, axis, k)

    q_spec, out_specs = _query_specs(q_axis)
    in_specs = (
        q_spec,
        P(axis, None, None),
        P(axis, None, None),
        P(axis, None, None, None),
        P(axis, None, None),
    )
    operands = [
        data["centroids"], data["slot_ids"], data["list_vecs"],
        data["list_sqnorms"],
    ]
    if exact_sem:
        in_specs = in_specs + (P(axis, None),)
        operands.append(data["bucket_lists"])
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(queries, *operands)


def build_sharded_ivf_coded(
    x: np.ndarray,
    mesh: Mesh,
    nlist: int,
    coding: str = "sq8",
    m: int = 8,
    seed: int = 123,
    train_iters: int = 20,
    axis: str = "db",
    pq_rotations: int = 0,
):
    """Per-shard IVF with quantized (PQ residual / SQ8) list payloads.

    Same scale-out shape as :func:`build_sharded_ivf_flat` — one
    independent coarse index per row shard, global slot ids — but each
    shard stores codes instead of raw vectors and trains its OWN
    quantizer (PQ codebooks on local residuals / local SQ ranges), which
    is how distributed ANN deployments shard quantized indexes: the
    quantizer adapts to the local distribution and no cross-shard
    codebook sync is needed.
    """
    if coding not in ("pq", "sq8"):
        raise ValueError(f"coding must be 'pq' or 'sq8', got {coding!r}")
    n_shards = mesh.shape[axis]
    n, d = x.shape
    per = -(-n // n_shards)
    layouts, max_buckets, max_len = _shard_bucketed_layouts(
        x, n_shards, nlist, seed, train_iters
    )
    code_w = m if coding == "pq" else d
    # PQ codebook size must be UNIFORM across shards (the stacked
    # [n_shards, m, ksub, dsub] tensor is rectangular), so it is bounded
    # by the smallest non-empty shard
    ksub = min(
        [256]
        + [a.shape[0] for (_, _, _, a) in layouts if a.shape[0] > 0]
    )
    shards = []
    for s, (centroids, slot_g, bucket_lists, assign) in enumerate(layouts):
        lo = s * per
        hi = min((s + 1) * per, n)
        if hi <= lo:  # empty shard: zero codes under the dead bucket
            nbs, mls = slot_g.shape
            if coding == "pq":
                extras = {"codebooks": np.zeros((m, ksub, d // m), np.float32)}
                if pq_rotations:
                    bs = pq_rotations
                    extras["list_rotations"] = np.broadcast_to(
                        np.eye(bs, dtype=np.float32),
                        (nlist, d // bs, bs, bs),
                    ).copy()
            else:
                extras = {
                    "vmin": np.zeros(d, np.float32),
                    "step": np.full(d, 1e-12, np.float32),
                }
            shards.append(
                (
                    centroids, slot_g, bucket_lists,
                    np.zeros((nbs, mls, code_w), np.uint8),
                    np.zeros((nbs, mls), np.float32),
                    extras,
                )
            )
            continue
        xs = jnp.asarray(x[lo:hi])
        cents_dev = jnp.asarray(centroids)
        assign_dev = jnp.asarray(assign)
        # per-row codes in LOCAL row order; gathered into buckets below
        if coding == "pq":
            residuals = xs - cents_dev[assign_dev]
            if pq_rotations:
                rots, codebooks = pqops.train_per_list_rotations(
                    residuals, assign_dev, nlist, m, pq_rotations,
                    ksub=ksub, seed=seed + s, iters=train_iters,
                )
                codes = np.asarray(pqops.pq_encode_rotated(
                    residuals, assign_dev, rots, codebooks
                ))
                extras = {
                    "codebooks": np.asarray(codebooks),
                    "list_rotations": np.asarray(rots),
                }
            else:
                codebooks = pqops.pq_train(
                    residuals, m, ksub=ksub, seed=seed + s, iters=train_iters
                )
                codes = np.asarray(pqops.pq_encode(residuals, codebooks))
                extras = {"codebooks": np.asarray(codebooks)}
            sqn = np.asarray(pqops.pq_code_sqnorms(
                jnp.asarray(codes), codebooks
            ))
        else:
            vmin, step = sqops.sq_train(xs)
            codes_dev = sqops.sq_encode(xs, vmin, step)
            x_hat = sqops.sq_decode(codes_dev, vmin, step)
            codes = np.asarray(codes_dev)
            sqn = np.asarray(jnp.sum(x_hat * x_hat, axis=-1))
            extras = {"vmin": np.asarray(vmin), "step": np.asarray(step)}
        local = np.where(slot_g >= 0, slot_g - lo, 0)
        shards.append(
            (centroids, slot_g, bucket_lists, codes[local], sqn[local], extras)
        )

    code_dt = shards[0][3].dtype
    # bucketed stacks: dead bucket rows carry 1e9 coarse centroids
    cent_stack = np.full((n_shards, max_buckets, d), 1e9, dtype=np.float32)
    slot_stack = np.full(
        (n_shards, max_buckets, max_len), -1, dtype=np.int32
    )
    code_stack = np.zeros(
        (n_shards, max_buckets, max_len, code_w), dtype=code_dt
    )
    sqn_stack = np.zeros((n_shards, max_buckets, max_len), dtype=np.float32)
    bl_stack = np.zeros((n_shards, max_buckets), dtype=np.int32)
    extra_stacks: dict = {}
    for s, (cents, slot_g, bucket_lists, codes_l, sqn_l, extras) in enumerate(
        shards
    ):
        nb, ml = slot_g.shape
        cent_stack[s, :nb] = _np_coarse(cents, bucket_lists)
        slot_stack[s, :nb, :ml] = slot_g
        code_stack[s, :nb, :ml] = codes_l
        sqn_stack[s, :nb, :ml] = sqn_l
        bl_stack[s, :nb] = np.maximum(bucket_lists, 0)
        for key, val in extras.items():
            extra_stacks.setdefault(key, []).append(val)

    sh = lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
    )
    data = {
        "centroids": sh(cent_stack),
        "slot_ids": sh(slot_stack),
        "list_codes": sh(code_stack),
        "list_sqnorms": sh(sqn_stack),
        "bucket_lists": sh(bl_stack),
    }
    for key, vals in extra_stacks.items():
        data[key] = sh(np.stack(vals))
    return data, {
        "nlist": nlist,
        "n_buckets": max_buckets,
        "max_list_len": max_len,
        "n_shards": n_shards,
        "coding": coding,
        "probe_cum": _sharded_probe_cum(
            [(c, s, bl, None) for c, s, bl, *_ in shards], nlist
        ),
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "metric", "mesh", "axis", "coding", "q_axis",
        "nlist", "nprobe_lists",
    ),
)
def sharded_ivf_coded_search(
    queries: jax.Array,
    data: dict,
    k: int,
    nprobe: int,
    mesh: Mesh,
    coding: str = "sq8",
    metric: str = "l2",
    axis: str = "db",
    q_axis: str = None,
    nlist: int = 0,
    nprobe_lists: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Fan-out quantized probe scan per shard + all_gather merge.

    ``nlist``/``nprobe_lists`` select the exact reference nprobe
    semantics per shard (see :func:`sharded_ivf_flat_search`)."""
    exact_sem = bool(nprobe_lists and nlist) and "bucket_lists" in data
    kw_of = (
        (lambda bl: dict(
            bucket_lists=bl[0], nlist=nlist, nprobe_lists=nprobe_lists
        ))
        if exact_sem
        else (lambda bl: {})
    )
    if coding == "pq" and "list_rotations" in data:

        def local(q, cents, slots, codes, sqns, cbs, rots, rbl, *bl):
            d, i = ivfops.ivf_pq_search(
                q, cents[0], slots[0], codes[0], sqns[0], cbs[0],
                k, nprobe, metric=metric,
                list_rotations=rots[0], rot_bucket_lists=rbl[0],
                **kw_of(bl[0] if bl else None),
            )
            return gather_merge(d, i, axis, k)

        operands = [
            data["centroids"], data["slot_ids"], data["list_codes"],
            data["list_sqnorms"], data["codebooks"],
            data["list_rotations"], data["bucket_lists"],
        ]
    elif coding == "pq":

        def local(q, cents, slots, codes, sqns, cbs, *bl):
            d, i = ivfops.ivf_pq_search(
                q, cents[0], slots[0], codes[0], sqns[0], cbs[0],
                k, nprobe, metric=metric, **kw_of(bl[0] if bl else None),
            )
            return gather_merge(d, i, axis, k)

        operands = [
            data["centroids"], data["slot_ids"], data["list_codes"],
            data["list_sqnorms"], data["codebooks"],
        ]
    else:

        def local(q, cents, slots, codes, sqns, vmin, step, *bl):
            d, i = ivfops.ivf_sq_search(
                q, cents[0], slots[0], codes[0], sqns[0], vmin[0], step[0],
                k, nprobe, metric=metric, **kw_of(bl[0] if bl else None),
            )
            return gather_merge(d, i, axis, k)

        operands = [
            data["centroids"], data["slot_ids"], data["list_codes"],
            data["list_sqnorms"], data["vmin"], data["step"],
        ]

    if exact_sem:
        operands.append(data["bucket_lists"])
    specs = tuple(
        P(axis, *([None] * (op.ndim - 1))) for op in operands
    )
    q_spec, out_specs = _query_specs(q_axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(q_spec,) + specs,
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(queries, *operands)
