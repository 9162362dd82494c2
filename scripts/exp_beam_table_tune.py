"""Sort-free beam + bf16 neighbour-vector table: validation + tuning.

The ablation (exp_beam_ablate.py) shows the [B, W*R] per-row vector gather
costs ~3.7 ms/iter (row-latency bound). The [N, R, d] table turns it into
[B, W] contiguous-block rows. bf16 halves the bytes; final candidates are
rescored in f32 by the caller (production) — here recall is computed on
bf16 routing + f32 rescore of the final k to mirror production.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.ops import graph as gops
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

N, D, K = 20_000, 64, 20
B, REPEATS = 256, 20


@functools.partial(
    jax.jit, static_argnames=("k", "ef", "expand", "iters", "keep")
)
def beam_nt(queries, nbr_vecs, nbr_sqn, adjacency, entry_ids, entry_vecs,
            entry_sqn, vectors, k, ef, expand, iters, keep):
    b = queries.shape[0]
    r = adjacency.shape[1]
    e = entry_ids.shape[0]
    big = jnp.inf
    rows = jnp.arange(b)[:, None]
    qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)

    seed_dots = jnp.dot(
        queries.astype(entry_vecs.dtype), entry_vecs.T,
        preferred_element_type=jnp.float32,
    )
    seed_d = qn[:, None] + entry_sqn[None, :] - 2.0 * seed_dots
    seed_d = jnp.where(entry_ids[None, :] >= 0, seed_d, big)
    seed_ids = jnp.broadcast_to(entry_ids[None, :], (b, e)).astype(jnp.int32)
    neg, sel0 = jax.lax.approx_max_k(-seed_d, ef, recall_target=1.0)
    beam_d = -neg
    beam_ids = jnp.take_along_axis(seed_ids, sel0, axis=1)
    beam_exp = jnp.zeros((b, ef), dtype=jnp.bool_)

    def body(state, _):
        beam_ids, beam_d, beam_exp = state
        sel_d = jnp.where(beam_exp | (beam_ids < 0), big, beam_d)
        _, sel = jax.lax.approx_max_k(-sel_d, expand, recall_target=1.0)
        sel_ids = jnp.take_along_axis(beam_ids, sel, axis=1)
        sel_valid = jnp.isfinite(jnp.take_along_axis(sel_d, sel, axis=1))
        beam_exp = beam_exp.at[rows, sel].set(True)
        safe_sel = jnp.where(sel_ids >= 0, sel_ids, 0)
        neigh = adjacency[safe_sel]  # [B, W, R]
        nvec = nbr_vecs[safe_sel]  # [B, W, R, d] ONE block gather
        nsqn = nbr_sqn[safe_sel]  # [B, W, R]
        dots = jnp.einsum(
            "bwrd,bd->bwr", nvec, queries.astype(nvec.dtype),
            preferred_element_type=jnp.float32,
        )
        nd = (qn[:, None, None] + nsqn - 2.0 * dots).reshape(b, expand * r)
        neigh = jnp.where(
            sel_valid[:, :, None] & (neigh >= 0), neigh, -1
        ).reshape(b, expand * r)
        nd = jnp.where(neigh >= 0, nd, big)
        in_beam = jnp.any(neigh[:, :, None] == beam_ids[:, None, :], axis=2)
        nd = jnp.where(in_beam, big, nd)
        cnd, cpos = jax.lax.approx_max_k(-nd, keep, recall_target=1.0)
        cand_d = -cnd
        cand_ids = jnp.take_along_axis(neigh, cpos, axis=1)
        eq = cand_ids[:, :, None] == cand_ids[:, None, :]
        tri = jnp.tril(jnp.ones((keep, keep), dtype=jnp.bool_), k=-1)
        dup = jnp.any(eq & tri[None], axis=2)
        cand_d = jnp.where(dup | (cand_ids < 0), big, cand_d)
        cat_ids = jnp.concatenate([beam_ids, cand_ids], axis=1)
        cat_d = jnp.concatenate([beam_d, cand_d], axis=1)
        cat_exp = jnp.concatenate(
            [beam_exp, jnp.zeros((b, keep), dtype=jnp.bool_)], axis=1
        )
        new_d, pos = jax.lax.approx_max_k(-cat_d, ef, recall_target=1.0)
        new_d = -new_d
        new_ids = jnp.take_along_axis(cat_ids, pos, axis=1)
        new_exp = jnp.take_along_axis(cat_exp, pos, axis=1)
        new_ids = jnp.where(jnp.isfinite(new_d), new_ids, -1)
        return (new_ids, new_d, new_exp), None

    (beam_ids, beam_d, beam_exp), _ = jax.lax.scan(
        body, (beam_ids, beam_d, beam_exp), None, length=iters
    )
    # final: fetch top-(k+8) then exact f32 rescore (production path)
    kk = min(k + 8, ef)
    _, pos = jax.lax.approx_max_k(-beam_d, kk, recall_target=1.0)
    fids = jnp.take_along_axis(beam_ids, pos, axis=1)
    safe = jnp.where(fids >= 0, fids, 0)
    fvec = vectors[safe]  # [B, kk, d] f32
    diff = fvec - queries[:, None, :]
    fd = jnp.sum(diff * diff, axis=-1)
    fd = jnp.where(fids >= 0, fd, big)
    out_d, opos = jax.lax.approx_max_k(-fd, k, recall_target=1.0)
    return -out_d, jnp.take_along_axis(fids, opos, axis=1)


def timed(fn, queries_r, *arrays):
    def stream(qs, *arrs):
        def sbody(carry, qb):
            d, i = fn(qb + carry * jnp.float32(0.0), *arrs)
            return jnp.max(jnp.where(jnp.isfinite(d), d, 0.0)) * 1e-38, i

        _, ids = jax.lax.scan(sbody, jnp.float32(0.0), qs)
        return ids

    compiled = jax.jit(stream)
    np.asarray(compiled(queries_r, *arrays))
    start = time.perf_counter()
    ids = np.asarray(compiled(queries_r, *arrays))
    return ids, time.perf_counter() - start


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    queries_r = jnp.asarray(
        rng.standard_normal((REPEATS, B, D)).astype(np.float32)
    )
    gt = np.asarray(dops.exact_search(queries_r[0], x, K, metric="l2")[1])
    sqn = dops.sq_norms(x)

    configs = [
        # (degree, n_entry, ef, W, iters, keep, dtype)
        (64, 2048, 128, 24, 3, 96, jnp.bfloat16),
        (64, 2048, 128, 24, 2, 96, jnp.bfloat16),
        (64, 2048, 128, 16, 3, 96, jnp.bfloat16),
        (64, 4096, 128, 16, 2, 96, jnp.bfloat16),
        (64, 2048, 128, 24, 3, 96, jnp.float32),
        (32, 2048, 128, 48, 3, 96, jnp.bfloat16),
        (32, 1024, 128, 32, 4, 64, jnp.bfloat16),
        (64, 2048, 96, 16, 3, 64, jnp.bfloat16),
        (64, 4096, 128, 24, 2, 96, jnp.bfloat16),
        (64, 4096, 128, 24, 3, 96, jnp.bfloat16),
    ]
    acache, ecache = {}, {}
    for r_, ne, ef, w, it, ck, dt in configs:
        if r_ not in acache:
            print(f"building degree-{r_} graph...")
            acache[r_] = jax.block_until_ready(gops.build_knn_graph(x, r_))
        if ne not in ecache:
            ecache[ne] = jax.block_until_ready(
                gops.pick_entry_points(x, ne, seed=42)
            )
        adjacency, entries = acache[r_], ecache[ne]
        safe_adj = jnp.where(adjacency >= 0, adjacency, 0)
        nbr_vecs = jax.block_until_ready(x.astype(dt)[safe_adj])
        nbr_sqn = sqn[safe_adj]
        safe_e = jnp.where(entries >= 0, entries, 0)
        evecs, esqn = x[safe_e], sqn[safe_e]
        mb = nbr_vecs.size * nbr_vecs.dtype.itemsize / 1e6
        fn = lambda qb, nv, ns, adj, ent, ev, es, xv, ef=ef, w=w, it=it, ck=ck: (
            beam_nt(qb, nv, ns, adj, ent, ev, es, xv, K, ef, w, it, ck)
        )
        ids, el = timed(
            fn, queries_r, nbr_vecs, nbr_sqn, adjacency, entries, evecs,
            esqn, x,
        )
        qps = B * REPEATS / el
        rec = sum(
            len(set(np.asarray(ids)[0][i].tolist()) & set(gt[i].tolist()))
            for i in range(B)
        ) / (B * K)
        flag = " <== PASS" if (qps > 23886 and rec >= 0.9156) else ""
        print(
            f"R={r_:2d} E={ne:4d} ef={ef:3d} W={w:2d} it={it} keep={ck:3d} "
            f"{str(nbr_vecs.dtype):8s} table={mb:5.0f}MB: {qps:8.0f} QPS "
            f"recall={rec:.4f}{flag}"
        )


if __name__ == "__main__":
    main()
