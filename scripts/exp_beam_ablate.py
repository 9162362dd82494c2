"""Per-component ablation of the sort-free beam body at production shapes.

Copies graph_search with toggles; each row disables ONE component to show
its cost share. Config: R=64 E=2048 ef=128 W=24 keep=96 it=3 on 20k x 64d.
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
R, E, EF, W, KEEP, ITERS = 64, 2048, 128, 24, 96, 3


@functools.partial(jax.jit, static_argnames=("skip",))
def beam(queries, vectors, adjacency, entry_ids, sqnorms, skip=""):
    b = queries.shape[0]
    r = adjacency.shape[1]
    e = entry_ids.shape[0]
    big = jnp.inf
    rows = jnp.arange(b)[:, None]
    ef, keep, expand = EF, KEEP, W

    safe_entry = jnp.where(entry_ids >= 0, entry_ids, 0)
    entry_vecs = vectors[safe_entry]
    seed_dots = jnp.dot(
        queries, entry_vecs.T, preferred_element_type=jnp.float32
    )
    qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)
    seed_d = qn[:, None] + sqnorms[safe_entry][None, :] - 2.0 * seed_dots
    seed_ids = jnp.broadcast_to(entry_ids[None, :], (b, e)).astype(jnp.int32)
    neg, sel0 = jax.lax.approx_max_k(-seed_d, ef, recall_target=1.0)
    beam_d = -neg
    beam_ids = jnp.take_along_axis(seed_ids, sel0, axis=1)
    beam_exp = jnp.zeros((b, ef), dtype=jnp.bool_)

    def body(state, _):
        beam_ids, beam_d, beam_exp = state
        if "select" in skip:
            sel = jnp.broadcast_to(jnp.arange(expand)[None], (b, expand))
            sel_ids = jnp.take_along_axis(beam_ids, sel, axis=1)
            sel_valid = jnp.ones((b, expand), jnp.bool_)
        else:
            sel_d = jnp.where(beam_exp | (beam_ids < 0), big, beam_d)
            _, sel = jax.lax.approx_max_k(-sel_d, expand, recall_target=1.0)
            sel_ids = jnp.take_along_axis(beam_ids, sel, axis=1)
            sel_valid = jnp.isfinite(jnp.take_along_axis(sel_d, sel, axis=1))
        if "scatter" not in skip:
            beam_exp = beam_exp.at[rows, sel].set(True)
        safe_sel = jnp.where(sel_ids >= 0, sel_ids, 0)
        neigh = adjacency[safe_sel].reshape(b, expand * r)
        if "mask" not in skip:
            neigh = jnp.where(
                jnp.repeat(sel_valid, r, axis=1) & (neigh >= 0), neigh, -1
            )
        if "gather" in skip:
            nd = (neigh % 1000).astype(jnp.float32) * 1e-3 + qn[:, None] * 0.0
        else:
            safe = jnp.where(neigh >= 0, neigh, 0)
            vecs = vectors[safe]
            dots = jnp.einsum(
                "bcd,bd->bc", vecs, queries,
                preferred_element_type=jnp.float32,
            )
            nd = qn[:, None] + sqnorms[safe] - 2.0 * dots
            nd = jnp.where(neigh >= 0, nd, big)
        if "dedupbeam" not in skip:
            in_beam = jnp.any(
                neigh[:, :, None] == beam_ids[:, None, :], axis=2
            )
            nd = jnp.where(in_beam | (neigh < 0), big, nd)
        if "preselect" in skip:
            cand_d, cand_ids = nd[:, :keep], neigh[:, :keep]
        else:
            cnd, cpos = jax.lax.approx_max_k(-nd, keep, recall_target=1.0)
            cand_d = -cnd
            cand_ids = jnp.take_along_axis(neigh, cpos, axis=1)
        if "dedupintra" not in skip:
            eq = cand_ids[:, :, None] == cand_ids[:, None, :]
            tri = jnp.tril(jnp.ones((keep, keep), dtype=jnp.bool_), k=-1)
            dup = jnp.any(eq & tri[None], axis=2)
            cand_d = jnp.where(dup | (cand_ids < 0), big, cand_d)
        if "merge" in skip:
            new_ids, new_d, new_exp = beam_ids, beam_d, beam_exp
        else:
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
        body, (beam_ids, beam_d, beam_exp), None, length=ITERS
    )
    out_d, pos = jax.lax.approx_max_k(-beam_d, K, recall_target=1.0)
    return -out_d, jnp.take_along_axis(beam_ids, pos, axis=1)


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
    adjacency = jax.block_until_ready(gops.build_knn_graph(x, R))
    entries = jax.block_until_ready(gops.pick_entry_points(x, E, seed=42))
    sqn = dops.sq_norms(x)

    base = None
    for skip in ("", "select", "scatter", "mask", "gather", "dedupbeam",
                 "preselect", "dedupintra", "merge", "seedonly"):
        if skip == "seedonly":
            fn = lambda qb, xv, adj, ent, sq: beam(
                qb, xv, adj, ent, sq,
                skip="select,scatter,mask,gather,dedupbeam,preselect,"
                     "dedupintra,merge",
            )
        else:
            fn = lambda qb, xv, adj, ent, sq, skip=skip: beam(
                qb, xv, adj, ent, sq, skip=skip
            )
        ids, el = timed(fn, queries_r, x, adjacency, entries, sqn)
        ms = el / REPEATS * 1000
        if skip == "":
            base = ms
        delta = "" if base is None or skip == "" else f"  saves {base - ms:6.2f} ms"
        rec = ""
        if skip == "":
            hits = sum(
                len(set(np.asarray(ids)[0][i].tolist()) & set(gt[i].tolist()))
                for i in range(B)
            )
            rec = f"  recall={hits / (B * K):.4f}"
        print(f"skip={skip or '(none)':12s} {ms:8.2f} ms/batch{delta}{rec}")


if __name__ == "__main__":
    main()
