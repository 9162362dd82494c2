"""Experiment: neighbor-vector-table beam vs current gather beam.

Hypothesis: the beam is row-gather latency bound (~0.2us/row on HLO
gathers). Storing each node's neighbour vectors contiguously as an
[N, R, d] table turns the per-iteration [B*W*R]-row gather into a
[B*W]-row gather of contiguous R*d blocks — R x fewer gather rows at the
cost of R x index memory (optionally bf16).

Run on the real TPU: python scripts/exp_graph_neighbor_table.py
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
B = 256
REPEATS = 8
EF, EXPAND, ITERS = 125, 48, 5  # current production config (efSearch=100)
R = 32  # degree (M=16)


@functools.partial(
    jax.jit, static_argnames=("k", "ef", "expand", "iters", "metric")
)
def nbr_table_search(
    queries,
    nbr_vecs,  # [N, R, d] neighbour vector table (f32 or bf16)
    nbr_sqn,  # [N, R] f32 norms of neighbour rows
    adjacency,  # [N, R]
    entry_ids,  # [E]
    entry_vecs,  # [E, d] entry-point vectors
    entry_sqn,  # [E]
    k,
    ef=64,
    expand=4,
    iters=12,
    metric="l2",
):
    b = queries.shape[0]
    r = adjacency.shape[1]
    e = entry_ids.shape[0]
    big = jnp.inf

    qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)

    # seed beam from entry points: one [B, E] matmul
    q_cast = queries.astype(entry_vecs.dtype)
    seed_dots = jnp.dot(
        q_cast, entry_vecs.T, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        seed_d = qn[:, None] + entry_sqn[None, :] - 2.0 * seed_dots
    else:
        seed_d = -seed_dots
    seed_d = jnp.where(entry_ids[None, :] >= 0, seed_d, big)
    seed_ids = jnp.broadcast_to(entry_ids[None, :], (b, e)).astype(jnp.int32)
    if e > ef:
        neg, sel = jax.lax.approx_max_k(-seed_d, ef, recall_target=1.0)
        seed_d = -neg
        seed_ids = jnp.take_along_axis(seed_ids, sel, axis=1)
        e = ef
    pad = ef - e
    beam_ids = jnp.pad(
        seed_ids, ((0, 0), (0, max(pad, 0))), constant_values=-1
    )[:, :ef]
    beam_d = jnp.pad(
        seed_d, ((0, 0), (0, max(pad, 0))), constant_values=big
    )[:, :ef]
    beam_exp = jnp.zeros((b, ef), dtype=jnp.bool_)

    def body(state, _):
        beam_ids, beam_d, beam_exp = state
        sel_d = jnp.where(beam_exp | (beam_ids < 0), big, beam_d)
        _, sel = jax.lax.approx_max_k(-sel_d, expand, recall_target=1.0)
        sel_ids = jnp.take_along_axis(beam_ids, sel, axis=1)
        sel_valid = jnp.isfinite(jnp.take_along_axis(sel_d, sel, axis=1))
        beam_exp = beam_exp | jnp.zeros_like(beam_exp).at[
            jnp.arange(b)[:, None], sel
        ].set(True)
        safe_sel = jnp.where(sel_ids >= 0, sel_ids, 0)
        # ONE contiguous-block gather: [B, W] rows of (R, d)
        neigh = adjacency[safe_sel]  # [B, W, R]
        nvec = nbr_vecs[safe_sel]  # [B, W, R, d]
        nsqn = nbr_sqn[safe_sel]  # [B, W, R]
        dots = jnp.einsum(
            "bwrd,bd->bwr",
            nvec,
            queries.astype(nvec.dtype),
            preferred_element_type=jnp.float32,
        )
        if metric == "l2":
            nd = qn[:, None, None] + nsqn - 2.0 * dots
        else:
            nd = -dots
        neigh = jnp.where(
            sel_valid[:, :, None] & (neigh >= 0), neigh, -1
        ).reshape(b, expand * r)
        nd = jnp.where(neigh >= 0, nd.reshape(b, expand * r), big)
        cat_ids = jnp.concatenate([beam_ids, neigh], axis=1)
        cat_d = jnp.concatenate([beam_d, nd], axis=1)
        cat_exp = jnp.concatenate(
            [beam_exp, jnp.zeros_like(neigh, dtype=jnp.bool_)], axis=1
        )
        sort_key = jnp.where(
            cat_ids < 0,
            jnp.int32(2**31 - 1),
            cat_ids * 2 + (1 - cat_exp.astype(jnp.int32)),
        )
        order = jnp.argsort(sort_key, axis=1)
        s_ids = jnp.take_along_axis(cat_ids, order, axis=1)
        s_d = jnp.take_along_axis(cat_d, order, axis=1)
        s_exp = jnp.take_along_axis(cat_exp, order, axis=1)
        dup = jnp.concatenate(
            [
                jnp.zeros((b, 1), dtype=jnp.bool_),
                s_ids[:, 1:] == s_ids[:, :-1],
            ],
            axis=1,
        )
        s_d = jnp.where(dup | (s_ids < 0), big, s_d)
        new_d, pos = jax.lax.approx_max_k(-s_d, ef, recall_target=1.0)
        new_d = -new_d
        new_ids = jnp.take_along_axis(s_ids, pos, axis=1)
        new_exp = jnp.take_along_axis(s_exp, pos, axis=1)
        new_ids = jnp.where(jnp.isfinite(new_d), new_ids, -1)
        return (new_ids, new_d, new_exp), None

    (beam_ids, beam_d, beam_exp), _ = jax.lax.scan(
        body, (beam_ids, beam_d, beam_exp), None, length=iters
    )
    kk = min(k, ef)
    out_d, pos = jax.lax.approx_max_k(-beam_d, kk, recall_target=1.0)
    out_ids = jnp.take_along_axis(beam_ids, pos, axis=1)
    return -out_d, out_ids


def timed_stream(fn, queries_r, *arrays):
    """Fused REPEATS-pass stream, one compiled program, host materialise."""

    def stream(qs, *arrs):
        def body(carry, qb):
            d, i = fn(qb + carry * jnp.float32(0.0), *arrs)
            return jnp.max(jnp.where(jnp.isfinite(d), d, 0.0)) * jnp.float32(
                1e-38
            ), i

        _, ids = jax.lax.scan(body, jnp.float32(0.0), qs)
        return ids

    compiled = jax.jit(stream)
    np.asarray(compiled(queries_r, *arrays))  # warm-up
    start = time.perf_counter()
    ids = np.asarray(compiled(queries_r, *arrays))
    elapsed = time.perf_counter() - start
    return ids, elapsed


def recall(ids, gt):
    hits = 0
    for i in range(ids.shape[0]):
        hits += len(set(ids[i].tolist()) & set(gt[i].tolist()))
    return hits / float(gt.shape[0] * gt.shape[1])


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    queries_r = jnp.asarray(
        rng.standard_normal((REPEATS, B, D)).astype(np.float32)
    )
    q0 = queries_r[0]

    gt_d, gt_i = dops.exact_search(q0, x, K, metric="l2")
    gt_i = np.asarray(gt_i)

    print("building graph...")
    t0 = time.perf_counter()
    adjacency = gops.build_knn_graph(x, R)
    entries = gops.pick_entry_points(x, min(2048, max(16, N // 64)), seed=42)
    adjacency, entries = jax.block_until_ready((adjacency, entries))
    print(f"build {time.perf_counter() - t0:.1f}s")
    sqn = dops.sq_norms(x)

    # --- current production beam ---
    fn_cur = lambda qb, xv, adj, ent, sq: gops.graph_search(
        qb, xv, adj, ent, K, ef=EF, expand=EXPAND, iters=ITERS,
        metric="l2", sqnorms=sq,
    )
    ids_c, el_c = timed_stream(fn_cur, queries_r, x, adjacency, entries, sqn)
    qps_c = B * REPEATS / el_c
    rec_c = recall(np.asarray(ids_c)[0], gt_i)
    print(f"current beam:      {qps_c:10.0f} QPS  recall@{K}={rec_c:.4f}")

    # --- neighbour-table beam (f32 and bf16 tables) ---
    safe_adj = jnp.where(adjacency >= 0, adjacency, 0)
    ent_safe = jnp.where(entries >= 0, entries, 0)
    ent_vecs = x[ent_safe]
    ent_sqn = sqn[ent_safe]
    nbr_sqn = sqn[safe_adj]  # [N, R]
    for dt, label in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        nbr_vecs = x.astype(dt)[safe_adj]  # [N, R, d]
        nbr_vecs = jax.block_until_ready(nbr_vecs)
        mb = nbr_vecs.size * nbr_vecs.dtype.itemsize / 1e6
        fn_nt = lambda qb, nv, ns, adj, ent, ev, es: nbr_table_search(
            qb, nv, ns, adj, ent, ev, es, K,
            ef=EF, expand=EXPAND, iters=ITERS, metric="l2",
        )
        ids_n, el_n = timed_stream(
            fn_nt, queries_r, nbr_vecs, nbr_sqn, adjacency,
            entries, ent_vecs, ent_sqn,
        )
        qps_n = B * REPEATS / el_n
        rec_n = recall(np.asarray(ids_n)[0], gt_i)
        print(
            f"nbr-table {label}:  {qps_n:10.0f} QPS  recall@{K}={rec_n:.4f}"
            f"  table={mb:.0f}MB"
        )

    # narrower/deeper retune once gathers are cheap
    for ef, w, it in ((125, 16, 10), (125, 8, 18), (96, 16, 9), (64, 8, 12)):
        nbr_vecs = x.astype(jnp.bfloat16)[safe_adj]
        fn_nt = lambda qb, nv, ns, adj, ent, ev, es: nbr_table_search(
            qb, nv, ns, adj, ent, ev, es, K,
            ef=ef, expand=w, iters=it, metric="l2",
        )
        ids_n, el_n = timed_stream(
            fn_nt, queries_r, nbr_vecs, nbr_sqn, adjacency,
            entries, ent_vecs, ent_sqn,
        )
        qps_n = B * REPEATS / el_n
        rec_n = recall(np.asarray(ids_n)[0], gt_i)
        print(
            f"nbr bf16 ef={ef} W={w} it={it}: {qps_n:10.0f} QPS"
            f"  recall@{K}={rec_n:.4f}"
        )


if __name__ == "__main__":
    main()
