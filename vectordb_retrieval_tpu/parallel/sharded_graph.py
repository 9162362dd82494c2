"""Sharded graph (HNSW-class) search: one beam-search graph per chip.

The distributed-graph scale-out story (SURVEY.md section 2.3 breadth): the
database rows are split contiguously over the mesh's ``db`` axis, each
device builds an independent kNN graph + entry-point set over its shard
(ops/graph.py — same kernels as the single-chip family), queries fan out
to every shard inside ``shard_map``, each shard runs the sort-free beam
locally, local ids shift to global row ids by the shard offset, and the
per-shard top-k lists merge with the shared ``all_gather`` + top-k
collective (parallel/sharded_ivf.gather_merge).

Per-shard graphs sidestep the cross-device edges a single global graph
would need (every beam hop would be a remote gather over ICI); the merge
costs one k-wide collective per query batch instead. This mirrors how
sharded HNSW deployments actually scale (per-shard indexes + scatter/
gather), re-expressed as SPMD collectives instead of RPC fan-out.

Shards are padded to equal row counts with +inf-norm sentinel rows so the
stacked arrays are static-shaped; sentinels never enter the graph (their
adjacency is self-loops and entry sets exclude them) and the final merge
masks any id >= n_total.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vectordb_retrieval_tpu.ops import graph as gops
from vectordb_retrieval_tpu.parallel.sharded_ivf import gather_merge


def build_sharded_graph(
    x: np.ndarray,
    mesh: Mesh,
    M: int = 16,
    seed: int = 42,
    axis: str = "db",
):
    """Per-shard kNN-graph build; returns device-sharded arrays + metadata."""
    n_shards = mesh.shape[axis]
    n, d = x.shape
    per = -(-n // n_shards)
    degree = min(2 * M, max(per - 1, 1))
    n_entry = min(2048, max(16, per // 10))

    vec_stack = np.zeros((n_shards, per, d), dtype=np.float32)
    sqn_stack = np.full((n_shards, per), np.inf, dtype=np.float32)
    adj_stack = np.zeros((n_shards, per, degree), dtype=np.int32)
    ent_stack = np.full((n_shards, n_entry), -1, dtype=np.int32)
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, n)
        rows = hi - lo
        if rows <= 0:
            # empty trailing shard: sentinel rows + self-loop adjacency
            # (stack defaults) — entries stay -1 so the beam never starts
            adj_stack[s] = np.arange(per)[:, None]
            continue
        xs = jnp.asarray(x[lo:hi])
        adjacency = gops.build_knn_graph(xs, min(degree, max(rows - 1, 1)))
        entries = gops.pick_entry_points(
            xs, min(n_entry, rows), seed=seed + s
        )
        vec_stack[s, :rows] = x[lo:hi]
        sqn_stack[s, :rows] = (x[lo:hi] ** 2).sum(axis=1)
        a = np.asarray(adjacency)
        adj_stack[s, :rows, : a.shape[1]] = a
        if a.shape[1] < degree:  # degree-clamped tiny shard: self-loops pad
            adj_stack[s, :rows, a.shape[1]:] = np.arange(rows)[:, None]
        # sentinel rows point at themselves so a stray hop cannot escape
        if rows < per:
            adj_stack[s, rows:] = np.arange(rows, per)[:, None]
        e = np.asarray(entries)
        ent_stack[s, : e.shape[0]] = e

    sh = lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
    )
    return {
        "vectors": sh(vec_stack),
        "sqnorms": sh(sqn_stack),
        "adjacency": sh(adj_stack),
        "entry_ids": sh(ent_stack),
    }, {
        "n_shards": n_shards,
        "rows_per_shard": per,
        "degree": degree,
        "n_entry": n_entry,
    }


def build_sharded_block_graph(
    x: np.ndarray,
    mesh: Mesh,
    M: int = 16,
    block_size: int = 128,
    seed: int = 42,
    axis: str = "db",
):
    """Per-shard BLOCK-graph build (memory-parity large-N variant).

    The node-mode per-shard graphs above keep small shards fast; above
    ~50k rows/shard the single-chip family switches to the cluster-routed
    block layout (ops/graph.build_block_graph — 1.04x corpus, slab
    gathers), and this is its sharded form: one independent block graph
    per row shard, global ids, the same all_gather merge.
    """
    n_shards = mesh.shape[axis]
    n, d = x.shape
    per = -(-n // n_shards)
    stacks = None
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, n)
        rows = max(hi - lo, 0)
        if rows == 0:
            ent = np.full((1, d), 1e9, np.float32)
            parts = (
                ent, np.zeros(1, np.int32),
                np.full((1, block_size), -1, np.int32),
                np.zeros((1, block_size, d), np.float32),
                np.zeros((1, block_size), np.float32),
                np.zeros((1, 1), np.int32),
            )
        else:
            xs = jnp.asarray(x[lo:hi])
            n_blocks = max(1, -(-rows // block_size))
            degree = max(4, min(2 * M, n_blocks - 1)) if n_blocks > 1 else 1
            entries, entry_block, slot_ids, list_vecs, list_sqn, adj, _ = (
                gops.build_block_graph(xs, n_blocks, degree, seed=seed + s)
            )
            slot_g = np.asarray(slot_ids)
            slot_g = np.where(slot_g >= 0, slot_g + lo, -1).astype(np.int32)
            parts = (
                np.asarray(entries), np.asarray(entry_block), slot_g,
                np.asarray(list_vecs), np.asarray(list_sqn),
                np.asarray(adj),
            )
        if stacks is None:
            stacks = [[] for _ in parts]
        for j, p in enumerate(parts):
            stacks[j].append(p)

    def stack(parts, fill):
        """Pad each shard's array to the max shape, then stack."""
        shapes = np.stack([np.asarray(p.shape) for p in parts])
        tgt = shapes.max(axis=0)
        out = np.full((len(parts), *tgt), fill, dtype=parts[0].dtype)
        for s, p in enumerate(parts):
            out[(s,) + tuple(slice(0, e) for e in p.shape)] = p
        return out

    fills = (1e9, 0, -1, 0.0, 0.0, -1)
    ent, eblk, slots, vecs, sqn, adj = (
        stack(ps, f) for ps, f in zip(stacks, fills)
    )
    # padded entry rows carry 1e9 sentinels (never seeded); padded
    # adjacency -1 (masked); padded entry_block 0 is safe because its
    # entry is never reached
    sh = lambda a: jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
    )
    return {
        "entries": sh(ent),
        "entry_block": sh(eblk),
        "slot_ids": sh(slots),
        "list_vecs": sh(vecs),
        "list_sqnorms": sh(sqn),
        "entry_adj": sh(adj),
    }, {
        "n_shards": n_shards,
        "rows_per_shard": per,
        "mode": "block",
        "n_blocks": int(slots.shape[1]),
        "block_len": int(slots.shape[2]),
        "degree": int(adj.shape[2]),
    }


@functools.partial(
    jax.jit,
    static_argnames=("k", "efb", "expand", "iters", "metric", "mesh",
                     "axis", "q_axis"),
)
def sharded_block_graph_search(
    queries: jax.Array,
    data: dict,
    k: int,
    mesh: Mesh,
    efb: int = 32,
    expand: int = 8,
    iters: int = 8,
    metric: str = "l2",
    axis: str = "db",
    q_axis: str = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fan-out block-beam per shard + all_gather candidate merge.

    Slot ids are already global (build_sharded_block_graph), so no offset
    shift is needed; sentinel entries (1e9) never seed a beam."""
    n_shards = mesh.shape[axis]
    eff_k = min(k, data["slot_ids"].shape[1] * data["slot_ids"].shape[2])
    out_k = min(k, n_shards * eff_k)

    def local(q, ent, eblk, slots, vecs, sqn, adj):
        d, i = gops.block_graph_search(
            q, ent[0], eblk[0], slots[0], vecs[0], sqn[0], adj[0], None,
            k=eff_k, efb=efb, expand=expand, iters=iters, metric=metric,
        )
        d = jnp.where(i >= 0, d, jnp.inf)
        return gather_merge(d, i, axis, eff_k, out_k=out_k)

    from vectordb_retrieval_tpu.parallel.sharded_ivf import _query_specs

    q_spec, out_specs = _query_specs(q_axis)
    operands = (
        data["entries"], data["entry_block"], data["slot_ids"],
        data["list_vecs"], data["list_sqnorms"], data["entry_adj"],
    )
    specs = tuple(P(axis, *([None] * (op.ndim - 1))) for op in operands)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(q_spec,) + specs,
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(queries, *operands)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_total", "k", "ef", "metric", "mesh", "axis", "q_axis"
    ),
)
def sharded_graph_search(
    queries: jax.Array,
    data: dict,
    n_total: int,
    k: int,
    mesh: Mesh,
    ef: int = 64,
    metric: str = "l2",
    axis: str = "db",
    q_axis: str = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fan-out beam search per shard + all_gather candidate merge."""
    per = data["vectors"].shape[1]
    degree = data["adjacency"].shape[2]
    eff_k = min(k, per)
    # same beam geometry as the single-chip serving path
    # (models/graph.graph_artifact_search), sized by the SHARD row count
    ef_l = min(max(ef, eff_k + 8, 16), per)
    # the 8-wide floor must not exceed the beam itself on tiny shards
    expand = min(max(8, min(ef_l, 1536 // max(degree, 1))), ef_l)
    keep = max(eff_k, (3 * ef_l) // 4)
    iters = 3 + (per > 50_000) + (per > 500_000)
    iters = max(iters, -(-ef_l // keep) + 1)
    n_shards = mesh.shape[axis]
    # cross-shard merge keeps up to a full k even when k > rows-per-shard
    out_k = min(k, n_shards * eff_k)

    def local(q, vecs, sqns, adj, entries):
        d, i = gops.graph_search(
            q, vecs[0], adj[0], entries[0], eff_k,
            ef=ef_l, expand=expand, iters=iters, metric=metric,
            sqnorms=sqns[0], cand_keep=keep,
            # routing dots run at default (bf16-input) matmul precision;
            # the exact VPU rescore restores the ranking contract before
            # distances cross shards
            rescore=True,
        )
        offset = jax.lax.axis_index(axis).astype(jnp.int32) * per
        gid = jnp.where(i >= 0, i + offset, -1)
        valid = (gid >= 0) & (gid < n_total)
        d = jnp.where(valid, d, jnp.inf)
        gid = jnp.where(valid, gid, -1)
        return gather_merge(d, gid, axis, eff_k, out_k=out_k)

    from vectordb_retrieval_tpu.parallel.sharded_ivf import _query_specs

    q_spec, out_specs = _query_specs(q_axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            q_spec,
            P(axis, None, None),
            P(axis, None),
            P(axis, None, None),
            P(axis, None),
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(
        queries,
        data["vectors"],
        data["sqnorms"],
        data["adjacency"],
        data["entry_ids"],
    )
