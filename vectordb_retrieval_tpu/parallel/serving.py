"""Replication-aware sharded mutable serving (docs/roadmap.md #8).

Beyond-parity surface (the reference is build-once/benchmark-only —
src/algorithms/* have no add/remove and no multi-device runtime): a
mutable exact index whose corpus is ROW-SHARDED over the mesh ``db``
axis and — on a 2-D ``(replica, db)`` mesh — transparently REPLICATED
over the ``replica`` axis:

  * state arrays carry ``NamedSharding(P("db", None))``: axes a spec
    does not mention are replicated, so every ``db`` ring holds a full
    copy and JAX keeps all replicas coherent through ``add``/``delete``
    updates — replication is a mesh-shape choice, not separate code;
  * serving throughput scales with replicas by sharding the QUERY batch
    over the ``replica`` axis (``q_axis=...``): each replica ring
    answers its slice of the batch against its full copy, with zero
    cross-ring traffic;
  * within a ring, search is the sharded scan + ``all_gather`` top-k
    merge of parallel/sharded.py with the serving layer's tombstone /
    filter penalty folded into the local scan (serving.py design: +inf
    penalties, stable int64 ids, query-time allow-lists);
  * ``add`` places rows in the emptiest shards first (deterministic
    balance); capacity growth doubles every shard's segment with a
    purely LOCAL ``shard_map`` pad — no resharding traffic, O(log N)
    recompiles over an index lifetime;
  * ``compact`` repacks each shard locally (host-computed per-shard
    permutations applied as a local gather) — ids stay stable, rows
    never cross shards.

Single-host today: the mesh axes span one process's devices (the same
(dcn, db) hybrid meshes built by parallel/mesh.py work once multi-host
hardware exists — the specs here never mention the dcn axis, so state
replicates across hosts and only query routing changes).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vectordb_retrieval_tpu.models.base import pad_batch
from vectordb_retrieval_tpu.ops import distances as dops

_BIG = jnp.inf


def _local_masked_merge(q, xs, sqn, pen, k, metric, axis):
    """Per-shard penalty-masked scan + cross-shard merge (inside shard_map).

    Mirrors parallel/sharded._local_then_merge with the serving-layer
    penalty row; returns GLOBAL slot positions (shard offset + local)."""
    shard_rows = xs.shape[0]
    my = jax.lax.axis_index(axis)
    offset = my * shard_rows
    d = dops.pairwise_distances(q, xs, metric, sqn if metric == "l2" else None)
    d = d + pen[None, :]
    kk = min(k, shard_rows)
    ld, li = dops.top_k_smallest(d, kk)
    gids = offset + jax.lax.broadcasted_iota(jnp.int32, (1, shard_rows), 1)
    gi = jnp.take_along_axis(jnp.broadcast_to(gids, d.shape), li, axis=1)
    all_d = jax.lax.all_gather(ld, axis)  # [P, B, kk]
    all_i = jax.lax.all_gather(gi, axis)
    p, b = all_d.shape[0], q.shape[0]
    cat_d = jnp.transpose(all_d, (1, 0, 2)).reshape(b, p * kk)
    cat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, p * kk)
    out_k = min(k, p * kk)
    md, sel = dops.top_k_smallest(cat_d, out_k)
    mi = jnp.take_along_axis(cat_i, sel, axis=1)
    return md, jnp.where(jnp.isfinite(md), mi, -1)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "mesh", "db_axis", "q_axis")
)
def _sharded_masked_search(
    queries: jax.Array,
    vectors: jax.Array,
    sqnorms: jax.Array,
    pen: jax.Array,
    k: int,
    mesh: Mesh,
    metric: str,
    db_axis: str,
    q_axis: Optional[str],
):
    if q_axis is None:
        in_q, out = P(), (P(), P())
    else:
        in_q, out = P(q_axis, None), (P(q_axis, None), P(q_axis, None))
    fn = jax.shard_map(
        functools.partial(
            _local_masked_merge, k=k, metric=metric, axis=db_axis
        ),
        mesh=mesh,
        in_specs=(in_q, P(db_axis, None), P(db_axis), P(db_axis)),
        out_specs=out,
        check_vma=False,
    )
    return fn(queries, vectors, sqnorms, pen)


class ShardedMutableFlat:
    """Mutable exact serving index sharded over ``db`` (replicated over
    any other mesh axes). Same contract as serving.MutableFlatIndex:
    stable int64 ids, tombstone deletes, query-time ``filter_ids``,
    compaction, immutable snapshot."""

    def __init__(
        self,
        dimension: int,
        mesh: Mesh,
        metric: str = "l2",
        capacity_per_shard: int = 1024,
        db_axis: str = "db",
        q_axis: Optional[str] = None,
        compact_frac: float = 0.25,
    ):
        if metric not in ("l2", "ip", "cosine"):
            raise ValueError(f"unsupported metric {metric!r}")
        self.dimension = int(dimension)
        self.metric = metric
        self.mesh = mesh
        self.db_axis = db_axis
        self.q_axis = q_axis
        self.compact_frac = float(compact_frac)
        self.n_shards = int(mesh.shape[db_axis])
        self._cap_local = max(int(capacity_per_shard), 8)
        c = self._cap_local * self.n_shards
        row = NamedSharding(mesh, P(db_axis, None))
        vec = NamedSharding(mesh, P(db_axis))
        self._row_sh, self._vec_sh = row, vec
        self._vectors = jax.device_put(
            jnp.zeros((c, dimension), jnp.float32), row
        )
        self._sqnorms = jax.device_put(jnp.zeros((c,), jnp.float32), vec)
        self._pen = jax.device_put(jnp.full((c,), _BIG, jnp.float32), vec)
        self._slot_ids = np.full((c,), -1, dtype=np.int64)
        self._id_to_slot: dict = {}
        self._next_id = 0
        self._fill = np.zeros((self.n_shards,), np.int64)  # per-shard prefix
        self._dead = 0

    # -- properties -------------------------------------------------------
    @property
    def n_active(self) -> int:
        return int(self._fill.sum()) - self._dead

    @property
    def capacity(self) -> int:
        return self._cap_local * self.n_shards

    def shard_fill(self) -> np.ndarray:
        """Live-ish fill per shard (filled prefix; includes tombstones)."""
        return self._fill.copy()

    # -- mutation ---------------------------------------------------------
    def _grow(self, need_local: int) -> None:
        new_local = self._cap_local
        while new_local < need_local:
            new_local *= 2

        def pad_rows(v):
            return jnp.pad(v, ((0, new_local - self._cap_local), (0, 0)))

        def pad_vec(fill):
            def f(v):
                return jnp.pad(
                    v, (0, new_local - self._cap_local), constant_values=fill
                )

            return f

        # purely local per-shard pad: no resharding traffic
        sm = functools.partial(
            jax.shard_map, mesh=self.mesh, check_vma=False
        )
        self._vectors = sm(
            pad_rows,
            in_specs=P(self.db_axis, None),
            out_specs=P(self.db_axis, None),
        )(self._vectors)
        self._sqnorms = sm(
            pad_vec(0.0), in_specs=P(self.db_axis), out_specs=P(self.db_axis)
        )(self._sqnorms)
        self._pen = sm(
            pad_vec(_BIG), in_specs=P(self.db_axis), out_specs=P(self.db_axis)
        )(self._pen)
        old_local, d0 = self._cap_local, self.n_shards
        slot_ids = np.full((new_local * d0,), -1, dtype=np.int64)
        for s in range(d0):
            slot_ids[s * new_local : s * new_local + old_local] = (
                self._slot_ids[s * old_local : (s + 1) * old_local]
            )
        self._slot_ids = slot_ids
        # global slot numbering moved: rebuild the id map
        self._id_to_slot = {
            int(sid): j for j, sid in enumerate(slot_ids) if sid >= 0
        }
        self._cap_local = new_local

    def _place_plan(self, m: int) -> np.ndarray:
        """Shard index for each of ``m`` new rows: emptiest shards first
        (deterministic water-filling on the filled-prefix counts)."""
        fill = self._fill.copy()
        out = np.empty((m,), np.int64)
        order = np.argsort(fill, kind="stable")
        i = 0
        while i < m:
            # fill the currently-emptiest shard up to the next level
            order = np.argsort(fill, kind="stable")
            s = order[0]
            level = fill[order[1]] if self.n_shards > 1 else fill[s] + (m - i)
            take = int(min(m - i, max(level - fill[s], 1)))
            out[i : i + take] = s
            fill[s] += take
            i += take
        return out

    def add(self, vectors: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(vectors, dtype=np.float32)
        if x.ndim != 2 or x.shape[1] != self.dimension:
            raise ValueError(f"add expects [*, {self.dimension}], got {x.shape}")
        m = x.shape[0]
        if m == 0:
            return np.empty((0,), np.int64)
        plan = self._place_plan(m)
        counts = np.bincount(plan, minlength=self.n_shards)
        if (self._fill + counts).max() > self._cap_local:
            self._grow(int((self._fill + counts).max()))
        # slot for each new row (per-shard contiguous runs)
        slots = np.empty((m,), np.int64)
        for s in range(self.n_shards):
            rows = np.nonzero(plan == s)[0]
            base = s * self._cap_local + self._fill[s]
            slots[rows] = base + np.arange(rows.size)
            self._fill[s] += rows.size
        xd = jnp.asarray(x)
        if self.metric == "cosine":
            xd = dops.normalize(xd)
        slot_arr = jnp.asarray(slots.astype(np.int32))
        self._vectors = self._vectors.at[slot_arr].set(xd)
        self._sqnorms = self._sqnorms.at[slot_arr].set(jnp.sum(xd * xd, -1))
        self._pen = self._pen.at[slot_arr].set(0.0)
        ids = np.arange(self._next_id, self._next_id + m, dtype=np.int64)
        self._slot_ids[slots] = ids
        for sid, sl in zip(ids, slots):
            self._id_to_slot[int(sid)] = int(sl)
        self._next_id += m
        if self._next_id > 2**31 - 1:
            raise OverflowError("stable ids exceed int32 device range")
        return ids

    def delete(self, ids) -> int:
        slots = [
            self._id_to_slot.pop(int(i))
            for i in np.atleast_1d(np.asarray(ids, dtype=np.int64))
            if int(i) in self._id_to_slot
        ]
        if not slots:
            return 0
        slot_arr = jnp.asarray(np.asarray(slots, dtype=np.int32))
        self._pen = self._pen.at[slot_arr].set(_BIG)
        self._vectors = self._vectors.at[slot_arr].set(0.0)
        self._sqnorms = self._sqnorms.at[slot_arr].set(0.0)
        for s in slots:
            self._slot_ids[s] = -1
        self._dead += len(slots)
        if self._dead > max(64, self.compact_frac * max(self.n_active, 1)):
            self.compact()
        return len(slots)

    def compact(self) -> None:
        """Per-shard local repack (ids stable, rows never cross shards;
        capacity is kept — growth already amortises it)."""
        capL, d0 = self._cap_local, self.n_shards
        gather = np.zeros((d0 * capL,), np.int32)  # LOCAL gather indices
        new_slot_ids = np.full((d0 * capL,), -1, dtype=np.int64)
        new_pen = np.full((d0 * capL,), np.inf, np.float32)
        for s in range(d0):
            seg = self._slot_ids[s * capL : s * capL + self._fill[s]]
            live = np.nonzero(seg >= 0)[0]
            gather[s * capL : s * capL + live.size] = live.astype(np.int32)
            new_slot_ids[s * capL : s * capL + live.size] = seg[live]
            new_pen[s * capL : s * capL + live.size] = 0.0
            self._fill[s] = live.size

        def repack(v, g):
            return jnp.take(v, g, axis=0)

        sm = functools.partial(jax.shard_map, mesh=self.mesh, check_vma=False)
        gd = jax.device_put(jnp.asarray(gather), self._vec_sh)
        self._vectors = sm(
            repack,
            in_specs=(P(self.db_axis, None), P(self.db_axis)),
            out_specs=P(self.db_axis, None),
        )(self._vectors, gd)
        self._sqnorms = sm(
            repack,
            in_specs=(P(self.db_axis), P(self.db_axis)),
            out_specs=P(self.db_axis),
        )(self._sqnorms, gd)
        self._pen = jax.device_put(jnp.asarray(new_pen), self._vec_sh)
        self._slot_ids = new_slot_ids
        self._id_to_slot = {
            int(sid): j for j, sid in enumerate(new_slot_ids) if sid >= 0
        }
        self._dead = 0

    # -- search -----------------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        k: int,
        filter_ids: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k over the live set; ``(dists, stable_ids)``."""
        b_in = np.atleast_2d(queries).shape[0]
        if self.n_active == 0:
            return (
                np.full((b_in, k), np.inf, np.float32),
                np.full((b_in, k), -1, np.int64),
            )
        q = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.float32)
        padded, n_q = pad_batch(q)
        if self.q_axis is not None:
            # q-sharded batches must split evenly over the replica axis
            reps = int(self.mesh.shape[self.q_axis])
            if padded.shape[0] % reps:
                extra = reps - padded.shape[0] % reps
                padded = np.pad(padded, ((0, extra), (0, 0)))
        qd = jnp.asarray(padded)
        metric = self.metric
        if metric == "cosine":
            qd = dops.normalize(qd)
            metric = "ip"
        pen = self._pen
        if filter_ids is not None:
            allow = np.asarray(filter_ids, dtype=np.int64).reshape(-1)
            mask = np.isin(self._slot_ids, allow)
            pen = pen + jax.device_put(
                jnp.asarray(np.where(mask, 0.0, np.inf).astype(np.float32)),
                self._vec_sh,
            )
        dists, slots = _sharded_masked_search(
            qd,
            self._vectors,
            self._sqnorms,
            pen,
            k,  # per-shard width is clamped to shard rows in the kernel
            self.mesh,
            metric,
            self.db_axis,
            self.q_axis,
        )
        dists = np.asarray(dists)[:n_q]
        slots = np.asarray(slots)[:n_q]
        ids = np.where(slots >= 0, self._slot_ids[np.abs(slots)], -1)
        ids = np.where(np.isfinite(dists), ids, -1)
        dists = np.where(ids >= 0, dists, np.inf)
        if dists.shape[1] < k:
            padw = k - dists.shape[1]
            dists = np.pad(dists, ((0, 0), (0, padw)), constant_values=np.inf)
            ids = np.pad(ids, ((0, 0), (0, padw)), constant_values=-1)
        return dists, ids

    # -- snapshot -----------------------------------------------------------
    def to_artifact(self):
        """Immutable ``flat`` snapshot (host-gathered bulk op) servable by
        ANNSearcher — same contract as MutableFlatIndex.to_artifact."""
        from vectordb_retrieval_tpu.models.base import IndexArtifact

        self.compact()
        live = np.nonzero(self._slot_ids >= 0)[0]
        vecs = np.asarray(self._vectors)[live]
        return IndexArtifact(
            "flat",
            jax.block_until_ready(
                {
                    "vectors": jnp.asarray(vecs),
                    "sqnorms": jnp.asarray((vecs * vecs).sum(-1)),
                    "row_ids": jnp.asarray(
                        self._slot_ids[live].astype(np.int32)
                    ),
                }
            ),
            {
                "metric": self.metric,
                "dimension": self.dimension,
                "n_vectors": int(live.size),
                "normalize_queries": self.metric == "cosine",
                "mutable_snapshot": True,
                "source": "ShardedMutableFlat",
            },
        )
