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


# -- sharded mutable IVF ---------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "metric", "mesh", "db_axis", "q_axis"),
)
def _sharded_mutable_ivf_search(
    queries: jax.Array,
    coarse: jax.Array,       # [NB, d] bucket centroid copies (1e9 = unused)
    slot_ids: jax.Array,     # [NB, L] STABLE ids (-1 = free/tombstone)
    list_vecs: jax.Array,    # [NB, L, d] f32
    list_sqn: jax.Array,     # [NB, L] f32
    slot_pen: jax.Array,     # [NB, L] f32 (+inf = filtered)
    k: int,
    nprobe: int,
    mesh: Mesh,
    metric: str,
    db_axis: str,
    q_axis: Optional[str],
):
    from vectordb_retrieval_tpu.ops import ivf as ivfops
    from vectordb_retrieval_tpu.parallel.sharded_ivf import gather_merge

    n_shards = int(mesh.shape[db_axis])
    nb_local = slot_ids.shape[0] // n_shards
    kk = min(k, nb_local * slot_ids.shape[1])
    out_k = min(k, n_shards * kk)

    def local(q, cents, slots, vecs, sqns, pen):
        ld, li = ivfops.ivf_flat_search(
            q, cents, slots, vecs, sqns, kk,
            min(nprobe, cents.shape[0]), metric, slot_pen=pen,
        )  # slot table holds stable ids -> no translation at merge
        return gather_merge(ld, li, db_axis, kk, out_k=out_k)

    if q_axis is None:
        in_q, out = P(), (P(), P())
    else:
        in_q, out = P(q_axis, None), (P(q_axis, None), P(q_axis, None))
    row = P(db_axis, None)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(in_q, row, row, P(db_axis, None, None), row, row),
        out_specs=out,
        check_vma=False,
    )
    return fn(queries, coarse, slot_ids, list_vecs, list_sqn, slot_pen)


class ShardedMutableIVF:
    """Mutable IVF-Flat serving index sharded over ``db`` (replicated over
    any other mesh axes) — the serving.MutableIVFIndex contract scaled out
    (docs/roadmap.md #8, round-3 verdict #6).

    Design (beyond-parity: the reference has no mutable or multi-device
    runtime — src/algorithms/* are build-once):

      * ONE global coarse quantizer, trained on the initial corpus and
        frozen (the production pattern; rebuilds handle drift) and
        replicated over the mesh — add() routing is identical on every
        shard;
      * the BUCKETS are the sharding unit: each shard owns an equal
        segment of fixed-length bucket rows; a list's buckets may live on
        several shards, so hot lists spread instead of hot-spotting one
        chip;
      * ``add`` fills per-list free slots first, then claims a fresh
        bucket on the LEAST-LOADED shard; when every shard segment is
        full, capacity doubles with a purely LOCAL shard_map pad (no
        resharding traffic, O(log N) recompiles);
      * ``delete`` tombstones the slot (stable id -> -1; the probe scan
        masks negative ids already) — O(1), zero search overhead;
      * ``search`` runs the single-chip jitted ``ivf_flat_search`` per
        shard inside shard_map — each shard probes its ``nprobe``
        nearest LOCAL buckets — and merges via the family-standard
        ``all_gather`` top-k (parallel/sharded_ivf.gather_merge). Slot
        tables store STABLE ids, so merged ids need no translation.
        On a 2-D (replica, db) mesh, pass ``q_axis="replica"`` to shard
        the query batch over replicas (state replicates automatically:
        the specs never mention the replica axis).
    """

    def __init__(
        self,
        vectors: np.ndarray,
        mesh: Mesh,
        nlist: int = 64,
        metric: str = "l2",
        nprobe: int = 8,
        bucket_len: int = 0,
        seed: int = 123,
        train_iters: int = 20,
        db_axis: str = "db",
        q_axis: Optional[str] = None,
        compact_frac: float = 0.25,
    ):
        from vectordb_retrieval_tpu.ops import ivf as ivfops
        from vectordb_retrieval_tpu.ops.kmeans import kmeans_assign, kmeans_fit

        if metric not in ("l2", "ip", "cosine"):
            raise ValueError(f"unsupported metric {metric!r}")
        x = np.ascontiguousarray(vectors, dtype=np.float32)
        n, d = x.shape
        self.dimension = d
        self.metric = metric
        self.nprobe = int(nprobe)
        self.mesh = mesh
        self.db_axis = db_axis
        self.q_axis = q_axis
        self.compact_frac = float(compact_frac)
        self.n_shards = int(mesh.shape[db_axis])
        xd = jnp.asarray(x)
        if metric == "cosine":
            xd = dops.normalize(xd)
        self.nlist = min(int(nlist), max(n, 1))
        self.centroids, _ = kmeans_fit(
            xd, self.nlist, seed=seed, iters=train_iters
        )
        assign = np.asarray(kmeans_assign(xd, self.centroids))
        if not bucket_len:
            bucket_len = max(8, min(-(-n // self.nlist) * 2, 2048))
        # pad_multiple=8 (not the fused-kernel 32): mutable serving opts out
        # of the fused layout (bucket_multiple=1) and small bucket_len would
        # otherwise be silently rounded to 32 — 4x padded slots/probe work
        slot_np, bucket_lists_np, _ = ivfops.build_bucketed_lists(
            assign, self.nlist, target_len=int(bucket_len), target_len_cap=0,
            bucket_multiple=1, pad_multiple=8,
        )
        self._L = int(slot_np.shape[1])
        nb_used = slot_np.shape[0]
        # uniform per-shard segments: round the physical bucket count up
        self._capB_local = max(-(-nb_used // self.n_shards), 1)
        nb_phys = self._capB_local * self.n_shards

        bl = np.full((nb_phys,), -1, np.int32)
        sl = np.full((nb_phys, self._L), -1, np.int64)
        vec = np.zeros((nb_phys, self._L, d), np.float32)
        # round-robin the built buckets across shard segments so the
        # initial load is balanced
        xs_np = np.asarray(xd)
        for j in range(nb_used):
            s, r = j % self.n_shards, j // self.n_shards
            g = s * self._capB_local + r
            bl[g] = bucket_lists_np[j]
            sl[g] = slot_np[j]
            rows = slot_np[j]
            vec[g][rows >= 0] = xs_np[rows[rows >= 0]]
        self._bucket_lists = bl
        self._slot_host = sl  # stable ids mirror (host)
        row = NamedSharding(mesh, P(db_axis, None))
        row3 = NamedSharding(mesh, P(db_axis, None, None))
        self._row_sh, self._row3_sh = row, row3
        self._slot_ids = jax.device_put(
            jnp.asarray(sl.astype(np.int32)), row
        )
        self._list_vecs = jax.device_put(jnp.asarray(vec), row3)
        self._list_sqn = jax.device_put(
            jnp.asarray((vec ** 2).sum(-1).astype(np.float32)), row
        )
        self._refresh_coarse()
        self._fill = (sl >= 0).sum(axis=1).astype(np.int64)  # per bucket
        self._list_buckets = {
            l: [int(g) for g in np.nonzero(bl == l)[0]]
            for l in range(self.nlist)
        }
        self._id_loc = {}
        for g in range(nb_phys):
            for s_idx, rid in enumerate(sl[g]):
                if rid >= 0:
                    self._id_loc[int(rid)] = (g, s_idx)
        self._next_id = n
        self._list_free = {l: [] for l in range(self.nlist)}
        self._n_dead = 0

    # -- internals --------------------------------------------------------
    @property
    def n_active(self) -> int:
        return len(self._id_loc)

    @property
    def n_buckets(self) -> int:
        return int(self._capB_local * self.n_shards)

    def _refresh_coarse(self) -> None:
        safe = np.where(self._bucket_lists >= 0, self._bucket_lists, 0)
        coarse = np.asarray(self.centroids)[safe]
        coarse[self._bucket_lists < 0] = 1e9
        self._coarse = jax.device_put(jnp.asarray(coarse), self._row_sh)

    def _shard_free_buckets(self) -> np.ndarray:
        used = (self._bucket_lists >= 0).reshape(
            self.n_shards, self._capB_local
        )
        return self._capB_local - used.sum(axis=1)

    def _grow(self) -> None:
        """Double every shard's bucket segment with LOCAL pads."""
        old, d0 = self._capB_local, self.n_shards
        new = old * 2

        def pad3(v):
            return jnp.pad(v, ((0, new - old), (0, 0), (0, 0)))

        def pad2(fill):
            def f(v):
                return jnp.pad(
                    v, ((0, new - old), (0, 0)), constant_values=fill
                )

            return f

        sm = functools.partial(jax.shard_map, mesh=self.mesh, check_vma=False)
        row, row3 = P(self.db_axis, None), P(self.db_axis, None, None)
        self._list_vecs = sm(pad3, in_specs=row3, out_specs=row3)(
            self._list_vecs
        )
        self._list_sqn = sm(pad2(0.0), in_specs=row, out_specs=row)(
            self._list_sqn
        )
        self._slot_ids = sm(pad2(-1), in_specs=row, out_specs=row)(
            self._slot_ids
        )

        def expand(a, fill, shape):
            out = np.full(shape, fill, a.dtype)
            for s in range(d0):
                out[s * new : s * new + old] = a[s * old : (s + 1) * old]
            return out

        self._bucket_lists = expand(self._bucket_lists, -1, (new * d0,))
        self._slot_host = expand(
            self._slot_host, -1, (new * d0, self._L)
        )
        self._fill = expand(self._fill, 0, (new * d0,))
        # global bucket numbering moved: rebuild host maps, and remap the
        # free-slot stacks the same way (g = s*old+r -> s*new+r) — stale
        # old-numbering entries would make later adds write rows into
        # dead/foreign buckets (round-4 advisor, serving.py:594)
        def _remap_g(g: int) -> int:
            s, r = divmod(g, old)
            return s * new + r

        self._list_free = {
            l: [(_remap_g(g), s_idx) for g, s_idx in stack]
            for l, stack in self._list_free.items()
        }
        self._list_buckets = {
            l: [int(g) for g in np.nonzero(self._bucket_lists == l)[0]]
            for l in range(self.nlist)
        }
        self._id_loc = {}
        for g in range(new * d0):
            for s_idx, rid in enumerate(self._slot_host[g]):
                if rid >= 0:
                    self._id_loc[int(rid)] = (g, s_idx)
        self._capB_local = new
        self._refresh_coarse()

    def _claim_bucket(self, list_id: int) -> int:
        free = self._shard_free_buckets()
        if free.max() == 0:
            self._grow()
            free = self._shard_free_buckets()
        s = int(np.argmax(free))
        seg = self._bucket_lists[
            s * self._capB_local : (s + 1) * self._capB_local
        ]
        g = s * self._capB_local + int(np.nonzero(seg < 0)[0][0])
        self._bucket_lists[g] = np.int32(list_id)
        self._list_buckets[list_id].append(g)
        return g

    def _take_slot(self, list_id: int):
        if self._list_free[list_id]:
            return self._list_free[list_id].pop()
        for g in self._list_buckets[list_id]:
            if self._fill[g] < self._L:
                s_idx = int(self._fill[g])
                self._fill[g] += 1
                return (g, s_idx)
        g = self._claim_bucket(list_id)
        self._fill[g] = 1
        return (g, 0)

    # -- mutation -----------------------------------------------------------
    def add(self, vectors: np.ndarray) -> np.ndarray:
        from vectordb_retrieval_tpu.ops.kmeans import kmeans_assign

        x = np.ascontiguousarray(vectors, dtype=np.float32)
        if x.ndim != 2 or x.shape[1] != self.dimension:
            raise ValueError(
                f"add expects [*, {self.dimension}], got {x.shape}"
            )
        m = x.shape[0]
        if m == 0:
            return np.empty((0,), np.int64)
        xd = jnp.asarray(x)
        if self.metric == "cosine":
            xd = dops.normalize(xd)
        assign = np.asarray(kmeans_assign(xd, self.centroids))
        # Pre-size capacity BEFORE taking any slots: a _grow inside the
        # loc-collection loop renumbers global bucket indices (shard s's
        # segment moves from s*old to s*new), so locs collected earlier
        # would scatter rows into dead/foreign buckets (round-4 advisor,
        # serving.py:688). Grow until the whole batch's bucket demand fits;
        # _claim_bucket then never triggers _grow mid-batch.
        counts = np.bincount(assign, minlength=self.nlist)
        need = 0
        for l in np.nonzero(counts)[0]:
            avail = len(self._list_free[int(l)]) + sum(
                self._L - int(self._fill[g])
                for g in self._list_buckets[int(l)]
            )
            deficit = int(counts[l]) - avail
            if deficit > 0:
                need += -(-deficit // self._L)
        while need > int(self._shard_free_buckets().sum()):
            self._grow()
        locs = [self._take_slot(int(l)) for l in assign]
        g_idx = np.asarray([g for g, _ in locs], np.int32)
        s_idx = np.asarray([s for _, s in locs], np.int32)
        gi, si = jnp.asarray(g_idx), jnp.asarray(s_idx)
        self._slot_ids = self._slot_ids.at[gi, si].set(
            jnp.arange(self._next_id, self._next_id + m, dtype=jnp.int32)
        )
        self._list_vecs = self._list_vecs.at[gi, si].set(xd)
        self._list_sqn = self._list_sqn.at[gi, si].set(jnp.sum(xd * xd, -1))
        ids = np.arange(self._next_id, self._next_id + m, dtype=np.int64)
        self._slot_host[g_idx, s_idx] = ids
        for rid, (g, s) in zip(ids, locs):
            self._id_loc[int(rid)] = (int(g), int(s))
        self._next_id += m
        if self._next_id > 2**31 - 1:
            raise OverflowError("stable ids exceed int32 device range")
        self._refresh_coarse()  # newly-claimed buckets need live centroids
        return ids

    def delete(self, ids) -> int:
        locs = [
            self._id_loc.pop(int(i))
            for i in np.atleast_1d(np.asarray(ids, dtype=np.int64))
            if int(i) in self._id_loc
        ]
        if not locs:
            return 0
        g_idx = np.asarray([g for g, _ in locs], np.int32)
        s_idx = np.asarray([s for _, s in locs], np.int32)
        gi, si = jnp.asarray(g_idx), jnp.asarray(s_idx)
        self._slot_ids = self._slot_ids.at[gi, si].set(-1)
        self._list_vecs = self._list_vecs.at[gi, si].set(0.0)
        self._list_sqn = self._list_sqn.at[gi, si].set(0.0)
        self._slot_host[g_idx, s_idx] = -1
        for g, s in locs:
            self._list_free[int(self._bucket_lists[g])].append(
                (int(g), int(s))
            )
        self._n_dead += len(locs)
        if self._n_dead > max(
            64, self.compact_frac * max(self.n_active, 1)
        ):
            self.compact()
        return len(locs)

    def compact(self) -> None:
        """Repack every bucket's live slots to a prefix (per-bucket local
        permutation — one take_along_axis on the bucket axis, rows never
        cross buckets or shards) and release all-dead buckets."""
        nb, L = self._slot_host.shape
        perm = np.tile(np.arange(L, dtype=np.int32), (nb, 1))
        new_sl = np.full_like(self._slot_host, -1)
        for g in range(nb):
            live = np.nonzero(self._slot_host[g] >= 0)[0]
            dead = np.nonzero(self._slot_host[g] < 0)[0]
            perm[g] = np.concatenate([live, dead]).astype(np.int32)
            new_sl[g, : live.size] = self._slot_host[g][live]
            self._fill[g] = live.size
            lid = int(self._bucket_lists[g])
            if live.size == 0 and lid >= 0 and len(self._list_buckets[lid]) > 1:
                self._list_buckets[lid].remove(g)
                self._bucket_lists[g] = -1
        pd = jax.device_put(jnp.asarray(perm), self._row_sh)
        self._slot_ids = jnp.take_along_axis(self._slot_ids, pd, axis=1)
        self._list_sqn = jnp.take_along_axis(self._list_sqn, pd, axis=1)
        self._list_vecs = jnp.take_along_axis(
            self._list_vecs, pd[:, :, None], axis=1
        )
        self._slot_host = new_sl
        self._id_loc = {}
        for g in range(nb):
            for s_idx, rid in enumerate(new_sl[g]):
                if rid >= 0:
                    self._id_loc[int(rid)] = (g, s_idx)
        self._list_free = {l: [] for l in range(self.nlist)}
        self._n_dead = 0
        self._refresh_coarse()

    # -- search ---------------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        k: int,
        nprobe: int = 0,
        filter_ids: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Probe-scan top-k over the live set; ``(dists, stable_ids)``.

        ``nprobe`` counts BUCKETS probed per shard (runtime-adjustable);
        the merged result draws from ``n_shards * nprobe`` buckets total.
        """
        b_in = np.atleast_2d(queries).shape[0]
        if self.n_active == 0:
            return (
                np.full((b_in, k), np.inf, np.float32),
                np.full((b_in, k), -1, np.int64),
            )
        q = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.float32)
        padded, n_q = pad_batch(q)
        if self.q_axis is not None:
            reps = int(self.mesh.shape[self.q_axis])
            if padded.shape[0] % reps:
                extra = reps - padded.shape[0] % reps
                padded = np.pad(padded, ((0, extra), (0, 0)))
        qd = jnp.asarray(padded)
        metric = self.metric
        if metric == "cosine":
            qd = dops.normalize(qd)
            metric = "ip"
        pen_np = np.zeros(self._slot_host.shape, np.float32)
        if filter_ids is not None:
            allow = np.asarray(filter_ids, dtype=np.int64).reshape(-1)
            pen_np = np.where(
                np.isin(self._slot_host, allow), 0.0, np.inf
            ).astype(np.float32)
        pen = jax.device_put(jnp.asarray(pen_np), self._row_sh)
        dists, ids = _sharded_mutable_ivf_search(
            qd, self._coarse, self._slot_ids, self._list_vecs,
            self._list_sqn, pen,
            k, int(nprobe or self.nprobe), self.mesh, metric,
            self.db_axis, self.q_axis,
        )
        dists = np.asarray(dists)[:n_q]
        ids = np.asarray(ids)[:n_q].astype(np.int64)
        ids = np.where(np.isfinite(dists), ids, -1)
        dists = np.where(ids >= 0, dists, np.inf)
        if dists.shape[1] < k:
            padw = k - dists.shape[1]
            dists = np.pad(
                dists, ((0, 0), (0, padw)), constant_values=np.inf
            )
            ids = np.pad(ids, ((0, 0), (0, padw)), constant_values=-1)
        return dists, ids

    # -- snapshot ---------------------------------------------------------
    def to_artifact(self):
        """Immutable ``flat`` snapshot of the live rows (host-gathered)."""
        from vectordb_retrieval_tpu.models.base import IndexArtifact

        live = np.nonzero(self._slot_host.reshape(-1) >= 0)[0]
        vecs = np.asarray(self._list_vecs).reshape(-1, self.dimension)[live]
        return IndexArtifact(
            "flat",
            jax.block_until_ready(
                {
                    "vectors": jnp.asarray(vecs),
                    "sqnorms": jnp.asarray((vecs * vecs).sum(-1)),
                    "row_ids": jnp.asarray(
                        self._slot_host.reshape(-1)[live].astype(np.int32)
                    ),
                }
            ),
            {
                "metric": self.metric,
                "dimension": self.dimension,
                "n_vectors": int(live.size),
                "normalize_queries": self.metric == "cosine",
                "mutable_snapshot": True,
                "source": "ShardedMutableIVF",
            },
        )
