"""Serving layer: mutable indexes with incremental add / delete and
query-time filtering.

Beyond-parity surface (the reference is build-once/benchmark-only; its
algorithms have no add/remove — grep-confirmed, src/algorithms/*). The
design is TPU-native serving rather than a CPU-style dynamic structure:

  * the corpus lives in a **capacity-doubling device buffer** ``[C, d]``
    (amortised O(1) appends via donated ``dynamic_update_slice`` — no
    host round-trip, no reallocation per add);
  * deletions are **tombstones**: a penalty vector ``pen [C]`` holds
    ``+inf`` for dead/unfilled slots and is simply ADDED to the distance
    row, which works uniformly for l2 / ip / cosine and keeps the search
    a single static-shape jitted program;
  * searches run the same MXU scan as the immutable flat family at the
    CURRENT capacity — shapes change only on capacity growth, so XLA
    recompiles O(log N) times over an index's lifetime;
  * ``filter_ids`` (query-time filtering) folds into the same penalty
    row as a corpus-wide ``[C]`` allow-list; per-query ``[B, C]``
    penalties are supported on the dense path only;
  * ``compact()`` drops tombstones and shrinks capacity (automatic once
    tombstones exceed ``compact_frac`` of live rows).

Ids are stable handles (monotonically assigned, never reused), so
deletes/filters refer to the ids ``add`` returned.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vectordb_retrieval_tpu.models.base import pad_batch
from vectordb_retrieval_tpu.ops import distances as dops

_BIG = jnp.inf


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk_rows"))
def _masked_search(
    queries: jax.Array,  # [B, d] f32
    vectors: jax.Array,  # [C, d] f32 (dead/unfilled rows zeroed)
    sqnorms: jax.Array,  # [C] f32
    pen: jax.Array,  # [C] or [B, C]: 0 = live, +inf = masked
    k: int,
    metric: str,
    chunk_rows: int = 131_072,
) -> Tuple[jax.Array, jax.Array]:
    """Penalty-masked exact scan with a running top-k (streamed at big C)."""
    c, d = vectors.shape
    b = queries.shape[0]
    pen2 = pen if pen.ndim == 2 else pen[None, :]

    if c <= chunk_rows:
        dist = dops.pairwise_distances(
            queries, vectors, metric, sqnorms if metric == "l2" else None
        )
        dist = dist + pen2
        vals, ids = dops.top_k_smallest(dist, min(k, c))
        return vals, jnp.where(jnp.isfinite(vals), ids, -1)

    if pen.ndim == 2:
        # per-query penalties are [B, C] by definition — only the dense
        # branch supports them (no current caller builds one; filter_ids
        # folds into the corpus-wide 1-D penalty)
        raise ValueError(
            "per-query [B, C] penalties need the dense path "
            f"(C={c} > chunk_rows={chunk_rows})"
        )
    n_chunks = -(-c // chunk_rows)
    pad = n_chunks * chunk_rows - c
    vp = jnp.pad(vectors, ((0, pad), (0, 0))).reshape(
        n_chunks, chunk_rows, d
    )
    sp = jnp.pad(sqnorms, (0, pad)).reshape(n_chunks, chunk_rows)
    # 1-D penalty streams chunk-by-chunk: no [B, C] materialisation
    pp = jnp.pad(pen, (0, pad), constant_values=_BIG).reshape(
        n_chunks, chunk_rows
    )
    kk = min(k, c)
    init = (
        jnp.full((b, kk), _BIG, jnp.float32),
        jnp.full((b, kk), -1, jnp.int32),
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk_rows), 1)

    def step(carry, inp):
        best_d, best_i = carry
        ci, cv, cs, cp = inp
        dist = dops.pairwise_distances(
            queries, cv, metric, cs if metric == "l2" else None
        )
        dist = dist + cp[None, :]
        ids = row_ids + ci * chunk_rows
        cat_d = jnp.concatenate([best_d, dist], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids, (b, chunk_rows))], axis=1
        )
        nd, sel = dops.top_k_smallest(cat_d, kk)
        return (nd, jnp.take_along_axis(cat_i, sel, axis=1)), None

    (best_d, best_i), _ = jax.lax.scan(
        step,
        init,
        (jnp.arange(n_chunks, dtype=jnp.int32), vp, sp, pp),
    )
    return best_d, jnp.where(jnp.isfinite(best_d), best_i, -1)


@jax.jit
def _allow_penalty(slot_ids: jax.Array, allow_sorted: jax.Array) -> jax.Array:
    """Per-slot filter penalty: 0 where the slot's stable id is in the
    sorted allow-list, +inf elsewhere (dead slots, id −1, always +inf).

    Membership is a device-side ``searchsorted`` (O(S log F)), so the
    predicate pushes down into the probe scan without materialising a
    host-side mask per call; the allow-list is padded to a power of two
    by the caller so ragged filter sizes reuse compiles."""
    pos = jnp.searchsorted(allow_sorted, slot_ids)
    posc = jnp.clip(pos, 0, allow_sorted.shape[0] - 1)
    hit = (allow_sorted[posc] == slot_ids) & (slot_ids >= 0)
    return jnp.where(hit, jnp.float32(0), jnp.float32(jnp.inf))


_ALLOW_SENTINEL = np.iinfo(np.int32).max


def _pad_allow_list(filter_ids) -> np.ndarray:
    """Sorted int32 allow-list padded to the next power of two with an
    unmatchable sentinel (stable ids are int32 by the serving contract)."""
    f = np.unique(np.asarray(filter_ids, dtype=np.int64).reshape(-1))
    if f.size and (f[-1] >= _ALLOW_SENTINEL or f[0] < -1):
        raise ValueError("filter ids must fit int32 (serving id contract)")
    n = max(1, int(f.size))
    p2 = 1
    while p2 < n:
        p2 *= 2
    out = np.full((p2,), _ALLOW_SENTINEL, dtype=np.int32)
    out[: f.size] = f.astype(np.int32)
    return out


class MutableFlatIndex:
    """Incrementally updatable exact index (add / delete / filter / search).

    All state is device-resident; ``add``/``delete`` are O(batch) device
    updates. Ids are stable across compaction.
    """

    def __init__(
        self,
        dimension: int,
        metric: str = "l2",
        capacity: int = 1024,
        compact_frac: float = 0.25,
    ):
        if metric not in ("l2", "ip", "cosine"):
            raise ValueError(f"unsupported metric {metric!r}")
        self.dimension = int(dimension)
        self.metric = metric
        self.compact_frac = float(compact_frac)
        self._capacity = max(int(capacity), 8)
        self._vectors = jnp.zeros((self._capacity, dimension), jnp.float32)
        self._sqnorms = jnp.zeros((self._capacity,), jnp.float32)
        self._pen = jnp.full((self._capacity,), _BIG, jnp.float32)
        # slot -> stable id; -1 = never used
        self._slot_ids = np.full((self._capacity,), -1, dtype=np.int64)
        self._id_to_slot: dict = {}
        self._next_id = 0
        self._n_slots = 0  # filled prefix length
        self._n_dead = 0

    # -- properties -----------------------------------------------------
    @property
    def n_active(self) -> int:
        return self._n_slots - self._n_dead

    @property
    def capacity(self) -> int:
        return self._capacity

    # -- mutation -------------------------------------------------------
    def _grow(self, need: int) -> None:
        new_cap = self._capacity
        while new_cap < need:
            new_cap *= 2

        def expand(buf, fill):
            out = jnp.full((new_cap,) + buf.shape[1:], fill, buf.dtype)
            return jax.lax.dynamic_update_slice(
                out, buf, (0,) * buf.ndim
            )

        self._vectors = expand(self._vectors, 0.0)
        self._sqnorms = expand(self._sqnorms, 0.0)
        self._pen = expand(self._pen, _BIG)
        slot_ids = np.full((new_cap,), -1, dtype=np.int64)
        slot_ids[: self._capacity] = self._slot_ids
        self._slot_ids = slot_ids
        self._capacity = new_cap

    def add(self, vectors: np.ndarray) -> np.ndarray:
        """Append rows; returns their stable ids ``[m] int64``."""
        x = np.ascontiguousarray(vectors, dtype=np.float32)
        if x.ndim != 2 or x.shape[1] != self.dimension:
            raise ValueError(
                f"add expects [*, {self.dimension}], got {x.shape}"
            )
        m = x.shape[0]
        if m == 0:
            return np.empty((0,), np.int64)
        if self._n_slots + m > self._capacity:
            self._grow(self._n_slots + m)
        xd = jnp.asarray(x)
        if self.metric == "cosine":
            xd = dops.normalize(xd)
        start = self._n_slots
        self._vectors = jax.lax.dynamic_update_slice(
            self._vectors, xd, (start, 0)
        )
        self._sqnorms = jax.lax.dynamic_update_slice(
            self._sqnorms, jnp.sum(xd * xd, axis=-1), (start,)
        )
        self._pen = jax.lax.dynamic_update_slice(
            self._pen, jnp.zeros((m,), jnp.float32), (start,)
        )
        ids = np.arange(self._next_id, self._next_id + m, dtype=np.int64)
        self._slot_ids[start : start + m] = ids
        for i, sid in enumerate(ids):
            self._id_to_slot[int(sid)] = start + i
        self._next_id += m
        self._n_slots += m
        return ids

    def delete(self, ids) -> int:
        """Tombstone the given stable ids; returns how many were live."""
        slots = [
            self._id_to_slot.pop(int(i))
            for i in np.atleast_1d(np.asarray(ids, dtype=np.int64))
            if int(i) in self._id_to_slot
        ]
        if not slots:
            return 0
        slot_arr = jnp.asarray(np.asarray(slots, dtype=np.int32))
        self._pen = self._pen.at[slot_arr].set(_BIG)
        # zero dead rows so ip dots cannot resurface them via ties
        self._vectors = self._vectors.at[slot_arr].set(0.0)
        self._sqnorms = self._sqnorms.at[slot_arr].set(0.0)
        for s in slots:
            self._slot_ids[s] = -1
        self._n_dead += len(slots)
        if self._n_dead > max(64, self.compact_frac * max(self.n_active, 1)):
            self.compact()
        return len(slots)

    def compact(self) -> None:
        """Drop tombstones; shrink capacity to the live set (ids stable)."""
        live = np.nonzero(self._slot_ids[: self._n_slots] >= 0)[0]
        n = live.shape[0]
        new_cap = 8
        while new_cap < max(n, 1) * 2:
            new_cap *= 2
        gather = jnp.asarray(live.astype(np.int32))
        vecs = self._vectors[gather]
        sqn = self._sqnorms[gather]
        self._vectors = jnp.zeros((new_cap, self.dimension), jnp.float32)
        self._vectors = jax.lax.dynamic_update_slice(
            self._vectors, vecs, (0, 0)
        )
        self._sqnorms = jnp.zeros((new_cap,), jnp.float32)
        self._sqnorms = jax.lax.dynamic_update_slice(
            self._sqnorms, sqn, (0,)
        )
        pen = jnp.full((new_cap,), _BIG, jnp.float32)
        self._pen = pen.at[jnp.arange(n)].set(0.0)
        slot_ids = np.full((new_cap,), -1, dtype=np.int64)
        slot_ids[:n] = self._slot_ids[live]
        self._slot_ids = slot_ids
        self._id_to_slot = {int(s): j for j, s in enumerate(slot_ids[:n])}
        self._capacity = new_cap
        self._n_slots = n
        self._n_dead = 0

    def to_artifact(self):
        """Immutable ``flat`` snapshot servable by ``ANNSearcher``.

        Compacts first; the artifact carries ``row_ids`` so searches
        return the STABLE ids ``add`` handed out, not row positions."""
        from vectordb_retrieval_tpu.models.base import IndexArtifact

        self.compact()
        n = self._n_slots
        if self._next_id > 2**31 - 1:
            raise OverflowError("stable ids exceed int32 device range")
        vecs = self._vectors[:n]
        data = {
            "vectors": vecs,
            "sqnorms": self._sqnorms[:n],
            "row_ids": jnp.asarray(self._slot_ids[:n].astype(np.int32)),
        }
        meta = {
            "metric": self.metric,
            "dimension": self.dimension,
            "n_vectors": int(n),
            "normalize_queries": self.metric == "cosine",
            "mutable_snapshot": True,
        }
        return IndexArtifact("flat", jax.block_until_ready(data), meta)

    def save(self, path: str, context: Optional[dict] = None) -> None:
        """Persist mutable state (models/persist protocol: atomic + manifest)."""
        from vectordb_retrieval_tpu.models.base import IndexArtifact
        from vectordb_retrieval_tpu.models import persist

        n = self._n_slots
        art = IndexArtifact(
            "mutable_flat",
            {
                "vectors": self._vectors[:n],
                "sqnorms": self._sqnorms[:n],
                "pen": self._pen[:n],
                # host numpy leaf on purpose: jnp would truncate int64
                # stable ids (x64 disabled -> int32/float32)
                "slot_ids": self._slot_ids[:n].copy(),
            },
            {
                "metric": self.metric,
                "dimension": self.dimension,
                "next_id": int(self._next_id),
                "compact_frac": self.compact_frac,
            },
        )
        persist.save_artifact(art, path, context or {})

    @classmethod
    def load(cls, path: str, context: Optional[dict] = None):
        """Restore a :meth:`save` snapshot (host bookkeeping rebuilt)."""
        from vectordb_retrieval_tpu.models import persist

        art = persist.load_artifact(path, context or {}, device_put=False)
        if art.kind != "mutable_flat":
            raise ValueError(f"expected mutable_flat artifact, got {art.kind!r}")
        meta = art.metadata
        slot_ids = np.asarray(art.data["slot_ids"]).astype(np.int64)
        n = slot_ids.shape[0]
        self = cls(
            int(meta["dimension"]),
            metric=meta["metric"],
            capacity=max(n, 8),
            compact_frac=float(meta.get("compact_frac", 0.25)),
        )
        if n:
            self._vectors = jax.lax.dynamic_update_slice(
                self._vectors, jnp.asarray(np.asarray(art.data["vectors"])),
                (0, 0),
            )
            self._sqnorms = jax.lax.dynamic_update_slice(
                self._sqnorms, jnp.asarray(np.asarray(art.data["sqnorms"])),
                (0,),
            )
            self._pen = jax.lax.dynamic_update_slice(
                self._pen, jnp.asarray(np.asarray(art.data["pen"])), (0,)
            )
        self._slot_ids[:n] = slot_ids
        self._id_to_slot = {
            int(s): j for j, s in enumerate(slot_ids) if s >= 0
        }
        self._next_id = int(meta["next_id"])
        self._n_slots = n
        self._n_dead = int((slot_ids < 0).sum())
        return self

    # -- search ---------------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        k: int,
        filter_ids: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k over the live set; returns ``(dists, stable_ids)``.

        ``filter_ids``: optional allow-list of stable ids — rows outside
        it are masked for this call only (query-time filtering).
        """
        if self.n_active == 0:
            b = np.atleast_2d(queries).shape[0]
            return (
                np.full((b, k), np.inf, np.float32),
                np.full((b, k), -1, np.int64),
            )
        q = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.float32)
        # bucketed batch padding: serving clients send ragged batch sizes,
        # and each distinct B would otherwise be a fresh compile
        padded, n_q = pad_batch(q)
        qd = jnp.asarray(padded)
        metric = self.metric
        if metric == "cosine":
            qd = dops.normalize(qd)
            metric = "ip"
        pen = self._pen
        if filter_ids is not None:
            # vectorised membership over the slot->stable-id table (the
            # per-id dict-lookup loop was O(F) Python per call)
            allow = np.asarray(filter_ids, dtype=np.int64).reshape(-1)
            mask = np.isin(self._slot_ids[: self._capacity], allow)
            pen = pen + jnp.asarray(
                np.where(mask, 0.0, np.inf).astype(np.float32)
            )
        eff_k = min(k, self._capacity)
        dists, slots = _masked_search(
            qd, self._vectors, self._sqnorms, pen, eff_k, metric
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


class MutableIVFIndex:
    """Incrementally updatable IVF-Flat index (add / delete / search).

    Serving-style IVF mutation: the coarse quantizer is trained ONCE on
    the initial corpus and then frozen (the standard production pattern —
    centroid drift is handled by periodic rebuilds, not per-add
    retraining), while the bucketed inverted lists mutate in place:

      * every list owns >= 1 fixed-length bucket row in the padded device
        tensors (ops/ivf bucketed layout); ``add`` assigns rows to their
        nearest centroid on device and scatters them into free slots;
      * a list whose buckets are full gets a fresh bucket appended
        (device arrays grow by bucket-count doubling, amortised O(1));
      * ``delete`` tombstones slots (slot id -> -1 — the probe scan
        already masks negative ids, so deletion is O(1) with zero search
        overhead).

    Searches call the same jitted ``ivf_flat_search`` kernel as the
    immutable family; runtime ``nprobe`` works per call.
    """

    def __init__(
        self,
        vectors: np.ndarray,
        nlist: int = 64,
        metric: str = "l2",
        nprobe: int = 8,
        bucket_len: int = 0,
        seed: int = 123,
        train_iters: int = 20,
    ):
        from vectordb_retrieval_tpu.ops import ivf as ivfops
        from vectordb_retrieval_tpu.ops.kmeans import kmeans_fit

        if metric not in ("l2", "ip", "cosine"):
            raise ValueError(f"unsupported metric {metric!r}")
        x = np.ascontiguousarray(vectors, dtype=np.float32)
        n, d = x.shape
        self.dimension = d
        self.metric = metric
        self.nprobe = int(nprobe)
        xd = jnp.asarray(x)
        if metric == "cosine":
            xd = dops.normalize(xd)
        self.nlist = min(int(nlist), max(n, 1))
        self.centroids, _ = kmeans_fit(
            xd, self.nlist, seed=seed, iters=train_iters
        )
        from vectordb_retrieval_tpu.ops.kmeans import kmeans_assign

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
        # the PHYSICAL bucket width (build rounds target_len up to the pad
        # multiple) — growth rows must match it exactly
        self._L = int(slot_np.shape[1])
        nb = slot_np.shape[0]
        self._coarse_dirty = False
        safe = np.where(slot_np >= 0, slot_np, 0)
        vecs_np = np.asarray(xd)[safe] * (slot_np >= 0)[:, :, None]
        self._nb = nb  # logical bucket count (physical arrays may be larger)
        self._slot_ids = jnp.asarray(
            np.where(slot_np >= 0, slot_np, -1).astype(np.int32)
        )
        self._list_vecs = jnp.asarray(vecs_np)
        self._list_sqn = jnp.asarray((vecs_np**2).sum(-1).astype(np.float32))
        self._bucket_lists = np.asarray(bucket_lists_np, dtype=np.int32)
        self._refresh_coarse()
        # host bookkeeping
        self._fill = (slot_np >= 0).sum(axis=1).astype(np.int64)  # per bucket
        self._list_buckets = {
            l: list(np.nonzero(self._bucket_lists == l)[0])
            for l in range(self.nlist)
        }
        self._id_loc = {}  # stable id -> (bucket, slot)
        for b in range(nb):
            for s_idx, rid in enumerate(slot_np[b]):
                if rid >= 0:
                    self._id_loc[int(rid)] = (b, s_idx)
        self._next_id = n
        # per-list free-slot stacks: deleted slots are reused by the next
        # add() to the same list before any bucket append
        self._list_free = {l: [] for l in range(self.nlist)}
        self._n_dead = 0
        self.compact_frac = 0.25

    # -- internals ------------------------------------------------------
    @property
    def n_active(self) -> int:
        return len(self._id_loc)

    def _refresh_coarse(self) -> None:
        """Coarse probe table over the PHYSICAL bucket rows: unused
        (pre-allocated) buckets get a far-away sentinel centroid so the
        coarse top-k never probes them."""
        safe_lists = np.where(self._bucket_lists >= 0, self._bucket_lists, 0)
        coarse = self.centroids[jnp.asarray(safe_lists)]
        dead = jnp.asarray(self._bucket_lists < 0)
        self._coarse = jnp.where(dead[:, None], 1e9, coarse)

    def _new_bucket(self, list_id: int) -> int:
        """Claim a bucket row for ``list_id``; physical arrays grow by
        DOUBLING (one concatenate per doubling, amortised O(1) — a
        bucket-at-a-time append would be O(nb) per growth)."""
        physical = int(self._slot_ids.shape[0])
        if self._nb == physical:
            grow = physical  # double
            self._slot_ids = jnp.concatenate(
                [self._slot_ids, jnp.full((grow, self._L), -1, jnp.int32)]
            )
            self._list_vecs = jnp.concatenate(
                [
                    self._list_vecs,
                    jnp.zeros((grow, self._L, self.dimension), jnp.float32),
                ]
            )
            self._list_sqn = jnp.concatenate(
                [self._list_sqn, jnp.zeros((grow, self._L), jnp.float32)]
            )
            self._bucket_lists = np.concatenate(
                [self._bucket_lists, np.full(grow, -1, np.int32)]
            )
            self._fill = np.concatenate(
                [self._fill, np.zeros(grow, np.int64)]
            )
        nb = self._nb
        self._bucket_lists[nb] = np.int32(list_id)
        self._coarse_dirty = True  # refreshed once per add() batch
        self._list_buckets[list_id].append(nb)
        self._nb += 1
        return nb

    def add(self, vectors: np.ndarray) -> np.ndarray:
        """Insert rows (assigned to their frozen nearest centroid);
        returns stable ids."""
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
        if self._next_id + m > 2**31 - 1:
            # slot ids live in the int32 device tensor; silently wrapping
            # would return corrupted ids that no longer match add()'s handles
            raise OverflowError(
                "MutableIVFIndex lifetime id space exhausted (2^31); "
                "rebuild/compact the index to reset ids"
            )
        ids = np.arange(self._next_id, self._next_id + m, dtype=np.int64)
        self._next_id += m
        # vectorised placement: group rows by assigned list, then allocate
        # each list's positions in bulk — free slots (deleted-slot reuse)
        # first, then the tail bucket's remaining slots, then fresh
        # buckets. O(distinct lists) Python instead of O(rows) (the
        # per-row loop was a wall for bulk loads).
        rows_b, rows_s = np.empty(m, np.int32), np.empty(m, np.int32)
        order = np.argsort(assign, kind="stable")
        lists, starts = np.unique(assign[order], return_index=True)
        bounds = np.append(starts, m)
        for li, lst in enumerate(lists):
            lst = int(lst)
            idxs = order[bounds[li] : bounds[li + 1]]
            r = idxs.size
            free = self._list_free[lst]
            take = min(len(free), r)
            pos = 0
            for j in range(take):  # reuse tombstoned slots first
                bb, ss = free.pop()
                rows_b[idxs[pos]], rows_s[idxs[pos]] = bb, ss
                pos += 1
            # reused slots are live again — without this the dead count
            # grows monotonically under delete/add churn and triggers
            # spurious full compactions of an index with no dead slots
            self._n_dead = max(0, self._n_dead - take)
            while pos < r:
                bucket = self._list_buckets[lst][-1]
                if self._fill[bucket] >= self._L:
                    bucket = self._new_bucket(lst)
                space = int(self._L - self._fill[bucket])
                nfill = min(space, r - pos)
                sel = idxs[pos : pos + nfill]
                rows_b[sel] = bucket
                rows_s[sel] = self._fill[bucket] + np.arange(nfill)
                self._fill[bucket] += nfill
                pos += nfill
        for i in range(m):
            self._id_loc[int(ids[i])] = (int(rows_b[i]), int(rows_s[i]))
        if self._coarse_dirty:
            self._refresh_coarse()
            self._coarse_dirty = False
        bb, ss = jnp.asarray(rows_b), jnp.asarray(rows_s)
        self._slot_ids = self._slot_ids.at[bb, ss].set(
            ids.astype(np.int32)
        )
        self._list_vecs = self._list_vecs.at[bb, ss].set(xd)
        self._list_sqn = self._list_sqn.at[bb, ss].set(
            jnp.sum(xd * xd, axis=-1)
        )
        return ids

    def delete(self, ids) -> int:
        """Tombstone rows; slots go to their list's free stack for reuse."""
        locs = [
            self._id_loc.pop(int(i))
            for i in np.atleast_1d(np.asarray(ids, dtype=np.int64))
            if int(i) in self._id_loc
        ]
        if not locs:
            return 0
        bb = jnp.asarray(np.asarray([l[0] for l in locs], np.int32))
        ss = jnp.asarray(np.asarray([l[1] for l in locs], np.int32))
        self._slot_ids = self._slot_ids.at[bb, ss].set(-1)
        self._list_vecs = self._list_vecs.at[bb, ss].set(0.0)
        self._list_sqn = self._list_sqn.at[bb, ss].set(0.0)
        for b, s in locs:
            self._list_free[int(self._bucket_lists[b])].append((b, s))
        self._n_dead += len(locs)
        # probe work scales with bucket count, and churn strands buckets
        # that free-slot reuse alone cannot reclaim — compact when dead
        # slots dominate
        if self._n_dead > max(64, self.compact_frac * max(self.n_active, 1)):
            self.compact()
        return len(locs)

    def compact(self) -> None:
        """Rebuild the bucket layout tightly over the live rows.

        Rows keep their frozen list assignment and their stable ids;
        per-list buckets are repacked densely (freeing the tail buckets
        churn stranded), and physical arrays shrink back to the logical
        bucket count. O(live rows) host gather + one device upload.
        """
        slot_np = np.asarray(self._slot_ids)[: self._nb]
        vecs_np = np.asarray(self._list_vecs)[: self._nb]
        live = slot_np >= 0
        # per-list live member ids + vectors, in bucket order
        new_slots, new_vecs, new_lists = [], [], []
        for l in range(self.nlist):
            buckets = self._list_buckets[l]
            rows = [
                (slot_np[b, s], vecs_np[b, s])
                for b in buckets
                for s in np.nonzero(live[b])[0]
            ]
            n_b = max(1, -(-len(rows) // self._L))
            sl = np.full((n_b, self._L), -1, np.int64)
            vx = np.zeros((n_b, self._L, self.dimension), np.float32)
            for j, (sid, v) in enumerate(rows):
                sl[j // self._L, j % self._L] = sid
                vx[j // self._L, j % self._L] = v
            new_slots.append(sl)
            new_vecs.append(vx)
            new_lists.extend([l] * n_b)
        slot_all = np.concatenate(new_slots)
        vec_all = np.concatenate(new_vecs)
        nb = slot_all.shape[0]
        self._nb = nb
        self._slot_ids = jnp.asarray(slot_all.astype(np.int32))
        self._list_vecs = jnp.asarray(vec_all)
        self._list_sqn = jnp.asarray((vec_all**2).sum(-1).astype(np.float32))
        self._bucket_lists = np.asarray(new_lists, dtype=np.int32)
        self._refresh_coarse()
        self._fill = (slot_all >= 0).sum(axis=1).astype(np.int64)
        self._list_buckets = {
            l: list(np.nonzero(self._bucket_lists == l)[0])
            for l in range(self.nlist)
        }
        self._id_loc = {}
        for b in range(nb):
            for s_idx, rid in enumerate(slot_all[b]):
                if rid >= 0:
                    self._id_loc[int(rid)] = (b, s_idx)
        self._list_free = {l: [] for l in range(self.nlist)}
        self._n_dead = 0

    def to_artifact(self):
        """Immutable ``ivf_flat`` snapshot servable by ``ANNSearcher``.

        The handoff pattern: mutate online, periodically snapshot to the
        immutable serving artifact (bf16-list probe scan, persistence via
        models/persist). Compacts first so the artifact carries no
        tombstones; slot ids in the artifact are the STABLE ids.
        """
        from vectordb_retrieval_tpu.models.base import IndexArtifact
        from vectordb_retrieval_tpu.ops import ivf as ivfops

        self.compact()
        # coarse_table: unused pre-allocated buckets (list id -1) get
        # sentinel rows instead of wrapping to centroids[-1]
        coarse = ivfops.coarse_table(self.centroids, self._bucket_lists)
        meta = {
            "metric": self.metric,
            "dimension": self.dimension,
            "n_vectors": int(self.n_active),
            "normalize_queries": self.metric == "cosine",
            "index_key": f"IVF{self.nlist},Flat",
            "nprobe": self.nprobe,
            "nlist": int(self.nlist),
            "n_buckets": int(self._nb),
            "max_list_len": int(self._L),
            "probe_cum": [
                int(v)
                for v in ivfops.probe_budget_cum(
                    self._bucket_lists, self.nlist
                )
            ],
            "mutable_snapshot": True,
        }
        data = {
            "centroids": coarse,
            "bucket_lists": jnp.asarray(self._bucket_lists),
            "slot_ids": self._slot_ids,
            "list_vecs": self._list_vecs,
            "list_sqnorms": self._list_sqn,
        }
        return IndexArtifact("ivf_flat", jax.block_until_ready(data), meta)

    def save(self, path: str, context: Optional[dict] = None) -> None:
        """Persist mutable state (models/persist protocol: atomic + manifest)."""
        from vectordb_retrieval_tpu.models.base import IndexArtifact
        from vectordb_retrieval_tpu.models import persist

        art = IndexArtifact(
            "mutable_ivf",
            {
                "centroids": self.centroids,
                "slot_ids": self._slot_ids[: self._nb],
                "list_vecs": self._list_vecs[: self._nb],
                "list_sqnorms": self._list_sqn[: self._nb],
                "bucket_lists": jnp.asarray(self._bucket_lists[: self._nb]),
            },
            {
                "metric": self.metric,
                "dimension": self.dimension,
                "nlist": int(self.nlist),
                "nprobe": int(self.nprobe),
                "bucket_len": int(self._L),
                "next_id": int(self._next_id),
            },
        )
        persist.save_artifact(art, path, context or {})

    @classmethod
    def load(cls, path: str, context: Optional[dict] = None):
        """Restore a :meth:`save` snapshot (host bookkeeping rebuilt)."""
        from vectordb_retrieval_tpu.models import persist

        art = persist.load_artifact(path, context or {})
        if art.kind != "mutable_ivf":
            raise ValueError(f"expected mutable_ivf artifact, got {art.kind!r}")
        meta = art.metadata
        self = cls.__new__(cls)
        self.dimension = int(meta["dimension"])
        self.metric = meta["metric"]
        self.nprobe = int(meta["nprobe"])
        self.nlist = int(meta["nlist"])
        self._L = int(meta["bucket_len"])
        self.centroids = art.data["centroids"]
        slot_np = np.asarray(art.data["slot_ids"])
        self._nb = slot_np.shape[0]
        self._slot_ids = art.data["slot_ids"]
        self._list_vecs = art.data["list_vecs"]
        self._list_sqn = art.data["list_sqnorms"]
        self._bucket_lists = np.asarray(art.data["bucket_lists"])
        self._coarse_dirty = False
        self._refresh_coarse()
        # fill = the append WATERMARK (max occupied slot + 1), NOT the
        # live count: a snapshot can hold interior tombstones, and a
        # live-count fill points the next add() at an occupied top slot —
        # silently overwriting a live row (reproduced: save after an
        # interior delete, load, add -> a live id's vector replaced while
        # _id_loc still mapped it). Interior tombstones are pushed to the
        # free lists so reuse and the compaction trigger see them.
        occ = slot_np >= 0
        has = occ.any(axis=1)
        last = np.where(
            has, self._L - 1 - np.argmax(occ[:, ::-1], axis=1), -1
        )
        self._fill = (last + 1).astype(np.int64)
        self._list_buckets = {
            l: list(np.nonzero(self._bucket_lists == l)[0])
            for l in range(self.nlist)
        }
        self._id_loc = {}
        self._list_free = {l: [] for l in range(self.nlist)}
        self._n_dead = 0
        for b in range(self._nb):
            lst = int(self._bucket_lists[b])
            for s_idx in range(int(self._fill[b])):
                rid = slot_np[b, s_idx]
                if rid >= 0:
                    self._id_loc[int(rid)] = (b, s_idx)
                else:
                    self._list_free[lst].append((b, s_idx))
                    self._n_dead += 1
        self._next_id = int(meta["next_id"])
        self.compact_frac = 0.25
        return self

    def search(
        self,
        queries: np.ndarray,
        k: int,
        nprobe: Optional[int] = None,
        filter_ids: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Probe-scan search; ``filter_ids`` (allow-list of stable ids)
        pushes the predicate INTO the scan as a per-slot +inf penalty
        (ops/ivf.ivf_flat_search ``slot_pen``), so filtered rows never
        consume candidate slots — full recall over the allowed set, no
        overfetch-and-post-filter heuristics."""
        from vectordb_retrieval_tpu.ops import ivf as ivfops

        q = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.float32)
        b = q.shape[0]
        if self.n_active == 0:
            return (
                np.full((b, k), np.inf, np.float32),
                np.full((b, k), -1, np.int64),
            )
        padded, _ = pad_batch(q)  # bucketed sizes: one compile per bucket
        qd = jnp.asarray(padded)
        metric = self.metric
        if metric == "cosine":
            qd = dops.normalize(qd)
            metric = "ip"
        npb = nprobe if nprobe is not None else self.nprobe
        # probe whole LISTS: the bucket-probe budget is the sum of the npb
        # LARGEST lists' bucket counts (guaranteed top-npb-list coverage
        # under skew, ops/ivf.probe_budget_cum — average scaling let one
        # giant list consume every probe slot). Serving keeps the GENEROUS
        # semantics (slack probe slots spill to next-nearest lists — a
        # recall superset of 'exactly npb lists'): nprobe here is a
        # serving-side tuning knob, not a reference-comparison column, so
        # the extra coverage is free recall; the benchmark-facing
        # immutable family defaults to the exact reference semantics
        # (ops/ivf.exact_probe_mask). Quantised UP to a power of
        # two so steady bucket growth does not mint a fresh static jit
        # argument (= a full recompile, tens of seconds on the remote
        # tunnel) per added bucket — extra probes only help recall.
        physical = int(self._slot_ids.shape[0])
        lens = sorted(
            (len(b) for b in self._list_buckets.values()), reverse=True
        )
        eff = min(max(1, sum(lens[:npb])), physical)
        q2 = 1
        while q2 < eff:
            q2 *= 2
        # cap with the PHYSICAL row count (changes only on doubling):
        # capping with _nb would re-mint a static jit arg per added bucket;
        # probed dead buckets only contribute masked -1/inf slots
        eff = min(q2, physical)
        eff_k = min(k, physical * self._L)
        slot_pen = None
        if filter_ids is not None:
            slot_pen = _allow_penalty(
                self._slot_ids, jnp.asarray(_pad_allow_list(filter_ids))
            )
        dists, ids = ivfops.ivf_flat_search(
            qd, self._coarse, self._slot_ids, self._list_vecs,
            self._list_sqn, eff_k, eff, metric=metric, slot_pen=slot_pen,
        )
        dists = np.asarray(dists)[:b]
        ids = np.asarray(ids).astype(np.int64)[:b]
        ids = np.where(np.isfinite(dists), ids, -1)
        if dists.shape[1] < k:
            padw = k - dists.shape[1]
            dists = np.pad(
                dists, ((0, 0), (0, padw)), constant_values=np.inf
            )
            ids = np.pad(ids, ((0, 0), (0, padw)), constant_values=-1)
        return dists, ids
