"""Big-corpus staging: raw on-disk row store + chunked host->device upload.

TPU-first replacement for the reference's memmap cache protocol v2
(src/benchmark/dataset.py:281-471). The reference streamed >RAM corpora
through a bespoke pickle+memmap cache consumed by CPU FAISS; here the
device (HBM) is the working set, so the design goal is different:

  * **host RSS stays O(chunk)** — the corpus is read with offset-based
    ``np.fromfile`` (no mmap page residency) and uploaded chunk-by-chunk;
  * **the device array is assembled in place** with a donated
    ``lax.dynamic_update_slice`` loop, so neither host nor device ever
    holds 2x the corpus;
  * writers append chunks, so dataset generators never materialise the
    full corpus either.

``BigStore`` is a raw C-order ``.bin`` next to a ``.json`` sidecar holding
shape/dtype. ``as_memmap()`` gives a read-only ``np.memmap`` view for
NumPy-API consumers (slicing pages in lazily).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Iterator, Optional, Union

import numpy as np

# Inputs above this many bytes take the chunked upload path even when they
# are plain ndarrays (bounds the transient host copy ascontiguousarray
# would otherwise make for dtype conversion).
CHUNKED_UPLOAD_BYTES = 1 << 30
DEFAULT_CHUNK_ROWS = 262_144


class BigStore:
    """Raw on-disk ``[N, d]`` row store with bounded-RSS chunk reads."""

    MAGIC = "vrt_bigstore_v1"

    def __init__(self, path: str, shape, dtype, _writing: bool = False):
        self.path = path
        self.shape = tuple(int(s) for s in shape)
        self.dtype = np.dtype(dtype)
        self._writing = _writing
        self._fh = None

    # -- creation -------------------------------------------------------
    @classmethod
    def create(cls, path: str, dim: int, dtype=np.float32) -> "BigStore":
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        store = cls(path, (0, dim), dtype, _writing=True)
        store._fh = open(path + ".tmp", "wb")
        return store

    def append(self, rows: np.ndarray) -> None:
        if not self._writing:
            raise RuntimeError("store not opened for writing")
        rows = np.ascontiguousarray(rows, dtype=self.dtype)
        if rows.ndim != 2 or rows.shape[1] != self.shape[1]:
            raise ValueError(
                f"append expects [*, {self.shape[1]}], got {rows.shape}"
            )
        rows.tofile(self._fh)
        self.shape = (self.shape[0] + rows.shape[0], self.shape[1])

    def close(self) -> None:
        if self._writing and self._fh is not None:
            self._fh.close()
            self._fh = None
            os.replace(self.path + ".tmp", self.path)
            with open(self.path + ".json", "w") as f:
                json.dump(
                    {
                        "magic": self.MAGIC,
                        "shape": list(self.shape),
                        "dtype": self.dtype.name,
                    },
                    f,
                )
            self._writing = False

    def __enter__(self) -> "BigStore":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- reading --------------------------------------------------------
    @classmethod
    def open(cls, path: str) -> "BigStore":
        with open(path + ".json") as f:
            meta = json.load(f)
        if meta.get("magic") != cls.MAGIC:
            raise ValueError(f"{path}: not a BigStore")
        return cls(path, meta["shape"], meta["dtype"])

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(path) and os.path.exists(path + ".json")

    @property
    def nbytes(self) -> int:
        return self.shape[0] * self.shape[1] * self.dtype.itemsize

    def read_rows(self, start: int, stop: int) -> np.ndarray:
        """Offset-based read (no mmap): RSS cost is just the returned copy."""
        n, d = self.shape
        start, stop = max(0, start), min(stop, n)
        count = max(0, stop - start) * d
        with open(self.path, "rb") as f:
            f.seek(start * d * self.dtype.itemsize)
            out = np.fromfile(f, dtype=self.dtype, count=count)
        return out.reshape(-1, d)

    def iter_chunks(
        self, chunk_rows: int = DEFAULT_CHUNK_ROWS
    ) -> Iterator[np.ndarray]:
        """Sequential chunk iteration, using the native prefetching stream
        reader (native/vrt_io.cpp) when built — disk reads overlap the
        consumer's device work; NumPy offset reads otherwise."""
        from vectordb_retrieval_tpu.data import native_io

        n, d = self.shape
        row_bytes = d * self.dtype.itemsize
        if native_io.available() and n:
            rows = np.zeros((0, d), dtype=self.dtype)
            for raw in native_io.stream_chunks(
                self.path, chunk_bytes=chunk_rows * row_bytes
            ):
                part = np.frombuffer(raw.tobytes(), dtype=self.dtype)
                rows = (
                    part.reshape(-1, d)
                    if rows.size == 0
                    else np.concatenate(
                        [rows, part.reshape(-1, d)]
                    )
                )
                while rows.shape[0] >= chunk_rows:
                    yield rows[:chunk_rows]
                    rows = rows[chunk_rows:]
            if rows.shape[0]:
                yield rows
            return
        for start in range(0, n, chunk_rows):
            yield self.read_rows(start, start + chunk_rows)

    def as_memmap(self) -> np.memmap:
        return np.memmap(
            self.path, dtype=self.dtype, mode="r", shape=self.shape
        )


CorpusLike = Union[np.ndarray, BigStore]


def _src_shape(src: CorpusLike):
    return tuple(int(s) for s in src.shape)


def _read_chunk(src: CorpusLike, start: int, stop: int) -> np.ndarray:
    if isinstance(src, BigStore):
        return src.read_rows(start, stop)
    out = np.ascontiguousarray(src[start:stop], dtype=np.float32)
    if isinstance(src, np.memmap):
        # Drop the file pages this chunk touched so resident memory stays
        # O(chunk) over the whole upload (linux; harmless no-op elsewhere).
        try:
            import mmap as _mmap

            src._mmap.madvise(_mmap.MADV_DONTNEED)
        except (AttributeError, ValueError, OSError):
            pass
    return out


def iter_chunks_any(
    src: CorpusLike, chunk_rows: int
) -> Iterator[tuple]:
    """Yield ``(start_row, chunk_f32)`` sequentially from any corpus
    source; BigStore sources stream through the native prefetch reader
    (disk IO overlaps the consumer's device work)."""
    if isinstance(src, BigStore):
        start = 0
        for chunk in src.iter_chunks(chunk_rows):
            yield start, np.ascontiguousarray(chunk, dtype=np.float32)
            start += chunk.shape[0]
        return
    n = int(src.shape[0])
    for start in range(0, n, chunk_rows):
        yield start, _read_chunk(src, start, start + chunk_rows)


def chunked_device_put(
    src: CorpusLike,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    dtype=None,
) -> "jax.Array":
    """Assemble a device-resident ``[N, d]`` array from a host source in
    fixed-size chunks.

    Host RSS peaks at one chunk copy; device memory at N*d (the donated
    ``dynamic_update_slice`` updates the buffer in place, and the final
    (ragged) chunk is handled by overlapping the previous one, keeping a
    single compiled program for every step).
    """
    import jax
    import jax.numpy as jnp

    n, d = _src_shape(src)
    out_dtype = dtype or jnp.float32
    if n == 0:
        return jnp.zeros((0, d), out_dtype)
    chunk_rows = max(1, min(chunk_rows, n))

    @jax.jit
    def _init():
        return jnp.zeros((n, d), out_dtype)

    update = jax.jit(
        lambda buf, chunk, start: jax.lax.dynamic_update_slice(
            buf, chunk.astype(out_dtype), (start, 0)
        ),
        donate_argnums=(0,),
    )

    buf = _init()
    starts = list(range(0, n - chunk_rows + 1, chunk_rows))
    if starts[-1] + chunk_rows < n:
        starts.append(n - chunk_rows)  # overlapping tail, same chunk shape
    for i, start in enumerate(starts):
        host = _read_chunk(src, start, start + chunk_rows)
        buf = update(buf, jnp.asarray(host), np.int32(start))
        if (i + 1) % 4 == 0:  # cap in-flight staging chunks (async dispatch)
            jax.block_until_ready(buf)
    return jax.block_until_ready(buf)


def is_out_of_core(vectors: CorpusLike) -> bool:
    return isinstance(vectors, (BigStore, np.memmap))


def corpus_to_device(
    vectors: CorpusLike,
    dtype=None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
) -> "jax.Array":
    """Builders' single entry point: host corpus (ndarray / memmap /
    BigStore) -> device array, streaming when the input is out-of-core or
    large enough that a host-side contiguous copy would hurt."""
    import jax.numpy as jnp

    n, d = _src_shape(vectors)
    nbytes = n * d * 4
    if is_out_of_core(vectors) or nbytes > CHUNKED_UPLOAD_BYTES:
        return chunked_device_put(vectors, chunk_rows=chunk_rows, dtype=dtype)
    arr = np.ascontiguousarray(vectors, dtype=np.float32)
    out = jnp.asarray(arr)
    return out.astype(dtype) if dtype is not None else out


@functools.lru_cache(maxsize=None)
def _chunk_merge_step(metric: str, normalize: bool = False):
    """Build the jitted per-chunk merge for :func:`streamed_exact_search`.

    Memoized per (metric, normalize): a fresh closure per call would carry
    a fresh jax.jit cache, so every invocation would re-trace and
    re-compile even at identical shapes — tens of seconds per GT
    computation on the remote tunnel.

    One compiled program per (metric, chunk/batch shape): score the chunk,
    take its local top-kk with the cancellation-free l2 rescore
    (ops/distances.rescore_l2 — exactness parity with the resident paths),
    then merge into the running candidate set. ``base``/``n_valid`` are
    traced scalars so every chunk (including the padded tail) reuses the
    same executable.
    """
    import jax
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops import distances as dops

    @jax.jit
    def step(best_d, best_i, q, chunk, base, n_valid):
        c = chunk.shape[0]
        kk = best_d.shape[1]
        if normalize:  # cosine corpora: unit-normalise rows in-step
            chunk = dops.normalize(chunk)
        dist = dops.pairwise_distances(q, chunk, metric)
        local_ids = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        dist = jnp.where(local_ids < n_valid, dist, jnp.inf)
        cd, ci = dops.top_k_smallest(dist, min(kk, c))
        if metric == "l2":
            cd = dops.rescore_l2(q, chunk, ci)
            # rescore_l2 recomputes every non-negative id, which would
            # resurrect padded tail rows (their zero vectors often score
            # better than real neighbours) — reapply the validity mask
            cd = jnp.where(ci < n_valid, cd, jnp.inf)
        gids = jnp.where(jnp.isfinite(cd), ci + base, -1)
        cat_d = jnp.concatenate([best_d, cd], axis=1)
        cat_i = jnp.concatenate([best_i, gids], axis=1)
        nd, sel = dops.top_k_smallest(cat_d, kk)
        return nd, jnp.take_along_axis(cat_i, sel, axis=1)

    return step


def streamed_exact_search(
    queries: np.ndarray,
    src: CorpusLike,
    k: int,
    metric: str = "l2",
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    overfetch: int = 16,
    sync_every: int = 4,
    normalize: bool = False,
):
    """Exact k-NN over an out-of-core corpus: O(chunk) host AND device memory.

    The fully streaming regime for corpora too large for host RAM *or*
    device HBM (and for this host's TPU tunnel, whose client mirrors every
    device buffer host-side — a resident-corpus upload can never keep RSS
    under the corpus size here): a host loop uploads one chunk at a time,
    a single compiled merge step folds it into the running top-k, and the
    chunk buffer is dropped before the next read. L2 candidates are
    rescored with the cancellation-free diff form inside the step, so
    results match the resident exact paths to f32 rounding.

    Returns ``(dists [B, k], ids [B, k])`` as NumPy arrays.
    """
    import jax
    import jax.numpy as jnp

    n, d = _src_shape(src)
    if k > n:
        raise ValueError(f"k={k} exceeds database size {n}")
    q = jnp.asarray(np.ascontiguousarray(queries, dtype=np.float32))
    if normalize:
        from vectordb_retrieval_tpu.ops import distances as dops

        q = dops.normalize(q)
    b = q.shape[0]
    chunk_rows = max(1, min(chunk_rows, n))
    kk = min(k + overfetch, n)
    best_d = jnp.full((b, kk), jnp.inf, jnp.float32)
    best_i = jnp.full((b, kk), -1, jnp.int32)
    step = _chunk_merge_step(metric, normalize)
    for i, (start, host) in enumerate(iter_chunks_any(src, chunk_rows)):
        rows = host.shape[0]
        if rows < chunk_rows:  # pad the ragged tail to the compiled shape
            host = np.pad(host, ((0, chunk_rows - rows), (0, 0)))
        best_d, best_i = step(
            best_d, best_i, q, jnp.asarray(host),
            np.int32(start), np.int32(rows),
        )
        # Async dispatch would otherwise keep EVERY enqueued chunk's host
        # staging alive at once (O(n) memory, defeating the point);
        # draining periodically caps in-flight chunks at sync_every.
        if sync_every and (i + 1) % sync_every == 0:
            jax.block_until_ready(best_d)
    best_d, best_i = jax.block_until_ready((best_d, best_i))
    return np.asarray(best_d)[:, :k], np.asarray(best_i)[:, :k]


def peak_rss_bytes() -> Optional[int]:
    """Peak resident set size of this process (linux: ru_maxrss is KiB)."""
    try:
        import resource

        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    except Exception:
        return None
