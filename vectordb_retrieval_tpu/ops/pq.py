"""Product quantization: codebook training, encoding, ADC search.

TPU-native replacement for FAISS ``PQ{m}`` / the PQ stage of ``IVF{n},PQ{m}``
(reference: src/algorithms/modular.py:224-289 factory strings,
configs/benchmark_config.yaml:36-72).

ADC-by-reconstruction: instead of the CPU-style per-code LUT gather (hostile
to the VPU), the scan *reconstructs* code chunks through an embedding-style
codebook gather and computes ``||q||^2 + ||x_hat||^2 - 2 q.x_hat`` with one
MXU matmul. This is algebraically identical to classic ADC — for L2,
``||q - x_hat||^2 = sum_m ||q_m - c_{m,code}||^2`` — because
``||x_hat||^2`` is precomputed per code at build time. HBM traffic per query
batch is codes (m bytes/vector) instead of full vectors (4d bytes), and the
FLOPs stay equal to the exact scan, which the MXU eats.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.ops.kmeans import kmeans_fit

KSUB = 256  # 8-bit codes, FAISS default
_ENCODE_CHUNK = 32_768
_SCAN_CHUNK = 65_536


def split_dim(d: int, m: int) -> int:
    if d % m != 0:
        raise ValueError(f"dimension {d} not divisible by m={m} subquantizers")
    return d // m


@functools.partial(jax.jit, static_argnames=("m", "ksub", "iters"))
def pq_train(
    x: jax.Array, m: int, ksub: int = KSUB, seed: int = 0, iters: int = 20
) -> jax.Array:
    """Train per-subspace codebooks ``[m, ksub, dsub]`` (vmapped k-means)."""
    n, d = x.shape
    dsub = split_dim(d, m)
    sub = x.reshape(n, m, dsub).transpose(1, 0, 2)  # [m, n, dsub]

    def fit(xs):
        c, _ = kmeans_fit(xs, ksub, seed=seed, iters=iters)
        return c

    return jax.vmap(fit)(sub)


@functools.partial(jax.jit, static_argnames=("m", "ksub", "iters", "opq_iters"))
def opq_train(
    x: jax.Array,
    m: int,
    ksub: int = KSUB,
    seed: int = 0,
    iters: int = 12,
    opq_iters: int = 6,
) -> Tuple[jax.Array, jax.Array]:
    """OPQ: learn rotation R + codebooks minimising quantisation error.

    Alternating optimisation (Ge et al., OPQ): hold R, train/encode PQ on
    ``x @ R``; hold codes, solve the orthogonal Procrustes problem
    ``R = U V^T`` from ``svd(x^T x_hat)``. Everything stays on device —
    the SVD is on the small ``[d, d]`` covariance.

    Returns ``(R [d, d], codebooks [m, ksub, dsub])``.
    """
    n, d = x.shape
    r = jnp.eye(d, dtype=jnp.float32)

    def step(carry, _):
        r, _ = carry
        y = x @ r
        cb = pq_train(y, m, ksub=ksub, seed=seed, iters=iters)
        codes = pq_encode(y, cb)
        y_hat = pq_reconstruct(codes, cb)
        # Procrustes: argmin_R ||xR - y_hat||_F s.t. R orthogonal
        cov = jax.lax.dot_general(
            x, y_hat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        u, _, vt = jnp.linalg.svd(cov, full_matrices=False)
        new_r = u @ vt
        err = jnp.mean(jnp.sum((y - y_hat) ** 2, axis=1))
        return (new_r, err), err

    (r, _), errs = jax.lax.scan(step, (r, jnp.float32(0.0)), None, length=opq_iters)
    cb = pq_train(x @ r, m, ksub=ksub, seed=seed, iters=iters)
    return r, cb


@functools.partial(jax.jit, static_argnames=("chunk",))
def pq_encode(
    x: jax.Array, codebooks: jax.Array, chunk: int = _ENCODE_CHUNK
) -> jax.Array:
    """Encode ``x [N, d]`` -> ``codes [N, m] uint8`` (nearest sub-centroid)."""
    n, d = x.shape
    m, ksub, dsub = codebooks.shape
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0))).reshape(n_chunks, chunk, m, dsub)

    cb_sqn = jnp.sum(codebooks * codebooks, axis=-1)  # [m, ksub]

    def step(_, xc):  # xc: [chunk, m, dsub]
        dots = jnp.einsum(
            "cmd,mkd->cmk", xc, codebooks, preferred_element_type=jnp.float32
        )
        dist = cb_sqn[None] - 2.0 * dots  # [chunk, m, ksub]; ||x||^2 constant
        return None, jnp.argmin(dist, axis=-1).astype(jnp.uint8)

    _, codes = jax.lax.scan(step, None, xp)
    return codes.reshape(-1, m)[:n]


_RECON_CHUNK = 4096


def pq_reconstruct(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Decode ``codes [C, m]`` -> ``x_hat [C, m*dsub]`` via one-hot matmul.

    ``one_hot(codes) @ codebooks`` puts the codebook lookup on the MXU
    instead of issuing per-row gathers (which serialize badly on TPU — the
    gather variant measured ~10x slower inside the IVF-PQ probe loop). All
    subspaces decode in ONE batched contraction (``rmk,mkd->rmd``) rather
    than a sequential scan over m (64 dependent small matmuls cost ~5x in
    dispatch latency); a scan over row chunks bounds the one-hot transient
    to ``[chunk, m, ksub]``.
    """
    m, ksub, dsub = codebooks.shape
    c = codes.shape[0]
    chunk = min(_RECON_CHUNK, max(c, 1))
    n_chunks = -(-c // chunk)
    pad = n_chunks * chunk - c
    codes_p = jnp.pad(codes, ((0, pad), (0, 0))).reshape(
        n_chunks, chunk, m
    )

    def body(_, cc):
        onehot = jax.nn.one_hot(cc.astype(jnp.int32), ksub, dtype=jnp.float32)
        part = jnp.einsum(
            "rmk,mkd->rmd", onehot, codebooks,
            preferred_element_type=jnp.float32,
        )
        return None, part.reshape(chunk, m * dsub)

    if n_chunks == 1:
        onehot = jax.nn.one_hot(
            codes_p[0].astype(jnp.int32), ksub, dtype=jnp.float32
        )
        out = jnp.einsum(
            "rmk,mkd->rmd", onehot, codebooks,
            preferred_element_type=jnp.float32,
        ).reshape(chunk, m * dsub)
        return out[:c]
    _, parts = jax.lax.scan(body, None, codes_p)
    return parts.reshape(n_chunks * chunk, m * dsub)[:c]


def pq_reconstruct_gather(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Embedding-gather decode (oracle for tests; slow on TPU)."""

    def per_sub(cb_m, codes_m):  # [ksub, dsub], [C] -> [C, dsub]
        return jnp.take(cb_m, codes_m, axis=0)

    parts = jax.vmap(per_sub, in_axes=(0, 1), out_axes=1)(
        codebooks, codes.astype(jnp.int32)
    )  # [C, m, dsub]
    return parts.reshape(codes.shape[0], -1)


def pq_code_sqnorms(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """``||x_hat||^2 [N]`` from codes — built once, stored with the index."""
    cb_sqn = jnp.sum(codebooks * codebooks, axis=-1)  # [m, ksub]

    def per_sub(cbn_m, codes_m):  # [ksub], [N] -> [N]
        return jnp.take(cbn_m, codes_m, axis=0)

    per = jax.vmap(per_sub, in_axes=(0, 1), out_axes=1)(
        cb_sqn, codes.astype(jnp.int32)
    )  # [N, m]
    return jnp.sum(per, axis=1)


# ---------------------------------------------------------------------------
# Per-list block-diagonal residual rotations (IVF-PQ recall lever).
#
# FAISS's OPQ learns ONE global rotation; per-list residual distributions
# under a skewed/anisotropic corpus are differently oriented, so a shared
# residual codebook quantises tight lists at a spacing tuned for diffuse
# ones (docs/results_round3.md section 2). Here every coarse list l gets a
# block-diagonal orthogonal rotation R_l (nb blocks of [bs, bs]); residuals
# encode as PQ(R_l r) against ONE shared codebook and decode-on-read
# applies R_l^T. Storage is [nlist, nb, bs, bs] (2-8 MB at 1M-scale
# configs — negligible next to the codes) and the decode-side cost is one
# small batched matmul fused into the reconstruction.
#
# Training is OPQ-style alternation (Ge et al.), with the Procrustes
# solved per (list, block) as the orthogonal polar factor of
# C = sum_i y_hat_i r_i^T via batched Newton-Schulz iteration — no host
# SVDs, everything stays batched matmuls on device.
# ---------------------------------------------------------------------------


@jax.jit
def polar_orthogonalize(c: jax.Array) -> jax.Array:
    """Batched orthogonal polar factor ``U V^T`` of ``c [..., bs, bs]``.

    Exact batched SVD (0.2-0.6 ms for 16k 8x8/16x16 blocks — build-time
    only). Rank-DEFICIENT covariances are the common case here (strongly
    anisotropic list residuals concentrate energy in few directions):
    SVD's arbitrary null-space completion is still Procrustes-optimal,
    where Newton-Schulz iteration simply fails to converge (tried first;
    its fallback turned every anisotropic list — exactly the lists that
    matter — into identity). Near-zero inputs (empty lists) keep identity.
    """
    bs = c.shape[-1]
    eye = jnp.eye(bs, dtype=jnp.float32)
    norm = jnp.sqrt(jnp.sum(c * c, axis=(-2, -1), keepdims=True))
    x = (c / jnp.maximum(norm, 1e-20)).astype(jnp.float32)
    u, _, vt = jnp.linalg.svd(x, full_matrices=True)
    r = jnp.einsum(
        "...ik,...kj->...ij", u, vt, preferred_element_type=jnp.float32
    )
    ok = norm[..., 0, 0] > 1e-12
    return jnp.where(ok[..., None, None], r, eye)


def _as_blocks(x: jax.Array, bs: int) -> jax.Array:
    n, d = x.shape
    if d % bs:
        raise ValueError(f"dimension {d} not divisible by rotation block {bs}")
    return x.reshape(n, d // bs, bs)


def rotate_blocks(x: jax.Array, rot_rows: jax.Array) -> jax.Array:
    """``y_i = blockdiag(rot_rows[i]) @ x_i`` — rows already carry their
    own rotation blocks ``[N, nb, bs, bs]``."""
    bs = rot_rows.shape[-1]
    xb = _as_blocks(x, bs)
    y = jnp.einsum(
        "nbf,nbef->nbe", xb, rot_rows, preferred_element_type=jnp.float32
    )
    return y.reshape(x.shape)


def unrotate_blocks(y: jax.Array, rot_rows: jax.Array) -> jax.Array:
    """Inverse of :func:`rotate_blocks` (orthogonal transpose)."""
    bs = rot_rows.shape[-1]
    yb = _as_blocks(y, bs)
    x = jnp.einsum(
        "nbe,nbef->nbf", yb, rot_rows, preferred_element_type=jnp.float32
    )
    return x.reshape(y.shape)


# bounds the [chunk, nb, bs, bs] Procrustes outer-product transient
_ROT_CHUNK = 16_384


@functools.partial(
    jax.jit,
    static_argnames=("nlist", "m", "bs", "ksub", "iters", "alt_iters"),
)
def train_per_list_rotations(
    residuals: jax.Array,
    assignments: jax.Array,
    nlist: int,
    m: int,
    bs: int,
    ksub: int = KSUB,
    seed: int = 0,
    iters: int = 12,
    alt_iters: int = 3,
) -> Tuple[jax.Array, jax.Array]:
    """Alternate shared-codebook training with per-list block Procrustes.

    Returns ``(rotations [nlist, nb, bs, bs], codebooks [m, ksub, dsub])``
    where the codebooks are trained on the FINAL rotated residuals — the
    pair must be used together (encode ``PQ(R_l r)``, decode ``R_l^T``).
    Lists whose accumulated Procrustes covariance is degenerate (too few
    rows for a stable [bs, bs] frame) keep the identity rotation.
    """
    n, d = residuals.shape
    if d % bs:
        raise ValueError(f"dimension {d} not divisible by rotation block {bs}")
    nb = d // bs
    a = assignments.astype(jnp.int32)

    chunk = min(_ROT_CHUNK, max(n, 1))
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    r_p = jnp.pad(residuals, ((0, pad), (0, 0))).reshape(n_chunks, chunk, d)
    # padded rows scatter into segment nlist (dropped)
    a_p = jnp.pad(a, (0, pad), constant_values=nlist).reshape(
        n_chunks, chunk
    )

    # PCA + eigenvalue-allocation init (the per-list analogue of OPQ's
    # non-parametric solution, Ge et al.): rotate every list's block to
    # its principal frame, then PERMUTE the axes so eigenvalue mass is
    # balanced across the subquantizers inside the block — variance-
    # descending order packs all the energy into subquantizer 0 and is
    # measurably WORSE than no rotation (one 256-code codebook carries
    # everything); greedy log-eigenvalue balancing splits the energetic
    # axes one-per-subquantizer. The pure Procrustes alternation from
    # identity converges too slowly to find this frame on its own
    # (measured: -9% reconstruction error after 3 rounds, still -26%
    # after 16); from this init the alternation only polishes.
    # Eigenvector signs are fixed by the largest-|entry| convention so
    # reflections agree across lists.
    def cov_accum(c_acc, inp):
        rc, ac = inp
        rb = _as_blocks(rc, bs)
        outer = rb[:, :, :, None] * rb[:, :, None, :]
        seg = jax.ops.segment_sum(outer, ac, num_segments=nlist + 1)[:nlist]
        return c_acc + seg, None

    cov, _ = jax.lax.scan(
        cov_accum,
        jnp.zeros((nlist, nb, bs, bs), jnp.float32),
        (r_p, a_p),
    )
    counts = jax.ops.segment_sum(
        jnp.ones((n_chunks * chunk,), jnp.float32),
        a_p.reshape(-1),
        num_segments=nlist + 1,
    )[:nlist]
    eig, v = jnp.linalg.eigh(cov)  # ascending eigenvalues
    eig = eig[..., ::-1]
    v = v[..., ::-1]  # columns: principal axes, variance-descending
    pick = jnp.argmax(jnp.abs(v), axis=-2, keepdims=True)
    v = v * jnp.sign(jnp.take_along_axis(v, pick, axis=-2))
    rot = jnp.swapaxes(v, -1, -2)  # rows = axes: y = V^T r

    dsub = d // m
    if bs % dsub == 0 and bs > dsub:
        msub = bs // dsub  # subquantizers inside one rotation block

        def alloc(eigs):  # [bs] descending -> output-position permutation
            logs = jnp.log(jnp.maximum(eigs, 1e-12))

            def step(carry, i):
                cap, load, perm = carry
                s = jnp.argmin(jnp.where(cap < dsub, load, jnp.inf))
                perm = perm.at[s * dsub + cap[s]].set(i)
                return (
                    cap.at[s].add(1), load.at[s].add(logs[i]), perm
                ), None

            (_, _, perm), _ = jax.lax.scan(
                step,
                (
                    jnp.zeros(msub, jnp.int32),
                    jnp.zeros(msub, jnp.float32),
                    jnp.zeros(bs, jnp.int32),
                ),
                jnp.arange(bs),
            )
            return perm

        perm = jax.vmap(jax.vmap(alloc))(eig)  # [nlist, nb, bs]
        rot = jnp.take_along_axis(rot, perm[..., None], axis=-2)

    rot = jnp.where(
        (counts >= bs)[:, None, None, None],
        rot,
        jnp.eye(bs, dtype=jnp.float32),
    )

    def alternate(rot, _):
        rot_rows_of = lambda ac: rot[jnp.clip(ac, 0, nlist - 1)]
        y = jax.lax.map(
            lambda inp: rotate_blocks(inp[0], rot_rows_of(inp[1])),
            (r_p, a_p),
        ).reshape(n_chunks * chunk, d)[:n]
        cb = pq_train(y, m, ksub=ksub, seed=seed, iters=iters)
        codes_p = jnp.pad(
            pq_encode(y, cb), ((0, pad), (0, 0))
        ).reshape(n_chunks, chunk, m)

        def accum(c_acc, inp):
            rc, ac, cc = inp
            yb = _as_blocks(pq_reconstruct(cc, cb), bs)
            rb = _as_blocks(rotate_blocks(rc, rot_rows_of(ac)), bs)
            # C += y_hat r^T in the ROTATED frame: the update is the
            # incremental Procrustes R_new = polar(C) @ R_old composed
            # below, keeping each alternation's solve well-conditioned
            outer = yb[:, :, :, None] * rb[:, :, None, :]
            seg = jax.ops.segment_sum(
                outer, ac, num_segments=nlist + 1
            )[:nlist]
            return c_acc + seg, None

        c_acc, _ = jax.lax.scan(
            accum,
            jnp.zeros((nlist, nb, bs, bs), jnp.float32),
            (r_p, a_p, codes_p),
        )
        upd = polar_orthogonalize(c_acc)
        new_rot = jnp.einsum(
            "lbef,lbfg->lbeg", upd, rot, preferred_element_type=jnp.float32
        )
        return new_rot, None

    rot, _ = jax.lax.scan(alternate, rot, None, length=alt_iters)
    rot_rows_of = lambda ac: rot[jnp.clip(ac, 0, nlist - 1)]
    y = jax.lax.map(
        lambda inp: rotate_blocks(inp[0], rot_rows_of(inp[1])), (r_p, a_p)
    ).reshape(n_chunks * chunk, d)[:n]
    cb = pq_train(y, m, ksub=ksub, seed=seed, iters=iters)
    return rot, cb


def auto_rotation_block(d: int) -> int:
    """Largest 'nice' rotation block size dividing ``d``.

    Prefers lane-friendly blocks; falls back to a full-dimension rotation
    when no preferred size divides ``d`` (e.g. d=50 GloVe)."""
    for bs in (128, 96, 64, 48, 32, 16, 8):
        if d % bs == 0:
            return bs
    return d


def rotation_gain(
    residuals: jax.Array,
    assignments: jax.Array,
    nlist: int,
    m: int,
    bs: int,
    seed: int = 0,
    iters: int = 12,
    holdout: int = 8,
) -> Tuple[float, float, float, jax.Array, jax.Array]:
    """Held-out reconstruction A/B: per-list rotations vs one shared
    codebook — the measurement behind ``pq_rotations='auto'``.

    Rows with ``i % holdout == 0`` are held out; BOTH codings train on
    the rest. Returns ``(gain, err_plain, err_rot, rots, cb_rot)`` with
    ``gain = 1 - err_rot / err_plain`` on held-out per-row MSE. The
    rotations are orthogonal, so the rotated-frame error
    ``||R_l r - decode(enc(R_l r))||^2`` IS the original-frame error —
    no unrotation needed. The returned ``(rots, cb_rot)`` pair is the
    trained rotated coding; callers that enable rotations reuse it.

    Motivation (docs/roadmap.md #3 / round-4 VERDICT #3): on
    gaussian-mixture surrogates whose lists share one orientation frame,
    rotations are recall-neutral and cost ~16% decode QPS — while on
    per-list-oriented (manifold) structure they cut quantisation error
    many-fold. A build-time held-out MSE A/B separates the two regimes
    without ever running a search.
    """
    n = residuals.shape[0]
    val = (jnp.arange(n) % holdout) == 0
    r_tr, a_tr = residuals[~val], assignments[~val]
    r_va, a_va = residuals[val], assignments[val].astype(jnp.int32)

    cb_plain = pq_train(r_tr, m, seed=seed, iters=iters)
    rots, cb_rot = train_per_list_rotations(
        r_tr, a_tr, nlist, m, bs, seed=seed, iters=iters
    )

    def _mse(rows, cb):
        codes = pq_encode(rows, cb)
        err = rows - pq_reconstruct(codes, cb)
        return jnp.mean(jnp.sum(err * err, axis=-1))

    err_plain = float(_mse(r_va, cb_plain))
    rv = rotate_blocks(r_va, rots[jnp.clip(a_va, 0, nlist - 1)])
    err_rot = float(_mse(rv, cb_rot))
    gain = 1.0 - err_rot / max(err_plain, 1e-30)
    return float(gain), err_plain, err_rot, rots, cb_rot


@jax.jit
def pq_encode_rotated(
    residuals: jax.Array,
    assignments: jax.Array,
    rotations: jax.Array,
    codebooks: jax.Array,
) -> jax.Array:
    """Encode ``PQ(R_{assign[i]} r_i)`` with a bounded rotation-gather
    transient (the naive ``rotations[assignments]`` is O(N nb bs^2) —
    gigabytes at 1M rows)."""
    n, d = residuals.shape
    nlist = rotations.shape[0]
    chunk = min(_ROT_CHUNK, max(n, 1))
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    r_p = jnp.pad(residuals, ((0, pad), (0, 0))).reshape(n_chunks, chunk, d)
    a_p = jnp.pad(assignments.astype(jnp.int32), (0, pad)).reshape(
        n_chunks, chunk
    )

    def step(_, inp):
        rc, ac = inp
        y = rotate_blocks(rc, rotations[jnp.clip(ac, 0, nlist - 1)])
        return None, pq_encode(y, codebooks)

    _, codes = jax.lax.scan(step, None, (r_p, a_p))
    return codes.reshape(n_chunks * chunk, -1)[:n]


def pq_search(
    queries,
    codes,
    codebooks,
    code_sqnorms,
    k,
    chunk=_SCAN_CHUNK,
    metric="l2",
):
    """Chunk-clamped wrapper over the jitted ADC scan."""
    chunk = dops.clamp_chunk(chunk, codes.shape[0])
    return _pq_search_jit(
        queries, codes, codebooks, code_sqnorms, k, chunk, metric
    )


@functools.partial(jax.jit, static_argnames=("k", "chunk", "metric"))
def _pq_search_jit(
    queries: jax.Array,
    codes: jax.Array,
    codebooks: jax.Array,
    code_sqnorms: jax.Array,
    k: int,
    chunk: int = _SCAN_CHUNK,
    metric: str = "l2",
) -> Tuple[jax.Array, jax.Array]:
    """ADC top-k over PQ codes, streamed over chunks.

    ``l2`` scores reconstructions via the norm expansion; ``ip`` (and cosine
    after normalisation) scores ``-q.x_hat``.
    """
    n, m = codes.shape
    b = queries.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    codes_p = jnp.pad(codes, ((0, pad), (0, 0))).reshape(n_chunks, chunk, m)
    sqn_p = jnp.pad(code_sqnorms, (0, pad)).reshape(n_chunks, chunk)
    qn = jnp.sum(queries * queries, axis=-1, dtype=jnp.float32)

    init = (
        jnp.full((b, k), jnp.inf, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def step(carry, inp):
        best_d, best_i = carry
        chunk_idx, cc, csqn = inp
        x_hat = pq_reconstruct(cc, codebooks)  # [chunk, d]
        dots = jax.lax.dot_general(
            queries,
            x_hat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if metric == "l2":
            dist = qn[:, None] + csqn[None, :] - 2.0 * dots
        else:
            dist = -dots
        ids = row_ids + chunk_idx * chunk
        dist = jnp.where(ids < n, dist, jnp.inf)
        cat_d = jnp.concatenate([best_d, dist], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids, (b, chunk))], axis=1
        )
        new_d, sel = dops.top_k_smallest(cat_d, k)
        return (new_d, jnp.take_along_axis(cat_i, sel, axis=1)), None

    (best_d, best_i), _ = jax.lax.scan(
        step, init, (jnp.arange(n_chunks, dtype=jnp.int32), codes_p, sqn_p)
    )
    return best_d, best_i
