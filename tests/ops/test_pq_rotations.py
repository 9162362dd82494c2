"""Per-list block-diagonal residual rotations (ops/pq, IVF-PQ lever).

Beyond the reference's FAISS grammar (its OPQ is one global rotation,
reference src/algorithms/modular.py:224-289); the oracle pattern follows
SURVEY.md section 4: NumPy/SVD oracles + end-to-end recall comparison.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vectordb_retrieval_tpu.ops import pq as pqops


def _rand_orth(rng, d):
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    return q.astype(np.float32)


def test_polar_matches_svd_oracle(rng):
    c = rng.standard_normal((12, 6, 6)).astype(np.float32)
    got = np.asarray(pqops.polar_orthogonalize(jnp.asarray(c)))
    for i in range(c.shape[0]):
        u, _, vt = np.linalg.svd(c[i])
        np.testing.assert_allclose(got[i], u @ vt, rtol=1e-3, atol=1e-3)
    # orthogonality
    eye = np.eye(6, dtype=np.float32)
    for g in got:
        np.testing.assert_allclose(g @ g.T, eye, atol=1e-4)


def test_polar_degenerate_falls_back_to_identity():
    c = jnp.zeros((3, 4, 4), jnp.float32)
    got = np.asarray(pqops.polar_orthogonalize(c))
    for g in got:
        np.testing.assert_array_equal(g, np.eye(4, dtype=np.float32))


def test_rotate_unrotate_roundtrip(rng):
    x = rng.standard_normal((64, 16)).astype(np.float32)
    rot = np.stack(
        [np.stack([_rand_orth(rng, 4) for _ in range(4)]) for _ in range(64)]
    )  # per-row [nb=4, bs=4]
    y = pqops.rotate_blocks(jnp.asarray(x), jnp.asarray(rot))
    back = np.asarray(pqops.unrotate_blocks(y, jnp.asarray(rot)))
    np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-5)
    # orthogonality preserves norms
    np.testing.assert_allclose(
        np.sum(np.asarray(y) ** 2, -1), np.sum(x * x, -1), rtol=1e-4
    )


def _anisotropic_per_list(rng, nlist, per, d):
    """Residuals drawn from a strongly anisotropic gaussian with a
    DIFFERENT random orientation per list — the regime where a shared
    residual codebook is misaligned and per-list rotations must win."""
    scales = np.concatenate(
        [np.full(2, 3.0), np.full(d - 2, 0.05)]
    ).astype(np.float32)
    res, assign = [], []
    for l in range(nlist):
        q = _rand_orth(rng, d)
        z = rng.standard_normal((per, d)).astype(np.float32) * scales
        res.append(z @ q.T)
        assign.append(np.full(per, l, np.int32))
    return np.concatenate(res), np.concatenate(assign)


def test_per_list_rotations_cut_reconstruction_error(rng):
    d, m, bs, nlist = 16, 8, 16, 6
    res, assign = _anisotropic_per_list(rng, nlist, 400, d)
    rj, aj = jnp.asarray(res), jnp.asarray(assign)

    rots, cb_rot = pqops.train_per_list_rotations(
        rj, aj, nlist, m, bs, seed=0
    )
    # all rotations learned (non-identity) and orthogonal
    r = np.asarray(rots)
    eye = np.eye(bs, dtype=np.float32)
    for l in range(nlist):
        np.testing.assert_allclose(r[l, 0] @ r[l, 0].T, eye, atol=1e-3)
    assert np.abs(r - eye).max() > 0.1

    codes_rot = pqops.pq_encode_rotated(rj, aj, rots, cb_rot)
    y_hat = pqops.pq_reconstruct(codes_rot, cb_rot)
    r_hat = pqops.unrotate_blocks(y_hat, rots[aj])
    err_rot = float(jnp.mean(jnp.sum((rj - r_hat) ** 2, -1)))

    cb = pqops.pq_train(rj, m, seed=0)
    r_hat0 = pqops.pq_reconstruct(pqops.pq_encode(rj, cb), cb)
    err_plain = float(jnp.mean(jnp.sum((rj - r_hat0) ** 2, -1)))
    assert err_rot < 0.7 * err_plain, (err_rot, err_plain)


def test_encode_rotated_matches_unchunked(rng):
    d, m, bs, nlist = 8, 4, 4, 3
    res, assign = _anisotropic_per_list(rng, nlist, 120, d)
    rj, aj = jnp.asarray(res), jnp.asarray(assign)
    rots, cb = pqops.train_per_list_rotations(rj, aj, nlist, m, bs, seed=1)
    got = np.asarray(pqops.pq_encode_rotated(rj, aj, rots, cb))
    want = np.asarray(
        pqops.pq_encode(pqops.rotate_blocks(rj, rots[aj]), cb)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("stream", [False, True])
def test_factory_ivfpq_rotations_end_to_end(rng, stream, tmp_path):
    from vectordb_retrieval_tpu.models.factory import (
        ANNSearcher, FactoryIndexer,
    )

    d, nlist = 16, 6
    res, assign = _anisotropic_per_list(rng, nlist, 300, d)
    centers = rng.standard_normal((nlist, d)).astype(np.float32) * 10
    x = (res + centers[assign]).astype(np.float32)
    q = x[rng.choice(len(x), 32, replace=False)] + 0.01 * rng.standard_normal(
        (32, d)
    ).astype(np.float32)

    # ground truth
    gt_d = ((q[:, None] - x[None]) ** 2).sum(-1)
    gt = np.argsort(gt_d, 1)[:, :10]

    def recall(ids):
        hits = sum(
            len(set(ids[i].tolist()) & set(gt[i].tolist())) for i in range(len(q))
        )
        return hits / gt.size

    corpus = x
    if stream:
        from vectordb_retrieval_tpu.data.storage import BigStore

        with BigStore.create(str(tmp_path / "c.big"), d) as w:
            w.append(x)
        corpus = BigStore.open(str(tmp_path / "c.big"))

    common = dict(
        metric="l2", index_key=f"IVF{nlist},PQ8", nprobe=nlist,
        train_iters=8,
    )
    plain = FactoryIndexer(**common).build(corpus, d)
    rot = FactoryIndexer(pq_rotations=16, **common).build(corpus, d)
    assert "list_rotations" in rot.data
    assert rot.metadata["pq_rot_bs"] == 16

    out = {}
    for name, art in (("plain", plain), ("rot", rot)):
        s = ANNSearcher(metric="l2")
        s.attach(art)
        _, ids = s.batch_search(q, 10)
        out[name] = recall(np.asarray(ids))
    # full probe, coding error is the only loss: rotations must win
    assert out["rot"] > out["plain"] + 0.02, out


def test_rotated_artifact_persistence_roundtrip(rng, tmp_path):
    from vectordb_retrieval_tpu.models.factory import (
        ANNSearcher, FactoryIndexer,
    )
    from vectordb_retrieval_tpu.models.persist import (
        load_artifact, save_artifact,
    )

    d, nlist = 8, 4
    res, assign = _anisotropic_per_list(rng, nlist, 100, d)
    centers = rng.standard_normal((nlist, d)).astype(np.float32) * 8
    x = (res + centers[assign]).astype(np.float32)
    art = FactoryIndexer(
        metric="l2", index_key=f"IVF{nlist},PQ4", pq_rotations=8,
        nprobe=nlist, train_iters=6,
    ).build(x, d)
    save_artifact(art, tmp_path / "idx")
    back = load_artifact(tmp_path / "idx")
    q = x[:9]
    s1, s2 = ANNSearcher(metric="l2"), ANNSearcher(metric="l2")
    s1.attach(art)
    s2.attach(back)
    d1, i1 = s1.batch_search(q, 5)
    d2, i2 = s2.batch_search(q, 5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_rotated_search_regimes_agree(rng):
    """The resident decode-on-read regime and the streaming masked scan
    must agree for a rotated artifact (same kernel contract as the plain
    IVF-PQ cross-path test). Moderate norms + generic queries: the
    streaming scan scores in bf16 without a rescore pass, so the check
    targets the rotation map, not cancellation noise."""
    from vectordb_retrieval_tpu.models.factory import FactoryIndexer
    from vectordb_retrieval_tpu.ops import ivf as ivfops

    d, nlist = 16, 5
    res, assign = _anisotropic_per_list(rng, nlist, 200, d)
    centers = rng.standard_normal((nlist, d)).astype(np.float32)
    x = (res + centers[assign]).astype(np.float32)
    art = FactoryIndexer(
        metric="l2", index_key=f"IVF{nlist},PQ8", pq_rotations=8,
        nprobe=nlist, train_iters=6,
    ).build(x, d)
    q = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32) * 2)
    dd = art.data
    kw = dict(
        list_rotations=dd["list_rotations"],
        rot_bucket_lists=dd["bucket_lists"],
    )
    args = (
        q, dd["centroids"], dd["slot_ids"], dd["list_codes"],
        dd["list_sqnorms"], dd["codebooks"], 7, nlist,
    )
    d1, i1 = ivfops.ivf_pq_search(*args, **kw)
    d2, i2 = ivfops.ivf_pq_search(*args, resident_budget=1, **kw)
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), rtol=5e-2, atol=5e-2
    )
    # top-1 agrees up to bf16 near-ties
    assert (np.asarray(i1)[:, 0] == np.asarray(i2)[:, 0]).mean() >= 0.75


def test_auto_rotation_block_prefers_lane_friendly_divisors():
    assert pqops.auto_rotation_block(384) == 128
    assert pqops.auto_rotation_block(128) == 128
    assert pqops.auto_rotation_block(64) == 64
    assert pqops.auto_rotation_block(96) == 96
    # GloVe-50: no preferred size divides 50 -> full-dim rotation
    assert pqops.auto_rotation_block(50) == 50
    assert pqops.auto_rotation_block(16) == 16


def test_rotation_gain_separates_orientation_regimes(rng):
    """The pq_rotations='auto' measurement: held-out MSE gain must be
    large on per-list-ORIENTED residuals and ~zero on a shared-frame
    isotropic gaussian (where rotations are provably recall-neutral —
    docs/roadmap.md #3)."""
    d, m, nlist = 16, 8, 6
    res, assign = _anisotropic_per_list(rng, nlist, 400, d)
    gain, err_p, err_r, rots, cb = pqops.rotation_gain(
        jnp.asarray(res), jnp.asarray(assign), nlist, m, bs=16, seed=0
    )
    assert gain > 0.3, (gain, err_p, err_r)
    assert err_r < err_p
    assert rots.shape == (nlist, 1, 16, 16)

    iso = rng.standard_normal((nlist * 400, d)).astype(np.float32)
    a_iso = rng.integers(0, nlist, iso.shape[0]).astype(np.int32)
    gain_iso, *_ = pqops.rotation_gain(
        jnp.asarray(iso), jnp.asarray(a_iso), nlist, m, bs=16, seed=0
    )
    assert gain_iso < 0.05, gain_iso


@pytest.mark.parametrize("stream", [False, True])
def test_factory_auto_decision_paths(rng, stream, tmp_path, monkeypatch):
    """pq_rotations='auto' end-to-end: the ON path (per-list-oriented
    residuals -> rotations trained + gain recorded) and the OFF path
    (threshold not met -> plain codebook, decision still recorded) on
    both build paths (in-memory + streaming).

    The OFF path is exercised by raising the threshold rather than by
    constructing a zero-gain corpus: ANY corpus the coarse quantiser
    clusters imperfectly carries genuine per-list anisotropy (Voronoi
    truncation, merged modes), so held-out gain > 0 is the NORM — the
    committed regime A/B lives in
    benchmark_results/round5_rotations_ab/rotations_ab.json, and the
    true zero-gain control (structure-free random assignments) is
    test_rotation_gain_separates_orientation_regimes above."""
    from vectordb_retrieval_tpu.models.factory import FactoryIndexer

    d, nlist, per = 16, 6, 400
    res, assign = _anisotropic_per_list(rng, nlist, per, d)
    centers = rng.standard_normal((nlist, d)).astype(np.float32) * 10
    oriented = (res + centers[assign]).astype(np.float32)

    def build(x):
        corpus = x
        if stream:
            from vectordb_retrieval_tpu.data.storage import BigStore

            path = str(tmp_path / f"c{id(x)}{rng.integers(1 << 30)}.big")
            with BigStore.create(path, d) as w:
                w.append(x)
            corpus = BigStore.open(path)
        return FactoryIndexer(
            metric="l2", index_key=f"IVF{nlist},PQ8",
            pq_rotations="auto", nprobe=nlist, train_iters=6,
        ).build(corpus, d)

    art_on = build(oriented)
    auto = art_on.metadata["pq_rot_auto"]
    assert auto["enabled"] is True and auto["gain"] >= 0.05, auto
    assert "list_rotations" in art_on.data
    assert art_on.metadata["pq_rot_bs"] == auto["bs"]

    monkeypatch.setattr(FactoryIndexer, "PQ_ROT_AUTO_GAIN", 2.0)
    art_off = build(oriented)
    auto_off = art_off.metadata["pq_rot_auto"]
    assert auto_off["enabled"] is False, auto_off
    assert auto_off["threshold"] == 2.0
    assert "list_rotations" not in art_off.data
    assert "pq_rot_bs" not in art_off.metadata
