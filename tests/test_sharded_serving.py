"""Replicated sharded mutable serving on the virtual 8-device CPU mesh.

Oracle pattern: every check compares against NumPy brute force over the
CURRENT live set (SURVEY.md section 4 — oracle + interleaving fuzz), and
against the single-device MutableFlatIndex where the contract must agree.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vectordb_retrieval_tpu.parallel.mesh import make_mesh
from vectordb_retrieval_tpu.parallel.serving import ShardedMutableFlat
from vectordb_retrieval_tpu.serving import MutableFlatIndex


def _oracle(q, live_vecs, live_ids, k, metric="l2"):
    if metric == "l2":
        d = ((q[:, None, :] - live_vecs[None, :, :]) ** 2).sum(-1)
    else:
        v = live_vecs
        if metric == "cosine":
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        d = -(q @ v.T)
    order = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, order, 1), live_ids[order]


def _check(idx, q, live_vecs, live_ids, k, metric="l2"):
    d, i = idx.search(q, k)
    od, _ = _oracle(q, live_vecs, live_ids, min(k, len(live_ids)), metric)
    kk = od.shape[1]
    np.testing.assert_allclose(d[:, :kk], od, rtol=1e-4, atol=1e-4)
    # returned ids must be live and carry the returned distances
    pos = {int(s): j for j, s in enumerate(live_ids)}
    for b in range(q.shape[0]):
        for c in range(kk):
            if i[b, c] < 0:
                continue
            assert int(i[b, c]) in pos
            j = pos[int(i[b, c])]
            if metric == "l2":
                ref = ((q[b] - live_vecs[j]) ** 2).sum()
            else:
                vv = live_vecs[j]
                qq = q[b]
                if metric == "cosine":
                    vv = vv / max(np.linalg.norm(vv), 1e-12)
                    qq = qq / max(np.linalg.norm(qq), 1e-12)
                ref = -(qq @ vv)
            np.testing.assert_allclose(d[b, c], ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_sharded_mutable_oracle(rng, metric):
    mesh = make_mesh(8)
    idx = ShardedMutableFlat(16, mesh, metric=metric, capacity_per_shard=32)
    x = rng.standard_normal((150, 16)).astype(np.float32)
    ids = idx.add(x)
    q = rng.standard_normal((9, 16)).astype(np.float32)
    _check(idx, q, x, ids, 7, metric)


def test_sharded_mutable_balance_and_growth(rng):
    mesh = make_mesh(8)
    idx = ShardedMutableFlat(8, mesh, capacity_per_shard=16)
    x = rng.standard_normal((500, 8)).astype(np.float32)  # forces growth
    ids = idx.add(x)
    fill = idx.shard_fill()
    assert fill.sum() == 500
    assert fill.max() - fill.min() <= 1  # water-filling balance
    assert idx.capacity >= 500
    q = rng.standard_normal((5, 8)).astype(np.float32)
    _check(idx, q, x, ids, 10)


def test_sharded_mutable_delete_filter_compact(rng):
    mesh = make_mesh(8)
    idx = ShardedMutableFlat(12, mesh, capacity_per_shard=64)
    x = rng.standard_normal((200, 12)).astype(np.float32)
    ids = idx.add(x)
    dead = ids[::3]
    assert idx.delete(dead) == len(dead)
    live_mask = np.ones(len(ids), bool)
    live_mask[::3] = False
    q = rng.standard_normal((6, 12)).astype(np.float32)
    _check(idx, q, x[live_mask], ids[live_mask], 9)
    # filter pushdown: only the allow-list is reachable
    allow = ids[live_mask][:17]
    d, i = idx.search(q, 5, filter_ids=allow)
    assert set(i[i >= 0].tolist()) <= set(allow.tolist())
    od, _ = _oracle(q, x[live_mask][:17], allow, 5)
    np.testing.assert_allclose(np.where(np.isfinite(d), d, 0)[:, :5],
                               np.where(np.isfinite(d), od, 0)[:, :5],
                               rtol=1e-4, atol=1e-4)
    # explicit compact: same results, tombstones gone
    idx.compact()
    assert idx.n_active == live_mask.sum()
    _check(idx, q, x[live_mask], ids[live_mask], 9)


def test_replica_mesh_matches_flat_ring(rng):
    """A (replica, db) mesh must return the same results as a 1-D db mesh
    (state replicates over axes the specs don't mention), with the query
    batch sharded over the replica axis."""
    x = rng.standard_normal((120, 10)).astype(np.float32)
    q = rng.standard_normal((8, 10)).astype(np.float32)
    flat = ShardedMutableFlat(10, make_mesh(4), capacity_per_shard=64)
    ids_a = flat.add(x)
    d_a, i_a = flat.search(q, 6)
    mesh2 = make_mesh(8, axis_names=("replica", "db"), shape=(2, 4))
    rep = ShardedMutableFlat(
        10, mesh2, capacity_per_shard=64, q_axis="replica"
    )
    ids_b = rep.add(x)
    d_b, i_b = rep.search(q, 6)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.sort(i_a, 1), np.sort(i_b, 1))


def test_sharded_matches_single_device_mutable_fuzz(rng):
    """Interleaved add/delete/search/compact fuzz: the sharded index and
    the single-device MutableFlatIndex must agree (distances exactly,
    ids up to ties) after every operation."""
    mesh = make_mesh(8)
    a = ShardedMutableFlat(8, mesh, capacity_per_shard=16)
    b = MutableFlatIndex(8, capacity=16)
    live = {}
    for step in range(30):
        op = rng.integers(0, 4)
        if op <= 1 or not live:  # add (weighted)
            m = int(rng.integers(1, 40))
            x = rng.standard_normal((m, 8)).astype(np.float32)
            ia = a.add(x)
            ib = b.add(x)
            np.testing.assert_array_equal(ia, ib)
            live.update({int(s): x[j] for j, s in enumerate(ia)})
        elif op == 2:
            kill = rng.choice(list(live), size=min(len(live), 7), replace=False)
            assert a.delete(kill) == b.delete(kill)
            for s in kill:
                live.pop(int(s))
        else:
            a.compact()
        if live:
            q = rng.standard_normal((4, 8)).astype(np.float32)
            k = int(min(6, len(live)))
            da, _ = a.search(q, k)
            db_, _ = b.search(q, k)
            np.testing.assert_allclose(da, db_, rtol=1e-4, atol=1e-4)


def test_snapshot_artifact_roundtrip(rng):
    from vectordb_retrieval_tpu.models.factory import ANNSearcher

    mesh = make_mesh(8)
    idx = ShardedMutableFlat(12, mesh, capacity_per_shard=32)
    x = rng.standard_normal((90, 12)).astype(np.float32)
    ids = idx.add(x)
    idx.delete(ids[:10])
    art = idx.to_artifact()
    assert art.metadata["n_vectors"] == 80
    s = ANNSearcher(metric="l2")
    s.attach(art)
    q = rng.standard_normal((5, 12)).astype(np.float32)
    d, i = s.batch_search(q, 4)
    od, oi = _oracle(q, x[10:], ids[10:], 4)
    np.testing.assert_allclose(d, od, rtol=1e-4, atol=1e-4)


# -- sharded mutable IVF ---------------------------------------------------

from vectordb_retrieval_tpu.parallel.serving import ShardedMutableIVF  # noqa: E402


def _ivf_live(idx):
    sl = idx._slot_host.reshape(-1)
    live = np.nonzero(sl >= 0)[0]
    vecs = np.asarray(idx._list_vecs).reshape(-1, idx.dimension)[live]
    return vecs, sl[live]


def _ivf_check_allprobe(idx, q, k):
    """All-probe sharded IVF == exact over the live set."""
    vecs, ids = _ivf_live(idx)
    d, i = idx.search(q, k, nprobe=idx.n_buckets)
    od, _ = _oracle(q, vecs, ids, min(k, len(ids)), idx.metric)
    kk = od.shape[1]
    np.testing.assert_allclose(d[:, :kk], od, rtol=1e-4, atol=1e-4)
    pos = {int(s): j for j, s in enumerate(ids)}
    for b in range(q.shape[0]):
        for c in range(kk):
            if i[b, c] >= 0:
                assert int(i[b, c]) in pos


def test_sharded_ivf_allprobe_exact(rng):
    mesh = make_mesh(8)
    x = rng.standard_normal((600, 12)).astype(np.float32)
    q = rng.standard_normal((9, 12)).astype(np.float32)
    idx = ShardedMutableIVF(x, mesh, nlist=16, nprobe=16, seed=3)
    _ivf_check_allprobe(idx, q, 10)


def test_sharded_ivf_partial_probe_recall_floor(rng):
    mesh = make_mesh(8)
    x = rng.standard_normal((800, 10)).astype(np.float32)
    q = rng.standard_normal((16, 10)).astype(np.float32)
    idx = ShardedMutableIVF(x, mesh, nlist=8, seed=3)
    vecs, ids = _ivf_live(idx)
    _, oi = _oracle(q, vecs, ids, 10)
    # half the buckets per shard probed
    _, i = idx.search(q, 10, nprobe=max(1, idx.n_buckets // (2 * 8)))
    hits = sum(
        len(set(i[b].tolist()) & set(oi[b].tolist())) for b in range(len(q))
    )
    assert hits / (len(q) * 10.0) >= 0.5


def test_sharded_ivf_mutation_fuzz(rng):
    """Interleaved add/delete/search vs the live-set oracle (all-probe)."""
    mesh = make_mesh(8)
    x = rng.standard_normal((300, 8)).astype(np.float32)
    idx = ShardedMutableIVF(x, mesh, nlist=8, bucket_len=16, seed=5)
    q = rng.standard_normal((6, 8)).astype(np.float32)
    all_ids = list(range(300))
    for step in range(6):
        xa = rng.standard_normal((37, 8)).astype(np.float32)
        new = idx.add(xa)
        all_ids.extend(int(v) for v in new)
        kill = rng.choice(len(all_ids), size=13, replace=False)
        dead = [all_ids[j] for j in sorted(kill, reverse=True)]
        for j in sorted(kill, reverse=True):
            all_ids.pop(j)
        assert idx.delete(dead) == len(dead)
        _ivf_check_allprobe(idx, q, 7)
    assert idx.n_active == len(all_ids)


def _ivf_structural_check(idx, vec_of=None):
    """Growth-safe invariants (round-4 advisor): device/host agreement, no
    live slot in a dead bucket, _id_loc points at the id's own vector,
    free-slot entries reference dead slots of the right list, and no live
    slot beyond a bucket's fill high-water mark."""
    sl = idx._slot_host
    bl = idx._bucket_lists
    dev_sl = np.asarray(idx._slot_ids)
    dev_v = np.asarray(idx._list_vecs)
    np.testing.assert_array_equal(dev_sl.astype(np.int64), sl)
    live_bucket = (sl >= 0).any(axis=1)
    assert not (live_bucket & (bl < 0)).any(), "live slot in dead bucket"
    assert len(idx._id_loc) == int((sl >= 0).sum())
    for rid, (g, s) in idx._id_loc.items():
        assert int(sl[g, s]) == rid
        if vec_of is not None and rid in vec_of:
            np.testing.assert_allclose(
                dev_v[g, s], vec_of[rid], rtol=1e-5, atol=1e-6
            )
    for l, stack in idx._list_free.items():
        for g, s in stack:
            assert int(bl[g]) == l, "free entry in foreign/dead bucket"
            assert int(sl[g, s]) < 0, "free entry on a live slot"
    for g in range(sl.shape[0]):
        assert (sl[g, int(idx._fill[g]):] < 0).all()


def _ivf_selfquery_recall(idx, vec_of, ids, nprobe=2, thresh=0.95):
    """A row's own vector at small nprobe must find its id: its bucket is
    in the nearest list, so it ranks first on its shard. Misplaced rows
    (the round-4 grow bug) fail this at any realistic nprobe."""
    sample = list(ids)[:64]
    q = np.stack([vec_of[int(i)] for i in sample])
    _, got = idx.search(q, 1, nprobe=nprobe)
    hits = sum(1 for j, i0 in enumerate(sample) if int(i0) in got[j])
    assert hits / len(sample) >= thresh, f"self-recall {hits}/{len(sample)}"


def test_sharded_ivf_growth_local(rng):
    mesh = make_mesh(8)
    x = rng.standard_normal((64, 8)).astype(np.float32)
    idx = ShardedMutableIVF(x, mesh, nlist=4, bucket_len=8, seed=7)
    nb0 = idx.n_buckets
    xa = rng.standard_normal((2000, 8)).astype(np.float32)
    new_ids = idx.add(xa)
    assert idx.n_buckets > nb0  # grew (multiple times mid-batch demand)
    assert idx.n_buckets % 8 == 0  # uniform per-shard segments
    vec_of = {int(i): x[j] for j, i in enumerate(range(64))}
    vec_of.update({int(i): xa[j] for j, i in enumerate(new_ids)})
    _ivf_structural_check(idx, vec_of)
    _ivf_selfquery_recall(idx, vec_of, new_ids, nprobe=2)
    q = rng.standard_normal((5, 8)).astype(np.float32)
    _ivf_check_allprobe(idx, q, 9)


def test_sharded_ivf_free_slots_survive_growth(rng):
    """Deleted-slot reuse across a growth: _list_free entries recorded
    before _grow must be remapped to the new bucket numbering (round-4
    advisor, serving.py:594) or reused slots land in dead buckets."""
    mesh = make_mesh(8)
    x = rng.standard_normal((128, 8)).astype(np.float32)
    idx = ShardedMutableIVF(
        x, mesh, nlist=4, bucket_len=8, seed=7, compact_frac=10.0
    )  # compact_frac high: keep tombstones in _list_free across the grow
    ids0 = np.arange(128)
    idx.delete(ids0[::4])  # 32 free slots recorded pre-grow
    assert any(idx._list_free.values())
    xa = rng.standard_normal((1500, 8)).astype(np.float32)
    new_ids = idx.add(xa)  # forces >=1 growth, then reuses free slots
    vec_of = {int(i): x[i] for i in ids0 if i % 4}
    vec_of.update({int(i): xa[j] for j, i in enumerate(new_ids)})
    _ivf_structural_check(idx, vec_of)
    _ivf_selfquery_recall(idx, vec_of, new_ids, nprobe=2)
    q = rng.standard_normal((5, 8)).astype(np.float32)
    _ivf_check_allprobe(idx, q, 9)


def test_sharded_ivf_filter_ids(rng):
    mesh = make_mesh(8)
    x = rng.standard_normal((256, 8)).astype(np.float32)
    idx = ShardedMutableIVF(x, mesh, nlist=8, seed=9)
    q = rng.standard_normal((4, 8)).astype(np.float32)
    allow = np.arange(0, 256, 3, dtype=np.int64)
    d, i = idx.search(q, 8, nprobe=idx.n_buckets, filter_ids=allow)
    ok = set(int(v) for v in allow)
    assert all(int(v) in ok for v in i.ravel() if v >= 0)
    vecs = x[allow]
    od, _ = _oracle(q, vecs, allow, 8)
    np.testing.assert_allclose(d, od, rtol=1e-4, atol=1e-4)


def test_sharded_ivf_compact_preserves_results(rng):
    mesh = make_mesh(8)
    x = rng.standard_normal((400, 8)).astype(np.float32)
    idx = ShardedMutableIVF(x, mesh, nlist=8, bucket_len=16, seed=11)
    idx.delete(np.arange(0, 400, 2))
    q = rng.standard_normal((5, 8)).astype(np.float32)
    d0, i0 = idx.search(q, 6, nprobe=idx.n_buckets)
    idx.compact()
    d1, i1 = idx.search(q, 6, nprobe=idx.n_buckets)
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-5)
    assert (i0 == i1).all()
    _ivf_check_allprobe(idx, q, 6)


def test_sharded_ivf_replica_mesh_matches_ring(rng):
    x = rng.standard_normal((256, 10)).astype(np.float32)
    q = rng.standard_normal((8, 10)).astype(np.float32)
    a = ShardedMutableIVF(x, make_mesh(4), nlist=8, seed=13)
    mesh2 = make_mesh(8, axis_names=("replica", "db"), shape=(2, 4))
    b = ShardedMutableIVF(
        x, mesh2, nlist=8, seed=13, q_axis="replica"
    )
    da, ia = a.search(q, 9, nprobe=a.n_buckets)
    db_, ib = b.search(q, 9, nprobe=b.n_buckets)
    np.testing.assert_allclose(da, db_, rtol=1e-5, atol=1e-5)
    assert (ia == ib).all()


def test_sharded_ivf_snapshot_servable(rng):
    from vectordb_retrieval_tpu.models.factory import ANNSearcher

    mesh = make_mesh(8)
    x = rng.standard_normal((200, 8)).astype(np.float32)
    idx = ShardedMutableIVF(x, mesh, nlist=8, seed=17)
    idx.delete(np.arange(50))
    art = idx.to_artifact()
    s = ANNSearcher(dimension=8, metric="l2")
    s.artifact = art
    s.is_built = True
    d, i = s.batch_search(rng.standard_normal((4, 8)).astype(np.float32), 5)
    assert (np.asarray(i) >= 50).all()
