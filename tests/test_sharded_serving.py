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
