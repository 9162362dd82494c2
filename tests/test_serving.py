"""Mutable serving index: add / delete / filter / compaction vs oracle."""

import numpy as np
import pytest

from vectordb_retrieval_tpu.serving import MutableFlatIndex


def _oracle(q, x, k, metric="l2"):
    if metric == "l2":
        d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    else:
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        d = -(qn @ xn.T)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


def test_add_search_matches_oracle(rng):
    x = rng.standard_normal((500, 16)).astype(np.float32)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    idx = MutableFlatIndex(16)
    ids = idx.add(x)
    np.testing.assert_array_equal(ids, np.arange(500))
    d, got = idx.search(q, 5)
    exp = _oracle(q, x, 5)
    # compare by distance (ties may reorder)
    gd = ((q[:, None, :] - x[got][..., :]) ** 2).sum(-1)
    ed = ((q[:, None, :] - x[exp][..., :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.sort(gd, 1), np.sort(ed, 1), rtol=1e-4)


def test_incremental_adds_grow_capacity(rng):
    idx = MutableFlatIndex(8, capacity=16)
    all_rows = []
    for _ in range(10):
        batch = rng.standard_normal((37, 8)).astype(np.float32)
        idx.add(batch)
        all_rows.append(batch)
    x = np.concatenate(all_rows)
    assert idx.n_active == 370
    assert idx.capacity >= 370
    q = x[:4]
    _, ids = idx.search(q, 1)
    np.testing.assert_array_equal(ids[:, 0], np.arange(4))


def test_delete_removes_from_results(rng):
    x = rng.standard_normal((200, 12)).astype(np.float32)
    idx = MutableFlatIndex(12)
    ids = idx.add(x)
    q = x[:5]
    _, before = idx.search(q, 1)
    np.testing.assert_array_equal(before[:, 0], np.arange(5))
    assert idx.delete(ids[:5]) == 5
    _, after = idx.search(q, 3)
    assert not np.isin(after, np.arange(5)).any()
    # remaining rows still searchable with correct oracle answers
    exp = _oracle(q, x, 8)[:, :8]
    exp_live = np.array(
        [[j for j in row if j >= 5][:3] for j, row in zip(range(5), exp)]
    )
    np.testing.assert_array_equal(after, exp_live)


def test_delete_twice_and_unknown_ids(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    idx = MutableFlatIndex(8)
    ids = idx.add(x)
    assert idx.delete(ids[:3]) == 3
    assert idx.delete(ids[:3]) == 0  # already gone
    assert idx.delete([10_000]) == 0  # never existed
    assert idx.n_active == 47


def test_compaction_preserves_ids(rng):
    x = rng.standard_normal((300, 10)).astype(np.float32)
    idx = MutableFlatIndex(10, compact_frac=0.1)
    ids = idx.add(x)
    idx.delete(ids[:150])  # exceeds compact_frac -> auto-compact
    assert idx._n_dead == 0  # compacted
    assert idx.n_active == 150
    q = x[150:155]
    _, got = idx.search(q, 1)
    np.testing.assert_array_equal(got[:, 0], ids[150:155])


def test_filter_ids(rng):
    x = rng.standard_normal((100, 8)).astype(np.float32)
    idx = MutableFlatIndex(8)
    ids = idx.add(x)
    q = x[:3]
    allow = ids[50:]
    _, got = idx.search(q, 4, filter_ids=allow)
    assert (got >= 50).all()
    exp = _oracle(q, x[50:], 4)
    np.testing.assert_array_equal(got, exp + 50)


def test_cosine_metric(rng):
    x = rng.standard_normal((200, 16)).astype(np.float32)
    q = rng.standard_normal((6, 16)).astype(np.float32)
    idx = MutableFlatIndex(16, metric="cosine")
    idx.add(x)
    _, got = idx.search(q, 5)
    exp = _oracle(q, x, 5, metric="cosine")
    assert (got == exp).mean() > 0.9  # ties aside


def test_ip_delete_cannot_resurface(rng):
    """Zeroed dead rows must not outrank live negatives under ip."""
    x = -np.abs(rng.standard_normal((50, 8))).astype(np.float32)
    idx = MutableFlatIndex(8, metric="ip")
    ids = idx.add(x)
    idx.delete(ids[:10])
    q = np.abs(rng.standard_normal((4, 8))).astype(np.float32)
    _, got = idx.search(q, 5)
    assert not np.isin(got, ids[:10]).any()
    assert (got >= 10).all()


def test_large_streamed_path(rng):
    """Capacity above the dense-path cutoff exercises the scan kernel."""
    x = rng.standard_normal((2000, 8)).astype(np.float32)
    idx = MutableFlatIndex(8, capacity=1024)
    idx.add(x)
    q = x[:4]
    d, ids = idx.search(q, 2)
    np.testing.assert_array_equal(ids[:, 0], np.arange(4))
    assert np.allclose(d[:, 0], 0.0, atol=1e-4)


def test_empty_index_and_empty_add():
    idx = MutableFlatIndex(4)
    d, ids = idx.search(np.zeros((2, 4), np.float32), 3)
    assert (ids == -1).all() and np.isinf(d).all()
    assert idx.add(np.zeros((0, 4), np.float32)).shape == (0,)
    with pytest.raises(ValueError):
        idx.add(np.zeros((3, 5), np.float32))


class TestMutableIVF:
    def _oracle_l2(self, q, x, k):
        d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        return np.argsort(d, axis=1, kind="stable")[:, :k]

    def test_build_and_search(self, rng):
        from vectordb_retrieval_tpu.serving import MutableIVFIndex

        x = rng.standard_normal((1000, 16)).astype(np.float32)
        q = rng.standard_normal((8, 16)).astype(np.float32)
        idx = MutableIVFIndex(x, nlist=8, nprobe=8)
        assert idx.n_active == 1000
        _, ids = idx.search(q, 10)  # all-probe == exact
        from vectordb_retrieval_tpu.bench.metrics import recall_at_k

        gt = self._oracle_l2(q, x, 10)
        assert recall_at_k(gt, ids, 10) == 1.0

    def test_add_then_find(self, rng):
        from vectordb_retrieval_tpu.serving import MutableIVFIndex

        x = rng.standard_normal((500, 12)).astype(np.float32)
        idx = MutableIVFIndex(x, nlist=4, nprobe=4)
        extra = rng.standard_normal((63, 12)).astype(np.float32)
        new_ids = idx.add(extra)
        assert idx.n_active == 563
        # each added row is its own nearest neighbour at full probe
        _, got = idx.search(extra[:10], 1)
        np.testing.assert_array_equal(got[:, 0], new_ids[:10])

    def test_add_overflows_into_new_buckets(self, rng):
        from vectordb_retrieval_tpu.serving import MutableIVFIndex

        x = rng.standard_normal((64, 8)).astype(np.float32)
        idx = MutableIVFIndex(x, nlist=2, nprobe=2, bucket_len=8)
        nb0 = int(idx._slot_ids.shape[0])
        extra = rng.standard_normal((200, 8)).astype(np.float32)
        idx.add(extra)
        assert int(idx._slot_ids.shape[0]) > nb0  # grew buckets
        assert idx.n_active == 264
        _, got = idx.search(extra[:5], 1)
        assert (np.asarray(got[:, 0]) >= 64).all()

    def test_delete(self, rng):
        from vectordb_retrieval_tpu.serving import MutableIVFIndex

        x = rng.standard_normal((300, 8)).astype(np.float32)
        idx = MutableIVFIndex(x, nlist=4, nprobe=4)
        q = x[:5]
        _, before = idx.search(q, 1)
        np.testing.assert_array_equal(before[:, 0], np.arange(5))
        assert idx.delete(np.arange(5)) == 5
        assert idx.delete(np.arange(5)) == 0
        _, after = idx.search(q, 5)
        assert not np.isin(after, np.arange(5)).any()

    def test_partial_probe_recall(self, rng):
        from vectordb_retrieval_tpu.bench.metrics import recall_at_k
        from vectordb_retrieval_tpu.serving import MutableIVFIndex

        x = rng.standard_normal((2000, 16)).astype(np.float32)
        q = rng.standard_normal((16, 16)).astype(np.float32)
        idx = MutableIVFIndex(x, nlist=16, nprobe=4)
        gt = self._oracle_l2(q, x, 10)
        _, ids4 = idx.search(q, 10)
        _, ids16 = idx.search(q, 10, nprobe=16)
        r4 = recall_at_k(gt, ids4, 10)
        r16 = recall_at_k(gt, ids16, 10)
        assert r16 == 1.0
        assert 0.4 < r4 <= r16


def test_ivf_growth_with_default_bucket_len(rng):
    """Regression: default bucket_len is rounded up to the pad multiple by
    the layout builder — growth rows must use the PHYSICAL width."""
    from vectordb_retrieval_tpu.serving import MutableIVFIndex

    x = rng.standard_normal((1000, 8)).astype(np.float32)
    idx = MutableIVFIndex(x, nlist=8, nprobe=8)  # bucket_len=250 -> 256 phys
    extra = rng.standard_normal((600, 8)).astype(np.float32)
    new_ids = idx.add(extra)  # overflows several lists
    assert idx.n_active == 1600
    _, got = idx.search(extra[:5], 1)
    np.testing.assert_array_equal(got[:, 0], new_ids[:5])


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_mutable_flat_randomized_interleaving(rng, metric):
    """Fuzz adds/deletes/compactions/searches against a host-side oracle."""
    from vectordb_retrieval_tpu.serving import MutableFlatIndex

    d = 12
    idx = MutableFlatIndex(d, metric=metric, capacity=16, compact_frac=0.3)
    oracle = {}  # stable id -> vector
    for step in range(30):
        op = rng.choice(["add", "add", "delete", "search"])
        if op == "add":
            m = int(rng.integers(1, 40))
            batch = rng.standard_normal((m, d)).astype(np.float32)
            ids = idx.add(batch)
            for i, sid in enumerate(ids):
                oracle[int(sid)] = batch[i]
        elif op == "delete" and oracle:
            sids = rng.choice(
                list(oracle), size=min(len(oracle), 5), replace=False
            )
            n_del = idx.delete(sids)
            assert n_del == len(sids)
            for sid in sids:
                oracle.pop(int(sid))
        elif oracle:
            q = rng.standard_normal((3, d)).astype(np.float32)
            k = min(4, len(oracle))
            _, got = idx.search(q, k)
            keys = np.array(sorted(oracle))
            x = np.stack([oracle[int(s)] for s in keys])
            if metric == "l2":
                dist = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
            else:
                xn = x / np.maximum(
                    np.linalg.norm(x, axis=1, keepdims=True), 1e-12
                )
                qn = q / np.maximum(
                    np.linalg.norm(q, axis=1, keepdims=True), 1e-12
                )
                dist = -(qn @ xn.T)
            exp_ids = keys[np.argsort(dist, axis=1, kind="stable")[:, :k]]
            # compare by distance (ties may reorder between backends)
            for row in range(3):
                gd = sorted(
                    dist[row][np.searchsorted(keys, got[row][got[row] >= 0])]
                )
                ed = sorted(dist[row][np.searchsorted(keys, exp_ids[row])])
                np.testing.assert_allclose(gd, ed, rtol=1e-4, atol=1e-5)
        assert idx.n_active == len(oracle)


def test_mutable_ivf_randomized_interleaving(rng):
    """Fuzz IVF adds/deletes with all-probe searches (== exact semantics)."""
    from vectordb_retrieval_tpu.serving import MutableIVFIndex

    d = 10
    x0 = rng.standard_normal((300, d)).astype(np.float32)
    idx = MutableIVFIndex(x0, nlist=4, nprobe=4, bucket_len=32)
    oracle = {i: x0[i] for i in range(300)}
    for step in range(20):
        op = rng.choice(["add", "delete", "search"])
        if op == "add":
            m = int(rng.integers(1, 60))
            batch = rng.standard_normal((m, d)).astype(np.float32)
            ids = idx.add(batch)
            for i, sid in enumerate(ids):
                oracle[int(sid)] = batch[i]
        elif op == "delete" and oracle:
            sids = rng.choice(
                list(oracle), size=min(len(oracle), 8), replace=False
            )
            assert idx.delete(sids) == len(sids)
            for sid in sids:
                oracle.pop(int(sid))
        elif oracle:
            q = rng.standard_normal((3, d)).astype(np.float32)
            k = min(5, len(oracle))
            # all-probe == exact over the live set
            _, got = idx.search(q, k, nprobe=idx.nlist)
            keys = np.array(sorted(oracle))
            x = np.stack([oracle[int(s)] for s in keys])
            dist = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
            exp = keys[np.argsort(dist, axis=1, kind="stable")[:, :k]]
            for row in range(3):
                g = got[row][got[row] >= 0]
                gd = sorted(dist[row][np.searchsorted(keys, g)])
                ed = sorted(dist[row][np.searchsorted(keys, exp[row])])
                np.testing.assert_allclose(gd, ed, rtol=1e-4, atol=1e-5)
        assert idx.n_active == len(oracle)


# ---------------------------------------------------------------------------
# round-3 hardening: slot reuse, bulk add, compaction, persistence, snapshot
# ---------------------------------------------------------------------------


def test_ivf_slot_reuse_and_compaction(rng):
    from vectordb_retrieval_tpu.serving import MutableIVFIndex

    x = rng.standard_normal((2000, 16)).astype(np.float32)
    idx = MutableIVFIndex(x, nlist=16, nprobe=16)
    nb0 = idx._nb
    ids = np.arange(2000)
    # churn: delete half, re-add same count repeatedly -> bucket count must
    # not grow (free slots reused), unlike the old append-only layout
    for round_ in range(4):
        dead = rng.choice(ids, 800, replace=False)
        idx.delete(dead)
        ids = np.setdiff1d(ids, dead)
        new = idx.add(rng.standard_normal((800, 16)).astype(np.float32))
        ids = np.concatenate([ids, new])
    assert idx.n_active == 2000
    assert idx._nb <= nb0 + 16  # slack for per-list rounding only
    # forced compaction packs tight and preserves results
    q = rng.standard_normal((8, 16)).astype(np.float32)
    d0, i0 = idx.search(q, 5)
    idx.compact()
    d1, i1 = idx.search(q, 5)
    np.testing.assert_allclose(np.sort(d0, 1), np.sort(d1, 1), rtol=1e-4)
    assert idx._n_dead == 0


def test_ivf_bulk_add_matches_oracle(rng):
    from vectordb_retrieval_tpu.serving import MutableIVFIndex

    x0 = rng.standard_normal((1000, 12)).astype(np.float32)
    idx = MutableIVFIndex(x0, nlist=8, nprobe=8)
    bulk = rng.standard_normal((5000, 12)).astype(np.float32)
    new_ids = idx.add(bulk)
    assert idx.n_active == 6000
    full = np.concatenate([x0, bulk])
    q = rng.standard_normal((16, 12)).astype(np.float32)
    _, got = idx.search(q, 10)
    exp = _oracle(q, full, 10)
    # full-probe IVF == exact: compare hit sets by distance
    gd = ((q[:, None, :] - full[np.where(got >= 0, got, 0)]) ** 2).sum(-1)
    ed = ((q[:, None, :] - full[exp]) ** 2).sum(-1)
    np.testing.assert_allclose(np.sort(gd, 1), np.sort(ed, 1), rtol=1e-4)
    # bulk ids are the promised monotone handles
    np.testing.assert_array_equal(new_ids, np.arange(1000, 6000))


def test_mutable_flat_persistence_roundtrip(tmp_path, rng):
    idx = MutableFlatIndex(10)
    x = rng.standard_normal((300, 10)).astype(np.float32)
    ids = idx.add(x)
    idx.delete(ids[:20])
    idx.save(str(tmp_path / "mf"), {"dataset_fingerprint": "f"})
    idx2 = MutableFlatIndex.load(str(tmp_path / "mf"), {"dataset_fingerprint": "f"})
    q = rng.standard_normal((6, 10)).astype(np.float32)
    d0, i0 = idx.search(q, 5)
    d1, i1 = idx2.search(q, 5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)
    # state continues: adds after load get fresh ids
    nid = idx2.add(rng.standard_normal((3, 10)).astype(np.float32))
    assert nid.min() >= 300


def test_mutable_ivf_persistence_roundtrip(tmp_path, rng):
    from vectordb_retrieval_tpu.serving import MutableIVFIndex

    x = rng.standard_normal((800, 12)).astype(np.float32)
    idx = MutableIVFIndex(x, nlist=8, nprobe=8)
    idx.delete(np.arange(50))
    idx.add(rng.standard_normal((100, 12)).astype(np.float32))
    idx.save(str(tmp_path / "mi"))
    idx2 = MutableIVFIndex.load(str(tmp_path / "mi"))
    q = rng.standard_normal((6, 12)).astype(np.float32)
    d0, i0 = idx.search(q, 5)
    d1, i1 = idx2.search(q, 5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)


def test_snapshot_handoff_to_annsearcher(rng):
    from vectordb_retrieval_tpu.models.factory import ANNSearcher
    from vectordb_retrieval_tpu.serving import MutableIVFIndex

    x = rng.standard_normal((1200, 16)).astype(np.float32)
    idx = MutableIVFIndex(x, nlist=8, nprobe=8)
    idx.delete(np.arange(100))
    added = idx.add(rng.standard_normal((50, 16)).astype(np.float32))
    art = idx.to_artifact()
    s = ANNSearcher(nprobe=8)
    s.attach(art)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    d_live, i_live = idx.search(q, 5)
    d_art, i_art = s.batch_search(q, 5)
    np.testing.assert_array_equal(i_live, i_art)  # stable ids preserved
    assert int(i_art.max()) >= int(added.min())  # added rows reachable

    # flat snapshot keeps stable ids via row_ids mapping
    flat = MutableFlatIndex(16)
    fid = flat.add(x[:500])
    flat.delete(fid[:100])
    fart = flat.to_artifact()
    s2 = ANNSearcher()
    s2.attach(fart)
    d_l, i_l = flat.search(q, 5)
    d_a, i_a = s2.batch_search(q, 5)
    np.testing.assert_array_equal(i_l, i_a)


def test_churn_fuzz_large_scale(rng):
    """VERDICT #6 close-out: interleaved add/delete/compact/search vs
    oracle at 100k scale."""
    from vectordb_retrieval_tpu.serving import MutableIVFIndex

    d = 16
    x = rng.standard_normal((100_000, d)).astype(np.float32)
    idx = MutableIVFIndex(x, nlist=64, nprobe=64)  # full probe = exact
    live = {int(i): x[i] for i in range(100_000)}
    for step in range(6):
        op = step % 3
        if op == 0:
            dead = rng.choice(list(live.keys()), 5000, replace=False)
            assert idx.delete(dead) == 5000
            for i in dead:
                live.pop(int(i))
        elif op == 1:
            batch = rng.standard_normal((4000, d)).astype(np.float32)
            new_ids = idx.add(batch)
            for j, i in enumerate(new_ids):
                live[int(i)] = batch[j]
        else:
            idx.compact()
        q = rng.standard_normal((4, d)).astype(np.float32)
        dists, got = idx.search(q, 10)
        keys = np.fromiter(live.keys(), dtype=np.int64)
        vals = np.stack([live[int(i)] for i in keys])
        exp_d = np.sort(((q[:, None, :] - vals[None]) ** 2).sum(-1), 1)[:, :10]
        np.testing.assert_allclose(
            np.sort(dists, 1), exp_d, rtol=1e-3, atol=1e-3
        )
        assert all(int(i) in live for row in got for i in row if i >= 0)
    assert idx.n_active == len(live)


def test_mutable_ivf_load_add_preserves_live_rows(tmp_path, rng):
    """Review round-3 CONFIRMED bug: load() restored _fill as the per-bucket
    LIVE count instead of the append watermark, so with an interior
    tombstone in the snapshot the first add() after load scattered into an
    OCCUPIED top slot — silently replacing a live row whose _id_loc entry
    still pointed there. fill must restore as watermark and interior
    tombstones must land on the free lists (reused, counted as dead)."""
    from vectordb_retrieval_tpu.serving import MutableIVFIndex

    d = 8
    x = rng.standard_normal((256, d)).astype(np.float32)
    idx = MutableIVFIndex(x, nlist=4, nprobe=4)
    # interior tombstone: delete an id whose slot sits BELOW its bucket's
    # watermark (any early id qualifies — slots fill in insertion order)
    assert idx.delete([3]) == 1
    idx.save(str(tmp_path / "mi"))
    idx2 = MutableIVFIndex.load(str(tmp_path / "mi"))
    assert idx2._n_dead == 1  # interior tombstone visible post-load

    new_rows = rng.standard_normal((16, d)).astype(np.float32)
    new_ids = idx2.add(new_rows)
    # every pre-existing live id must still resolve to ITS OWN vector
    q = x[np.array([0, 1, 2, 10, 100, 255])]
    _, got = idx2.search(q, 1)
    np.testing.assert_array_equal(
        got[:, 0], np.array([0, 1, 2, 10, 100, 255])
    )
    # and the new rows are searchable under their returned handles
    _, got_new = idx2.search(new_rows[:4], 1)
    np.testing.assert_array_equal(got_new[:, 0], new_ids[:4])
    assert idx2.n_active == 256 - 1 + 16


def test_mutable_ivf_churn_does_not_inflate_dead_count(rng):
    """Review round-3: add() reusing a freed slot must decrement _n_dead,
    else steady delete/add churn triggers spurious full compactions."""
    from vectordb_retrieval_tpu.serving import MutableIVFIndex

    d = 8
    x = rng.standard_normal((512, d)).astype(np.float32)
    idx = MutableIVFIndex(x, nlist=4, nprobe=4)
    for i in range(64):
        victim = idx.search(x[i : i + 1], 1)[1][0, 0]
        assert idx.delete([int(victim)]) == 1
        # re-adding the same vector assigns to the same list -> the freed
        # slot is reused, so the dead count must return to zero
        idx.add(x[i : i + 1])
        assert idx._n_dead == 0, f"step {i}: dead={idx._n_dead}"


def test_ivf_filter_pushdown_matches_oracle(rng):
    """MutableIVF filtered search == oracle over the allowed set, at full
    probe coverage (predicate pushdown, not overfetch-and-drop)."""
    from vectordb_retrieval_tpu.serving import MutableIVFIndex

    x = rng.standard_normal((600, 12)).astype(np.float32)
    q = rng.standard_normal((7, 12)).astype(np.float32)
    idx = MutableIVFIndex(x, nlist=8, nprobe=8)  # all lists probed
    allow = np.arange(0, 600, 3)  # every 3rd id
    d, got = idx.search(q, 5, filter_ids=allow)
    assert np.isin(got[got >= 0], allow).all()
    exp = _oracle(q, x[allow], 5)
    gd = np.sort(d, 1)
    ed = np.sort(
        ((q[:, None, :] - x[allow][exp]) ** 2).sum(-1), 1
    )
    np.testing.assert_allclose(gd, ed, rtol=1e-3, atol=1e-4)


def test_ivf_filter_interacts_with_delete(rng):
    from vectordb_retrieval_tpu.serving import MutableIVFIndex

    x = rng.standard_normal((300, 10)).astype(np.float32)
    q = x[:4]
    idx = MutableIVFIndex(x, nlist=4, nprobe=4)
    idx.delete(np.arange(0, 300, 2))  # kill the even ids
    allow = np.arange(0, 300)  # allow everything, incl. deleted
    d, got = idx.search(q, 6, filter_ids=allow)
    live = got[got >= 0]
    assert (live % 2 == 1).all(), "deleted rows must not pass the filter"
    # allowed set smaller than k: pad with -1/inf instead of leaking
    d2, got2 = idx.search(q, 6, filter_ids=np.array([1, 3]))
    assert set(got2[got2 >= 0].tolist()) <= {1, 3}
    assert np.isinf(np.sort(d2, 1)[:, -1]).all()


def test_ivf_filter_small_allowlist_exact(rng):
    """A tiny allow-list must return exactly those rows (ranked), even
    when they live in lists the unfiltered top-k would never surface."""
    from vectordb_retrieval_tpu.serving import MutableIVFIndex

    x = rng.standard_normal((400, 8)).astype(np.float32)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    idx = MutableIVFIndex(x, nlist=5, nprobe=5)
    allow = np.array([17, 230, 391])
    d, got = idx.search(q, 3, filter_ids=allow)
    exp = _oracle(q, x[allow], 3)
    np.testing.assert_array_equal(
        np.sort(np.asarray(got), 1), np.sort(allow[exp], 1)
    )
