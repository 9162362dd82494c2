"""Graph (HNSW-class) index: adjacency validity, recall floor, cosine path."""

import numpy as np

from vectordb_retrieval_tpu.bench.metrics import recall_at_k
from vectordb_retrieval_tpu.models import get_algorithm_instance
from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm


def _data(rng, n=2000, d=32, nq=32):
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :10]
    return x, q, gt


def test_knn_graph_no_self_edges(rng):
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops.graph import build_knn_graph

    x = jnp.asarray(rng.standard_normal((300, 16)).astype(np.float32))
    adj = np.asarray(build_knn_graph(x, 8))
    assert adj.shape == (300, 8)
    assert (adj >= 0).all() and (adj < 300).all()
    assert not (adj == np.arange(300)[:, None]).any()


def test_hnsw_recall(rng):
    x, q, gt = _data(rng)
    algo = get_algorithm_instance("HNSW", 32, M=16, efSearch=100)
    algo.build_index(x)
    _, ids = algo.batch_search(q, 10)
    rec = recall_at_k(gt, ids, 10)
    # reference hnsw hits 0.9156 on random (BASELINE.md); small-N beam search
    # should exceed that comfortably
    assert rec > 0.9, rec


def test_hnsw_self_retrieval(rng):
    x, _, _ = _data(rng, n=500)
    algo = get_algorithm_instance("HNSW", 32, M=8, efSearch=64)
    algo.build_index(x)
    d, i = algo.batch_search(x[:8], 1)
    assert (i[:, 0] == np.arange(8)).mean() >= 0.8  # beam search, near-exact


def test_hnsw_cosine(rng):
    x, q, _ = _data(rng)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    gt = np.argsort(-(qn @ xn.T), axis=1)[:, :10]
    algo = CompositeAlgorithm(
        dimension=32,
        indexer={"type": "HNSWIndexer", "M": 16},
        searcher={"type": "FaissSearcher", "efSearch": 100},
        metric="cosine",
    )
    algo.build_index(x)
    _, ids = algo.batch_search(q, 10)
    assert recall_at_k(gt, ids, 10) > 0.85


def test_graph_persistence_roundtrip(tmp_path, rng):
    x, q, _ = _data(rng, n=400)
    algo = get_algorithm_instance("HNSW", 32, M=8, efSearch=64)
    algo.build_index(x)
    d0, i0 = algo.batch_search(q, 5)
    algo.save_index(str(tmp_path / "g"), {"dataset_fingerprint": "f"})
    algo2 = get_algorithm_instance("HNSW", 32, M=8, efSearch=64)
    algo2.load_index(str(tmp_path / "g"), {"dataset_fingerprint": "f"})
    d1, i1 = algo2.batch_search(q, 5)
    assert np.array_equal(i0, i1)


def test_ivf_build_method_recall(rng):
    """IVF-probe candidate generation: graph quality stays near exact-build."""
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.bench.metrics import recall_at_k
    from vectordb_retrieval_tpu.ops import graph as gops

    x = rng.standard_normal((4000, 32)).astype(np.float32)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :10]

    xd = jnp.asarray(x)
    adj = gops.build_knn_graph(xd, 16, method="ivf", build_nprobe=8,
                               build_nlist=32)
    assert adj.shape == (4000, 16)
    assert ((np.asarray(adj) >= 0) & (np.asarray(adj) < 4000)).all()
    entries = gops.pick_entry_points(xd, 64, seed=0)
    d, i = gops.graph_search(
        jnp.asarray(q), xd, adj, entries, 10, ef=96, expand=16, iters=4,
        metric="l2", cand_keep=64,
    )
    assert recall_at_k(gt, np.asarray(i), 10) > 0.85


def test_int8_neighbor_table_recall(rng):
    """SQ8-coded neighbour table: recall matches the bf16 table closely."""
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.bench.metrics import recall_at_k
    from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm

    x = rng.standard_normal((4000, 32)).astype(np.float32)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :10]

    def run(dtype):
        algo = CompositeAlgorithm(
            dimension=32,
            indexer={
                "type": "GraphIndexer", "M": 8, "nbr_table": "on",
                "nbr_table_dtype": dtype,
            },
            searcher={"type": "ANNSearcher", "efSearch": 100},
            metric="l2",
        )
        algo.build_index(x)
        if dtype == "int8":
            assert algo.artifact.data["nbr_vecs"].dtype == jnp.uint8
            assert "nbr_vmin" in algo.artifact.data
        _, ids = algo.batch_search(q, 10)
        return recall_at_k(gt, ids, 10)

    r_bf16 = run("bf16")
    r_int8 = run("int8")
    assert r_int8 > 0.85
    assert abs(r_bf16 - r_int8) < 0.05


def _clustered(rng, n=60_000, d=32, nq=48, n_clusters=400):
    """Clustered corpus (the data class block mode exists for)."""
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4
    assign = rng.integers(0, n_clusters, n)
    x = centers[assign] + rng.standard_normal((n, d)).astype(np.float32) * 0.3
    qi = rng.choice(n, nq, replace=False)
    q = x[qi] + rng.standard_normal((nq, d)).astype(np.float32) * 0.05
    return x.astype(np.float32), q.astype(np.float32)


def test_block_mode_recall_and_memory_parity(rng):
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops import distances as dops

    x, q = _clustered(rng)
    gt = np.asarray(dops.exact_search(jnp.asarray(q), jnp.asarray(x), 10)[1])
    algo = CompositeAlgorithm(
        dimension=x.shape[1],
        indexer={"type": "GraphIndexer", "M": 16, "mode": "block"},
        searcher={"type": "ANNSearcher", "efSearch": 128},
        metric="l2",
    )
    algo.build_index(x)
    meta = algo.artifact.metadata
    assert meta["mode"] == "block"
    # memory parity: the whole artifact within 1.25x of the corpus bytes
    assert algo.artifact.device_nbytes() <= 1.25 * x.nbytes
    _, ids = algo.batch_search(q, 10)
    assert recall_at_k(gt, ids, 10) > 0.95
    # returned ids are unique per row (block dedup ensures no double-probe)
    for r in range(ids.shape[0]):
        got = [i for i in ids[r].tolist() if i >= 0]
        assert len(got) == len(set(got))


def test_block_mode_spill_dedup_and_recall(rng):
    """Spilled layouts must return duplicate-free ids and never lose
    recall vs the unspilled build at a tight probe budget."""
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops import distances as dops

    x, q = _clustered(rng, n=60_000, d=32, nq=48)
    gt = np.asarray(dops.exact_search(jnp.asarray(q), jnp.asarray(x), 10)[1])

    def run(spill):
        algo = CompositeAlgorithm(
            dimension=x.shape[1],
            indexer={
                "type": "GraphIndexer", "M": 16, "mode": "block",
                "spill": spill,
            },
            # tight budget so routing misses are visible
            searcher={"type": "ANNSearcher", "efSearch": 24},
            metric="l2",
        )
        algo.build_index(x)
        if spill > 0:
            assert algo.artifact.metadata["spill"] == spill
            # clones add blocks: layout grew but block_len is unchanged
            assert algo.artifact.metadata["block_len"] <= 256
        _, ids = algo.batch_search(q, 10)
        for r in range(ids.shape[0]):
            got = [i for i in ids[r].tolist() if i >= 0]
            assert len(got) == len(set(got)), "duplicate ids after spill"
        return recall_at_k(gt, ids, 10)

    r0 = run(0.0)
    r_spill = run(0.2)
    assert r_spill >= r0 - 0.02  # never materially worse


def test_block_mode_bf16_slabs(rng):
    """bf16 member slabs: half the slab memory at a bounded recall cost,
    dtype recorded in metadata.

    32d tight clusters are the adversarial case for the bf16 rounding of
    the stored residuals (neighbour margins comparable to the 2^-9
    rounding of the intra-block scatter): measured loss here is ~2%,
    the representational ceiling of the encoding (probing more never
    recovers it). At embedding dims (128/384) the rounding averages out
    across dims and the measured loss is ~1e-3 — which is why bf16 is
    the shipped default at real shapes; `slab_dtype: f32` remains the
    escape hatch for low-dim tight-margin corpora like this one."""
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops import distances as dops

    x, q = _clustered(rng, n=60_000, d=32, nq=48)
    gt = np.asarray(dops.exact_search(jnp.asarray(q), jnp.asarray(x), 10)[1])

    def run(slab):
        algo = CompositeAlgorithm(
            dimension=x.shape[1],
            indexer={
                "type": "GraphIndexer", "M": 16, "mode": "block",
                "slab_dtype": slab,
            },
            searcher={"type": "ANNSearcher", "efSearch": 64},
            metric="l2",
        )
        algo.build_index(x)
        assert algo.artifact.metadata["slab_dtype"] == (
            "bfloat16" if slab == "bf16" else "float32"
        )
        _, ids = algo.batch_search(q, 10)
        return recall_at_k(gt, ids, 10), algo.artifact.device_nbytes()

    r32, m32 = run("f32")
    rbf, mbf = run("bf16")
    assert rbf >= r32 - 0.03  # adversarial-case representational ceiling
    assert mbf < 0.6 * m32  # slabs dominate the artifact


def test_kmeans_assign2_margin_oracle(rng):
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops.kmeans import kmeans_assign2

    x = rng.standard_normal((500, 8)).astype(np.float32)
    c = rng.standard_normal((16, 8)).astype(np.float32)
    a1, a2, margin = kmeans_assign2(jnp.asarray(x), jnp.asarray(c))
    d = ((x[:, None, :] - c[None]) ** 2).sum(-1)
    order = np.argsort(d, axis=1)
    assert np.array_equal(np.asarray(a1), order[:, 0])
    assert np.array_equal(np.asarray(a2), order[:, 1])
    want = d[np.arange(500), order[:, 1]] - d[np.arange(500), order[:, 0]]
    np.testing.assert_allclose(np.asarray(margin), want, rtol=1e-3,
                               atol=1e-3)


def test_block_mode_auto_falls_back_on_structureless_data(rng, monkeypatch):
    from vectordb_retrieval_tpu.models.graph import (
        _BLOCK_AUTO_THRESHOLD, GraphIndexer,
    )

    n = _BLOCK_AUTO_THRESHOLD + 4_000
    x = rng.standard_normal((n, 16)).astype(np.float32)
    # auto mode's contract: the artifact type FOLLOWS the self-check.
    # (The calibrated row budget now scans ~30% of blocks at efSearch=64,
    # so even this i.i.d. gaussian passes the 0.85 bar for real — the
    # fallback PATH is exercised by forcing the check below it.)
    art = GraphIndexer(M=8, efSearch=64).build(x, 16)
    check = art.metadata["selfcheck_recall"]
    assert ("entries" in art.data) == (check >= 0.85)

    monkeypatch.setattr(
        GraphIndexer, "_block_selfcheck", lambda self, a, v: 0.5
    )
    art2 = GraphIndexer(M=8, efSearch=64).build(x, 16)
    assert "entries" not in art2.data  # auto + failed check -> node mode
    assert art2.data.get("adjacency") is not None


def test_block_mode_persistence_roundtrip(tmp_path, rng):
    x, q = _clustered(rng, n=55_000)
    algo = CompositeAlgorithm(
        dimension=x.shape[1],
        indexer={"type": "GraphIndexer", "M": 8, "mode": "block"},
        searcher={"type": "ANNSearcher", "efSearch": 64},
        metric="l2",
    )
    algo.build_index(x)
    d0, i0 = algo.batch_search(q, 5)
    algo.save_index(str(tmp_path / "g"), {"dataset_fingerprint": "f"})
    algo2 = CompositeAlgorithm(
        dimension=x.shape[1],
        indexer={"type": "GraphIndexer", "M": 8, "mode": "block"},
        searcher={"type": "ANNSearcher", "efSearch": 64},
        metric="l2",
    )
    algo2.load_index(str(tmp_path / "g"), {"dataset_fingerprint": "f"})
    d1, i1 = algo2.batch_search(q, 5)
    assert np.array_equal(i0, i1)


def test_reverse_edges_restore_reachability(rng):
    """An orphan row (nobody's RNG neighbour) is unreachable by any beam
    budget on the forward graph; reverse edges restore the incoming link.
    (The production symptom: a recall plateau at any efSearch.)"""
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops.graph import add_reverse_edges

    # adjacency where row 3 has outgoing edges but NO incoming edge
    adj = np.array(
        [[1, 2], [0, 2], [0, 1], [0, 1]], dtype=np.int32
    )
    x = jnp.asarray(
        np.array([[0.0, 0], [1, 0], [0, 1], [5, 5]], dtype=np.float32)
    )
    assert 3 not in adj[:3]  # orphan precondition
    aug = add_reverse_edges(adj, x, rev=3)
    assert aug.shape == (4, 5)
    # row 3's outgoing targets now link back to it (rev must cover the
    # in-degree: with rev < in-degree the FARTHEST incoming source — the
    # orphan — is correctly the one dropped)
    assert 3 in aug[0] and 3 in aug[1]
    # nearest-first: the orphan sits in the LAST kept incoming slot
    assert aug[0, 2 + 2] == 3 and aug[1, 2 + 2] == 3
    # reverse slots are -1 padded where absent
    assert set(aug[3, 2:].tolist()) <= {0, 1, -1}
    aug2 = add_reverse_edges(adj, x, rev=2)
    assert 3 not in aug2[0] and 3 not in aug2[1]  # farthest loses the slots


def test_block_geometry_mapping_anchors():
    """The efSearch -> geometry mapping's calibrated anchors: ef=100 at
    L=128 is the msmarco parity point (96-slab waves, 2 iterations) and
    probes never exceed the block count."""
    from vectordb_retrieval_tpu.models.graph import block_geometry

    efb, expand, iters = block_geometry(782, 100, 20, block_len=128)
    assert (expand, iters) == (96, 2)
    assert efb >= 2 * expand
    # small-N cap: probes clamp at n_blocks
    efb, expand, iters = block_geometry(40, 400, 10, block_len=128)
    assert expand * iters <= 40 + expand  # one wave of slack at most


def test_block_size_auto_dma_knee_rule():
    """Auto block size coarsens to 256 rows exactly when a 128-row slab
    would sit under the 64 KB DMA-issue knee (scripts/exp_slab_ring.py;
    A/B evidence: round3_sift_block256_probe)."""
    from vectordb_retrieval_tpu.models.graph import GraphIndexer

    gi = GraphIndexer(metric="l2", mode="block")  # bf16 slabs by default
    assert gi._block_geom(1_000_000, 128)[0] == -(-1_000_000 // 256)
    assert gi._block_geom(100_000, 384)[0] == -(-100_000 // 128)
    # f32 slabs at d=128 are already at the knee -> stay fine-grained
    gi32 = GraphIndexer(metric="l2", mode="block", slab_dtype="f32")
    assert gi32._block_geom(1_000_000, 128)[0] == -(-1_000_000 // 128)
    # explicit override always wins
    gi_fix = GraphIndexer(metric="l2", mode="block", block_size=128)
    assert gi_fix._block_geom(1_000_000, 128)[0] == -(-1_000_000 // 128)
