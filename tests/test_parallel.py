"""Sharded search on a virtual 8-device CPU mesh (SURVEY.md section 4 note)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.parallel import make_mesh, shard_database, sharded_exact_search


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def _oracle(q, x, k, metric="l2"):
    d = np.asarray(
        dops.pairwise_distances(jnp.asarray(q), jnp.asarray(x), metric)
    )
    ids = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, ids, axis=1), ids


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_sharded_matches_single_device(rng, metric):
    x = rng.standard_normal((1000, 32)).astype(np.float32)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    mesh = make_mesh(8)
    xs, n = shard_database(x, mesh)
    d, i = sharded_exact_search(jnp.asarray(q), xs, n, 10, mesh, metric=metric)
    od, oi = _oracle(q, x, 10, metric)
    np.testing.assert_allclose(np.sort(np.asarray(d), 1), od, rtol=1e-4, atol=1e-4)
    # ids must produce identical distances (tie-aware)
    full = np.asarray(
        dops.pairwise_distances(jnp.asarray(q), jnp.asarray(x), metric)
    )
    np.testing.assert_allclose(
        np.asarray(d), np.take_along_axis(full, np.asarray(i), 1), rtol=1e-4, atol=1e-4
    )


def test_sharded_ragged_rows(rng):
    x = rng.standard_normal((1003, 16)).astype(np.float32)  # not divisible by 8
    q = rng.standard_normal((4, 16)).astype(np.float32)
    mesh = make_mesh(8)
    xs, n = shard_database(x, mesh)
    assert xs.shape[0] % 8 == 0
    d, i = sharded_exact_search(jnp.asarray(q), xs, n, 1003, mesh)
    i = np.asarray(i)
    assert (i >= 0).all() and (i < 1003).all()
    # all real rows found exactly once at k == n
    for row in i:
        assert len(set(row.tolist())) == 1003


def test_sharded_2d_mesh_query_parallel(rng):
    x = rng.standard_normal((512, 16)).astype(np.float32)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    mesh = make_mesh(8, axis_names=("q", "db"), shape=(2, 4))
    xs, n = shard_database(x, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    qs = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("q", None)))
    d, i = sharded_exact_search(qs, xs, n, 5, mesh, q_axis="q")
    od, _ = _oracle(q, x, 5)
    np.testing.assert_allclose(np.sort(np.asarray(d), 1), od, rtol=1e-4, atol=1e-4)
