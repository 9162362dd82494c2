"""Real-chip tests (skipped on CPU-only hosts; run manually on TPU VMs).

The conftest pins this suite to the CPU backend, so these validate the
marker plumbing and document how real-chip tests are written.
"""

import numpy as np
import pytest

from conftest import is_tpu_available


@pytest.mark.requires_tpu
@pytest.mark.skipif(not is_tpu_available(), reason="no TPU device")
def test_exact_search_on_tpu(rng):
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.ops import distances as dops

    x = jnp.asarray(rng.standard_normal((1000, 64)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    d, i = dops.exact_search(q, x, 10, "l2", refine=True)
    assert np.asarray(i).shape == (8, 10)
