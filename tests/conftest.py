"""Test bootstrap: force CPU backend with 8 virtual devices.

TPU analogue of the reference's conftest (reference tests/conftest.py:1-23):
instead of a FAISS-availability helper, we pin JAX to the host CPU platform
and spoof 8 devices so sharding/collective tests run anywhere
(SURVEY.md section 4 closing note). Must run before jax is imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

# A sitecustomize on some hosts force-sets JAX_PLATFORMS (e.g. to a remote
# TPU tunnel) before user code runs; the config update below wins as long as
# it happens before the first backend initialisation.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def is_tpu_available() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(42)
