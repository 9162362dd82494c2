"""Platform compatibility self-healing.

The reference's analogue fixed ARM/MKL BLAS issues on its CPU cluster
(reference src/utils/compat.py:15-67, invoked from its main entry point).
The TPU build's equivalent concerns are JAX platform selection: some hosts
pin ``JAX_PLATFORMS`` to a remote-TPU plugin via sitecustomize, and test /
CI environments need the virtual-device CPU mesh.
"""

from __future__ import annotations

import os
from typing import Optional


def ensure_platform(platform: Optional[str] = None, virtual_devices: int = 0) -> None:
    """Pin the JAX platform before first backend init.

    ``platform=None`` leaves the environment's choice (e.g. a TPU plugin).
    Must be called before any computation initialises the backend; the
    ``jax.config`` update wins over env-var overrides injected by
    sitecustomize hooks.
    """
    if virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={virtual_devices}"
            ).strip()
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persist compiled executables across processes.

    First compiles of the larger jitted programs (k-means training, streamed
    scans) take tens of seconds; the persistent cache makes repeat benchmark
    runs reflect steady-state build cost, as FAISS's (compile-free) numbers
    do.
    """
    import jax

    path = cache_dir or os.path.expanduser("~/.cache/vectordb_tpu_jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or read-only fs: cache is an optimisation only


def tpu_available() -> bool:
    import jax

    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


def trim_host_heap() -> bool:
    """Return freed heap arenas to the OS (glibc ``malloc_trim``).

    Big streaming builds churn GBs of short-lived host buffers; glibc
    keeps the freed arenas resident, so a later phase's allocations stack
    on top of a stale high-water mark. Trimming at phase boundaries keeps
    peak RSS tracking LIVE memory. No-op (False) on non-glibc platforms.
    """
    import ctypes
    import gc

    gc.collect()
    try:
        libc = ctypes.CDLL("libc.so.6")
        return bool(libc.malloc_trim(0))
    except (OSError, AttributeError):
        return False
