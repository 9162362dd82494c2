"""Mesh construction helpers.

The reference has no distributed runtime (SURVEY.md section 2.3); this layer
is the new-capability-at-parity-plus surface: a ``jax.sharding.Mesh`` whose
``db`` axis shards database rows across chips (ICI), optionally with a ``q``
axis for query data-parallelism.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("db",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default is a 1-D ``("db",)`` mesh; pass ``axis_names=("q", "db")`` and a
    ``shape`` to add query data-parallelism.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devices)} available"
        )
    devs = np.asarray(devices[:n_devices])
    if shape is None:
        shape = (n_devices,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"shape {shape} != {n_devices} devices")
    return Mesh(devs.reshape(shape), axis_names)


def init_distributed(
    coordinator_address: "Optional[str]" = None,
    num_processes: "Optional[int]" = None,
    process_id: "Optional[int]" = None,
) -> bool:
    """Initialise the multi-host (multi-process) JAX runtime.

    On TPU pods each host runs one process; ``jax.distributed.initialize``
    wires them into one global device view (DCN between slices, ICI
    inside). Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``) or TPU-pod auto-detection when all are None.
    Returns True when a multi-process runtime is active. Idempotent.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:  # already initialised
        if "already" not in str(exc).lower():
            raise
    return jax.process_count() > 1


def make_multihost_mesh(
    db_axis_per_host: bool = True,
    axis_names: Tuple[str, ...] = ("dcn", "db"),
) -> Mesh:
    """Global mesh over all processes: DCN (outer) x ICI (inner) axes.

    The database shards over BOTH axes (each host's slice subshards over
    its local chips), so the all_gather merge decomposes into a cheap ICI
    gather inside each slice plus one DCN gather of k-sized candidate
    lists — the only cross-slice traffic this workload needs. Collective
    layout follows the hybrid-mesh recipe: outer axis = slowest network.

    Call :func:`init_distributed` first on every process. Single-process
    runtimes get a 1-host hybrid mesh (works under
    ``xla_force_host_platform_device_count`` spoofing too).
    """
    from jax.experimental import mesh_utils

    n_proc = jax.process_count()
    local = jax.local_device_count()
    devs = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, local),
        dcn_mesh_shape=(n_proc, 1),
        process_is_granule=True,
    ) if n_proc > 1 else np.asarray(jax.devices()).reshape(1, -1)
    return Mesh(devs, axis_names)


def host_local_rows(n: int) -> Tuple[int, int]:
    """Contiguous [lo, hi) row range this process should load/build.

    Multi-host data loading: each process materialises only its slice of
    the corpus (jax.make_array_from_single_device_arrays assembles the
    global sharded array without any host holding all rows)."""
    p = jax.process_count()
    i = jax.process_index()
    per = -(-n // p)
    return i * per, min((i + 1) * per, n)
