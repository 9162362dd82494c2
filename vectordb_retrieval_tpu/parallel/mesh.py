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
