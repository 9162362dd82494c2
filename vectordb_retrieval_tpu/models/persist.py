"""Atomic artifact persistence: .npz pytree + manifest + sentinel.

Generalises the reference's cover-tree persistence protocol (reference:
src/algorithms/covertree_v2_2.py:101-282) to *every* index family: since all
our indexes are pytrees of device arrays, any artifact serialises as one
``arrays.npz`` plus a JSON manifest. The safety protocol is kept:

  * write into a temp dir, then atomic ``os.replace`` into place,
  * ``WRITE_COMPLETE`` sentinel file marks a finished write,
  * manifest carries schema_version / kind / metadata / dataset fingerprint /
    config hash, all validated on load (mismatch -> ValueError).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vectordb_retrieval_tpu.models.base import IndexArtifact

SCHEMA_VERSION = 1
SENTINEL = "WRITE_COMPLETE"
MANIFEST = "manifest.json"
ARRAYS = "arrays.npz"


def _flatten(data: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for key, val in data.items():
        full = f"{prefix}{key}"
        if isinstance(val, dict):
            flat.update(_flatten(val, prefix=full + "/"))
        elif val is None:
            continue
        else:
            arr = np.asarray(val)
            if arr.dtype.name == "bfloat16":  # npz can't store ml_dtypes
                arr = arr.view(np.uint16)
                flat[full + ".bf16"] = arr
            else:
                flat[full] = arr
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, val in flat.items():
        if key.endswith(".bf16"):
            import ml_dtypes

            key = key[: -len(".bf16")]
            val = val.view(ml_dtypes.bfloat16)
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def save_artifact(
    artifact: IndexArtifact, path: str, context: Optional[Dict[str, Any]] = None
) -> None:
    """Atomically persist an artifact directory at ``path``."""
    context = context or {}
    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".artifact_tmp_", dir=parent)
    try:
        arrays = _flatten(artifact.data)
        np.savez(os.path.join(tmp, ARRAYS), **arrays)
        manifest = {
            "schema_version": SCHEMA_VERSION,
            "kind": artifact.kind,
            "metadata": artifact.metadata,
            "array_keys": sorted(arrays),
            "dataset_fingerprint": context.get("dataset_fingerprint"),
            "config_hash": context.get("config_hash"),
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2, default=str)
        with open(os.path.join(tmp, SENTINEL), "w") as f:
            f.write("ok\n")
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def load_artifact(
    path: str, context: Optional[Dict[str, Any]] = None, device_put: bool = True
) -> IndexArtifact:
    """Load + validate a persisted artifact; raises on any integrity failure."""
    context = context or {}
    if not os.path.isdir(path):
        raise FileNotFoundError(f"artifact dir not found: {path}")
    if not os.path.exists(os.path.join(path, SENTINEL)):
        raise ValueError(f"artifact at {path} is incomplete (missing {SENTINEL})")
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("schema_version") != SCHEMA_VERSION:
        raise ValueError(
            f"artifact schema_version {manifest.get('schema_version')} "
            f"!= expected {SCHEMA_VERSION}"
        )
    for key in ("dataset_fingerprint", "config_hash"):
        want = context.get(key)
        have = manifest.get(key)
        if want is not None and have is not None and want != have:
            raise ValueError(
                f"artifact {key} mismatch: saved {have!r} != expected {want!r}"
            )
    expected_kind = context.get("kind")
    if expected_kind is not None and manifest["kind"] != expected_kind:
        raise ValueError(
            f"artifact kind {manifest['kind']!r} != expected {expected_kind!r}"
        )
    with np.load(os.path.join(path, ARRAYS)) as npz:
        flat = {k: npz[k] for k in npz.files}
    data = _unflatten(flat)
    if device_put:
        data = jax.tree_util.tree_map(lambda a: jax.device_put(jnp.asarray(a)), data)
    return IndexArtifact(
        kind=manifest["kind"], data=data, metadata=manifest.get("metadata", {})
    )
