"""Tracing / profiling: jax.profiler traces + analytic FLOP accounting.

The reference's cost accounting is wall-clock timers plus the ``ndis``
distance-op counter (SURVEY.md section 5 "Tracing"). The TPU equivalents:

  * :func:`trace` — context manager writing a ``jax.profiler`` trace
    (viewable in TensorBoard / Perfetto) around a benchmark region;
  * :func:`flops_estimate` — XLA cost analysis of a jitted function, for
    operations-vs-recall plots grounded in compiler-reported FLOPs rather
    than hand estimates;
  * the ``ndis`` counter protocol itself lives on ``BaseAlgorithm``
    (models/base.py) and stays the source of truth for the guarantee story.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """``with trace("/tmp/trace"):`` captures a device profile."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_estimate(fn: Callable, *args: Any, **kwargs: Any) -> Optional[float]:
    """Compiler-reported FLOPs for one invocation of ``fn(*args)``.

    Returns None when the backend does not expose a cost analysis.
    """
    import jax

    try:
        lowered = jax.jit(fn, **kwargs).lower(*args)
        compiled = lowered.compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):  # older jax returns [dict]
            analysis = analysis[0] if analysis else {}
        return float(analysis.get("flops")) if analysis else None
    except Exception:
        return None


def cost_estimate(fn: Callable, *args: Any, **kwargs: Any) -> Dict[str, float]:
    """XLA cost analysis of one ``fn(*args)`` call: flops + bytes accessed.

    Tries the client-side ``Lowered.cost_analysis()`` first (no backend
    compile); falls back to compiling. Returns ``{}`` when neither is
    available — callers must treat roofline numbers as best-effort.
    """
    import jax

    try:
        lowered = jax.jit(fn, **kwargs).lower(*args)
        analysis = None
        try:
            analysis = lowered.cost_analysis()
        except Exception:
            analysis = None
        if not analysis:
            analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):  # older jax returns [dict]
            analysis = analysis[0] if analysis else {}
        out: Dict[str, float] = {}
        if analysis:
            if analysis.get("flops") is not None:
                out["flops"] = float(analysis["flops"])
            if analysis.get("bytes accessed") is not None:
                out["bytes_accessed"] = float(analysis["bytes accessed"])
        return out
    except Exception:
        return {}


def memory_stats() -> Dict[str, Any]:
    """Per-device live-buffer statistics (honest HBM accounting)."""
    import jax

    out: Dict[str, Any] = {}
    for dev in jax.devices():
        stats = getattr(dev, "memory_stats", None)
        if callable(stats):
            try:
                out[str(dev)] = dev.memory_stats()
            except Exception:
                out[str(dev)] = {}
    return out
