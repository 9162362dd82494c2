"""Timing helpers honest under JAX async dispatch.

Parity surface: reference src/utils/timing.py:8-59 (``Timer`` context manager,
``time_function`` decorator), extended to ``block_until_ready`` any returned
device arrays so that dispatch-vs-completion cannot inflate QPS
(SURVEY.md section 7 hard-part (e); reference known_followups.md:50-55).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Optional

import jax


def block(tree: Any) -> Any:
    """Block until all device arrays in a pytree are ready."""
    return jax.block_until_ready(tree)


class Timer:
    """``with Timer() as t: ...`` then ``t.elapsed`` in seconds."""

    def __init__(self, name: Optional[str] = None):
        self.name = name
        self.elapsed = 0.0

    def __enter__(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.elapsed = time.perf_counter() - self._start


def time_function(fn: Callable) -> Callable:
    """Decorator returning ``(result, elapsed_seconds)``, device-blocking."""

    @functools.wraps(fn)
    def wrapped(*args: Any, **kwargs: Any):
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        out = block(out)
        return out, time.perf_counter() - start

    return wrapped
