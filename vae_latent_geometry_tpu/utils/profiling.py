"""Profiling / timing utilities.

The reference has no profiling at all (only tqdm bars and prints —
SURVEY §5).  This module provides:

- ``sync``: correct device synchronization.  On the tunneled 'axon' TPU
  platform ``block_until_ready`` returns immediately (fully async dispatch),
  so the only reliable barrier is materializing a scalar on host.
- ``Timer`` / ``time_fn``: wall-clock measurement around jitted calls with
  proper sync, reporting steps/sec.
- ``trace_annotation``: ``jax.profiler`` trace scopes (no-op if unavailable)
  for inspecting the hot loop in a TPU profile.
- ``nan_guard``: context toggling ``jax_debug_nans`` (the race/sanitizer
  analogue for this numeric workload).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp


def sync(tree: Any) -> None:
    """Barrier: force completion of every array in the pytree."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype"):
            # materializing one element is enough to drain the dependency
            # chain; block_until_ready alone is unreliable on async tunnels
            jnp.asarray(leaf).flatten()[0].item()


class Timer:
    """with Timer("energy step") as t: ... ; t.elapsed"""

    def __init__(self, label: str = "", verbose: bool = False):
        self.label = label
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        if self.verbose:
            print(f"[timer] {self.label}: {self.elapsed * 1e3:.2f} ms")
        return False


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1, **kw):
    """Time a (usually jitted) function with correct synchronization.
    Returns seconds per call."""
    for _ in range(warmup):
        sync(fn(*args, **kw))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace_annotation(name: str):
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


@contextlib.contextmanager
def nan_guard(enabled: bool = True):
    """Enable jax_debug_nans within a scope (fails fast on NaN energies)."""
    prev = jax.config.jax_debug_nans
    try:
        jax.config.update("jax_debug_nans", enabled)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
