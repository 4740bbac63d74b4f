"""First-class multi-host (multi-process) execution.

The reference has no distributed backend at all (SURVEY §2.9: zero
torch.distributed/NCCL/MPI usage).  On TPU, a v4-8 slice is sometimes one
host and sometimes several; the framework must run the SAME sharded
programs (``parallel/shard.py``) unchanged either way.  This module is the
thin layer that makes that true:

- :func:`init_multihost` — process-group bring-up (``jax.distributed``),
  with env/pod autodetection so a pod launcher needs zero extra flags.
- :func:`is_primary` — process-0 predicate for artifact/checkpoint write
  discipline (every process computes, exactly one persists).
- :func:`put_global` — commit a host-local (replicated-content) numpy array
  to a global sharding.  Single-process: a plain ``device_put``.
  Multi-process: ``jax.make_array_from_process_local_data`` with an
  explicit ``global_shape`` — without it each process's full copy would be
  treated as its process-local SHARD and the assembled array would be
  silently 2x the intended size with duplicated content (a doubled
  workload that still passes every finite-ness check; found the hard way,
  ``experiment/multihost_dryrun.py``).
- :func:`gather_global` — bring a (possibly non-addressable-sharded) array
  fully to the local host, so the process-0 artifact writer can read
  results computed by every process.

Collectives cross the process boundary over DCN (or ICI on a pod slice);
nothing else in the framework changes — mesh axes, shardings, kernels and
recipes are identical to the single-host path.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> tuple[int, int]:
    """Initialize the JAX process group; returns (process_index, count).

    Argument resolution, in priority order:
    1. explicit arguments;
    2. ``VLG_COORDINATOR`` / ``VLG_NUM_PROCESSES`` / ``VLG_PROCESS_ID``
       environment variables (set by a generic launcher);
    3. none of the above — ``jax.distributed.initialize()`` with no
       arguments, which autodetects on TPU pods (and on single-process
       runs raises; that case is caught and treated as a 1-process group).

    Safe to call twice (a second call is a no-op) so a CLI flag and a
    library caller can both request it.
    """
    # NOTE: the idempotence check must NOT touch jax.process_count() — that
    # initializes the XLA backend, after which jax.distributed.initialize
    # refuses to run at all
    if jax.distributed.is_initialized():
        return jax.process_index(), jax.process_count()
    coordinator_address = coordinator_address or os.environ.get(
        "VLG_COORDINATOR")
    if num_processes is None and "VLG_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["VLG_NUM_PROCESSES"])
    if process_id is None and "VLG_PROCESS_ID" in os.environ:
        process_id = int(os.environ["VLG_PROCESS_ID"])
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            # TPU-pod autodetection path; raises on a plain single host
            jax.distributed.initialize()
    except (RuntimeError, ValueError) as e:
        if coordinator_address is not None or num_processes not in (None, 1):
            # an explicit multi-process request (a coordinator was named, or
            # a process count > 1) failed — surface it.  Silently degrading
            # to single-process here would leave THIS process computing
            # alone and writing artifacts as a second "primary" while the
            # real process 0 hangs at the coordinator barrier.
            raise
        # no-argument autodetect on a plain single host: distributed
        # bring-up is genuinely optional there
        import warnings

        warnings.warn(f"multihost init skipped ({e}); continuing "
                      "single-process", stacklevel=2)
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the process that owns artifact/checkpoint writes."""
    return jax.process_index() == 0


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def put_global(x, sharding):
    """Commit host-local array ``x`` (same content on every process) to a
    global ``sharding`` — multi-host-safe ``device_put``."""
    if jax.process_count() == 1:
        return jax.device_put(jax.numpy.asarray(x), sharding)
    x = np.asarray(x)
    return jax.make_array_from_process_local_data(sharding, x,
                                                  global_shape=x.shape)


def gather_global(x) -> np.ndarray:
    """Fetch a global array to host memory on EVERY process.

    Fully-addressable arrays (single process, or replicated outputs) are a
    plain device_get; otherwise an all-gather over the process group brings
    the non-addressable shards home (``multihost_utils.process_allgather``
    with tiled=True reassembles the logical array instead of stacking)."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
