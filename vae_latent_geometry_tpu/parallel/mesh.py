"""Device-mesh construction and sharding helpers.

The reference has no distributed backend at all (grep confirms zero
torch.distributed/NCCL/MPI usage; its only parallelism is batching splines on
one GPU — SURVEY §2.9).  The TPU-native scaling model is:

- mesh axes: ``dp`` shards the *pair/batch* axis (data parallel), ``ep``
  shards the *decoder-ensemble* axis (expert parallel).  TP/PP are
  intentionally out of scope at this model scale (~280k params).
- collectives are implicit: jit + ``NamedSharding`` annotations let GSPMD
  insert the psum/all_gather over ICI (grad all-reduce for dp training,
  ensemble-mean reductions for ep energies).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts (mesh axes laid out over ICI before DCN by
``mesh_utils.create_device_mesh``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, ep: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('dp', 'ep') mesh over the available devices.

    dp defaults to n_devices // ep.  Uses ``mesh_utils.create_device_mesh``
    so the dp axis rides the fastest ICI dimension on real TPU topologies.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % ep != 0:
            raise ValueError(f"{n} devices not divisible by ep={ep}")
        dp = n // ep
    if dp * ep > n:
        raise ValueError(
            f"mesh dp={dp} x ep={ep} needs {dp * ep} devices but only {n} "
            f"are visible ({devices[0].platform}); for CPU testing set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N before "
            "backend init")
    if dp * ep != n:
        devices = devices[: dp * ep]
    try:
        dev_array = mesh_utils.create_device_mesh(
            (dp, ep), devices=np.asarray(devices)
        )
    except (ValueError, AssertionError):
        dev_array = np.asarray(devices).reshape(dp, ep)
    return Mesh(dev_array, axis_names=("dp", "ep"))


def named_sharding(mesh: Mesh, *axes: Optional[str]) -> NamedSharding:
    """NamedSharding with the given axis names per dimension (None =
    replicated dimension)."""
    return NamedSharding(mesh, P(*axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad axis 0 of x up to a multiple (edge-replication padding keeps all
    computation finite); returns (padded, original_length)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_idx = np.concatenate([np.arange(n), np.full(rem, n - 1)])
    return np.take(x, pad_idx, axis=axis), n
