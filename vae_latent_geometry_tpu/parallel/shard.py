"""Sharded execution of the framework's two big workloads.

1. ``sharded_optimize_splines`` — geodesic optimization with the pair axis
   sharded over ``dp`` and the decoder-ensemble axis over ``ep``.  The jitted
   scan is *the same program* as the single-device path
   (``optim/geodesic._optimize_scan``); GSPMD partitions it from the input
   shardings (pairs never communicate; ep contributions meet in psums
   inserted at the ensemble reductions).
2. ``sharded_train_step`` — EVAE training step with the batch dp-sharded and
   decoders ep-sharded; gradient all-reduce is GSPMD-inserted.

Pairs are padded to a multiple of the dp size with edge replication
(static shapes; padding is dropped on the way out).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from vae_latent_geometry_tpu.config import GeodesicConfig, ModelConfig
from vae_latent_geometry_tpu.models import evae as evae_lib
from vae_latent_geometry_tpu.optim.geodesic import GeodesicResult, _optimize_scan
from vae_latent_geometry_tpu.parallel.mesh import (
    named_sharding,
    pad_to_multiple,
    replicated,
)
from vae_latent_geometry_tpu.parallel.multihost import gather_global, put_global


def _shard_decoders(decoders, mesh: Mesh):
    """Shard the leading (ensemble) axis of every decoder leaf over 'ep'."""
    ep = mesh.shape["ep"]
    m_dec = jax.tree_util.tree_leaves(decoders)[0].shape[0]
    spec = named_sharding(mesh, "ep") if m_dec % ep == 0 else replicated(mesh)

    def put(x):
        sh = spec if x.shape[0] % ep == 0 else replicated(mesh)
        return put_global(x, sh)

    return jax.tree_util.tree_map(put, decoders)


def sharded_optimize_splines(
    decoders, omega0, a, b, basis, cfg: GeodesicConfig, mesh: Mesh,
    key=None, num_active=None,
) -> GeodesicResult:
    """Drop-in sharded version of ``optim.geodesic.optimize_splines``.

    XLA energy modes partition via GSPMD (pairs over 'dp', ensemble over
    'ep').  Fused Pallas modes cannot be GSPMD-partitioned (custom calls), so
    they run under ``shard_map`` over 'dp' with the decoder weights
    replicated per device (~1 MB — exactly the kernel's design point).
    """
    if cfg.early_stop:
        # the while-loop early-stopping optimizer is single-device; running
        # the fixed-step scan here instead would silently change the
        # returned omega/energy semantics (no best-restore, no convergence
        # exit) — refuse at THIS public entry, not only in the pipeline
        # wrapper above it
        raise ValueError(
            "early_stop is not supported on a sharded (mesh) run: the "
            "while-loop optimizer is single-device — drop early_stop "
            "(fixed steps and the phase_plan recipes shard fine) or run "
            "without a mesh")
    if key is None:
        key = jax.random.PRNGKey(0)
    dp = mesh.shape["dp"]
    omega0, n = pad_to_multiple(np.asarray(omega0), dp)
    a, _ = pad_to_multiple(np.asarray(a), dp)
    b, _ = pad_to_multiple(np.asarray(b), dp)
    if num_active is not None:
        num_active, _ = pad_to_multiple(np.asarray(num_active), dp)

    fused = "fused" in cfg.energy.mode
    batch_sh = named_sharding(mesh, "dp")
    omega0 = put_global(omega0, batch_sh)
    a = put_global(a, batch_sh)
    b = put_global(b, batch_sh)
    if num_active is not None:
        num_active = put_global(num_active, batch_sh)
    basis = put_global(np.asarray(basis), replicated(mesh))

    if fused:
        import dataclasses as _dc

        from jax.sharding import PartitionSpec as P

        ep = mesh.shape.get("ep", 1)
        m_dec = jax.tree_util.tree_leaves(decoders)[0].shape[0]
        # expert parallelism on the fast path: when the decoder-ensemble axis
        # divides over 'ep', each ep shard holds a decoder subset and the
        # fused stats kernel + psum assemble the energy
        # (ops/energy_pallas.energy_expected_sharded); MC-sampled fused modes
        # keep decoders replicated (their per-segment decoder gathers do not
        # decompose into per-shard sufficient statistics).
        use_ep = (ep > 1 and m_dec % ep == 0
                  and cfg.energy.mode.startswith("expected_fused"))
        if use_ep:
            cfg = _dc.replace(cfg, energy=_dc.replace(cfg.energy,
                                                      ep_axis="ep"))
            dec_spec = P("ep")
            decoders = jax.tree_util.tree_map(
                lambda x: put_global(x, named_sharding(mesh, "ep")),
                decoders)
        else:
            dec_spec = P()
            decoders = jax.tree_util.tree_map(
                lambda x: put_global(x, replicated(mesh)),
                decoders)
        dp_spec = P("dp")
        rep = P()
        has_na = num_active is not None

        def per_shard(dec, om, a_, b_, bas, *na):
            shard_key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
            om_out, e_out, _ = _optimize_scan(
                dec, om, a_, b_, bas, shard_key, cfg, False,
                na[0] if na else None)
            return om_out, e_out

        in_specs = (dec_spec, dp_spec, dp_spec, dp_spec, rep) + (
            (dp_spec,) if has_na else ())
        fn = jax.shard_map(
            per_shard, mesh=mesh, in_specs=in_specs,
            out_specs=(dp_spec, dp_spec), check_vma=False,
        )
        args = (decoders, omega0, a, b, basis) + (
            (num_active,) if has_na else ())
        omega, e_final = fn(*args)
    else:
        decoders = _shard_decoders(decoders, mesh)
        with mesh:
            omega, e_final, _ = _optimize_scan(
                decoders, omega0, a, b, basis, key, cfg, False, num_active
            )
    if jax.process_count() > 1:
        # multi-host: the outputs' dp shards span processes — eager slicing
        # and device_get cannot touch non-addressable shards, so reassemble
        # the logical arrays on every host (one all-gather over the process
        # group), then trim the padding.  This trades the single-host
        # enqueue-then-collect pipelining for correctness; per-chunk gathers
        # of (B, K, D) + (B,) arrays are a few KB over DCN.
        omega = jnp.asarray(gather_global(omega)[:n])
        e_final = jnp.asarray(gather_global(e_final)[:n])
        return GeodesicResult(omega=omega, energy=e_final,
                              lengths=jnp.sqrt(e_final))
    # trim the dp padding ON DEVICE and return device arrays: np.asarray
    # here would force a host sync per call, serializing the multi-chunk
    # enqueue-then-collect pipeline in pipeline/optimize_stage.py (callers
    # device_get when they actually need the values)
    omega = omega[:n]
    e_final = e_final[:n]
    return GeodesicResult(omega=omega, energy=e_final,
                          lengths=jnp.sqrt(e_final))


@partial(jax.jit, static_argnames=("model_cfg", "opt_name"), donate_argnums=(0, 1))
def _train_step(params, opt_state, key, x, model_cfg: ModelConfig,
                opt_name: str = "adam", lr: float = 1e-3):
    opt = getattr(optax, opt_name)(lr)
    loss, grads = jax.value_and_grad(
        lambda p: evae_lib.neg_elbo(p, key, x, model_cfg)
    )(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def sharded_train_step(params, opt_state, key, batch, mesh: Mesh,
                       model_cfg: ModelConfig = ModelConfig(), lr: float = 1e-3):
    """One dp x ep-sharded EVAE train step.

    Batch rows shard over 'dp'; the decoder stack shards over 'ep'; the
    encoder and all optimizer state stay replicated.  The gradient
    all-reduce over dp and the ensemble gather for the per-step random
    decoder are inserted by GSPMD.
    """
    batch = put_global(batch, named_sharding(mesh, "dp"))
    dec_sharded = _shard_decoders(params.decoders, mesh)
    params = evae_lib.EVAEParams(
        encoder=jax.tree_util.tree_map(
            lambda x: put_global(x, replicated(mesh)),
            params.encoder),
        decoders=dec_sharded,
    )
    with mesh:
        return _train_step(params, opt_state, key, batch, model_cfg, "adam", lr)
