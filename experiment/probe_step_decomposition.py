"""Decompose the production optimization step's wall time on the real TPU.

Context (experiment/gradonly_probe.json): XLA dead-code-eliminates the
unused forward kernel in the production scan, so a step = backward kernel
(activation recompute + cotangent chain) + spline eval + penalty + Adam.
The corrected pass model puts MXU occupancy at ~43-54% — this probe
measures where the rest of the step goes:

  fwd_only   — jit(sum(energy_fused(gamma)))            [value consumed]
  grad_only  — jit(grad of sum energy w.r.t. GAMMA)     [bwd kernel alone]
  full_step  — one Adam step from the production scan   [probe_gradonly]

step - grad_only ~= spline eval + penalty + Adam + scan overhead; the
fwd/bwd kernel times against their pass-model FLOPs localize in-kernel
(VPU/DMA) waste.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
from vae_latent_geometry_tpu.geometry.spline import design_matrix, eval_spline_design
from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
from vae_latent_geometry_tpu.ops.energy_pallas import energy_expected_fused
from vae_latent_geometry_tpu.ops.energy_mc_pallas import energy_mc_fused_rng
from vae_latent_geometry_tpu.utils.profiling import sync

B, T, REPS = 200, 2000, 40
params = load_evae_checkpoint("/root/reference/experiment/model_seed12.pt")
decoders = jax.tree_util.tree_map(jnp.asarray, params.decoders)
rng = np.random.default_rng(12)
omega = jnp.asarray(rng.normal(size=(B, 5, 2)) * 0.01, jnp.float32)
a = jnp.asarray(rng.normal(size=(B, 2)) * 1.5, jnp.float32)
b = jnp.asarray(rng.normal(size=(B, 2)) * 1.5, jnp.float32)
basis = jnp.asarray(nullspace_basis(4)[0])
t = jnp.linspace(0.0, 1.0, T)
phi = design_matrix(t, basis, 4)
gamma = jax.jit(lambda om: eval_spline_design(om, a, b, phi, t))(omega)
sync(gamma)
kmax = jnp.full((1, B), 10.0, jnp.float32)
seed = jnp.zeros((1,), jnp.int32)

# single-pass lane-padded MXU FLOPs of one full decode (fwd), see bench.py
MXU_DOTS = 10 * T * B * (2 * 128 * 128 + 2 * 128 * 128)


def timeit(fn, *args):
    out = fn(*args)
    sync(out)
    # scan REPS executions inside one jit would change the program; instead
    # loop host-side — per-dispatch tunnel latency is hidden by async
    # dispatch as long as we only sync once at the end
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / REPS


def main():
    results = {}
    for prec, n_pass in (("f32x2", 2), ("f32x3", 3), ("float32", 6)):
        chain = 1 if prec in ("f32x2", "f32x3") else 6

        fwd = jax.jit(lambda g, p=prec: jnp.sum(
            energy_expected_fused(decoders, g, None, p)))
        tf = timeit(fwd, gamma)

        gr = jax.jit(jax.grad(lambda g, p=prec: jnp.sum(
            energy_expected_fused(decoders, g, None, p))))
        tg = timeit(gr, gamma)

        fwd_mc = jax.jit(lambda g, p=prec: jnp.sum(
            energy_mc_fused_rng(decoders, g, seed, kmax, 2, p)))
        tf_mc = timeit(fwd_mc, gamma)
        gr_mc = jax.jit(jax.grad(lambda g, p=prec: jnp.sum(
            energy_mc_fused_rng(decoders, g, seed, kmax, 2, p))))
        tg_mc = timeit(gr_mc, gamma)

        def mxu_frac(ms, passes):
            return (MXU_DOTS * passes / (ms * 1e-3)) / 197e12

        results[prec] = {
            "expected_fwd_ms": round(tf * 1e3, 3),
            "expected_grad_ms": round(tg * 1e3, 3),
            "mc_fwd_ms": round(tf_mc * 1e3, 3),
            "mc_grad_ms": round(tg_mc * 1e3, 3),
            "expected_fwd_mxu_occupancy": round(mxu_frac(tf * 1e3, n_pass), 3),
            "expected_grad_mxu_occupancy": round(
                mxu_frac(tg * 1e3, n_pass + chain), 3),
            "mc_grad_mxu_occupancy": round(
                mxu_frac(tg_mc * 1e3, n_pass + chain), 3),
        }
        print(f"[decomp] {prec}: exp fwd {tf*1e3:.2f} ms / grad {tg*1e3:.2f} "
              f"ms;  mc fwd {tf_mc*1e3:.2f} ms / grad {tg_mc*1e3:.2f} ms",
              flush=True)
        with open(os.path.join(OUT := os.path.join(REPO, "experiment"),
                               "step_decomposition.json"), "w") as f:
            json.dump({
                "workload": f"B={B},T={T},Mdec=10; grad is d/d gamma "
                            "(bwd kernel alone, no spline/Adam)",
                "mxu_occupancy_model": "MXU_DOTS*passes / wall / 197e12 "
                                       "(v5e bf16 peak); fwd=n_pass, "
                                       "grad=n_pass+chain",
                "note": "production full step (incl. spline eval + Adam + "
                        "scan) timed separately in gradonly_probe.json",
                "results": results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
