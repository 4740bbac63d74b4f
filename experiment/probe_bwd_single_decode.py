"""Measure the single-decode backward restructure on the real TPU.

Before (two-decode backward, measured 2026-08-21 pre-restructure,
experiment/step_decomposition.json at commit 52cc23b..): the backward
kernels decoded every decoder TWICE per chunk — once for the ensemble/
gathered forward quantities (xbar / selected endpoints) over halo rows,
once more for the activations the cotangent chain needs.  True pass count
2*n_pass + chain; measured grad-alone walls:

    f32x2: expected 8.52 ms / mc 8.90 ms     (occupancy @5 passes: 0.78)
    f32x3: expected 11.28 ms / mc 12.42 ms   (occupancy @7 passes: 0.83)
    float32: expected 27.02 ms / mc 29.35 ms (occupancy @18 passes: 0.89)

After: pass 1 keeps each decoder's center-row outputs (expected mode) and
hidden-layer ReLU masks (bf16); pass 2 re-evaluates only the first (VPU)
layer — n_pass + chain passes.  Bound: 5/3 = 1.67x (f32x2), 7/4 = 1.75x
(f32x3), 18/12 = 1.5x (float32).  Gradients bit-identical (same dots, same
operands — tests/test_optimize.py::test_gradonly_grad_bitwise...).

This probe measures the AFTER: grad-alone kernel walls and the production
``_optimize_scan`` steps/s per rung, writing
experiment/bwd_single_decode_probe.json with both sides.
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

from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
from vae_latent_geometry_tpu.geometry.spline import design_matrix, eval_spline_design
from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
from vae_latent_geometry_tpu.ops.energy_pallas import energy_expected_fused
from vae_latent_geometry_tpu.ops.energy_mc_pallas import energy_mc_fused_rng
from vae_latent_geometry_tpu.optim.geodesic import _optimize_scan
from vae_latent_geometry_tpu.utils.profiling import sync

B, T, STEPS, REPS = 200, 2000, 60, 40
MXU_DOTS = 10 * T * B * (2 * 128 * 128 + 2 * 128 * 128)

BEFORE = {  # committed pre-restructure hardware numbers (docstring above)
    "f32x2": {"expected_grad_ms": 8.523, "mc_grad_ms": 8.899,
              "steps_per_sec": {"expected_fused": 119.37, "mc_fused": 112.46}},
    "f32x3": {"expected_grad_ms": 11.276, "mc_grad_ms": 12.419,
              "steps_per_sec": {"expected_fused": 88.29, "mc_fused": 80.59}},
    "float32": {"expected_grad_ms": 27.017, "mc_grad_ms": 29.346,
                "steps_per_sec": {"mc_fused": 34.09}},
}

params = load_evae_checkpoint("/root/reference/experiment/model_seed12.pt")
decoders = jax.tree_util.tree_map(jnp.asarray, params.decoders)
rng = np.random.default_rng(12)
omega0 = jnp.asarray(rng.normal(size=(B, 5, 2)) * 0.01, jnp.float32)
a = jnp.asarray(rng.normal(size=(B, 2)) * 1.5, jnp.float32)
b = jnp.asarray(rng.normal(size=(B, 2)) * 1.5, jnp.float32)
basis = jnp.asarray(nullspace_basis(4)[0])
t = jnp.linspace(0.0, 1.0, T)
phi = design_matrix(t, basis, 4)
gamma = jax.jit(lambda om: eval_spline_design(om, a, b, phi, t))(omega0)
sync(gamma)
kmax = jnp.full((1, B), 10.0, jnp.float32)
seed = jnp.zeros((1,), jnp.int32)


def timeit(fn, *args):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / REPS


def steps_per_sec(mode, precision):
    cfg = GeodesicConfig(
        steps=STEPS, lr=1e-3,
        energy=EnergyConfig(num_t=T, mode=mode, mc_samples=2,
                            kernel_precision=precision))
    args = (decoders, omega0, a, b, basis, jax.random.PRNGKey(0), cfg)
    out = _optimize_scan(*args)
    sync(out[1])
    t0 = time.perf_counter()
    out = _optimize_scan(*args)
    sync(out[1])
    return STEPS / (time.perf_counter() - t0)


def main():
    results = {}
    for prec, n_pass in (("f32x2", 2), ("f32x3", 3), ("float32", 6)):
        chain = 1 if prec != "float32" else 6
        gr = jax.jit(jax.grad(lambda g, p=prec: jnp.sum(
            energy_expected_fused(decoders, g, None, p))))
        tg = timeit(gr, gamma)
        gr_mc = jax.jit(jax.grad(lambda g, p=prec: jnp.sum(
            energy_mc_fused_rng(decoders, g, seed, kmax, 2, p))))
        tg_mc = timeit(gr_mc, gamma)
        row = {
            "expected_grad_ms": round(tg * 1e3, 3),
            "mc_grad_ms": round(tg_mc * 1e3, 3),
            "expected_grad_speedup_vs_before": round(
                BEFORE[prec]["expected_grad_ms"] / (tg * 1e3), 3),
            "mc_grad_speedup_vs_before": round(
                BEFORE[prec]["mc_grad_ms"] / (tg_mc * 1e3), 3),
            "expected_grad_mxu_occupancy": round(
                (MXU_DOTS * (n_pass + chain) / tg) / 197e12, 3),
            "steps_per_sec": {},
        }
        print(f"[bwd-probe] {prec}: expected grad {tg*1e3:.2f} ms "
              f"({row['expected_grad_speedup_vs_before']}x), mc grad "
              f"{tg_mc*1e3:.2f} ms ({row['mc_grad_speedup_vs_before']}x)",
              flush=True)
        for mode in (("expected_fused", "mc_fused") if prec != "float32"
                     else ("mc_fused",)):
            sps = steps_per_sec(mode, prec)
            row["steps_per_sec"][mode] = round(sps, 2)
            before_sps = BEFORE[prec]["steps_per_sec"].get(mode)
            rel = f" ({sps / before_sps:.2f}x)" if before_sps else ""
            print(f"[bwd-probe] {prec} {mode}: {sps:.1f} steps/s{rel}",
                  flush=True)
        results[prec] = row
        with open(os.path.join(REPO, "experiment",
                               "bwd_single_decode_probe.json"), "w") as f:
            json.dump({
                "workload": f"B={B},T={T},Mdec=10; grad = d/d gamma (bwd "
                            "kernel alone); steps/s = production "
                            "_optimize_scan",
                "change": "backward kernels restructured to a SINGLE decode "
                          "per decoder per chunk: pass 1 keeps center-row "
                          "outputs (expected) + hidden ReLU masks (bf16); "
                          "pass 2 recomputes only the first (VPU) layer. "
                          "2*n_pass+chain -> n_pass+chain MXU passes.",
                "before_two_decode": BEFORE,
                "after_single_decode": results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
