"""Probe: measure the grad-only trajectory path (EnergyConfig.gradonly_traj)
against the value_and_grad path on the real TPU at the reference workload.

The fused kernels' custom-VJP residuals are the INPUTS alone (the backward
recomputes activations), so skipping the forward kernel on trajectory steps
whose energy value is discarded leaves gradients identical while removing
n_pass of the 2*n_pass+chain MXU passes per step.  This measures whether
XLA was already DCE-ing the dead forward pallas-call (no win) or not (the
pass-model predicts 1.5-1.75x).

Both arms run ``optim.geodesic._optimize_scan`` (the production program).
"""
from __future__ import annotations

import dataclasses
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
from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
from vae_latent_geometry_tpu.optim.geodesic import _optimize_scan
from vae_latent_geometry_tpu.utils.profiling import sync

B, T, STEPS = 200, 2000, 60
params = load_evae_checkpoint("/root/reference/experiment/model_seed12.pt")
decoders = jax.tree_util.tree_map(jnp.asarray, params.decoders)
rng = np.random.default_rng(12)
omega0 = jnp.asarray(rng.normal(size=(B, 5, 2)) * 0.01, jnp.float32)
a = jnp.asarray(rng.normal(size=(B, 2)) * 1.5, jnp.float32)
b = jnp.asarray(rng.normal(size=(B, 2)) * 1.5, jnp.float32)
basis = jnp.asarray(nullspace_basis(4)[0])


def bench(mode: str, precision: str, gradonly: bool) -> float:
    cfg = GeodesicConfig(
        steps=STEPS, lr=1e-3,
        energy=EnergyConfig(num_t=T, mode=mode, mc_samples=2,
                            kernel_precision=precision,
                            gradonly_traj=gradonly))
    args = (decoders, omega0, a, b, basis, jax.random.PRNGKey(0), cfg)
    out = _optimize_scan(*args)
    sync(out[1])
    t0 = time.perf_counter()
    out = _optimize_scan(*args)
    sync(out[1])
    return STEPS / (time.perf_counter() - t0)


def main():
    results = {}
    configs = [("expected_fused", "f32x2"), ("mc_fused", "f32x3"),
               ("expected_fused", "f32x3"), ("mc_fused", "f32x2"),
               ("mc_fused", "float32")]
    for mode, precision in configs:
        key = f"{mode}_{precision}"
        kv = bench(mode, precision, False)
        print(f"[probe] {key} value_and_grad: {kv:.1f} steps/s", flush=True)
        kg = bench(mode, precision, True)
        print(f"[probe] {key} grad-only:      {kg:.1f} steps/s "
              f"({kg / kv:.2f}x)", flush=True)
        results[key] = {"value_and_grad_steps_per_sec": round(kv, 2),
                        "gradonly_steps_per_sec": round(kg, 2),
                        "speedup": round(kg / kv, 3)}
        with open(os.path.join(REPO, "experiment",
                               "gradonly_probe.json"), "w") as f:
            json.dump({
                "workload": f"B={B},T={T},Mdec=10,steps={STEPS}, production "
                            "_optimize_scan (incl. one exact final eval)",
                "question": "does skipping the fused fwd kernel on "
                            "value-discarding trajectory steps "
                            "(EnergyConfig.gradonly_traj) speed up the "
                            "production scan?",
                "pass_model_prediction": {
                    "f32x3": "7->4 passes, 1.75x bound",
                    "f32x2": "5->3 passes, 1.67x bound",
                    "float32": "18->12 passes, 1.5x bound"},
                "results": results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
