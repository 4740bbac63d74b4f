"""Profile the mc_fused <-> expected_fused kernel gap (verdict item 5).

BENCH_r03 ladder: mc_fused 76-80 steps/s vs expected_fused ~88 at the
reference workload (B=200, T=2000, M=10, S=2, f32x3).  Hypothesis: the gap
is the sampled estimator's per-decoder select/accumulate VPU work (2*S
masked (Tc,B,X) accumulations per decoder per chunk vs the stats form's 2)
plus the d1/d2 carry machinery.  This probe decomposes it by ABLATION on
hardware — same jitted value_and_grad timing harness for:

- expected_fused            (stats form, the 2-accum baseline)
- mc_fused_rng S=2          (the production sampled path)
- mc_fused_rng S=1          (halves the select/accum and carry work;
                             if the gap ~halves, selects dominate)
- mc_fused extidx S=2       (host-generated indices: isolates in-kernel
                             draw generation, ~0 expected after the RBG fix)

plus optimization steps/s through _optimize_scan for the same rungs, and a
jax.profiler trace of one step of each (committed alongside for manual
inspection).  Writes experiment/mc_gap_profile.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
from vae_latent_geometry_tpu.geometry.spline import design_matrix, eval_spline_design
from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
from vae_latent_geometry_tpu.ops.energy_mc_pallas import (
    energy_mc_fused,
    energy_mc_fused_rng,
    sample_decoder_indices,
)
from vae_latent_geometry_tpu.ops.energy_pallas import energy_expected_fused
from vae_latent_geometry_tpu.optim.geodesic import _optimize_scan
from vae_latent_geometry_tpu.utils.profiling import sync

OUT = os.path.dirname(os.path.abspath(__file__))
B, T, MDEC = 200, 2000, 10
PREC = "f32x3"
REPS = 30


def curve():
    rng = np.random.default_rng(12)
    omega = jnp.asarray(rng.normal(size=(B, 5, 2)) * 0.01, jnp.float32)
    a = jnp.asarray(rng.normal(size=(B, 2)) * 1.5, jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)) * 1.5, jnp.float32)
    basis, _ = nullspace_basis(4)
    t = jnp.linspace(0.0, 1.0, T)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    return eval_spline_design(omega, a, b, phi, t)


def time_fn(f, *args):
    out = f(*args)          # compile + warm
    sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / REPS * 1e3  # ms per call


def main():
    params = load_evae_checkpoint(
        "/root/reference/experiment/model_seed12.pt")
    dec = jax.tree_util.tree_map(jnp.asarray, params.decoders)
    g = curve()
    kmax = jnp.full((1, B), float(MDEC), jnp.float32)
    seed = jnp.asarray([7], jnp.int32)
    d1, d2 = sample_decoder_indices(jax.random.PRNGKey(3), T, B, MDEC, 2)

    vg = {}
    vg["expected_fused"] = jax.jit(jax.value_and_grad(
        lambda gg: energy_expected_fused(dec, gg, None, PREC).sum()))
    vg["mc_rng_S2"] = jax.jit(jax.value_and_grad(
        lambda gg: energy_mc_fused_rng(dec, gg, seed, kmax, 2, PREC).sum()))
    vg["mc_rng_S1"] = jax.jit(jax.value_and_grad(
        lambda gg: energy_mc_fused_rng(dec, gg, seed, kmax, 1, PREC).sum()))
    vg["mc_extidx_S2"] = jax.jit(jax.value_and_grad(
        lambda gg: energy_mc_fused(dec, gg, d1, d2, PREC).sum()))

    kernel_ms = {}
    for name, f in vg.items():
        kernel_ms[name] = round(time_fn(f, g), 3)
        print(f"[energy+grad] {name}: {kernel_ms[name]} ms", flush=True)

    # one profiled step per variant for manual trace inspection
    trace_dir = os.path.join(OUT, "mc_gap_traces")
    os.makedirs(trace_dir, exist_ok=True)
    for name, f in vg.items():
        with jax.profiler.trace(os.path.join(trace_dir, name)):
            e, gr = f(g)
            sync(e)

    # steps/s through the full optimizer for the same rungs
    def steps_per_sec(mode, mc_samples):
        rng = np.random.default_rng(12)
        omega = jnp.asarray(rng.normal(size=(B, 5, 2)) * 0.01, jnp.float32)
        a = jnp.asarray(rng.normal(size=(B, 2)) * 1.5, jnp.float32)
        bb = jnp.asarray(rng.normal(size=(B, 2)) * 1.5, jnp.float32)
        basis, _ = nullspace_basis(4)
        cfg = GeodesicConfig(steps=60, lr=1e-3, energy=EnergyConfig(
            num_t=T, mode=mode, mc_samples=mc_samples,
            kernel_precision=PREC))
        args = (dec, omega, a, bb, jnp.asarray(basis),
                jax.random.PRNGKey(0), cfg)
        out = _optimize_scan(*args)
        sync(out[1])
        t0 = time.perf_counter()
        out = _optimize_scan(*args)
        sync(out[1])
        return round(60 / (time.perf_counter() - t0), 2)

    sps = {}
    for name, mode, s in (("expected_fused", "expected_fused", 2),
                          ("mc_fused_S2", "mc_fused", 2),
                          ("mc_fused_S1", "mc_fused", 1)):
        sps[name] = steps_per_sec(mode, s)
        print(f"[steps/s] {name}: {sps[name]}", flush=True)

    gap2 = kernel_ms["mc_rng_S2"] - kernel_ms["expected_fused"]
    gap1 = kernel_ms["mc_rng_S1"] - kernel_ms["expected_fused"]
    out = {
        "workload": f"B={B} T={T} M={MDEC} {PREC}, energy+grad ms/call "
                    f"({REPS} reps) and optimizer steps/s, single v5e",
        "energy_grad_ms": kernel_ms,
        "optimizer_steps_per_sec": sps,
        "decomposition": {
            "mc_S2_minus_expected_ms": round(gap2, 3),
            "mc_S1_minus_expected_ms": round(gap1, 3),
            "select_accum_scales_with_S": round(gap2 / max(gap1, 1e-9), 2),
            "inkernel_draws_cost_ms": round(
                kernel_ms["mc_rng_S2"] - kernel_ms["mc_extidx_S2"], 3),
        },
        "traces": "local-only: jax.profiler dumps under experiment/"
                  "mc_gap_traces/<variant>/ are regenerated by "
                  "experiment/profile_mc_gap.py and NOT committed "
                  "(.gitignore); the committed evidence is the "
                  "energy_grad_ms/decomposition tables above",
    }
    path = os.path.join(OUT, "mc_gap_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
