"""Kernel ladder profiler: steps/s per energy mode at the reference workload
(B=200, T=2000, 10 decoders, MC=2) on the default device, plus component
timings (index sampling).  Writes experiment/kernel_ladder.json.

Usage: python experiment/profile_kernels.py [mode ...]
(default: expected_fused mc_fused mc expected)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B, T, M_DEC, MC, STEPS = 200, 2000, 10, 2, 60


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
    from vae_latent_geometry_tpu.optim.geodesic import _optimize_scan

    params = load_evae_checkpoint("/root/reference/experiment/model_seed12.pt")
    decoders = jax.tree_util.tree_map(jnp.asarray, params.decoders)

    rng = np.random.default_rng(12)
    omega = jnp.asarray(rng.normal(size=(B, 5, 2)) * 0.01, jnp.float32)
    a = jnp.asarray(rng.normal(size=(B, 2)) * 1.5, jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)) * 1.5, jnp.float32)
    basis, _ = nullspace_basis(4)
    basis = jnp.asarray(basis)

    modes = sys.argv[1:] or ["expected_fused", "mc_fused", "mc", "expected"]
    results = {}
    for mode in modes:
        cfg = GeodesicConfig(steps=STEPS, lr=1e-3,
                             energy=EnergyConfig(num_t=T, mode=mode,
                                                 mc_samples=MC))
        args = (decoders, omega, a, b, basis, jax.random.PRNGKey(0), cfg)
        t0 = time.perf_counter()
        out = _optimize_scan(*args)
        _sync(out[1])
        compile_s = time.perf_counter() - t0
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            out = _optimize_scan(*args)
            _sync(out[1])
            best = max(best, STEPS / (time.perf_counter() - t0))
        results[mode] = {"steps_per_sec": round(best, 2),
                         "first_call_s": round(compile_s, 1)}
        print(f"[{mode}] {best:.1f} steps/s (first call {compile_s:.0f}s)",
              flush=True)

    # forward-only throughput of the fused kernels (isolates bwd cost)
    if os.environ.get("PROFILE_FWD", "1") == "1":
        from vae_latent_geometry_tpu.geometry.spline import (
            design_matrix,
            eval_spline_design,
        )
        from vae_latent_geometry_tpu.ops.energy_mc_pallas import (
            energy_mc_fused,
            sample_decoder_indices,
        )
        from vae_latent_geometry_tpu.ops.energy_pallas import (
            energy_expected_fused,
        )

        t_lin = jnp.linspace(0.0, 1.0, T)
        phi = design_matrix(t_lin, basis, 4)
        gamma = eval_spline_design(omega, a, b, phi, t_lin)

        # per-iteration perturbations defeat loop-invariant code motion (a
        # constant body would let XLA hoist the kernel out of the scan)
        eps = jnp.arange(STEPS, dtype=jnp.float32) * 1e-12

        @jax.jit
        def fwd_mc(key):
            def body(acc, xs):
                k, e = xs
                d1, d2 = sample_decoder_indices(k, T, B, M_DEC, MC)
                return acc + jnp.sum(
                    energy_mc_fused(decoders, gamma + e, d1, d2)), None
            s, _ = jax.lax.scan(body, 0.0,
                                (jax.random.split(key, STEPS), eps))
            return s

        @jax.jit
        def fwd_exp(key):
            def body(acc, e):
                return acc + jnp.sum(
                    energy_expected_fused(decoders, gamma + e)), None
            s, _ = jax.lax.scan(body, 0.0, eps)
            return s

        for name, fn in (("mc_fused_fwdonly", fwd_mc),
                         ("expected_fused_fwdonly", fwd_exp)):
            _sync(fn(jax.random.PRNGKey(0)))
            t0 = time.perf_counter()
            _sync(fn(jax.random.PRNGKey(1)))
            dt = time.perf_counter() - t0
            results[name] = {"steps_per_sec": round(STEPS / dt, 2)}
            print(f"[{name}] {STEPS / dt:.1f} calls/s "
                  f"({1000 * dt / STEPS:.2f} ms/call)", flush=True)

    # component: decoder-index sampling alone (per optimizer step cost)
    from vae_latent_geometry_tpu.ops.energy_mc_pallas import (
        sample_decoder_indices,
    )

    @jax.jit
    def sample_many(key):
        def body(c, k):
            d1, d2 = sample_decoder_indices(k, T, B, M_DEC, MC)
            return c + jnp.sum(d1[:, 0, 0] + d2[:, 0, 0]), None

        keys = jax.random.split(key, STEPS)
        s, _ = jax.lax.scan(body, jnp.int32(0), keys)
        return s

    _sync(sample_many(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    _sync(sample_many(jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0
    results["index_sampling_ms_per_step"] = round(1000 * dt / STEPS, 3)
    print(f"[indices] {1000 * dt / STEPS:.2f} ms/step", flush=True)

    out_path = os.path.join(REPO, "experiment", "kernel_ladder.json")
    with open(out_path, "w") as f:
        json.dump({"workload": f"B={B},T={T},Mdec={M_DEC},MC={MC}",
                   "device": str(jax.devices()[0]), **results}, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
