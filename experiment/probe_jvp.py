"""Hardware probe: JVP quadrature-transfer energy — speed ladder.

Round-3 verdict item 1: make the north star's stated energy formulation
(curve energy via decoder JVPs) a first-class production rung.  This probe
measures optimization steps/s of the XLA ``jvp_ensemble`` mode (with
``target_num_t`` rescaling) against the discrete estimators at the
production batch size, across trajectory grid resolutions.  The quality
side (does a coarse JVP trajectory dominate the discrete recipes at full
scale?) is measured by ``regenerate.py`` stage ``jvp_study``.

Writes experiment/jvp_speed_probe.json.
Run on the TPU rig with nothing else on the host (timing methodology:
docs/PERFORMANCE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig  # noqa: E402
from vae_latent_geometry_tpu.geometry.basis import nullspace_basis  # noqa: E402
from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint  # noqa: E402
from vae_latent_geometry_tpu.optim.geodesic import _optimize_scan  # noqa: E402
from vae_latent_geometry_tpu.utils.profiling import sync  # noqa: E402

B = 200
STEPS = 30


def problem():
    rng = np.random.default_rng(12)
    omega = (rng.normal(size=(B, 5, 2)) * 0.01).astype(np.float32)
    a = (rng.normal(size=(B, 2)) * 1.5).astype(np.float32)
    b = (rng.normal(size=(B, 2)) * 1.5).astype(np.float32)
    return jnp.asarray(omega), jnp.asarray(a), jnp.asarray(b)


def main():
    params = load_evae_checkpoint(
        "/root/reference/experiment/model_seed12.pt")
    decoders = jax.tree_util.tree_map(jnp.asarray, params.decoders)
    omega, a, b = problem()
    basis, _ = nullspace_basis(4)
    basis = jnp.asarray(basis)

    rungs = {}
    cases = [
        # (tag, mode, num_t, target_num_t, precision)
        ("expected_fused_T2000", "expected_fused", 2000, None, "f32x3"),
        ("expected_fused_T256", "expected_fused", 256, None, "f32x3"),
        ("expected_xla_T256", "expected", 256, None, "f32x3"),
        ("jvp_ensemble_T512_tgt2000", "jvp_ensemble", 512, 2000, "f32x3"),
        ("jvp_ensemble_T256_tgt2000", "jvp_ensemble", 256, 2000, "f32x3"),
        ("jvp_ensemble_T128_tgt2000", "jvp_ensemble", 128, 2000, "f32x3"),
        ("jvp_ensemble_T64_tgt2000", "jvp_ensemble", 64, 2000, "f32x3"),
        ("expected_rescaled_T256_tgt2000", "expected_rescaled", 256, 2000,
         "f32x3"),
    ]
    for tag, mode, num_t, tgt, prec in cases:
        cfg = GeodesicConfig(
            steps=STEPS, lr=1e-3,
            # keep the final re-eval cheap and identical across rungs so the
            # timing is the scan, not the exact evaluation
            final_energy_mode="expected",
            energy=EnergyConfig(num_t=num_t, mode=mode, target_num_t=tgt,
                                kernel_precision=prec))
        args = (decoders, omega, a, b, basis, jax.random.PRNGKey(0), cfg)
        try:
            t0 = time.perf_counter()
            out = _optimize_scan(*args)
            sync(out[1])
            first = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = _optimize_scan(*args)
            sync(out[1])
            dt = time.perf_counter() - t0
            rungs[tag] = {"steps_per_sec": round(STEPS / dt, 2),
                          "first_invocation_s": round(first, 1)}
            print(f"[jvp-probe] {tag}: {rungs[tag]}", flush=True)
        except Exception as ex:  # pragma: no cover
            rungs[tag] = f"failed: {type(ex).__name__}: {ex}"
            print(f"[jvp-probe] {tag} FAILED {ex}", flush=True)

    out = {
        "workload": f"B={B} splines, 10 decoders (model_seed12), {STEPS} "
                    "Adam steps per invocation, single chip",
        "device": str(jax.devices()[0]),
        "rungs": rungs,
        "note": "jvp rungs are XLA (no fused kernel yet); target_num_t=2000 "
                "rescales the coarse-grid objective to the full-T semantics "
                "(geometry.energy.energy_jvp_ensemble docstring)",
    }
    with open(os.path.join(REPO, "experiment", "jvp_speed_probe.json"),
              "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
