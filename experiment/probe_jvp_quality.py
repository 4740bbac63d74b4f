"""Probe: JVP quadrature-transfer QUALITY on production chunks.

Round-3 verdict item 1, quality side.  The speed probe
(jvp_speed_probe.json) measured the XLA ``jvp_ensemble`` trajectory at
T=128/tgt2000 running 148.5 steps/s — ~2x the fused discrete T=2000 rung
but only ~0.45x the fused discrete T=256 rung the turbo preset uses.  So
JVP wins on wall-clock ONLY if its exact-metric semantics at a coarse grid
steer to minima a secant trajectory at comparable cost cannot reach, or if
it tolerates an even coarser grid (T=64/32) than first differences do.

This probe answers the quality question on real production chunks
(model_seed12, euclidean init, exact-f32 T=2000 expected final energies,
dominance ratios vs the reference fixed recipe) for JVP trajectories at
T in {32, 64, 128, 256} with and without a full-T polish phase, against
the shipped turbo ladder and a secant control at the same T
(expected_rescaled — isolates exact-metric value from rescaling value).

Writes experiment/jvp_quality_probe.json.
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

from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig, InitConfig
from vae_latent_geometry_tpu.data.tasic import load_tasic
from vae_latent_geometry_tpu.models import evae as evae_lib
from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
from vae_latent_geometry_tpu.optim import optimize_splines
from vae_latent_geometry_tpu.optim.geodesic import make_loss_fn

REF = "/root/reference"
OUT = os.path.dirname(os.path.abspath(__file__))
BS = 200

# (name, phase_plan of (steps, T, sched, lr, mode) 5-tuples)
# step_equiv cost model: discrete modes cost T/2000 per step; jvp modes
# cost ~2.2x that per point (primal+tangent matmuls; measured 148.5 vs
# 329.7 steps/s at T=128 vs discrete T=256 -> use measured walls instead).
RECIPES = [
    ("base_1000@2000", ((1000, 2000, "constant", 1e-3, "expected_fused"),)),
    ("turbo_cos1200@256+200@2000",
     ((1200, 256, "cosine", 3e-3, "expected_fused"),
      (200, 2000, "constant", 1e-3, "expected_fused"))),
    ("jvp_cos1200@256+200@2000",
     ((1200, 256, "cosine", 3e-3, "jvp_ensemble"),
      (200, 2000, "constant", 1e-3, "expected_fused"))),
    ("jvp_cos1200@128+200@2000",
     ((1200, 128, "cosine", 3e-3, "jvp_ensemble"),
      (200, 2000, "constant", 1e-3, "expected_fused"))),
    ("jvp_cos1200@64+200@2000",
     ((1200, 64, "cosine", 3e-3, "jvp_ensemble"),
      (200, 2000, "constant", 1e-3, "expected_fused"))),
    ("jvp_cos1200@32+200@2000",
     ((1200, 32, "cosine", 3e-3, "jvp_ensemble"),
      (200, 2000, "constant", 1e-3, "expected_fused"))),
    # secant control at the same coarse T + rescaling: how much of the
    # transfer is the exact metric vs the rescaling alone?
    ("rescaled_cos1200@64+200@2000",
     ((1200, 64, "cosine", 3e-3, "expected_rescaled"),
      (200, 2000, "constant", 1e-3, "expected_fused"))),
    # no-polish arms: is the full-T polish even needed after a JVP traj?
    ("jvp_cos1400@128_nopolish",
     ((1400, 128, "cosine", 3e-3, "jvp_ensemble"),)),
    ("jvp_cos1400@64_nopolish",
     ((1400, 64, "cosine", 3e-3, "jvp_ensemble"),)),
]


def main():
    params = load_evae_checkpoint(f"{REF}/experiment/model_seed12.pt")
    data = load_tasic()

    from vae_latent_geometry_tpu.pipeline.init_splines import initialize_splines
    from vae_latent_geometry_tpu.pipeline.select_pairs import (
        make_pairs,
        select_representatives,
    )

    z_mean = jax.jit(lambda p, x: evae_lib.encode(p, x)[0])(
        params, jnp.asarray(data.x))
    latents = np.asarray(z_mean)
    reps = select_representatives(latents, data.labels, 133)
    art = initialize_splines(latents, make_pairs(reps),
                             decoders=params.decoders,
                             cfg=InitConfig(use_entropy=False))
    P = len(art.a)

    eval_cfg = GeodesicConfig(
        steps=1, batch_size=BS,
        energy=EnergyConfig(num_t=2000, mode="expected"))
    eval_loss = jax.jit(
        lambda om, a, b: make_loss_fn(params.decoders,
                                      jnp.asarray(art.basis),
                                      eval_cfg)(
            om, a, b, jax.random.PRNGKey(0), None)[1])

    def chunk(start):
        idx = np.arange(start, min(start + BS, P))
        if len(idx) < BS:
            idx = np.concatenate([idx, np.full(BS - len(idx), idx[-1])])
        return (jnp.asarray(art.a[idx]), jnp.asarray(art.b[idx]),
                jnp.asarray(art.omega[idx]),
                jax.random.fold_in(jax.random.PRNGKey(0), start))

    def run(plan, a_c, b_c, om0, key):
        cfg = GeodesicConfig(
            steps=plan[0][0], batch_size=BS, phase_plan=plan,
            energy=EnergyConfig(num_t=2000, mode="expected_fused",
                                kernel_precision="f32x2", target_num_t=2000),
        )
        t0 = time.perf_counter()
        res = optimize_splines(params.decoders, om0, a_c, b_c,
                               art.basis, cfg, key=key)
        e = np.asarray(eval_loss(res.omega, a_c, b_c))
        return e, time.perf_counter() - t0

    warm = chunk(2000)
    for name, plan in RECIPES:
        t0 = time.perf_counter()
        run(plan, *warm)
        print(f"[warmup] {name}: {time.perf_counter() - t0:.1f}s "
              "(incl. compile)", flush=True)

    out = {"workload": "full133 euclidean chunks (B=200), trajectories at "
                       "f32x2 kernel precision, per-pair exact-f32 T=2000 "
                       "expected final energies vs reference fixed recipe",
           "note": "jvp arms run XLA jvp_ensemble with target_num_t=2000 "
                   "(quadrature transfer); rescaled arm is the secant "
                   "control at the same grid",
           "chunks": {}}
    for start in [0, (P // 2 // BS) * BS]:
        a_c, b_c, om0, key = chunk(start)
        rows = {}
        base = None
        for name, plan in RECIPES:
            e, wall = run(plan, a_c, b_c, om0, key)
            if base is None:
                base = e
                rows[name] = {"wall_s": round(wall, 2)}
            else:
                ratio = e / np.maximum(base, 1e-12)
                rows[name] = {
                    "wall_s": round(wall, 2),
                    "median_ratio": round(float(np.median(ratio)), 6),
                    "max_ratio": round(float(ratio.max()), 6),
                    "frac_not_worse_0.1pct": round(
                        float((ratio <= 1.001).mean()), 4),
                    "frac_not_worse_1pct": round(
                        float((ratio <= 1.01).mean()), 4),
                    "frac_strictly_better": round(
                        float((ratio < 1.0).mean()), 4),
                }
            print(f"[chunk {start}] {name}: {rows[name]}", flush=True)
        out["chunks"][str(start)] = rows

    path = os.path.join(OUT, "jvp_quality_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
