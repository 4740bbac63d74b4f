"""Probe 3: how far can the two-phase recipe be pushed?

The measured turbo recipe (cos1200@256 + 200@2000, full133_turbo_timing.json)
costs ~2.8 s/chunk: ~1.25 s coarse + ~1.56 s polish.  Two remaining levers:

1. Coarser trajectory grids (T=128 / 64).  The spline has only K*D = 10 free
   params, so even a 64-point quadrature may steer fine; the polish phase
   exists to remove the coarse-grid bias tail.
2. Reduced-T polish (T=1000 instead of 2000).  traj_resolution_probe.json
   showed full T=1000 runs land median 1.0000 of the T=2000 recipe (tail
   max +13%); as a *polish* grid after a coarse phase the tail risk is the
   open question this probe measures.

Acceptance unchanged: per-pair exact-f32 T=2000 final energies vs the
reference recipe (Adam 1e-3 x 1000 @ T=2000), dominance-style ratios.

Writes experiment/fast_recipe_probe3.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
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


def _cfg(steps, num_t, lr=1e-3, schedule="constant", peak=None):
    return GeodesicConfig(
        steps=steps, lr=(peak or lr), lr_schedule=schedule,
        batch_size=BS,
        energy=EnergyConfig(num_t=num_t, mode="expected_fused",
                            kernel_precision="f32x2"))


# (name, [(steps, T, schedule, lr), ...]) — phases run in sequence with
# omega warm-started; step-equivalent cost = sum(steps * T / 2000)
RECIPES = [
    ("base_1000@2000", [(1000, 2000, "constant", 1e-3)]),
    ("turbo_cos1200@256+200@2000", [(1200, 256, "cosine", 3e-3),
                                    (200, 2000, "constant", 1e-3)]),
    ("cos1200@128+200@2000", [(1200, 128, "cosine", 3e-3),
                              (200, 2000, "constant", 1e-3)]),
    ("cos1200@256+200@1000", [(1200, 256, "cosine", 3e-3),
                              (200, 1000, "constant", 1e-3)]),
    ("cos1200@128+200@1000", [(1200, 128, "cosine", 3e-3),
                              (200, 1000, "constant", 1e-3)]),
    ("cos1600@64+250@1000", [(1600, 64, "cosine", 3e-3),
                             (250, 1000, "constant", 1e-3)]),
    ("cos1200@128+100@1024+100@2000", [(1200, 128, "cosine", 3e-3),
                                       (100, 1024, "constant", 1e-3),
                                       (100, 2000, "constant", 1e-3)]),
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

    def run(recipe, a_c, b_c, om0, key):
        om = om0
        t0 = time.perf_counter()
        for steps, T, sched, lr in recipe:
            cfg = _cfg(steps, T, schedule=sched, peak=lr)
            res = optimize_splines(params.decoders, om, a_c, b_c,
                                   art.basis, cfg, key=key)
            om = res.omega
        e = np.asarray(eval_loss(om, a_c, b_c))
        return e, time.perf_counter() - t0

    # warmup chunk populates the compile cache for every distinct program
    warm = chunk(2000)
    for name, recipe in RECIPES:
        t0 = time.perf_counter()
        run(recipe, *warm)
        print(f"[warmup] {name}: {time.perf_counter() - t0:.1f}s "
              "(incl. compile)", flush=True)

    out = {"workload": "full133 euclidean chunks, expected_fused@f32x2 "
                       "trajectories, per-pair exact-f32 T=2000 final "
                       "energies vs reference recipe (1000 steps @ T2000)",
           "chunks": {}}
    for start in [0, (P // 2 // BS) * BS]:
        a_c, b_c, om0, key = chunk(start)
        rows = {}
        base = None
        for name, recipe in RECIPES:
            e, wall = run(recipe, a_c, b_c, om0, key)
            cost = sum(s * T / 2000 for s, T, _, _ in recipe)
            if base is None:
                base = e
                rows[name] = {"wall_s": round(wall, 2),
                              "step_equiv": cost}
            else:
                ratio = e / np.maximum(base, 1e-12)
                rows[name] = {
                    "wall_s": round(wall, 2),
                    "step_equiv": cost,
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

    path = os.path.join(OUT, "fast_recipe_probe3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
