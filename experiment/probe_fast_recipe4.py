"""Probe 4: shrink the full-resolution polish of the three-phase ladder.

Probe 3 measured cos1200@128+100@1024+100@2000 at 1.84 s/chunk with full
dominance; its T=2000 phase is ~0.78 s of that.  This probe measures how
short the full-resolution tail can get (and whether a mid grid of 512
suffices) before the per-pair dominance vs the reference recipe degrades.

Writes experiment/fast_recipe_probe4.json.
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
    ("cos1200@128+100@1024+100@2000", [(1200, 128, "cosine", 3e-3),
                                       (100, 1024, "constant", 1e-3),
                                       (100, 2000, "constant", 1e-3)]),
    ("cos1200@128+100@1024+50@2000", [(1200, 128, "cosine", 3e-3),
                                      (100, 1024, "constant", 1e-3),
                                      (50, 2000, "constant", 1e-3)]),
    ("cos1200@128+100@512+50@2000", [(1200, 128, "cosine", 3e-3),
                                     (100, 512, "constant", 1e-3),
                                     (50, 2000, "constant", 1e-3)]),
    ("cos1000@128+100@512+50@2000", [(1000, 128, "cosine", 3e-3),
                                     (100, 512, "constant", 1e-3),
                                     (50, 2000, "constant", 1e-3)]),
    ("cos1200@128+200@1024", [(1200, 128, "cosine", 3e-3),
                              (200, 1024, "constant", 1e-3)]),
    ("cos1200@128+60@512+60@1024+40@2000", [(1200, 128, "cosine", 3e-3),
                                            (60, 512, "constant", 1e-3),
                                            (60, 1024, "constant", 1e-3),
                                            (40, 2000, "constant", 1e-3)]),
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

    path = os.path.join(OUT, "fast_recipe_probe4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
