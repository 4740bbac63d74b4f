"""Measure the per-spline convergence-step distribution of the production
full-133 workload (reference model_seed12 + surrogate data, euclidean init).

For each probed chunk of 200 splines, run the FIXED 1000-step optimizer with
``record_history=True`` and compute, on host, the step at which each spline
would have early-stopped under (patience, rel-delta) semantics.  This bounds
what any early-stopping scheme can save:

- chunk-level exit (whole chunk stops when ALL splines are exhausted) saves
  ``1000 - max_spline_exit`` steps per chunk — gated by the straggler;
- per-spline compaction (repack active splines between fixed-shape phases)
  saves ``1000 - exit_s`` steps for every spline s — the per-spline ceiling.

Writes experiment/convergence_probe.json.
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

from vae_latent_geometry_tpu.config import (
    EnergyConfig,
    GeodesicConfig,
    InitConfig,
)
from vae_latent_geometry_tpu.data.tasic import load_tasic
from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
from vae_latent_geometry_tpu.models import evae as evae_lib
from vae_latent_geometry_tpu.optim import optimize_splines

REF = "/root/reference"
OUT = os.path.dirname(os.path.abspath(__file__))
BS = 200


def exit_steps(hist: np.ndarray, patience: int, delta: float) -> np.ndarray:
    """hist: (steps, B) energy per step.  Returns (B,) first step index at
    which `patience` consecutive steps each improved the running best by
    a relative margin < delta (the step the reference-style early stop
    would fire), or `steps` if the budget runs out first."""
    steps, B = hist.shape
    best = np.full(B, np.inf)
    ctr = np.zeros(B, np.int64)
    out = np.full(B, steps, np.int64)
    alive = np.ones(B, bool)
    for s in range(steps):
        e = hist[s]
        improved = (best - e) / np.where(best == np.inf, 1.0, best) > delta
        improved |= best == np.inf
        best = np.where(improved, e, best)
        ctr = np.where(improved, 0, ctr + 1)
        fire = alive & (ctr > patience)
        out[fire] = s
        alive &= ~fire
    return out


def main():
    params = load_evae_checkpoint(f"{REF}/experiment/model_seed12.pt")
    data = load_tasic()

    from vae_latent_geometry_tpu.pipeline.init_splines import (
        initialize_splines,
    )
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
    cfg = GeodesicConfig(
        steps=1000, batch_size=BS,
        energy=EnergyConfig(num_t=2000, mode="expected_fused",
                            kernel_precision="f32x2"))

    chunks = [0, (P // 2 // BS) * BS, ((P - 1) // BS) * BS]
    results = []
    for start in chunks:
        sl = slice(start, min(start + BS, P))
        idx = np.arange(sl.start, sl.stop)
        if len(idx) < BS:
            idx = np.concatenate([idx, np.full(BS - len(idx), sl.stop - 1)])
        t0 = time.perf_counter()
        res = optimize_splines(
            params.decoders, jnp.asarray(art.omega[idx]),
            jnp.asarray(art.a[idx]), jnp.asarray(art.b[idx]),
            art.basis, cfg, key=jax.random.fold_in(jax.random.PRNGKey(0),
                                                   start),
            record_history=True)
        hist = np.asarray(res.energy_history)
        wall = time.perf_counter() - t0
        row = {"chunk_start": int(start), "wall_s": round(wall, 1)}
        for patience, delta in [(100, 1e-5), (100, 1e-4), (50, 1e-4),
                                (100, 1e-6)]:
            ex = exit_steps(hist, patience, delta)
            row[f"p{patience}_d{delta:g}"] = {
                "median_exit": int(np.median(ex)),
                "p90_exit": int(np.quantile(ex, 0.9)),
                "max_exit": int(ex.max()),
                "mean_exit": round(float(ex.mean()), 1),
                "frac_full_budget": round(float((ex >= 1000).mean()), 3),
            }
        results.append(row)
        print(json.dumps(row), flush=True)

    path = os.path.join(OUT, "convergence_probe.json")
    with open(path, "w") as f:
        json.dump({
            "workload": "full133 euclidean chunks, expected_fused@f32x2, "
                        "fixed 1000 steps with per-step energy history",
            "semantics": "exit when `patience` consecutive steps improve the "
                         "running best by rel margin < delta",
            "chunks": results,
        }, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
