"""A/B learning-rate schedules against the reference's fixed recipe on the
production full-133 workload.

Baseline: the reference's Adam(lr=1e-3) x 1000 steps (src/optimize.py:153).
Candidates: shorter budgets with warmup->peak->cosine-decay.  Dominance is
judged on per-spline FINAL EXACT energies (float32 kernel re-evaluation, the
same numbers the pipeline reports): a candidate wins if its energies are <=
the baseline's for (essentially) every spline with a lower median.

Writes experiment/schedule_probe.json.
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
from vae_latent_geometry_tpu.models import evae as evae_lib
from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
from vae_latent_geometry_tpu.optim import optimize_splines

REF = "/root/reference"
OUT = os.path.dirname(os.path.abspath(__file__))
BS = 200
ENERGY = EnergyConfig(num_t=2000, mode="expected_fused",
                      kernel_precision="f32x2")


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

    chunk_starts = [0, (P // 2 // BS) * BS]

    def run(cfg, start):
        idx = np.arange(start, min(start + BS, P))
        if len(idx) < BS:
            idx = np.concatenate([idx, np.full(BS - len(idx), idx[-1])])
        t0 = time.perf_counter()
        res = optimize_splines(
            params.decoders, jnp.asarray(art.omega[idx]),
            jnp.asarray(art.a[idx]), jnp.asarray(art.b[idx]),
            art.basis, cfg,
            key=jax.random.fold_in(jax.random.PRNGKey(0), start))
        e = np.asarray(res.energy)
        return e, time.perf_counter() - t0

    candidates = {
        "baseline_const1e-3_1000": GeodesicConfig(
            steps=1000, lr=1e-3, batch_size=BS, energy=ENERGY),
        "const1e-3_500": GeodesicConfig(
            steps=500, lr=1e-3, batch_size=BS, energy=ENERGY),
        "cos_peak3e-3_400": GeodesicConfig(
            steps=400, lr=3e-3, lr_schedule="cosine", batch_size=BS,
            energy=ENERGY),
        "cos_peak5e-3_400": GeodesicConfig(
            steps=400, lr=5e-3, lr_schedule="cosine", batch_size=BS,
            energy=ENERGY),
        "cos_peak3e-3_300": GeodesicConfig(
            steps=300, lr=3e-3, lr_schedule="cosine", batch_size=BS,
            energy=ENERGY),
        "cos_peak5e-3_250": GeodesicConfig(
            steps=250, lr=5e-3, lr_schedule="cosine", batch_size=BS,
            energy=ENERGY),
        "cos_peak3e-3_1000": GeodesicConfig(
            steps=1000, lr=3e-3, lr_schedule="cosine", batch_size=BS,
            energy=ENERGY),
    }

    out = {"workload": "full133 euclidean chunks, expected_fused@f32x2, "
                       "final exact-f32 energies",
           "baseline": "reference recipe Adam(1e-3) x 1000 steps",
           "chunks": {}}
    for start in chunk_starts:
        base_e, base_wall = run(candidates["baseline_const1e-3_1000"], start)
        rows = {"baseline_const1e-3_1000": {"wall_s": round(base_wall, 1)}}
        for name, cfg in candidates.items():
            if name == "baseline_const1e-3_1000":
                continue
            e, wall = run(cfg, start)
            ratio = e / np.maximum(base_e, 1e-12)
            rows[name] = {
                "wall_s": round(wall, 1),
                "median_ratio_vs_baseline": round(float(np.median(ratio)), 6),
                "max_ratio": round(float(ratio.max()), 6),
                "frac_not_worse_0.1pct": round(float((ratio <= 1.001).mean()),
                                               4),
                "frac_strictly_better": round(float((ratio < 1.0).mean()), 4),
            }
            print(f"[chunk {start}] {name}: {rows[name]}", flush=True)
        out["chunks"][str(start)] = rows

    path = os.path.join(OUT, "schedule_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
