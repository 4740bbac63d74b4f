"""Probe: can the optimization TRAJECTORY run at a coarser quadrature
resolution (num_t) than the reported energies?

The discrete energy's t-grid is a quadrature choice (reference fixes
T=2000, src/optimize.py).  Like the kernel-precision rungs
(docs/NUMERICS.md), resolution could be reduced for the trajectory only:
optimize at T_traj < 2000, then re-evaluate the final curves at the full
T=2000 / float32 reference resolution.  If the re-evaluated energies match
the T=2000-optimized run's, wall clock drops ~linearly in T_traj with the
reported metric unchanged.

Writes experiment/traj_resolution_probe.json.
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
from vae_latent_geometry_tpu.optim.geodesic import make_loss_fn

REF = "/root/reference"
OUT = os.path.dirname(os.path.abspath(__file__))
BS = 200


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

    # full-resolution exact evaluator: XLA expected mode, T=2000, pinned
    # 'highest' matmul precision (the package default) — the reported metric
    eval_cfg = GeodesicConfig(
        steps=1, batch_size=BS,
        energy=EnergyConfig(num_t=2000, mode="expected"))
    eval_loss = jax.jit(
        lambda om, a, b: make_loss_fn(params.decoders,
                                      jnp.asarray(art.basis),
                                      eval_cfg)(
            om, a, b, jax.random.PRNGKey(0), None)[1])

    # powers of two: T=1000/500 lack a divisor that is a multiple of 8 and
    # >= 16, so the fused kernels reject them (ops.energy_pallas.fused_fits)
    # and the run silently pays the ~10x XLA fallback
    chunk_starts = [0, (P // 2 // BS) * BS]
    t_grid = [2000, 1024, 512]

    out = {"workload": "full133 euclidean chunks, reference recipe "
                       "Adam(1e-3) x 1000 steps, expected_fused@f32x2 "
                       "trajectory at T_traj; final energies re-evaluated "
                       "at T=2000 XLA-f32('highest')",
           "chunks": {}}
    for start in chunk_starts:
        idx = np.arange(start, min(start + BS, P))
        if len(idx) < BS:
            idx = np.concatenate([idx, np.full(BS - len(idx), idx[-1])])
        a_c = jnp.asarray(art.a[idx])
        b_c = jnp.asarray(art.b[idx])
        om0 = jnp.asarray(art.omega[idx])
        key = jax.random.fold_in(jax.random.PRNGKey(0), start)

        rows = {}
        base_e = None
        for T in t_grid:
            cfg = GeodesicConfig(
                steps=1000, lr=1e-3, batch_size=BS,
                energy=EnergyConfig(num_t=T, mode="expected_fused",
                                    kernel_precision="f32x2"))
            t0 = time.perf_counter()
            res = optimize_splines(params.decoders, om0, a_c, b_c,
                                   art.basis, cfg, key=key)
            e2000 = np.asarray(eval_loss(res.omega, a_c, b_c))
            wall = time.perf_counter() - t0
            if T == 2000:
                base_e = e2000
                rows["T2000"] = {"wall_s": round(wall, 1)}
            else:
                ratio = e2000 / np.maximum(base_e, 1e-12)
                rows[f"T{T}"] = {
                    "wall_s": round(wall, 1),
                    "median_ratio": round(float(np.median(ratio)), 8),
                    "max_ratio": round(float(ratio.max()), 8),
                    "min_ratio": round(float(ratio.min()), 8),
                    "frac_within_0.01pct": round(
                        float((np.abs(ratio - 1) <= 1e-4).mean()), 4),
                }
                print(f"[chunk {start}] T{T}: {rows[f'T{T}']}", flush=True)
        out["chunks"][str(start)] = rows

    path = os.path.join(OUT, "traj_resolution_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
