"""T-axis scaling study (round-3 verdict item 7; SURVEY §5 long-context
analogue).

The quadrature resolution T is this framework's sequence-length axis: the
reference pins T=2000 (src/optimize.py:130) and materializes (T, B, X)
decode planes, so its working set grows linearly with T.  Our fused
kernels stream T in fixed-size chunks (ops/energy_pallas.py grid over the
T axis) and the scan-jitted optimizer keeps only (B, K, D) state, so
memory should be FLAT in T and wall-clock ~linear.

This probe runs the full 8,778-pair turbo recipe at T in {2000, 4000,
8000} (trajectory rungs scaled proportionally: coarse phase at 256/512/
1024 — the power-of-two ladder keeps every row on the fused kernels;
T/8 literal would give 250/500, which have no 8-aligned divisor and
would silently fall back to unfused XLA, mixing code paths across rows)
and records wall clock plus device memory stats where the backend
exposes them.  Writes experiment/full133_T_scaling.json.
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
from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
from vae_latent_geometry_tpu.models import evae as evae_lib
from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
from vae_latent_geometry_tpu.pipeline.init_splines import initialize_splines
from vae_latent_geometry_tpu.pipeline.optimize_stage import optimize_spline_batch
from vae_latent_geometry_tpu.pipeline.select_pairs import (
    make_pairs,
    select_representatives,
)

OUT = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"
BS = 200


def mem_stats():
    try:
        s = jax.local_devices()[0].memory_stats()
        return {k: int(v) for k, v in s.items()
                if k in ("bytes_in_use", "peak_bytes_in_use",
                         "bytes_reserved", "largest_alloc_size")}
    except Exception:
        return None


def main():
    params = load_evae_checkpoint(f"{REF}/experiment/model_seed12.pt")
    data = load_tasic()
    z = jax.jit(lambda p, x: evae_lib.encode(p, x)[0])(
        params, jnp.asarray(data.x))
    latents = np.asarray(z)
    reps = select_representatives(latents, data.labels, 133)
    init = initialize_splines(latents, make_pairs(reps),
                              decoders=params.decoders,
                              cfg=InitConfig(use_entropy=False))
    label_of = {r["index"]: r["label"] for r in reps}
    art = SplineBatchArtifact(
        a=init.a, b=init.b, omega_init=init.omega, basis=init.basis,
        n_poly=init.n_poly, pair_indices=init.pair_indices, valid=init.valid,
        pair_labels=[[label_of.get(int(i), "?"), label_of.get(int(j), "?")]
                     for i, j in init.pair_indices],
        representatives=reps,
        metadata={"init_type": init.init_type, "pair_count": 133})

    rows = {}
    for T, coarse_T in ((2000, 256), (4000, 512), (8000, 1024)):
        cfg = GeodesicConfig(
            steps=1200, batch_size=BS,
            phase_plan=((1200, coarse_T, "cosine", 3e-3),
                        (200, T, "constant", 1e-3)),
            energy=EnergyConfig(num_t=T, mode="expected_fused",
                                kernel_precision="f32x2"))
        t0 = time.perf_counter()
        res = optimize_spline_batch(params, art, cfg=cfg,
                                    log_every_chunk=False)
        wall = time.perf_counter() - t0
        L = np.asarray(res.geodesic_length)
        rows[str(T)] = {
            "wall_clock_seconds": round(wall, 1),
            "coarse_T": coarse_T,
            "median_length": round(float(np.nanmedian(L)), 4),
            "n_finite": int(np.isfinite(L).sum()),
            "memory_after": mem_stats(),
        }
        print(f"[T={T}] {rows[str(T)]}", flush=True)

    w = [rows[str(T)]["wall_clock_seconds"] for T in (2000, 4000, 8000)]
    out = {
        "workload": "full 8778-pair turbo-recipe optimize (cos1200@"
                    "{256,512,1024} + 200@T), expected_fused@f32x2, single "
                    "v5e; first "
                    "invocation per T includes that T's one-time kernel "
                    "compile / cache load",
        "rows": rows,
        "wall_ratio_4000_over_2000": round(w[1] / w[0], 3),
        "wall_ratio_8000_over_4000": round(w[2] / w[1], 3),
        "note": "fused kernels stream the T axis in fixed-size chunks and "
                "the scan state is (B,K,D)-sized, so device memory is flat "
                "in T while the reference's (T,B,X) decode planes would "
                "grow 4x from T=2000 to T=8000",
    }
    path = os.path.join(OUT, "full133_T_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
