"""Full-scale test of the quadrature-transfer coarse phase as a turbo
variant (follow-up to jvp_quality_probe.json).

On the two probed chunks, a cos1200 coarse phase at T=64 with
energy_expected_rescaled (target 2000) + the standard 200@2000 polish
matched the shipped turbo's medians at equal wall-clock with a BETTER
worst-case tail (max_ratio 1.026 vs 1.044 on chunk 0).  The probed chunks
cannot decide a preset change (turbo_ladder_fullscale.json showed chunk
probes over-estimate dominance); this runs the full 8,778-pair workload
with the rescaled plan and compares against the committed fixed matrix
with the same statistics as full133_turbo_timing.json.

Writes experiment/full133_rescaled64_timing.json.
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
from vae_latent_geometry_tpu.pipeline.full_run import run_distance_pipeline

OUT = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"

PLAN = ((1200, 64, "cosine", 3e-3, "expected_rescaled"),
        (200, 2000, "constant", 1e-3, "expected_fused"))


def main():
    params = load_evae_checkpoint(f"{REF}/experiment/model_seed12.pt")
    data = load_tasic()
    t0 = time.perf_counter()
    res = run_distance_pipeline(
        params, data.x, data.labels, max_labels=133,
        init_cfg=InitConfig(use_entropy=False),
        geo_cfg=GeodesicConfig(
            steps=1200, batch_size=200, phase_plan=PLAN,
            energy=EnergyConfig(num_t=2000, mode="expected_fused",
                                kernel_precision="f32x2",
                                target_num_t=2000)),
        verbose=False,
    )
    wall = time.perf_counter() - t0

    fixed = json.load(open(os.path.join(
        OUT, "plots", "geodesic_matrix_seed12_euclidean_133.json")))
    fm = np.asarray(fixed["distance_matrix"], float)
    cmp = None
    if list(fixed["cluster_ids"]) == list(res.labels):
        iu = np.triu_indices(len(res.labels), k=1)
        es, fx = res.matrix[iu], fm[iu]
        ok = np.isfinite(es) & np.isfinite(fx)
        ratio = es[ok] / np.maximum(fx[ok], 1e-12)
        cmp = {"n_common": int(ok.sum()),
               "median_len_ratio_vs_fixed": float(np.median(ratio)),
               "max_len_ratio_vs_fixed": float(ratio.max()),
               "frac_strictly_better": float((ratio < 1.0).mean()),
               "frac_not_worse_1pct": float((ratio <= 1.01).mean())}
    out = {
        "note": "rescaled-T64 coarse phase (energy_expected_rescaled, "
                "quadrature-transfer target 2000) + 200@2000 polish; the "
                "full-scale decision data for whether the transfer arm "
                "should replace/join the turbo preset",
        "plan": [list(p) for p in PLAN],
        "workload": "133 classes, 8778 pairs, 10 decoders, single v5e",
        "wall_clock_seconds": round(wall, 1),
        "stage_timings": {k: round(v, 2) for k, v in res.timings.items()},
        "fixed_run_comparison": cmp,
        "turbo_reference_stats": {
            "frac_strictly_better": 0.9921, "frac_not_worse_1pct": 0.9942,
            "max_len_ratio_vs_fixed": 1.1905,
            "source": "full133_turbo_timing.json"},
        "data": "synthetic surrogate + reference model_seed12.pt",
    }
    path = os.path.join(OUT, "full133_rescaled64_timing.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(cmp, indent=1))
    print(f"wall {wall:.1f}s; wrote {path}")


if __name__ == "__main__":
    main()
