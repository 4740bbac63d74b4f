"""Batch-width sweep for the production optimize path.

The pipeline chunks pairs at ``GeodesicConfig.batch_size`` (canonical 200,
the reference's own chunk width, ``/root/reference/src/optimize.py:98``) and
pads every chunk to that width, so the whole run executes ONE compiled
program per phase.  Batch width is a pure performance knob here: per-pair
trajectories are mathematically independent, so the produced curves do not
depend on the chunking (checked below against the B=200 run).

What width is fastest on one chip?  Wider chunks amortize per-chunk
dispatch/host boundaries and deepen the Pallas B-grid; narrower chunks fit
the single-block fast path.  This probe times the FULL turbo recipe
(cos1200@T=256 + 200 polish @2000, expected_fused@f32x2 — the production
configuration) over ~2,048 pairs at widths {128, 200, 256, 512}, two
invocations each (the first pays that width's one-time kernel compiles /
cache loads; the second is steady state), and reports steady seconds per
pair.  Writes experiment/batch_width_probe.json.
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

from vae_latent_geometry_tpu.cli import TURBO_PHASES
from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig, InitConfig
from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
from vae_latent_geometry_tpu.data.tasic import load_tasic
from vae_latent_geometry_tpu.models import evae as evae_lib
from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
from vae_latent_geometry_tpu.pipeline.init_splines import initialize_splines
from vae_latent_geometry_tpu.pipeline.optimize_stage import optimize_spline_batch
from vae_latent_geometry_tpu.pipeline.select_pairs import (
    make_pairs,
    select_representatives,
)

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "batch_width_probe.json")


def main():
    params = load_evae_checkpoint(f"{REF}/experiment/model_seed12.pt")
    data = load_tasic()
    jax.device_put(np.zeros(8)).block_until_ready()
    latents = np.asarray(jax.jit(
        lambda p, x: evae_lib.encode(p, x)[0])(params, jnp.asarray(data.x)))
    reps = select_representatives(latents, data.labels, max_labels=133)
    pairs = make_pairs(reps)
    init = initialize_splines(latents, pairs, decoders=params.decoders,
                              cfg=InitConfig(use_entropy=False))

    label_of = {r["index"]: r["label"] for r in reps}

    def subset(n):
        sl = np.arange(n)
        return SplineBatchArtifact(
            a=init.a[sl], b=init.b[sl], omega_init=init.omega[sl],
            basis=init.basis, n_poly=init.n_poly,
            pair_indices=init.pair_indices[sl], valid=init.valid[sl],
            pair_labels=[[label_of.get(int(i), "?"), label_of.get(int(j), "?")]
                         for i, j in init.pair_indices[sl]],
            representatives=reps,
            metadata={"init_type": init.init_type, "pair_count": 133})

    rows = {}
    lengths_by_b = {}
    for bsz in (128, 200, 256, 512):
        n = (2048 // bsz) * bsz if 2048 % bsz else 2048
        sub = subset(n)
        cfg = GeodesicConfig(
            steps=1200, lr=3e-3, lr_schedule="cosine", batch_size=bsz,
            phase_plan=TURBO_PHASES,
            energy=EnergyConfig(num_t=2000, mode="expected_fused",
                                kernel_precision="f32x2"))

        def run():
            t0 = time.perf_counter()
            res = optimize_spline_batch(params, sub, cfg=cfg,
                                        log_every_chunk=False)
            return time.perf_counter() - t0, res

        t_first, _ = run()
        t_steady, res = run()
        rows[bsz] = {
            "n_pairs": n,
            "first_invocation_s": round(t_first, 1),
            "steady_state_s": round(t_steady, 1),
            "steady_ms_per_pair": round(1000.0 * t_steady / n, 3),
        }
        lengths_by_b[bsz] = np.asarray(res.geodesic_length)
        print(f"[batch-width B={bsz}] first {t_first:.1f}s "
              f"steady {t_steady:.1f}s "
              f"({rows[bsz]['steady_ms_per_pair']} ms/pair)", flush=True)

    # chunking must not change the produced curves: compare each width's
    # lengths to the B=200 run on the common pair prefix
    ref_len = lengths_by_b[200]
    agree = {}
    for bsz, L in lengths_by_b.items():
        m = min(len(L), len(ref_len))
        rel = np.abs(L[:m] - ref_len[:m]) / np.abs(ref_len[:m])
        agree[bsz] = {"n_common": int(m), "max_rel_vs_B200": float(rel.max())}
    payload = {
        "workload": "first ~2048 pairs of the 133x133 workload, full turbo "
                    "recipe (cos1200@256 + 200@2000), expected_fused@f32x2, "
                    "single v5e; each width padded-chunked by the standard "
                    "pipeline; two invocations per width (first includes "
                    "that width's one-time compiles / cache loads)",
        "rows": rows,
        "length_agreement_vs_B200": agree,
        "data": "synthetic surrogate (tasic-pca50.npy missing upstream) + "
                "reference model_seed12.pt",
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
