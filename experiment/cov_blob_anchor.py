"""CoV golden anchor from the upstream-committed spline blobs.

The reference's CoV golden (/root/reference/experiment/plots/
cov_values_15.json: avg CoV over 105 pairs x 6 seeds at k=1..10 decoders,
Euclidean 0.2627) is UNREPRODUCIBLE upstream: it needs each seed encoder's
latents of the 15 representatives, i.e. the raw dataset
``data/tasic-pca50.npy``, which is a missing git-lfs blob (docs/METHOD.md
"Golden reproduction" section).  This script ships the CLOSEST FEASIBLE
anchor instead of nothing:

- The committed init blobs ``splines_init_model_seed{12,123}/
  spline_batch_init_euclidean_10.pt`` carry each pair's endpoint LATENTS
  under that seed's encoder (a/b per pair, a_index/b_index dataset ids) —
  per-seed representative latents for the 10-rep pair set, recovered
  without the dataset.
- Run the reference CoV procedure (straight-line init, 300 MC steps,
  T=2000, M=2; src/eval.py:74-176) over those 45 pairs for the TWO
  recoverable seeds at every decoder count, via
  ``cov_analysis(rep_latents=...)``.
- Compare the k-trend SHAPE against the 6-seed/15-rep golden: CoV must
  drop steeply from k=1 to k~3 and flatten, and the latent-Euclidean CoV
  must sit near the k=1 geodesic CoV (the paper's qualitative claim).
  A 2-seed CoV is a noisier estimator of the same quantity (std over 2
  samples), so LEVELS are not expected to match; the anchor is the shape
  (Pearson/Spearman over k) plus the euclidean/k1 ratio.

Writes experiment/cov_blob_anchor.json.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference/experiment"

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from vae_latent_geometry_tpu.models.torch_import import (
    load_evae_checkpoint,
    load_spline_blob,
)
from vae_latent_geometry_tpu.pipeline.evaluate import cov_analysis


def recover_latents(seed):
    """(rep latents (10, 2), pairs (45, 2) as rep indices) from the blob."""
    blob = load_spline_blob(
        f"{REF}/splines_init_model_seed{seed}/"
        "spline_batch_init_euclidean_10.pt")
    reps = blob["representatives"]
    idx_of = {int(r["index"]): i for i, r in enumerate(reps)}
    lat = np.full((len(reps), 2), np.nan, np.float32)
    pairs = []
    for e in blob["spline_data"]:
        ia, ib = idx_of[int(e["a_index"])], idx_of[int(e["b_index"])]
        lat[ia] = np.asarray(e["a"])
        lat[ib] = np.asarray(e["b"])
        pairs.append((ia, ib))
    assert np.isfinite(lat).all(), "blob does not cover every representative"
    return lat, np.asarray(pairs), [r["label"] for r in reps]


def main():
    seeds = [12, 123]
    lat12, pairs12, labels12 = recover_latents(12)
    lat123, pairs123, labels123 = recover_latents(123)
    assert labels12 == labels123 and (pairs12 == pairs123).all(), \
        "blob pair sets differ across seeds"
    models = [load_evae_checkpoint(f"{REF}/model_seed{s}.pt") for s in seeds]

    t0 = time.perf_counter()
    res = cov_analysis(models, seeds, data=None, pairs=pairs12,
                       steps=300, num_t=2000, mode="mc_fused",
                       batch_size=200, rep_latents=[lat12, lat123])
    wall = time.perf_counter() - t0

    golden = json.load(open(f"{REF}/plots/cov_values_15.json"))
    g_trend = np.array([golden["avg_cov_geodesic"][str(k)]
                        for k in res.decoder_counts
                        if str(k) in golden["avg_cov_geodesic"]])
    ks = [k for k in res.decoder_counts
          if str(k) in golden["avg_cov_geodesic"]]
    o_trend = np.array([res.avg_cov_geodesic[k] for k in ks])

    def spearman(x, y):
        rx = np.argsort(np.argsort(x)).astype(float)
        ry = np.argsort(np.argsort(y)).astype(float)
        return float(np.corrcoef(rx, ry)[0, 1])

    out = {
        "workload": "45 pairs x 2 seeds (12, 123) x k=1..10 decoder counts, "
                    "300 MC steps T=2000 M=2 mc_fused@f32x3, straight-line "
                    "init; per-seed representative latents recovered from "
                    "the committed euclidean_10 init blobs",
        "why_not_the_golden_itself": "the 15-rep 6-seed golden needs "
                    "per-seed encodings of the representatives, i.e. the "
                    "missing upstream tasic-pca50.npy; only seeds 12/123 "
                    "ship blobs that embed their representative latents",
        "wall_clock_seconds": round(wall, 1),
        "decoder_counts": ks,
        "ours_2seed_avg_cov_geodesic": {
            int(k): round(float(res.avg_cov_geodesic[k]), 5) for k in ks},
        "ours_2seed_avg_cov_euclidean": round(
            float(res.avg_cov_euclidean), 5),
        "golden_6seed_avg_cov_geodesic": {
            int(k): round(float(golden["avg_cov_geodesic"][str(k)]), 5)
            for k in ks},
        "golden_6seed_avg_cov_euclidean": round(
            float(golden["avg_cov_euclidean"]), 5),
        "trend_comparison": {
            "pearson_over_k": round(float(np.corrcoef(o_trend,
                                                      g_trend)[0, 1]), 4),
            "spearman_over_k": round(spearman(o_trend, g_trend), 4),
            "ours_k1_over_euclidean": round(
                float(o_trend[0] / max(res.avg_cov_euclidean, 1e-12)), 4),
            "golden_k1_over_euclidean": round(
                float(g_trend[0] / golden["avg_cov_euclidean"]), 4),
            "ours_k10_over_k1": round(float(o_trend[-1] / o_trend[0]), 4),
            "golden_k10_over_k1": round(float(g_trend[-1] / g_trend[0]), 4),
        },
        "note": "2-seed CoV is a noisy estimator of the 6-seed CoV (std of "
                "2 samples), and the pair set is the 10-rep one, so LEVELS "
                "are not comparable; the anchor is the k-trend shape and "
                "the euclidean-vs-geodesic relationship",
    }
    path = os.path.join(REPO, "experiment", "cov_blob_anchor.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["trend_comparison"], indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
