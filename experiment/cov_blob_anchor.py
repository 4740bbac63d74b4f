"""CoV golden anchor from the upstream-committed spline blobs — full k-sweep.

The reference's CoV goldens (/root/reference/experiment/plots/):
- ``cov_values_15.json``        — avg CoV over 105 pairs x 6 seeds, k=1..3
- ``cov_values_alldec_alldec.json`` — the SAME 105x6 run at k=1..10 (written
  by ``src/eval.py:155``; its ``seeds``/``num_pairs`` fields confirm)

Both are UNREPRODUCIBLE upstream at value level: they need each seed
encoder's latents of the 15 representatives, i.e. the raw dataset
``data/tasic-pca50.npy``, a missing git-lfs blob (docs/METHOD.md "Golden
reproduction").  This script ships the CLOSEST FEASIBLE anchor:

- The committed init blobs ``splines_init_model_seed{12,123}/
  spline_batch_init_euclidean_10.pt`` carry each pair's endpoint LATENTS
  under that seed's encoder (a/b per pair, a_index/b_index dataset ids) —
  per-seed representative latents for the 10-rep pair set, recovered
  without the dataset.
- Run the reference CoV procedure (straight-line init, 300 MC steps,
  T=2000, M=2; src/eval.py:74-176) over those 45 pairs for the TWO
  recoverable seeds at EVERY decoder count k=1..10 via
  ``cov_analysis(rep_latents=...)``.
- Compare the k-trend SHAPE against the k=1..10 golden: CoV must drop
  steeply from k=1 to k~3 and flatten, and the latent-Euclidean CoV must
  sit near the k=1 geodesic CoV (the paper's qualitative claim).  A 2-seed
  CoV is a noisier estimator of the same quantity (std over 2 samples), so
  LEVELS are not expected to match; the anchor is the shape (Pearson /
  Spearman over the n=10 counts) plus the euclidean/k1 ratio.

Writes experiment/cov_blob_anchor.json (full per-k curves, raw per-pair
values, n stated for every rank statistic) and the overlay plot
experiment/plots/cov_blob_anchor_overlay.png.
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

COUNTS = tuple(range(1, 11))


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


def spearman(x, y):
    rx = np.argsort(np.argsort(x)).astype(float)
    ry = np.argsort(np.argsort(y)).astype(float)
    return float(np.corrcoef(rx, ry)[0, 1])


def overlay_plot(ks, ours, golden, ours_eu, golden_eu, path):
    """Ours (2 seeds, 45 pairs) vs golden (6 seeds, 105 pairs) avg CoV per
    k, Euclidean CoV as horizontal reference rules.  Two fixed categorical
    hues + linestyle/marker secondary encoding (identity never color-alone);
    one axis."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    blue, orange = "#2563eb", "#ea580c"
    fig, ax = plt.subplots(figsize=(7, 4.5))
    ax.plot(ks, [golden[k] for k in ks], color=blue, marker="o", ms=5,
            lw=2, label="golden: 6 seeds x 105 pairs (upstream)")
    ax.plot(ks, [ours[k] for k in ks], color=orange, marker="s", ms=5,
            lw=2, ls="--", label="anchor: 2 seeds x 45 pairs (blob latents)")
    ax.axhline(golden_eu, color=blue, lw=1, ls=":", alpha=0.7)
    ax.axhline(ours_eu, color=orange, lw=1, ls=":", alpha=0.7)
    ax.annotate("golden Euclidean CoV", (ks[-1], golden_eu), fontsize=8,
                color=blue, ha="right", va="bottom")
    ax.annotate("anchor Euclidean CoV", (ks[-1], ours_eu), fontsize=8,
                color=orange, ha="right", va="bottom")
    ax.set_xlabel("ensemble size k (decoders)")
    ax.set_ylabel("avg CoV of geodesic length across seeds")
    ax.set_xticks(list(ks))
    ax.set_title("Cross-seed CoV vs ensemble size: anchor vs golden")
    ax.grid(alpha=0.25, lw=0.5)
    ax.legend(frameon=False, fontsize=9)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def main():
    seeds = [12, 123]
    lat12, pairs12, labels12 = recover_latents(12)
    lat123, pairs123, labels123 = recover_latents(123)
    assert labels12 == labels123 and (pairs12 == pairs123).all(), \
        "blob pair sets differ across seeds"
    models = [load_evae_checkpoint(f"{REF}/model_seed{s}.pt") for s in seeds]

    t0 = time.perf_counter()
    res = cov_analysis(models, seeds, data=None, pairs=pairs12,
                       decoder_counts=COUNTS, steps=300, num_t=2000,
                       mode="mc_fused", batch_size=200,
                       rep_latents=[lat12, lat123])
    wall = time.perf_counter() - t0

    golden = json.load(open(f"{REF}/plots/cov_values_alldec_alldec.json"))
    assert golden["decoder_counts"] == list(COUNTS)
    ks = list(COUNTS)
    g_curve = {k: float(golden["avg_cov_geodesic"][str(k)]) for k in ks}
    o_curve = {k: float(res.avg_cov_geodesic[k]) for k in ks}
    g_trend = np.array([g_curve[k] for k in ks])
    o_trend = np.array([o_curve[k] for k in ks])

    # raw per-pair CoV values at every k (45 per k), mirroring the golden's
    # raw_cov_geodesic schema so the artifact is self-contained
    raw_geo = {int(k): [round(float(v), 6) for v in res.raw_cov_geodesic[k]]
               for k in ks}
    raw_eu = [round(float(v), 6) for v in res.raw_cov_euclidean]

    plot_path = os.path.join(REPO, "experiment", "plots",
                             "cov_blob_anchor_overlay.png")
    os.makedirs(os.path.dirname(plot_path), exist_ok=True)
    overlay_plot(ks, o_curve, g_curve, float(res.avg_cov_euclidean),
                 float(golden["avg_cov_euclidean"]), plot_path)

    out = {
        "workload": "45 pairs x 2 seeds (12, 123) x k=1..10 decoder counts, "
                    "300 MC steps T=2000 M=2 mc_fused@f32x3, straight-line "
                    "init; per-seed representative latents recovered from "
                    "the committed euclidean_10 init blobs",
        "golden_source": "plots/cov_values_alldec_alldec.json (6 seeds x "
                    "105 pairs, k=1..10 — the full-k sibling of "
                    "cov_values_15.json, same upstream run per "
                    "src/eval.py:140-159)",
        "why_not_the_golden_itself": "the 15-rep 6-seed golden needs "
                    "per-seed encodings of the representatives, i.e. the "
                    "missing upstream tasic-pca50.npy; only seeds 12/123 "
                    "ship blobs that embed their representative latents",
        "wall_clock_seconds": round(wall, 1),
        "decoder_counts": ks,
        "ours_2seed_avg_cov_geodesic": {
            k: round(v, 5) for k, v in o_curve.items()},
        "ours_2seed_avg_cov_euclidean": round(
            float(res.avg_cov_euclidean), 5),
        "golden_6seed_avg_cov_geodesic": {
            k: round(v, 5) for k, v in g_curve.items()},
        "golden_6seed_avg_cov_euclidean": round(
            float(golden["avg_cov_euclidean"]), 5),
        "ours_raw_cov_geodesic_per_pair": raw_geo,
        "ours_raw_cov_euclidean_per_pair": raw_eu,
        "trend_comparison": {
            "n_counts": len(ks),
            "pearson_over_k": round(float(np.corrcoef(o_trend,
                                                      g_trend)[0, 1]), 4),
            "spearman_over_k": round(spearman(o_trend, g_trend), 4),
            "ours_k1_over_euclidean": round(
                float(o_trend[0] / max(res.avg_cov_euclidean, 1e-12)), 4),
            "golden_k1_over_euclidean": round(
                float(g_trend[0] / golden["avg_cov_euclidean"]), 4),
            "ours_k10_over_k1": round(float(o_curve[10] / o_curve[1]), 4),
            "golden_k10_over_k1": round(float(g_curve[10] / g_curve[1]), 4),
            "pearson_over_k_1to3": {
                "n": 3, "value": round(float(np.corrcoef(
                    o_trend[:3], g_trend[:3])[0, 1]), 4),
                "why": "the k range cov_values_15.json itself reports"},
            "reading": "the full-n Pearson is carried by the shared steep "
                "k=1->2 drop and flattening; Spearman over all 10 counts "
                "is dominated by rank noise in the flat k>=4 tail (a "
                "2-seed CoV's noise floor exceeds the golden's ~0.001/k "
                "decline there), so the anchor's agreement claim is: "
                "steep drop, flat tail, and k1 CoV ~= Euclidean CoV — "
                "not tail-rank agreement",
        },
        "overlay_plot": "experiment/plots/cov_blob_anchor_overlay.png",
        "note": "2-seed CoV is a noisy estimator of the 6-seed CoV (std of "
                "2 samples), and the pair set is the 10-rep one, so LEVELS "
                "are not comparable; the anchor is the k-trend shape (n=10 "
                "counts) and the euclidean-vs-geodesic relationship",
    }
    path = os.path.join(REPO, "experiment", "cov_blob_anchor.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["trend_comparison"], indent=1))
    print(f"wrote {path} and {plot_path}")


if __name__ == "__main__":
    main()
