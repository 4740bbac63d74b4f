"""Real-data golden reproduction of the reference's 133x133 single-decoder
geodesic distance matrices.

The reference ships everything needed to rerun its single-decoder pipeline on
REAL data end-to-end (the raw ``tasic-pca50.npy`` blob is missing upstream,
but the *encoded latents* are checked in):

- ``src/artifacts/latents_VAE_ld2_ep100_bs64_lr1e-03_seed{12,123}.npy`` —
  real encoder means for all 23,822 cells (written by
  ``src/single_decoder/vae_train.py:118-122``),
- ``src/artifacts/selected_pairs_133.json`` — the exact representatives and
  8,778 pairs used for the golden run (``src/select_representative_pairs.py``),
- ``src/artifacts/vae_best_seed{12,123}.pth`` — the trained VAEs whose decoder
  defines the pullback geometry (``optimize_energy_batched.py:70-75``),
- ``src/artifacts/geodesic_distances_seed{12,123}_p133.json`` — the golden
  output matrices (written by ``src/single_decoder/density_batched.py:135-142``).

This module re-runs select -> init -> optimize -> matrix with THIS framework
(Dijkstra + closed-form lstsq init, fused TPU energy kernels, batched Adam)
and compares elementwise to the golden JSON.  Semantics pinned to the
reference scripts:

- endpoints are the Dijkstra path's *grid nodes*, not the raw latents
  (``init_spline.py:117`` — ``a, b = target[0], target[-1]``),
- 200x200 grid with 10% margin, k=8 Euclidean kNN graph
  (``init_spline.py:79-80``),
- Adam lr 1e-3, 500 steps, T=2000, batch 500
  (``optimize_energy_batched.py:95-104,132``),
- geodesic length = data-space arc length sum ||dx|| through the decoder
  *mean* (``optimize_energy_batched.py:42-49``), NOT sqrt(energy).

Exact elementwise equality is not attainable: the reference's LBFGS init fit
(50 iters) and scipy's Dijkstra tie-breaking differ from our exact lstsq fit
and native Dijkstra on equal-weight paths, so a few pairs can settle into
different-but-equivalent curves.  The comparison therefore reports
distribution-level statistics (median/mean relative error, Pearson r,
relative Frobenius distance) and, as the natural scale for "how close is
close", the same statistics between the two golden seeds themselves.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig, InitConfig
from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
from vae_latent_geometry_tpu.pipeline.evaluate import distance_matrix
from vae_latent_geometry_tpu.pipeline.init_splines import initialize_splines
from vae_latent_geometry_tpu.pipeline.optimize_stage import optimize_spline_batch

REFERENCE_ROOT = "/root/reference"


def reference_latents(seed: int, root: str = REFERENCE_ROOT) -> np.ndarray:
    """Real encoder means (23822, 2) from the reference's committed artifact."""
    path = os.path.join(
        root, "src", "artifacts",
        f"latents_VAE_ld2_ep100_bs64_lr1e-03_seed{seed}.npy")
    return np.load(path).astype(np.float32)


def reference_pairs(n: int = 133, root: str = REFERENCE_ROOT
                    ) -> Tuple[list, np.ndarray]:
    """(representatives, pairs) from ``selected_pairs_{n}.json``."""
    from vae_latent_geometry_tpu.pipeline.select_pairs import load_pairs

    path = os.path.join(root, "src", "artifacts", f"selected_pairs_{n}.json")
    reps, pairs = load_pairs(path)
    return reps, np.asarray(pairs, np.int64)


def golden_matrix(seed: int, root: str = REFERENCE_ROOT
                  ) -> Tuple[np.ndarray, list]:
    path = os.path.join(root, "src", "artifacts",
                        f"geodesic_distances_seed{seed}_p133.json")
    doc = json.load(open(path))
    return np.asarray(doc["distance_matrix"], float), list(doc["cluster_ids"])


def build_init_artifact(seed: int, root: str = REFERENCE_ROOT,
                        pairs_limit: Optional[int] = None,
                        n_pairs_file: int = 133) -> SplineBatchArtifact:
    """Initialize splines for the golden workload from the REAL latents."""
    latents = reference_latents(seed, root)
    reps, pairs = reference_pairs(n_pairs_file, root)
    if pairs_limit is not None:
        pairs = pairs[:pairs_limit]
    label_of = {int(r["index"]): str(r["label"]) for r in reps}

    init = initialize_splines(latents, pairs, cfg=InitConfig())
    pair_labels = [[label_of[int(ia)], label_of[int(ib)]]
                   for ia, ib in pairs]
    return SplineBatchArtifact(
        a=init.a, b=init.b, omega_init=init.omega, basis=init.basis,
        n_poly=init.n_poly, pair_indices=init.pair_indices, valid=init.valid,
        pair_labels=pair_labels, representatives=list(reps),
        metadata={"seed": seed, "init_type": init.init_type,
                  "source": "reference real latents"},
    )


def reproduce_matrix(
    seed: int,
    root: str = REFERENCE_ROOT,
    steps: int = 500,
    num_t: int = 2000,
    batch_size: int = 500,
    mode: str = "single_fused",
    pairs_limit: Optional[int] = None,
    checkpoint_path: Optional[str] = None,
    log: bool = True,
) -> Tuple[np.ndarray, list, SplineBatchArtifact]:
    """Full real-data single-decoder pipeline run -> (matrix, labels, blob)."""
    from vae_latent_geometry_tpu.models.torch_import import (
        load_single_vae_mean_decoder,
    )

    art = build_init_artifact(seed, root, pairs_limit=pairs_limit)
    params = load_single_vae_mean_decoder(
        os.path.join(root, "src", "artifacts", f"vae_best_seed{seed}.pth"))
    cfg = GeodesicConfig(
        steps=steps, batch_size=batch_size,
        energy=EnergyConfig(num_t=num_t, mode=mode))
    out = optimize_spline_batch(params, art, cfg=cfg,
                                checkpoint_path=checkpoint_path,
                                log_every_chunk=log)
    mat, labels = distance_matrix(out)
    return mat, labels, out


def align_by_labels(mat_a: np.ndarray, labels_a: Sequence[str],
                    mat_b: np.ndarray, labels_b: Sequence[str]
                    ) -> Tuple[np.ndarray, np.ndarray, list]:
    """Restrict two label-indexed matrices to their common labels, in the
    first matrix's label order."""
    common = [l for l in labels_a if l in set(labels_b)]
    ia = [list(labels_a).index(l) for l in common]
    ib = [list(labels_b).index(l) for l in common]
    return mat_a[np.ix_(ia, ia)], mat_b[np.ix_(ib, ib)], common


def matrix_stats(ours: np.ndarray, golden: np.ndarray) -> Dict[str, float]:
    """Distribution-level agreement statistics over common finite
    off-diagonal entries (upper triangle)."""
    n = ours.shape[0]
    iu = np.triu_indices(n, k=1)
    x, y = ours[iu], golden[iu]
    ok = np.isfinite(x) & np.isfinite(y)
    x, y = x[ok], y[ok]
    rel = np.abs(x - y) / np.maximum(np.abs(y), 1e-12)
    fro = float(np.linalg.norm(x - y) / max(np.linalg.norm(y), 1e-12))
    corr = float(np.corrcoef(x, y)[0, 1]) if len(x) > 1 else float("nan")
    return {
        "n_common": int(ok.sum()),
        "n_total": int(len(ok)),
        "median_rel": float(np.median(rel)),
        "mean_rel": float(np.mean(rel)),
        "p90_rel": float(np.quantile(rel, 0.9)),
        "max_rel": float(np.max(rel)) if len(rel) else float("nan"),
        "pearson_r": corr,
        "rel_frobenius": fro,
    }


def compare_to_golden(mat: np.ndarray, labels: Sequence[str], seed: int,
                      root: str = REFERENCE_ROOT) -> Dict[str, object]:
    """Compare a reproduced matrix against the golden JSON for ``seed``;
    also reports the golden-vs-golden cross-seed stats as the scale bar."""
    gold, gold_labels = golden_matrix(seed, root)
    ours_c, gold_c, common = align_by_labels(mat, labels, gold, gold_labels)
    stats = matrix_stats(ours_c, gold_c)

    other = 123 if seed == 12 else 12
    try:
        g2, g2_labels = golden_matrix(other, root)
        ga, gb, _ = align_by_labels(gold, gold_labels, g2, g2_labels)
        cross = matrix_stats(ga, gb)
    except FileNotFoundError:  # pragma: no cover
        cross = None
    return {
        "seed": seed,
        "n_labels_ours": len(labels),
        "n_labels_golden": len(gold_labels),
        "n_labels_common": len(common),
        "vs_golden": stats,
        "golden_cross_seed_scale": cross,
    }


def run_golden(seed: int, out_dir: str, root: str = REFERENCE_ROOT,
               steps: int = 500, num_t: int = 2000, batch_size: int = 500,
               mode: str = "single_fused",
               pairs_limit: Optional[int] = None) -> Dict[str, object]:
    """Run the reproduction and write matrix + comparison JSON artifacts."""
    os.makedirs(out_dir, exist_ok=True)
    # config-stamped checkpoint name: resume must never silently serve a
    # DIFFERENT config's results (the canonical 500-step blob is committed).
    # RESULTS are batch-size-invariant for the deterministic modes (each
    # spline optimizes independently), but the optimize stage's resume
    # stamp keys the whole recipe INCLUDING batch_size (it must: the MC
    # modes fold their key streams per chunk start), so a non-default
    # batch_size gets its own checkpoint file — otherwise every rerun with
    # a different batch_size would loudly discard and overwrite the
    # canonical blob, thrashing between the two configs.
    canonical = (steps == 500 and num_t == 2000 and mode == "single_fused"
                 and pairs_limit is None and batch_size == 500)
    stamp = "" if canonical else (
        f"_{mode}_s{steps}_t{num_t}"
        + (f"_bs{batch_size}" if batch_size != 500 else "")
        + (f"_p{pairs_limit}" if pairs_limit is not None else ""))
    ckpt = os.path.join(out_dir, f"golden133_seed{seed}_blob{stamp}.npz")
    mat, labels, art = reproduce_matrix(
        seed, root, steps=steps, num_t=num_t, batch_size=batch_size,
        mode=mode, pairs_limit=pairs_limit, checkpoint_path=ckpt)
    with open(os.path.join(out_dir, f"golden133_seed{seed}_matrix.json"),
              "w") as f:
        json.dump({"seed": seed, "cluster_ids": list(labels),
                   "distance_matrix": mat.tolist()}, f)
    report = compare_to_golden(mat, labels, seed, root)
    report["config"] = {"steps": steps, "num_t": num_t,
                        "batch_size": batch_size, "mode": mode,
                        "pairs_limit": pairs_limit}
    with open(os.path.join(out_dir, f"golden133_seed{seed}_compare.json"),
              "w") as f:
        json.dump(report, f, indent=2)
    return report
