"""Real-data golden reproduction of the reference's single-decoder pipeline.

Two tiers, both driven by the reference's REAL artifacts (the raw PCA data
``tasic-pca50.npy`` is a missing blob upstream, but the encoded latents,
trained VAEs, pair files and golden outputs are all checked in):

A. *Trajectory goldens* (identical inits): load the reference's optimized
   spline blobs — ``optimized_geodesics_seed12_p50.pt`` (1225 splines) and
   ``spline_batch_optimized_batched_seed123.pt`` (1223) — which carry the
   reference's own ``omega_init`` AND its final ``length_geodesic``.
   Re-optimize from the same inits with the same config (500 Adam steps,
   lr 1e-3, T=2000, endpoint weight 1000; reference
   ``src/single_decoder/optimize_energy_batched.py:59-125``) through the
   TPU-native optimizer and compare final lengths elementwise.

B. *Full-matrix reproduction* (own init): run select-pairs (from the
   reference's ``selected_pairs_133.json``) -> Dijkstra init (Euclidean
   200x200 grid, k=8; reference ``src/single_decoder/init_spline.py``) ->
   500-step optimization -> 133x133 distance matrix from the REAL latents of
   seeds 12 and 123, and compare against the golden
   ``geodesic_distances_seed{12,123}_p133.json`` on common labels.

Writes experiment/golden_real_data.json with the comparison stats.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference/src/artifacts"

MODE = os.environ.get("GOLDEN_MODE", "single_fused")


def _setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def _optimize(decoder, omega0, a, b, basis, steps=500, num_t=2000,
              batch_size=None):
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.geometry import energy as E
    from vae_latent_geometry_tpu.geometry.spline import (
        design_matrix,
        eval_spline_design,
    )
    from vae_latent_geometry_tpu.optim.geodesic import optimize_splines

    cfg = GeodesicConfig(steps=steps, lr=1e-3,
                         energy=EnergyConfig(num_t=num_t, mode=MODE))
    B = omega0.shape[0]
    bs = batch_size or B
    omega_out = np.zeros_like(omega0)
    for start in range(0, B, bs):
        stop = min(start + bs, B)
        idx = np.arange(start, stop)
        if stop - start < bs:  # pad to the compiled shape
            idx = np.concatenate([idx, np.full(bs - (stop - start), stop - 1)])
        res = optimize_splines(decoder, jnp.asarray(omega0[idx]),
                               jnp.asarray(a[idx]), jnp.asarray(b[idx]),
                               basis, cfg)
        omega_out[start:stop] = np.asarray(res.omega)[:stop - start]

    # final data-space lengths at T=2000 (reference
    # compute_geodesic_lengths, optimize_energy_batched.py:42-49)
    t = jnp.linspace(0.0, 1.0, num_t)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    lengths = np.zeros(B, np.float64)
    for start in range(0, B, bs):
        stop = min(start + bs, B)
        idx = np.arange(start, stop)
        if stop - start < bs:
            idx = np.concatenate([idx, np.full(bs - (stop - start), stop - 1)])
        gamma = eval_spline_design(jnp.asarray(omega_out[idx]),
                                   jnp.asarray(a[idx]), jnp.asarray(b[idx]),
                                   phi, t)
        lengths[start:stop] = np.asarray(
            E.geodesic_lengths(decoder, gamma))[:stop - start]
    return omega_out, lengths


def _stats(ours, golden):
    ours, golden = np.asarray(ours, float), np.asarray(golden, float)
    ok = np.isfinite(ours) & np.isfinite(golden) & (golden > 0)
    rel = np.abs(ours[ok] - golden[ok]) / golden[ok]
    return {
        "n": int(ok.sum()),
        "median_rel": float(np.median(rel)),
        "p90_rel": float(np.percentile(rel, 90)),
        "max_rel": float(np.max(rel)),
        "corr": float(np.corrcoef(ours[ok], golden[ok])[0, 1]),
    }


def tier_a():
    import torch

    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.models.torch_import import (
        load_single_vae_mean_decoder,
    )

    basis, _ = nullspace_basis(4)
    results = {}
    for seed, blob_name in ((12, "optimized_geodesics_seed12_p50.pt"),
                            (123, "spline_batch_optimized_batched_seed123.pt")):
        blob = torch.load(f"{REF}/{blob_name}", map_location="cpu",
                          weights_only=False)
        entries = blob if isinstance(blob, list) else blob["spline_data"]
        a = np.stack([e["a"].numpy() for e in entries]).astype(np.float32)
        b = np.stack([e["b"].numpy() for e in entries]).astype(np.float32)
        omega0 = np.stack([e["omega_init"].numpy() for e in entries]).astype(np.float32)
        golden_len = np.array([e["length_geodesic"] for e in entries])
        golden_omega = np.stack([e["omega_optimized"].numpy() for e in entries])

        decoder = load_single_vae_mean_decoder(f"{REF}/vae_best_seed{seed}.pth")
        t0 = time.perf_counter()
        omega, lengths = _optimize(decoder, omega0, a, b, basis,
                                   batch_size=512)
        dt = time.perf_counter() - t0
        st = _stats(lengths, golden_len)
        st["omega_rmse"] = float(np.sqrt(np.mean((omega - golden_omega) ** 2)))
        st["wall_s"] = round(dt, 1)
        st["blob"] = blob_name
        results[f"seed{seed}_p50_trajectory"] = st
        print(f"[tier A seed {seed}] n={st['n']} median_rel="
              f"{st['median_rel']:.2e} p90={st['p90_rel']:.2e} "
              f"corr={st['corr']:.6f} ({dt:.0f}s)", flush=True)
    return results


def tier_b():
    """Full-matrix reproduction — thin wrapper over the library pipeline
    (``vae_latent_geometry_tpu.pipeline.golden``), which owns the matrix
    assembly, label alignment and comparison statistics."""
    from vae_latent_geometry_tpu.pipeline import golden as G

    results = {}
    for seed in (12, 123):
        t0 = time.perf_counter()
        mat, labels, art = G.reproduce_matrix(
            seed, steps=500, num_t=2000, batch_size=512, mode=MODE,
            log=False)
        dt = time.perf_counter() - t0
        rep = G.compare_to_golden(mat, labels, seed)
        st = dict(rep["vs_golden"])
        st["wall_s"] = round(dt, 1)
        st["n_valid_pairs"] = int(art.valid.sum())
        results[f"seed{seed}_p133_matrix"] = st
        print(f"[tier B seed {seed}] matrix n={st['n_common']} median_rel="
              f"{st['median_rel']:.3f} corr={st['pearson_r']:.4f} frob_rel="
              f"{st['rel_frobenius']:.3f} ({dt:.0f}s)", flush=True)
    return results


def main():
    _setup_jax()
    out = {"mode": MODE}
    tiers = sys.argv[1:] or ["a", "b"]
    if "a" in tiers:
        out.update(tier_a())
    if "b" in tiers:
        out.update(tier_b())
    path = os.path.join(REPO, "experiment", "golden_real_data.json")
    existing = {}
    if os.path.exists(path):
        existing = json.load(open(path))
    existing.update(out)
    with open(path, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
