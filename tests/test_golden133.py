"""Real-data golden parity: reproduce (a slice of) the reference's 133x133
single-decoder geodesic distance matrix from its own committed REAL inputs.

The reference ships everything the golden run consumed: real encoder latents
(``src/artifacts/latents_VAE_ld2_ep100_bs64_lr1e-03_seed12.npy``), the exact
pairs (``selected_pairs_133.json``), the trained VAE (``vae_best_seed12.pth``)
and the golden output (``geodesic_distances_seed12_p133.json``, written by
``src/single_decoder/density_batched.py:135-142``).  This drives OUR pipeline
(Dijkstra + lstsq init -> batched Adam -> arc lengths) over the same inputs
and compares per-pair.

Tolerances are distribution-level: the reference's LBFGS init fit and scipy
Dijkstra tie-breaking differ from our exact lstsq and native Dijkstra on
equal-weight paths, so individual pairs can settle into different (equally
valid) curves.  Scale bar: the two golden seeds differ from EACH OTHER by
median ~21% rel / Pearson r ~0.75; our reproduction of seed 12 lands at
median ~1-2% / r ~0.97 (full 8,778-pair TPU run recorded in
``experiment/golden133_seed12_compare.json``).
"""

import numpy as np
import pytest

from tests.conftest import requires_reference


@requires_reference
def test_golden133_slice_reproduction():
    from vae_latent_geometry_tpu.pipeline import golden as G

    mat, labels, art = G.reproduce_matrix(
        12, steps=300, num_t=1000, batch_size=16, mode="single",
        pairs_limit=16, log=False)
    assert art.valid.all()
    rep = G.compare_to_golden(mat, labels, 12)
    stats = rep["vs_golden"]
    assert stats["n_common"] == 16
    assert stats["median_rel"] < 0.06, stats
    assert stats["pearson_r"] > 0.90, stats
    # reproduction error must sit far inside the golden cross-seed spread
    cross = rep["golden_cross_seed_scale"]
    assert stats["median_rel"] < 0.5 * cross["median_rel"]


@requires_reference
def test_golden_cross_seed_scale_bar():
    """The scale bar itself: the two golden seeds are FAR apart (median ~21%)
    — pinning this guards against ever reading the reproduction tolerance as
    loose."""
    from vae_latent_geometry_tpu.pipeline import golden as G

    g12, l12 = G.golden_matrix(12)
    g123, l123 = G.golden_matrix(123)
    a, b, common = G.align_by_labels(g12, l12, g123, l123)
    assert len(common) >= 125
    stats = G.matrix_stats(a, b)
    assert stats["median_rel"] > 0.1
    assert stats["pearson_r"] < 0.9


@requires_reference
def test_golden_init_artifact_shapes():
    from vae_latent_geometry_tpu.pipeline import golden as G

    art = G.build_init_artifact(12, pairs_limit=64)
    assert len(art) == 64
    assert art.valid.sum() >= 60          # golden seed12 matrix has no holes
    assert len(art.representatives) == 133
    # endpoints are grid nodes near the latents, not the latents themselves
    lat = G.reference_latents(12)
    pa = lat[art.pair_indices[:, 0]]
    d = np.linalg.norm(art.a - pa, axis=1)
    assert (d > 0).any() and d.max() < 0.1


def test_committed_reproduction_artifacts():
    """The committed full-run comparison artifacts must meet the claimed
    bars (median rel ~1%, r > 0.97) — guards against regressions silently
    degrading the real-data reproduction.  Deliberately NOT gated on the
    reference mount: it reads only repo-committed files, so it must run
    everywhere."""
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "experiment")
    for seed in (12, 123):
        path = os.path.join(root, f"golden133_seed{seed}_compare.json")
        if not os.path.exists(path):
            pytest.skip("full-run artifacts not yet generated")
        rep = json.load(open(path))
        s = rep["vs_golden"]
        assert s["n_common"] > 8000
        assert s["median_rel"] < 0.03, s
        assert s["pearson_r"] > 0.95, s


@requires_reference
def test_cross_seed_spread_statistical_parity():
    """Our reproduced matrices must mirror the reference's cross-seed
    variability structure (per-entry spread correlation; see
    pipeline/stability.cross_seed_spread_comparison)."""
    import json
    import os

    from vae_latent_geometry_tpu.pipeline import golden as G
    from vae_latent_geometry_tpu.pipeline.stability import (
        cross_seed_spread_comparison,
    )

    root = os.path.join(os.path.dirname(__file__), "..", "experiment")
    mats, labels = [], []
    for seed in (12, 123):
        path = os.path.join(root, f"golden133_seed{seed}_matrix.json")
        if not os.path.exists(path):
            pytest.skip("full-run artifacts not yet generated")
        d = json.load(open(path))
        mats.append(np.asarray(d["distance_matrix"], float))
        labels.append(d["cluster_ids"])
    g12, l12 = G.golden_matrix(12)
    g123, l123 = G.golden_matrix(123)
    rep = cross_seed_spread_comparison(tuple(mats), tuple(labels),
                                       (g12, g123), (l12, l123))
    assert rep["n_entries"] > 8000
    assert rep["spread_correlation"] > 0.9, rep
    assert abs(rep["mean_spread_ours"] - rep["mean_spread_golden"]) < 0.05
