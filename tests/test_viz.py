"""Visualization smoke tests: every plot function writes a readable PNG."""

import numpy as np
import pytest

from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
from vae_latent_geometry_tpu.viz import plotting


@pytest.fixture(scope="module")
def art(rng):
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis

    basis, _ = nullspace_basis(4)
    P = 5
    return SplineBatchArtifact(
        a=rng.normal(size=(P, 2)).astype(np.float32),
        b=rng.normal(size=(P, 2)).astype(np.float32),
        omega_init=(rng.normal(size=(P, 5, 2)) * 0.1).astype(np.float32),
        basis=basis, n_poly=4,
        pair_indices=np.arange(2 * P).reshape(P, 2),
        valid=np.array([True] * 4 + [False]),
        pair_labels=[["a", "b"]] * P,
        representatives=[{"index": i, "label": f"c{i}"} for i in range(4)],
        omega_optimized=(rng.normal(size=(P, 5, 2)) * 0.1).astype(np.float32),
        geodesic_length=np.ones(P, np.float32),
    )


@pytest.fixture(scope="module")
def latents(rng):
    return rng.normal(size=(300, 2)).astype(np.float32)


def _check(path):
    assert path.exists() and path.stat().st_size > 1000


def test_density_with_splines(tmp_path, art, latents, rng):
    labels = np.array([f"c{i % 5}" for i in range(len(latents))])
    out = tmp_path / "density.png"
    plotting.plot_latent_density_with_splines(latents, labels, art, str(out),
                                              res=50)
    _check(out)


def test_latents_with_selected(tmp_path, art, latents):
    out = tmp_path / "sel.png"
    plotting.plot_latents_with_selected(latents, art.representatives, str(out))
    _check(out)


def test_init_and_both_splines(tmp_path, art, latents):
    out1 = tmp_path / "init.png"
    plotting.plot_initialized_splines(latents, art, str(out1))
    _check(out1)
    out2 = tmp_path / "both.png"
    plotting.plot_initial_and_optimized_splines(latents, art, str(out2))
    _check(out2)


def test_uncertainty_map(tmp_path, latents):
    import jax

    from vae_latent_geometry_tpu.config import ModelConfig
    from vae_latent_geometry_tpu.models.evae import evae_init

    params = evae_init(jax.random.PRNGKey(0),
                       ModelConfig(input_dim=8, num_decoders=3,
                                   encoder_hidden=(8,), decoder_hidden=(8,)))
    out = tmp_path / "unc.png"
    plotting.plot_uncertainty_map(params, latents, str(out), resolution=20)
    _check(out)


def test_metric_ellipses_and_pullback(tmp_path, rng):
    import jax
    import matplotlib.pyplot as plt

    from vae_latent_geometry_tpu.models import nets

    dec = nets.decoder_init(jax.random.PRNGKey(1), 2, 6, (8,))
    path = rng.normal(size=(60, 2)).astype(np.float32)
    G = plotting.pullback_metrics(dec, path)
    assert G.shape == (60, 2, 2)
    # metrics are PSD
    eig = np.linalg.eigvalsh(G)
    assert (eig > -1e-5).all()
    fig, ax = plt.subplots()
    plotting.plot_metric_ellipses(ax, path, G, every=10)
    out = tmp_path / "ell.png"
    fig.savefig(out)
    plt.close(fig)
    _check(out)


def test_loss_and_cov_curves(tmp_path):
    out = tmp_path / "loss.png"
    plotting.plot_loss_curves(np.linspace(3, 1, 10), np.linspace(3.2, 1.2, 10),
                              str(out))
    _check(out)

    from vae_latent_geometry_tpu.pipeline.evaluate import CovResult

    cov = CovResult(
        avg_cov_geodesic={1: 0.2, 2: 0.1}, avg_cov_euclidean=0.25,
        raw_cov_geodesic={1: np.array([0.2]), 2: np.array([0.1])},
        raw_cov_euclidean=np.array([0.25]),
        lengths=np.ones((2, 1, 2)), euclidean=np.ones((2, 1)),
        seeds=[1, 2], decoder_counts=[1, 2],
    )
    out2 = tmp_path / "cov.png"
    plotting.plot_cov_curves(cov, str(out2))
    _check(out2)


def test_distance_heatmap(tmp_path):
    mat = np.random.default_rng(0).random((6, 6))
    out = tmp_path / "mat.png"
    plotting.plot_distance_matrix(mat, [f"c{i}" for i in range(6)], str(out),
                                  "test")
    _check(out)


def test_cov_hist(tmp_path):
    out = tmp_path / "cov_hist.png"
    vals = np.random.default_rng(1).normal(0.1, 0.05, 45).clip(0.001)
    plotting.plot_cov_hist(vals, str(out))
    _check(out)


def test_density_illustration(tmp_path, art, latents):
    out = tmp_path / "illustration.png"
    colors = np.array(["#ff0000", "#00ff00"] * (len(latents) // 2))
    plotting.plot_density_illustration(latents, art, str(out),
                                       point_colors=colors, res=40, seed=12)
    _check(out)
