"""Evaluation layer: distance matrices, CoV, per-spline active decoders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_latent_geometry_tpu.geometry import energy as E
from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
from vae_latent_geometry_tpu.models import nets
from vae_latent_geometry_tpu.models.evae import EVAEParams, stack_decoders
from vae_latent_geometry_tpu.pipeline.evaluate import (
    compute_cov,
    cov_analysis,
    distance_matrix,
)


def _mini_artifact():
    reps = [{"index": 3, "label": "A"}, {"index": 9, "label": "B"},
            {"index": 20, "label": "C"}]
    pair_idx = np.array([[3, 9], [3, 20], [9, 20]])
    return SplineBatchArtifact(
        a=np.zeros((3, 2)), b=np.ones((3, 2)),
        omega_init=np.zeros((3, 5, 2)), basis=np.zeros((16, 5)), n_poly=4,
        pair_indices=pair_idx, valid=np.array([True, True, False]),
        pair_labels=[["A", "B"], ["A", "C"], ["B", "C"]],
        representatives=reps,
        geodesic_length=np.array([1.5, 2.5, 3.5]),
        euclidean_distance=np.array([0.5, 0.7, 0.9]),
    )


def test_distance_matrix_symmetric_with_nan_holes():
    mat, labels = distance_matrix(_mini_artifact(), "geodesic")
    assert labels == ["A", "B", "C"]
    assert mat[0, 1] == mat[1, 0] == 1.5
    assert mat[0, 2] == mat[2, 0] == 2.5
    assert np.isnan(mat[1, 2]) and np.isnan(mat[2, 1])  # invalid pair -> hole
    assert np.all(np.diag(mat) == 0)


def test_distance_matrix_euclidean():
    mat, _ = distance_matrix(_mini_artifact(), "euclidean")
    assert mat[0, 1] == 0.5


def test_compute_cov_matches_definition():
    v = np.array([1.0, 2.0, 3.0])
    assert compute_cov(v) == pytest.approx(np.std(v) / np.mean(v))
    assert compute_cov(np.zeros(3)) == 0.0  # zero-mean guard


def _rand_ensemble(key, m=4, latent=2, out=6):
    return stack_decoders([
        nets.decoder_init(k, latent, out, (16,))
        for k in jax.random.split(key, m)
    ])


def test_num_active_expected_matches_subensemble(rng):
    """energy_expected with num_active=k equals energy_expected of the
    sub-ensemble of the first k decoders."""
    decs = _rand_ensemble(jax.random.PRNGKey(0), m=5)
    gamma = jnp.asarray(rng.normal(size=(20, 6, 2)), jnp.float32)
    for k in (1, 3, 5):
        sub = jax.tree_util.tree_map(lambda x: x[:k], decs)
        full = E.energy_expected(decs, gamma,
                                 num_active=jnp.full((6,), k, jnp.int32))
        ref = E.energy_expected(sub, gamma)
        np.testing.assert_allclose(np.asarray(full), np.asarray(ref),
                                   rtol=1e-5)


def test_num_active_mc_stays_in_range(rng):
    """MC with num_active=1 must equal the single-decoder-0 energy exactly
    (only decoder 0 can ever be drawn)."""
    decs = _rand_ensemble(jax.random.PRNGKey(1), m=4)
    gamma = jnp.asarray(rng.normal(size=(16, 3, 2)), jnp.float32)
    dec0 = jax.tree_util.tree_map(lambda x: x[0], decs)
    e_mc = E.energy_mc(decs, gamma, jax.random.PRNGKey(9), mc_samples=2,
                       num_active=jnp.ones((3,), jnp.int32))
    e_single = E.energy_single(dec0, gamma)
    np.testing.assert_allclose(np.asarray(e_mc), np.asarray(e_single),
                               rtol=1e-5)


def test_cov_analysis_shapes_and_sanity(rng):
    """Two synthetic 'seeds' x 3 pairs x 2 decoder counts, tiny steps."""
    latent, xdim = 2, 6

    def mk_model(seed):
        key = jax.random.PRNGKey(seed)
        enc = nets.encoder_init(jax.random.fold_in(key, 0), xdim, latent, (16,))
        decs = _rand_ensemble(jax.random.fold_in(key, 1), m=3,
                              latent=latent, out=xdim)
        return EVAEParams(encoder=enc, decoders=decs)

    models = [mk_model(0), mk_model(1)]
    data = rng.normal(size=(30, xdim)).astype(np.float32)
    pairs = [(0, 10), (5, 20), (7, 29)]
    res = cov_analysis(models, seeds=[0, 1], data=data, pairs=pairs,
                       decoder_counts=[1, 3], steps=20, num_t=32)
    assert res.lengths.shape == (2, 3, 2)
    assert res.euclidean.shape == (2, 3)
    assert set(res.avg_cov_geodesic) == {1, 3}
    for k, v in res.avg_cov_geodesic.items():
        assert 0 <= v < 5
    j = res.to_json()
    assert j["num_pairs"] == 3 and j["decoder_counts"] == [1, 3]


def test_cov_analysis_identical_models_zero_cov(rng):
    latent, xdim = 2, 6
    key = jax.random.PRNGKey(3)
    enc = nets.encoder_init(jax.random.fold_in(key, 0), xdim, latent, (16,))
    decs = _rand_ensemble(jax.random.fold_in(key, 1), m=2,
                          latent=latent, out=xdim)
    m = EVAEParams(encoder=enc, decoders=decs)
    data = rng.normal(size=(20, xdim)).astype(np.float32)
    res = cov_analysis([m, m], seeds=[0, 0], data=data,
                       pairs=[(0, 5), (2, 9)], decoder_counts=[2],
                       steps=15, num_t=32, mode="expected")
    np.testing.assert_allclose(res.raw_cov_geodesic[2], 0.0, atol=1e-6)
    np.testing.assert_allclose(res.raw_cov_euclidean, 0.0, atol=1e-6)


def test_full_run_pipeline(rng):
    """End-to-end distance pipeline on synthetic data in one call."""
    from vae_latent_geometry_tpu.config import (
        EnergyConfig,
        GeodesicConfig,
        InitConfig,
        ModelConfig,
        TrainConfig,
    )
    from vae_latent_geometry_tpu.pipeline.full_run import run_distance_pipeline
    from vae_latent_geometry_tpu.pipeline.train import train_evae

    n = 400
    labels = np.array([f"c{i % 5}" for i in range(n)])
    x = rng.normal(size=(n, 12)).astype(np.float32)
    x[:, :2] += 6 * np.stack([np.cos(2 * np.pi * (np.arange(n) % 5) / 5),
                              np.sin(2 * np.pi * (np.arange(n) % 5) / 5)], 1)
    mcfg = ModelConfig(input_dim=12, num_decoders=3, encoder_hidden=(16,),
                      decoder_hidden=(16,), decoder_sigma=1.0)
    tr = train_evae(x, TrainConfig(epochs=3, batch_size=64), mcfg, log_every=0)
    res = run_distance_pipeline(
        tr.params, x, labels, max_labels=5,
        init_cfg=InitConfig(grid_points_per_axis=30),
        geo_cfg=GeodesicConfig(steps=15, batch_size=10,
                               energy=EnergyConfig(num_t=48, mode="expected")),
        verbose=False,
    )
    assert res.matrix.shape == (5, 5)
    assert np.allclose(res.matrix, res.matrix.T, equal_nan=True)
    valid_vals = res.matrix[np.isfinite(res.matrix)]
    assert (valid_vals >= 0).all()
    assert res.timings["total"] > 0


def test_cov_drops_counts_above_ensemble_size(rng):
    """decoder_counts above the ensemble size silently corrupt the estimate
    (gather clamps / masks select nothing) — they must be dropped loudly."""
    import warnings

    import jax

    from vae_latent_geometry_tpu.config import ModelConfig
    from vae_latent_geometry_tpu.models.evae import evae_init
    from vae_latent_geometry_tpu.pipeline.evaluate import cov_analysis

    cfgm = ModelConfig(input_dim=8, num_decoders=3,
                       encoder_hidden=(8,), decoder_hidden=(8,))
    models = [evae_init(jax.random.PRNGKey(i), cfgm) for i in range(2)]
    x = rng.normal(size=(32, 8)).astype(np.float32)
    with pytest.warns(UserWarning, match="exceed the smallest ensemble"):
        res = cov_analysis(models, [0, 1], x, [(0, 1)],
                           decoder_counts=(1, 2, 3, 4, 5),
                           steps=5, num_t=32, mode="mc", batch_size=4)
    assert sorted(res.avg_cov_geodesic) == [1, 2, 3]

    with pytest.raises(ValueError, match="no decoder_counts"):
        cov_analysis(models, [0, 1], x, [(0, 1)], decoder_counts=(7,),
                     steps=2, num_t=32, mode="mc")


def test_cov_analysis_rep_latents_matches_encoding(rng):
    """rep_latents= (the CoV blob-anchor path, used when the raw dataset is
    unavailable) reproduces the data= path exactly when fed the same
    encoder latents."""
    import jax as _jax

    from vae_latent_geometry_tpu.models import evae as evae_lib

    latent, xdim = 2, 6

    def mk_model(seed):
        key = jax.random.PRNGKey(seed)
        enc = nets.encoder_init(jax.random.fold_in(key, 0), xdim, latent, (16,))
        decs = _rand_ensemble(jax.random.fold_in(key, 1), m=3,
                              latent=latent, out=xdim)
        return EVAEParams(encoder=enc, decoders=decs)

    models = [mk_model(0), mk_model(1)]
    data = rng.normal(size=(30, xdim)).astype(np.float32)
    pairs = [(0, 10), (5, 20), (7, 29)]
    res_data = cov_analysis(models, seeds=[0, 1], data=data, pairs=pairs,
                            decoder_counts=[1, 3], steps=20, num_t=32)
    lats = [np.asarray(_jax.jit(
        lambda p, x: evae_lib.encode(p, x)[0])(m, jnp.asarray(data)))
        for m in models]
    res_lat = cov_analysis(models, seeds=[0, 1], data=None, pairs=pairs,
                           decoder_counts=[1, 3], steps=20, num_t=32,
                           rep_latents=lats)
    np.testing.assert_array_equal(res_data.lengths, res_lat.lengths)
    np.testing.assert_array_equal(res_data.euclidean, res_lat.euclidean)

    with pytest.raises(ValueError, match="one latent array per model"):
        cov_analysis(models, seeds=[0, 1], data=None, pairs=pairs,
                     decoder_counts=[1], steps=2, num_t=32,
                     rep_latents=lats[:1])
