"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

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
