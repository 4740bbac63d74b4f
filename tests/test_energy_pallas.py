"""Fused Pallas energy kernel vs the XLA reference path (interpret mode on
CPU; compiled on real TPU via bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_latent_geometry_tpu.geometry import energy as E
from vae_latent_geometry_tpu.models import nets
from vae_latent_geometry_tpu.models.evae import stack_decoders
from vae_latent_geometry_tpu.ops.energy_pallas import (
    energy_expected_fused,
    fused_available,
)

pytestmark = pytest.mark.skipif(not fused_available(),
                                reason="pallas unavailable")


@pytest.fixture(scope="module")
def setup(rng):
    decs = stack_decoders([
        nets.decoder_init(k, 2, 50, (128, 128))
        for k in jax.random.split(jax.random.PRNGKey(0), 4)
    ])
    T, B = 64, 8
    gamma = jnp.asarray(rng.normal(size=(T, B, 2)) * 1.5, jnp.float32)
    return decs, gamma


def test_forward_matches_xla(setup):
    decs, gamma = setup
    e_ref = np.asarray(E.energy_expected(decs, gamma))
    e_fused = np.asarray(energy_expected_fused(decs, gamma))
    np.testing.assert_allclose(e_fused, e_ref, rtol=1e-5)


def test_backward_matches_xla(setup):
    decs, gamma = setup
    g_ref = jax.grad(lambda g: jnp.sum(E.energy_expected(decs, g)))(gamma)
    g_fused = jax.grad(
        lambda g: jnp.sum(energy_expected_fused(decs, g)))(gamma)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_backward_weighted_cotangent(setup):
    """Per-spline cotangents flow correctly (loss = <w, E>)."""
    decs, gamma = setup
    w = jnp.asarray(np.linspace(0.5, 2.0, gamma.shape[1]), jnp.float32)
    g_ref = jax.grad(lambda g: jnp.sum(w * E.energy_expected(decs, g)))(gamma)
    g_fused = jax.grad(
        lambda g: jnp.sum(w * energy_expected_fused(decs, g)))(gamma)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_uneven_chunking(rng):
    """T with a small prime factor still splits into valid chunks."""
    decs = stack_decoders([
        nets.decoder_init(k, 2, 10, (16,))
        for k in jax.random.split(jax.random.PRNGKey(1), 3)
    ])
    for T in (10, 25, 33):
        gamma = jnp.asarray(rng.normal(size=(T, 4, 2)), jnp.float32)
        e_ref = np.asarray(E.energy_expected(decs, gamma))
        e_fused = np.asarray(energy_expected_fused(decs, gamma))
        np.testing.assert_allclose(e_fused, e_ref, rtol=1e-5,
                                   err_msg=f"T={T}")


def test_bfloat16_mode_close(setup):
    decs, gamma = setup
    e_ref = np.asarray(E.energy_expected(decs, gamma))
    e_bf = np.asarray(energy_expected_fused(decs, gamma, "bfloat16"))
    np.testing.assert_allclose(e_bf, e_ref, rtol=3e-2)


def test_fused_mode_in_optimizer(rng):
    """The optimizer runs end-to-end with the fused energy mode and matches
    the XLA expected mode."""
    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.optim.geodesic import optimize_splines

    decs = stack_decoders([
        nets.decoder_init(k, 2, 12, (16,))
        for k in jax.random.split(jax.random.PRNGKey(5), 3)
    ])
    B = 3
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    omega0 = jnp.zeros((B, 5, 2))
    cfg_f = GeodesicConfig(steps=40, lr=1e-2,
                           energy=EnergyConfig(num_t=32, mode="expected_fused"))
    cfg_x = GeodesicConfig(steps=40, lr=1e-2,
                           energy=EnergyConfig(num_t=32, mode="expected"))
    rf = optimize_splines(decs, omega0, a, b, basis, cfg_f)
    rx = optimize_splines(decs, omega0, a, b, basis, cfg_x)
    np.testing.assert_allclose(np.asarray(rf.energy), np.asarray(rx.energy),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rf.omega), np.asarray(rx.omega),
                               rtol=1e-3, atol=1e-5)


def test_vmem_guard_falls_back_for_huge_batches(rng):
    """Oversized batches route to the XLA path instead of a doomed compile."""
    from vae_latent_geometry_tpu.ops.energy_pallas import fused_fits

    assert fused_fits(2000, 200, 2, 50, 10, mc=False)
    assert fused_fits(2000, 200, 2, 50, 10, mc=True)
    assert not fused_fits(2000, 400, 2, 50, 10, mc=True)
    # the optimizer still works (falls back silently) at a huge batch
    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.optim.geodesic import optimize_splines

    decs = stack_decoders([
        nets.decoder_init(k, 2, 50, (128, 128))
        for k in jax.random.split(jax.random.PRNGKey(0), 10)
    ])
    B = 4096  # way over the kernel budget at T=2000... use small T for speed
    B, T = 600, 2000
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    cfg = GeodesicConfig(steps=2, energy=EnergyConfig(num_t=16, mode="mc_fused"))
    res = optimize_splines(decs, jnp.zeros((B, 5, 2)), a, b, basis, cfg)
    assert np.isfinite(np.asarray(res.energy)).all()
