"""Fused MC energy kernel vs a direct numpy evaluation with identical
decoder-index draws (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_latent_geometry_tpu.models import nets
from vae_latent_geometry_tpu.models.evae import decode_all, stack_decoders
from vae_latent_geometry_tpu.ops.energy_mc_pallas import (
    energy_mc_fused,
    sample_decoder_indices,
)
from vae_latent_geometry_tpu.ops.energy_pallas import fused_available

pytestmark = pytest.mark.skipif(not fused_available(),
                                reason="pallas unavailable")


@pytest.fixture(scope="module")
def setup(rng):
    decs = stack_decoders([
        nets.decoder_init(k, 2, 50, (128, 128))
        for k in jax.random.split(jax.random.PRNGKey(0), 5)
    ])
    T, B = 48, 6
    gamma = jnp.asarray(rng.normal(size=(T, B, 2)) * 1.5, jnp.float32)
    d1, d2 = sample_decoder_indices(jax.random.PRNGKey(3), T, B, 5,
                                    mc_samples=2)
    return decs, gamma, d1, d2


def _reference_energy(decs, gamma, d1, d2):
    """Direct numpy evaluation of the sampled estimator."""
    decoded = np.asarray(decode_all(decs, gamma))      # (M, T, B, X)
    S, Tm1, B = d1.shape
    total = np.zeros(B)
    for s in range(S):
        for t in range(Tm1):
            for b in range(B):
                x1 = decoded[d1[s, t, b], t, b]
                x2 = decoded[d2[s, t, b], t + 1, b]
                total[b] += np.sum((x2 - x1) ** 2)
    return total / S


def test_forward_matches_direct(setup):
    decs, gamma, d1, d2 = setup
    ref = _reference_energy(decs, gamma, np.asarray(d1), np.asarray(d2))
    got = np.asarray(energy_mc_fused(decs, gamma, d1, d2))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_forward_matches_xla_energy_mc_distribution(setup, rng):
    """Same expectation as the XLA MC estimator: with many draws the fused
    kernel's mean matches energy_expected."""
    from vae_latent_geometry_tpu.geometry import energy as E

    decs, gamma, _, _ = setup
    exp = np.asarray(E.energy_expected(decs, gamma))
    # jit once: each un-jitted call rebuilds + re-traces the pallas_call
    # (interpret mode), which made this test dominate the suite wall clock.
    fused = jax.jit(lambda d1, d2: energy_mc_fused(decs, gamma, d1, d2))
    draws = []
    for i in range(60):
        d1, d2 = sample_decoder_indices(jax.random.PRNGKey(100 + i),
                                        gamma.shape[0], gamma.shape[1], 5,
                                        mc_samples=1)
        draws.append(np.asarray(fused(d1, d2)))
    np.testing.assert_allclose(np.mean(draws, axis=0), exp, rtol=0.08)


def test_backward_matches_autodiff_of_equivalent(setup):
    """Fused VJP vs jax.grad of an XLA one-hot formulation with the SAME
    indices."""
    decs, gamma, d1, d2 = setup
    m_dec = 5

    def xla_energy(g):
        decoded = decode_all(decs, g)                  # (M, T, B, X)
        S = d1.shape[0]
        total = 0.0
        for s in range(S):
            oh1 = jax.nn.one_hot(d1[s], m_dec, dtype=g.dtype)
            oh2 = jax.nn.one_hot(d2[s], m_dec, dtype=g.dtype)
            x1 = jnp.einsum("tbm,mtbx->tbx", oh1, decoded[:, :-1])
            x2 = jnp.einsum("tbm,mtbx->tbx", oh2, decoded[:, 1:])
            total = total + jnp.sum((x2 - x1) ** 2, axis=(0, 2))
        return total / S

    w = jnp.asarray(np.linspace(0.5, 2.0, gamma.shape[1]), jnp.float32)
    g_ref = jax.grad(lambda g: jnp.sum(w * xla_energy(g)))(gamma)
    g_fused = jax.grad(
        lambda g: jnp.sum(w * energy_mc_fused(decs, g, d1, d2)))(gamma)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_num_active_respected(rng):
    decs = stack_decoders([
        nets.decoder_init(k, 2, 8, (16,))
        for k in jax.random.split(jax.random.PRNGKey(1), 4)
    ])
    T, B = 20, 3
    gamma = jnp.asarray(rng.normal(size=(T, B, 2)), jnp.float32)
    d1, d2 = sample_decoder_indices(jax.random.PRNGKey(0), T, B, 4,
                                    num_active=np.array([1, 2, 4]))
    assert int(jnp.max(d1[:, :, 0])) == 0
    assert int(jnp.max(d1[:, :, 1])) <= 1
    e = np.asarray(energy_mc_fused(decs, gamma, d1, d2))
    # spline 0 only ever uses decoder 0 -> equals single-decoder energy
    from vae_latent_geometry_tpu.geometry import energy as E

    dec0 = jax.tree_util.tree_map(lambda x: x[0], decs)
    e0 = np.asarray(E.energy_single(dec0, gamma))[0]
    np.testing.assert_allclose(e[0], e0, rtol=1e-4)


def test_mc_fused_mode_in_optimizer(rng):
    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.optim.geodesic import optimize_splines

    decs = stack_decoders([
        nets.decoder_init(k, 2, 10, (16,))
        for k in jax.random.split(jax.random.PRNGKey(9), 3)
    ])
    B = 3
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    res = optimize_splines(
        decs, jnp.zeros((B, 5, 2)), a, b, basis,
        GeodesicConfig(steps=25, lr=1e-2,
                       energy=EnergyConfig(num_t=24, mode="mc_fused")),
        key=jax.random.PRNGKey(1), record_history=True)
    hist = np.asarray(res.energy_history)
    assert np.isfinite(hist).all()
    assert hist[-1].mean() < hist[0].mean()


def test_fused_fits_uses_the_mc_chunk_size():
    """Regression: fused_fits must validate MC shapes with the SAME
    target_rows the MC kernels actually chunk at (_TARGET_ROWS_MC) — at the
    old 4096 the guard approved shapes (e.g. T=120, B=200 -> Tc=24) whose
    real kernel chunk (Tc=8) violates the Mosaic Tc >= 16 floor, turning
    the clean XLA fallback into a Mosaic lowering error."""
    from vae_latent_geometry_tpu.ops.energy_mc_pallas import _common
    from vae_latent_geometry_tpu.ops.energy_pallas import (
        _MAX_BB_MC,
        _TARGET_ROWS_MC,
        _pick_bb,
        _pick_chunk,
        _round_up,
        fused_fits,
    )

    # the exact mismatch class: guard said yes at 4096, kernel picks Tc=8
    assert not fused_fits(120, 200, 2, 50, 10, mc=True)
    # tuned production shape still accepted
    assert fused_fits(2000, 200, 2, 50, 10, mc=True)
    # exhaustive agreement on the floor check over a realistic range
    for T in range(16, 2501, 8):
        for B in (16, 50, 128, 200, 256):
            Bb = _pick_bb(_round_up(B, 8), _MAX_BB_MC)
            tc_kernel = _pick_chunk(T, Bb, target_rows=_TARGET_ROWS_MC)
            if fused_fits(T, B, 2, 50, 10, mc=True):
                assert tc_kernel % 8 == 0 and tc_kernel >= 16, (T, B, tc_kernel)
