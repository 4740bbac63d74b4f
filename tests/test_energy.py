"""Energy-functional tests: closed forms, estimator agreement, golden parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_reference
from vae_latent_geometry_tpu.geometry import energy as E
from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
from vae_latent_geometry_tpu.geometry.spline import (
    design_matrix,
    design_matrix_derivative,
    eval_spline_design,
    eval_spline_velocity,
)


def _linear_decoder(W, bias):
    """Single-layer 'MLP' params implementing f(z) = z W + b."""
    return {"layers": [{"w": jnp.asarray(W), "b": jnp.asarray(bias)}]}


@pytest.fixture(scope="module")
def straight_lines(rng):
    B, D = 5, 2
    a = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    T = 200
    t = jnp.linspace(0.0, 1.0, T)
    gamma = (1 - t[:, None, None]) * a[None] + t[:, None, None] * b[None]
    return a, b, gamma


def test_linear_decoder_closed_form(straight_lines, rng):
    """Straight line through a linear decoder: E = ||W(b-a)||^2 / (T-1)."""
    a, b, gamma = straight_lines
    T = gamma.shape[0]
    W = rng.normal(size=(2, 7)).astype(np.float32)
    dec = _linear_decoder(W, np.zeros(7, np.float32))
    e = E.energy_single(dec, gamma)
    expected = np.sum((np.asarray(b - a) @ W) ** 2, axis=-1) / (T - 1)
    np.testing.assert_allclose(np.asarray(e), expected, rtol=1e-4)


def test_expected_equals_mc_mean(rng):
    """energy_expected is the exact expectation of the MC estimator: the mean
    of many MC draws must converge to it."""
    basis, _ = nullspace_basis(4)
    B, D, T, M_dec = 3, 2, 64, 4
    t = jnp.linspace(0.0, 1.0, T)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    omega = jnp.asarray(rng.normal(size=(B, 5, D)) * 0.2, jnp.float32)
    a = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    gamma = eval_spline_design(omega, a, b, phi, t)

    keys = jax.random.split(jax.random.PRNGKey(0), M_dec)
    decs = [
        {"layers": [
            {"w": jax.random.normal(k, (D, 16)) * 0.5, "b": jnp.zeros(16)},
            {"w": jax.random.normal(jax.random.fold_in(k, 1), (16, 7)) * 0.5,
             "b": jnp.zeros(7)},
        ]}
        for k in keys
    ]
    from vae_latent_geometry_tpu.models.evae import stack_decoders

    decoders = stack_decoders(decs)

    exp = np.asarray(E.energy_expected(decoders, gamma))
    draws = []
    for i in range(200):
        draws.append(np.asarray(
            E.energy_mc(decoders, gamma, jax.random.PRNGKey(100 + i), mc_samples=1)
        ))
    mc_mean = np.mean(draws, axis=0)
    np.testing.assert_allclose(mc_mean, exp, rtol=0.05)


def test_mc_single_member_equals_single(rng):
    """With an ensemble of one decoder, MC and single energies coincide."""
    from vae_latent_geometry_tpu.models.evae import stack_decoders
    from vae_latent_geometry_tpu.models import nets

    dec = nets.decoder_init(jax.random.PRNGKey(3), 2, 11, (8,))
    decoders = stack_decoders([dec])
    gamma = jnp.asarray(rng.normal(size=(32, 4, 2)), jnp.float32)
    e_single = E.energy_single(dec, gamma)
    e_mc = E.energy_mc(decoders, gamma, jax.random.PRNGKey(0), mc_samples=2)
    e_exp = E.energy_expected(decoders, gamma)
    np.testing.assert_allclose(np.asarray(e_mc), np.asarray(e_single), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e_exp), np.asarray(e_single), rtol=1e-5)


def test_jvp_converges_to_discrete(rng):
    """JVP quadrature and discrete first differences agree as T grows."""
    from vae_latent_geometry_tpu.models import nets

    basis, _ = nullspace_basis(4)
    dec = nets.decoder_init(jax.random.PRNGKey(5), 2, 10, (32, 32))
    omega = jnp.asarray(rng.normal(size=(2, 5, 2)) * 0.3, jnp.float32)
    a = jnp.asarray(rng.normal(size=(2, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, 2)), jnp.float32)

    def both(T):
        t = jnp.linspace(0.0, 1.0, T)
        phi = design_matrix(t, jnp.asarray(basis), 4)
        dphi = design_matrix_derivative(t, jnp.asarray(basis), 4)
        gamma = eval_spline_design(omega, a, b, phi, t)
        vel = eval_spline_velocity(omega, a, b, dphi)
        return (np.asarray(E.energy_single(dec, gamma)),
                np.asarray(E.energy_jvp(dec, gamma, vel)))

    d1, j1 = both(500)
    d2, j2 = both(4000)
    # discrete and JVP energies scale ~1/(T-1); compare T*(E) limits
    np.testing.assert_allclose(499 * d1, 3999 * d2, rtol=2e-2)
    np.testing.assert_allclose(3999 * j2, 3999 * d2, rtol=2e-2)
    np.testing.assert_allclose(499 * j1, 3999 * j2, rtol=2e-2)


@requires_reference
def test_golden_single_decoder_lengths():
    """Recompute geodesic lengths of the reference's optimized single-decoder
    splines with the imported decoder; must match stored values to 1e-4 rel
    (reference blob written at src/single_decoder/optimize_energy_batched.py:106-119)."""
    from vae_latent_geometry_tpu.models.torch_import import (
        load_single_vae_checkpoint,
        load_spline_blob,
    )

    vae = load_single_vae_checkpoint(
        "/root/reference/src/artifacts/vae_best_seed12.pth"
    )
    blob = load_spline_blob(
        "/root/reference/src/artifacts/spline_batch_optimized_batched_seed12.pt"
    )
    data = blob["spline_data"]
    assert len(data) > 0
    basis = jnp.asarray(data[0]["basis"])
    n_poly = int(data[0]["n_poly"])
    t = jnp.linspace(0.0, 1.0, 2000)
    phi = design_matrix(t, basis, n_poly)

    a = jnp.stack([jnp.asarray(d["a"]) for d in data])
    b = jnp.stack([jnp.asarray(d["b"]) for d in data])
    omega = jnp.stack([jnp.asarray(d["omega_optimized"]) for d in data])
    stored = np.array([d["length_geodesic"] for d in data])

    gamma = eval_spline_design(omega, a, b, phi, t)

    # heteroscedastic decoder: length uses the mean head only
    from vae_latent_geometry_tpu.models import nets

    def mean_decode(z):
        m, _ = nets.decoder_apply_full(vae["decoder"], z)
        return m

    x = mean_decode(gamma)
    lengths = np.asarray(
        jnp.sum(jnp.linalg.norm(x[1:] - x[:-1], axis=2), axis=0)
    )
    np.testing.assert_allclose(lengths, stored, rtol=1e-4)


@requires_reference
def test_golden_ensemble_energy_statistical():
    """Ensemble blob: stored geodesic_length = sqrt(final MC energy draw)
    (src/optimize.py:168).  The draw is random, but its expectation is
    energy_expected of the stored optimized splines — check within a few %."""
    from vae_latent_geometry_tpu.models.torch_import import (
        load_evae_checkpoint,
        load_spline_blob,
    )

    params = load_evae_checkpoint("/root/reference/experiment/model_seed12.pt")
    blob = load_spline_blob(
        "/root/reference/experiment/splines_opt_model_seed12/"
        "spline_batch_opt_euclidean_10.pt"
    )
    data = blob["spline_data"]
    basis = jnp.asarray(data[0]["basis"])
    t = jnp.linspace(0.0, 1.0, 2000)
    phi = design_matrix(t, basis, 4)
    a = jnp.stack([jnp.asarray(d["a"]) for d in data])
    b = jnp.stack([jnp.asarray(d["b"]) for d in data])
    omega = jnp.stack([jnp.asarray(d["omega_optimized"]) for d in data])
    stored = np.array([d["geodesic_length"] for d in data])

    gamma = eval_spline_design(omega, a, b, phi, t)
    exp_energy = np.asarray(E.energy_expected(params.decoders, gamma))
    lengths = np.sqrt(exp_energy)
    # statistical tolerance: one MC draw of a 1999-segment sum
    np.testing.assert_allclose(lengths, stored, rtol=0.05)


def test_mc_scan_matches_mc_statistically(rng):
    """Chunked-scan MC has the same expectation as the plain MC estimator
    (different random streams; compare means over draws)."""
    from vae_latent_geometry_tpu.models import nets
    from vae_latent_geometry_tpu.models.evae import stack_decoders

    decs = stack_decoders([
        nets.decoder_init(k, 2, 8, (16,))
        for k in jax.random.split(jax.random.PRNGKey(0), 4)
    ])
    gamma = jnp.asarray(rng.normal(size=(60, 5, 2)), jnp.float32)
    exp = np.asarray(E.energy_expected(decs, gamma))
    # jit once (the un-jitted call re-traces the whole chunked scan per draw,
    # which made this test dominate the suite wall clock)
    draw = jax.jit(lambda k: E.energy_mc_scan(decs, gamma, k,
                                              mc_samples=1, chunk=12))
    draws = [np.asarray(draw(jax.random.PRNGKey(i))) for i in range(150)]
    np.testing.assert_allclose(np.mean(draws, axis=0), exp, rtol=0.05)


def test_mc_scan_single_member_exact(rng):
    """With one decoder the sampling is deterministic: scan == plain == single."""
    from vae_latent_geometry_tpu.models import nets
    from vae_latent_geometry_tpu.models.evae import stack_decoders

    dec = nets.decoder_init(jax.random.PRNGKey(7), 2, 9, (8,))
    decs = stack_decoders([dec])
    gamma = jnp.asarray(rng.normal(size=(48, 3, 2)), jnp.float32)
    e_scan = E.energy_mc_scan(decs, gamma, jax.random.PRNGKey(0), chunk=16)
    e_single = E.energy_single(dec, gamma)
    np.testing.assert_allclose(np.asarray(e_scan), np.asarray(e_single),
                               rtol=1e-5)


def test_mc_scan_grad_finite(rng):
    from vae_latent_geometry_tpu.models import nets
    from vae_latent_geometry_tpu.models.evae import stack_decoders

    decs = stack_decoders([
        nets.decoder_init(k, 2, 8, (16,))
        for k in jax.random.split(jax.random.PRNGKey(1), 3)
    ])
    gamma = jnp.asarray(rng.normal(size=(40, 4, 2)), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(
        E.energy_mc_scan(decs, x, jax.random.PRNGKey(0), chunk=8)))(gamma)
    assert np.isfinite(np.asarray(g)).all()


@requires_reference
def test_energy_parity_vs_torch_forward():
    """Discrete single-decoder energy computed with torch ops vs our
    energy_single on the SAME imported decoder and curve: 1e-4 rel."""
    import torch
    import torch.nn.functional as F

    from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint

    sd = torch.load("/root/reference/experiment/model_seed12.pt",
                    map_location="cpu")
    params = load_evae_checkpoint("/root/reference/experiment/model_seed12.pt")
    dec0 = jax.tree_util.tree_map(lambda x: x[0], params.decoders)

    rng_l = np.random.default_rng(77)
    gamma_np = (rng_l.normal(size=(512, 3, 2)) * 1.5).astype(np.float32)

    # torch evaluation
    g = torch.from_numpy(gamma_np.reshape(-1, 2))
    h = F.relu(F.linear(g, sd["decoder.0.decoder_net.0.weight"],
                        sd["decoder.0.decoder_net.0.bias"]))
    h = F.relu(F.linear(h, sd["decoder.0.decoder_net.2.weight"],
                        sd["decoder.0.decoder_net.2.bias"]))
    x = F.linear(h, sd["decoder.0.decoder_net.4.weight"],
                 sd["decoder.0.decoder_net.4.bias"]).reshape(512, 3, 50)
    diffs = x[1:] - x[:-1]
    e_torch = diffs.pow(2).sum(dim=2).sum(dim=0).numpy()

    e_ours = np.asarray(E.energy_single(dec0, jnp.asarray(gamma_np)))
    np.testing.assert_allclose(e_ours, e_torch, rtol=1e-4)

    # MC ensemble energy with FIXED indices: torch gather vs fused-equivalent
    from vae_latent_geometry_tpu.models.evae import decode_all

    d1 = rng_l.integers(0, 10, size=(1, 511, 3)).astype(np.int32)
    d2 = rng_l.integers(0, 10, size=(1, 511, 3)).astype(np.int32)
    decoded = np.asarray(decode_all(params.decoders, jnp.asarray(gamma_np)))
    it = np.arange(511)[:, None]
    ib = np.arange(3)[None, :]
    x1 = decoded[d1[0], it, ib]
    x2 = decoded[d2[0], it + 1, ib]
    e_np = ((x2 - x1) ** 2).sum(axis=2).sum(axis=0)

    from vae_latent_geometry_tpu.ops.energy_mc_pallas import energy_mc_fused

    e_fused = np.asarray(energy_mc_fused(
        params.decoders, jnp.asarray(gamma_np),
        jnp.asarray(d1), jnp.asarray(d2)))
    np.testing.assert_allclose(e_fused, e_np, rtol=1e-4)


def test_jvp_ensemble_matches_expected_at_high_T(rng):
    """energy_jvp_ensemble (JVP of the mean decoder + disagreement term) is
    the T->inf limit of energy_expected."""
    from vae_latent_geometry_tpu.models import nets
    from vae_latent_geometry_tpu.models.evae import stack_decoders
    from vae_latent_geometry_tpu.geometry.spline import (
        design_matrix_derivative,
        eval_spline_velocity,
    )

    basis, _ = nullspace_basis(4)
    decs = stack_decoders([
        nets.decoder_init(k, 2, 12, (24, 24))
        for k in jax.random.split(jax.random.PRNGKey(2), 4)
    ])
    omega = jnp.asarray(rng.normal(size=(2, 5, 2)) * 0.3, jnp.float32)
    a = jnp.asarray(rng.normal(size=(2, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, 2)), jnp.float32)
    T = 4000
    t = jnp.linspace(0.0, 1.0, T)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    dphi = design_matrix_derivative(t, jnp.asarray(basis), 4)
    gamma = eval_spline_design(omega, a, b, phi, t)
    vel = eval_spline_velocity(omega, a, b, dphi)
    e_exp = np.asarray(E.energy_expected(decs, gamma))
    e_jvp = np.asarray(E.energy_jvp_ensemble(decs, gamma, vel))
    np.testing.assert_allclose(e_jvp, e_exp, rtol=2e-2)


def _curve_problem(rng, T, B=3, X=12, M=4, seed=2):
    from vae_latent_geometry_tpu.geometry.spline import (
        design_matrix_derivative,
        eval_spline_velocity,
    )
    from vae_latent_geometry_tpu.models import nets
    from vae_latent_geometry_tpu.models.evae import stack_decoders

    basis, _ = nullspace_basis(4)
    decs = stack_decoders([
        nets.decoder_init(k, 2, X, (24, 24))
        for k in jax.random.split(jax.random.PRNGKey(seed), M)
    ])
    omega = jnp.asarray(rng.normal(size=(B, 5, 2)) * 0.3, jnp.float32)
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    t = jnp.linspace(0.0, 1.0, T)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    dphi = design_matrix_derivative(t, jnp.asarray(basis), 4)
    gamma = eval_spline_design(omega, a, b, phi, t)
    vel = eval_spline_velocity(omega, a, b, dphi)
    return decs, gamma, vel


def test_quadrature_transfer_identity(rng):
    """target_num_t = T (r = 1) is a no-op for both transfer estimators, and
    expected_rescaled at r = 1 IS energy_expected exactly (same terms)."""
    decs, gamma, vel = _curve_problem(rng, T=64)
    T = gamma.shape[0]
    e0 = np.asarray(E.energy_jvp_ensemble(decs, gamma, vel))
    e1 = np.asarray(E.energy_jvp_ensemble(decs, gamma, vel, target_num_t=T))
    np.testing.assert_allclose(e1, e0, rtol=1e-6)
    er = np.asarray(E.energy_expected_rescaled(decs, gamma, target_num_t=T))
    ee = np.asarray(E.energy_expected(decs, gamma))
    np.testing.assert_allclose(er, ee, rtol=1e-6)


def test_quadrature_transfer_estimates_full_grid_energy(rng):
    """The north-star lever: a 64-point JVP quadrature with
    target_num_t=1024 estimates the 1024-point expected energy (the smooth
    term scales prop. 1/T, the disagreement term prop. T — both integrals are
    resolved on the coarse grid)."""
    T_loc, T_tgt = 64, 1024
    # the same curve must be sampled at both resolutions: re-seed a fresh
    # generator per call so omega/a/b coincide
    decs, gamma_c, vel_c = _curve_problem(np.random.default_rng(99), T=T_loc)
    decs, gamma_f, _ = _curve_problem(np.random.default_rng(99), T=T_tgt)
    e_true = np.asarray(E.energy_expected(decs, gamma_f))
    e_jvp = np.asarray(E.energy_jvp_ensemble(decs, gamma_c, vel_c,
                                             target_num_t=T_tgt))
    e_resc = np.asarray(E.energy_expected_rescaled(decs, gamma_c,
                                                   target_num_t=T_tgt))
    np.testing.assert_allclose(e_jvp, e_true, rtol=3e-2)
    np.testing.assert_allclose(e_resc, e_true, rtol=3e-2)


def test_phase_plan_jvp_mode_and_final_energy_mode(rng):
    """A phase_plan with a per-phase energy mode (coarse jvp_ensemble phase
    + discrete polish) runs, reduces energy, and reports final energies in
    the final_energy_mode's discrete units."""
    import dataclasses

    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.models import nets
    from vae_latent_geometry_tpu.models.evae import stack_decoders
    from vae_latent_geometry_tpu.optim.geodesic import optimize_splines

    basis, _ = nullspace_basis(4)
    decs = stack_decoders([
        nets.decoder_init(k, 2, 12, (24, 24))
        for k in jax.random.split(jax.random.PRNGKey(5), 4)
    ])
    B = 4
    a = jnp.asarray(rng.normal(size=(B, 2)) * 2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)) * 2, jnp.float32)
    omega0 = jnp.zeros((B, 5, 2), jnp.float32)
    cfg = GeodesicConfig(
        steps=40,
        phase_plan=((30, 32, "constant", 1e-2, "jvp_ensemble"),
                    (10, 128, "constant", 1e-3)),
        final_energy_mode="expected",
        energy=EnergyConfig(num_t=128, mode="expected",
                            target_num_t=128),
    )
    res = optimize_splines(decs, omega0, a, b, basis, cfg)
    # reported energy must be the exact discrete expected energy at the
    # final omega on the full grid
    from vae_latent_geometry_tpu.geometry.spline import eval_spline_design

    t = jnp.linspace(0.0, 1.0, 128)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    gamma = eval_spline_design(res.omega, a, b, phi, t)
    e_check = np.asarray(E.energy_expected(decs, gamma))
    np.testing.assert_allclose(np.asarray(res.energy), e_check, rtol=1e-5)
    # and the optimization must actually have improved on the straight line
    gamma0 = eval_spline_design(omega0, a, b, phi, t)
    e0 = np.asarray(E.energy_expected(decs, gamma0))
    assert (np.asarray(res.energy) <= e0 + 1e-5).all()


def test_jvp_ensemble_num_active_masks_decoders(rng):
    """num_active must restrict BOTH jvp terms (masked-mean decoder and
    disagreement) to the first k decoders per spline — previously it was
    silently ignored, so a CoV k-sweep under mode='jvp_ensemble' returned
    identical values for every k."""
    import jax

    from vae_latent_geometry_tpu.models import nets
    from vae_latent_geometry_tpu.models.evae import stack_decoders

    decs_list = [nets.decoder_init(k, 2, 9, (16,))
                 for k in jax.random.split(jax.random.PRNGKey(4), 4)]
    decs = stack_decoders(decs_list)
    B, T = 3, 24
    gamma = jnp.asarray(rng.normal(size=(T, B, 2)), jnp.float32)
    gamma_dot = jnp.asarray(rng.normal(size=(T, B, 2)), jnp.float32)
    ks = np.array([1, 2, 4])
    e_masked = np.asarray(E.energy_jvp_ensemble(decs, gamma, gamma_dot,
                                                num_active=ks))
    # per spline, the masked value equals the full computation on the
    # first-k sub-ensemble
    for b, k in enumerate(ks):
        sub = stack_decoders(decs_list[:k])
        e_sub = np.asarray(E.energy_jvp_ensemble(
            sub, gamma[:, b:b + 1], gamma_dot[:, b:b + 1]))
        np.testing.assert_allclose(e_masked[b], e_sub[0], rtol=1e-5)
    # and k-values genuinely differ (the old bug made them identical)
    assert not np.allclose(e_masked[0], e_masked[2], rtol=1e-4)
    # rescaling composes with masking
    e_resc = np.asarray(E.energy_jvp_ensemble(decs, gamma, gamma_dot,
                                              target_num_t=200,
                                              num_active=ks))
    assert not np.allclose(e_resc, e_masked, rtol=1e-4)
