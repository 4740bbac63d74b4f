"""Unit tests for spline evaluation, design matrices and the lstsq fit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
from vae_latent_geometry_tpu.geometry.spline import (
    design_matrix,
    design_matrix_derivative,
    eval_spline,
    eval_spline_design,
    eval_spline_velocity,
    fit_spline_lstsq,
)

N_POLY = 4


@pytest.fixture(scope="module")
def setup(rng):
    basis, _ = nullspace_basis(N_POLY)
    B, D = 7, 2
    omega = jnp.asarray(rng.normal(size=(B, basis.shape[1], D)) * 0.3, jnp.float32)
    a = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    return jnp.asarray(basis), omega, a, b


def test_endpoint_interpolation(setup):
    basis, omega, a, b = setup
    t = jnp.array([0.0, 1.0])
    phi = design_matrix(t, basis, N_POLY)
    gamma = eval_spline_design(omega, a, b, phi, t)
    np.testing.assert_allclose(gamma[0], a, atol=1e-5)
    np.testing.assert_allclose(gamma[1], b, atol=1e-5)


def test_design_matches_direct_eval(setup):
    basis, omega, a, b = setup
    t = jnp.linspace(0.0, 1.0, 513)
    phi = design_matrix(t, basis, N_POLY)
    g_design = eval_spline_design(omega, a, b, phi, t)
    g_direct = eval_spline(omega, a, b, basis, t, N_POLY)
    np.testing.assert_allclose(g_design, g_direct, atol=1e-5)


def test_c2_continuity(setup):
    """Curve, velocity and acceleration are continuous across knots."""
    basis, omega, a, b = setup
    eps = 1e-4
    for order in (0, 1, 2):
        fn = design_matrix if order == 0 else (
            lambda t, b_, n: design_matrix_derivative(t, b_, n, order=order)
        )
        for knot in [0.25, 0.5, 0.75]:
            t = jnp.array([knot - eps, knot + eps])
            phi = fn(t, basis, N_POLY)
            vals = jnp.einsum("tk,bkd->tbd", phi, omega)
            # tolerance grows with order: the derivative magnitudes scale by
            # n_poly**order and the genuine change over 2*eps does too.
            np.testing.assert_allclose(
                vals[0], vals[1], atol=5e-3 * (N_POLY ** order),
                err_msg=f"order {order} discontinuous at {knot}",
            )


def test_velocity_matches_finite_difference(setup):
    basis, omega, a, b = setup
    t = jnp.linspace(0.1, 0.9, 101)
    eps = 1e-3
    dphi = design_matrix_derivative(t, basis, N_POLY)
    vel = eval_spline_velocity(omega, a, b, dphi)
    phi_p = design_matrix(t + eps, basis, N_POLY)
    phi_m = design_matrix(t - eps, basis, N_POLY)
    g_p = eval_spline_design(omega, a, b, phi_p, t + eps)
    g_m = eval_spline_design(omega, a, b, phi_m, t - eps)
    fd = (g_p - g_m) / (2 * eps)
    np.testing.assert_allclose(vel, fd, atol=1e-2, rtol=1e-3)


def test_lstsq_fit_recovers_omega(setup, rng):
    """Sampling a known spline and fitting must recover omega exactly
    (the objective is an exactly-solvable linear least squares)."""
    basis, omega, a, b = setup
    B = omega.shape[0]
    P = 64
    t = jnp.linspace(0.0, 1.0, P)
    phi = design_matrix(t, basis, N_POLY)
    paths = eval_spline_design(omega, a, b, phi, t)          # (P, B, D)
    paths = jnp.transpose(paths, (1, 0, 2))                  # (B, P, D)
    mask = jnp.ones((B, P))
    omega_fit = fit_spline_lstsq(paths, mask, a, b, phi, t)
    np.testing.assert_allclose(omega_fit, omega, atol=1e-3, rtol=1e-3)


def test_lstsq_fit_ragged_masking(setup, rng):
    """Masked padding must not influence the fit: fitting a path padded with
    garbage equals fitting the unpadded path."""
    basis, omega, a, b = setup
    B = omega.shape[0]
    P, P_valid = 64, 40
    t_valid = jnp.linspace(0.0, 1.0, P_valid)
    phi_valid = design_matrix(t_valid, basis, N_POLY)
    clean = jnp.transpose(
        eval_spline_design(omega, a, b, phi_valid, t_valid), (1, 0, 2)
    )
    # pad with garbage, mask it out; per-row t grids padded arbitrarily
    pad = jnp.asarray(rng.normal(size=(B, P - P_valid, 2)) * 100, jnp.float32)
    paths = jnp.concatenate([clean, pad], axis=1)
    t_full = jnp.concatenate([t_valid, jnp.zeros(P - P_valid)])
    t_b = jnp.broadcast_to(t_full[None], (B, P))
    phi_full = design_matrix(t_full, jnp.asarray(basis), N_POLY)
    mask = jnp.concatenate([jnp.ones((B, P_valid)), jnp.zeros((B, P - P_valid))], axis=1)
    omega_fit = fit_spline_lstsq(paths, mask, a, b, phi_full, t_b)
    np.testing.assert_allclose(omega_fit, omega, atol=1e-3, rtol=1e-3)


def test_jit_and_grad():
    """Spline eval is jittable and differentiable wrt omega."""
    basis, _ = nullspace_basis(N_POLY)
    basis = jnp.asarray(basis)
    t = jnp.linspace(0.0, 1.0, 50)
    phi = design_matrix(t, basis, N_POLY)
    a = jnp.zeros((3, 2))
    b = jnp.ones((3, 2))

    @jax.jit
    def loss(omega):
        g = eval_spline_design(omega, a, b, phi, t)
        return jnp.sum(g**2)

    omega = jnp.ones((3, basis.shape[1], 2)) * 0.1
    g = jax.grad(loss)(omega)
    assert g.shape == omega.shape
    assert jnp.all(jnp.isfinite(g))
