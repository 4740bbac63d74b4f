"""Batched fixed-endpoint spline curves, TPU-first.

The curve family is linear in its free parameters omega:

    gamma_b(t) = (1-t) a_b + t b_b + Phi(t) @ omega_b,        omega_b: (K, D)

where ``Phi(t)`` is a (T, K) *design matrix* combining segment lookup, local
monomials and the constraint-nullspace basis.  Because omega enters linearly,

- curve evaluation is one contraction  einsum('tk,bkd->tbd', Phi, omega)
  (a single MXU-friendly matmul, no gathers in the hot loop);
- the curve velocity uses the analytic derivative dPhi/dt;
- fitting a spline to a target path (the reference's per-pair LBFGS loop,
  ``src/init_splines_ensemble.py:184-192``) has the closed-form least-squares
  solution omega* = (Phi^T Phi)^-1 Phi^T (path - lerp).

``eval_spline`` reproduces the reference's direct evaluation semantics
(``src/optimize.py:22-35``: einsum over basis, segment gather, local powers)
and is used for parity tests; ``eval_spline_design`` is the production path.
Both are mathematically identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _segment_powers(t: np.ndarray | jnp.ndarray, n_poly: int, xp, deriv: int = 0):
    """Segment index and local monomial rows for each t.

    Returns (seg_idx (T,), powers (T, 4)) with powers the local monomials
    [1, u, u^2, u^3] (or their ``deriv``-th derivative scaled by the chain-rule
    factor n_poly**deriv), where u = t*n_poly - seg_idx.
    """
    t = xp.asarray(t)
    seg_idx = xp.clip(xp.floor(t * n_poly).astype(xp.int32), 0, n_poly - 1)
    u = t * n_poly - seg_idx.astype(t.dtype)
    one = xp.ones_like(u)
    zero = xp.zeros_like(u)
    if deriv == 0:
        powers = xp.stack([one, u, u**2, u**3], axis=1)
    elif deriv == 1:
        powers = xp.stack([zero, one, 2.0 * u, 3.0 * u**2], axis=1) * n_poly
    elif deriv == 2:
        powers = xp.stack([zero, zero, 2.0 * one, 6.0 * u], axis=1) * n_poly**2
    else:
        raise ValueError(f"deriv={deriv} not supported")
    return seg_idx, powers


def _design(t, basis, n_poly: int, xp, deriv: int = 0):
    basis = xp.asarray(basis)
    K = basis.shape[1]
    seg_idx, powers = _segment_powers(t, n_poly, xp, deriv=deriv)
    # Per-sample rows of the raw-coefficient design: place the 4 local
    # monomials into the segment's coefficient slots, then project through the
    # nullspace basis.  seg_basis[t] = basis[4*seg : 4*seg+4, :]  -> (T, 4, K)
    seg_rows = basis.reshape(n_poly, 4, K)[seg_idx]          # (T, 4, K)
    return xp.einsum("ti,tik->tk", powers, seg_rows)          # (T, K)


def design_matrix(t, basis, n_poly: int = 4):
    """Phi(t): (T, K).  Host (numpy) or traced (jnp) depending on input."""
    xp = np if isinstance(t, np.ndarray) else jnp
    return _design(t, basis, n_poly, xp, deriv=0)


def design_matrix_derivative(t, basis, n_poly: int = 4, order: int = 1):
    """dPhi/dt (or d2Phi/dt2): (T, K)."""
    xp = np if isinstance(t, np.ndarray) else jnp
    return _design(t, basis, n_poly, xp, deriv=order)


def eval_spline_design(omega, a, b, phi, t):
    """Production curve evaluation via a precomputed design matrix.

    omega: (B, K, D), a/b: (B, D), phi: (T, K), t: (T,)  ->  (T, B, D)
    """
    t = t[:, None, None]
    linear = (1.0 - t) * a[None] + t * b[None]
    offset = jnp.einsum("tk,bkd->tbd", phi, omega)
    return linear + offset


def eval_spline_velocity(omega, a, b, dphi):
    """d gamma / dt via the analytic design-matrix derivative: (T, B, D)."""
    straight = (b - a)[None]                                  # (1, B, D)
    return straight + jnp.einsum("tk,bkd->tbd", dphi, omega)


def eval_spline(omega, a, b, basis, t, n_poly: int = 4):
    """Reference-semantics evaluation (parity path).

    Mirrors ``src/optimize.py:22-35``: coeffs = einsum('nk,bkd->nbd') reshaped
    to (n_poly, 4, B, D), segment gather, local-power einsum, plus lerp.
    """
    B, K, D = omega.shape
    coeffs = jnp.einsum("nk,bkd->nbd", basis, omega).reshape(n_poly, 4, B, D)
    seg_idx, powers = _segment_powers(t, n_poly, jnp, deriv=0)
    coeffs_sel = coeffs[seg_idx]                              # (T, 4, B, D)
    poly = jnp.einsum("ti,tibd->tbd", powers, coeffs_sel)
    t = t[:, None, None]
    linear = (1.0 - t) * a[None] + t * b[None]
    return linear + poly


def fit_spline_lstsq(paths, mask, a, b, phi, t, ridge: float = 0.0):
    """Closed-form replacement for the reference's per-pair LBFGS init fit.

    Fits omega so that the spline matches a (padded, masked) target path at
    the given t values, in the least-squares sense.  Because the spline is
    linear in omega this solves the MSE objective the reference optimizes
    with 50 LBFGS iterations (``src/init_splines_ensemble.py:183-192``) in
    one step.  Precisely: it is the RIDGE-least-squares solution with an
    unconditional 1e-6-of-mean-trace floor on the normal equations — i.e.
    the exact minimizer up to a ~1e-6 relative perturbation on well-posed
    systems (verified in tests/test_spline.py), chosen over an exact solve
    so degenerate systems (two-point paths, where the Gram matrix is
    exactly singular) return the minimum-norm omega=0 instead of NaN with
    no data-dependent branching under jit.

    paths: (B, P, D) padded target points;  mask: (B, P) validity (float/bool)
    a, b: (B, D) endpoints;  phi: (B, P, K) or (P, K);  t: (B, P) or (P,)
    Returns omega: (B, K, D).
    """
    mask = mask.astype(paths.dtype)
    if t.ndim == 1:
        t = jnp.broadcast_to(t[None], paths.shape[:2])
    if phi.ndim == 2:
        phi = jnp.broadcast_to(phi[None], paths.shape[:2] + (phi.shape[-1],))
    tt = t[..., None]
    lerp = (1.0 - tt) * a[:, None, :] + tt * b[:, None, :]
    resid = (paths - lerp) * mask[..., None]                  # (B, P, D)
    phi_m = phi * mask[..., None]                             # (B, P, K)
    # Normal equations per batch: (K,K) and (K,D); K is tiny (n_poly+1).
    gram = jnp.einsum("bpk,bpl->bkl", phi_m, phi_m)
    # Adaptive ridge: keeps well-posed fits unchanged to ~1e-6 while making
    # degenerate systems (e.g. a two-point path, where Phi(0)=Phi(1)=0 and
    # gram is exactly singular) return the minimum-norm solution omega=0
    # instead of NaN.
    K = gram.shape[-1]
    trace = jnp.trace(gram, axis1=-2, axis2=-1)[:, None, None]
    eps = (ridge + 1e-6) * (trace / K + 1e-6)
    gram = gram + eps * jnp.eye(K, dtype=gram.dtype)
    rhs = jnp.einsum("bpk,bpd->bkd", phi_m, resid)
    return jax.vmap(jnp.linalg.solve)(gram, rhs)
