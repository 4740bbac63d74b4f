"""Constraint nullspace basis for fixed-endpoint piecewise-cubic splines.

A curve is parameterized as gamma(t) = lerp(a, b, t) + offset(t), where the
offset is a piecewise cubic with ``n_poly`` segments and 4*n_poly raw
coefficients.  Linear constraints force offset(0) = offset(1) = 0 and
C0/C1/C2 continuity at the internal knots (in local segment coordinates,
tL = 1 for the left segment end, tR = 0 for the right segment start).  The
free parameters ``omega`` live in the nullspace of the constraint matrix C;
``basis`` maps omega -> raw coefficients.

Matches the reference construction at
``src/single_decoder/optimize_energy.py:51-102`` (float64 SVD nullspace with
relative rank cutoff 1e-10, then QR orthonormalization, returned as float32).
Computed **on host in numpy float64** at setup time — TPUs have no native
float64 and this is a one-off 11x16 factorization; the result ships into
jitted code as a constant.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


def constraint_matrix(n_poly: int) -> np.ndarray:
    """Build C with shape (2 + 3*(n_poly-1), 4*n_poly), float64.

    Row order: [offset(0)=0, offset(1)=0, then per internal knot C0, C1, C2],
    identical to the reference so the SVD nullspace matches bit-for-bit.
    """
    if n_poly < 1:
        raise ValueError("n_poly must be >= 1")
    ncoef = 4 * n_poly
    rows = []

    # Boundary rows: first segment evaluated at local t=0 (only the constant
    # monomial survives) and last segment at local t=1 (all four monomials = 1).
    b0 = np.zeros(ncoef)
    b0[0] = 1.0
    b1 = np.zeros(ncoef)
    b1[-4:] = 1.0
    rows += [b0, b1]

    # Continuity rows at internal knots, local coordinates tL=1, tR=0.
    tL, tR = 1.0, 0.0
    mono = lambda t: np.array([1.0, t, t**2, t**3])
    dmono = lambda t: np.array([0.0, 1.0, 2.0 * t, 3.0 * t**2])
    d2mono = lambda t: np.array([0.0, 0.0, 2.0, 6.0 * t])
    for i in range(n_poly - 1):
        si = 4 * i
        for m in (mono, dmono, d2mono):
            row = np.zeros(ncoef)
            row[si:si + 4] = m(tL)
            row[si + 4:si + 8] = -m(tR)
            rows.append(row)

    return np.stack(rows).astype(np.float64)


def _nullspace(C: np.ndarray, rtol: float = 1e-10) -> np.ndarray:
    U, S, Vh = np.linalg.svd(C, full_matrices=True)
    rank = int((S > rtol * S[0]).sum())
    return np.ascontiguousarray(Vh.T[:, rank:])


@lru_cache(maxsize=None)
def nullspace_basis(n_poly: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (basis, C) as float32.

    ``basis`` has shape (4*n_poly, K) with K = n_poly + 1 orthonormal columns
    spanning the nullspace of C.  For n_poly=4 this is the 16x5 basis stored in
    every reference spline blob.
    """
    C = constraint_matrix(n_poly)
    ns = _nullspace(C)
    basis, _ = np.linalg.qr(ns)
    expected_k = n_poly + 1
    if basis.shape != (4 * n_poly, expected_k):
        raise RuntimeError(
            f"nullspace basis has shape {basis.shape}, expected "
            f"({4 * n_poly}, {expected_k})"
        )
    resid = float(np.linalg.norm(C @ basis))
    if resid > 1e-8:
        raise RuntimeError(f"||C @ basis|| = {resid:.2e} too large")
    return basis.astype(np.float32), C.astype(np.float32)


def rebase_omega(omega, src_basis, dst_basis):
    """Re-express spline parameters from one orthonormal nullspace basis in
    another spanning the same subspace: omega' = (dst^T src) omega.

    The SVD nullspace is only unique up to rotation, so coefficients written
    by the reference (torch LAPACK) are not elementwise comparable with ours
    (numpy LAPACK) — but the curves are identical after rebasing.
    omega: (..., K, D);  bases: (4*n_poly, K).
    """
    R = dst_basis.T @ src_basis  # (K, K) orthogonal when subspaces coincide
    return np.einsum("kl,...ld->...kd", R, omega)
