"""Unit + golden-parity tests for the constraint nullspace basis."""

import numpy as np
import pytest

from tests.conftest import requires_reference
from vae_latent_geometry_tpu.geometry.basis import constraint_matrix, nullspace_basis


@pytest.mark.parametrize("n_poly", [1, 2, 4, 8])
def test_shapes_and_nullspace(n_poly):
    basis, C = nullspace_basis(n_poly)
    assert C.shape == (2 + 3 * (n_poly - 1), 4 * n_poly)
    assert basis.shape == (4 * n_poly, n_poly + 1)
    # basis spans the nullspace of C
    resid = np.linalg.norm(C.astype(np.float64) @ basis.astype(np.float64))
    assert resid < 1e-6
    # orthonormal columns
    gram = basis.T @ basis
    assert np.allclose(gram, np.eye(n_poly + 1), atol=1e-6)


def test_constraint_matrix_rows():
    C = constraint_matrix(4)
    # offset(0)=0 row touches only the first segment's constant coefficient
    assert C[0, 0] == 1.0 and np.count_nonzero(C[0]) == 1
    # offset(1)=0 row sums the last segment's four monomials at local t=1
    assert np.array_equal(C[1, -4:], np.ones(4)) and np.count_nonzero(C[1]) == 4


@requires_reference
def test_parity_with_reference_blob():
    """The float64 SVD+QR pipeline must reproduce the 16x5 basis stored in
    every reference spline blob (same LAPACK path torch used)."""
    from vae_latent_geometry_tpu.models.torch_import import load_spline_blob

    blob = load_spline_blob(
        "/root/reference/experiment/splines_init_model_seed12/"
        "spline_batch_init_euclidean_10.pt"
    )
    ref_basis = blob["spline_data"][0]["basis"]
    basis, _ = nullspace_basis(4)
    assert ref_basis.shape == basis.shape == (16, 5)
    # Compare as subspaces (projection matrices are basis-choice invariant):
    # torch vs numpy LAPACK return different rotations of the same nullspace.
    P_ref = ref_basis @ ref_basis.T
    P_new = basis @ basis.T
    assert np.allclose(P_ref, P_new, atol=1e-5)
    # Rebasing reference omega into our basis must reproduce the same raw
    # spline coefficients (identical curves).
    from vae_latent_geometry_tpu.geometry.basis import rebase_omega

    omega_ref = blob["spline_data"][0]["omega_init"]
    omega_new = rebase_omega(omega_ref, ref_basis, basis)
    coeffs_ref = ref_basis @ omega_ref
    coeffs_new = basis @ omega_new
    assert np.allclose(coeffs_ref, coeffs_new, atol=1e-5)
