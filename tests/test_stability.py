"""Stability layer: Frobenius comparison, pair determinism, encoder check."""

import json

import numpy as np
import pytest

from tests.conftest import requires_reference
from vae_latent_geometry_tpu.pipeline.stability import (
    check_pair_determinism,
    encoder_agreement,
    frobenius_comparison,
    frobenius_from_json,
)


def test_frobenius_identical_matrices():
    mat = np.random.default_rng(0).random((4, 4))
    labels = ["a", "b", "c", "d"]
    res = frobenius_comparison(mat, labels, mat, labels)
    assert res.frob_diff == 0.0 and res.rel_diff == 0.0
    assert res.common_labels == labels


def test_frobenius_label_alignment():
    rng = np.random.default_rng(1)
    A = rng.random((3, 3))
    labels_a = ["a", "b", "c"]
    # B has the same entries for (a, c) but permuted labels + an extra class
    perm = [2, 0, 1]  # c, a, b
    B4 = np.zeros((4, 4))
    B4[:3, :3] = A[np.ix_(perm, perm)]
    labels_b = ["c", "a", "b", "z"]
    res = frobenius_comparison(A, labels_a, B4, labels_b)
    assert res.only_in_b == ["z"] and res.only_in_a == []
    assert res.frob_diff < 1e-12


def test_frobenius_nan_holes_ignored():
    """NaN holes are excluded from BOTH matrices jointly — wrong handling
    (e.g. nan_to_num on one side) would count holes as distance 0 and give
    different values on the asserted entries."""
    labels = ["a", "b", "c"]
    A = np.array([[0.0, 1.0, 2.0], [1.0, 0.0, 4.0], [2.0, 4.0, 0.0]])
    B = np.array([[0.0, np.nan, 2.0], [np.nan, 0.0, 1.0], [2.0, 1.0, 0.0]])
    res = frobenius_comparison(A, labels, B, labels)
    # joint-finite entries: the (a,c) pair matches exactly, (b,c) differs
    # by 3 (twice, symmetric); the NaN (a,b) hole contributes NOTHING
    np.testing.assert_allclose(res.frob_diff, np.sqrt(2 * 3.0**2))


def test_pair_determinism(tmp_path):
    payload = {"representatives": [{"index": 1, "label": "x"}],
               "pairs": [[1, 2]]}
    p1, p2 = tmp_path / "a.json", tmp_path / "b.json"
    p1.write_text(json.dumps(payload))
    p2.write_text(json.dumps(payload))
    assert check_pair_determinism(str(p1), str(p2))
    payload["pairs"] = [[1, 3]]
    p2.write_text(json.dumps(payload))
    assert not check_pair_determinism(str(p1), str(p2))


def test_encoder_agreement(rng):
    import jax

    from vae_latent_geometry_tpu.config import ModelConfig
    from vae_latent_geometry_tpu.models.evae import evae_init

    mcfg = ModelConfig(input_dim=8, encoder_hidden=(8,), decoder_hidden=(8,),
                       num_decoders=2)
    m1 = evae_init(jax.random.PRNGKey(0), mcfg)
    m2 = evae_init(jax.random.PRNGKey(1), mcfg)
    data = rng.normal(size=(16, 8)).astype(np.float32)
    assert encoder_agreement(m1, m1, data) == 0.0
    assert encoder_agreement(m1, m2, data) > 0.0


@requires_reference
def test_frobenius_reference_artifacts():
    """The two checked-in 133-class distance matrices (seeds 12 vs 123)
    compare cleanly: label alignment drops the seed-specific holes and the
    relative difference lands in a plausible range."""
    res = frobenius_from_json(
        "/root/reference/src/artifacts/geodesic_distances_seed12_p133.json",
        "/root/reference/src/artifacts/geodesic_distances_seed123_p133.json",
    )
    assert len(res.common_labels) > 100
    assert res.frob_a > 0 and res.frob_b > 0
    assert 0 < res.rel_diff < 1.0
