"""Data layer: loading, synthetic surrogate, splits."""

import numpy as np
import pytest

from tests.conftest import requires_reference
from vae_latent_geometry_tpu.data import (
    load_tasic,
    synthesize_tasic_like,
    train_val_split,
)


def test_synthetic_is_deterministic():
    labels = np.array(["a", "b", "a", "c"] * 50)
    x1 = synthesize_tasic_like(labels, seed=3)
    x2 = synthesize_tasic_like(labels, seed=3)
    np.testing.assert_array_equal(x1, x2)
    x3 = synthesize_tasic_like(labels, seed=4)
    assert not np.allclose(x1, x3)


def test_synthetic_class_structure():
    labels = np.array([f"c{i % 30}" for i in range(3000)])
    x = synthesize_tasic_like(labels, seed=0)
    assert x.shape == (3000, 50) and x.dtype == np.float32
    # classes are separated on leading dims
    mu_a = x[labels == "c0"].mean(0)
    mu_b = x[labels == "c1"].mean(0)
    assert np.linalg.norm(mu_a[:5] - mu_b[:5]) > 1.0
    # variance decays with feature index on average (PCA-like spectrum)
    v = x.var(axis=0)
    assert v[:5].mean() > v[20:25].mean() > v[45:].mean()


@requires_reference
def test_load_with_reference_labels():
    data = load_tasic("/root/reference/data")
    assert data.x.shape == (23822, 50)
    assert data.synthetic  # pca50 blob is missing upstream
    assert len(np.unique(data.labels)) == 133
    assert data.colors is not None and data.colors.shape == (23822,)


def test_load_missing_dir_synthesizes(tmp_path):
    data = load_tasic(str(tmp_path))
    assert data.x.shape[1] == 50 and data.synthetic


def test_load_strict_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_tasic(str(tmp_path), allow_synthetic=False)


def test_split_is_seeded_and_disjoint():
    tr1, va1 = train_val_split(1000, 0.1, seed=7)
    tr2, va2 = train_val_split(1000, 0.1, seed=7)
    np.testing.assert_array_equal(tr1, tr2)
    np.testing.assert_array_equal(va1, va2)
    assert len(va1) == 100 and len(tr1) == 900
    assert len(np.intersect1d(tr1, va1)) == 0
    tr3, _ = train_val_split(1000, 0.1, seed=8)
    assert not np.array_equal(tr1, tr3)


def test_real_x_with_surrogate_labels_is_marked_synthetic(tmp_path):
    """A data dir with tasic-pca50.npy but NO labels file pairs the real
    matrix with seeded-random surrogate labels — that must be marked
    synthetic and warned about (class structure is meaningless), not
    silently reported as real data."""
    import warnings

    from vae_latent_geometry_tpu.data.tasic import load_tasic

    x = np.random.default_rng(0).normal(size=(10, 50)).astype(np.float32)
    np.save(tmp_path / "tasic-pca50.npy", x)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        data = load_tasic(str(tmp_path))
    assert data.synthetic
    assert any("surrogate" in str(x.message) for x in w)
    assert len(data.labels) == 10
    np.testing.assert_array_equal(data.x, x)


def test_mismatched_x_and_labels_raise(tmp_path):
    from vae_latent_geometry_tpu.data.tasic import load_tasic

    np.save(tmp_path / "tasic-pca50.npy",
            np.zeros((10, 50), np.float32))
    np.save(tmp_path / "tasic-ttypes.npy",
            np.array([f"c{i}" for i in range(8)]))
    with pytest.raises(ValueError, match="mismatched"):
        load_tasic(str(tmp_path))
