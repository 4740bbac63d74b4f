"""IO layer: pytree checkpoints, spline artifacts, reference-blob interop."""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference
from vae_latent_geometry_tpu.io.artifacts import (
    SplineBatchArtifact,
    from_reference_blob,
    load_spline_batch,
    save_spline_batch,
)
from vae_latent_geometry_tpu.io.checkpoint import load_pytree, save_pytree


def test_pytree_roundtrip(tmp_path, rng):
    import jax

    from vae_latent_geometry_tpu.config import ModelConfig
    from vae_latent_geometry_tpu.models.evae import evae_init

    params = evae_init(jax.random.PRNGKey(0),
                       ModelConfig(input_dim=6, num_decoders=3,
                                   encoder_hidden=(8,), decoder_hidden=(8,)))
    path = str(tmp_path / "ckpt.npz")
    save_pytree(params, path, extra_meta={"epoch": 3})
    loaded, meta = load_pytree(path, params)
    assert meta == {"epoch": 3}
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pytree_shape_mismatch_raises(tmp_path):
    import jax

    tree = {"w": np.zeros((3, 3))}
    path = str(tmp_path / "c.npz")
    save_pytree(tree, path)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pytree(path, {"w": np.zeros((2, 2))})
    with pytest.raises(KeyError):
        load_pytree(path, {"other": np.zeros((3, 3))})


def test_artifact_roundtrip(tmp_path, rng):
    art = SplineBatchArtifact(
        a=rng.normal(size=(4, 2)).astype(np.float32),
        b=rng.normal(size=(4, 2)).astype(np.float32),
        omega_init=rng.normal(size=(4, 5, 2)).astype(np.float32),
        basis=rng.normal(size=(16, 5)).astype(np.float32), n_poly=4,
        pair_indices=np.arange(8).reshape(4, 2),
        valid=np.array([True, True, False, True]),
        pair_labels=[["a", "b"]] * 4,
        representatives=[{"index": 0, "label": "a"}],
        geodesic_length=np.array([1.0, 2.0, np.nan, 4.0], np.float32),
        metadata={"steps": 100},
    )
    p = str(tmp_path / "art")
    save_spline_batch(art, p)
    back = load_spline_batch(p)
    np.testing.assert_array_equal(back.a, art.a)
    np.testing.assert_array_equal(back.valid, art.valid)
    np.testing.assert_array_equal(back.omega_init, art.omega_init)
    assert back.metadata == {"steps": 100}
    assert back.omega_optimized is None
    assert back.euclidean_distance is None
    np.testing.assert_array_equal(back.geodesic_length, art.geodesic_length)


@requires_reference
def test_reference_blob_conversion():
    from vae_latent_geometry_tpu.models.torch_import import load_spline_blob

    blob = load_spline_blob(
        "/root/reference/experiment/splines_opt_model_seed12/"
        "spline_batch_opt_euclidean_10.pt"
    )
    art = from_reference_blob(blob)
    assert len(art) == 45
    assert art.basis.shape == (16, 5)
    assert art.omega_optimized.shape == (45, 5, 2)
    assert np.isfinite(art.geodesic_length).all()
    assert art.pair_labels[0][0] == "Astro Aqp4"
    assert art.metadata["steps"] == 1000


@requires_reference
def test_load_spline_batch_reads_reference_pt_directly():
    """CLI `--splines ref_blob.pt` must work without manual conversion
    (docs/MIGRATION.md: "spline blobs load directly")."""
    art = load_spline_batch(
        "/root/reference/experiment/splines_opt_model_seed12/"
        "spline_batch_opt_euclidean_10.pt"
    )
    assert len(art) == 45
    assert art.basis.shape == (16, 5)
    assert np.isfinite(art.geodesic_length).all()


def test_yaml_config_reference_schema(tmp_path):
    """The reference's configs/config.yaml schema loads directly."""
    from vae_latent_geometry_tpu.config import from_yaml

    y = tmp_path / "c.yaml"
    y.write_text(
        "vae:\n  latent_dim: 3\n  input_dim: 50\n"
        "training:\n  epochs: 200\n  lr: 0.001\n  batch_size: 64\n  seed: 12\n"
    )
    mcfg, tcfg = from_yaml(str(y))
    assert mcfg.latent_dim == 3 and mcfg.input_dim == 50
    assert tcfg.epochs == 200 and tcfg.seed == 12 and tcfg.batch_size == 64


def test_evae_sample():
    import jax

    from vae_latent_geometry_tpu.config import ModelConfig
    from vae_latent_geometry_tpu.models.evae import evae_init, sample

    mcfg = ModelConfig(input_dim=7, num_decoders=3, encoder_hidden=(8,),
                       decoder_hidden=(8,))
    params = evae_init(jax.random.PRNGKey(0), mcfg)
    s = sample(params, jax.random.PRNGKey(1), n=5, cfg=mcfg)
    assert s.shape == (5, 7)
    s0 = sample(params, jax.random.PRNGKey(1), n=5, cfg=mcfg, decoder_idx=0)
    assert s0.shape == (5, 7)


def test_reference_blob_roundtrip(tmp_path, rng):
    """artifact -> reference .pt blob -> artifact is lossless."""
    from vae_latent_geometry_tpu.io.artifacts import to_reference_blob

    art = SplineBatchArtifact(
        a=rng.normal(size=(3, 2)).astype(np.float32),
        b=rng.normal(size=(3, 2)).astype(np.float32),
        omega_init=rng.normal(size=(3, 5, 2)).astype(np.float32),
        basis=rng.normal(size=(16, 5)).astype(np.float32), n_poly=4,
        pair_indices=np.array([[0, 1], [0, 2], [1, 2]]),
        valid=np.ones(3, bool), pair_labels=[["a", "b"], ["a", "c"], ["b", "c"]],
        representatives=[{"index": 0, "label": "a"},
                         {"index": 1, "label": "b"},
                         {"index": 2, "label": "c"}],
        omega_optimized=rng.normal(size=(3, 5, 2)).astype(np.float32),
        geodesic_length=np.array([1.0, 2.0, 3.0], np.float32),
        euclidean_distance=np.array([0.1, 0.2, 0.3], np.float32),
        metadata={"steps": 7},
    )
    path = str(tmp_path / "blob.pt")
    to_reference_blob(art, path)

    import torch

    blob = torch.load(path)
    assert len(blob["spline_data"]) == 3
    assert blob["spline_data"][0]["a_label"] == "a"
    back = from_reference_blob(
        {k: ([{kk: (vv.numpy() if hasattr(vv, "numpy") else vv)
               for kk, vv in d.items()} for d in v] if k == "spline_data" else v)
         for k, v in blob.items()})
    np.testing.assert_allclose(back.a, art.a)
    np.testing.assert_allclose(back.omega_optimized, art.omega_optimized)
    np.testing.assert_allclose(back.geodesic_length, art.geodesic_length)
    assert back.metadata["steps"] == 7


def test_save_pytree_writes_exact_path(tmp_path):
    """save_pytree must write exactly the given name even without a .npz
    suffix (np.savez silently appends one to bare paths, breaking the
    save/load round trip)."""
    import numpy as np

    from vae_latent_geometry_tpu.io.checkpoint import (
        load_pytree,
        read_meta,
        save_pytree,
    )

    tree = {"w": np.arange(4.0, dtype=np.float32)}
    path = str(tmp_path / "model.ckpt")       # no .npz suffix
    save_pytree(tree, path, {"tag": 1})
    assert os.path.exists(path)
    assert not os.path.exists(path + ".npz")
    restored, meta = load_pytree(path, tree)
    np.testing.assert_array_equal(restored["w"], tree["w"])
    assert read_meta(path) == {"tag": 1} == meta


def test_concurrent_multiprocess_saves_never_corrupt(tmp_path):
    """Multi-host write safety: two PROCESSES repeatedly saving the same
    artifact path must always leave a loadable file (per-process temp names
    + atomic os.replace; a shared temp name would interleave the writers'
    bytes).  All writers produce identical content, so last-wins is valid."""
    import sys

    from vae_latent_geometry_tpu.io.artifacts import load_spline_batch

    path = str(tmp_path / "contended.npz")
    script = (
        "import sys\n"
        "import numpy as np\n"
        "from vae_latent_geometry_tpu.io.artifacts import ("
        "SplineBatchArtifact, save_spline_batch)\n"
        "art = SplineBatchArtifact(\n"
        "    a=np.ones((3, 2), np.float32), b=np.zeros((3, 2), np.float32),\n"
        "    omega_init=np.zeros((3, 5, 2), np.float32),\n"
        "    basis=np.eye(16, 5, dtype=np.float32), n_poly=4,\n"
        "    pair_indices=np.stack([np.arange(3), np.arange(3) + 3], 1),\n"
        "    valid=np.ones(3, bool), pair_labels=[['x', 'y']] * 3,\n"
        "    representatives=[], metadata={'tag': 7})\n"
        "for _ in range(40):\n"
        "    save_spline_batch(art, sys.argv[1])\n"
    )
    worker = tmp_path / "writer.py"
    worker.write_text(script)
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # APPEND to PYTHONPATH — this rig's env carries the platform plugin dir
    # there, and clobbering it breaks jax imports in the child
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(worker), path],
                              cwd=repo, env=env)
             for _ in range(2)]
    # read while both writers hammer the path: every observation must be a
    # complete, valid artifact (the atomic-replace contract)
    seen = 0
    while any(p.poll() is None for p in procs):
        if os.path.exists(path):
            art = load_spline_batch(path)
            assert art.metadata["tag"] == 7
            assert np.all(np.asarray(art.a) == 1.0)
            seen += 1
    assert [p.wait() for p in procs] == [0, 0]
    art = load_spline_batch(path)
    assert art.metadata["tag"] == 7 and seen > 0


def test_reference_blob_roundtrip_with_numpy_metadata(tmp_path, rng):
    """to_reference_blob must sanitize numpy scalars/arrays in
    representatives/metadata so its own hardened (weights_only=True) loader
    can read the export back (code-review r5 finding: UnpicklingError)."""
    torch = pytest.importorskip("torch")  # noqa: F841
    from vae_latent_geometry_tpu.io.artifacts import to_reference_blob

    art = SplineBatchArtifact(
        a=rng.normal(size=(2, 2)).astype(np.float32),
        b=rng.normal(size=(2, 2)).astype(np.float32),
        omega_init=rng.normal(size=(2, 5, 2)).astype(np.float32),
        basis=rng.normal(size=(16, 5)).astype(np.float32), n_poly=4,
        pair_indices=np.arange(4).reshape(2, 2),
        valid=np.ones(2, bool),
        pair_labels=[["a", "b"]] * 2,
        representatives=[{"index": np.int64(0), "label": "a",
                          "latent": np.arange(2.0)}],
        omega_optimized=rng.normal(size=(2, 5, 2)).astype(np.float32),
        geodesic_length=np.array([1.0, 2.0], np.float32),
        metadata={"steps": np.int32(100), "scale": np.float64(0.5),
                  "curve": np.arange(3.0)},
    )
    p = str(tmp_path / "blob.pt")
    to_reference_blob(art, p)
    back = load_spline_batch(p)       # routes through load_spline_blob
    np.testing.assert_allclose(back.a, art.a, rtol=1e-6)
    np.testing.assert_allclose(back.omega_optimized, art.omega_optimized,
                               rtol=1e-6)
    assert back.metadata["steps"] == 100


def test_torch_load_numpy_fallback_and_module_rejection(tmp_path):
    """Blobs from older exporters may pickle bare numpy objects: the loader
    retries with numpy's reconstruction machinery allowlisted (data-only).
    A full nn.Module pickle stays rejected, with an error naming the fix."""
    torch = pytest.importorskip("torch")
    from vae_latent_geometry_tpu.models.torch_import import _torch_load

    legacy = {"spline_data": [], "meta": {"n": np.int64(3),
                                          "x": np.arange(4.0)}}
    p1 = str(tmp_path / "legacy.pt")
    torch.save(legacy, p1)
    got = _torch_load(p1)
    assert got["meta"]["n"] == 3
    np.testing.assert_array_equal(got["meta"]["x"], np.arange(4.0))

    p2 = str(tmp_path / "module.pt")
    torch.save(torch.nn.Linear(2, 2), p2)
    with pytest.raises(RuntimeError, match="state_dict"):
        _torch_load(p2)
