"""Direct unit tests for small public surfaces that were previously only
exercised indirectly (CLI wiring, golden pipelines)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_latent_geometry_tpu.config import (
    GeodesicConfig,
    ModelConfig,
    from_dict,
    to_dict,
)


def test_select_representatives_semantics(rng):
    """Reference semantics (src/select_representative_pairs.py:22-35):
    labels in sorted np.unique order, first max_labels, and per class the
    point closest to the class latent centroid (first index on ties)."""
    from vae_latent_geometry_tpu.pipeline.select_pairs import (
        make_pairs,
        select_representatives,
    )

    latents = np.array([[0.0, 0.0], [2.0, 0.0], [1.2, 0.0],   # class "b"
                        [5.0, 5.0], [7.0, 5.0], [5.9, 5.0]])  # class "a"
    labels = np.array(["b", "b", "b", "a", "a", "a"])
    reps = select_representatives(latents, labels, max_labels=2)
    # sorted unique order: "a" first
    assert [r["label"] for r in reps] == ["a", "b"]
    # class a centroid (5.966.., 5) -> closest is index 5; class b centroid
    # (1.066.., 0) -> closest is index 2
    assert [r["index"] for r in reps] == [5, 2]
    assert make_pairs(reps) == [(5, 2)]

    # ordering cap: only the first max_labels sorted labels survive
    reps1 = select_representatives(latents, labels, max_labels=1)
    assert [r["label"] for r in reps1] == ["a"]


def test_arc_lengths_straight_line():
    """Latent arc length of a straight line == endpoint distance
    (reference compute_arc_length, optimize_energy.py:167-172)."""
    from vae_latent_geometry_tpu.geometry.energy import arc_lengths

    a = jnp.asarray([[0.0, 0.0], [1.0, 2.0]])
    b = jnp.asarray([[3.0, 4.0], [1.0, 2.0]])
    t = jnp.linspace(0, 1, 101)[:, None, None]
    gamma = (1 - t) * a[None] + t * b[None]            # (T, B, 2)
    out = np.asarray(arc_lengths(gamma))
    np.testing.assert_allclose(out, [5.0, 0.0], atol=1e-5)


def test_pad_to_multiple_edges():
    from vae_latent_geometry_tpu.parallel.mesh import pad_to_multiple

    x = np.arange(6).reshape(6, 1)
    padded, n = pad_to_multiple(x, 4)
    assert n == 6 and padded.shape[0] == 8
    # edge replication: padding repeats the last row
    assert (padded[6:] == x[-1]).all()
    same, n2 = pad_to_multiple(x, 3)
    assert n2 == 6 and same.shape[0] == 6


def test_stack_unstack_decode_one_roundtrip():
    from vae_latent_geometry_tpu.models import nets
    from vae_latent_geometry_tpu.models.evae import (
        decode_all,
        decode_one,
        stack_decoders,
        unstack_decoders,
    )

    decs = [nets.decoder_init(k, 2, 7, (8,))
            for k in jax.random.split(jax.random.PRNGKey(0), 3)]
    stacked = stack_decoders(decs)
    back = unstack_decoders(stacked, 3)
    for orig, rt in zip(decs, back):
        for x, y in zip(jax.tree_util.tree_leaves(orig),
                        jax.tree_util.tree_leaves(rt)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    z = jnp.ones((4, 2))
    allout = decode_all(stacked, z)
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(decode_one(stacked, i, z)), np.asarray(allout[i]))


def test_config_dict_roundtrip():
    cfg = ModelConfig(latent_dim=3, num_decoders=4, decoder_sigma=0.5)
    assert from_dict(ModelConfig, to_dict(cfg)) == cfg
    g = GeodesicConfig(steps=7)
    d = to_dict(g)
    assert d["steps"] == 7
    assert from_dict(GeodesicConfig, d) == g


def test_kde_density_mass_location(rng):
    """KDE density (viz.plotting.kde_density, the reference's sigma=0.3
    Gaussian KDE at src/plotting.py:58-62): higher where the data is."""
    from vae_latent_geometry_tpu.viz.plotting import kde_density

    pts = rng.normal(size=(500, 2)).astype(np.float32) * 0.2
    pts[:250] += 3.0
    grid = np.array([[0.0, 0.0], [3.0, 3.0], [1.5, 1.5]], np.float32)
    dens = np.asarray(kde_density(pts, grid))
    assert dens.shape == (3,)
    assert (dens >= 0).all()
    # density at the two blobs beats the empty middle point
    assert dens[0] > 10 * max(dens[2], 1e-12)
    assert dens[1] > 10 * max(dens[2], 1e-12)


def test_profiling_utils_smoke():
    from vae_latent_geometry_tpu.utils.profiling import (
        nan_guard,
        time_fn,
        trace_annotation,
    )

    f = jax.jit(lambda x: x * 2.0)
    dt = time_fn(f, jnp.ones(4), iters=2)
    assert dt > 0
    with trace_annotation("unit-test-span"):
        pass
    with nan_guard(False):
        pass


def test_get_logger_is_configured_once():
    from vae_latent_geometry_tpu.utils.logging import get_logger

    lg1 = get_logger("vlg-test")
    lg2 = get_logger("vlg-test")
    assert lg1 is lg2
    lg1.info("smoke")


def test_enable_compile_cache(tmp_path, monkeypatch):
    from vae_latent_geometry_tpu.utils.compile_cache import enable_compile_cache

    # restore afterwards: later tests in this process must not inherit a
    # cache dir pointing into this test's deleted tmp_path, nor the lowered
    # min-compile-time threshold
    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        # explicit dir wins, is created, and is what jax is pointed at
        d = str(tmp_path / "jc")
        assert enable_compile_cache(d) == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

        # env override
        d2 = str(tmp_path / "jc2")
        monkeypatch.setenv("VLG_COMPILE_CACHE", d2)
        assert enable_compile_cache() == d2

        # kill switch: returns None and leaves the previous setting untouched
        monkeypatch.setenv("VLG_NO_COMPILE_CACHE", "1")
        assert enable_compile_cache(str(tmp_path / "jc3")) is None
        assert jax.config.jax_compilation_cache_dir == d2

        # any non-falsy value trips the switch (legacy =on / =y users stay
        # disabled) ...
        for v in ("on", "y", "2"):
            monkeypatch.setenv("VLG_NO_COMPILE_CACHE", v)
            assert enable_compile_cache(str(tmp_path / "jc3")) is None
        # ... but explicit falsy values must NOT silently disable the
        # cache (documented contract is =1; ADVICE r4)
        monkeypatch.setenv("VLG_NO_COMPILE_CACHE", "0")
        d3 = str(tmp_path / "jc3")
        monkeypatch.setenv("VLG_COMPILE_CACHE", d3)
        assert enable_compile_cache() == d3
        monkeypatch.setenv("VLG_NO_COMPILE_CACHE", "false")
        assert enable_compile_cache() == d3
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
