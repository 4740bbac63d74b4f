"""Fused Pallas energy kernel vs the XLA reference path (interpret mode on
CPU; compiled on real TPU via bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_latent_geometry_tpu.geometry import energy as E
from vae_latent_geometry_tpu.models import nets
from vae_latent_geometry_tpu.models.evae import stack_decoders
from vae_latent_geometry_tpu.ops.energy_pallas import (
    energy_expected_fused,
    fused_available,
)

pytestmark = pytest.mark.skipif(not fused_available(),
                                reason="pallas unavailable")


@pytest.fixture(scope="module")
def setup(rng):
    decs = stack_decoders([
        nets.decoder_init(k, 2, 50, (128, 128))
        for k in jax.random.split(jax.random.PRNGKey(0), 4)
    ])
    T, B = 64, 8
    gamma = jnp.asarray(rng.normal(size=(T, B, 2)) * 1.5, jnp.float32)
    return decs, gamma


def test_forward_matches_xla(setup):
    decs, gamma = setup
    e_ref = np.asarray(E.energy_expected(decs, gamma))
    e_fused = np.asarray(energy_expected_fused(decs, gamma))
    np.testing.assert_allclose(e_fused, e_ref, rtol=1e-5)


def test_backward_matches_xla(setup):
    decs, gamma = setup
    g_ref = jax.grad(lambda g: jnp.sum(E.energy_expected(decs, g)))(gamma)
    g_fused = jax.grad(
        lambda g: jnp.sum(energy_expected_fused(decs, g)))(gamma)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_backward_weighted_cotangent(setup):
    """Per-spline cotangents flow correctly (loss = <w, E>)."""
    decs, gamma = setup
    w = jnp.asarray(np.linspace(0.5, 2.0, gamma.shape[1]), jnp.float32)
    g_ref = jax.grad(lambda g: jnp.sum(w * E.energy_expected(decs, g)))(gamma)
    g_fused = jax.grad(
        lambda g: jnp.sum(w * energy_expected_fused(decs, g)))(gamma)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_uneven_chunking(rng):
    """T with a small prime factor still splits into valid chunks."""
    decs = stack_decoders([
        nets.decoder_init(k, 2, 10, (16,))
        for k in jax.random.split(jax.random.PRNGKey(1), 3)
    ])
    for T in (10, 25, 33):
        gamma = jnp.asarray(rng.normal(size=(T, 4, 2)), jnp.float32)
        e_ref = np.asarray(E.energy_expected(decs, gamma))
        e_fused = np.asarray(energy_expected_fused(decs, gamma))
        np.testing.assert_allclose(e_fused, e_ref, rtol=1e-5,
                                   err_msg=f"T={T}")


def test_bfloat16_mode_close(setup):
    decs, gamma = setup
    e_ref = np.asarray(E.energy_expected(decs, gamma))
    e_bf = np.asarray(energy_expected_fused(decs, gamma, None, "bfloat16"))
    np.testing.assert_allclose(e_bf, e_ref, rtol=3e-2)


def test_num_active_weights_match_xla(setup, rng):
    """Per-spline first-k-decoder weight planes (the CoV sweep) match the
    XLA masked-mean path, forward and backward."""
    from vae_latent_geometry_tpu.ops.energy_pallas import active_weights

    decs, gamma = setup
    B = gamma.shape[1]
    num_active = jnp.asarray(rng.integers(1, 5, size=(B,)), jnp.int32)
    wmb = active_weights(num_active, 4, B)
    e_ref = np.asarray(E.energy_expected(decs, gamma, num_active))
    e_fused = np.asarray(energy_expected_fused(decs, gamma, wmb))
    np.testing.assert_allclose(e_fused, e_ref, rtol=1e-5)
    g_ref = jax.grad(
        lambda g: jnp.sum(E.energy_expected(decs, g, num_active)))(gamma)
    g_fused = jax.grad(
        lambda g: jnp.sum(energy_expected_fused(decs, g, wmb)))(gamma)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_batch_grid_large_B(rng):
    """The B-axis grid covers batches past the old 256 cliff (the reference
    single-decoder config is B=500) including non-multiples of the block."""
    decs = stack_decoders([
        nets.decoder_init(k, 2, 10, (16,))
        for k in jax.random.split(jax.random.PRNGKey(2), 3)
    ])
    for B in (500, 1024):
        gamma = jnp.asarray(rng.normal(size=(48, B, 2)), jnp.float32)
        e_ref = np.asarray(E.energy_expected(decs, gamma))
        e_fused = np.asarray(energy_expected_fused(decs, gamma))
        np.testing.assert_allclose(e_fused, e_ref, rtol=1e-5, err_msg=f"B={B}")
        w = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
        g_ref = jax.grad(
            lambda g: jnp.sum(w * E.energy_expected(decs, g)))(gamma)
        g_fused = jax.grad(
            lambda g: jnp.sum(w * energy_expected_fused(decs, g)))(gamma)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-4, err_msg=f"B={B}")


def test_single_fused_mode_matches_single(rng):
    """mode='single_fused' (expected kernel, M=1 fast path) == mode='single'."""
    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.optim.geodesic import optimize_splines

    dec = nets.decoder_init(jax.random.PRNGKey(3), 2, 50, (128, 128))
    B = 5
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    omega0 = jnp.zeros((B, 5, 2))
    cfg_f = GeodesicConfig(steps=30, lr=1e-2,
                           energy=EnergyConfig(num_t=32, mode="single_fused",
                                               kernel_precision="float32"))
    cfg_x = GeodesicConfig(steps=30, lr=1e-2,
                           energy=EnergyConfig(num_t=32, mode="single"))
    rf = optimize_splines(dec, omega0, a, b, basis, cfg_f)
    rx = optimize_splines(dec, omega0, a, b, basis, cfg_x)
    np.testing.assert_allclose(np.asarray(rf.energy), np.asarray(rx.energy),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rf.omega), np.asarray(rx.omega),
                               rtol=1e-3, atol=1e-5)
    # reduced-precision rungs wobble the trajectory but the final (exact)
    # energies must still agree
    for prec in ("f32x3", "f32x2"):
        cfg_p = GeodesicConfig(steps=30, lr=1e-2,
                               energy=EnergyConfig(num_t=32,
                                                   mode="single_fused",
                                                   kernel_precision=prec))
        rp = optimize_splines(dec, omega0, a, b, basis, cfg_p)
        np.testing.assert_allclose(np.asarray(rp.energy),
                                   np.asarray(rx.energy), rtol=1e-3)


def test_fused_mode_in_optimizer(rng):
    """The optimizer runs end-to-end with the fused energy mode and matches
    the XLA expected mode."""
    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.optim.geodesic import optimize_splines

    decs = stack_decoders([
        nets.decoder_init(k, 2, 12, (16,))
        for k in jax.random.split(jax.random.PRNGKey(5), 3)
    ])
    B = 3
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    omega0 = jnp.zeros((B, 5, 2))
    cfg_f = GeodesicConfig(steps=40, lr=1e-2,
                           energy=EnergyConfig(num_t=32, mode="expected_fused",
                                               kernel_precision="float32"))
    cfg_x = GeodesicConfig(steps=40, lr=1e-2,
                           energy=EnergyConfig(num_t=32, mode="expected"))
    rf = optimize_splines(decs, omega0, a, b, basis, cfg_f)
    rx = optimize_splines(decs, omega0, a, b, basis, cfg_x)
    np.testing.assert_allclose(np.asarray(rf.energy), np.asarray(rx.energy),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rf.omega), np.asarray(rx.omega),
                               rtol=1e-3, atol=1e-5)
    # default rung (f32x3, single-pass cotangent chain): trajectory wobbles
    # slightly but the exact final energies must agree
    cfg_d = GeodesicConfig(steps=40, lr=1e-2,
                           energy=EnergyConfig(num_t=32,
                                               mode="expected_fused"))
    rd = optimize_splines(decs, omega0, a, b, basis, cfg_d)
    np.testing.assert_allclose(np.asarray(rd.energy), np.asarray(rx.energy),
                               rtol=1e-3)


def test_shape_guard_falls_back(rng):
    """Shapes the kernel can't lay out route to the XLA path instead of a
    doomed compile.  The old empirical B <= 256 cliff is gone (B is gridded):
    the reference's B=500 and B=1024 now fit."""
    from vae_latent_geometry_tpu.ops.energy_pallas import fused_fits

    assert fused_fits(2000, 200, 2, 50, 10, mc=False)
    assert fused_fits(2000, 200, 2, 50, 10, mc=True)
    assert fused_fits(2000, 400, 2, 50, 10, mc=True)
    assert fused_fits(2000, 500, 2, 50, 10, mc=False)  # reference B=500
    assert fused_fits(2000, 1024, 2, 50, 10, mc=True)
    assert not fused_fits(2000, 200, 3, 50, 10)    # D > 2: no plane layout
    assert not fused_fits(2000, 200, 2, 256, 10)   # X too wide for chunks
    assert not fused_fits(2000, 200, 2, 50, 32)    # ensemble too large
    assert not fused_fits(1999, 200, 2, 50, 10)    # prime T: no aligned chunk
    # the single-decode backward keeps per-decoder center outputs + ReLU
    # masks live across the decoder loop, so the VMEM screen is M-scaled:
    # the M=16 cap fits at the gridded/production widths but NOT at the
    # single-block B=256 edge (the boundary approvals below are
    # hardware-validated to compile and run — _FITS_BUDGET's calibration)
    assert fused_fits(2000, 200, 2, 50, 16, mc=False)
    assert fused_fits(2000, 200, 2, 50, 16, mc=True)
    assert fused_fits(2000, 256, 2, 50, 10, mc=False)
    assert not fused_fits(2000, 256, 2, 50, 16, mc=False)
    # the optimizer still works (falls back silently) on unlayoutable shapes
    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.optim.geodesic import optimize_splines

    decs = stack_decoders([
        nets.decoder_init(k, 2, 50, (128, 128))
        for k in jax.random.split(jax.random.PRNGKey(0), 18)  # M=18 > 16
    ])
    B = 12
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    cfg = GeodesicConfig(steps=2, energy=EnergyConfig(num_t=16, mode="mc_fused"))
    res = optimize_splines(decs, jnp.zeros((B, 5, 2)), a, b, basis, cfg)
    assert np.isfinite(np.asarray(res.energy)).all()


def test_stats_kernel_decomposition_matches_expected(rng):
    """energy_expected_sharded with axis_name=None is a single-device
    decomposition through the stats kernel: forward and gradient must equal
    the XLA expected energy (the ep-sharded fast path's building block)."""
    from vae_latent_geometry_tpu.geometry import energy as E
    from vae_latent_geometry_tpu.ops.energy_pallas import (
        energy_expected_sharded,
        uniform_weights_local,
    )

    decs = stack_decoders([
        nets.decoder_init(k, 2, 50, (128, 128))
        for k in jax.random.split(jax.random.PRNGKey(4), 5)
    ])
    T, B = 48, 6
    g = jnp.asarray(rng.normal(size=(T, B, 2)), jnp.float32)
    wmb = uniform_weights_local(5, 5, B)
    e_ref = np.asarray(E.energy_expected(decs, g))
    e_stats = np.asarray(energy_expected_sharded(decs, g, wmb, None))
    np.testing.assert_allclose(e_stats, e_ref, rtol=1e-5)

    w = jnp.asarray(np.linspace(0.5, 2.0, B), jnp.float32)
    g_ref = jax.grad(lambda g: jnp.sum(w * E.energy_expected(decs, g)))(g)
    g_st = jax.grad(
        lambda g: jnp.sum(w * energy_expected_sharded(decs, g, wmb, None)))(g)
    np.testing.assert_allclose(np.asarray(g_st), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_active_weights_local_covers_global_plane():
    """Concatenating every shard's active_weights_local rows reproduces the
    global active_weights plane — evaluated with a REAL axis_index per shard
    under shard_map, so the p * M_local + arange offset arithmetic is
    exercised on every shard, not just shard 0."""
    from jax.sharding import Mesh, PartitionSpec as P

    from vae_latent_geometry_tpu.ops.energy_pallas import (
        active_weights,
        active_weights_local,
    )

    B, M, ep = 7, 8, 4
    num_active = jnp.asarray([1, 2, 3, 4, 5, 6, 8])
    ref = np.asarray(active_weights(num_active, M, B))

    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))
    gathered = jax.shard_map(
        lambda: active_weights_local(num_active, M, M // ep, B,
                                     axis_name="ep"),
        mesh=mesh, in_specs=(), out_specs=P("ep"), check_vma=False,
    )()
    np.testing.assert_allclose(np.asarray(gathered), ref)
    # single-device decomposition (axis_name=None) is shard 0
    loc0 = np.asarray(active_weights_local(num_active, M, M // ep, B))
    np.testing.assert_allclose(loc0, ref[: M // ep])


def test_mc_fused_rng_zero_draw_plumbing(rng):
    """Off-TPU the in-kernel PRNG yields zero bits (TPU interpret backend),
    so every draw selects decoder 0: forward and backward must equal the
    single-decoder-0 energy — a full plumbing check of the rng kernels'
    masks, carries and cotangent routing (sampling behavior itself is
    validated on hardware: experiment/mc_rng_check.json)."""
    from vae_latent_geometry_tpu.geometry import energy as E
    from vae_latent_geometry_tpu.ops.energy_mc_pallas import (
        energy_mc_fused_rng,
    )

    decs = stack_decoders([
        nets.decoder_init(k, 2, 50, (128, 128))
        for k in jax.random.split(jax.random.PRNGKey(0), 5)
    ])
    T, B = 48, 6
    g = jnp.asarray(rng.normal(size=(T, B, 2)) * 1.5, jnp.float32)
    kmax = jnp.full((1, B), 5.0)
    seed = jnp.asarray([7], jnp.int32)
    dec0 = jax.tree_util.tree_map(lambda x: x[0], decs)

    e = np.asarray(energy_mc_fused_rng(decs, g, seed, kmax, 2, "float32"))
    e0 = np.asarray(E.energy_single(dec0, g))
    np.testing.assert_allclose(e, e0, rtol=1e-5)

    w = jnp.asarray(np.linspace(0.5, 2.0, B), jnp.float32)
    gr = jax.grad(lambda g: jnp.sum(
        w * energy_mc_fused_rng(decs, g, seed, kmax, 2, "float32")))(g)
    gr0 = jax.grad(lambda g: jnp.sum(w * E.energy_single(dec0, g)))(g)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr0),
                               rtol=1e-3, atol=1e-5)


def test_transposed_kernel_matches_expected(rng):
    """Transposed-layout (lane-fused points) expected-energy kernel equals
    the XLA expected energy in forward and gradient, across chunk carries
    (multi T-chunk) and batch blocks (B > 256)."""
    from vae_latent_geometry_tpu.geometry import energy as E
    from vae_latent_geometry_tpu.ops._research.energy_pallas_t import (
        energy_expected_fused_t,
        fused_t_fits,
    )

    decs = stack_decoders([
        nets.decoder_init(k, 2, 50, (128, 128))
        for k in jax.random.split(jax.random.PRNGKey(0), 4)
    ])
    for T, B in ((32, 6), (64, 300)):
        assert fused_t_fits(T, B, 2, 50, 4)
        g = jnp.asarray(rng.normal(size=(T, B, 2)) * 1.5, jnp.float32)
        e_ref = np.asarray(E.energy_expected(decs, g))
        e_t = np.asarray(energy_expected_fused_t(decs, g, "float32"))
        np.testing.assert_allclose(e_t, e_ref, rtol=1e-5)
        w = jnp.asarray(np.linspace(0.5, 2.0, B), jnp.float32)
        gr_ref = jax.grad(
            lambda g: jnp.sum(w * E.energy_expected(decs, g)))(g)
        gr_t = jax.grad(lambda g: jnp.sum(
            w * energy_expected_fused_t(decs, g, "float32")))(g)
        # rtol 5e-3: isolated ReLU-boundary elements differ by ~2e-3 when
        # the recompute's operation order disagrees with XLA's at a kink
        np.testing.assert_allclose(np.asarray(gr_t), np.asarray(gr_ref),
                                   rtol=5e-3, atol=1e-5)
    # shape guard: non-3-layer decoders and num_active fall back
    assert not fused_t_fits(32, 6, 2, 50, 4, n_layers=2)
    assert not fused_t_fits(32, 6, 2, 50, 4, num_active=np.array([1]))


def test_expected_fused_optimizes_three_layer_decoders(rng):
    """expected_fused mode optimizes 3-layer (two-hidden) decoders
    correctly via the regular fused kernel.  NOTE: the optimizer does NOT
    dispatch the transposed kernel (ops/_research/energy_pallas_t.py) — that
    layout
    measured slower on hardware and is kept only as a documented negative
    result; this test covers the deeper-decoder shape through the live
    path."""
    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.optim.geodesic import optimize_splines

    decs = stack_decoders([
        nets.decoder_init(k, 2, 50, (128, 128))
        for k in jax.random.split(jax.random.PRNGKey(3), 3)
    ])
    B = 4
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    res = optimize_splines(
        decs, jnp.zeros((B, 5, 2)), a, b, basis,
        GeodesicConfig(steps=20, lr=1e-2,
                       energy=EnergyConfig(num_t=32, mode="expected_fused")),
        record_history=True)
    hist = np.asarray(res.energy_history)
    assert np.isfinite(hist).all()
    assert hist[-1].mean() < hist[0].mean()


def test_wmb_and_decoder_cotangents_are_true_zeros(setup):
    """The not-differentiated contract is enforced at entry: grads w.r.t.
    the weight plane and the decoder params through the public fused energy
    are exact zeros (stop_gradient), not silently-wrong values from the
    custom rule."""
    from vae_latent_geometry_tpu.ops.energy_pallas import uniform_weights

    decs, gamma = setup
    M = 4
    wmb = uniform_weights(M, gamma.shape[1])

    g_wmb = jax.grad(
        lambda w: jnp.sum(energy_expected_fused(decs, gamma, w)))(wmb)
    assert np.all(np.asarray(g_wmb) == 0.0)

    g_dec = jax.grad(
        lambda d: jnp.sum(energy_expected_fused(d, gamma)))(decs)
    assert all(np.all(np.asarray(leaf) == 0.0)
               for leaf in jax.tree_util.tree_leaves(g_dec))


def test_direct_kernel_call_rejects_unchunkable_T(setup, monkeypatch):
    """Direct API calls that bypass fused_fits must get a clear error for a
    T with no 8-aligned divisor when COMPILING for TPU — the kernel's
    pl.multiple_of alignment promise would otherwise MISCOMPILE under
    Mosaic.  (Interpret mode executes any Tc exactly and stays permissive —
    test_uneven_chunking covers that.)"""
    from vae_latent_geometry_tpu.ops import energy_pallas

    monkeypatch.setattr(energy_pallas, "_is_tpu", lambda: True)
    decs, _ = setup
    g_bad = jnp.zeros((100, 8, 2), jnp.float32)   # divisors of 100: no 8k
    with pytest.raises(ValueError, match="Mosaic alignment"):
        energy_expected_fused(decs, g_bad)

    from vae_latent_geometry_tpu.ops.energy_mc_pallas import energy_mc_fused

    d = jnp.zeros((2, 99, 8), jnp.int32)
    with pytest.raises(ValueError, match="Mosaic alignment"):
        energy_mc_fused(decs, g_bad, d, d)
