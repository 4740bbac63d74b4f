"""Smooth-curve numerics guards.

The discrete energies are sums of squared differences of *adjacent* decoded
t-samples.  On a smooth curve those differences are ~|x|/T — far below the
~4e-3 input rounding of bf16 MXU matmuls (JAX's DEFAULT f32 matmul precision
on TPU), so insufficient precision turns the energy into noise while
random-curve tests stay green (measured on a real v5e: ~6x median error vs
float64 under default precision, <1e-7 under 'highest').

These tests pin (1) the package-level 'highest' matmul default, and (2)
agreement of every energy path with a float64 host recomputation on smooth
curves — the adversarial input class.  On CPU they guard the semantics; run
on a real TPU they catch precision regressions in the compiled kernels
(bench.py runs the same check on hardware every round).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_latent_geometry_tpu.geometry import energy as E
from vae_latent_geometry_tpu.models import nets
from vae_latent_geometry_tpu.ops.energy_mc_pallas import energy_mc_fused
from vae_latent_geometry_tpu.ops.energy_pallas import energy_expected_fused


def test_package_pins_highest_matmul_precision():
    assert jax.config.jax_default_matmul_precision == "highest"


def _smooth_batch(T=512, B=8, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, T)[:, None, None]
    a = rng.normal(size=(1, B, 2))
    b = rng.normal(size=(1, B, 2))
    g64 = (1 - t) * a + t * b \
        + 0.3 * np.sin(np.pi * t * 3) * rng.normal(size=(1, B, 2))
    return g64


def _stack(M, seed0=0):
    ps = [nets.decoder_init(jax.random.PRNGKey(k + seed0)) for k in range(M)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ps)


def _decode64(decoders, m, g64):
    T, B, _ = g64.shape
    ws = [np.asarray(l["w"])[m].astype(np.float64)
          for l in decoders["layers"]]
    bs = [np.asarray(l["b"])[m].astype(np.float64)
          for l in decoders["layers"]]
    h = g64.reshape(-1, 2)
    for i in range(len(ws)):
        h = h @ ws[i] + bs[i]
        if i < len(ws) - 1:
            h = np.maximum(h, 0)
    return h.reshape(T, B, -1)


def test_expected_energy_smooth_curve_vs_float64():
    g64 = _smooth_batch()
    g = jnp.asarray(g64, jnp.float32)
    dec = _stack(4)
    xs = np.stack([_decode64(dec, m, g64) for m in range(4)])
    xbar = xs.mean(0)
    sq = (xs ** 2).sum(-1).mean(0)
    truth = (sq[1:] + sq[:-1] - 2 * (xbar[1:] * xbar[:-1]).sum(-1)).sum(0)

    for name, e in [
        ("xla", E.energy_expected(dec, g)),
        ("fused", energy_expected_fused(dec, g, None, "float32")),
    ]:
        rel = np.abs(np.asarray(e) - truth) / np.abs(truth)
        assert np.median(rel) < 1e-4, (name, np.median(rel))


def test_single_energy_smooth_curve_vs_float64():
    g64 = _smooth_batch(seed=1)
    g = jnp.asarray(g64, jnp.float32)
    dec = _stack(1, seed0=9)
    x = _decode64(dec, 0, g64)
    truth = ((x[1:] - x[:-1]) ** 2).sum(axis=(0, 2))
    single = jax.tree_util.tree_map(lambda v: v[0], dec)
    for name, e in [
        ("xla_single", E.energy_single(single, g)),
        ("fused_m1", energy_expected_fused(dec, g, None, "float32")),
    ]:
        rel = np.abs(np.asarray(e) - truth) / np.abs(truth)
        assert np.median(rel) < 1e-4, (name, np.median(rel))


def test_mc_energy_smooth_curve_vs_float64():
    g64 = _smooth_batch(seed=2)
    T, B, _ = g64.shape
    g = jnp.asarray(g64, jnp.float32)
    M, S = 4, 2
    dec = _stack(M, seed0=3)
    rng = np.random.default_rng(5)
    d1 = rng.integers(0, M, size=(S, T - 1, B))
    d2 = rng.integers(0, M, size=(S, T - 1, B))
    xs = np.stack([_decode64(dec, m, g64) for m in range(M)])
    truth = np.zeros(B)
    for s in range(S):
        for b in range(B):
            xlo = xs[d1[s, :, b], np.arange(T - 1), b]
            xhi = xs[d2[s, :, b], np.arange(1, T), b]
            truth[b] += ((xhi - xlo) ** 2).sum()
    truth /= S
    e = energy_mc_fused(dec, g, jnp.asarray(d1, jnp.int32),
                        jnp.asarray(d2, jnp.int32), "float32")
    rel = np.abs(np.asarray(e) - truth) / np.abs(truth)
    assert np.median(rel) < 1e-4, np.median(rel)


def test_grad_smooth_curve_vs_float64_fd():
    """Fused-kernel gradient on a smooth curve vs float64 finite differences
    of the f64 truth energy (spot-checked coordinates)."""
    g64 = _smooth_batch(T=64, B=4, seed=6)
    g = jnp.asarray(g64, jnp.float32)
    dec = _stack(2, seed0=11)

    def truth_e(gg):
        xs = np.stack([_decode64(dec, m, gg) for m in range(2)])
        xbar = xs.mean(0)
        sq = (xs ** 2).sum(-1).mean(0)
        return (sq[1:] + sq[:-1]
                - 2 * (xbar[1:] * xbar[:-1]).sum(-1)).sum(0).sum()

    grad = np.asarray(jax.grad(
        lambda gg: energy_expected_fused(dec, gg, None, "float32").sum())(g))
    rng = np.random.default_rng(8)
    eps = 1e-5
    for _ in range(6):
        ti, bi, di = rng.integers(1, 63), rng.integers(0, 4), rng.integers(0, 2)
        gp = g64.copy(); gp[ti, bi, di] += eps
        gm = g64.copy(); gm[ti, bi, di] -= eps
        fd = (truth_e(gp) - truth_e(gm)) / (2 * eps)
        assert grad[ti, bi, di] == pytest.approx(fd, rel=2e-2, abs=1e-5)
