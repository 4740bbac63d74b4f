"""Randomized shape/precision property sweeps for the fused kernel families.

The bug class this targets has bitten three times across rounds (each found
by hand): Mosaic alignment promises on chunked dynamic slices, gather
clamping at the decoder-index boundary, and chunk-divisor edge cases in
``_pick_chunk``/``_dims``.  Every config here compares the interpret-mode
fused kernels against the plain-XLA reference paths for the FORWARD value
AND the gamma GRADIENT, across all three families:

- expected  (`energy_expected_fused`, ops/energy_pallas.py)
- mc        (`energy_mc_fused`, ops/energy_mc_pallas.py, external indices)
- stats     (`energy_expected_sharded(axis_name=None)` through the
             sufficient-statistics kernel pair, ops/energy_pallas.py)

Configs are drawn by a seeded sampler (deterministic across runs) and
augmented with hand-picked adversarial corners: prime T (no aligned chunk
divisor), T=16 minimum, B=1, X=1, M=1, mixed per-spline num_active, indices
pinned at the M-1 gather boundary, and batch sizes crossing the kernels'
batch-block grid (Bb caps: 256 expected / 128 mc).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_latent_geometry_tpu.geometry import energy as E
from vae_latent_geometry_tpu.models import nets
from vae_latent_geometry_tpu.models.evae import decode_all, stack_decoders
from vae_latent_geometry_tpu.ops.energy_mc_pallas import energy_mc_fused
from vae_latent_geometry_tpu.ops.energy_pallas import (
    active_weights,
    energy_expected_fused,
    energy_expected_sharded,
    fused_available,
    uniform_weights,
)

pytestmark = pytest.mark.skipif(not fused_available(),
                                reason="pallas unavailable")

# (fwd_tol, grad_tol) per precision rung, as max-abs error RELATIVE TO THE
# MAX MAGNITUDE of the reference output (plain per-element rtol is the wrong
# metric here: reduced rungs carry bf16 hi/lo split noise that is absolute
# at the output scale, so near-zero gradient components legitimately show
# rel error ~1).  Calibrated against a 37-config measurement sweep of the
# interpret-mode kernels (float32 measured <= 6e-7 fwd / 2e-7 grad; f32x3
# <= 2.4e-6 / 3.3e-3; f32x2 <= 5.1e-4 / 1.7e-2), with ~5-20x margin; the
# configs are seeded-deterministic so a bug moves errors ORDERS beyond this.
_TOL = {
    "float32": (1e-5, 5e-6),
    "f32x3": (5e-5, 1.5e-2),
    "f32x2": (3e-3, 8e-2),
}


def _sample_configs(n, seed, b_max=48):
    rng = np.random.default_rng(seed)
    cfgs = []
    for i in range(n):
        depth = int(rng.integers(1, 3))
        cfgs.append(dict(
            T=int(rng.integers(16, 97)),
            B=int(rng.integers(1, b_max + 1)),
            D=int(rng.integers(1, 3)),
            X=int(rng.integers(1, 129)),
            M=int(rng.integers(1, 9)),
            hidden=tuple(int(rng.choice([8, 16, 64, 128]))
                         for _ in range(depth)),
            num_active=bool(rng.integers(0, 2)),
            precision=str(rng.choice(list(_TOL))),
            seed=int(rng.integers(0, 2**31)),
        ))
    return cfgs


_CORNERS = [
    # prime T: no 8-aligned divisor (interpret executes any Tc exactly;
    # the chunk picker must still produce a valid decomposition)
    dict(T=31, B=7, D=2, X=50, M=4, hidden=(16,), num_active=True,
         precision="float32", seed=1),
    dict(T=17, B=3, D=1, X=9, M=3, hidden=(8, 8), num_active=False,
         precision="f32x3", seed=2),
    # minimum T, single spline, single feature, single decoder
    dict(T=16, B=1, D=2, X=1, M=1, hidden=(8,), num_active=False,
         precision="float32", seed=3),
    # batch crossing the expected kernels' 256-wide block grid
    dict(T=16, B=264, D=2, X=5, M=2, hidden=(8,), num_active=True,
         precision="float32", seed=4),
    # X at the 128-lane boundary exactly
    dict(T=24, B=5, D=2, X=128, M=2, hidden=(16,), num_active=False,
         precision="f32x2", seed=5),
]


def _make_problem(c):
    rng = np.random.default_rng(c["seed"])
    keys = jax.random.split(jax.random.PRNGKey(c["seed"] % 997), c["M"])
    decs = stack_decoders([
        nets.decoder_init(k, c["D"], c["X"], c["hidden"]) for k in keys])
    gamma = jnp.asarray(rng.normal(size=(c["T"], c["B"], c["D"])) * 1.5,
                        jnp.float32)
    num_active = (jnp.asarray(rng.integers(1, c["M"] + 1, size=c["B"]),
                              jnp.int32) if c["num_active"] else None)
    return decs, gamma, num_active, rng


def _check(c, e_fused, e_ref, g_fused, g_ref):
    ft, gt = _TOL[c["precision"]]

    def scaled_max_err(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-30))

    fe = scaled_max_err(e_fused, e_ref)
    ge = scaled_max_err(g_fused, g_ref)
    assert fe <= ft, f"forward scaled-max err {fe:.3e} > {ft:.0e} for {c}"
    assert ge <= gt, f"gradient scaled-max err {ge:.3e} > {gt:.0e} for {c}"


@pytest.mark.parametrize("c", _sample_configs(10, seed=50) + _CORNERS)
def test_expected_family_fuzz(c):
    decs, gamma, num_active, _ = _make_problem(c)
    wmb = (active_weights(num_active, c["M"], c["B"])
           if num_active is not None else None)

    def fused(g):
        return jnp.sum(energy_expected_fused(decs, g, wmb, c["precision"]))

    def ref(g):
        return jnp.sum(E.energy_expected(decs, g, num_active))

    e_fused = energy_expected_fused(decs, gamma, wmb, c["precision"])
    e_ref = E.energy_expected(decs, gamma, num_active)
    _check(c, e_fused, e_ref, jax.grad(fused)(gamma), jax.grad(ref)(gamma))


def _xla_mc(decs, g, d1, d2, m_dec):
    decoded = decode_all(decs, g)                       # (M, T, B, X)
    total = 0.0
    for s in range(d1.shape[0]):
        oh1 = jax.nn.one_hot(d1[s], m_dec, dtype=g.dtype)
        oh2 = jax.nn.one_hot(d2[s], m_dec, dtype=g.dtype)
        x1 = jnp.einsum("tbm,mtbx->tbx", oh1, decoded[:, :-1])
        x2 = jnp.einsum("tbm,mtbx->tbx", oh2, decoded[:, 1:])
        total = total + jnp.sum((x2 - x1) ** 2, axis=(0, 2))
    return total / d1.shape[0]


@pytest.mark.parametrize("c", _sample_configs(8, seed=51, b_max=24) + [
    # indices pinned at the M-1 gather boundary (clamping bugs show here)
    dict(T=16, B=4, D=2, X=7, M=5, hidden=(8,), num_active=False,
         precision="float32", seed=6, pin_max=True),
    # batch crossing the MC kernels' 128-wide block grid
    dict(T=16, B=136, D=2, X=5, M=3, hidden=(8,), num_active=False,
         precision="float32", seed=7),
])
def test_mc_family_fuzz(c):
    decs, gamma, num_active, rng = _make_problem(c)
    S = int(rng.integers(1, 4))
    maxv = (np.asarray(num_active)[None, None, :]
            if num_active is not None else c["M"])
    shape = (S, c["T"] - 1, c["B"])
    if c.get("pin_max"):
        d1 = np.full(shape, c["M"] - 1)
        d2 = np.full(shape, c["M"] - 1)
    else:
        d1 = (rng.random(shape) * maxv).astype(np.int32)
        d2 = (rng.random(shape) * maxv).astype(np.int32)
    d1, d2 = jnp.asarray(d1, jnp.int32), jnp.asarray(d2, jnp.int32)

    def fused(g):
        return jnp.sum(energy_mc_fused(decs, g, d1, d2, c["precision"]))

    def ref(g):
        return jnp.sum(_xla_mc(decs, g, d1, d2, c["M"]))

    e_fused = energy_mc_fused(decs, gamma, d1, d2, c["precision"])
    e_ref = _xla_mc(decs, gamma, d1, d2, c["M"])
    _check(c, e_fused, e_ref, jax.grad(fused)(gamma), jax.grad(ref)(gamma))


@pytest.mark.parametrize("c", _sample_configs(6, seed=52) + [
    dict(T=29, B=2, D=2, X=50, M=6, hidden=(32,), num_active=True,
         precision="f32x3", seed=8),
])
def test_stats_family_fuzz(c):
    decs, gamma, num_active, _ = _make_problem(c)
    wmb = (active_weights(num_active, c["M"], c["B"])
           if num_active is not None
           else uniform_weights(c["M"], c["B"]))

    def fused(g):
        return jnp.sum(energy_expected_sharded(
            decs, g, wmb, axis_name=None, precision=c["precision"]))

    def ref(g):
        return jnp.sum(E.energy_expected(decs, g, num_active))

    e_fused = energy_expected_sharded(decs, gamma, wmb, axis_name=None,
                                      precision=c["precision"])
    e_ref = E.energy_expected(decs, gamma, num_active)
    _check(c, e_fused, e_ref, jax.grad(fused)(gamma), jax.grad(ref)(gamma))
