"""Fused Pallas TPU kernel for the expected ensemble curve energy.

The XLA path (``geometry/energy.energy_expected``) materializes the decoded
tensor (M_dec, T, B, X) — 800 MB at the reference workload — and pays HBM
round-trips for every reduction.  This kernel streams the curve through all
ensemble decoders chunk-by-chunk entirely in VMEM:

- all M decoder MLPs' weights live in VMEM for the whole kernel (~1 MB for
  the 10-decoder reference model);
- per T-chunk, the decoder loop accumulates only the ensemble mean
  ``xbar`` and mean squared norm ``sq`` (the sufficient statistics of the
  expected energy) — the (M, T, B, X) tensor never exists;
- adjacent-sample cross terms use a one-row carry between chunks;
- the backward kernel exploits that geodesic optimization trains only the
  curve (omega), not the decoders:  it recomputes activations per chunk and
  emits d gamma only — no weight gradients, no stored residuals.

Energy definition matches ``energy_expected`` exactly:
    E_b = sum_t [ sq_{t+1,b} + sq_{t,b} - 2 <xbar_{t+1,b}, xbar_{t,b}> ]
which is the closed-form expectation of the reference's MC estimator
(upstream ``src/optimize.py:38-75``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas is TPU/interpret-only in some builds; degrade gracefully.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def fused_available() -> bool:
    return _PALLAS_OK


def _pick_chunk(T: int, B: int, target_rows: int = 4096) -> int:
    """Largest divisor of T with chunk*B <= target_rows.

    Prefers multiples of 8: dynamic slice starts (c * chunk) must be
    provably 8-aligned for Mosaic's sublane tiling."""
    best, best_aligned = 1, 0
    for tc in range(1, T + 1):
        if T % tc == 0 and tc * B <= target_rows:
            best = tc
            if tc % 8 == 0:
                best_aligned = tc
    return best_aligned or best


def _stack_weights(decoders):
    """Extract stacked (M, in, out) weight and (M, out) bias arrays from the
    ensemble pytree (``models/nets.py`` layout)."""
    layers = decoders["layers"]
    ws = [jnp.asarray(l["w"]) for l in layers]
    bs = [jnp.asarray(l["b"]) for l in layers]
    return ws, bs


def _decode_rows(g2, ws, bs, m, dtype):
    """One decoder's MLP over (rows, D) -> (rows, X), f32 accumulate."""
    h = g2
    n_layers = len(ws)
    for i in range(n_layers):
        w = ws[i][m].astype(dtype)
        b = bs[i][m].astype(jnp.float32)
        h = jnp.dot(h.astype(dtype), w,
                    preferred_element_type=jnp.float32) + b
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    return h


def _fwd_kernel(gamma_ref, *refs, T, B, D, X, M, Tc, n_layers, dtype):
    # gamma_ref is (T, B*D): the trailing curve dimension D (typically 2)
    # is folded into the lane axis to avoid the 64x lane-padding a (..., 2)
    # VMEM window would incur.
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]
    xbar_ext = refs[2 * n_layers + 1]    # (Tc+1, B, X) scratch
    sq_ext = refs[2 * n_layers + 2]      # (Tc+1, B) scratch

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    inv_m = 1.0 / M
    n_chunks = T // Tc

    out_ref[:] = jnp.zeros_like(out_ref)
    # zero the carry slot: chunk 0's first segment is masked out, but it must
    # still be computed from finite values (0 * NaN = NaN)
    xbar_ext[0, :, :] = jnp.zeros((B, X), jnp.float32)
    sq_ext[0, :] = jnp.zeros((B,), jnp.float32)

    def body(c, _):
        g = gamma_ref[pl.ds(pl.multiple_of(c * Tc, 8), Tc), :]             # (Tc, B*D)
        g2 = g.reshape(Tc * B, D)
        xbar = jnp.zeros((Tc * B, X), jnp.float32)
        sq = jnp.zeros((Tc * B, 1), jnp.float32)
        for m in range(M):
            x = _decode_rows(g2, ws, bs, m, dtype)      # (Tc*B, X)
            xbar = xbar + x
            sq = sq + jnp.sum(x * x, axis=1, keepdims=True)
        xbar = xbar * inv_m
        sq = sq * inv_m

        xbar_ext[pl.ds(1, Tc), :, :] = xbar.reshape(Tc, B, X)
        sq_ext[pl.ds(1, Tc), :] = sq.reshape(Tc, B)

        xe = xbar_ext[:]                                 # (Tc+1, B, X)
        se = sq_ext[:]                                   # (Tc+1, B)
        cross = jnp.sum(xe[1:] * xe[:-1], axis=-1)       # (Tc, B)
        seg = se[1:] + se[:-1] - 2.0 * cross             # (Tc, B)
        # first segment of chunk 0 pairs row 0 with garbage -> mask it
        first_w = jnp.where(c == 0, 0.0, 1.0)
        total = jnp.sum(seg[1:], axis=0) + seg[0] * first_w
        out_ref[0, :] = out_ref[0, :] + total
        # carry last row into slot 0 for the next chunk
        xbar_ext[0, :, :] = xbar_ext[Tc, :, :]
        sq_ext[0, :] = sq_ext[Tc, :]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _bwd_kernel(gamma_pad_ref, ct_ref, *refs, T, B, D, X, M, Tc, n_layers,
                dtype):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    dgamma_ref = refs[2 * n_layers]

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    inv_m = 1.0 / M
    n_chunks = T // Tc
    ct = ct_ref[0, :]                                    # (B,)

    def body(c, _):
        # aligned window load (start multiple of 8, static length), then
        # static value-subslices — Mosaic cannot prove unaligned dynamic
        # starts like c*Tc+1.  gamma_pad is padded to T+8 rows host-side.
        win = gamma_pad_ref[pl.ds(pl.multiple_of(c * Tc, 8), Tc + 8), :]
        halo = win[0:Tc + 2, :]                            # (Tc+2, B*D)
        halo2 = halo.reshape((Tc + 2) * B, D)
        # pass 1: ensemble mean over the halo rows
        xbar = jnp.zeros(((Tc + 2) * B, X), jnp.float32)
        for m in range(M):
            xbar = xbar + _decode_rows(halo2, ws, bs, m, dtype)
        xbar = (xbar * inv_m).reshape(Tc + 2, B, X)

        # boundary masks for global rows c*Tc .. c*Tc+Tc-1
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (Tc, 1), 0) + c * Tc
        has_left = (row_ids > 0).astype(jnp.float32)     # (Tc, 1)
        has_right = (row_ids < T - 1).astype(jnp.float32)
        c_coeff = (has_left + has_right)[:, None, :]     # (Tc, 1, 1)
        left = xbar[:Tc] * has_left[:, :, None]          # xbar_{t-1}
        right = xbar[2:] * has_right[:, :, None]         # xbar_{t+1}
        scale = (2.0 * inv_m) * ct[None, :, None]        # (1, B, 1)

        g2 = win[1:Tc + 1, :].reshape(Tc * B, D)
        dg = jnp.zeros((Tc * B, D), jnp.float32)
        for m in range(M):
            # recompute forward activations for this decoder
            acts = []
            h = g2
            for i in range(n_layers):
                w = ws[i][m].astype(dtype)
                b = bs[i][m].astype(jnp.float32)
                h = jnp.dot(h.astype(dtype), w,
                            preferred_element_type=jnp.float32) + b
                if i < n_layers - 1:
                    h = jnp.maximum(h, 0.0)
                    acts.append(h)
            x = h.reshape(Tc, B, X)
            dx = scale * (c_coeff * x - left - right)    # (Tc, B, X)
            dh = dx.reshape(Tc * B, X)
            for i in range(n_layers - 1, -1, -1):
                w = ws[i][m].astype(dtype)
                dh = jnp.dot(dh.astype(dtype), w.T,
                             preferred_element_type=jnp.float32)
                if i > 0:
                    dh = dh * (acts[i - 1] > 0.0)
            dg = dg + dh
        dgamma_ref[pl.ds(pl.multiple_of(c * Tc, 8), Tc), :] = dg.reshape(Tc, B * D)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _build_fwd(T, B, D, X, M, Tc, n_layers, dtype, interpret):
    kernel = functools.partial(_fwd_kernel, T=T, B=B, D=D, X=X, M=M, Tc=Tc,
                               n_layers=n_layers, dtype=dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + 2 * n_layers),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Tc + 1, B, X), jnp.float32),
            pltpu.VMEM((Tc + 1, B), jnp.float32),
        ],
        interpret=interpret,
    )


def _build_bwd(T, B, D, X, M, Tc, n_layers, dtype, interpret):
    kernel = functools.partial(_bwd_kernel, T=T, B=B, D=D, X=X, M=M, Tc=Tc,
                               n_layers=n_layers, dtype=dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, B * D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + 2 * n_layers),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def energy_expected_fused(decoders, gamma, precision: str = "float32"):
    """Fused expected ensemble energy: (T, B, D) curve -> (B,) energies.

    precision: 'float32' (default, parity with the XLA path) or 'bfloat16'
    (bf16 matmuls with f32 accumulation — ~2-3x faster, ~1e-3 rel error;
    use for bulk optimization steps, finish/evaluate in float32).

    Differentiable in ``gamma`` only — decoder weights receive zero
    cotangents (geodesic optimization never trains them; use the XLA path
    ``geometry.energy.energy_expected`` if you need weight gradients).
    """
    e, _ = _fwd_impl(decoders, gamma, precision)
    return e


def _fwd_impl(decoders, gamma, precision):
    T, B, D = gamma.shape
    ws, bs = _stack_weights(decoders)
    M = ws[0].shape[0]
    X = ws[-1].shape[-1]
    Tc = _pick_chunk(T, B)
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    fwd = _build_fwd(T, B, D, X, M, Tc, len(ws), dtype,
                     interpret=not _is_tpu())
    out = fwd(gamma.reshape(T, B * D), *ws, *bs)
    return out[0], (decoders, gamma)


def _fwd_rule(decoders, gamma, precision):
    e, res = _fwd_impl(decoders, gamma, precision)
    return e, res


def _bwd_rule(precision, res, ct):
    decoders, gamma = res
    T, B, D = gamma.shape
    ws, bs = _stack_weights(decoders)
    M = ws[0].shape[0]
    X = ws[-1].shape[-1]
    Tc = _pick_chunk(T, B)
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    bwd = _build_bwd(T, B, D, X, M, Tc, len(ws), dtype,
                     interpret=not _is_tpu())
    # (T+8, B, D): 1 leading + 7 trailing edge rows so every aligned window
    # load of Tc+8 rows stays in bounds
    gamma_pad = jnp.concatenate(
        [gamma[:1], gamma] + [gamma[-1:]] * 7, axis=0)
    dgamma = bwd(gamma_pad.reshape(T + 8, B * D),
                 ct.reshape(1, B).astype(jnp.float32), *ws, *bs)
    dgamma = dgamma.reshape(T, B, D)
    zeros_dec = jax.tree_util.tree_map(jnp.zeros_like, decoders)
    return zeros_dec, dgamma


energy_expected_fused.defvjp(_fwd_rule, _bwd_rule)
