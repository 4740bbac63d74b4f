"""Fused Pallas TPU kernel for the reference's MC ensemble energy.

Same streaming structure as ``energy_pallas`` (weights resident in VMEM, the
(M, T, B, X) decoded tensor never materializes), but computes the *sampled*
estimator of the reference (upstream ``src/optimize.py:38-75``): per MC
sample s and segment t, decoder indices d1[s,t,b], d2[s,t,b] select which
ensemble member decodes each side of the difference.

The index tensors are drawn OUTSIDE the kernel (``sample_decoder_indices``,
plain ``jax.random.randint`` with optional per-spline upper bounds) and are
passed to both the forward and backward kernels — identical semantics to the
XLA path, bit-identical fwd/bwd sampling, no in-kernel PRNG state to keep in
sync.

Index layout trick: the (S, T-1, B) segment indices are padded with one
leading dummy column to (S, T, B), so chunk c's segment slice is the plain
column range [c*Tc, c*Tc+Tc) — no negative-start clamping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from vae_latent_geometry_tpu.ops.energy_pallas import (
    _decode_rows,
    _is_tpu,
    _pick_chunk,
    _stack_weights,
)


def sample_decoder_indices(key, T: int, B: int, m_dec: int,
                           mc_samples: int = 2, num_active=None):
    """(d1, d2): (S, T-1, B) int32 decoder draws, U[0, num_active_b)."""
    maxval = (jnp.broadcast_to(jnp.asarray(num_active, jnp.int32), (B,))
              if num_active is not None else m_dec)
    k1, k2 = jax.random.split(key)
    d1 = jax.random.randint(k1, (mc_samples, T - 1, B), 0, maxval, jnp.int32)
    d2 = jax.random.randint(k2, (mc_samples, T - 1, B), 0, maxval, jnp.int32)
    return d1, d2


def _pad_indices(d):
    """(S, T-1, B) -> (S, T, B) with a dummy leading column."""
    S, Tm1, B = d.shape
    return jnp.concatenate([jnp.zeros((S, 1, B), d.dtype), d], axis=1)


def _fwd_kernel(gamma_ref, d1_ref, d2_ref, *refs, T, B, D, X, M, S, Tc,
                n_layers, dtype):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]
    xall = refs[2 * n_layers + 1]        # (M, Tc+1, B, X) scratch

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    n_chunks = T // Tc

    out_ref[:] = jnp.zeros_like(out_ref)
    for m in range(M):
        xall[m, 0, :, :] = jnp.zeros((B, X), jnp.float32)

    def body(c, _):
        g2 = gamma_ref[pl.ds(pl.multiple_of(c * Tc, 8), Tc), :].reshape(Tc * B, D)
        for m in range(M):
            x = _decode_rows(g2, ws, bs, m, dtype)
            xall[m, pl.ds(1, Tc), :, :] = x.reshape(Tc, B, X)

        first_w = jnp.where(c == 0, 0.0, 1.0)
        total = jnp.zeros((B,), jnp.float32)
        for s in range(S):
            dd1 = d1_ref[s, pl.ds(pl.multiple_of(c * Tc, 8), Tc), :]          # (Tc, B)
            dd2 = d2_ref[s, pl.ds(pl.multiple_of(c * Tc, 8), Tc), :]
            x1 = jnp.zeros((Tc, B, X), jnp.float32)
            x2 = jnp.zeros((Tc, B, X), jnp.float32)
            for m in range(M):
                xa = xall[m, :, :, :]                       # (Tc+1, B, X)
                m1 = (dd1 == m).astype(jnp.float32)[:, :, None]
                m2 = (dd2 == m).astype(jnp.float32)[:, :, None]
                x1 = x1 + m1 * xa[:Tc]
                x2 = x2 + m2 * xa[1:Tc + 1]
            diff = x2 - x1
            seg = jnp.sum(diff * diff, axis=-1)             # (Tc, B)
            total = total + jnp.sum(seg[1:], axis=0) + seg[0] * first_w
        out_ref[0, :] = out_ref[0, :] + total / S
        for m in range(M):
            xall[m, 0, :, :] = xall[m, Tc, :, :]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _bwd_kernel(gamma_pad_ref, d1_ref, d2_ref, ct_ref, *refs, T, B, D, X, M,
                S, Tc, n_layers, dtype):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    dgamma_ref = refs[2 * n_layers]
    xall = refs[2 * n_layers + 1]        # (M, Tc+2, B, X) scratch
    diffs = refs[2 * n_layers + 2]       # (S, Tc+1, B, X) scratch

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    n_chunks = T // Tc
    ct = ct_ref[0, :]                    # (B,)

    def body(c, _):
        # aligned window loads + static value subslices (see energy_pallas):
        # gamma_pad and the index tensors are padded to T+8 rows host-side.
        gwin = gamma_pad_ref[pl.ds(pl.multiple_of(c * Tc, 8), Tc + 8), :]
        halo2 = gwin[0:Tc + 2, :].reshape((Tc + 2) * B, D)
        for m in range(M):
            x = _decode_rows(halo2, ws, bs, m, dtype)
            xall[m, :, :, :] = x.reshape(Tc + 2, B, X)

        # segment index columns for segments (c*Tc-1+i), i = 0..Tc
        # (padded layout: segment j uses column j+1 -> columns c*Tc..c*Tc+Tc)
        # validity of segment j: 0 <= j <= T-2
        seg_ids = jax.lax.broadcasted_iota(jnp.int32, (Tc + 1, 1), 0) \
            + c * Tc - 1
        seg_valid = ((seg_ids >= 0) & (seg_ids <= T - 2)).astype(jnp.float32)

        for s in range(S):
            w1 = d1_ref[s, pl.ds(pl.multiple_of(c * Tc, 8), Tc + 8), :]
            w2 = d2_ref[s, pl.ds(pl.multiple_of(c * Tc, 8), Tc + 8), :]
            dd1 = w1[0:Tc + 1, :]                          # (Tc+1, B)
            dd2 = w2[0:Tc + 1, :]
            x1 = jnp.zeros((Tc + 1, B, X), jnp.float32)
            x2 = jnp.zeros((Tc + 1, B, X), jnp.float32)
            for m in range(M):
                xa = xall[m, :, :, :]
                m1 = (dd1 == m).astype(jnp.float32)[:, :, None]
                m2 = (dd2 == m).astype(jnp.float32)[:, :, None]
                x1 = x1 + m1 * xa[:Tc + 1]
                x2 = x2 + m2 * xa[1:Tc + 2]
            diffs[s, :, :, :] = (x2 - x1) * seg_valid[:, :, None]

        g2 = gwin[1:Tc + 1, :].reshape(Tc * B, D)
        scale = (2.0 / S) * ct[None, :, None]
        dg = jnp.zeros((Tc * B, D), jnp.float32)
        for m in range(M):
            # dx for rows r0+i: -diff[seg r0+i]*1{d1=m} + diff[seg r0+i-1]*1{d2=m}
            dx = jnp.zeros((Tc, B, X), jnp.float32)
            for s in range(S):
                w1 = d1_ref[s, pl.ds(pl.multiple_of(c * Tc, 8), Tc + 8), :]
                w2 = d2_ref[s, pl.ds(pl.multiple_of(c * Tc, 8), Tc + 8), :]
                dd1_row = w1[1:Tc + 1, :]                  # col of seg t
                dd2_row = w2[0:Tc, :]                      # col of seg t-1
                m1 = (dd1_row == m).astype(jnp.float32)[:, :, None]
                m2 = (dd2_row == m).astype(jnp.float32)[:, :, None]
                df = diffs[s, :, :, :]
                dx = dx - m1 * df[1:Tc + 1] + m2 * df[:Tc]
            dx = dx * scale

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


def _build(kind, T, B, D, X, M, S, Tc, n_layers, dtype, interpret):
    if kind == "fwd":
        kernel = functools.partial(_fwd_kernel, T=T, B=B, D=D, X=X, M=M, S=S,
                                   Tc=Tc, n_layers=n_layers, dtype=dtype)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + 2 * n_layers),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((M, Tc + 1, B, X), jnp.float32)],
            interpret=interpret,
        )
    kernel = functools.partial(_bwd_kernel, T=T, B=B, D=D, X=X, M=M, S=S,
                               Tc=Tc, n_layers=n_layers, dtype=dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, B * D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (4 + 2 * n_layers),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((M, Tc + 2, B, X), jnp.float32),
            pltpu.VMEM((S, Tc + 1, B, X), jnp.float32),
        ],
        interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def energy_mc_fused(decoders, gamma, d1, d2, precision: str = "float32"):
    """Fused sampled ensemble energy.

    gamma: (T, B, D); d1, d2: (S, T-1, B) int32 decoder indices (from
    :func:`sample_decoder_indices`).  Returns (B,).  Differentiable in gamma
    only (decoder weights receive zero cotangents)."""
    e, _ = _fwd_impl(decoders, gamma, d1, d2, precision)
    return e


def _common(decoders, gamma):
    T, B, D = gamma.shape
    ws, bs = _stack_weights(decoders)
    M = ws[0].shape[0]
    X = ws[-1].shape[-1]
    Tc = _pick_chunk(T, B, target_rows=2048)
    return T, B, D, X, M, Tc, ws, bs


def _fwd_impl(decoders, gamma, d1, d2, precision):
    T, B, D, X, M, Tc, ws, bs = _common(decoders, gamma)
    S = d1.shape[0]
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    fwd = _build("fwd", T, B, D, X, M, S, Tc, len(ws), dtype,
                 interpret=not _is_tpu())
    out = fwd(gamma.reshape(T, B * D), _pad_indices(d1), _pad_indices(d2),
              *ws, *bs)
    return out[0], (decoders, gamma, d1, d2)


def _fwd_rule(decoders, gamma, d1, d2, precision):
    e, res = _fwd_impl(decoders, gamma, d1, d2, precision)
    return e, res


def _bwd_rule(precision, res, ct):
    decoders, gamma, d1, d2 = res
    T, B, D, X, M, Tc, ws, bs = _common(decoders, gamma)
    S = d1.shape[0]
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    bwd = _build("bwd", T, B, D, X, M, S, Tc, len(ws), dtype,
                 interpret=not _is_tpu())
    # T+8 rows/columns: aligned Tc+8 windows must stay in bounds
    gamma_pad = jnp.concatenate([gamma[:1], gamma] + [gamma[-1:]] * 7, axis=0)
    zpad = jnp.zeros((S, 8, d1.shape[2]), d1.dtype)
    d1p = jnp.concatenate([_pad_indices(d1), zpad], axis=1)
    d2p = jnp.concatenate([_pad_indices(d2), zpad], axis=1)
    dg = bwd(gamma_pad.reshape(T + 8, B * D), d1p, d2p,
             ct.reshape(1, B).astype(jnp.float32), *ws, *bs)
    zeros_dec = jax.tree_util.tree_map(jnp.zeros_like, decoders)
    return zeros_dec, dg.reshape(T, B, D), jnp.zeros_like(d1), jnp.zeros_like(d2)


energy_mc_fused.defvjp(_fwd_rule, _bwd_rule)
