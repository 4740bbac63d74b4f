"""Transposed-layout fused expected-energy kernels (lane-fused points).

The kernels in ``energy_pallas`` put the (t, b) points on the SUBLANE axis
and the decoder features on the LANE axis.  That wastes the MXU on the last
decoder layer: its 50 output features pad to a full 128-lane tile, so ~30%
of all issued MXU work multiplies padding (measured: mfu_mxu 0.79-0.83 vs
mfu_model 0.25-0.34 in BENCH_r03).

Here the layout is TRANSPOSED: features live on sublanes, and the fused
point index l = t*B + b lives on lanes.  Output-feature dimensions then
quantize at the 8-row sublane granularity instead of 128 lanes:

    layer          untransposed cost      transposed cost   (cycles/chunk
    128 -> 128     L/8                    L/8                per decoder,
    128 -> 50      L/8  (50 pads to 128)  56*L/(128*8)       L = Tc*B)

i.e. the last layer gets 2.3x cheaper and a full forward drops to 0.72x the
MXU work.  Further layout wins come for free: adjacent-t differencing is a
lane shift by B (exact), and the per-(t,b) reductions become tiny one-row
MXU contractions instead of sublane-laundered VPU reductions.

Same math as ``energy_expected_fused`` (centered sufficient statistics,
cancellation-free; see energy_pallas.py and docs/NUMERICS.md), same
precision-ladder rungs.  Scope: uniform ensemble weights (the production
full-matrix path); per-spline ``num_active`` subsets use the untransposed
kernel.  The batch is gridded into 256-wide blocks (lane shifts must be
128-aligned), T is gridded into chunks with a one-step lane carry.
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
    PRECISIONS,
    _compiler_params,
    _is_tpu,
    _round_up,
    _split_hi_lo,
    _stack_weights,
)

_BB = 256          # lane-block width for the batch axis (lane shifts by B
#                    must be 128-aligned; 256 = the reference B=200 padded)


def _prep_wT(w, prec):
    """(w_main, w_lo) pair for a pre-transposed weight."""
    if prec == "float32":
        return (w, None)
    hi, lo = _split_hi_lo(w)
    return (hi, lo) if prec == "f32x3" else (hi, None)


def _mp_dot_T(wpair, h, prec):
    """Multi-pass w @ h at the requested rung (weights-left orientation),
    f32 accumulated."""
    w, w_lo = wpair
    if prec == "float32":
        return jnp.dot(w, h, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if prec == "bfloat16":
        return jnp.dot(w, h.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
    h_hi, h_lo = _split_hi_lo(h)

    def bdot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)

    out = bdot(w, h_hi) + bdot(w, h_lo)
    if w_lo is not None:
        out = out + bdot(w_lo, h_hi)
    return out


def _decode_T(g_rows, m, w1T, b1T, w2T_p, b2T, w3T_p, b3T, prec):
    """One decoder, transposed: D (1, L) curve rows -> (Xp, L) output."""
    L = g_rows[0].shape[-1]
    h = jnp.broadcast_to(b1T[m], (b1T.shape[1], L))
    for d, g in enumerate(g_rows):
        h = h + w1T[m][:, d:d + 1] * g
    h = jnp.maximum(h, 0.0)
    h = jnp.maximum(_mp_dot_T(w2T_p[m], h, prec) + b2T[m], 0.0)
    return _mp_dot_T(w3T_p[m], h, prec) + b3T[m]


def _fwd_kernel_T(*refs, D, Xp, M, B, Tc, dtype, n_t_chunks):
    gT_ref = refs[0]                      # (1, 8, Tc*B) block
    w1T_ref, b1T_ref = refs[1], refs[2]   # (M, H1, 8), (M, H1, 1)
    w2T_ref, b2T_ref = refs[3], refs[4]   # (M, H2, H1), (M, H2, 1)
    w3T_ref, b3T_ref = refs[5], refs[6]   # (M, Xp, H2), (M, Xp, 1)
    out_ref = refs[7]                     # (1, 8, B)
    xext = refs[8]                        # (Xp, B + Tc*B) scratch
    vext = refs[9]                        # (8, B + Tc*B) scratch
    acc = refs[10]                        # (8, Tc*B) scratch

    j = pl.program_id(1)
    L = Tc * B
    g_rows = [gT_ref[0, d:d + 1, :] for d in range(D)]
    w1T = w1T_ref[:]
    b1T = b1T_ref[:]
    b2T = b2T_ref[:]
    b3T = b3T_ref[:]
    w2T_p = [_prep_wT(w2T_ref[m], dtype) for m in range(M)]
    w3T_p = [_prep_wT(w3T_ref[m], dtype) for m in range(M)]

    @pl.when(j == 0)
    def _init():
        xext[:, pl.ds(0, B)] = jnp.zeros((Xp, B), jnp.float32)
        vext[:, pl.ds(0, B)] = jnp.zeros((8, B), jnp.float32)
        acc[...] = jnp.zeros_like(acc)

    ones_row = jnp.ones((1, Xp), jnp.float32)

    def colsum(y):  # (Xp, L) -> (1, L): one-row MXU contraction, exact
        return jnp.dot(ones_row, y, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    x0 = _decode_T(g_rows, 0, w1T, b1T, w2T_p, b2T, w3T_p, b3T, dtype)
    ybar = jnp.zeros((Xp, L), jnp.float32)
    sqy = jnp.zeros((1, L), jnp.float32)
    wm = jnp.float32(1.0 / M)
    for m in range(1, M):
        x = _decode_T(g_rows, m, w1T, b1T, w2T_p, b2T, w3T_p, b3T, dtype)
        y = x - x0
        ybar = ybar + wm * y
        sqy = sqy + wm * colsum(y * y)
    xbar = x0 + ybar

    xext[:, pl.ds(B, L)] = xbar
    xe = xext[:, :]
    diff = xe[:, B:B + L] - xe[:, 0:L]
    seg = colsum(diff * diff)                       # (1, L)
    if M > 1:
        var = sqy - colsum(ybar * ybar)
        vext[0:1, pl.ds(B, L)] = var
        ve = vext[:, :]
        seg = seg + ve[0:1, B:B + L] + ve[0:1, 0:L]
    # lane l of this chunk holds the segment ending at point t = j*Tc + l//B
    # (i.e. segment t-1); the first B lanes of chunk 0 are the nonexistent
    # segment -1 and are masked out
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    first_w = jnp.where(j == 0, (lane >= B).astype(jnp.float32), 1.0)
    acc[0:1, :] = acc[0:1, :] + seg * first_w
    # carry the last B lanes for the next chunk
    xext[:, pl.ds(0, B)] = xext[:, pl.ds(L, B)]
    vext[:, pl.ds(0, B)] = vext[:, pl.ds(L, B)]

    @pl.when(j == n_t_chunks - 1)
    def _finish():
        # fold lanes with period B: E_b = sum_i acc[i*B + b] via a one-row
        # contraction against the 0/1 pattern P[l, b] = (l % B == b)
        l_idx = jax.lax.broadcasted_iota(jnp.int32, (L, B), 0)
        b_idx = jax.lax.broadcasted_iota(jnp.int32, (L, B), 1)
        P = ((l_idx & (B - 1)) == b_idx).astype(jnp.float32)
        e = jnp.dot(acc[0:1, :], P, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        out_ref[0, 0:1, :] = e


def _bwd_kernel_T(*refs, D, Xp, M, B, Tc, dtype, n_t_chunks):
    """Transposed backward with a one-chunk pipeline delay: at grid step j
    the kernel decodes chunk j (keeping every decoder's output in scratch)
    and emits d gamma for chunk j-1, whose right neighbor x-bar is chunk
    j's first B lanes.  Step n_t_chunks flushes the last chunk."""
    gT_ref = refs[0]                      # (1, 8, Tc*B) block of chunk min(j, nT-1)
    ct_ref = refs[1]                      # (1, 8, B) cotangents (row 0)
    w1_ref = refs[2]                      # (M, 8, H1)  rows 0..D-1 real
    w1T_ref, b1T_ref = refs[3], refs[4]
    w2T_ref, b2T_ref = refs[5], refs[6]
    w3T_ref, b3T_ref = refs[7], refs[8]
    w2_ref = refs[9]                      # (M, H1, H2) untransposed
    w3_ref = refs[10]                     # (M, H2, Xp) untransposed
    dg_ref = refs[11]                     # (1, 8, Tc*B) out block (chunk j-1)
    xs = refs[12]                         # (M, Xp, Tc*B) scratch: chunk j-1 decodes
    xs_cur = refs[13]                     # (M, Xp, Tc*B) scratch: chunk j decodes
    xbar_prev = refs[14]                  # (Xp, Tc*B)
    xbar_cur = refs[15]                   # (Xp, Tc*B)
    left_carry = refs[16]                 # (Xp, B): last B lanes of chunk j-2's xbar
    g_prev = refs[17]                     # (8, Tc*B): chunk j-1's curve rows

    j = pl.program_id(1)
    L = Tc * B
    w1T = w1T_ref[:]
    b1T = b1T_ref[:]
    b2T = b2T_ref[:]
    b3T = b3T_ref[:]
    w2T_p = [_prep_wT(w2T_ref[m], dtype) for m in range(M)]
    w3T_p = [_prep_wT(w3T_ref[m], dtype) for m in range(M)]
    chain_prec = "bfloat16" if dtype in ("f32x3", "f32x2") else dtype
    w2_p = [_prep_wT(w2_ref[m], chain_prec) for m in range(M)]
    w3_p = [_prep_wT(w3_ref[m], chain_prec) for m in range(M)]

    @pl.when(j == 0)
    def _init():
        # zero everything the masked arithmetic can touch before it is
        # genuinely written: 0 * stale-NaN would poison the masking
        left_carry[...] = jnp.zeros_like(left_carry)
        xbar_cur[...] = jnp.zeros_like(xbar_cur)
        xbar_prev[...] = jnp.zeros_like(xbar_prev)

    # ---- decode chunk j (skipped on the flush step) ----
    @pl.when(j < n_t_chunks)
    def _decode():
        g_rows = [gT_ref[0, d:d + 1, :] for d in range(D)]
        wm = jnp.float32(1.0 / M)
        xb = jnp.zeros((Xp, L), jnp.float32)
        for m in range(M):
            x = _decode_T(g_rows, m, w1T, b1T, w2T_p, b2T, w3T_p, b3T, dtype)
            xs_cur[m, :, :] = x
            xb = xb + wm * x
        xbar_cur[...] = xb

    # ---- emit d gamma for chunk j-1 ----
    @pl.when(j > 0)
    def _emit():
        ct_row = ct_ref[0, 0:1, :]                            # (1, B)
        l_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        b_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 0)
        PT = ((l_idx & (B - 1)) == b_idx).astype(jnp.float32)  # (B, L)
        ct_l = jnp.dot(ct_row, PT, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)    # (1, L)

        xbp = xbar_prev[:, :]
        lc = left_carry[:, :]
        # left neighbor of lane l: xbar at l-B (carry for the first B lanes)
        left = jnp.concatenate([lc, xbp[:, 0:L - B]], axis=1)
        right = jnp.where(
            j < n_t_chunks,
            jnp.concatenate([xbp[:, B:L], xbar_cur[:, 0:B]], axis=1),
            jnp.concatenate([xbp[:, B:L], jnp.zeros((Xp, B), jnp.float32)],
                            axis=1))
        # global point index of lane l in chunk j-1: (j-1)*Tc + l//B
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        t_glob = (j - 1) * Tc + (lane >> 8 if B == 256 else lane // B)
        has_left = (t_glob > 0).astype(jnp.float32)
        has_right = (t_glob < n_t_chunks * Tc - 1).astype(jnp.float32)
        c_coeff = has_left + has_right                         # (1, L)
        left = left * has_left
        right = right * has_right

        g_rows_prev = [g_prev[d:d + 1, :] for d in range(D)]
        wm = jnp.float32(1.0 / M)
        scale = 2.0 * wm * ct_l                                # (1, L)
        dgs = [jnp.zeros((1, L), jnp.float32) for _ in range(D)]
        for m in range(M):
            xm = xs[m, :, :]
            dx = scale * (c_coeff * xm - left - right)         # (Xp, L)
            # recompute activations for the relu masks
            h1 = jnp.broadcast_to(b1T[m], (b1T.shape[1], L))
            for d, g in enumerate(g_rows_prev):
                h1 = h1 + w1T[m][:, d:d + 1] * g
            h1 = jnp.maximum(h1, 0.0)
            h2 = jnp.maximum(_mp_dot_T(w2T_p[m], h1, dtype) + b2T[m], 0.0)
            dh = _mp_dot_T(w3_p[m], dx, chain_prec)            # (H2, L)
            dh = dh * (h2 > 0.0)
            dh = _mp_dot_T(w2_p[m], dh, chain_prec)            # (H1, L)
            dh = dh * (h1 > 0.0)
            for d in range(D):
                w1row = (w1_ref[m, d:d + 1, :]).astype(jnp.float32)  # (1, H1)
                dgs[d] = dgs[d] + jnp.dot(
                    w1row, dh, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        for d in range(D):
            dg_ref[0, d:d + 1, :] = dgs[d]

    # ---- rotate pipeline state ----
    @pl.when(j < n_t_chunks)
    def _rotate():
        left_carry[...] = xbar_prev[:, pl.ds(L - B, B)]
        xbar_prev[...] = xbar_cur[:, :]
        for m in range(M):
            xs[m, :, :] = xs_cur[m, :, :]
        for d in range(D):
            g_prev[d:d + 1, :] = gT_ref[0, d:d + 1, :]


def _prep_inputs(decoders, gamma, Bb):
    """gamma (T, B, D) -> per-block lane-fused planes + both weight
    orientations."""
    T, B, D = gamma.shape
    ws, bs = _stack_weights(decoders)
    if len(ws) != 3:
        raise ValueError("transposed kernels support exactly 3 decoder "
                         f"layers (reference architecture); got {len(ws)}")
    M = ws[0].shape[0]
    X = ws[-1].shape[-1]
    Xp = _round_up(X, 8)
    H1 = ws[0].shape[-1]
    H2 = ws[1].shape[-1]
    B_pad = _round_up(B, Bb)
    if B_pad != B:
        pad = [(0, 0)] * 3
        pad[1] = (0, B_pad - B)
        gamma = jnp.pad(gamma, pad, mode="edge")
    nB = B_pad // Bb
    # (T, nB, Bb, D) -> (nB, D->8 rows, T*Bb)
    gt = gamma.reshape(T, nB, Bb, D).transpose(1, 3, 0, 2).reshape(
        nB, D, T * Bb)
    gt = jnp.pad(gt, ((0, 0), (0, 8 - D), (0, 0)))
    w1T = jnp.pad(jnp.swapaxes(ws[0], 1, 2), ((0, 0), (0, 0), (0, 8 - D)))
    b1T = bs[0][:, :, None]
    w2T = jnp.swapaxes(ws[1], 1, 2)
    b2T = bs[1][:, :, None]
    w3T = jnp.pad(jnp.swapaxes(ws[2], 1, 2), ((0, 0), (0, Xp - X), (0, 0)))
    b3T = jnp.pad(bs[2][:, :, None], ((0, 0), (0, Xp - X), (0, 0)))
    w1 = jnp.pad(ws[0], ((0, 0), (0, 8 - D), (0, 0)))          # (M, 8, H1)
    w2 = ws[1]                                                 # (M, H1, H2)
    w3 = jnp.pad(ws[2], ((0, 0), (0, 0), (0, Xp - X)))         # (M, H2, Xp)
    return (T, B, B_pad, nB, D, X, Xp, M, H1, H2, gt,
            (w1, w1T, b1T, w2, w2T, b2T, w3, w3T, b3T))


def _pick_tc(T: int, Bb: int, target_rows: int = 2048) -> int:
    best, best_aligned = 1, 0
    for tc in range(1, T + 1):
        if T % tc == 0 and tc * Bb <= target_rows:
            best = tc
            if tc % 8 == 0:
                best_aligned = tc
    return best_aligned or best


def fused_t_fits(T, B, D, X, M, num_active=None, wmb=None,
                 n_layers: int = 3) -> bool:
    """Shape guard for the transposed kernels: uniform weights only, the
    3-layer reference decoder, D <= 2, X <= 128, M <= 16, and T must split
    into lane chunks (Tc*256 lanes)."""
    if num_active is not None or wmb is not None or n_layers != 3:
        return False
    if D > 2 or X > 128 or M > 16:
        return False
    Tc = _pick_tc(T, _BB)
    return Tc % 8 == 0 and T % Tc == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def energy_expected_fused_t(decoders, gamma, precision: str = "float32"):
    """Transposed-layout fused expected ensemble energy (uniform weights).

    Same contract as :func:`energy_pallas.energy_expected_fused` with
    ``wmb=None``: (T, B, D) curve -> (B,) energies, differentiable in gamma
    only.  See the module docstring for why this layout is ~25% faster.
    """
    e, _ = _fwd_impl_t(decoders, gamma, precision)
    return e


def _fwd_impl_t(decoders, gamma, precision):
    if precision not in PRECISIONS:
        raise ValueError(f"unknown kernel precision {precision!r}")
    (T, B, B_pad, nB, D, X, Xp, M, H1, H2, gt, wpack) = _prep_inputs(
        decoders, gamma, _BB)
    (w1, w1T, b1T, w2, w2T, b2T, w3, w3T, b3T) = wpack
    Tc = _pick_tc(T, _BB)
    nT = T // Tc
    L = Tc * _BB
    kernel = functools.partial(_fwd_kernel_T, D=D, Xp=Xp, M=M, B=_BB, Tc=Tc,
                               dtype=precision, n_t_chunks=nT)
    w_specs = [
        pl.BlockSpec(a.shape, lambda i, j, _s=a.shape: (0,) * len(_s))
        for a in (w1T, b1T, w2T, b2T, w3T, b3T)
    ]
    fwd = pl.pallas_call(
        kernel,
        grid=(nB, nT),
        out_shape=jax.ShapeDtypeStruct((nB, 8, _BB), jnp.float32),
        in_specs=[pl.BlockSpec((1, 8, L), lambda i, j: (i, 0, j))] + w_specs,
        out_specs=pl.BlockSpec((1, 8, _BB), lambda i, j: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Xp, _BB + L), jnp.float32),
            pltpu.VMEM((8, _BB + L), jnp.float32),
            pltpu.VMEM((8, L), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=not _is_tpu(),
    )
    ship = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    out = fwd(gt, w1T.astype(ship), b1T, w2T.astype(ship), b2T,
              w3T.astype(ship), b3T)
    e = out[:, 0, :].reshape(B_pad)[:B]
    return e, (decoders, gamma)


def _fwd_rule_t(decoders, gamma, precision):
    return _fwd_impl_t(decoders, gamma, precision)


def _bwd_rule_t(precision, res, ct):
    decoders, gamma = res
    (T, B, B_pad, nB, D, X, Xp, M, H1, H2, gt, wpack) = _prep_inputs(
        decoders, gamma, _BB)
    (w1, w1T, b1T, w2, w2T, b2T, w3, w3T, b3T) = wpack
    Tc = _pick_tc(T, _BB)
    nT = T // Tc
    L = Tc * _BB
    ct_p = jnp.zeros((nB, 8, _BB), jnp.float32)
    ct_flat = jnp.pad(jnp.asarray(ct, jnp.float32), (0, B_pad - B))
    ct_p = ct_p.at[:, 0, :].set(ct_flat.reshape(nB, _BB))
    kernel = functools.partial(_bwd_kernel_T, D=D, Xp=Xp, M=M, B=_BB, Tc=Tc,
                               dtype=precision, n_t_chunks=nT)
    w_specs = [
        pl.BlockSpec(a.shape, lambda i, j, _s=a.shape: (0,) * len(_s))
        for a in (w1, w1T, b1T, w2T, b2T, w3T, b3T, w2, w3)
    ]
    bwd = pl.pallas_call(
        kernel,
        grid=(nB, nT + 1),
        out_shape=jax.ShapeDtypeStruct((nB, 8, T * _BB), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 8, L),
                         lambda i, j, _n=nT: (i, 0, jnp.minimum(j, _n - 1))),
            pl.BlockSpec((1, 8, _BB), lambda i, j: (i, 0, 0)),
        ] + w_specs,
        out_specs=pl.BlockSpec(
            (1, 8, L), lambda i, j: (i, 0, jnp.maximum(j - 1, 0))),
        scratch_shapes=[
            pltpu.VMEM((M, Xp, L), jnp.float32),
            pltpu.VMEM((M, Xp, L), jnp.float32),
            pltpu.VMEM((Xp, L), jnp.float32),
            pltpu.VMEM((Xp, L), jnp.float32),
            pltpu.VMEM((Xp, _BB), jnp.float32),
            pltpu.VMEM((8, L), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=not _is_tpu(),
    )
    ship = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    dgt = bwd(gt, ct_p, w1.astype(ship), w1T.astype(ship), b1T,
              w2T.astype(ship), b2T, w3T.astype(ship), b3T,
              w2.astype(ship), w3.astype(ship))
    # (nB, 8, T*Bb) -> (T, B, D)
    dg = dgt[:, :D, :].reshape(nB, D, T, _BB).transpose(2, 0, 3, 1).reshape(
        T, B_pad, D)[:, :B]
    zeros_dec = jax.tree_util.tree_map(jnp.zeros_like, decoders)
    return zeros_dec, dg


energy_expected_fused_t.defvjp(_fwd_rule_t, _bwd_rule_t)
