"""Transposed-layout fused expected-energy kernels — a VALIDATED NEGATIVE
RESULT, kept for the record (not dispatched by the optimizer).

Hypothesis: the production kernels put (t, b) points on sublanes and
features on lanes, so the last layer's 50 output features pad to a full
128-lane MXU tile — ~30% of issued MXU work multiplies padding (BENCH_r03:
mfu_mxu 0.79-0.83 vs mfu_model 0.25-0.34).  Transposing (features on
sublanes, fused point index l = t*B + b on lanes) makes output features
quantize at 8-row granularity: nominally 0.72x the forward MXU work, with
free extras (adjacent-t differencing = an exact lane shift by B; per-point
reductions = one-row MXU contractions).

Measured on a v5e (identical fwd+bwd scan harness, T=2000 B=200 M=10,
weights pre-split on host, Tc tuned):

    rung     feature-on-lanes   transposed
    f32x2    82.8 it/s          58.3 it/s     (-30%)
    f32x3    61.0 it/s          46.9 it/s     (-23%)

Why the cost model failed: the MXU is weights-stationary — a dot streams
its ROW dimension through a resident 128x128 weight tile.  The transposed
layout puts the long dimension (thousands of points) on LANES, forcing a
weight-tile change every 128 lanes with only 56-128 rows streamed between
changes; fill/drain overhead eats the padding win.  The feature-on-lanes
layout streams thousands of rows through ONE resident tile per layer.
Lesson recorded in docs/PERFORMANCE.md: on TPU, put the big dimension on
rows; lane padding of a small output dimension is the lesser evil.

The kernels are correct (tested vs XLA in fwd and grad, incl. chunk carries
and B > 256 blocks; float32 forward bit-exact on hardware) and exercise
useful Mosaic patterns: 2-D grid with cross-step scratch carries, a
one-chunk pipeline delay in the backward (each chunk needs its right
neighbor's means), and host-side weight splitting.
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


def _prep_wT_host(w, prec):
    """(w_main, w_lo) pair for a pre-transposed weight, computed ON HOST /
    in XLA once per call — the kernels run once per (B-block, T-chunk) grid
    step, so in-kernel splitting would repeat per chunk (measured: the
    first transposed build lost ~35% steps/s to exactly that)."""
    if prec == "float32":
        return (w, None)
    hi, lo = _split_hi_lo(w)
    if prec == "f32x3":
        return (hi, lo)
    return (hi, jnp.zeros_like(lo))      # f32x2/bf16: lo unused but shipped
#                                          (static arg shapes keep one kernel
#                                          signature across rungs)


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


def _pairs_from(a_ref, b_ref, M, dtype):
    """Reassemble the host-pre-split (main, lo) weight pairs per decoder."""
    return [(a_ref[m], b_ref[m] if dtype == "f32x3" else None)
            for m in range(M)]


def _fwd_kernel_T(*refs, D, Xp, M, B, Tc, dtype, n_t_chunks):
    gT_ref = refs[0]                      # (1, 8, Tc*B) block
    w1T_ref, b1T_ref = refs[1], refs[2]   # (M, H1, 8), (M, H1, 1)
    w2a_ref, w2b_ref, b2T_ref = refs[3], refs[4], refs[5]
    w3a_ref, w3b_ref, b3T_ref = refs[6], refs[7], refs[8]
    out_ref = refs[9]                     # (1, 8, B)
    xext = refs[10]                       # (Xp, B + Tc*B) scratch
    vext = refs[11]                       # (8, B + Tc*B) scratch
    acc = refs[12]                        # (8, Tc*B) scratch

    j = pl.program_id(1)
    L = Tc * B
    g_rows = [gT_ref[0, d:d + 1, :] for d in range(D)]
    w1T = w1T_ref[:]
    b1T = b1T_ref[:]
    b2T = b2T_ref[:]
    b3T = b3T_ref[:]
    w2T_p = _pairs_from(w2a_ref, w2b_ref, M, dtype)
    w3T_p = _pairs_from(w3a_ref, w3b_ref, M, dtype)

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
    w2a_ref, w2b_ref, b2T_ref = refs[5], refs[6], refs[7]
    w3a_ref, w3b_ref, b3T_ref = refs[8], refs[9], refs[10]
    w2_ref = refs[11]                     # (M, H1, H2) untransposed (chain)
    w3_ref = refs[12]                     # (M, H2, Xp) untransposed (chain)
    dg_ref = refs[13]                     # (1, 8, Tc*B) out block (chunk j-1)
    xs = refs[14]                         # (M, Xp, Tc*B) scratch: chunk j-1 decodes
    xs_cur = refs[15]                     # (M, Xp, Tc*B) scratch: chunk j decodes
    xbar_prev = refs[16]                  # (Xp, Tc*B)
    xbar_cur = refs[17]                   # (Xp, Tc*B)
    left_carry = refs[18]                 # (Xp, B): last B lanes of chunk j-2's xbar
    g_prev = refs[19]                     # (8, Tc*B): chunk j-1's curve rows

    j = pl.program_id(1)
    L = Tc * B
    w1T = w1T_ref[:]
    b1T = b1T_ref[:]
    b2T = b2T_ref[:]
    b3T = b3T_ref[:]
    w2T_p = _pairs_from(w2a_ref, w2b_ref, M, dtype)
    w3T_p = _pairs_from(w3a_ref, w3b_ref, M, dtype)
    chain_prec = "bfloat16" if dtype in ("f32x3", "f32x2") else dtype
    w2_p = [(w2_ref[m], None) for m in range(M)]
    w3_p = [(w3_ref[m], None) for m in range(M)]

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


def _pick_tc(T: int, Bb: int, target_lanes: int = 10240) -> int:
    """Largest aligned divisor chunk with Tc*Bb lanes under the target.

    Large chunks matter much more here than in the feature-on-lanes kernels:
    every T-chunk is a separate grid step (weights stay VMEM-cached but all
    per-step overheads repeat), and the MXU dots want long lane dimensions.
    Measured at the bench shape: Tc=8 (250 steps) ran at 0.65x the speed of
    Tc=40 (50 steps)."""
    best, best_aligned = 1, 0
    for tc in range(1, T + 1):
        if T % tc == 0 and tc * Bb <= target_lanes:
            best = tc
            if tc % 8 == 0:
                best_aligned = tc
    return best_aligned or best


def _bwd_target_lanes(M: int, Xp: int) -> int:
    """Lane budget for the backward: two (M, Xp, L) decode buffers + means
    + the unrolled-chain transients.  Calibrated from a measured compile:
    108.3 MB scoped VMEM at (M=10, Xp=56, L=10240) -> ~2650 f32/lane, of
    which ~1700/lane are chain transients (h1/h2 + hi/lo splits + dx/dh).
    Budget 72 MB leaves margin under the 100 MB scoped limit."""
    per_lane_f32 = 2 * M * Xp + 4 * Xp + 1700
    return max(_BB, min(10240, (72 * 1024 * 1024) // (4 * per_lane_f32)))


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


def _split_pair_host(w, precision):
    a, b = _prep_wT_host(w, precision)
    if b is None:                        # float32: duplicate (unused slot)
        b = a
    return a, b


def _fwd_impl_t(decoders, gamma, precision):
    if precision not in PRECISIONS:
        raise ValueError(f"unknown kernel precision {precision!r}")
    (T, B, B_pad, nB, D, X, Xp, M, H1, H2, gt, wpack) = _prep_inputs(
        decoders, gamma, _BB)
    (w1, w1T, b1T, w2, w2T, b2T, w3, w3T, b3T) = wpack
    Tc = _pick_tc(T, _BB)
    nT = T // Tc
    L = Tc * _BB
    w2a, w2b = _split_pair_host(w2T, precision)
    w3a, w3b = _split_pair_host(w3T, precision)
    kernel = functools.partial(_fwd_kernel_T, D=D, Xp=Xp, M=M, B=_BB, Tc=Tc,
                               dtype=precision, n_t_chunks=nT)
    w_specs = [
        pl.BlockSpec(a.shape, lambda i, j, _s=a.shape: (0,) * len(_s))
        for a in (w1T, b1T, w2a, w2b, b2T, w3a, w3b, b3T)
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
    out = fwd(gt, w1T.astype(ship), b1T, w2a, w2b, b2T, w3a, w3b, b3T)
    e = out[:, 0, :].reshape(B_pad)[:B]
    return e, (decoders, gamma)


def _fwd_rule_t(decoders, gamma, precision):
    return _fwd_impl_t(decoders, gamma, precision)


def _bwd_rule_t(precision, res, ct):
    decoders, gamma = res
    (T, B, B_pad, nB, D, X, Xp, M, H1, H2, gt, wpack) = _prep_inputs(
        decoders, gamma, _BB)
    (w1, w1T, b1T, w2, w2T, b2T, w3, w3T, b3T) = wpack
    Tc = _pick_tc(T, _BB, _bwd_target_lanes(M, Xp))
    nT = T // Tc
    L = Tc * _BB
    ct_p = jnp.zeros((nB, 8, _BB), jnp.float32)
    ct_flat = jnp.pad(jnp.asarray(ct, jnp.float32), (0, B_pad - B))
    ct_p = ct_p.at[:, 0, :].set(ct_flat.reshape(nB, _BB))
    w2a, w2b = _split_pair_host(w2T, precision)
    w3a, w3b = _split_pair_host(w3T, precision)
    chain_prec = "bfloat16" if precision in ("f32x3", "f32x2") else precision
    chain_ship = jnp.bfloat16 if chain_prec == "bfloat16" else jnp.float32
    w2c = w2.astype(chain_ship)
    w3c = w3.astype(chain_ship)
    kernel = functools.partial(_bwd_kernel_T, D=D, Xp=Xp, M=M, B=_BB, Tc=Tc,
                               dtype=precision, n_t_chunks=nT)
    w_specs = [
        pl.BlockSpec(a.shape, lambda i, j, _s=a.shape: (0,) * len(_s))
        for a in (w1, w1T, b1T, w2a, w2b, b2T, w3a, w3b, b3T, w2c, w3c)
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
    dgt = bwd(gt, ct_p, w1.astype(jnp.float32), w1T.astype(ship), b1T,
              w2a, w2b, b2T, w3a, w3b, b3T, w2c, w3c)
    # (nB, 8, T*Bb) -> (T, B, D)
    dg = dgt[:, :D, :].reshape(nB, D, T, _BB).transpose(2, 0, 3, 1).reshape(
        T, B_pad, D)[:, :B]
    zeros_dec = jax.tree_util.tree_map(jnp.zeros_like, decoders)
    return zeros_dec, dg


energy_expected_fused_t.defvjp(_fwd_rule_t, _bwd_rule_t)
