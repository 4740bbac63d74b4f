"""Fused Pallas TPU kernel for the expected ensemble curve energy.

The XLA path (``geometry/energy.energy_expected``) materializes the decoded
tensor (M_dec, T, B, X) — 800 MB at the reference workload — and pays HBM
round-trips for every reduction.  This kernel streams the curve through all
ensemble decoders chunk-by-chunk entirely in VMEM:

- all M decoder MLPs' weights live in VMEM for the whole kernel (~1 MB for
  the 10-decoder reference model), pre-cast to the compute dtype ONCE on the
  host side so no casts happen inside the chunk loop;
- per T-chunk, the decoder loop accumulates only the (per-spline weighted)
  ensemble mean ``xbar`` and mean squared norm ``sq`` (the sufficient
  statistics of the expected energy) — the (M, T, B, X) tensor never exists;
- adjacent-sample cross terms use a one-row carry between chunks;
- the batch axis is *gridded*: blocks of ``Bb`` splines are pipelined through
  VMEM, so any batch size fits (the reference single-decoder config is
  B=500, ``src/single_decoder/optimize_energy_batched.py:132``);
- per-spline ensemble weights (M, B) generalize the uniform mean: the CoV
  sweep's first-k-decoders subsets (``src/eval.py:112-126``) become masked
  mean weights, one batched kernel call for all k at once;
- M == 1 takes a cancellation-free fast path (direct segment differences),
  which makes the kernel the fused implementation of the single-decoder
  energy (``src/single_decoder/optimize_energy_batched.py:51-57``) as well;
- the backward kernel exploits that geodesic optimization trains only the
  curve (omega), not the decoders: it recomputes activations per chunk and
  emits d gamma only — no weight gradients, no stored residuals.

TPU layout notes (learned from Mosaic):
- the curve is passed as D separate (T, B) planes: a (..., D=2) trailing axis
  would lane-pad 64x, and in-kernel reshapes may not change the lane dim;
- the first MLP layer (D -> H) is computed as D broadcast multiply-adds on
  the VPU instead of a degenerate D-contraction matmul;
- d gamma is likewise emitted as D planes (lane-dim-preserving reductions);
- dynamic slice starts are (chunk multiple-of-8) aligned.

Energy definition matches ``energy_expected`` exactly:
    E_b = sum_t [ sq_{t+1,b} + sq_{t,b} - 2 <xbar_{t+1,b}, xbar_{t,b}> ]
which is the closed-form expectation of the reference's MC estimator
(upstream ``src/optimize.py:38-75``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # Pallas is TPU/interpret-only in some builds; degrade gracefully.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def fused_available() -> bool:
    return _PALLAS_OK


# The default Mosaic scoped-VMEM budget is 16 MB; this chip has far more
# (v5e reports a 128 MB vmem space).  Our chunk intermediates want ~20-40 MB.
_VMEM_LIMIT = 100 * 1024 * 1024

# Batch-block size: batches up to 256 run as a single block (the reference
# B=200 workload, measured well within VMEM); larger batches are gridded
# into 128-wide blocks pipelined through VMEM.  The MC kernels carry extra
# per-sample planes AND multi-pass full-precision matmuls need larger stack
# temporaries (measured: Bb=200 MC backward hits 113 MB scoped vmem vs the
# 100 MB limit), so their blocks are capped at 128.
_SINGLE_BLOCK_MAX = 256
_GRID_BB = 128
# Rows-per-block targets, forward vs backward: the backward's multi-pass
# stack temporaries cap its blocks (Tc=40 at B=200 measured 122.5 MB
# scoped vmem, > the chip; experiment/tc_sweep_probe.json), the forward
# is lighter and may use larger blocks independently.
_TARGET_ROWS_FWD = 4096
_TARGET_ROWS_BWD = 4096
_MAX_BB_EXPECTED = _SINGLE_BLOCK_MAX
_MAX_BB_MC = _GRID_BB
# MC kernels chunk at 2048 rows (their per-decoder multi-pass backward
# temporaries overflow scoped VMEM at 4096): energy_mc_pallas._common reads
# this constant, and fused_fits MUST validate with the same value or the
# guard approves shapes whose real Tc lands under the Mosaic floor.
_TARGET_ROWS_MC = 2048


def _compiler_params():
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    except Exception:  # older API name
        return pltpu.TPUCompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _pick_bb(B: int, max_bb: int = _SINGLE_BLOCK_MAX) -> int:
    """Batch-block width for the B-axis grid.

    The batch axis is the LANE dimension of the (T, B) curve planes, and
    Pallas requires lane blocks to be 128-divisible (or equal to the array
    dim), so gridded blocks are always 128 wide — balanced narrower blocks
    (e.g. 2x104 for B=200) are rejected at lowering."""
    return B if B <= max_bb else _GRID_BB


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


def _first_layer(g_planes, w1, b1, dtype):
    """(Tc, B) planes -> post-relu h1 (Tc*B, H1) via broadcast mul-adds.

    w1: (D, H1);  the degenerate D-contraction never touches the MXU.
    """
    Tc, B = g_planes[0].shape
    h = jnp.zeros((Tc, B, w1.shape[1]), jnp.float32) + b1.astype(jnp.float32)
    for d, g in enumerate(g_planes):
        h = h + g[:, :, None].astype(jnp.float32) * w1[d][None, None, :].astype(jnp.float32)
    h = jnp.maximum(h, 0.0)
    return h.reshape(Tc * B, w1.shape[1])


# ---------------------------------------------------------------------------
# MXU precision ladder.
#
# CRITICAL: with Mosaic's DEFAULT dot precision the MXU rounds f32 inputs to
# bfloat16 (~2^-9 input rounding).  The decoded points of adjacent t-samples
# on a smooth curve differ by ~|x|/T ~ 5e-4 |x|, far below that rounding, so
# the discrete energy sum_t ||x_{t+1} - x_t||^2 becomes pure rounding noise
# (measured on a v5e: ~6x median error vs float64 on real curves, invisible
# to random-curve tests).  Mosaic only exposes DEFAULT and HIGHEST (6-pass
# exact f32, measured ~5x slower than 1-pass), so intermediate rungs are
# built by hand from bf16 hi/lo splits (a = a_hi + a_lo, each bf16; every
# partial product is one MXU pass with f32 accumulation):
#
#   precision    passes  per-point x error    use
#   "float32"    6       ~f32 exact           parity / final evaluation
#   "f32x3"      3       ~4e-6 |x|            default optimization steps
#   "f32x2"      2       ~4e-6|x| + smooth    bulk optimization steps
#                        bf16-weight bias     (finish at "float32")
#   "bfloat16"   1       ~2e-3 |x|            NOT usable for smooth curves
#
# "f32x2" keeps weights in plain bf16: a t-CONSTANT perturbation of the
# decoder (a slightly different, equally smooth function) that biases the
# energy smoothly instead of adding per-sample noise — safe for optimization
# when final energies are re-evaluated at "float32" (optim/geodesic does).
# ---------------------------------------------------------------------------

PRECISIONS = ("float32", "f32x3", "f32x2", "bfloat16")


def check_precision(precision: str) -> None:
    """Single implementation of the rung-name guard (custom_vjp needs it
    in both the primal and the fwd rule of every wrapper)."""
    if precision not in PRECISIONS:
        raise ValueError(f"unknown kernel precision {precision!r}")


def _split_hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _prep_w(w, prec):
    """Weight preparation, once per kernel invocation (outside the chunk
    loop): the (w_main, w_lo) pair consumed by :func:`_mp_dot`."""
    if prec == "float32":
        return (w, None)
    hi, lo = _split_hi_lo(w)
    if prec == "f32x3":
        return (hi, lo)
    return (hi, None)                      # f32x2 / bfloat16


def _bf16_dot(a, b):
    """One bf16 MXU pass with f32 accumulation.

    The precision MUST be pinned to DEFAULT explicitly: the package sets
    ``jax_default_matmul_precision='highest'`` globally (see __init__), and a
    bf16-input dot that inherits HIGHEST fails Mosaic lowering with the
    cryptic ``Bad lhs type`` (bf16 operands cannot take the multi-pass-f32
    lowering).  This cost a long bisect — do not remove the precision arg.
    """
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


def _mp_dot(h, wpair, prec, transpose: bool = False):
    """Multi-pass h @ w (or h @ w.T) at the requested precision rung;
    always f32-accumulated."""
    w, w_lo = wpair
    if transpose:
        w = w.T
        w_lo = None if w_lo is None else w_lo.T
    if prec == "float32":
        return jnp.dot(h, w, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if prec == "bfloat16":
        return _bf16_dot(h.astype(jnp.bfloat16), w)
    h_hi, h_lo = _split_hi_lo(h)
    out = _bf16_dot(h_hi, w) + _bf16_dot(h_lo, w)
    if w_lo is not None:                   # f32x3: + h_hi * w_lo
        out = out + _bf16_dot(h_hi, w_lo)
    return out


def _prep_ws_m(ws, m, prec):
    """Split decoder m's tail-layer weights once for the whole kernel body."""
    return [None if i == 0 else _prep_w(ws[i][m], prec)
            for i in range(len(ws))]


def _tail_layers(h, ws, bs, m, prec, start: int = 1, keep_acts: bool = False,
                 wpairs=None):
    """Apply layers [start:] of decoder m to (rows, H): matmuls on the MXU."""
    acts = []
    n_layers = len(ws)
    for i in range(start, n_layers):
        wpair = wpairs[i] if wpairs is not None else _prep_w(ws[i][m], prec)
        b = bs[i][m].astype(jnp.float32)
        h = _mp_dot(h, wpair, prec) + b
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
            if keep_acts:
                acts.append(h)
    return (h, acts) if keep_acts else h


def _decode_planes(g_planes, ws, bs, m, prec, wpairs=None):
    h1 = _first_layer(g_planes, ws[0][m], bs[0][m], prec)
    return _tail_layers(h1, ws, bs, m, prec, wpairs=wpairs)


def _fwd_kernel(*refs, T, B, D, X, M, Tc, n_layers, dtype):
    g_refs = refs[:D]                     # D x (T, B)
    w_refs = refs[D:D + n_layers]
    b_refs = refs[D + n_layers:D + 2 * n_layers]
    wmb_ref = refs[D + 2 * n_layers]      # (M, B) per-spline ensemble weights
    out_ref = refs[D + 2 * n_layers + 1]
    xbar_ext = refs[D + 2 * n_layers + 2]  # (Tc+8, B, X) scratch
    sq_ext = refs[D + 2 * n_layers + 3]    # (Tc+8, B) scratch
    seg_ref = refs[D + 2 * n_layers + 4]   # (Tc, B) scratch

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    wp = [_prep_ws_m(ws, m, dtype) for m in range(M)]  # split once, not per chunk
    wmb = wmb_ref[:]                       # (M, B)
    n_chunks = T // Tc

    out_ref[:] = jnp.zeros_like(out_ref)
    # zero the carry slot: chunk 0's first segment is masked out, but it must
    # still be computed from finite values (0 * NaN = NaN)
    xbar_ext[pl.ds(0, 8), :, :] = jnp.zeros((8, B, X), jnp.float32)
    if M > 1:
        sq_ext[pl.ds(0, 8), :] = jnp.zeros((8, B), jnp.float32)

    def body(c, _):
        start = pl.multiple_of(c * Tc, 8)
        g_planes = [g_refs[d][pl.ds(start, Tc), :] for d in range(D)]
        # centered sufficient statistics (cancellation-free; see
        # geometry/energy.energy_expected): decode decoder 0, then accumulate
        # weighted deviations y_m = x_m - x_0.  Requires sum_m w[m, b] == 1
        # (mean weights), which uniform_weights/active_weights guarantee.
        x0 = _decode_planes(g_planes, ws, bs, 0, dtype,
                            wp[0]).reshape(Tc, B, X)
        ybar = jnp.zeros((Tc, B, X), jnp.float32)
        sqy = jnp.zeros((Tc, B), jnp.float32)
        for m in range(1, M):
            x = _decode_planes(g_planes, ws, bs, m, dtype, wp[m])  # (Tc*B, X)
            y = x.reshape(Tc, B, X) - x0
            w_m = wmb[m, :][None, :]                         # (1, B)
            ybar = ybar + w_m[:, :, None] * y
            sqy = sqy + w_m * jnp.sum(y * y, axis=-1)
        xbar = x0 + ybar

        # rows 7..7+Tc hold [carry, chunk]; write chunk at aligned offset 8
        xbar_ext[pl.ds(8, Tc), :, :] = xbar
        xe = xbar_ext[:]                                  # (Tc+8, B, X)
        diff = xe[8:8 + Tc] - xe[7:7 + Tc]
        seg = jnp.sum(diff * diff, axis=-1)               # (Tc, B)
        if M > 1:
            var = sqy - jnp.sum(ybar * ybar, axis=-1)     # (Tc, B)
            sq_ext[pl.ds(8, Tc), :] = var
            se = sq_ext[:]
            seg = seg + se[8:8 + Tc] + se[7:7 + Tc]
        # roundtrip through scratch: the offset value-slice below needs a
        # concrete (non-implicit-dim) layout, which a scratch read provides
        seg_ref[:, :] = seg
        seg = seg_ref[:]
        # NOTE Mosaic constraint: offset value-slices need >= 8 sublanes
        # (seg[1:] works for Tc >= 16; Tc=8 would produce an unsupported
        # (7, B) relayout) — _pick_chunk guarantees Tc >= 16 when possible.
        first_w = jnp.where(c == 0, 0.0, 1.0)
        total = jnp.sum(seg[1:], axis=0) + seg[0] * first_w
        out_ref[0, :] = out_ref[0, :] + total
        # carry last row into slot 7 for the next chunk
        xbar_ext[7, :, :] = xbar_ext[7 + Tc, :, :]
        if M > 1:
            sq_ext[7, :] = sq_ext[7 + Tc, :]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _bwd_kernel(*refs, T, B, D, X, M, Tc, n_layers, dtype):
    g_refs = refs[:D]                     # D x (T+8, B) edge-padded planes
    ct_ref = refs[D]
    w_refs = refs[D + 1:D + 1 + n_layers]
    b_refs = refs[D + 1 + n_layers:D + 1 + 2 * n_layers]
    wmb_ref = refs[D + 1 + 2 * n_layers]  # (M, B)
    dg_refs = refs[D + 2 + 2 * n_layers:D + 2 + 2 * n_layers + D]

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    # slot 0 repurposed with f32 W1 rows for _backprop_chain's dgamma
    # contraction (same convention as the MC and stats kernels — ONE
    # implementation of the cotangent rung policy)
    wp = []
    for m in range(M):
        wm = _prep_ws_m(ws, m, dtype)
        wm[0] = [ws[0][m, d].astype(jnp.float32) for d in range(D)]
        wp.append(wm)
    wmb = wmb_ref[:]
    n_chunks = T // Tc
    ct = ct_ref[0, :]                     # (B,)

    def body(c, _):
        start = pl.multiple_of(c * Tc, 8)
        # windows cover padded rows [c*Tc, c*Tc+Tc+8) = global rows
        # [c*Tc-1, c*Tc+Tc+7): halo rows 0..Tc+1, center rows 1..Tc
        wins = [g_refs[d][pl.ds(start, Tc + 8), :] for d in range(D)]
        halo_planes = [w[0:Tc + 2, :] for w in wins]
        center_planes = [w[1:Tc + 1, :] for w in wins]

        # pass 1 — the ONLY decode: accumulate xbar over halo rows and keep
        # each decoder's center-row output (f32, needed by dx) plus its
        # hidden-layer ReLU masks (bf16).  Pass 2 then re-evaluates only the
        # first (VPU, MXU-free) layer per decoder — the tail-layer MXU
        # recompute of the previous design is gone, cutting the kernel from
        # 2*n_pass+chain to n_pass+chain passes per dot (measured 1.43-1.50x
        # on the expected kernel, 1.08-1.24x on the VPU-heavier MC kernels;
        # experiment/bwd_single_decode_probe.json).
        xbar = jnp.zeros((Tc + 2, B, X), jnp.float32)
        xs_c, masks_c = [], []
        for m in range(M):
            h1 = _first_layer(halo_planes, ws[0][m], bs[0][m], dtype)
            x, acts = _tail_layers(h1, ws, bs, m, dtype, keep_acts=True,
                                   wpairs=wp[m])
            x3 = x.reshape(Tc + 2, B, X)
            xbar = xbar + wmb[m, :][None, :, None] * x3
            xs_c.append(x3[1:Tc + 1])
            masks_c.append(_center_masks(acts, Tc, B))

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (Tc, 1), 0) + c * Tc
        has_left = (row_ids > 0).astype(jnp.float32)      # (Tc, 1)
        has_right = (row_ids < T - 1).astype(jnp.float32)
        c_coeff = (has_left + has_right)[:, :, None]      # (Tc, 1, 1)
        left = xbar[0:Tc] * has_left[:, :, None]
        right = xbar[2:Tc + 2] * has_right[:, :, None]

        dgs = [jnp.zeros((Tc, B), jnp.float32) for _ in range(D)]
        for m in range(M):
            # dE/dx_{m,t} = 2 w_{m,b} ct_b (c_coeff x_{m,t} - xbar_{t-1} - xbar_{t+1})
            scale = 2.0 * (wmb[m, :] * ct)[None, :, None]  # (1, B, 1)
            dx = scale * (c_coeff * xs_c[m] - left - right)  # (Tc, B, X)
            h1 = _first_layer(center_planes, ws[0][m], bs[0][m], dtype)
            _backprop_chain_masked(dx, [(h1 > 0.0)] + masks_c[m], wp[m],
                                   dtype, Tc, B, n_layers, dgs)
        for d in range(D):
            dg_refs[d][pl.ds(start, Tc), :] = dgs[d]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _backprop_chain(dx, h1, acts, wp_m, dtype, Tc, B, n_layers, dgs):
    """Backprop an (Tc, B, X) output cotangent through one decoder's tail
    layers and first layer, accumulating into the D per-plane dgamma
    accumulators ``dgs`` (in place on the Python list).  The cotangent chain
    is difference-valued, so bf16 rounding is RELATIVE to the gradient
    itself — single-pass under the reduced rungs (docs/NUMERICS.md)."""
    masks = [(h1 > 0.0)] + [(a > 0.0) for a in acts]
    _backprop_chain_masked(dx, masks, wp_m, dtype, Tc, B, n_layers, dgs)


def _backprop_chain_masked(dx, masks, wp_m, dtype, Tc, B, n_layers, dgs):
    """Cotangent chain from precomputed ReLU masks (``masks[i-1]`` gates
    layer i's input activation, i = 1..n_layers-1; masks may be bool or
    bf16 {0,1} planes).  This is the single-decode backward's chain: the
    masks come from the SAME decode that produced the forward quantities
    (saved in pass 1), so no tail-layer recompute happens here — only the
    first (VPU) layer is re-evaluated by the caller.  Bit-identical to
    :func:`_backprop_chain` with acts from a fresh recompute, at n_pass
    fewer MXU passes per dot."""
    chain_prec = "bfloat16" if dtype in ("f32x3", "f32x2") else dtype
    dh = dx.reshape(Tc * B, dx.shape[-1])
    for i in range(n_layers - 1, 0, -1):
        dh = _mp_dot(dh, wp_m[i], chain_prec, transpose=True)
        dh = dh * masks[i - 1]
    dh3 = dh.reshape(Tc, B, dh.shape[-1])
    for d in range(len(dgs)):
        w1d = wp_m[0][d]                      # (H1,) f32 row of W1
        dgs[d] = dgs[d] + jnp.sum(dh3 * w1d[None, None, :], axis=-1)


def _center_masks(acts, Tc, B):
    """Center-row ReLU masks (bf16 {0,1}) from halo-row activations: each
    act is ((Tc+2)*B, H) from the pass-1 decode; the chain needs rows
    1..Tc — a contiguous [B:(Tc+1)*B) block of the row-major layout, taken
    via the established 3D slice-reshape (lane dim preserved)."""
    out = []
    for a in acts:
        h = a.shape[-1]
        a3 = a.reshape(Tc + 2, B, h)
        out.append((a3[1:Tc + 1].reshape(Tc * B, h) > 0.0)
                   .astype(jnp.bfloat16))
    return out


# ---------------------------------------------------------------------------
# Ensemble sufficient-statistics kernels (the ep-sharded fast path).
#
# The fused energy kernels above hold ALL ensemble decoders in one kernel —
# perfect on a single chip, but the decoder axis (SURVEY §2.9's designated
# expert-parallel axis, the reference's per-decoder stack loop at upstream
# src/optimize.py:50) cannot be split across devices that way.  The expected
# energy is a function of per-(t, b) sufficient statistics that are SUMS over
# decoders, so each ep shard runs this kernel over its local decoder subset:
#
#   x0  = x_{m0}(t, b)                 (local reference decoder's output)
#   yb  = sum_{j>=1} w_j (x_j - x0)    (weighted centered first moment)
#   sq  = sum_{j>=1} w_j ||x_j - x0||^2
#
# and the global energy is assembled from psums of per-shard statistics in
# plain XLA (energy_expected_sharded): centering keeps every communicated
# quantity at deviation scale, so f32 psums lose nothing (the uncentered
# sum-of-squares would cancel catastrophically — docs/NUMERICS.md).
#
# Unlike the energy kernels these are pointwise in t (segment differencing
# happens on the psummed means), so there are no halos or carries: a 2D
# (B-block x T-chunk) grid streams tiles through VMEM.
#
# Measured on a v5e vs the XLA-highest gradient (real seed-12 decoders,
# smooth curves, T=2000): float32 backward maxrel 5.3e-6; f32x3 backward
# median 1.3e-4, p99.9 2.5e-3, isolated maxima ~1e-1 from ReLU-boundary
# sign flips under the reduced activation recompute — the same accepted
# ladder tradeoff as the energy kernels (trajectory-only; final energies
# are re-evaluated at exact float32 by the optimizer).
# ---------------------------------------------------------------------------


def _stats_fwd_kernel(*refs, D, X, M, n_layers, dtype):
    g_refs = refs[:D]                          # D x (Tc, Bb)
    w_refs = refs[D:D + n_layers]
    b_refs = refs[D + n_layers:D + 2 * n_layers]
    wmb_ref = refs[D + 2 * n_layers]           # (M, Bb) local weights
    x0_ref = refs[D + 2 * n_layers + 1]        # (Tc, Bb, X)
    yb_ref = refs[D + 2 * n_layers + 2]        # (Tc, Bb, X)
    sq_ref = refs[D + 2 * n_layers + 3]        # (Tc, Bb)

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    wp = [_prep_ws_m(ws, m, dtype) for m in range(M)]
    wmb = wmb_ref[:]
    g_planes = [g_refs[d][:] for d in range(D)]
    Tc, B = g_planes[0].shape

    x0 = _decode_planes(g_planes, ws, bs, 0, dtype, wp[0]).reshape(Tc, B, X)
    ybar = jnp.zeros((Tc, B, X), jnp.float32)
    sqy = jnp.zeros((Tc, B), jnp.float32)
    for m in range(1, M):
        x = _decode_planes(g_planes, ws, bs, m, dtype, wp[m])
        y = x.reshape(Tc, B, X) - x0
        w_m = wmb[m, :][None, :]
        ybar = ybar + w_m[:, :, None] * y
        sqy = sqy + w_m * jnp.sum(y * y, axis=-1)
    x0_ref[:] = x0
    yb_ref[:] = ybar
    sq_ref[:] = sqy


def _stats_bwd_kernel(*refs, D, X, M, n_layers, dtype):
    g_refs = refs[:D]                          # D x (Tc, Bb)
    dx0_ref = refs[D]                          # (Tc, Bb, X)
    dyb_ref = refs[D + 1]                      # (Tc, Bb, X)
    dsq_ref = refs[D + 2]                      # (Tc, Bb)
    w_refs = refs[D + 3:D + 3 + n_layers]
    b_refs = refs[D + 3 + n_layers:D + 3 + 2 * n_layers]
    wmb_ref = refs[D + 3 + 2 * n_layers]
    dg_refs = refs[D + 4 + 2 * n_layers:D + 4 + 2 * n_layers + D]

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    # f32 W1 rows for the final dgamma contraction (wp[m][0] slot repurposed:
    # _prep_ws_m leaves index 0 as None — fill with the f32 first layer)
    wp = []
    for m in range(M):
        wm = _prep_ws_m(ws, m, dtype)
        wm[0] = [ws[0][m, d].astype(jnp.float32) for d in range(D)]
        wp.append(wm)
    wmb = wmb_ref[:]
    g_planes = [g_refs[d][:] for d in range(D)]
    Tc, B = g_planes[0].shape
    dx0 = dx0_ref[:]
    dyb = dyb_ref[:]
    dsq3 = dsq_ref[:][:, :, None]

    h1_0 = _first_layer(g_planes, ws[0][0], bs[0][0], dtype)
    x0_flat, acts0 = _tail_layers(h1_0, ws, bs, 0, dtype, keep_acts=True,
                                  wpairs=wp[0])
    x0 = x0_flat.reshape(Tc, B, X)

    dgs = [jnp.zeros((Tc, B), jnp.float32) for _ in range(D)]
    c_sum = jnp.zeros((Tc, B, X), jnp.float32)
    for m in range(1, M):
        h1 = _first_layer(g_planes, ws[0][m], bs[0][m], dtype)
        xf, acts = _tail_layers(h1, ws, bs, m, dtype, keep_acts=True,
                                wpairs=wp[m])
        y = xf.reshape(Tc, B, X) - x0
        c = wmb[m, :][None, :, None] * (dyb + 2.0 * y * dsq3)
        c_sum = c_sum + c
        _backprop_chain(c, h1, acts, wp[m], dtype, Tc, B, n_layers, dgs)
    # d x0: direct cotangent minus every y_j's -x0 dependency
    _backprop_chain(dx0 - c_sum, h1_0, acts0, wp[0], dtype, Tc, B,
                    n_layers, dgs)
    for d in range(D):
        dg_refs[d][:] = dgs[d]


def stats_fits(T, B, D, X, M) -> bool:
    """Shape guard for the stats kernels (same dialect limits as
    :func:`fused_fits`; no carry/halo constraints — tiles are independent)."""
    if D > 2 or X > 128 or M > 16:
        return False
    Bb = _pick_bb(_round_up(B, 8), _MAX_BB_MC)
    Tc = _pick_chunk(T, Bb)
    return Tc % 8 == 0 and T % Tc == 0


def _stats_dims(decoders, gamma):
    T, B, D = gamma.shape
    ws, bs = _stack_weights(decoders)
    M = ws[0].shape[0]
    X = ws[-1].shape[-1]
    B_pad = _round_up(B, 8)
    Bb = _pick_bb(B_pad, _MAX_BB_MC)
    B_pad = _round_up(B_pad, Bb)
    Tc = _pick_chunk(T, Bb)
    if _is_tpu() and Tc % 8 != 0:
        # the compiled kernel's dynamic-slice starts promise 8-alignment to
        # Mosaic; a misaligned Tc miscompiles rather than erroring (gate
        # callers with stats_fits); interpret mode executes any Tc exactly
        raise ValueError(
            f"stats kernel cannot chunk T={T} with batch block {Bb}: no "
            "8-aligned divisor (gate with ops.energy_pallas.stats_fits; "
            "powers of two >= 16 are safe)")
    return T, B, B_pad, Bb, D, X, M, Tc, ws, bs


def _build_stats(kind, T, B, Bb, D, X, M, Tc, n_layers, dtype, interpret,
                 ws, bs):
    grid = (B // Bb, T // Tc)
    g_spec = pl.BlockSpec((Tc, Bb), lambda i, j: (j, i))
    x_spec = pl.BlockSpec((Tc, Bb, X), lambda i, j: (j, i, 0))
    wmb_spec = pl.BlockSpec((M, Bb), lambda i, j: (0, i))
    w_specs = [pl.BlockSpec(w.shape, lambda i, j, _s=w.shape: (0,) * len(_s))
               for w in ws]
    b_specs = [pl.BlockSpec(b.shape, lambda i, j, _s=b.shape: (0,) * len(_s))
               for b in bs]
    if kind == "fwd":
        kernel = functools.partial(_stats_fwd_kernel, D=D, X=X, M=M,
                                   n_layers=n_layers, dtype=dtype)
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=[jax.ShapeDtypeStruct((T, B, X), jnp.float32),
                       jax.ShapeDtypeStruct((T, B, X), jnp.float32),
                       jax.ShapeDtypeStruct((T, B), jnp.float32)],
            in_specs=[g_spec] * D + w_specs + b_specs + [wmb_spec],
            out_specs=[x_spec, x_spec, g_spec],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )
    kernel = functools.partial(_stats_bwd_kernel, D=D, X=X, M=M,
                               n_layers=n_layers, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=[jax.ShapeDtypeStruct((T, B), jnp.float32)] * D,
        in_specs=[g_spec] * D + [x_spec, x_spec, g_spec]
        + w_specs + b_specs + [wmb_spec],
        out_specs=[g_spec] * D,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ensemble_stats_fused(decoders, gamma, wmb, precision: str = "float32"):
    """Per-shard ensemble sufficient statistics, fused.

    gamma: (T, B, D) curve; wmb: (M, B) LOCAL decoder weights (rows of the
    global weight plane belonging to this shard — need not sum to 1).
    Returns (x0, yb, sq): the local reference decoder's output (T, B, X) and
    the weighted centered moments described in the module notes above.
    Differentiable in gamma only.
    """
    out, _ = _stats_fwd_impl(decoders, gamma, wmb, precision)
    return out


def _stats_fwd_impl(decoders, gamma, wmb, precision):
    T, B, B_pad, Bb, D, X, M, Tc, ws, bs = _stats_dims(decoders, gamma)
    check_precision(precision)
    ship = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    gamma_p = _pad_b(gamma, B_pad, axis=1)
    wmb_p = _pad_b(jnp.asarray(wmb, jnp.float32), B_pad, axis=1)
    fwd = _build_stats("fwd", T, B_pad, Bb, D, X, M, Tc, len(ws), precision,
                       not _is_tpu(), ws, bs)
    x0, yb, sq = fwd(*_gamma_planes(gamma_p), *_cast_ws(ws, ship), *bs, wmb_p)
    out = (x0[:, :B], yb[:, :B], sq[:, :B])
    return out, (decoders, gamma, wmb)


def _stats_fwd_rule(decoders, gamma, wmb, precision):
    return _stats_fwd_impl(decoders, gamma, wmb, precision)


def _stats_bwd_rule(precision, res, ct):
    decoders, gamma, wmb = res
    d_x0, d_yb, d_sq = ct
    T, B, B_pad, Bb, D, X, M, Tc, ws, bs = _stats_dims(decoders, gamma)
    ship = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    gamma_p = _pad_b(gamma, B_pad, axis=1)
    wmb_p = _pad_b(jnp.asarray(wmb, jnp.float32), B_pad, axis=1)

    def pad_ct(x):
        """Zero-pad cotangents on the batch axis (edge-replicated padding
        lanes must not contribute gradient)."""
        pad = B_pad - x.shape[1]
        if pad == 0:
            return jnp.asarray(x, jnp.float32)
        widths = [(0, 0)] * x.ndim
        widths[1] = (0, pad)
        return jnp.pad(jnp.asarray(x, jnp.float32), widths)

    bwd = _build_stats("bwd", T, B_pad, Bb, D, X, M, Tc, len(ws), precision,
                       not _is_tpu(), ws, bs)
    dplanes = bwd(*_gamma_planes(gamma_p), pad_ct(d_x0), pad_ct(d_yb),
                  pad_ct(d_sq), *_cast_ws(ws, ship), *bs, wmb_p)
    dgamma = jnp.stack(dplanes, axis=-1)[:, :B]
    zeros_dec = jax.tree_util.tree_map(jnp.zeros_like, decoders)
    return zeros_dec, dgamma, jnp.zeros_like(jnp.asarray(wmb))


ensemble_stats_fused.defvjp(_stats_fwd_rule, _stats_bwd_rule)


def uniform_weights_local(M_total, M_local: int, B: int):
    """Local rows of the uniform global weight plane (each of ``M_local``
    decoders carries weight 1/M_total)."""
    return jnp.ones((M_local, B), jnp.float32) / M_total


def active_weights_local(num_active, M_total, M_local: int, B: int,
                         axis_name=None):
    """Local rows of :func:`active_weights` for an ep shard: global decoder
    index = axis_index * M_local + local index."""
    k = jnp.broadcast_to(jnp.asarray(num_active, jnp.int32), (B,))
    p = jax.lax.axis_index(axis_name) if axis_name is not None else 0
    m_global = p * M_local + jnp.arange(M_local)
    mask = (m_global[:, None] < k[None, :]).astype(jnp.float32)
    return mask / k.astype(jnp.float32)[None, :]


def energy_expected_sharded(decoders, gamma, wmb, axis_name=None,
                            precision: str = "float32"):
    """Expected ensemble energy with the decoder axis sharded over mesh axis
    ``axis_name`` — call INSIDE ``shard_map``: ``decoders``/``wmb`` hold this
    shard's local subset.  Per-shard sufficient statistics come from the
    fused stats kernel; they meet in two (T, B[, X])-shaped psums over
    ``axis_name``; the segment assembly is plain (well-conditioned, centered)
    XLA.  With ``axis_name=None`` this is a single-device decomposition of
    :func:`energy_expected_fused` (used by the equivalence tests).

    Returns (B,) energies, identical on every shard of ``axis_name``.

    Autodiff contract (``shard_map(check_vma=False)``): JAX's untyped
    transpose of ``psum`` is ``psum``, which makes each shard's cotangent of
    a psummed statistic the SUM of every shard's downstream cotangents.
    That is exactly the true total derivative PROVIDED the replicated final
    consumer contributes its cotangent once in total, not once per shard —
    so the caller must scale its per-shard loss by 1/axis_size and psum the
    resulting gradients (``optim/geodesic`` does both); per-shard gradients
    are then true partials and their psum is the exact global gradient
    (verified against the single-device path in tests/test_sharding.py).
    """
    x0, yb, sq = ensemble_stats_fused(decoders, gamma, wmb, precision)
    w_sum = jnp.sum(jnp.asarray(wmb, jnp.float32), axis=0)       # (B,)
    s1 = w_sum[None, :, None] * x0 + yb                          # (T, B, X)
    xbar = s1 if axis_name is None else jax.lax.psum(s1, axis_name)
    d0 = x0 - xbar                                               # deviation
    var_p = (sq + 2.0 * jnp.sum(yb * d0, axis=-1)
             + w_sum[None, :] * jnp.sum(d0 * d0, axis=-1))
    var = var_p if axis_name is None else jax.lax.psum(var_p, axis_name)
    diff = xbar[1:] - xbar[:-1]
    seg = jnp.sum(diff * diff, axis=-1) + var[1:] + var[:-1]
    return jnp.sum(seg, axis=0)


def _specs_for(ws, bs):
    """in_specs for the stacked weights/biases (+ extras): full arrays,
    re-used by every B-block."""
    specs = []
    for w in ws:
        specs.append(pl.BlockSpec(w.shape, lambda i, _s=w.shape: (0,) * len(_s)))
    for b in bs:
        specs.append(pl.BlockSpec(b.shape, lambda i, _s=b.shape: (0,) * len(_s)))
    return specs


def _build_fwd(T, B, Bb, D, X, M, Tc, n_layers, dtype, interpret):
    kernel = functools.partial(_fwd_kernel, T=T, B=Bb, D=D, X=X, M=M, Tc=Tc,
                               n_layers=n_layers, dtype=dtype)

    def build(ws, bs):
        g_spec = pl.BlockSpec((T, Bb), lambda i: (0, i))
        wmb_spec = pl.BlockSpec((M, Bb), lambda i: (0, i))
        return pl.pallas_call(
            kernel,
            grid=(B // Bb,),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
            in_specs=[g_spec] * D + _specs_for(ws, bs) + [wmb_spec],
            out_specs=pl.BlockSpec((1, Bb), lambda i: (0, i)),
            scratch_shapes=[
                pltpu.VMEM((Tc + 8, Bb, X), jnp.float32),
                pltpu.VMEM((Tc + 8, Bb), jnp.float32),
                pltpu.VMEM((Tc, Bb), jnp.float32),
            ],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )

    return build


def _build_bwd(T, B, Bb, D, X, M, Tc, n_layers, dtype, interpret):
    kernel = functools.partial(_bwd_kernel, T=T, B=Bb, D=D, X=X, M=M, Tc=Tc,
                               n_layers=n_layers, dtype=dtype)

    def build(ws, bs):
        g_spec = pl.BlockSpec((T + 8, Bb), lambda i: (0, i))
        ct_spec = pl.BlockSpec((1, Bb), lambda i: (0, i))
        wmb_spec = pl.BlockSpec((M, Bb), lambda i: (0, i))
        dg_spec = pl.BlockSpec((T, Bb), lambda i: (0, i))
        return pl.pallas_call(
            kernel,
            grid=(B // Bb,),
            out_shape=[jax.ShapeDtypeStruct((T, B), jnp.float32)] * D,
            in_specs=[g_spec] * D + [ct_spec] + _specs_for(ws, bs)
            + [wmb_spec],
            out_specs=[dg_spec] * D,
            compiler_params=_compiler_params(),
            interpret=interpret,
        )

    return build


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# Per-block VMEM screen for fused_fits, sized against the 100 MB kernel
# limit (_VMEM_LIMIT).  The backward pass dominates, and since the
# single-decode restructure it keeps per-decoder center outputs (f32) and
# hidden-layer ReLU masks (bf16) live across the whole decoder loop, so
# the estimate below is M-scaled; the budget's margin absorbs what the
# byte model doesn't count (Mosaic temporaries, tiling slack).  The
# boundary shapes this budget approves (M=16 at B=200, the single-block
# M=10 B=256 edge) are hardware-validated to compile and run; see
# tests/test_energy_pallas.py::test_shape_guard_falls_back.
_FITS_BUDGET = 72 * 1024 * 1024


def fused_fits(T, B, D, X, M, mc: bool = False, mc_samples: int = 2) -> bool:
    """Whether the fused kernels can run these shapes.

    The batch axis is gridded (Bb-wide blocks pipelined through VMEM), so any
    B fits; the guard is shape math, not an empirical table:
    - D <= 2 (first layer is D broadcast mul-adds; large D wants a matmul),
    - X <= 128 and M <= 16 keep the chunk working set in VMEM,
    - T must have a divisor Tc with Tc % 8 == 0 and Tc >= 16 (Mosaic sublane
      alignment for dynamic slice starts and offset value-slices),
    - the per-block VMEM estimate (lane-padded, M-scaled for the
      single-decode backward's per-decoder liveness) stays under
      ``_FITS_BUDGET``.
    """
    if D > 2 or X > 128 or M > 16:
        return False
    Bb = _pick_bb(_round_up(B, 8), _MAX_BB_MC if mc else _MAX_BB_EXPECTED)
    # the MC kernels pick their Tc at _TARGET_ROWS_MC (energy_mc_pallas
    # _common); validating at the expected kernels' 4096 would approve
    # shapes whose actual Tc violates the floor below
    Tc = _pick_chunk(T, Bb,
                     target_rows=_TARGET_ROWS_MC if mc else _TARGET_ROWS_FWD)
    if Tc % 8 != 0 or Tc < 16:
        return False
    lanes_x = _round_up(X, 128)
    plane_bytes = (T + 8) * Bb * 4
    chunk_plane = (Tc + 8) * Bb * lanes_x * 4
    chunk_rows = Tc * Bb
    # bf16 masks the backward keeps per decoder: one per hidden layer
    # (the production decoder is 2-hidden Linear(2,128)ReLU
    # Linear(128,128)ReLU Linear(128,X); models/nets.py)
    mask_bytes = 2 * chunk_rows * 128 * 2
    if mc:
        # curve planes + 2S index planes + S diff scratch planes
        per_block = (D + 2 * mc_samples) * plane_bytes \
            + mc_samples * chunk_plane
        # pass-1 index broadcasts + selected-endpoint accumulators
        # (dd1_3/dd2_3 + x1s/x2s: 4 chunk planes per sample)
        per_block += 4 * mc_samples * chunk_plane
        # per-decoder ReLU masks live across both decoder loops
        per_block += M * mask_bytes
    else:
        per_block = D * plane_bytes + chunk_plane
        # per-decoder center-row outputs (f32) + ReLU masks live across
        # both decoder loops of the single-decode backward
        per_block += M * (chunk_rows * lanes_x * 4 + mask_bytes)
    # intermediates of the unrolled MLP chunk (rows x widest hidden)
    per_block += 6 * chunk_rows * 128 * 4
    return per_block <= _FITS_BUDGET


def _round_up(n: int, m: int) -> int:
    return n + (-n) % m


def _pad_b(arr, B_pad, axis):
    """Edge-replicate pad the batch axis up to B_pad (keeps all decode math
    finite; padded lanes are discarded by the caller)."""
    pad = B_pad - arr.shape[axis]
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, mode="edge")


def _gamma_planes(gamma):
    T, B, D = gamma.shape
    return [gamma[:, :, d] for d in range(D)]


def _gamma_planes_padded(gamma):
    """Edge-pad to (T+8, B) planes: 1 leading + 7 trailing rows."""
    T, B, D = gamma.shape
    gp = jnp.concatenate([gamma[:1], gamma] + [gamma[-1:]] * 7, axis=0)
    return [gp[:, :, d] for d in range(D)]


def uniform_weights(M: int, B: int):
    """The (M, B) weight plane of the plain ensemble mean."""
    return jnp.full((M, B), 1.0 / M, jnp.float32)


def active_weights(num_active, M: int, B: int):
    """Masked-mean weight plane for per-spline first-k-decoder subsets
    (the CoV sweep, reference ``src/eval.py:112-126``): w[m, b] =
    (m < k_b) / k_b."""
    k = jnp.broadcast_to(jnp.asarray(num_active, jnp.int32), (B,))
    mask = (jnp.arange(M)[:, None] < k[None, :]).astype(jnp.float32)
    return mask / k.astype(jnp.float32)[None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _energy_expected_fused_vjp(decoders, gamma, wmb, precision: str):
    """custom_vjp core of :func:`energy_expected_fused` — do not call
    directly: the public wrapper cuts decoders/wmb with stop_gradient BEFORE
    this function, which is the only place that cut is effective (code
    inside a custom_vjp primal body is never traced under differentiation;
    JAX dispatches to _fwd_rule/_bwd_rule instead)."""
    e, _ = _fwd_impl(decoders, gamma, wmb, precision)
    return e


def energy_expected_fused(decoders, gamma, wmb=None,
                          precision: str = "float32"):
    """Fused expected ensemble energy: (T, B, D) curve -> (B,) energies.

    wmb: optional (M, B) per-spline ensemble weights (default: uniform 1/M —
    the plain expected energy).  Use :func:`active_weights` for the CoV
    sweep's first-k-decoder subsets.  Not differentiated.  MUST sum to 1
    over the decoder axis for every spline: both the centered forward form
    and the analytic backward are derived under that constraint
    (uniform_weights/active_weights guarantee it; arbitrary weight planes
    give an energy/gradient pair that is not a function/derivative pair).

    precision: 'float32' (default, parity with the XLA path) or 'bfloat16'
    (bf16 matmuls with f32 accumulation — faster, ~1e-3 rel error; use for
    bulk optimization steps, finish/evaluate in float32).

    Differentiable in ``gamma`` only — decoder weights receive zero
    cotangents (geodesic optimization never trains them; use the XLA path
    ``geometry.energy.energy_expected`` if you need weight gradients).
    The contract is mechanically enforced: ``decoders``/``wmb`` are cut
    with ``stop_gradient`` here, OUTSIDE the custom_vjp core, so anything
    differentiating through them (e.g. learned ensemble weights) sees a
    true zero gradient by JAX semantics regardless of what the custom
    backward rule returns.
    """
    decoders = jax.lax.stop_gradient(decoders)
    if wmb is not None:
        wmb = jax.lax.stop_gradient(wmb)
    return _energy_expected_fused_vjp(decoders, gamma, wmb, precision)


def _dims(decoders, gamma, target_rows: int = 4096):
    T, B, D = gamma.shape
    ws, bs = _stack_weights(decoders)
    M = ws[0].shape[0]
    X = ws[-1].shape[-1]
    B_pad = _round_up(B, 8)
    Bb = _pick_bb(B_pad)
    B_pad = _round_up(B_pad, Bb)
    Tc = _pick_chunk(T, Bb, target_rows)
    _check_tc(T, Bb, Tc)
    return T, B, B_pad, Bb, D, X, M, Tc, ws, bs


def _check_tc(T: int, Bb: int, Tc: int) -> None:
    """The compiled kernels promise Mosaic 8-aligned dynamic-slice starts
    (``pl.multiple_of(c * Tc, 8)``) and >= 8-sublane offset value-slices; a
    Tc violating that would MISCOMPILE, not error — so direct API callers
    who bypassed :func:`fused_fits` must be stopped here.  Interpret mode
    (off-TPU) executes slices exactly and supports any Tc, so the guard
    only applies where Mosaic compiles the promise."""
    if _is_tpu() and (Tc % 8 != 0 or Tc < 16):
        raise ValueError(
            f"fused kernel cannot chunk T={T} with batch block {Bb}: the "
            f"largest feasible chunk Tc={Tc} violates Mosaic alignment "
            "(need Tc % 8 == 0 and Tc >= 16).  Gate calls with "
            "ops.energy_pallas.fused_fits, or pick T with an 8-aligned "
            "divisor (powers of two >= 16 are safe)")


def _cast_ws(ws, dtype):
    """Pre-cast the stacked weights once, outside the chunk loop."""
    return [w.astype(dtype) for w in ws]


def _resolve_wmb(wmb, M, B_pad, B):
    if wmb is None:
        return uniform_weights(M, B_pad)
    wmb = jnp.asarray(wmb, jnp.float32)
    if wmb.shape != (M, B):
        raise ValueError(f"wmb must be shaped (M, B) = ({M}, {B}); "
                         f"got {wmb.shape}")
    return _pad_b(wmb, B_pad, axis=1)


def _fwd_impl(decoders, gamma, wmb, precision):
    T, B, B_pad, Bb, D, X, M, Tc, ws, bs = _dims(decoders, gamma,
                                                 _TARGET_ROWS_FWD)
    check_precision(precision)
    ship = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    gamma_p = _pad_b(gamma, B_pad, axis=1)
    wmb_p = _resolve_wmb(wmb, M, B_pad, B)
    fwd = _build_fwd(T, B_pad, Bb, D, X, M, Tc, len(ws), precision,
                     interpret=not _is_tpu())(ws, bs)
    out = fwd(*_gamma_planes(gamma_p), *_cast_ws(ws, ship), *bs, wmb_p)
    return out[0, :B], (decoders, gamma, wmb)


def _fwd_rule(decoders, gamma, wmb, precision):
    e, res = _fwd_impl(decoders, gamma, wmb, precision)
    return e, res


def _bwd_rule(precision, res, ct):
    decoders, gamma, wmb = res
    T, B, B_pad, Bb, D, X, M, Tc, ws, bs = _dims(decoders, gamma,
                                                 _TARGET_ROWS_BWD)
    ship = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    gamma_p = _pad_b(gamma, B_pad, axis=1)
    wmb_p = _resolve_wmb(wmb, M, B_pad, B)
    ct_p = _pad_b(ct.reshape(1, B).astype(jnp.float32), B_pad, axis=1)
    # zero the padded lanes' cotangents (edge-replicated columns must not
    # contribute gradient)
    if B_pad != B:
        lane = jnp.arange(B_pad)[None, :] < B
        ct_p = ct_p * lane.astype(jnp.float32)
    bwd = _build_bwd(T, B_pad, Bb, D, X, M, Tc, len(ws), precision,
                     interpret=not _is_tpu())(ws, bs)
    dplanes = bwd(*_gamma_planes_padded(gamma_p), ct_p,
                  *_cast_ws(ws, ship), *bs, wmb_p)
    dgamma = jnp.stack(dplanes, axis=-1)[:, :B]          # (T, B, D)
    zeros_dec = jax.tree_util.tree_map(jnp.zeros_like, decoders)
    d_wmb = None if wmb is None else jnp.zeros_like(jnp.asarray(wmb))
    return zeros_dec, dgamma, d_wmb


_energy_expected_fused_vjp.defvjp(_fwd_rule, _bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _energy_expected_fused_gradonly(decoders, gamma, wmb, precision: str):
    check_precision(precision)
    return jnp.zeros((gamma.shape[1],), jnp.float32)


def _gradonly_fwd(decoders, gamma, wmb, precision):
    check_precision(precision)
    return (jnp.zeros((gamma.shape[1],), jnp.float32),
            (decoders, gamma, wmb))


# identical backward rule to the real kernel: the residuals are the INPUTS
# (the bwd kernel recomputes activations itself), so the gradient is the
# same whether or not the forward kernel ran
_energy_expected_fused_gradonly.defvjp(_gradonly_fwd, _bwd_rule)


def energy_expected_fused_grad(decoders, gamma, wmb=None,
                               precision: str = "float32"):
    """GRADIENT-ONLY variant of :func:`energy_expected_fused`.

    Returns per-spline ZEROS as the primal value but carries the exact same
    custom VJP as the real kernel — differentiating a ``sum`` of this output
    w.r.t. ``gamma`` yields the true energy gradient while the forward
    decode kernel is never launched (the backward kernel recomputes
    activations from the inputs alone; the forward pass contributes nothing
    to the gradient).  Perf-neutral in the production scan — XLA already
    DCE's the dead forward custom-call (experiment/gradonly_probe.json) —
    but makes the value-free contract explicit rather than relying on DCE,
    and defines the honest per-step pass model (n_pass + chain, no fwd).

    USE ONLY where the energy VALUE is discarded — the production Adam scan
    with ``record_history=False`` (``optim.geodesic``), whose final
    energies are re-evaluated exactly afterward.  Anywhere the value is
    read, use :func:`energy_expected_fused`.
    """
    decoders = jax.lax.stop_gradient(decoders)
    if wmb is not None:
        wmb = jax.lax.stop_gradient(wmb)
    return _energy_expected_fused_gradonly(decoders, gamma, wmb, precision)
