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


def _compiler_params():
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    except Exception:  # older API name
        return pltpu.TPUCompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


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


def _tail_layers(h, ws, bs, m, dtype, start: int = 1, keep_acts: bool = False):
    """Apply layers [start:] of decoder m to (rows, H): matmuls on the MXU."""
    acts = []
    n_layers = len(ws)
    for i in range(start, n_layers):
        w = ws[i][m].astype(dtype)
        b = bs[i][m].astype(jnp.float32)
        h = jnp.dot(h.astype(dtype), w, preferred_element_type=jnp.float32) + b
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
            if keep_acts:
                acts.append(h)
    return (h, acts) if keep_acts else h


def _decode_planes(g_planes, ws, bs, m, dtype):
    h1 = _first_layer(g_planes, ws[0][m], bs[0][m], dtype)
    return _tail_layers(h1, ws, bs, m, dtype)


def _fwd_kernel(*refs, T, B, D, X, M, Tc, n_layers, dtype):
    g_refs = refs[:D]                     # D x (T, B)
    w_refs = refs[D:D + n_layers]
    b_refs = refs[D + n_layers:D + 2 * n_layers]
    out_ref = refs[D + 2 * n_layers]
    xbar_ext = refs[D + 2 * n_layers + 1]  # (Tc+8, B, X) scratch
    sq_ext = refs[D + 2 * n_layers + 2]    # (Tc+8, B) scratch

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    inv_m = 1.0 / M
    n_chunks = T // Tc

    out_ref[:] = jnp.zeros_like(out_ref)
    # zero the carry slot: chunk 0's first segment is masked out, but it must
    # still be computed from finite values (0 * NaN = NaN)
    xbar_ext[pl.ds(0, 8), :, :] = jnp.zeros((8, B, X), jnp.float32)
    sq_ext[pl.ds(0, 8), :] = jnp.zeros((8, B), jnp.float32)

    def body(c, _):
        start = pl.multiple_of(c * Tc, 8)
        g_planes = [g_refs[d][pl.ds(start, Tc), :] for d in range(D)]
        xbar = jnp.zeros((Tc * B, X), jnp.float32)
        sq3 = jnp.zeros((Tc, B), jnp.float32)
        for m in range(M):
            x = _decode_planes(g_planes, ws, bs, m, dtype)   # (Tc*B, X)
            xbar = xbar + x
            x3 = x.reshape(Tc, B, X)
            sq3 = sq3 + jnp.sum(x3 * x3, axis=-1)
        xbar = xbar * inv_m
        sq3 = sq3 * inv_m

        # rows 7..7+Tc hold [carry, chunk]; write chunk at aligned offset 8
        xbar_ext[pl.ds(8, Tc), :, :] = xbar.reshape(Tc, B, X)
        sq_ext[pl.ds(8, Tc), :] = sq3

        xe = xbar_ext[:]                                  # (Tc+8, B, X)
        se = sq_ext[:]
        cross = jnp.sum(xe[8:8 + Tc] * xe[7:7 + Tc], axis=-1)   # (Tc, B)
        seg = se[8:8 + Tc] + se[7:7 + Tc] - 2.0 * cross         # (Tc, B)
        # NOTE Mosaic constraint: offset value-slices need >= 8 sublanes
        # (seg[1:] works for Tc >= 16; Tc=8 would produce an unsupported
        # (7, B) relayout) — _pick_chunk guarantees Tc >= 16 when possible.
        first_w = jnp.where(c == 0, 0.0, 1.0)
        total = jnp.sum(seg[1:], axis=0) + seg[0] * first_w
        out_ref[0, :] = out_ref[0, :] + total
        # carry last row into slot 7 for the next chunk
        xbar_ext[7, :, :] = xbar_ext[7 + Tc, :, :]
        sq_ext[7, :] = sq_ext[7 + Tc, :]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _bwd_kernel(*refs, T, B, D, X, M, Tc, n_layers, dtype):
    g_refs = refs[:D]                     # D x (T+8, B) edge-padded planes
    ct_ref = refs[D]
    w_refs = refs[D + 1:D + 1 + n_layers]
    b_refs = refs[D + 1 + n_layers:D + 1 + 2 * n_layers]
    dg_refs = refs[D + 1 + 2 * n_layers:D + 1 + 2 * n_layers + D]

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    inv_m = 1.0 / M
    n_chunks = T // Tc
    ct = ct_ref[0, :]                     # (B,)

    def body(c, _):
        start = pl.multiple_of(c * Tc, 8)
        # windows cover padded rows [c*Tc, c*Tc+Tc+8) = global rows
        # [c*Tc-1, c*Tc+Tc+7): halo rows 0..Tc+1, center rows 1..Tc
        wins = [g_refs[d][pl.ds(start, Tc + 8), :] for d in range(D)]
        halo_planes = [w[0:Tc + 2, :] for w in wins]
        center_planes = [w[1:Tc + 1, :] for w in wins]

        xbar = jnp.zeros(((Tc + 2) * B, X), jnp.float32)
        for m in range(M):
            xbar = xbar + _decode_planes(halo_planes, ws, bs, m, dtype)
        xbar = (xbar * inv_m).reshape(Tc + 2, B, X)

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (Tc, 1), 0) + c * Tc
        has_left = (row_ids > 0).astype(jnp.float32)      # (Tc, 1)
        has_right = (row_ids < T - 1).astype(jnp.float32)
        c_coeff = (has_left + has_right)[:, :, None]      # (Tc, 1, 1)
        left = xbar[0:Tc] * has_left[:, :, None]
        right = xbar[2:Tc + 2] * has_right[:, :, None]
        scale = (2.0 * inv_m) * ct[None, :, None]         # (1, B, 1)

        dgs = [jnp.zeros((Tc, B), jnp.float32) for _ in range(D)]
        for m in range(M):
            h1 = _first_layer(center_planes, ws[0][m], bs[0][m], dtype)
            x, acts = _tail_layers(h1, ws, bs, m, dtype, keep_acts=True)
            x3 = x.reshape(Tc, B, X)
            dx = scale * (c_coeff * x3 - left - right)    # (Tc, B, X)
            dh = dx.reshape(Tc * B, X)
            for i in range(n_layers - 1, 0, -1):
                w = ws[i][m].astype(dtype)
                dh = jnp.dot(dh.astype(dtype), w.T,
                             preferred_element_type=jnp.float32)
                act = acts[i - 2] if i >= 2 else h1
                dh = dh * (act > 0.0)
            # first layer backprop: dg_d = sum_h dh1[:, h] * W1[d, h]
            dh3 = dh.reshape(Tc, B, ws[0].shape[-1])
            for d in range(D):
                w1d = ws[0][m, d].astype(jnp.float32)     # (H1,)
                dgs[d] = dgs[d] + jnp.sum(dh3 * w1d[None, None, :], axis=-1)
        for d in range(D):
            dg_refs[d][pl.ds(start, Tc), :] = dgs[d]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _build_fwd(T, B, D, X, M, Tc, n_layers, dtype, interpret):
    kernel = functools.partial(_fwd_kernel, T=T, B=B, D=D, X=X, M=M, Tc=Tc,
                               n_layers=n_layers, dtype=dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (D + 2 * n_layers),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Tc + 8, B, X), jnp.float32),
            pltpu.VMEM((Tc + 8, B), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )


def _build_bwd(T, B, D, X, M, Tc, n_layers, dtype, interpret):
    kernel = functools.partial(_bwd_kernel, T=T, B=B, D=D, X=X, M=M, Tc=Tc,
                               n_layers=n_layers, dtype=dtype)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((T, B), jnp.float32)] * D,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (D + 1 + 2 * n_layers),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * D,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def fused_fits(T, B, D, X, M, mc: bool = False, mc_samples: int = 2) -> bool:
    """Whether the fused kernels fit this chip's VMEM for these shapes.

    Empirically calibrated on v5e (128 MB vmem space): the reference
    workload (T=2000, B=200, X=50, M=10) compiles and runs for both kernels;
    B=400 at the same T fails XLA's scoped-vmem accounting (measured
    141.8 MB > 128 MB) even though a naive buffer model predicts ~30 MB —
    Mosaic's stack accounting is opaque, so the guard is conservative.
    Oversized calls fall back to the XLA energy paths (same semantics)."""
    if D > 2 or X > 64 or M > 16:
        return False
    return B * T <= 200 * 2048 and B <= 256


def _gamma_planes(gamma):
    T, B, D = gamma.shape
    return [gamma[:, :, d] for d in range(D)]


def _gamma_planes_padded(gamma):
    """Edge-pad to (T+8, B) planes: 1 leading + 7 trailing rows."""
    T, B, D = gamma.shape
    gp = jnp.concatenate([gamma[:1], gamma] + [gamma[-1:]] * 7, axis=0)
    return [gp[:, :, d] for d in range(D)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def energy_expected_fused(decoders, gamma, precision: str = "float32"):
    """Fused expected ensemble energy: (T, B, D) curve -> (B,) energies.

    precision: 'float32' (default, parity with the XLA path) or 'bfloat16'
    (bf16 matmuls with f32 accumulation — faster, ~1e-3 rel error; use for
    bulk optimization steps, finish/evaluate in float32).

    Differentiable in ``gamma`` only — decoder weights receive zero
    cotangents (geodesic optimization never trains them; use the XLA path
    ``geometry.energy.energy_expected`` if you need weight gradients).
    """
    e, _ = _fwd_impl(decoders, gamma, precision)
    return e


def _dims(decoders, gamma):
    T, B, D = gamma.shape
    ws, bs = _stack_weights(decoders)
    M = ws[0].shape[0]
    X = ws[-1].shape[-1]
    Tc = _pick_chunk(T, B)
    return T, B, D, X, M, Tc, ws, bs


def _fwd_impl(decoders, gamma, precision):
    T, B, D, X, M, Tc, ws, bs = _dims(decoders, gamma)
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    fwd = _build_fwd(T, B, D, X, M, Tc, len(ws), dtype,
                     interpret=not _is_tpu())
    out = fwd(*_gamma_planes(gamma), *ws, *bs)
    return out[0], (decoders, gamma)


def _fwd_rule(decoders, gamma, precision):
    e, res = _fwd_impl(decoders, gamma, precision)
    return e, res


def _bwd_rule(precision, res, ct):
    decoders, gamma = res
    T, B, D, X, M, Tc, ws, bs = _dims(decoders, gamma)
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    bwd = _build_bwd(T, B, D, X, M, Tc, len(ws), dtype,
                     interpret=not _is_tpu())
    dplanes = bwd(*_gamma_planes_padded(gamma),
                  ct.reshape(1, B).astype(jnp.float32), *ws, *bs)
    dgamma = jnp.stack(dplanes, axis=-1)                 # (T, B, D)
    zeros_dec = jax.tree_util.tree_map(jnp.zeros_like, decoders)
    return zeros_dec, dgamma


energy_expected_fused.defvjp(_fwd_rule, _bwd_rule)
