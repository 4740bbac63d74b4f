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

Layout notes: curve passed as D (T, B) planes and indices padded with one
leading dummy column so every dynamic slice start is (multiple-of-8 x chunk)
aligned; see ``energy_pallas`` for the rationale.
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
    check_precision,
    _backprop_chain_masked,
    _cast_ws,
    _center_masks,
    _compiler_params,
    _first_layer,
    _prep_ws_m,
    _gamma_planes,
    _gamma_planes_padded,
    _is_tpu,
    _pad_b,
    _pick_bb,
    _pick_chunk,
    _round_up,
    _specs_for,
    _stack_weights,
    _tail_layers,
)


def _rbg_bits(key, shape):
    """Uniform uint32 bits via the fast RBG generator.

    Threefry bit generation dominated the sampled-energy step on TPU (14 ms
    at the reference workload — as long as the entire fused energy+grad).
    One tiny threefry call derives an RBG key; the bulk bits then come from
    XLA's hardware RngBitGenerator."""
    try:
        seed_words = jax.random.bits(key, (4,), jnp.uint32)
        rbg_key = jax.random.wrap_key_data(seed_words, impl="rbg")
        return jax.random.bits(rbg_key, shape, jnp.uint32)
    except Exception:  # pragma: no cover - older jax without rbg wrap
        return jax.random.bits(key, shape, jnp.uint32)


def sample_decoder_indices(key, T: int, B: int, m_dec: int,
                           mc_samples: int = 2, num_active=None):
    """(d1, d2): (S, T-1, B) int32 decoder draws, U[0, num_active_b).

    When the per-draw range fits, several independent dice are extracted
    from ONE random word as base-k digits, cutting the number of generated
    words by n_dice.  The most significant extracted digit carries modulo
    bias ~ k^n_dice / 2^31, so n_dice is capped at k^n_dice <= 2^31 * 1e-5
    (~21k) to keep every digit's bias below 1e-5 — NOT at k^n_dice <= 2^31,
    which would let the top digit of e.g. 9 base-10 dice oversample small
    decoder indices by ~40%.
    """
    maxval = (jnp.broadcast_to(jnp.asarray(num_active, jnp.int32), (B,))
              if num_active is not None else
              jnp.full((B,), m_dec, jnp.int32))
    n_draws = 2 * mc_samples
    k_max = int(m_dec)
    bias_cap = int(2**31 * 1e-5)      # ~21474: max bias 1e-5 per digit
    dice_per_word = 1
    while (dice_per_word < n_draws
           and k_max ** (dice_per_word + 1) <= bias_cap):
        dice_per_word += 1
    n_words = -(-n_draws // dice_per_word)

    bits = _rbg_bits(key, (n_words, T - 1, B))
    val = (bits >> 1).astype(jnp.int32)          # 31 uniform bits
    mv = maxval[None, None, :]
    draws = []
    for j in range(dice_per_word):
        draws.append((val % mv).astype(jnp.int32))
        val = val // mv
    # (n_words * dice_per_word, T-1, B) -> first n_draws
    all_draws = jnp.concatenate(draws, axis=0)[:n_draws]
    d1 = all_draws[:mc_samples]
    d2 = all_draws[mc_samples:2 * mc_samples]
    return d1, d2


def _pad_indices(d, trailing: int = 0):
    """(S, T-1, B) -> (S, T+trailing, B): dummy leading column (so segment j
    lives at column j+1) plus optional trailing padding for window loads."""
    S, Tm1, B = d.shape
    parts = [jnp.zeros((S, 1, B), d.dtype), d]
    if trailing:
        parts.append(jnp.zeros((S, trailing, B), d.dtype))
    return jnp.concatenate(parts, axis=1)


def _pad_indices_raw(d, trailing: int = 1):
    """(S, T-1, B) -> (S, T-1+trailing, B): raw column layout (segment j at
    column j), trailing zero padding only — used where chunk-aligned reads
    need d[s, t] at row t."""
    S, Tm1, B = d.shape
    return jnp.concatenate([d, jnp.zeros((S, trailing, B), d.dtype)], axis=1)


# ---------------------------------------------------------------------------
# In-kernel PRNG (the TPU fast path).
#
# The external-index path below ships (S, T, B) int32 index planes from HBM
# into both kernels; on TPU the draws can instead come from the core's
# hardware PRNG (pltpu.prng_random_bits) at the point of use, deleting the
# plane generation, the XLA-side pad/concat copies, and their VMEM streaming.
# Determinism contract: both the forward and backward kernels RESEED per
# (batch-block, chunk) with the same (seed, program_id, chunk) tuple and
# issue one identically-shaped generate call, so they consume bit-identical
# draws without any state to keep in sync (the same trick that replaces the
# index-plane residuals).
#
# Uniform ints come from the float path — u = bits[31:8] / 2^24,
# d = floor(u * k) — because Mosaic's integer modulo is less portable than
# float multiply+floor, per-lane k (the CoV sweep's per-spline
# active-decoder counts) broadcasts naturally, and the kernels compare
# indices as f32 planes anyway.  Modulo-free bias is < k * 2^-24 (~1e-6).
#
# TPU-only: interpret mode's prng_random_bits yields zeros (measured), so
# off-TPU callers use the external-index path (also the deterministic path
# the CPU-mesh tests exercise).
# ---------------------------------------------------------------------------


def _gen_draws_f32(seed_ref, c, S2, Tc, B, kmax_row):
    """This chunk's decoder draws: (S2, Tc, B) f32 integer values in
    [0, kmax).  kmax_row: (1, 1, B) f32 per-lane upper bounds.

    Mosaic supports at most TWO seed values, so (batch-block, chunk) are
    packed into one word (chunk counts are bounded by T/Tc <= 2^17 here)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0) * (1 << 17) + c)
    bits = pltpu.prng_random_bits((S2, Tc, B))
    u = jax.lax.shift_right_logical(bits, 8).astype(jnp.float32) \
        * (1.0 / (1 << 24))
    return jnp.floor(u * kmax_row)


def _fwd_kernel_rng(*refs, T, B, D, X, M, S, Tc, n_layers, dtype):
    """Sampled-energy forward with in-kernel draws.  Same streaming
    structure as :func:`_fwd_kernel`; d1 draws are consumed in-register,
    d2 draws go through a one-row-carry ext buffer (segment t-1 lives at
    row t+7, mirroring the lo carry)."""
    g_refs = refs[:D]
    seed_ref = refs[D]
    kmax_ref = refs[D + 1]                  # (1, B) f32
    w_refs = refs[D + 2:D + 2 + n_layers]
    b_refs = refs[D + 2 + n_layers:D + 2 + 2 * n_layers]
    out_ref = refs[D + 2 + 2 * n_layers]
    lo_ext = refs[D + 2 + 2 * n_layers + 1]   # (S, Tc+8, B, X) scratch
    seg_ref = refs[D + 2 + 2 * n_layers + 2]  # (Tc, B) scratch
    d2_ext = refs[D + 2 + 2 * n_layers + 3]   # (S, Tc+8, B) scratch

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    wp = [_prep_ws_m(ws, m, dtype) for m in range(M)]
    kmax_row = kmax_ref[:][None, :, :]       # (1, 1, B)
    n_chunks = T // Tc

    out_ref[:] = jnp.zeros_like(out_ref)
    for s in range(S):
        lo_ext[s, pl.ds(0, 8), :, :] = jnp.zeros((8, B, X), jnp.float32)
        d2_ext[s, pl.ds(0, 8), :] = jnp.zeros((8, B), jnp.float32)

    ones_x = jnp.ones((1, 1, X), jnp.float32)

    def body(c, _):
        start = pl.multiple_of(c * Tc, 8)
        g_planes = [g_refs[d][pl.ds(start, Tc), :] for d in range(D)]
        draws = _gen_draws_f32(seed_ref, c, 2 * S, Tc, B, kmax_row)
        for s in range(S):
            d2_ext[s, pl.ds(8, Tc), :] = draws[S + s]
        d1_3 = [draws[s][:, :, None] * ones_x for s in range(S)]
        d2_3 = []
        for s in range(S):
            w2 = d2_ext[s, :, :]                     # (Tc+8, B)
            d2_3.append(w2[7:7 + Tc][:, :, None] * ones_x)
        los = [jnp.zeros((Tc, B, X), jnp.float32) for _ in range(S)]
        his = [jnp.zeros((Tc, B, X), jnp.float32) for _ in range(S)]
        for m in range(M):
            h1 = _first_layer(g_planes, ws[0][m], bs[0][m], dtype)
            x = _tail_layers(h1, ws, bs, m, dtype,
                             wpairs=wp[m]).reshape(Tc, B, X)
            fm = jnp.float32(m)
            for s in range(S):
                los[s] = los[s] + jnp.where(d1_3[s] == fm, x, 0.0)
                his[s] = his[s] + jnp.where(d2_3[s] == fm, x, 0.0)

        first_w = jnp.where(c == 0, 0.0, 1.0)
        seg_total = jnp.zeros((Tc, B), jnp.float32)
        for s in range(S):
            lo_ext[s, pl.ds(8, Tc), :, :] = los[s]
            le = lo_ext[s, :, :, :]                          # (Tc+8, B, X)
            diff = his[s] - le[7:7 + Tc]
            seg_total = seg_total + jnp.sum(diff * diff, axis=-1)
        seg_ref[:, :] = seg_total
        seg = seg_ref[:]
        total = jnp.sum(seg[1:], axis=0) + seg[0] * first_w
        out_ref[0, :] = out_ref[0, :] + total / S
        for s in range(S):
            lo_ext[s, 7, :, :] = lo_ext[s, 7 + Tc, :, :]
            d2_ext[s, 7, :] = d2_ext[s, 7 + Tc, :]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _bwd_kernel_rng(*refs, T, B, D, X, M, S, Tc, n_layers, dtype):
    """Sampled-energy backward with in-kernel draws: regenerates exactly the
    forward's draws per (block, chunk); both d1 and d2 carry one row between
    chunks (the halo segment c*Tc-1)."""
    g_refs = refs[:D]                     # D x (T+8, B) edge-padded planes
    seed_ref = refs[D]
    kmax_ref = refs[D + 1]
    ct_ref = refs[D + 2]
    w_refs = refs[D + 3:D + 3 + n_layers]
    b_refs = refs[D + 3 + n_layers:D + 3 + 2 * n_layers]
    dg_refs = refs[D + 3 + 2 * n_layers:D + 3 + 2 * n_layers + D]
    diffs = refs[D + 3 + 2 * n_layers + D]    # (S, Tc+8, B, X)
    d1_ext = refs[D + 3 + 2 * n_layers + D + 1]  # (S, Tc+8, B)
    d2_ext = refs[D + 3 + 2 * n_layers + D + 2]  # (S, Tc+8, B)

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    # slot 0 repurposed with f32 W1 rows for _backprop_chain's dgamma
    # contraction (same convention as energy_pallas._stats_bwd_kernel)
    wp = []
    for m in range(M):
        wm = _prep_ws_m(ws, m, dtype)
        wm[0] = [ws[0][m, d].astype(jnp.float32) for d in range(D)]
        wp.append(wm)
    kmax_row = kmax_ref[:][None, :, :]
    n_chunks = T // Tc
    ct = ct_ref[0, :]

    for s in range(S):
        d1_ext[s, pl.ds(0, 8), :] = jnp.zeros((8, B), jnp.float32)
        d2_ext[s, pl.ds(0, 8), :] = jnp.zeros((8, B), jnp.float32)

    def body(c, _):
        start = pl.multiple_of(c * Tc, 8)
        wins = [g_refs[d][pl.ds(start, Tc + 8), :] for d in range(D)]
        halo_planes = [w[0:Tc + 2, :] for w in wins]
        center_planes = [w[1:Tc + 1, :] for w in wins]

        draws = _gen_draws_f32(seed_ref, c, 2 * S, Tc, B, kmax_row)
        for s in range(S):
            d1_ext[s, pl.ds(8, Tc), :] = draws[s]
            d2_ext[s, pl.ds(8, Tc), :] = draws[S + s]

        # segments j = c*Tc-1+i for i = 0..Tc; valid iff 0 <= j <= T-2
        seg_ids = jax.lax.broadcasted_iota(jnp.int32, (Tc + 1, 1), 0) \
            + c * Tc - 1
        seg_valid = ((seg_ids >= 0) & (seg_ids <= T - 2)).astype(jnp.float32)

        ones_x = jnp.ones((1, 1, X), jnp.float32)
        dd1_3, dd2_3 = [], []
        dcur_3, dprev_3 = [], []
        x1s = [jnp.zeros((Tc + 1, B, X), jnp.float32) for _ in range(S)]
        x2s = [jnp.zeros((Tc + 1, B, X), jnp.float32) for _ in range(S)]
        for s in range(S):
            w1 = d1_ext[s, :, :]                     # (Tc+8, B)
            w2 = d2_ext[s, :, :]
            # ext row 7+i = segment c*Tc-1+i (the padded-plane layout's w[i])
            dd1_3.append(w1[7:7 + Tc + 1][:, :, None] * ones_x)
            dd2_3.append(w2[7:7 + Tc + 1][:, :, None] * ones_x)
            dcur_3.append(w1[8:8 + Tc][:, :, None] * ones_x)
            dprev_3.append(w2[7:7 + Tc][:, :, None] * ones_x)
        # pass 1 — the ONLY decode per decoder: gather the selected
        # endpoints AND keep each decoder's hidden-layer ReLU masks (bf16,
        # center rows) for the chain; pass 2 re-evaluates only the first
        # (VPU, MXU-free) layer — no tail-layer MXU recompute (see
        # energy_pallas._bwd_kernel; measured in
        # experiment/bwd_single_decode_probe.json)
        masks_c = []
        for m in range(M):
            h1 = _first_layer(halo_planes, ws[0][m], bs[0][m], dtype)
            xa_2d, acts = _tail_layers(h1, ws, bs, m, dtype, keep_acts=True,
                                       wpairs=wp[m])
            xa = xa_2d.reshape(Tc + 2, B, X)
            masks_c.append(_center_masks(acts, Tc, B))
            fm = jnp.float32(m)
            for s in range(S):
                x1s[s] = x1s[s] + jnp.where(dd1_3[s] == fm, xa[0:Tc + 1], 0.0)
                x2s[s] = x2s[s] + jnp.where(dd2_3[s] == fm, xa[1:Tc + 2], 0.0)
        for s in range(S):
            d_val = (x2s[s] - x1s[s]) * seg_valid[:, :, None]
            diffs[s, pl.ds(0, Tc + 8), :, :] = jnp.pad(
                d_val, ((0, 7), (0, 0), (0, 0)))

        scale = (2.0 / S) * ct[None, :, None]
        dgs = [jnp.zeros((Tc, B), jnp.float32) for _ in range(D)]
        dfs = [diffs[s, :, :, :] for s in range(S)]
        for m in range(M):
            fm = jnp.float32(m)
            dx = jnp.zeros((Tc, B, X), jnp.float32)
            for s in range(S):
                dx = dx - jnp.where(dcur_3[s] == fm, dfs[s][1:Tc + 1], 0.0) \
                    + jnp.where(dprev_3[s] == fm, dfs[s][0:Tc], 0.0)
            dx = dx * scale

            h1 = _first_layer(center_planes, ws[0][m], bs[0][m], dtype)
            # shared cotangent chain (single source of the rung policy:
            # single-pass under the reduced rungs — docs/NUMERICS.md)
            _backprop_chain_masked(dx, [(h1 > 0.0)] + masks_c[m], wp[m],
                                   dtype, Tc, B, n_layers, dgs)
        for d in range(D):
            dg_refs[d][pl.ds(start, Tc), :] = dgs[d]
        for s in range(S):
            d1_ext[s, 7, :] = d1_ext[s, 7 + Tc, :]
            d2_ext[s, 7, :] = d2_ext[s, 7 + Tc, :]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _build_rng(kind, T, B, Bb, D, X, M, S, Tc, n_layers, dtype, interpret,
               ws, bs):
    if interpret:
        # plain interpret mode has no rule for prng_seed/program_id; the TPU
        # interpret backend emulates them (PRNG yields zero bits — enough
        # for plumbing tests; sampling behavior is validated on hardware)
        interpret = pltpu.InterpretParams()
    n_blocks = B // Bb
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kmax_spec = pl.BlockSpec((1, Bb), lambda i: (0, i))
    if kind == "fwd":
        kernel = functools.partial(_fwd_kernel_rng, T=T, B=Bb, D=D, X=X, M=M,
                                   S=S, Tc=Tc, n_layers=n_layers, dtype=dtype)
        g_spec = pl.BlockSpec((T, Bb), lambda i: (0, i))
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
            in_specs=[g_spec] * D + [seed_spec, kmax_spec]
            + _specs_for(ws, bs),
            out_specs=pl.BlockSpec((1, Bb), lambda i: (0, i)),
            scratch_shapes=[pltpu.VMEM((S, Tc + 8, Bb, X), jnp.float32),
                            pltpu.VMEM((Tc, Bb), jnp.float32),
                            pltpu.VMEM((S, Tc + 8, Bb), jnp.float32)],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )
    kernel = functools.partial(_bwd_kernel_rng, T=T, B=Bb, D=D, X=X, M=M,
                               S=S, Tc=Tc, n_layers=n_layers, dtype=dtype)
    g_spec = pl.BlockSpec((T + 8, Bb), lambda i: (0, i))
    ct_spec = pl.BlockSpec((1, Bb), lambda i: (0, i))
    dg_spec = pl.BlockSpec((T, Bb), lambda i: (0, i))
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=[jax.ShapeDtypeStruct((T, B), jnp.float32)] * D,
        in_specs=[g_spec] * D + [seed_spec, kmax_spec, ct_spec]
        + _specs_for(ws, bs),
        out_specs=[dg_spec] * D,
        scratch_shapes=[
            pltpu.VMEM((S, Tc + 8, Bb, X), jnp.float32),
            pltpu.VMEM((S, Tc + 8, Bb), jnp.float32),
            pltpu.VMEM((S, Tc + 8, Bb), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def energy_mc_fused_rng(decoders, gamma, seed, kmax, mc_samples: int = 2,
                        precision: str = "float32"):
    """Fused sampled ensemble energy with IN-KERNEL decoder draws.

    seed: (1,) int32 — one per optimization step (derive from the step key);
    kmax: (1, B) f32 per-spline active-decoder counts (``jnp.full`` with the
    ensemble size for the uniform case).  Returns (B,).  Differentiable in
    gamma only.  TPU-only — off-TPU use :func:`energy_mc_fused` with
    host-generated indices (interpret-mode PRNG yields zero bits).
    """
    e, _ = _fwd_impl_rng(decoders, gamma, seed, kmax, mc_samples, precision)
    return e


def _fwd_impl_rng(decoders, gamma, seed, kmax, mc_samples, precision):
    T, B, B_pad, Bb, D, X, M, Tc, ws, bs = _common(decoders, gamma)
    check_precision(precision)
    ship = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    gamma_p = _pad_b(gamma, B_pad, axis=1)
    kmax_p = _pad_b(jnp.asarray(kmax, jnp.float32).reshape(1, B), B_pad,
                    axis=1)
    fwd = _build_rng("fwd", T, B_pad, Bb, D, X, M, mc_samples, Tc, len(ws),
                     precision, not _is_tpu(), ws, bs)
    out = fwd(*_gamma_planes(gamma_p), jnp.asarray(seed, jnp.int32).reshape(1),
              kmax_p, *_cast_ws(ws, ship), *bs)
    return out[0, :B], (decoders, gamma, seed, kmax)


def _fwd_rule_rng(decoders, gamma, seed, kmax, mc_samples, precision):
    return _fwd_impl_rng(decoders, gamma, seed, kmax, mc_samples, precision)


def _bwd_rule_rng(mc_samples, precision, res, ct):
    decoders, gamma, seed, kmax = res
    T, B, B_pad, Bb, D, X, M, Tc, ws, bs = _common(decoders, gamma)
    ship = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    gamma_p = _pad_b(gamma, B_pad, axis=1)
    kmax_p = _pad_b(jnp.asarray(kmax, jnp.float32).reshape(1, B), B_pad,
                    axis=1)
    ct_p = _pad_b(ct.reshape(1, B).astype(jnp.float32), B_pad, axis=1)
    if B_pad != B:
        lane = jnp.arange(B_pad)[None, :] < B
        ct_p = ct_p * lane.astype(jnp.float32)
    bwd = _build_rng("bwd", T, B_pad, Bb, D, X, M, mc_samples, Tc, len(ws),
                     precision, not _is_tpu(), ws, bs)
    dplanes = bwd(*_gamma_planes_padded(gamma_p),
                  jnp.asarray(seed, jnp.int32).reshape(1), kmax_p, ct_p,
                  *_cast_ws(ws, ship), *bs)
    dgamma = jnp.stack(dplanes, axis=-1)[:, :B]
    zeros_dec = jax.tree_util.tree_map(jnp.zeros_like, decoders)
    return (zeros_dec, dgamma, jnp.zeros_like(jnp.asarray(seed)),
            jnp.zeros_like(jnp.asarray(kmax)))


energy_mc_fused_rng.defvjp(_fwd_rule_rng, _bwd_rule_rng)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def energy_mc_fused_rng_grad(decoders, gamma, seed, kmax,
                             mc_samples: int = 2,
                             precision: str = "float32"):
    """GRADIENT-ONLY variant of :func:`energy_mc_fused_rng`: zero primal,
    identical backward (the bwd kernel redraws the same in-kernel decoder
    indices from ``seed`` and recomputes activations — the forward kernel
    contributes nothing to the gradient).  Use only where the energy value
    is discarded; see ``energy_pallas.energy_expected_fused_grad``."""
    check_precision(precision)
    return jnp.zeros((gamma.shape[1],), jnp.float32)


def _gradonly_fwd_rng(decoders, gamma, seed, kmax, mc_samples, precision):
    check_precision(precision)
    return (jnp.zeros((gamma.shape[1],), jnp.float32),
            (decoders, gamma, seed, kmax))


energy_mc_fused_rng_grad.defvjp(_gradonly_fwd_rng, _bwd_rule_rng)


def _fwd_kernel(*refs, T, B, D, X, M, S, Tc, n_layers, dtype):
    """Sampled-energy forward.

    Streams per-sample *selected* planes instead of materializing all M
    decoder outputs: for each decoder m (output held in registers), the
    (d == m) masks accumulate
      lo[s](t) = x_{d1[s,t]}(t)        (segment t's left endpoint)
      hi[s](t) = x_{d2[s,t-1]}(t)      (segment t-1's right endpoint)
    and the segment energy is ||hi[s](t+1) - lo[s](t)||^2, assembled with a
    one-row carry on lo (same ext-buffer trick as the expected kernel).
    This removes the (M, Tc, B, X) scratch write + M-fold re-read of the
    previous design — scratch traffic scales with S (=2), not M (=10).
    """
    g_refs = refs[:D]
    d1_ref, d2_ref = refs[D], refs[D + 1]   # d1: raw cols; d2: +1 dummy col
    w_refs = refs[D + 2:D + 2 + n_layers]
    b_refs = refs[D + 2 + n_layers:D + 2 + 2 * n_layers]
    out_ref = refs[D + 2 + 2 * n_layers]
    lo_ext = refs[D + 2 + 2 * n_layers + 1]   # (S, Tc+8, B, X) scratch
    seg_ref = refs[D + 2 + 2 * n_layers + 2]  # (Tc, B) scratch

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    wp = [_prep_ws_m(ws, m, dtype) for m in range(M)]  # split once
    n_chunks = T // Tc

    out_ref[:] = jnp.zeros_like(out_ref)
    for s in range(S):
        lo_ext[s, pl.ds(0, 8), :, :] = jnp.zeros((8, B, X), jnp.float32)

    ones_x = jnp.ones((1, 1, X), jnp.float32)

    def body(c, _):
        start = pl.multiple_of(c * Tc, 8)
        g_planes = [g_refs[d][pl.ds(start, Tc), :] for d in range(D)]
        # broadcast each index plane to the 3D (lane = X) layout ONCE per
        # (sample, side); the per-decoder compares then stay in-layout.
        # (Per-decoder 2D->3D mask relayouts measured 3.7 ms of a 5.7 ms
        # forward at the reference workload — experiment/mc_fwd_variants.py.)
        d1_3 = [d1_ref[s, pl.ds(start, Tc), :]
                .astype(jnp.float32)[:, :, None] * ones_x for s in range(S)]
        d2_3 = [d2_ref[s, pl.ds(start, Tc), :]
                .astype(jnp.float32)[:, :, None] * ones_x for s in range(S)]
        los = [jnp.zeros((Tc, B, X), jnp.float32) for _ in range(S)]
        his = [jnp.zeros((Tc, B, X), jnp.float32) for _ in range(S)]
        for m in range(M):
            h1 = _first_layer(g_planes, ws[0][m], bs[0][m], dtype)
            x = _tail_layers(h1, ws, bs, m, dtype,
                             wpairs=wp[m]).reshape(Tc, B, X)
            fm = jnp.float32(m)
            for s in range(S):
                los[s] = los[s] + jnp.where(d1_3[s] == fm, x, 0.0)
                his[s] = his[s] + jnp.where(d2_3[s] == fm, x, 0.0)

        first_w = jnp.where(c == 0, 0.0, 1.0)
        seg_total = jnp.zeros((Tc, B), jnp.float32)
        for s in range(S):
            lo_ext[s, pl.ds(8, Tc), :, :] = los[s]
            le = lo_ext[s, :, :, :]                          # (Tc+8, B, X)
            diff = his[s] - le[7:7 + Tc]
            seg_total = seg_total + jnp.sum(diff * diff, axis=-1)
        # roundtrip through scratch: the offset value-slice below needs a
        # concrete (non-implicit-dim) layout, which a scratch read provides
        seg_ref[:, :] = seg_total
        seg = seg_ref[:]
        # row j carries segment j-1; row 0 of chunk 0 is not a segment
        total = jnp.sum(seg[1:], axis=0) + seg[0] * first_w
        out_ref[0, :] = out_ref[0, :] + total / S
        for s in range(S):
            lo_ext[s, 7, :, :] = lo_ext[s, 7 + Tc, :, :]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _bwd_kernel(*refs, T, B, D, X, M, S, Tc, n_layers, dtype):
    """Sampled-energy backward.  Pass 1 decodes the halo rows once per
    decoder, accumulating the per-sample selected endpoints (x1, x2) on the
    fly — the (M, Tc, B, X) materialization of the previous design is gone;
    only the S segment-difference planes hit scratch.  Pass 2 recomputes
    center activations per decoder and backprops the masked cotangents."""
    g_refs = refs[:D]                     # D x (T+8, B) edge-padded planes
    d1_ref, d2_ref = refs[D], refs[D + 1]  # (S, T+8, B)
    ct_ref = refs[D + 2]
    w_refs = refs[D + 3:D + 3 + n_layers]
    b_refs = refs[D + 3 + n_layers:D + 3 + 2 * n_layers]
    dg_refs = refs[D + 3 + 2 * n_layers:D + 3 + 2 * n_layers + D]
    diffs = refs[D + 3 + 2 * n_layers + D]  # (S, Tc+8, B, X)

    ws = [w_refs[i][:] for i in range(n_layers)]
    bs = [b_refs[i][:] for i in range(n_layers)]
    # slot 0 repurposed with f32 W1 rows for _backprop_chain's dgamma
    # contraction (same convention as energy_pallas._stats_bwd_kernel)
    wp = []
    for m in range(M):
        wm = _prep_ws_m(ws, m, dtype)
        wm[0] = [ws[0][m, d].astype(jnp.float32) for d in range(D)]
        wp.append(wm)
    n_chunks = T // Tc
    ct = ct_ref[0, :]

    def body(c, _):
        start = pl.multiple_of(c * Tc, 8)
        wins = [g_refs[d][pl.ds(start, Tc + 8), :] for d in range(D)]
        halo_planes = [w[0:Tc + 2, :] for w in wins]
        center_planes = [w[1:Tc + 1, :] for w in wins]

        # segments j = c*Tc-1+i for i = 0..Tc; valid iff 0 <= j <= T-2
        seg_ids = jax.lax.broadcasted_iota(jnp.int32, (Tc + 1, 1), 0) \
            + c * Tc - 1
        seg_valid = ((seg_ids >= 0) & (seg_ids <= T - 2)).astype(jnp.float32)

        ones_x = jnp.ones((1, 1, X), jnp.float32)
        # one 2D->3D broadcast per (sample, side); per-decoder compares stay
        # in-layout (see the forward kernel note)
        dd1_3, dd2_3 = [], []
        x1s = [jnp.zeros((Tc + 1, B, X), jnp.float32) for _ in range(S)]
        x2s = [jnp.zeros((Tc + 1, B, X), jnp.float32) for _ in range(S)]
        for s in range(S):
            w1 = d1_ref[s, pl.ds(start, Tc + 8), :]
            w2 = d2_ref[s, pl.ds(start, Tc + 8), :]
            dd1_3.append(w1[0:Tc + 1, :].astype(jnp.float32)[:, :, None]
                         * ones_x)
            dd2_3.append(w2[0:Tc + 1, :].astype(jnp.float32)[:, :, None]
                         * ones_x)
        # pass 1 — the ONLY decode per decoder (see energy_pallas
        # _bwd_kernel): gather selected endpoints + keep hidden-layer ReLU
        # masks (bf16, center rows) for the chain
        masks_c = []
        for m in range(M):
            h1 = _first_layer(halo_planes, ws[0][m], bs[0][m], dtype)
            xa_2d, acts = _tail_layers(h1, ws, bs, m, dtype, keep_acts=True,
                                       wpairs=wp[m])
            xa = xa_2d.reshape(Tc + 2, B, X)
            masks_c.append(_center_masks(acts, Tc, B))
            fm = jnp.float32(m)
            for s in range(S):
                x1s[s] = x1s[s] + jnp.where(dd1_3[s] == fm, xa[0:Tc + 1], 0.0)
                x2s[s] = x2s[s] + jnp.where(dd2_3[s] == fm, xa[1:Tc + 2], 0.0)
        for s in range(S):
            d_val = (x2s[s] - x1s[s]) * seg_valid[:, :, None]
            diffs[s, pl.ds(0, Tc + 8), :, :] = jnp.pad(
                d_val, ((0, 7), (0, 0), (0, 0)))

        scale = (2.0 / S) * ct[None, :, None]
        dgs = [jnp.zeros((Tc, B), jnp.float32) for _ in range(D)]
        # hoist the index-window broadcasts and diff reads out of the m loop
        dcur_3, dprev_3, dfs = [], [], []
        for s in range(S):
            w1 = d1_ref[s, pl.ds(start, Tc + 8), :]
            w2 = d2_ref[s, pl.ds(start, Tc + 8), :]
            dcur_3.append(w1[1:Tc + 1, :].astype(jnp.float32)[:, :, None]
                          * ones_x)                          # col of seg t
            dprev_3.append(w2[0:Tc, :].astype(jnp.float32)[:, :, None]
                           * ones_x)                         # col of seg t-1
            dfs.append(diffs[s, :, :, :])
        for m in range(M):
            fm = jnp.float32(m)
            dx = jnp.zeros((Tc, B, X), jnp.float32)
            for s in range(S):
                dx = dx - jnp.where(dcur_3[s] == fm, dfs[s][1:Tc + 1], 0.0) \
                    + jnp.where(dprev_3[s] == fm, dfs[s][0:Tc], 0.0)
            dx = dx * scale

            h1 = _first_layer(center_planes, ws[0][m], bs[0][m], dtype)
            # shared cotangent chain (single source of the rung policy:
            # single-pass under the reduced rungs — docs/NUMERICS.md)
            _backprop_chain_masked(dx, [(h1 > 0.0)] + masks_c[m], wp[m],
                                   dtype, Tc, B, n_layers, dgs)
        for d in range(D):
            dg_refs[d][pl.ds(start, Tc), :] = dgs[d]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _build(kind, T, B, Bb, D, X, M, S, Tc, n_layers, dtype, interpret, ws, bs):
    n_blocks = B // Bb
    if kind == "fwd":
        kernel = functools.partial(_fwd_kernel, T=T, B=Bb, D=D, X=X, M=M, S=S,
                                   Tc=Tc, n_layers=n_layers, dtype=dtype)
        g_spec = pl.BlockSpec((T, Bb), lambda i: (0, i))
        idx_spec = pl.BlockSpec((S, T, Bb), lambda i: (0, 0, i))
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
            in_specs=[g_spec] * D + [idx_spec] * 2 + _specs_for(ws, bs),
            out_specs=pl.BlockSpec((1, Bb), lambda i: (0, i)),
            scratch_shapes=[pltpu.VMEM((S, Tc + 8, Bb, X), jnp.float32),
                            pltpu.VMEM((Tc, Bb), jnp.float32)],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )
    kernel = functools.partial(_bwd_kernel, T=T, B=Bb, D=D, X=X, M=M, S=S,
                               Tc=Tc, n_layers=n_layers, dtype=dtype)
    g_spec = pl.BlockSpec((T + 8, Bb), lambda i: (0, i))
    idx_spec = pl.BlockSpec((S, T + 8, Bb), lambda i: (0, 0, i))
    ct_spec = pl.BlockSpec((1, Bb), lambda i: (0, i))
    dg_spec = pl.BlockSpec((T, Bb), lambda i: (0, i))
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=[jax.ShapeDtypeStruct((T, B), jnp.float32)] * D,
        in_specs=[g_spec] * D + [idx_spec] * 2 + [ct_spec]
        + _specs_for(ws, bs),
        out_specs=[dg_spec] * D,
        scratch_shapes=[
            pltpu.VMEM((S, Tc + 8, Bb, X), jnp.float32),
        ],
        compiler_params=_compiler_params(),
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
    from vae_latent_geometry_tpu.ops.energy_pallas import (
        _MAX_BB_MC,
        _TARGET_ROWS_MC,
    )

    B_pad = _round_up(B, 8)
    Bb = _pick_bb(B_pad, _MAX_BB_MC)
    B_pad = _round_up(B_pad, Bb)
    # Tc >= 16 keeps offset value-slices at >= 8 sublanes (Mosaic limit).
    # _TARGET_ROWS_MC = 2048 (not 4096): the MC backward's per-decoder
    # multi-pass temporaries at float32 overflow the scoped-VMEM stack at
    # 4096-row chunks (measured at T=256, B=16 -> Tc=T); every tuned
    # configuration (T=2000) already lands on 2048-row chunks.  The shared
    # constant keeps fused_fits validating with the same value.
    Tc = _pick_chunk(T, Bb, target_rows=_TARGET_ROWS_MC)
    from vae_latent_geometry_tpu.ops.energy_pallas import _check_tc

    _check_tc(T, Bb, Tc)
    return T, B, B_pad, Bb, D, X, M, Tc, ws, bs


def _fwd_impl(decoders, gamma, d1, d2, precision):
    T, B, B_pad, Bb, D, X, M, Tc, ws, bs = _common(decoders, gamma)
    S = d1.shape[0]
    check_precision(precision)
    ship = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    gamma_p = _pad_b(gamma, B_pad, axis=1)
    fwd = _build("fwd", T, B_pad, Bb, D, X, M, S, Tc, len(ws), precision,
                 not _is_tpu(), ws, bs)
    # fwd index layouts: d1 raw (segment t at column t, for lo(t)); d2 with
    # one leading dummy (segment t-1 at column t, for hi(t))
    out = fwd(*_gamma_planes(gamma_p),
              _pad_b(_pad_indices_raw(d1), B_pad, axis=2),
              _pad_b(_pad_indices(d2), B_pad, axis=2),
              *_cast_ws(ws, ship), *bs)
    return out[0, :B], (decoders, gamma, d1, d2)


def _fwd_rule(decoders, gamma, d1, d2, precision):
    e, res = _fwd_impl(decoders, gamma, d1, d2, precision)
    return e, res


def _bwd_rule(precision, res, ct):
    decoders, gamma, d1, d2 = res
    T, B, B_pad, Bb, D, X, M, Tc, ws, bs = _common(decoders, gamma)
    S = d1.shape[0]
    ship = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    gamma_p = _pad_b(gamma, B_pad, axis=1)
    ct_p = _pad_b(ct.reshape(1, B).astype(jnp.float32), B_pad, axis=1)
    if B_pad != B:
        lane = jnp.arange(B_pad)[None, :] < B
        ct_p = ct_p * lane.astype(jnp.float32)
    bwd = _build("bwd", T, B_pad, Bb, D, X, M, S, Tc, len(ws), precision,
                 not _is_tpu(), ws, bs)
    dplanes = bwd(*_gamma_planes_padded(gamma_p),
                  _pad_b(_pad_indices(d1, trailing=8), B_pad, axis=2),
                  _pad_b(_pad_indices(d2, trailing=8), B_pad, axis=2),
                  ct_p, *_cast_ws(ws, ship), *bs)
    dgamma = jnp.stack(dplanes, axis=-1)[:, :B]
    zeros_dec = jax.tree_util.tree_map(jnp.zeros_like, decoders)
    return (zeros_dec, dgamma, jnp.zeros_like(d1), jnp.zeros_like(d2))


energy_mc_fused.defvjp(_fwd_rule, _bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def energy_mc_fused_grad(decoders, gamma, d1, d2,
                         precision: str = "float32"):
    """GRADIENT-ONLY variant of :func:`energy_mc_fused`: zero primal,
    identical backward (the bwd kernel gathers the same host-generated
    index planes and recomputes activations).  Use only where the energy
    value is discarded; see ``energy_pallas.energy_expected_fused_grad``."""
    check_precision(precision)
    return jnp.zeros((gamma.shape[1],), jnp.float32)


def _gradonly_fwd(decoders, gamma, d1, d2, precision):
    check_precision(precision)
    return (jnp.zeros((gamma.shape[1],), jnp.float32),
            (decoders, gamma, d1, d2))


energy_mc_fused_grad.defvjp(_gradonly_fwd, _bwd_rule)
