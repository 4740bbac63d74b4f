"""Curve-energy functionals under the decoder pullback metric.

Four estimators of E(gamma) for curves decoded through one or many decoders:

- ``energy_single``: discrete first-difference energy through one decoder,
  sum_i ||f(g_{i+1}) - f(g_i)||^2  (reference
  ``src/single_decoder/optimize_energy_batched.py:51-57``).
- ``energy_mc``: the reference's Monte-Carlo ensemble estimator — decode the
  curve with all M_dec decoders, then for each of M samples draw independent
  decoder indices d1, d2 per (segment, spline) and average
  sum_i ||f_{d2}(g_{i+1}) - f_{d1}(g_i)||^2  (``src/optimize.py:38-75``).
- ``energy_expected``: the *exact expectation* of the MC estimator over the
  uniform decoder-pair draw, in closed form:
     E = sum_i [ mean_d ||x_{d,i+1}||^2 + mean_d ||x_{d,i}||^2
                 - 2 <xbar_{i+1}, xbar_i> ]
  Deterministic, smoother, and O(M_dec) instead of O(M * gathers) — the
  TPU-native production path (MC mode kept for reference parity).
- ``energy_jvp``: quadrature of the exact Riemannian energy
  ||J_f(g(t)) g'(t)||^2 via decoder JVPs (the done-right version of the
  reference's dead exact-pullback code, ``src/old_/jacobian_smgs.py:1-30``),
  scaled by dt^2 so it converges to the discrete estimators as T grows.

All functions take already-evaluated curve points ``gamma`` of shape (T, B, D)
and stacked decoder params, and return per-spline energies (B,).  Decoders are
rematerialized (``jax.checkpoint``) in the ensemble paths so the backward pass
never stores the (M_dec, T, B, hidden) activations.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vae_latent_geometry_tpu.models import nets
from vae_latent_geometry_tpu.models.evae import decode_all


def _decode_mean(decoder_params, gamma):
    """(T, B, D) -> (T, B, X) through a single decoder mean head."""
    return nets.decoder_apply(decoder_params, gamma)


def energy_single(decoder_params, gamma):
    """Discrete energy through one decoder.  gamma: (T, B, D) -> (B,)."""
    x = _decode_mean(decoder_params, gamma)
    diffs = x[1:] - x[:-1]
    return jnp.sum(diffs * diffs, axis=(0, 2))


def geodesic_lengths(decoder_params, gamma):
    """Data-space curve length sum_i ||f(g_{i+1}) - f(g_i)|| -> (B,)
    (reference ``optimize_energy_batched.py:42-49``)."""
    x = _decode_mean(decoder_params, gamma)
    diffs = x[1:] - x[:-1]
    return jnp.sum(jnp.linalg.norm(diffs, axis=2), axis=0)


def arc_lengths(gamma):
    """Latent-space curve length (reference ``optimize_energy.py:167-172``)."""
    diffs = gamma[1:] - gamma[:-1]
    return jnp.sum(jnp.linalg.norm(diffs, axis=2), axis=0)


def _decode_ensemble(decoders, gamma):
    """(T, B, D) -> (M_dec, T, B, X), rematerialized under autodiff."""
    return jax.checkpoint(lambda g: decode_all(decoders, g))(gamma)


def energy_mc(decoders, gamma, key, mc_samples: int = 2, num_active=None):
    """Reference MC ensemble estimator (``src/optimize.py:38-75``).

    Per MC sample, d1/d2 ~ U[0, M_dec) independently per (segment, spline);
    segment term ||x_{d2, i+1} - x_{d1, i}||^2.  Decoder means only.

    ``num_active``: optional (B,) int — per-spline count k of active decoders;
    indices are drawn from U[0, k_b).  This lets a single batch mix different
    ensemble subsets (the CoV sweep over decoder counts,
    ``src/eval.py:112-126``, becomes one batched optimization instead of a
    serial loop).  Returns per-spline energies (B,).
    """
    decoded = _decode_ensemble(decoders, gamma)        # (M_dec, T, B, X)
    m_dec, T, B, X = decoded.shape
    x_lo = decoded[:, :-1]                             # (M_dec, T-1, B, X)
    x_hi = decoded[:, 1:]
    maxval = (jnp.broadcast_to(jnp.asarray(num_active, jnp.int32), (B,))
              if num_active is not None else m_dec)

    def one_sample(k):
        k1, k2 = jax.random.split(k)
        d1 = jax.random.randint(k1, (T - 1, B), 0, maxval)
        d2 = jax.random.randint(k2, (T - 1, B), 0, maxval)
        # One-hot contraction instead of gather: maps onto the VPU cleanly and
        # keeps everything dense/static-shaped.
        oh1 = jax.nn.one_hot(d1, m_dec, dtype=decoded.dtype)  # (T-1, B, M)
        oh2 = jax.nn.one_hot(d2, m_dec, dtype=decoded.dtype)
        x1 = jnp.einsum("tbm,mtbx->tbx", oh1, x_lo)
        x2 = jnp.einsum("tbm,mtbx->tbx", oh2, x_hi)
        d = x2 - x1
        return jnp.sum(d * d, axis=(0, 2))             # (B,)

    keys = jax.random.split(key, mc_samples)
    energies = jax.vmap(one_sample)(keys)              # (M, B)
    return jnp.mean(energies, axis=0)


def energy_mc_scan(decoders, gamma, key, mc_samples: int = 2,
                   num_active=None, chunk: int = 125):
    """Memory-flat MC estimator: identical distribution to :func:`energy_mc`
    but streams the T axis in chunks with a one-row carry, so the
    (M_dec, T, B, X) decoded tensor never materializes (the blockwise
    analogue of chunked attention; working set is (M_dec, chunk, B, X)).

    The random stream differs from :func:`energy_mc` (per-chunk key folds);
    both match the reference's estimator in distribution only — torch's
    global-RNG draws are not reproducible in JAX anyway (SURVEY §7).
    """
    T, B, D = gamma.shape
    m_dec = jax.tree_util.tree_leaves(decoders)[0].shape[0]
    maxval = (jnp.broadcast_to(jnp.asarray(num_active, jnp.int32), (B,))
              if num_active is not None else
              jnp.full((B,), m_dec, jnp.int32))
    # largest divisor of T <= requested chunk; degenerate cases fall back
    chunk = max((c for c in range(1, min(chunk, T) + 1) if T % c == 0),
                default=1)
    if chunk <= 1:
        return energy_mc(decoders, gamma, key, mc_samples, num_active)
    n_chunks = T // chunk
    gamma_chunks = gamma.reshape(n_chunks, chunk, B, D)

    def body(carry, inp):
        prev_x, acc, valid_prev = carry       # prev_x: (M, B, X)
        gc, ck = inp
        xc = decode_all(decoders, gc)          # (M, chunk, B, X)
        x_ext = jnp.concatenate([prev_x[:, None], xc], axis=1)  # (M, c+1, B, X)

        def one_sample(k):
            k1, k2 = jax.random.split(k)
            d1 = jax.random.randint(k1, (chunk, B), 0, maxval)
            d2 = jax.random.randint(k2, (chunk, B), 0, maxval)
            oh1 = jax.nn.one_hot(d1, m_dec, dtype=xc.dtype)
            oh2 = jax.nn.one_hot(d2, m_dec, dtype=xc.dtype)
            x1 = jnp.einsum("tbm,mtbx->tbx", oh1, x_ext[:, :-1])
            x2 = jnp.einsum("tbm,mtbx->tbx", oh2, x_ext[:, 1:])
            d = x2 - x1
            seg = jnp.sum(d * d, axis=2)       # (chunk, B)
            # first segment invalid on the very first chunk
            w = jnp.concatenate([valid_prev[None], jnp.ones((chunk - 1, 1))])
            return jnp.sum(seg * w, axis=0)

        e = jnp.mean(jax.vmap(one_sample)(jax.random.split(ck, mc_samples)),
                     axis=0)
        return (xc[:, -1], acc + e, jnp.ones((1,))), None

    body = jax.checkpoint(body)
    prev0 = jnp.zeros((m_dec, B, _out_dim(decoders)), gamma.dtype)
    keys = jax.random.split(key, n_chunks)
    (_, energy, _), _ = jax.lax.scan(
        body, (prev0, jnp.zeros((B,), gamma.dtype), jnp.zeros((1,))),
        (gamma_chunks, keys),
    )
    return energy


def _out_dim(decoders) -> int:
    return decoders["layers"][-1]["w"].shape[-1]


def _ensemble_stats(decoded, num_active=None):
    """Sufficient statistics of an ensemble decode: ``decoded`` (M, T, B, X)
    -> (xbar (T, B, X), var (T, B)) where var_t = mean_d ||x_{d,t} - xbar_t||^2.

    ``num_active``: optional (B,) int — masked means over the first k_b
    decoders per spline (the CoV k-sweep).  Shared by every expected-family
    estimator so the masked-mean weighting has exactly one implementation."""
    m_dec, _, B, _ = decoded.shape
    if num_active is None:
        xbar = jnp.mean(decoded, axis=0)               # (T, B, X)
        dev = decoded - xbar[None]
        var = jnp.mean(jnp.sum(dev * dev, axis=-1), axis=0)          # (T, B)
    else:
        k = jnp.broadcast_to(jnp.asarray(num_active, jnp.int32), (B,))
        mask = (jnp.arange(m_dec)[:, None] < k[None, :]).astype(decoded.dtype)
        w = mask / k.astype(decoded.dtype)[None, :]    # (M, B) mean weights
        xbar = jnp.einsum("mb,mtbx->tbx", w, decoded)
        dev = decoded - xbar[None]
        var = jnp.einsum("mb,mtb->tb", w, jnp.sum(dev * dev, axis=-1))
    return xbar, var


def energy_expected(decoders, gamma, num_active=None):
    """Closed-form expectation of :func:`energy_mc` over decoder draws.

    Per segment,
      E_{d1,d2} ||x_{d2,i+1} - x_{d1,i}||^2
        = ||xbar_{i+1} - xbar_i||^2 + var_{i+1} + var_i,
    with var_t = mean_d ||x_{d,t} - xbar_t||^2 (the decoder-disagreement
    term).  This *centered* form is used instead of the algebraically equal
    ``sq_{i+1} + sq_i - 2<xbar_{i+1}, xbar_i>``: the latter subtracts
    near-equal large numbers (||x||^2 >> segment differences) and loses up to
    ~3% relative accuracy in float32 at num_active=1, where the true variance
    is exactly zero (verified against a float64 reference).

    ``num_active``: optional (B,) int — restrict the expectation to the first
    k_b decoders per spline (masked means).
    """
    decoded = _decode_ensemble(decoders, gamma)        # (M, T, B, X)
    xbar, var = _ensemble_stats(decoded, num_active)
    step = xbar[1:] - xbar[:-1]                        # (T-1, B, X)
    seg = jnp.sum(step * step, axis=-1) + var[1:] + var[:-1]
    return jnp.sum(seg, axis=0)


def energy_jvp(decoder_params, gamma, gamma_dot):
    """Quadrature JVP energy through one decoder.

    sum_i ||J_f(g_i) g'(g_i)||^2 * dt^2  with dt = 1/(T-1), matching the
    magnitude of the discrete estimators as T -> infinity.
    gamma, gamma_dot: (T, B, D) -> (B,).
    """
    T = gamma.shape[0]
    dt = 1.0 / (T - 1)

    def jvp_at(g, gdot):
        _, tangent = jax.jvp(lambda z: nets.decoder_apply(decoder_params, z),
                             (g,), (gdot,))
        return tangent

    tangents = jvp_at(gamma, gamma_dot)                # (T, B, X)
    sq = jnp.sum(tangents * tangents, axis=-1)         # (T, B)
    # Trapezoid quadrature of the Riemannian energy integral, then one more
    # dt to land in discrete-estimator units:  E_disc ~ dt^2 sum ||J gdot||^2
    # ~ dt * Int ||J gdot||^2 dt.  (Riemannian energy = result * (T-1).)
    w = jnp.ones((T,), gamma.dtype).at[0].set(0.5).at[-1].set(0.5)
    return jnp.sum(sq * w[:, None], axis=0) * dt * dt


def energy_jvp_ensemble(decoders, gamma, gamma_dot,
                        target_num_t: Optional[int] = None,
                        num_active=None):
    """Expected ensemble energy in the T->inf limit, split into a JVP
    quadrature term (mean over decoders) and a decoder-disagreement term.

    From the expansion of :func:`energy_expected` per segment:
        mean_d ||x_{d,i+1} - xbar_{i+1}||^2 + mean_d ||x_{d,i} - xbar_i||^2
        + ||xbar_{i+1} - xbar_i||^2
    the last term -> JVP quadrature of the mean decoder, the first two are the
    O(1) ensemble variance that does not vanish with T.

    ``target_num_t``: quadrature-transfer rescaling — the north-star lever
    (BASELINE.json: "curve-energy functional evaluated via decoder JVPs").
    The two terms of the T-point expected energy scale oppositely in T:
        smooth       S(T) = sum_i ||xbar_{i+1} - xbar_i||^2
                          ~ dt * Int ||J_xbar gdot||^2     (prop. to 1/T)
        disagreement D(T) = sum_i (var_{i+1} + var_i)
                          ~ 2 (T-1) * Int var              (prop. to T)
    so an estimate of E(T_target) needs only enough points to resolve the two
    INTEGRALS — not T_target points.  With r = (T_tgt - 1)/(T_loc - 1):
        E(T_tgt) ~ (1/r) * jvp_term(T_loc) + r * D(T_loc).
    The JVP form (exact metric at the sampled points) has no secant error, so
    the local grid can be coarse where a first-difference estimator could
    not.  ``None`` keeps the same-T semantics (r = 1): the drop-in smoother
    sibling of :func:`energy_expected`.

    ``num_active``: optional (B,) int — restrict both terms to the first k_b
    decoders per spline (masked means, same semantics as
    :func:`energy_expected`'s): the variance through :func:`_ensemble_stats`
    and the JVP through the masked-mean decoder.

    Done-right version of the reference's dead exact-pullback energy,
    ``src/old_/jacobian_smgs.py:1-30``.
    """
    decoded = _decode_ensemble(decoders, gamma)        # (M, T, B, X)
    _, var = _ensemble_stats(decoded, num_active)      # (T, B)
    disagreement = jnp.sum(var[1:] + var[:-1], axis=0)

    if num_active is None:
        def mean_decode(z):
            return jnp.mean(decode_all(decoders, z), axis=0)
    else:
        m_dec, _, B, _ = decoded.shape
        k = jnp.broadcast_to(jnp.asarray(num_active, jnp.int32), (B,))
        mask = (jnp.arange(m_dec)[:, None] < k[None, :]).astype(gamma.dtype)
        wm = mask / k.astype(gamma.dtype)[None, :]     # (M, B) mean weights

        def mean_decode(z):
            return jnp.einsum("mb,mtbx->tbx", wm, decode_all(decoders, z))

    _, tangents = jax.jvp(mean_decode, (gamma,), (gamma_dot,))
    T = gamma.shape[0]
    dt = 1.0 / (T - 1)
    w = jnp.ones((T,), gamma.dtype).at[0].set(0.5).at[-1].set(0.5)
    jvp_term = (
        jnp.sum(jnp.sum(tangents * tangents, axis=-1) * w[:, None], axis=0) * dt * dt
    )
    if target_num_t is None:
        return jvp_term + disagreement
    r = (target_num_t - 1) / (T - 1)
    return jvp_term / r + disagreement * r


def energy_expected_rescaled(decoders, gamma, target_num_t: int,
                             num_active=None):
    """Control arm for the quadrature-transfer study: the same
    smooth/disagreement T-rescaling as :func:`energy_jvp_ensemble`'s
    ``target_num_t``, but with the smooth term estimated by first differences
    (secants) on the local grid instead of exact JVPs.  Isolates how much of
    the transfer quality comes from the exact metric vs from the rescaling
    alone (experiment/jvp_quadrature_study.json)."""
    decoded = _decode_ensemble(decoders, gamma)        # (M, T, B, X)
    T = gamma.shape[0]
    xbar, var = _ensemble_stats(decoded, num_active)
    step = xbar[1:] - xbar[:-1]
    smooth = jnp.sum(jnp.sum(step * step, axis=-1), axis=0)
    disagreement = jnp.sum(var[1:] + var[:-1], axis=0)
    r = (target_num_t - 1) / (T - 1)
    return smooth / r + disagreement * r
