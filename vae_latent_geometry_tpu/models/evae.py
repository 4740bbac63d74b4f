"""Ensemble VAE: shared Gaussian encoder + a *stacked* decoder ensemble.

The reference keeps N decoders in an ``nn.ModuleList`` and python-loops over
them (``src/train.py:48-65``, ``src/optimize.py:50``).  Here the ensemble is a
single pytree whose every leaf carries a leading decoder axis, so

- "decode with all decoders" is one ``vmap`` (one batched MXU matmul chain),
- expert-parallelism is plain axis sharding of that leading axis over a mesh.

ELBO semantics match the reference (``src/train.py:56-62``): one-sample
reparameterized z, a single randomly chosen decoder per batch, fixed
observation noise sigma, and a Monte-Carlo KL  log q(z) - log p(z).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from vae_latent_geometry_tpu.config import ModelConfig
from vae_latent_geometry_tpu.models import nets

Params = Dict[str, Any]


class EVAEParams(NamedTuple):
    encoder: Params
    decoders: Params  # stacked: every leaf has leading axis num_decoders


def stack_decoders(decoder_list):
    """Stack a list of per-decoder pytrees into one ensemble pytree."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *decoder_list)


def unstack_decoders(decoders: Params, num: int):
    return [jax.tree_util.tree_map(lambda x: x[i], decoders) for i in range(num)]


def evae_init(key, cfg: ModelConfig = ModelConfig()) -> EVAEParams:
    enc_key, dec_key = jax.random.split(key)
    encoder = nets.encoder_init(
        enc_key, cfg.input_dim, cfg.latent_dim, tuple(cfg.encoder_hidden),
        use_layernorm=not cfg.heteroscedastic,
    )
    # NOTE: the reference deepcopies ONE decoder N times (src/train.py:53), so
    # all ensemble members start identical and only diverge through the
    # random decoder choice during training.  We reproduce that by default.
    proto = nets.decoder_init(
        dec_key, cfg.latent_dim, cfg.input_dim, tuple(cfg.decoder_hidden),
        heteroscedastic=cfg.heteroscedastic,
    )
    decoders = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (cfg.num_decoders,) + x.shape).copy(),
        proto,
    )
    return EVAEParams(encoder=encoder, decoders=decoders)


def encode(params: EVAEParams | Params, x, cfg: ModelConfig = ModelConfig()):
    """(mean, log_std); log_std clamped only for the legacy family."""
    enc = params.encoder if isinstance(params, EVAEParams) else params
    act = "relu" if cfg.heteroscedastic else "silu"
    mean, log_std = nets.encoder_apply(enc, x, activation=act)
    if cfg.heteroscedastic:
        lo, hi = cfg.encoder_logstd_clamp
        log_std = jnp.clip(log_std, lo, hi)
    return mean, log_std


def decode_one(decoders: Params, idx, z):
    """Decode with decoder ``idx`` (traced scalar ok: dynamic slice of the
    stacked params)."""
    sel = jax.tree_util.tree_map(
        lambda p: jax.lax.dynamic_index_in_dim(p, idx, axis=0, keepdims=False),
        decoders,
    )
    return nets.decoder_apply(sel, z)


def decode_all(decoders: Params, z):
    """Decode z with every ensemble member: (M, ..., output_dim)."""
    return jax.vmap(lambda d: nets.decoder_apply(d, z))(decoders)


def _diag_normal_logprob(x, mean, std):
    """Sum over the event axis of independent Normal log-probs (torch
    td.Independent(Normal, 1).log_prob semantics)."""
    var = std * std
    return jnp.sum(
        -0.5 * ((x - mean) ** 2) / var - jnp.log(std) - 0.5 * jnp.log(2.0 * jnp.pi),
        axis=-1,
    )


def decoder_std(decoders, z):
    """Per-feature std over the ensemble decoders at ``z``, with torch's
    Bessel correction (the reference uses ``torch.std``'s unbiased default:
    ``src/init_splines_ensemble.py:50``, ``src/plot_latents.py:33``).  The
    single shared implementation behind the entropy-weighted init graph
    (norm over features) and the uncertainty map (mean over features)."""
    outs = decode_all(decoders, z)                 # (M, ..., X)
    m = outs.shape[0]
    return jnp.std(outs, axis=0) * jnp.sqrt(m / max(m - 1, 1))


def elbo(params: EVAEParams, key, x, cfg: ModelConfig = ModelConfig(),
         beta=None):
    """Single-sample ELBO with one random decoder for the whole batch
    (reference ``src/train.py:56-62``).

    ``beta``: optional KL weight override — the trainers thread their
    per-epoch warm-up value here (``TrainConfig.beta_warmup_epochs``);
    ``None`` keeps the model's fixed ``cfg.beta`` (the reference ensemble
    trainer's constant beta=1)."""
    z_key, dec_key = jax.random.split(key)
    mean, log_std = encode(params, x, cfg)
    std = jnp.exp(log_std)
    z = mean + std * jax.random.normal(z_key, mean.shape, mean.dtype)

    num_dec = jax.tree_util.tree_leaves(params.decoders)[0].shape[0]
    d_idx = jax.random.randint(dec_key, (), 0, num_dec)
    x_mean = decode_one(params.decoders, d_idx, z)

    logpxz = _diag_normal_logprob(x, x_mean, jnp.asarray(cfg.decoder_sigma, x.dtype))
    logqz = _diag_normal_logprob(z, mean, std)
    logpz = _diag_normal_logprob(z, jnp.zeros_like(z), jnp.ones_like(z))
    kl = logqz - logpz
    b = cfg.beta if beta is None else beta
    return jnp.mean(logpxz - b * kl)


def neg_elbo(params: EVAEParams, key, x, cfg: ModelConfig = ModelConfig(),
             beta=None):
    return -elbo(params, key, x, cfg, beta)


def sample(params: EVAEParams, key, n: int = 1,
           cfg: ModelConfig = ModelConfig(), decoder_idx=None):
    """Decoder means of prior samples; random ensemble member unless
    ``decoder_idx`` is given (legacy EVAE.sample,
    reference ``src/single_decoder/vae.py:107-113``)."""
    z_key, d_key = jax.random.split(key)
    z = jax.random.normal(z_key, (n, cfg.latent_dim))
    if decoder_idx is None:
        num_dec = jax.tree_util.tree_leaves(params.decoders)[0].shape[0]
        decoder_idx = jax.random.randint(d_key, (), 0, num_dec)
    return decode_one(params.decoders, decoder_idx, z)
