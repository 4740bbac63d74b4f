"""Legacy single-decoder VAE family (heteroscedastic observation model).

Reference ``src/single_decoder/vae.py``: ReLU encoder with log-std clamped to
[-4, 2], decoder producing mean AND log-std clamped to [-2, 2]; ELBO with a
beta weight and optional part decomposition; ensemble variant = shared encoder
+ list of heteroscedastic decoders with a random choice per call.

Here the ensemble variant reuses the stacked-decoder representation from
``evae.py`` — a heteroscedastic stacked pytree — so all ensemble machinery
(vmap decode, axis sharding) applies unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vae_latent_geometry_tpu.config import ModelConfig
from vae_latent_geometry_tpu.models import nets

LEGACY_CONFIG = ModelConfig(
    heteroscedastic=True,
    encoder_hidden=(128, 64),
    decoder_hidden=(128, 128),
)


class VAEParams(NamedTuple):
    encoder: dict
    decoder: dict


def vae_init(key, cfg: ModelConfig = LEGACY_CONFIG) -> VAEParams:
    ek, dk = jax.random.split(key)
    return VAEParams(
        encoder=nets.encoder_init(ek, cfg.input_dim, cfg.latent_dim,
                                  tuple(cfg.encoder_hidden), use_layernorm=False),
        decoder=nets.decoder_init(dk, cfg.latent_dim, cfg.input_dim,
                                  tuple(cfg.decoder_hidden), heteroscedastic=True),
    )


def encode(params: VAEParams, x, cfg: ModelConfig = LEGACY_CONFIG):
    mean, log_std = nets.encoder_apply(params.encoder, x, activation="relu")
    lo, hi = cfg.encoder_logstd_clamp
    return mean, jnp.clip(log_std, lo, hi)


def decode(decoder_params, z, cfg: ModelConfig = LEGACY_CONFIG):
    return nets.decoder_apply_full(decoder_params, z,
                                   clamp=tuple(cfg.decoder_logstd_clamp))


def _logprob(x, mean, log_std):
    std = jnp.exp(log_std)
    return jnp.sum(
        -0.5 * ((x - mean) / std) ** 2 - log_std - 0.5 * jnp.log(2.0 * jnp.pi),
        axis=-1,
    )


def elbo(params: VAEParams, key, x, beta: float = 1.0,
         cfg: ModelConfig = LEGACY_CONFIG, return_parts: bool = False):
    """Single-sample ELBO (reference ``src/single_decoder/vae.py:54-63``)."""
    mean, log_std = encode(params, x, cfg)
    std = jnp.exp(log_std)
    z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    x_mean, x_log_std = decode(params.decoder, z, cfg)
    recon = _logprob(x, x_mean, x_log_std)
    logqz = _logprob(z, mean, log_std)
    logpz = _logprob(z, jnp.zeros_like(z), jnp.zeros_like(z))
    kl = logqz - logpz
    value = recon - beta * kl
    if return_parts:
        return value.mean(), recon.mean(), kl.mean()
    return value.mean()


def sample(params: VAEParams, key, n: int = 1, cfg: ModelConfig = LEGACY_CONFIG):
    """Draw n decoder means from prior samples (reference :68-70)."""
    z = jax.random.normal(key, (n, cfg.latent_dim))
    mean, _ = decode(params.decoder, z, cfg)
    return mean


# ---------------------------------------------------------------------------
# Legacy heteroscedastic ENSEMBLE (reference src/single_decoder/vae.py:72-113):
# shared clamped encoder + independently-initialized heteroscedastic decoders
# (NOT deepcopies — contrast with the current family's deepcopy at upstream
# src/train.py:53), one random decoder per elbo/sample call, and a
# ``decoder = decoders[0]`` alias for single-decoder code paths.
# ---------------------------------------------------------------------------


class LegacyEVAEParams(NamedTuple):
    encoder: dict
    decoders: dict    # stacked heteroscedastic decoder pytree (leading M axis)


def legacy_evae_init(key, cfg: ModelConfig = LEGACY_CONFIG,
                     num_decoders: int = 3) -> LegacyEVAEParams:
    from vae_latent_geometry_tpu.models.evae import stack_decoders

    ek, dk = jax.random.split(key)
    decs = [nets.decoder_init(k, cfg.latent_dim, cfg.input_dim,
                              tuple(cfg.decoder_hidden), heteroscedastic=True)
            for k in jax.random.split(dk, num_decoders)]
    return LegacyEVAEParams(
        encoder=nets.encoder_init(ek, cfg.input_dim, cfg.latent_dim,
                                  tuple(cfg.encoder_hidden),
                                  use_layernorm=False),
        decoders=stack_decoders(decs),
    )


def _select_decoder(decoders, idx):
    """Dynamic index into the stacked ensemble (one decoder pytree)."""
    return jax.tree_util.tree_map(lambda x: x[idx], decoders)


def legacy_decoder(params: LegacyEVAEParams):
    """The reference's ``self.decoder = self.decoders[0]`` alias
    (upstream ``src/single_decoder/vae.py:83``)."""
    return _select_decoder(params.decoders, 0)


def legacy_evae_elbo(params: LegacyEVAEParams, key, x, beta: float = 1.0,
                     decoder_idx=None, cfg: ModelConfig = LEGACY_CONFIG,
                     return_parts: bool = False):
    """Ensemble ELBO with one randomly-drawn heteroscedastic decoder per
    call (reference ``src/single_decoder/vae.py:87-102``)."""
    m = jax.tree_util.tree_leaves(params.decoders)[0].shape[0]
    zkey, dkey = jax.random.split(key)
    idx = (jax.random.randint(dkey, (), 0, m)
           if decoder_idx is None else jnp.asarray(decoder_idx))
    dec = _select_decoder(params.decoders, idx)
    vp = VAEParams(encoder=params.encoder, decoder=dec)
    return elbo(vp, zkey, x, beta, cfg, return_parts)


def legacy_evae_sample(params: LegacyEVAEParams, key, n: int = 1,
                       decoder_idx=None, cfg: ModelConfig = LEGACY_CONFIG):
    """Prior samples through one (randomly-drawn) decoder's mean head
    (reference ``src/single_decoder/vae.py:107-113``)."""
    m = jax.tree_util.tree_leaves(params.decoders)[0].shape[0]
    zkey, dkey = jax.random.split(key)
    idx = (jax.random.randint(dkey, (), 0, m)
           if decoder_idx is None else jnp.asarray(decoder_idx))
    z = jax.random.normal(zkey, (n, cfg.latent_dim))
    mean, _ = decode(_select_decoder(params.decoders, idx), z, cfg)
    return mean


def mean_decoder(decoder_params):
    """Slice a heteroscedastic decoder down to its mean head.

    The final layer emits [mean, log_std] concatenated (torch ``chunk(2)``
    semantics), so keeping the first half of the last layer's columns yields
    an exact mean-only decoder usable with every energy functional.  Alias
    of :func:`models.torch_import.mean_head` (single implementation: the
    two used to duplicate the slice and had started to diverge on non-
    'layers' pytree keys)."""
    from vae_latent_geometry_tpu.models.torch_import import mean_head

    return mean_head(decoder_params)
