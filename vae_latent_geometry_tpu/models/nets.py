"""Encoder / decoder networks as plain pytree params + pure apply functions.

Architectures match the reference ensemble model (``src/train.py:71-85``):

- encoder: Linear(50,256) SiLU LayerNorm(256) Linear(256,128) SiLU
  LayerNorm(128) Linear(128, 2*latent_dim)
- decoder: Linear(2,128) ReLU Linear(128,128) ReLU Linear(128,50)

and the legacy single-decoder family (``src/single_decoder/vae.py:15-42``):

- encoder: Linear(50,128) ReLU Linear(128,64) ReLU Linear(64, 2*latent_dim)
- decoder: Linear(2,128) ReLU Linear(128,128) ReLU Linear(128, 2*output_dim)

Weights are stored as (in, out) so application is ``x @ w + b`` (row-major,
MXU-friendly); the torch importer transposes torch's (out, in) layout.
Plain dict pytrees keep the params trivially stackable (decoder ensembles are
a leading axis on every leaf) and shardable with ``NamedSharding``.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # torch.nn.LayerNorm default


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    both weight and bias.  Matching init keeps training comparisons fair."""
    bound = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _layernorm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def _layernorm(p, x):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    return xhat * p["scale"] + p["bias"]


def encoder_init(key, input_dim: int = 50, latent_dim: int = 2,
                 hidden: Sequence[int] = (256, 128), use_layernorm: bool = True,
                 dtype=jnp.float32):
    dims = [input_dim, *hidden, 2 * latent_dim]
    keys = jax.random.split(key, len(dims) - 1)
    params = {"layers": [
        _linear_init(k, dims[i], dims[i + 1], dtype) for i, k in enumerate(keys)
    ]}
    if use_layernorm:
        params["norms"] = [_layernorm_init(h, dtype) for h in hidden]
    return params


def encoder_apply(params, x, activation: str = "silu"):
    """Returns (mean, log_std), each (..., latent_dim)."""
    act = jax.nn.silu if activation == "silu" else jax.nn.relu
    norms = params.get("norms")
    layers = params["layers"]
    h = x
    for i, lyr in enumerate(layers[:-1]):
        h = h @ lyr["w"] + lyr["b"]
        h = act(h)
        if norms is not None:
            h = _layernorm(norms[i], h)
    out = h @ layers[-1]["w"] + layers[-1]["b"]
    mean, log_std = jnp.split(out, 2, axis=-1)
    return mean, log_std


def decoder_init(key, latent_dim: int = 2, output_dim: int = 50,
                 hidden: Sequence[int] = (128, 128), heteroscedastic: bool = False,
                 dtype=jnp.float32):
    out = 2 * output_dim if heteroscedastic else output_dim
    dims = [latent_dim, *hidden, out]
    keys = jax.random.split(key, len(dims) - 1)
    return {"layers": [
        _linear_init(k, dims[i], dims[i + 1], dtype) for i, k in enumerate(keys)
    ]}


def decoder_apply(params, z, activation: str = "relu"):
    """Decoder mean head: (..., latent_dim) -> (..., output_dim).

    For the ensemble family the observation noise is a fixed sigma
    (reference ``src/train.py:46``) so only the mean is produced here;
    heteroscedastic decoders use :func:`decoder_apply_full`.
    """
    act = jax.nn.relu if activation == "relu" else jax.nn.silu
    layers = params["layers"]
    h = z
    for lyr in layers[:-1]:
        h = act(h @ lyr["w"] + lyr["b"])
    return h @ layers[-1]["w"] + layers[-1]["b"]


def decoder_apply_full(params, z, clamp=(-2.0, 2.0), activation: str = "relu"):
    """Heteroscedastic decoder: returns (mean, log_std) with the reference's
    log-std clamp (``src/single_decoder/vae.py:41``)."""
    out = decoder_apply(params, z, activation)
    mean, log_std = jnp.split(out, 2, axis=-1)
    return mean, jnp.clip(log_std, clamp[0], clamp[1])
