"""vae-latent-geometry-tpu: a TPU-native (JAX/XLA/pjit/Pallas) framework for
latent-space geodesic computation under the decoder pullback metric.

Re-designed from scratch with the capabilities of the reference
``johannefranck/vae-latent-geometry`` (PyTorch, single-GPU), but built TPU-first:

- VAE / ensemble-VAE model families as pure pytree params + jitted apply fns
  (reference: ``src/train.py``, ``src/single_decoder/vae.py``).
- Fixed-endpoint cubic-spline curves collapsed to a precomputed design matrix
  (the spline is linear in its free parameters), so curve evaluation is a
  single MXU contraction (reference: ``src/single_decoder/optimize_energy.py:25-102``).
- Discrete / Monte-Carlo ensemble / expected / JVP-quadrature curve-energy
  functionals (reference: ``src/optimize.py:38-75``).
- Batched Adam geodesic optimization as ``lax.scan`` inside one jit
  (reference: ``src/optimize.py:143-186``).
- Dijkstra-based spline initialization with a vectorized grid-graph builder and
  a closed-form least-squares spline fit (reference: ``src/init_splines_ensemble.py``).
- Distance-matrix + cross-seed CoV evaluation sharded over TPU meshes with
  ``shard_map``/``pjit`` (reference: ``src/eval.py``).
"""

__version__ = "0.1.0"

import jax as _jax

# TPU numerics guard — NOT optional.  With JAX's DEFAULT matmul precision the
# MXU rounds f32 inputs to bfloat16 (~4e-3 input rounding).  Every geodesic
# quantity here is built from differences of adjacent t-samples along a smooth
# curve, whose true magnitude (~|x|/T for T=2000) is far BELOW that rounding:
# the discrete energy sum_t ||x_{t+1}-x_t||^2 measured ~6x median error vs
# float64 on real curves under default precision, and exact (<1e-7) under
# full-f32 multi-pass matmuls.  The Pallas kernels pin their own dot precision;
# this default protects every XLA path (spline eval, decode, arc lengths).
# Callers that want fast bf16 matmuls for *training* can locally override with
# `with jax.default_matmul_precision('bfloat16'):` — rounding there only
# perturbs gradients, not a cancellation-dominated observable.
_jax.config.update("jax_default_matmul_precision", "highest")

from vae_latent_geometry_tpu.config import (  # noqa: F401
    EnergyConfig,
    GeodesicConfig,
    InitConfig,
    ModelConfig,
    TrainConfig,
)
