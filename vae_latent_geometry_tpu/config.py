"""Typed configuration shared across all pipeline stages.

The reference scatters its configuration over nine argparse CLIs, two YAML
files and many hard-coded duplicated constants (latent_dim=2 / input_dim=50 at
``src/optimize.py:95-96``, ``src/eval.py:75-76``; T=2000; endpoint weight 1000;
grid 200; k=8; n_poly=4; M=2; decoder sigma=5 at ``src/train.py:46``).  Here a
single set of dataclasses carries the same defaults end to end.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Ensemble-VAE architecture (reference ``src/train.py:16-85``)."""

    input_dim: int = 50
    latent_dim: int = 2
    num_decoders: int = 10
    encoder_hidden: Sequence[int] = (256, 128)
    decoder_hidden: Sequence[int] = (128, 128)
    decoder_sigma: float = 5.0  # fixed observation noise, src/train.py:46
    beta: float = 1.0
    # Legacy single-decoder family (reference src/single_decoder/vae.py):
    # heteroscedastic decoder + clamped log-stds.
    heteroscedastic: bool = False
    encoder_logstd_clamp: tuple[float, float] = (-4.0, 2.0)
    decoder_logstd_clamp: tuple[float, float] = (-2.0, 2.0)


@dataclass(frozen=True)
class SplineConfig:
    """Fixed-endpoint cubic-spline curve family
    (reference ``src/single_decoder/optimize_energy.py:25-102``)."""

    n_poly: int = 4
    degree: int = 3  # cubic segments; basis columns K = n_poly + 1

    @property
    def n_coeff(self) -> int:
        return (self.degree + 1) * self.n_poly


@dataclass(frozen=True)
class EnergyConfig:
    """Curve-energy functional (reference ``src/optimize.py:38-75``)."""

    num_t: int = 2000            # quadrature samples along each curve
    mc_samples: int = 2          # M independent decoder-pair draws
    mode: str = "mc"             # "single" | "mc" | "expected" | "jvp"
    endpoint_weight: float = 1000.0
    # MXU precision rung for fused-kernel optimization steps ("float32" |
    # "f32x3" | "f32x2"; see ops/energy_pallas.py precision ladder).  Final
    # energies are always re-evaluated at "float32" after the scan, so this
    # only affects the optimization trajectory, not reported numbers.
    kernel_precision: str = "f32x3"
    # Draw MC decoder indices with the TPU core's hardware PRNG inside the
    # fused kernels (pltpu.prng_random_bits) instead of shipping
    # host-generated (S, T, B) index planes through HBM.  Automatically
    # ignored off-TPU (interpret-mode PRNG yields zero bits).
    mc_inkernel_rng: bool = True
    # Quadrature-transfer target for the jvp modes (the north star's energy
    # formulation): when set, ``jvp_ensemble`` / ``expected_rescaled``
    # estimate the ``target_num_t``-point objective from the CURRENT
    # (coarse) t-grid by rescaling the smooth (prop. 1/T) and disagreement
    # (prop. T) terms — see geometry.energy.energy_jvp_ensemble.  None keeps
    # same-T semantics.
    target_num_t: Optional[int] = None
    # Name of a shard_map mesh axis the decoder-ensemble axis is sharded
    # over (expert parallelism).  When set, the fused expected-energy mode
    # computes per-shard sufficient statistics in the Pallas stats kernel
    # and psums them over this axis (ops/energy_pallas.energy_expected_
    # sharded); the optimizer psums omega gradients over it.  Only
    # meaningful inside shard_map — parallel/shard.py sets it.
    ep_axis: Optional[str] = None
    # Skip the fused FORWARD kernel on trajectory steps whose energy value
    # is discarded (the production Adam scan without history recording):
    # the fused kernels' backward recomputes activations from the inputs
    # alone, so gradients are bit-identical with or without the forward
    # pass.  Measured (experiment/gradonly_probe.json): XLA was ALREADY
    # dead-code-eliminating the unused forward pallas-call, so this is
    # perf-neutral today — the flag makes the value-free contract explicit
    # in the traced program instead of relying on XLA DCE of custom-calls,
    # and pins the honest per-step pass model (n_pass + chain, no fwd)
    # that bench.py's MFU accounting uses.  Final energies are always
    # re-evaluated exactly regardless.  Applies to the fixed-budget scan
    # optimizer only: paths that consume per-step energy values — history
    # recording, and the early-stopping optimizer's best/patience tracking
    # — necessarily keep the value-computing forward.  Set False to force
    # the value-computing path everywhere.
    gradonly_traj: bool = True


@dataclass(frozen=True)
class GeodesicConfig:
    """Batched geodesic optimization (reference ``src/optimize.py:143-186``)."""

    steps: int = 1000
    lr: float = 1e-3
    batch_size: int = 200
    # Learning-rate schedule for the batched Adam loop.  "constant" is the
    # reference semantics (src/optimize.py:153: fixed-lr Adam for the full
    # budget).  "cosine" linearly warms up to ``lr`` over ``lr_warmup``
    # steps then cosine-decays to ``lr_end`` by ``steps`` — measured on the
    # production workload, a 400-step cosine run reaches lower final
    # energies than the reference's 1000-step constant run
    # (experiment/schedule_probe.json), cutting the full-matrix wall clock
    # proportionally.
    lr_schedule: str = "constant"
    lr_warmup: int = 20
    lr_end: float = 1e-5
    # Trajectory-only quadrature resolution.  When set, the Adam loop
    # evaluates the discrete energy on a ``traj_num_t``-point t-grid while
    # the FINAL energies are still re-evaluated on the full
    # ``energy.num_t`` grid at exact float32 — the same contract as the
    # kernel-precision rungs (reduced arithmetic steers the trajectory,
    # never the reported numbers).  Prefer powers of two (1024, 512): the
    # fused kernels need a T-divisor that is a multiple of 8 and >= 16
    # (ops.energy_pallas.fused_fits), which T=1000/500 lack.  Measured
    # impact at T_traj=1024 on the production workload:
    # experiment/traj_resolution_probe.json.
    traj_num_t: Optional[int] = None
    # Two-phase "fast recipe": after the ``traj_num_t`` coarse phase
    # (``steps`` steps), run ``polish_steps`` additional Adam steps at the
    # FULL ``energy.num_t`` resolution (constant ``polish_lr``, fresh Adam
    # state), warm-started from the coarse solution.  A coarse trajectory
    # alone leaves a heavy per-pair tail (traj_resolution_probe.json: max
    # +13% at T=1024); the full-T polish removes it.  Measured on the
    # production 133-class workload (fast_recipe_probe.json): cosine(3e-3)
    # x 700 @ T=1024 + 300 polish @ T=2000 reaches STRICTLY LOWER final
    # energies than the reference recipe (Adam 1e-3 x 1000 @ T=2000) on
    # 99.5-100% of pairs (median 7% lower, worst pair +4.5%) at 1.52x the
    # speed.  Ignored unless ``traj_num_t`` is set.
    polish_steps: int = 0
    polish_lr: float = 1e-3
    # General multi-phase quadrature ladder — supersedes the two-phase
    # ``traj_num_t``/``polish_steps`` mechanism when set.  A tuple of
    # (steps, num_t, lr_schedule, lr) phases, run in sequence with omega
    # warm-started and fresh Adam state per phase; final energies are still
    # re-evaluated on the full ``energy.num_t`` grid at exact float32 (the
    # standard contract).  The CLI --turbo preset ships the measured
    # dominance-preserving point ((1200, 256, "cosine", 3e-3),
    # (200, 2000, "constant", 1e-3)): 2.88x the reference recipe with
    # strictly lower final energies on 99.2% of production pairs
    # (experiment/full133_turbo_timing.json).  More aggressive ladders
    # (e.g. cos1200@128+100@512+50@2000, ~6x per-chunk) were measured at
    # full scale and trade the strictly-better fraction down to ~97%
    # (experiment/turbo_ladder_fullscale.json).  num_t entries must satisfy the
    # fused-kernel divisibility rules (powers of two are safe): a value like
    # 1000 silently falls back to the ~10x-slower XLA path (warned at trace
    # time).
    # Entries may optionally carry a 5th element: the energy MODE for that
    # phase (e.g. a coarse "jvp_ensemble" quadrature phase followed by a
    # discrete "expected_fused" polish).  4-tuples keep ``energy.mode``.
    phase_plan: Optional[Tuple[Tuple, ...]] = None
    # Energy mode for the exact final re-evaluation (always float32, full
    # ``energy.num_t``).  None = ``energy.mode``.  JVP-trajectory runs set
    # this to "expected"/"expected_fused" so their reported energies stay in
    # the framework's standard discrete units (comparable to goldens).
    final_energy_mode: Optional[str] = None
    energy: EnergyConfig = field(default_factory=EnergyConfig)
    spline: SplineConfig = field(default_factory=SplineConfig)
    # Single-spline early stopping (reference optimize_energy.py:119-165).
    patience: int = 500
    delta: float = 1e-6
    # Batched early stopping for the production pipeline: run the
    # best-restoring while-loop optimizer instead of the fixed-step scan, so
    # a chunk exits when EVERY spline has gone ``patience`` steps without a
    # ``delta`` relative improvement (the reference's batched loops always
    # burn the full step budget, src/optimize.py:153-165).
    early_stop: bool = False


@dataclass(frozen=True)
class InitConfig:
    """Dijkstra spline initialization (reference ``src/init_splines_ensemble.py``)."""

    grid_points_per_axis: int = 200
    grid_margin: float = 0.1
    knn: int = 8
    use_entropy: bool = False
    # Padded-path cap for the batched least-squares fit.  A Dijkstra path
    # longer than this is treated as unreachable (pair invalidated, loudly
    # warned) — entropy-weighted graphs can produce long low-cost detours,
    # so raise this if the warning fires.  Memory cost of the fit scales
    # linearly with it.
    max_path_len: int = 1024
    spline: SplineConfig = field(default_factory=SplineConfig)


@dataclass(frozen=True)
class TrainConfig:
    """VAE / EVAE training (reference ``src/train.py:91-179``,
    ``src/single_decoder/vae_train.py``)."""

    epochs: int = 200
    batch_size: int = 64
    lr: float = 1e-3
    seed: int = 42
    val_ratio: float = 0.1
    # Single-VAE extras (src/single_decoder/vae_train.py:63,77)
    beta_warmup_epochs: int = 0      # 0 = constant beta; 30 in legacy trainer
    lr_step_size: int = 0            # 0 = constant lr; StepLR(200, 0.5) in legacy
    lr_gamma: float = 0.5


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def to_json(cfg: Any) -> str:
    return json.dumps(to_dict(cfg), indent=2, default=list)


def _merge(cls, base: Any, overrides: dict):
    known = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in overrides.items():
        if k not in known:
            raise KeyError(f"Unknown config field {k!r} for {cls.__name__}")
        cur = getattr(base, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            kwargs[k] = _merge(type(cur), cur, v)
        else:
            kwargs[k] = v
    return dataclasses.replace(base, **kwargs)


def from_dict(cls, overrides: Optional[dict] = None):
    """Build a config of type ``cls`` from defaults plus nested overrides."""
    base = cls()
    if not overrides:
        return base
    return _merge(cls, base, overrides)


def from_yaml(path: str):
    """Load (ModelConfig, TrainConfig) from a YAML file.

    Accepts both this framework's nested layout and the reference's
    ``configs/config.yaml`` schema (vae: {latent_dim, input_dim},
    training: {epochs, lr, batch_size, seed}) for drop-in compatibility.
    """
    import yaml

    raw = yaml.safe_load(open(path)) or {}
    vae = dict(raw.get("vae") or raw.get("model") or {})
    vae.pop("num_decoders_comment", None)
    model_over = {k: v for k, v in vae.items()
                  if k in {f.name for f in dataclasses.fields(ModelConfig)}}
    training = dict(raw.get("training") or raw.get("train") or {})
    train_over = {k: v for k, v in training.items()
                  if k in {f.name for f in dataclasses.fields(TrainConfig)}}
    return from_dict(ModelConfig, model_over), from_dict(TrainConfig, train_over)
