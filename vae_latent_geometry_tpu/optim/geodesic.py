"""Batched geodesic energy minimization: the framework's core workload.

The reference's hot loop (``src/optimize.py:143-186``) runs a Python ``for``
loop of Adam steps, each dispatching ~15 CUDA kernels.  Here the *entire*
optimization — spline eval, ensemble decode, energy, endpoint penalty,
backward, Adam update, for all steps — is one ``lax.scan`` inside one jit:
a single XLA program per batch with zero host round-trips.

Loss semantics match the reference exactly: per-spline
``energy + endpoint_weight * ||gamma(1) - b||^2`` summed over the batch
(``src/optimize.py:155-162``), Adam(lr, 0.9, 0.999, eps=1e-8) on omega only.

The single-spline early-stopping variant (reference
``src/single_decoder/optimize_energy.py:119-165``: track best energy, stop
after ``patience`` steps with relative improvement < ``delta``, restore best
params) is a ``lax.while_loop`` carrying best-so-far state — batched over
splines with an active mask instead of one curve at a time.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from vae_latent_geometry_tpu.config import GeodesicConfig
from vae_latent_geometry_tpu.geometry import energy as energy_lib
from vae_latent_geometry_tpu.geometry.spline import (
    design_matrix,
    design_matrix_derivative,
    eval_spline_design,
    eval_spline_velocity,
)


def _warn_fallback(mode: str, T: int, B: int, D: int, X: int, M: int) -> None:
    """Trace-time warning when a fused mode silently degrades to the XLA
    path (9-17 steps/s vs 81-122 at the reference workload): a rejected
    shape must never be a silent 10x regression."""
    import warnings

    warnings.warn(
        f"energy mode {mode!r}: fused kernel rejects shape "
        f"(T={T}, B={B}, D={D}, X={X}, M={M}) — falling back to the XLA "
        "path (roughly 10x slower at the reference workload); see "
        "ops.energy_pallas.fused_fits for the shape rules",
        stacklevel=3,
    )


class GeodesicResult(NamedTuple):
    omega: jax.Array          # (B, K, D) optimized parameters
    energy: jax.Array         # (B,) final-step energy (per-spline)
    lengths: jax.Array        # (B,) sqrt(energy) — the reference's
    #                           "geodesic length" (src/optimize.py:168)
    energy_history: Optional[jax.Array] = None  # (steps, B) if recorded


def _energy_fn(mode: str, decoders, gamma, gamma_dot, key, mc_samples: int,
               num_active=None, kernel_precision: str = "f32x3",
               ep_axis=None, mc_inkernel_rng: bool = True,
               target_num_t=None, grad_only: bool = False):
    if mode == "single":
        return energy_lib.energy_single(decoders, gamma)
    if mode in ("single_fused", "single_fused_bf16"):
        # the expected kernel with an M=1 "ensemble" IS the single-decoder
        # energy (cancellation-free fast path in the kernel); covers the
        # reference's batch-500 single-decoder config
        # (src/single_decoder/optimize_energy_batched.py:132)
        from vae_latent_geometry_tpu.ops.energy_pallas import (
            energy_expected_fused,
            energy_expected_fused_grad,
            fused_fits,
        )

        T, B, D = gamma.shape
        stacked = jax.tree_util.tree_map(lambda x: x[None], decoders)
        X = stacked["layers"][-1]["w"].shape[-1]
        if not fused_fits(T, B, D, X, 1):
            _warn_fallback(mode, T, B, D, X, 1)
            return energy_lib.energy_single(decoders, gamma)
        precision = "bfloat16" if mode.endswith("bf16") else kernel_precision
        fn = energy_expected_fused_grad if grad_only else energy_expected_fused
        return fn(stacked, gamma, None, precision)
    if mode == "mc":
        return energy_lib.energy_mc(decoders, gamma, key, mc_samples,
                                    num_active)
    if mode == "mc_scan":
        return energy_lib.energy_mc_scan(decoders, gamma, key, mc_samples,
                                         num_active)
    if mode in ("mc_fused", "mc_fused_bf16"):
        from vae_latent_geometry_tpu.ops.energy_mc_pallas import (
            energy_mc_fused,
            energy_mc_fused_grad,
            energy_mc_fused_rng,
            energy_mc_fused_rng_grad,
            sample_decoder_indices,
        )
        from vae_latent_geometry_tpu.ops.energy_pallas import (
            _is_tpu,
            fused_fits,
        )

        T, B, D = gamma.shape
        m_dec = jax.tree_util.tree_leaves(decoders)[0].shape[0]
        X = decoders["layers"][-1]["w"].shape[-1]
        if not fused_fits(T, B, D, X, m_dec, mc=True, mc_samples=mc_samples):
            # batch too large for VMEM-resident kernel: XLA fallback
            _warn_fallback(mode, T, B, D, X, m_dec)
            return energy_lib.energy_mc(decoders, gamma, key, mc_samples,
                                        num_active)
        precision = "bfloat16" if mode.endswith("bf16") else kernel_precision
        if mc_inkernel_rng and _is_tpu():
            # TPU fast path: decoder draws from the core's hardware PRNG at
            # the point of use — no (S, T, B) index planes in HBM
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(key, (1,), jnp.uint32), jnp.int32)
            kmax = (jnp.broadcast_to(jnp.asarray(num_active), (B,))
                    if num_active is not None
                    else jnp.full((B,), m_dec)).astype(jnp.float32)
            fn = (energy_mc_fused_rng_grad if grad_only
                  else energy_mc_fused_rng)
            return fn(decoders, gamma, seed, kmax.reshape(1, B), mc_samples,
                      precision)
        d1, d2 = sample_decoder_indices(key, T, B, m_dec, mc_samples,
                                        num_active)
        fn = energy_mc_fused_grad if grad_only else energy_mc_fused
        return fn(decoders, gamma, d1, d2, precision)
    if mode == "expected":
        return energy_lib.energy_expected(decoders, gamma, num_active)
    if mode in ("expected_fused", "expected_fused_bf16"):
        from vae_latent_geometry_tpu.ops.energy_pallas import (
            active_weights,
            energy_expected_fused,
            fused_fits,
        )

        T, B, D = gamma.shape
        m_dec = jax.tree_util.tree_leaves(decoders)[0].shape[0]
        X = decoders["layers"][-1]["w"].shape[-1]
        if ep_axis is not None:
            # decoder-ensemble axis sharded over the mesh (expert parallel):
            # per-shard sufficient statistics + psum — decoders here are the
            # LOCAL subset (shard_map has already sliced them)
            from vae_latent_geometry_tpu.ops.energy_pallas import (
                active_weights_local,
                energy_expected_sharded,
                stats_fits,
                uniform_weights_local,
            )

            if not stats_fits(T, B, D, X, m_dec):
                # no silent fallback here: an XLA fallback would need its
                # own psum assembly, and an unguarded shape reaches Mosaic
                # as a cryptic lowering error — fail with the fix instead
                raise ValueError(
                    f"energy mode {mode!r} with ep sharding: the stats "
                    f"kernel rejects shape (T={T}, B={B}, D={D}, X={X}, "
                    f"M_local={m_dec}) — pick num_t with an 8-aligned "
                    "divisor (powers of two >= 16 are safe; "
                    "ops.energy_pallas.stats_fits has the rules)")
            m_total = m_dec * jax.lax.psum(1, ep_axis)
            precision = ("bfloat16" if mode.endswith("bf16")
                         else kernel_precision)
            wmb = (active_weights_local(num_active, m_total, m_dec, B, ep_axis)
                   if num_active is not None
                   else uniform_weights_local(m_total, m_dec, B))
            return energy_expected_sharded(decoders, gamma, wmb, ep_axis,
                                           precision)
        if not fused_fits(T, B, D, X, m_dec, mc=False):
            _warn_fallback(mode, T, B, D, X, m_dec)
            return energy_lib.energy_expected(decoders, gamma, num_active)
        precision = "bfloat16" if mode.endswith("bf16") else kernel_precision
        # NOTE a transposed-layout variant (features on sublanes, points on
        # lanes; ops/_research/energy_pallas_t.py) removes the X=50->128
        # lane-padding
        # waste on paper (0.76x the MXU work) but measured ~30% SLOWER on a
        # v5e: the weights-stationary MXU wants the long dimension streaming
        # through rows, not lanes.  Kept as a validated negative result; the
        # feature-on-lanes layout below is the production path.
        # per-spline first-k-decoder subsets (the CoV sweep) become a
        # masked-mean weight plane streamed into the kernel
        wmb = (active_weights(num_active, m_dec, B)
               if num_active is not None else None)
        if grad_only:
            from vae_latent_geometry_tpu.ops.energy_pallas import (
                energy_expected_fused_grad,
            )

            return energy_expected_fused_grad(decoders, gamma, wmb, precision)
        return energy_expected_fused(decoders, gamma, wmb, precision)
    if mode == "jvp":
        return energy_lib.energy_jvp(decoders, gamma, gamma_dot)
    if mode == "jvp_ensemble":
        return energy_lib.energy_jvp_ensemble(decoders, gamma, gamma_dot,
                                              target_num_t, num_active)
    # NOTE: no fused Pallas JVP kernel ships.  The hardware study
    # (experiment/jvp_speed_probe.json, jvp_quality_probe.json) showed the
    # exact metric costs ~2.2x per quadrature point over first differences
    # and transfers no quality the secant 'expected_rescaled' control does
    # not — the XLA jvp modes above are the production form of the north
    # star's formulation, and the win is the rescaling, not the fusion.
    if mode == "expected_rescaled":
        if target_num_t is None:
            raise ValueError("energy mode 'expected_rescaled' requires "
                             "energy.target_num_t")
        return energy_lib.energy_expected_rescaled(decoders, gamma,
                                                   target_num_t, num_active)
    raise ValueError(f"unknown energy mode {mode!r}")


def make_loss_fn(decoders, basis, cfg: GeodesicConfig,
                 grad_only: bool = False) -> Callable:
    """Build loss(omega, a, b, key) -> (scalar_loss, per_spline_energy).

    ``decoders`` is a stacked ensemble pytree for ensemble modes, or a single
    decoder pytree for mode='single'/'jvp'.

    ``grad_only=True`` builds a loss whose GRADIENT is identical but whose
    fused-mode energy VALUES are zeros — the forward decode kernel is never
    launched (its output contributes nothing to the gradient: the fused
    backward recomputes activations from the inputs).  Only the fused modes
    change; XLA modes compute the value as a byproduct of autodiff anyway.
    Use under ``jax.grad`` where the value is discarded, never where it is
    read.
    """
    e_cfg = cfg.energy
    t = jnp.linspace(0.0, 1.0, e_cfg.num_t)
    basis = jnp.asarray(basis)
    phi = design_matrix(t, basis, cfg.spline.n_poly)
    needs_vel = e_cfg.mode.startswith("jvp")
    dphi = (design_matrix_derivative(t, basis, cfg.spline.n_poly)
            if needs_vel else None)
    t_end = jnp.array([1.0])
    phi_end = design_matrix(t_end, basis, cfg.spline.n_poly)

    def loss(omega, a, b, key, num_active=None):
        gamma = eval_spline_design(omega, a, b, phi, t)
        gamma_dot = (eval_spline_velocity(omega, a, b, dphi)
                     if needs_vel else None)
        e = _energy_fn(e_cfg.mode, decoders, gamma, gamma_dot, key,
                       e_cfg.mc_samples, num_active, e_cfg.kernel_precision,
                       e_cfg.ep_axis, e_cfg.mc_inkernel_rng,
                       e_cfg.target_num_t, grad_only)
        # endpoint penalty (reference src/optimize.py:158-160): exactly zero
        # in exact arithmetic because the basis enforces offset(1)=0, kept for
        # faithful gradients under float32.
        gamma_end = eval_spline_design(omega, a, b, phi_end, t_end)
        ep = jnp.sum((gamma_end[0] - b) ** 2, axis=-1)
        per_spline = e + e_cfg.endpoint_weight * ep
        total = jnp.sum(per_spline)
        if e_cfg.ep_axis is not None:
            # ep-sharded gradient contract (see energy_expected_sharded):
            # JAX's untyped transpose turns every in-loss psum into a psum,
            # so replicated consumers would contribute their cotangent once
            # PER SHARD.  Scaling the whole per-shard loss by 1/axis_size
            # makes each shard's gradient a true partial; the optimizer then
            # psums gradients over the axis for the exact global gradient.
            # The reported per-spline energies ``e`` stay unscaled.
            total = total / jax.lax.psum(1, e_cfg.ep_axis)
        return total, e

    return loss


def _traj_cfg(cfg: GeodesicConfig) -> GeodesicConfig:
    """Config the Adam loop optimizes under: ``traj_num_t`` (when set)
    replaces the quadrature resolution for the trajectory only — the final
    re-evaluation below always uses the full ``energy.num_t`` grid."""
    if cfg.traj_num_t is None:
        return cfg
    return dataclasses.replace(
        cfg, energy=dataclasses.replace(cfg.energy, num_t=cfg.traj_num_t))


def _phase_cfgs(cfg: GeodesicConfig) -> list:
    """Phase list the Adam loop runs, each with its own step count,
    quadrature resolution, and schedule.

    ``phase_plan`` (when set) wins outright: each (steps, num_t,
    lr_schedule, lr) entry becomes one phase (measured production ladder:
    experiment/fast_recipe_probe4.json).  Otherwise single phase unless
    both ``traj_num_t`` and ``polish_steps`` are set: then a coarse phase
    (``steps`` @ ``traj_num_t``, the configured schedule) is followed by a
    full-resolution polish phase (``polish_steps`` @ ``energy.num_t``,
    constant ``polish_lr``, fresh Adam state) warm-started from the coarse
    solution.  Measured recipe and per-pair dominance:
    experiment/fast_recipe_probe.json."""
    if cfg.phase_plan:
        phases = []
        for i, entry in enumerate(cfg.phase_plan):
            try:
                s, T, sched, lr, *rest = entry
                if len(rest) > 1:
                    raise ValueError
                mode = rest[0] if rest else cfg.energy.mode
            except (TypeError, ValueError):
                raise ValueError(
                    f"phase_plan[{i}] must be a (steps, num_t, lr_schedule, "
                    f"lr[, energy_mode]) tuple, got {entry!r}") from None
            if int(s) < 1 or int(T) < 2 or float(lr) <= 0.0:
                raise ValueError(
                    f"phase_plan[{i}]={entry!r}: need steps >= 1, "
                    "num_t >= 2, lr > 0")
            # unknown lr_schedule values fail in _make_opt with the list of
            # valid names, same as the top-level flag; unknown modes fail in
            # _energy_fn likewise
            phases.append(dataclasses.replace(
                cfg, steps=int(s), lr=float(lr), lr_schedule=sched,
                traj_num_t=None, polish_steps=0, phase_plan=None,
                energy=dataclasses.replace(cfg.energy, num_t=int(T),
                                           mode=str(mode))))
        return phases
    coarse = _traj_cfg(cfg)
    if cfg.traj_num_t is None or cfg.polish_steps <= 0:
        return [coarse]
    polish = dataclasses.replace(
        cfg, steps=cfg.polish_steps, lr=cfg.polish_lr,
        lr_schedule="constant", traj_num_t=None)
    return [coarse, polish]


def _exact_cfg(cfg: GeodesicConfig) -> GeodesicConfig:
    """Config for the exact final re-evaluation: always float32, full
    ``energy.num_t``, same-T semantics (no quadrature-transfer rescaling),
    and ``final_energy_mode`` when set — reduced precision, coarse grids and
    JVP trajectory modes only ever steer the optimization, never the
    reported numbers."""
    mode = (cfg.final_energy_mode or cfg.energy.mode).removesuffix("_bf16")
    if mode == "expected_rescaled":
        # rescaling is trajectory-only steering; with target_num_t cleared
        # (same-T semantics, r = 1) the estimator IS energy_expected — name
        # it so, instead of tripping the mode's target_num_t requirement
        mode = "expected"
    return dataclasses.replace(
        cfg, energy=dataclasses.replace(
            cfg.energy,
            mode=mode,
            target_num_t=None,
            kernel_precision="float32"))


def _make_opt(cfg: GeodesicConfig):
    """Adam with the configured learning-rate schedule.  "constant" is the
    reference semantics (src/optimize.py:153); "cosine" front-loads the
    step budget (warmup -> peak ``cfg.lr`` -> cosine to ``cfg.lr_end``),
    which reaches lower energies in ~0.4x the steps on the production
    workload (experiment/schedule_probe.json)."""
    if cfg.lr_schedule == "constant":
        return optax.adam(cfg.lr)
    if cfg.lr_schedule == "cosine":
        # a phase shorter than the configured warmup (e.g. a short ladder
        # rung with the default lr_warmup=20) would give optax a negative
        # cosine span — cap the warmup at a quarter of the phase
        warmup = min(cfg.lr_warmup, max(cfg.steps // 4, 1))
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.lr, warmup_steps=warmup,
            decay_steps=cfg.steps, end_value=cfg.lr_end)
        return optax.adam(learning_rate=sched)
    raise ValueError(f"unknown lr_schedule: {cfg.lr_schedule!r} "
                     "(expected 'constant' or 'cosine')")


@partial(jax.jit, static_argnames=("cfg", "record_history"))
def _optimize_scan(decoders, omega0, a, b, basis, key,
                   cfg: GeodesicConfig, record_history: bool = False,
                   num_active=None):
    omega = omega0
    hists = []
    for i, pcfg in enumerate(_phase_cfgs(cfg)):
        # trajectory steps discard the energy value (final energies are
        # re-evaluated exactly below), so by default the fused modes skip
        # their forward kernel entirely — bit-identical gradients (the bwd
        # kernel's residuals are the inputs alone).  Perf-neutral in
        # practice (XLA already DCE'd the dead fwd call — experiment/
        # gradonly_probe.json) but makes the contract explicit.  History
        # recording needs the per-step values, so it keeps the value path.
        grad_only = cfg.energy.gradonly_traj and not record_history
        loss_fn = make_loss_fn(decoders, basis, pcfg, grad_only=grad_only)
        opt = _make_opt(pcfg)
        opt_state = opt.init(omega)

        def step(carry, step_key, loss_fn=loss_fn, opt=opt):
            omega, opt_state = carry
            if record_history:
                (_, e), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    omega, a, b, step_key, num_active
                )
            else:
                grads, _ = jax.grad(loss_fn, has_aux=True)(
                    omega, a, b, step_key, num_active
                )
                e = None
            if cfg.energy.ep_axis is not None:
                # each ep shard's gradient covers only its decoder subset's
                # energy contribution; the true gradient of the (replicated)
                # omega is their sum — without this, shards silently diverge
                grads = jax.lax.psum(grads, cfg.energy.ep_axis)
            updates, opt_state = opt.update(grads, opt_state, omega)
            omega = optax.apply_updates(omega, updates)
            return (omega, opt_state), e

        # phase 0 consumes the caller's key stream exactly as the
        # single-phase loop always has (bit-compatible MC trajectories);
        # later phases fold in their index
        keys = jax.random.split(key if i == 0 else jax.random.fold_in(key, i),
                                pcfg.steps)
        (omega, _), hist = jax.lax.scan(step, (omega, opt_state), keys)
        hists.append(hist)
    hist = (jnp.concatenate(hists, axis=0) if record_history and len(hists) > 1
            else hists[0])
    # final energy at the *final* params (the reference reports the energy of
    # the penultimate params; for converged runs these agree to MC noise).
    # Always evaluated at exact "float32" kernel precision — reduced-precision
    # rungs (f32x3 / f32x2 / bf16) only steer the optimization trajectory,
    # never the reported numbers.
    exact_loss = make_loss_fn(decoders, basis, _exact_cfg(cfg))
    _, e_final = exact_loss(omega, a, b, jax.random.fold_in(key, cfg.steps),
                            num_active)
    return omega, e_final, hist


def optimize_splines(decoders, omega0, a, b, basis, cfg: GeodesicConfig,
                     key=None, record_history: bool = False,
                     num_active=None) -> GeodesicResult:
    """Optimize a batch of splines jointly.

    decoders: stacked ensemble pytree (or single decoder pytree for
              mode='single'/'jvp')
    omega0:   (B, K, D) initial spline params;  a, b: (B, D) endpoints.
    num_active: optional (B,) int — per-spline active-decoder count for the
              ensemble energy modes (see ``energy.energy_mc``).

    Returned energies are re-evaluated at the FINAL omega (exact float32,
    full num_t).  Small documented delta vs the reference, which records
    the last in-loop energy — evaluated one Adam step BEFORE its final
    omega (``src/optimize.py:153-168``, ``src/eval.py:119-127``): ours is
    the energy of the curve actually returned.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    omega, e_final, hist = _optimize_scan(
        decoders, omega0, a, b, jnp.asarray(basis), key, cfg, record_history,
        num_active,
    )
    return GeodesicResult(
        omega=omega,
        energy=e_final,
        lengths=jnp.sqrt(e_final),
        energy_history=hist if record_history else None,
    )


@partial(jax.jit, static_argnames=("cfg", "block"))
def _optimize_early_stop(decoders, omega0, a, b, basis, key, cfg: GeodesicConfig,
                         num_active=None, block: int = 50):
    """Early stopping with per-step best/patience tracking INSIDE ``block``-
    step ``lax.scan`` segments and a ``while_loop`` only at block
    granularity.  A step-granular while_loop measured ~1.4x slower per step
    than the scan (lost pipelining) at the production workload — enough to
    eat any step savings; block exit keeps the scan's speed and checks
    convergence every ``block`` steps (the run may overshoot the CONVERGENCE
    exit point by up to block-1 steps).  The cfg.steps budget itself is
    exact: steps past it inside the final partial block are masked no-ops
    (their compute still runs — block shapes are static — but omega,
    optimizer state, best/patience tracking and the lr-schedule counter are
    all frozen), so e.g. steps=120 performs exactly 120 Adam updates, not
    150."""
    loss_fn = make_loss_fn(decoders, basis, _traj_cfg(cfg))
    opt = _make_opt(cfg)

    _, e0 = loss_fn(omega0, a, b, key, num_active)

    def scan_step(carry, step_idx):
        omega, opt_state, best_omega, best_e, patience_ctr = carry
        # scalar budget mask: indices past cfg.steps (the tail of the final
        # partial block when steps % block != 0) must not change any state
        active = step_idx < cfg.steps
        step_key = jax.random.fold_in(key, step_idx)
        (_, e), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            omega, a, b, step_key, num_active
        )
        if cfg.energy.ep_axis is not None:
            grads = jax.lax.psum(grads, cfg.energy.ep_axis)
        rel_improvement = (best_e - e) / best_e
        improved = jnp.logical_and(rel_improvement > cfg.delta, active)  # (B,)
        best_e = jnp.where(improved, e, best_e)
        # best params are the ones that ACHIEVED e — i.e. omega before this
        # step's update (the reference tracks/restores exactly these,
        # optimize_energy.py:149-163); saving the post-update omega would
        # return params one Adam step past the best point
        best_omega = jnp.where(improved[:, None, None], omega, best_omega)
        patience_ctr = jnp.where(
            improved, 0, jnp.where(active, patience_ctr + 1, patience_ctr))
        updates, new_opt_state = opt.update(grads, opt_state, omega)
        new_omega = optax.apply_updates(omega, updates)
        omega = jnp.where(active, new_omega, omega)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(active, new, old),
            new_opt_state, opt_state)
        return (omega, opt_state, best_omega, best_e, patience_ctr), None

    def cond(state):
        step, carry = state
        return jnp.logical_and(step < cfg.steps,
                               jnp.min(carry[4]) <= cfg.patience)

    def body(state):
        step, carry = state
        carry, _ = jax.lax.scan(scan_step, carry, step + jnp.arange(block))
        return step + block, carry

    state = (0, (omega0, opt.init(omega0), omega0, e0,
                 jnp.zeros(omega0.shape[0], jnp.int32)))
    _, (_, _, best_omega, best_e, _) = jax.lax.while_loop(cond, body, state)
    # report exact energies at the restored best params (reduced kernel
    # precision only ever steers the trajectory, mirror of _optimize_scan)
    exact_loss = make_loss_fn(decoders, basis, _exact_cfg(cfg))
    _, best_e = exact_loss(best_omega, a, b, key, num_active)
    return best_omega, best_e


def optimize_spline_early_stopping(decoders, omega0, a, b, basis,
                                   cfg: GeodesicConfig, key=None,
                                   num_active=None) -> GeodesicResult:
    """Best-params-restoring early-stopped optimization (batched over B with
    per-spline patience counters; the loop exits when every spline is out of
    patience or the step budget is spent)."""
    # guard at THIS public entry (mirror of sharded_optimize_splines): the
    # while-loop optimizer runs a single constant phase, so silently
    # accepting a phase_plan / coarse+polish recipe would drop the
    # full-resolution pass the recipes' dominance evidence depends on
    if cfg.phase_plan or (cfg.traj_num_t is not None and cfg.polish_steps > 0):
        raise ValueError(
            "early stopping and the multi-phase fast recipes (traj_num_t + "
            "polish_steps, or phase_plan) are mutually exclusive — pick one")
    if key is None:
        key = jax.random.PRNGKey(0)
    omega, e = _optimize_early_stop(
        decoders, omega0, a, b, jnp.asarray(basis), key, cfg,
        num_active,
    )
    return GeodesicResult(omega=omega, energy=e, lengths=jnp.sqrt(e))
