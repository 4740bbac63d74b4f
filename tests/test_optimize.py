"""Geodesic-optimization tests: convergence, semantics, golden end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_reference
from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
from vae_latent_geometry_tpu.geometry import energy as E
from vae_latent_geometry_tpu.geometry.spline import design_matrix, eval_spline_design
from vae_latent_geometry_tpu.models import nets
from vae_latent_geometry_tpu.models.evae import stack_decoders
from vae_latent_geometry_tpu.optim.geodesic import (
    optimize_splines,
    optimize_spline_early_stopping,
)


def _small_cfg(**kw):
    energy = EnergyConfig(**kw.pop("energy", {}))
    return GeodesicConfig(steps=kw.pop("steps", 100), lr=kw.pop("lr", 1e-2),
                          energy=energy, **kw)


@pytest.fixture(scope="module")
def toy_problem():
    """A decoder with a strong nonlinearity so geodesics curve away from
    straight lines and optimization visibly reduces energy.

    Uses its OWN generator: the shared session rng's draw position shifts
    whenever tests are added elsewhere, silently changing this problem."""
    rng = np.random.default_rng(1234)
    key = jax.random.PRNGKey(7)
    dec = nets.decoder_init(key, 2, 16, (32, 32))
    B = 4
    a = jnp.asarray(rng.normal(size=(B, 2)) * 2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)) * 2, jnp.float32)
    basis, _ = nullspace_basis(4)
    omega0 = jnp.zeros((B, basis.shape[1], 2))
    return dec, a, b, basis, omega0


def test_energy_decreases_single(toy_problem):
    dec, a, b, basis, omega0 = toy_problem
    cfg = _small_cfg(energy={"mode": "single", "num_t": 128})
    res = optimize_splines(dec, omega0, a, b, basis, cfg,
                           key=jax.random.PRNGKey(0), record_history=True)
    hist = np.asarray(res.energy_history)
    assert hist.shape == (cfg.steps, 4)
    # initial straight-line energy vs final (1% slack: a spline whose
    # straight line is already near-optimal can wiggle within f32 noise)
    assert np.all(res.energy <= hist[0] * 1.01 + 1e-6)
    assert np.mean(hist[-1] / hist[0]) < 0.999  # strictly improved on average
    assert np.all(np.isfinite(np.asarray(res.omega)))
    np.testing.assert_allclose(np.asarray(res.lengths),
                               np.sqrt(np.asarray(res.energy)), rtol=1e-6)


def test_endpoints_pinned_after_optimization(toy_problem):
    dec, a, b, basis, omega0 = toy_problem
    cfg = _small_cfg(energy={"mode": "single", "num_t": 128})
    res = optimize_splines(dec, omega0, a, b, basis, cfg)
    t = jnp.array([0.0, 1.0])
    phi = design_matrix(t, jnp.asarray(basis), 4)
    gamma = eval_spline_design(res.omega, a, b, phi, t)
    np.testing.assert_allclose(np.asarray(gamma[0]), np.asarray(a), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gamma[1]), np.asarray(b), atol=1e-4)


def test_mc_and_expected_agree_at_convergence(toy_problem, rng):
    """MC and expected-energy optimization find the same minimizer for a
    small ensemble (MC noise averages out over steps)."""
    key = jax.random.PRNGKey(11)
    decs = stack_decoders([
        nets.decoder_init(k, 2, 12, (24,)) for k in jax.random.split(key, 3)
    ])
    B = 3
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    omega0 = jnp.zeros((B, basis.shape[1], 2))

    cfg_mc = _small_cfg(steps=300, energy={"mode": "mc", "num_t": 96})
    cfg_exp = _small_cfg(steps=300, energy={"mode": "expected", "num_t": 96})
    res_mc = optimize_splines(decs, omega0, a, b, basis, cfg_mc,
                              key=jax.random.PRNGKey(1))
    res_exp = optimize_splines(decs, omega0, a, b, basis, cfg_exp)
    # compare converged expected-energies of both solutions
    t = jnp.linspace(0.0, 1.0, 96)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    e_of = lambda om: np.asarray(
        E.energy_expected(decs, eval_spline_design(om, a, b, phi, t))
    )
    np.testing.assert_allclose(e_of(res_mc.omega), e_of(res_exp.omega), rtol=2e-2)


def test_cosine_schedule_converges(toy_problem):
    """The warmup+cosine schedule is a drop-in: energies finite, endpoints
    pinned, and final energies no worse than the constant-lr run (on this
    toy problem the front-loaded lr converges at least as well)."""
    dec, a, b, basis, omega0 = toy_problem
    cfg_c = _small_cfg(energy={"mode": "single", "num_t": 128})
    cfg_cos = _small_cfg(lr=3e-2, lr_schedule="cosine", lr_warmup=10,
                         energy={"mode": "single", "num_t": 128})
    res_c = optimize_splines(dec, omega0, a, b, basis, cfg_c)
    res_cos = optimize_splines(dec, omega0, a, b, basis, cfg_cos)
    assert np.all(np.isfinite(np.asarray(res_cos.energy)))
    assert np.all(np.asarray(res_cos.energy)
                  <= np.asarray(res_c.energy) * 1.02 + 1e-6)


def test_unknown_schedule_raises(toy_problem):
    dec, a, b, basis, omega0 = toy_problem
    cfg = _small_cfg(lr_schedule="sgdr",
                     energy={"mode": "single", "num_t": 128})
    with pytest.raises(ValueError, match="sgdr"):
        optimize_splines(dec, omega0, a, b, basis, cfg)


def test_traj_num_t_reports_full_resolution(toy_problem):
    """traj_num_t only steers the trajectory: the returned energies must be
    the FULL-resolution (energy.num_t) float32 evaluation of the returned
    omega, and the coarse-trajectory solution must land near the
    full-resolution one."""
    dec, a, b, basis, omega0 = toy_problem
    cfg_full = _small_cfg(energy={"mode": "single", "num_t": 256})
    cfg_coarse = dataclasses.replace(cfg_full, traj_num_t=64)
    res_full = optimize_splines(dec, omega0, a, b, basis, cfg_full)
    res_coarse = optimize_splines(dec, omega0, a, b, basis, cfg_coarse)

    # contract: reported energy == explicit full-T evaluation of omega
    t = jnp.linspace(0.0, 1.0, 256)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    gamma = eval_spline_design(res_coarse.omega, a, b, phi, t)
    e_explicit = np.asarray(E.energy_single(dec, gamma))
    np.testing.assert_allclose(np.asarray(res_coarse.energy), e_explicit,
                               rtol=1e-5)
    # quality: coarse trajectory lands near the full-resolution solution
    np.testing.assert_allclose(np.asarray(res_coarse.energy),
                               np.asarray(res_full.energy), rtol=2e-2)


def test_two_phase_polish_contract(toy_problem):
    """The two-phase fast recipe (coarse trajectory + full-T polish):
    reported energies are exact full-T evaluations of the returned omega,
    endpoints stay pinned, the history concatenates both phases, and the
    polished solution is at least as good as the coarse-only one."""
    dec, a, b, basis, omega0 = toy_problem
    cfg_coarse = _small_cfg(steps=120,
                            energy={"mode": "single", "num_t": 256},
                            traj_num_t=64)
    cfg_two = dataclasses.replace(cfg_coarse, polish_steps=60,
                                  polish_lr=1e-2)
    res_coarse = optimize_splines(dec, omega0, a, b, basis, cfg_coarse)
    res_two = optimize_splines(dec, omega0, a, b, basis, cfg_two,
                               record_history=True)

    hist = np.asarray(res_two.energy_history)
    assert hist.shape == (120 + 60, 4)
    # reported energy == explicit full-T evaluation of the returned omega
    t = jnp.linspace(0.0, 1.0, 256)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    gamma = eval_spline_design(res_two.omega, a, b, phi, t)
    e_explicit = np.asarray(E.energy_single(dec, gamma))
    np.testing.assert_allclose(np.asarray(res_two.energy), e_explicit,
                               rtol=1e-5)
    # polish never hurts: per-spline energies <= the coarse-only run's
    assert np.all(np.asarray(res_two.energy)
                  <= np.asarray(res_coarse.energy) * 1.001 + 1e-6)
    np.testing.assert_allclose(np.asarray(gamma[0]), np.asarray(a), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gamma[-1]), np.asarray(b), atol=1e-4)


def test_two_phase_ignored_without_traj_num_t(toy_problem):
    """polish_steps without traj_num_t is a no-op: identical results to the
    plain single-phase run (the contract documented in config.py)."""
    dec, a, b, basis, omega0 = toy_problem
    cfg_plain = _small_cfg(energy={"mode": "single", "num_t": 128})
    cfg_polish = dataclasses.replace(cfg_plain, polish_steps=50)
    res_plain = optimize_splines(dec, omega0, a, b, basis, cfg_plain)
    res_polish = optimize_splines(dec, omega0, a, b, basis, cfg_polish)
    np.testing.assert_array_equal(np.asarray(res_plain.omega),
                                  np.asarray(res_polish.omega))


def test_early_stopping_not_worse_than_fixed(toy_problem):
    dec, a, b, basis, omega0 = toy_problem
    cfg = _small_cfg(steps=150, patience=30, delta=1e-6,
                     energy={"mode": "single", "num_t": 128})
    res_es = optimize_spline_early_stopping(dec, omega0, a, b, basis, cfg)
    res_fix = optimize_splines(dec, omega0, a, b, basis, cfg)
    # best-restored energies are never worse than the fixed-loop endpoint
    assert np.all(np.asarray(res_es.energy)
                  <= np.asarray(res_fix.energy) * 1.05 + 1e-6)


# Per-blob golden tolerances, set from measurement (2026-08-17, 400 steps
# lr 1e-2 T=128, evaluated at T=2000) with ~50% headroom:
#   seed12/euclidean  med_rel 0.0709 corr 0.980   (the reference's most
#     under-converged blob: at 800 steps our energies drop strictly BELOW
#     its stored solutions on every pair — see the dominance criterion —
#     which bounds how closely under-converged lengths can be matched)
#   seed12/entropy    med_rel 0.0071 corr 0.995
#   seed123/euclidean med_rel 0.0118 corr 0.988
#   seed123/entropy   med_rel 0.0081 corr 0.995
_GOLDEN_ENSEMBLE_BOUNDS = {
    (12, "euclidean"): 0.11,
    (12, "entropy"): 0.02,
    (123, "euclidean"): 0.04,
    (123, "entropy"): 0.02,
}


@requires_reference
@pytest.mark.parametrize("seed,init", sorted(_GOLDEN_ENSEMBLE_BOUNDS))
def test_golden_ensemble_all_blobs(seed, init):
    """Real-data ensemble goldens for ALL FOUR committed opt blobs (seeds
    12/123 x euclidean/entropy init — round-2 verdict item 2a): optimize
    from the reference's own Dijkstra+LBFGS ``omega_init`` and require
    (a) mean energy dominance — our expected-energy minimizers are at least
    as good as the reference's stored 1000-step MC solutions, and
    (b) stored-length agreement within the measured per-blob tolerance
    (tightened from the former blanket 10%; see bounds above), plus length
    correlation.  The 800-step strict per-pair dominance artifact lives in
    ``experiment/golden_ensemble_compare.json`` (regenerate.py)."""
    from vae_latent_geometry_tpu.models.torch_import import (
        load_evae_checkpoint,
        load_spline_blob,
    )

    params = load_evae_checkpoint(
        f"/root/reference/experiment/model_seed{seed}.pt")
    blob = load_spline_blob(
        f"/root/reference/experiment/splines_opt_model_seed{seed}/"
        f"spline_batch_opt_{init}_10.pt"
    )
    data = blob["spline_data"]
    a = jnp.stack([jnp.asarray(d["a"]) for d in data])
    b = jnp.stack([jnp.asarray(d["b"]) for d in data])
    stored = np.array([d["geodesic_length"] for d in data])
    basis = np.asarray(data[0]["basis"])
    omega0 = jnp.stack([jnp.asarray(d["omega_init"]) for d in data])

    cfg = GeodesicConfig(steps=400, lr=1e-2,
                         energy=EnergyConfig(num_t=128, mode="expected"))
    res = optimize_splines(params.decoders, omega0, a, b, basis, cfg)

    # evaluate converged curves at the reference quadrature (T=2000)
    t = jnp.linspace(0.0, 1.0, 2000)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    gamma = eval_spline_design(res.omega, a, b, phi, t)
    e_ours = np.asarray(E.energy_expected(params.decoders, gamma))
    lengths = np.sqrt(e_ours)

    om_ref = jnp.stack([jnp.asarray(d["omega_optimized"]) for d in data])
    g_ref = eval_spline_design(om_ref, a, b, phi, t)
    e_ref = np.asarray(E.energy_expected(params.decoders, g_ref))
    ratio = e_ours / e_ref
    # (a) dominance in the mean at 400 steps (strict per-pair dominance needs
    # ~800 steps — measured worst per-pair ratios 0.997-1.0002 there; at 400
    # a few slow pairs can still sit above the reference's best)
    assert np.mean(ratio) < 1.02, f"mean energy ratio {np.mean(ratio):.4f}"
    assert np.max(ratio) < 1.25, f"worst energy ratio {np.max(ratio):.4f}"
    # (b) stored-length agreement + correlation
    rel = np.abs(lengths - stored) / stored
    bound = _GOLDEN_ENSEMBLE_BOUNDS[(seed, init)]
    assert np.median(rel) < bound, (
        f"median rel dev {np.median(rel):.4f} (bound {bound})")
    corr = np.corrcoef(lengths, stored)[0, 1]
    assert corr > 0.97, f"length correlation {corr:.4f}"


def test_mc_scan_mode_in_optimizer(toy_problem):
    """mc_scan energy mode runs in the optimizer (memory-flat MC)."""
    from vae_latent_geometry_tpu.models.evae import stack_decoders
    from vae_latent_geometry_tpu.models import nets

    decs = stack_decoders([
        nets.decoder_init(k, 2, 16, (32, 32))
        for k in jax.random.split(jax.random.PRNGKey(0), 3)
    ])
    _, a, b, basis, omega0 = toy_problem
    cfg = _small_cfg(steps=30, energy={"mode": "mc_scan", "num_t": 96})
    res = optimize_splines(decs, omega0, a, b, basis, cfg,
                           key=jax.random.PRNGKey(2), record_history=True)
    hist = np.asarray(res.energy_history)
    assert np.isfinite(hist).all()
    assert hist[-1].mean() < hist[0].mean()


def test_early_stop_and_fast_recipe_mutually_exclusive(toy_problem):
    """pipeline.optimize_stage refuses early_stop + two-phase fast recipe
    (the while-loop optimizer has no polish phase)."""
    from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    dec, a, b, basis, omega0 = toy_problem
    art = SplineBatchArtifact(
        a=np.asarray(a), b=np.asarray(b), omega_init=np.asarray(omega0),
        basis=np.asarray(basis), n_poly=4,
        pair_indices=np.zeros((len(a), 2), np.int64),
        valid=np.ones(len(a), bool),
        pair_labels=[["x", "y"]] * len(a), representatives=[])
    cfg = _small_cfg(steps=10, early_stop=True, traj_num_t=32,
                     polish_steps=5,
                     energy={"mode": "single", "num_t": 64})
    with pytest.raises(ValueError, match="mutually exclusive"):
        optimize_spline_batch(dec, art, cfg=cfg)


def test_phase_plan_generalizes_two_phase(toy_problem):
    """A phase_plan mirroring the two-phase recipe entry-for-entry produces
    bitwise-identical omega (same phases, same key stream): the ladder
    mechanism is a strict generalization, not a parallel code path."""
    dec, a, b, basis, omega0 = toy_problem
    cfg_two = _small_cfg(steps=120, lr=1e-2, lr_schedule="cosine",
                         energy={"mode": "single", "num_t": 256},
                         traj_num_t=64, polish_steps=60, polish_lr=1e-2)
    cfg_plan = _small_cfg(steps=120, lr=1e-2,
                          energy={"mode": "single", "num_t": 256},
                          phase_plan=((120, 64, "cosine", 1e-2),
                                      (60, 256, "constant", 1e-2)))
    res_two = optimize_splines(dec, omega0, a, b, basis, cfg_two)
    res_plan = optimize_splines(dec, omega0, a, b, basis, cfg_plan)
    np.testing.assert_array_equal(np.asarray(res_two.omega),
                                  np.asarray(res_plan.omega))
    np.testing.assert_array_equal(np.asarray(res_two.energy),
                                  np.asarray(res_plan.energy))


def test_phase_plan_reports_full_resolution_energy(toy_problem):
    """Three-phase ladder: reported energies are exact full-num_t
    evaluations of the returned omega and endpoints stay pinned, even when
    no ladder phase runs at the full resolution."""
    dec, a, b, basis, omega0 = toy_problem
    cfg = _small_cfg(steps=1, energy={"mode": "single", "num_t": 256},
                     phase_plan=((80, 32, "cosine", 1e-2),
                                 (40, 64, "constant", 1e-2),
                                 (20, 128, "constant", 1e-2)))
    res = optimize_splines(dec, omega0, a, b, basis, cfg)
    t = jnp.linspace(0.0, 1.0, 256)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    gamma = eval_spline_design(res.omega, a, b, phi, t)
    e_explicit = np.asarray(E.energy_single(dec, gamma))
    np.testing.assert_allclose(np.asarray(res.energy), e_explicit, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gamma[0]), np.asarray(a), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gamma[-1]), np.asarray(b), atol=1e-4)


def test_phase_plan_rejects_malformed_entries(toy_problem):
    from vae_latent_geometry_tpu.optim.geodesic import _phase_cfgs

    with pytest.raises(ValueError, match=r"phase_plan\[1\] must be"):
        _phase_cfgs(_small_cfg(phase_plan=((10, 32, "constant", 1e-2),
                                           (10, 32))))
    with pytest.raises(ValueError, match=r"phase_plan\[0\].*steps >= 1"):
        _phase_cfgs(_small_cfg(phase_plan=((0, 32, "constant", 1e-2),)))
    with pytest.raises(ValueError, match=r"lr > 0"):
        _phase_cfgs(_small_cfg(phase_plan=((10, 32, "constant", 0.0),)))


def test_early_stop_and_phase_plan_mutually_exclusive(toy_problem):
    from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    dec, a, b, basis, omega0 = toy_problem
    art = SplineBatchArtifact(
        a=np.asarray(a), b=np.asarray(b), omega_init=np.asarray(omega0),
        basis=np.asarray(basis), n_poly=4,
        pair_indices=np.zeros((len(a), 2), np.int64),
        valid=np.ones(len(a), bool),
        pair_labels=[["x", "y"]] * len(a), representatives=[])
    cfg = _small_cfg(steps=10, early_stop=True,
                     phase_plan=((10, 32, "constant", 1e-2),),
                     energy={"mode": "single", "num_t": 64})
    with pytest.raises(ValueError, match="mutually exclusive"):
        optimize_spline_batch(dec, art, cfg=cfg)


def test_early_stop_restores_the_params_that_achieved_best_energy(toy_problem):
    """Regression: best_omega must be the PRE-update params that achieved
    the recorded best energy (reference optimize_energy.py:149-163), not the
    params one Adam step past it.

    Deterministic 2-step construction (mode=single is key-independent):
    step 0 evaluates omega_0 and moves to omega_1; step 1 evaluates
    omega_1 — the only possible improvement event — and moves to omega_2.
    Correct semantics return E(omega_1); the off-by-one bug returned
    E(omega_2), one descent step lower here (and arbitrarily higher on an
    overshoot)."""
    from vae_latent_geometry_tpu.optim.geodesic import _optimize_early_stop

    dec, a, b, basis, omega0 = toy_problem
    kw = dict(lr=2e-2, patience=100, energy={"mode": "single", "num_t": 64})
    key = jax.random.PRNGKey(3)
    basis_j = jnp.asarray(basis)

    # omega_1 and its exact energy via the fixed-step optimizer (identical
    # first step: same loss, same Adam init)
    res1 = optimize_splines(dec, omega0, a, b, basis,
                            _small_cfg(steps=1, **kw), key=key)
    res2 = optimize_splines(dec, omega0, a, b, basis,
                            _small_cfg(steps=2, **kw), key=key)
    e1, e2 = np.asarray(res1.energy), np.asarray(res2.energy)
    e0 = np.asarray(E.energy_single(
        dec, eval_spline_design(omega0, a, b,
                                design_matrix(jnp.linspace(0., 1., 64),
                                              basis_j, 4),
                                jnp.linspace(0., 1., 64))))
    # expected contract value per spline: E(omega_1) when step 1 improved
    # on omega_0 (tracker update fires), else E(omega_0)
    improved = e1 < e0 * (1.0 - 1e-6)
    expected = np.where(improved, e1, e0)
    # preconditions: at least one spline improves, and on improving splines
    # E(omega_2) differs measurably from E(omega_1) so the assertion can
    # discriminate the off-by-one
    assert improved.any(), "no spline improved on step 1; adjust lr"
    # must exceed the allclose tolerance below by a wide margin
    assert (np.abs(e2 - e1)[improved] > 20e-5 * e1[improved]).all(), \
        "steps too similar to discriminate the off-by-one"

    _, e_best = _optimize_early_stop(
        dec, omega0, a, b, basis_j, key, _small_cfg(steps=2, **kw), None,
        block=2)
    np.testing.assert_allclose(np.asarray(e_best), expected, rtol=1e-5)


def test_early_stop_step_budget_is_exact(toy_problem):
    """Regression: cfg.steps is an exact Adam-update budget even when it is
    not a multiple of the scan block — the tail of the final partial block
    must be a masked no-op (omega, optimizer state, best/patience all
    frozen).  The bug ran a full final block (steps=120, block=50 -> 150
    updates).  Witness: block=50 (partial final block) must match block=40
    (exact division) bitwise; mode='single' is key-independent so the only
    possible divergence is extra steps."""
    from vae_latent_geometry_tpu.optim.geodesic import _optimize_early_stop

    dec, a, b, basis, omega0 = toy_problem
    kw = dict(lr=1e-2, patience=10_000, delta=1e-12,
              energy={"mode": "single", "num_t": 64})
    key = jax.random.PRNGKey(0)
    basis_j = jnp.asarray(basis)
    cfg = _small_cfg(steps=120, **kw)

    om_50, e_50 = _optimize_early_stop(dec, omega0, a, b, basis_j, key, cfg,
                                       None, block=50)
    om_40, e_40 = _optimize_early_stop(dec, omega0, a, b, basis_j, key, cfg,
                                       None, block=40)
    np.testing.assert_array_equal(np.asarray(om_50), np.asarray(om_40))
    np.testing.assert_array_equal(np.asarray(e_50), np.asarray(e_40))

    # discriminability: 30 further steps (the bug's overrun) land on a
    # measurably different best energy, so the equality above is not vacuous
    _, e_150 = _optimize_early_stop(
        dec, omega0, a, b, basis_j, key, _small_cfg(steps=150, **kw), None,
        block=50)
    assert not np.allclose(np.asarray(e_150), np.asarray(e_50), rtol=1e-7)


def _toy_artifact(toy_problem):
    from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact

    _, a, b, basis, omega0 = toy_problem
    return SplineBatchArtifact(
        a=np.asarray(a), b=np.asarray(b), omega_init=np.asarray(omega0),
        basis=np.asarray(basis), n_poly=4,
        pair_indices=np.stack([np.arange(len(a)),
                               np.arange(len(a)) + len(a)], 1),
        valid=np.ones(len(a), bool),
        pair_labels=[["x", "y"]] * len(a), representatives=[])


def test_merge_spline_batches_takes_per_pair_best(toy_problem):
    """min-merge semantics: shorter length wins per pair, finite beats NaN,
    metadata records how many pairs the backstop arm won."""
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        merge_spline_batches,
    )

    art = _toy_artifact(toy_problem)
    B = len(art.a)
    l1 = np.array([1.0, 2.0, np.nan, 4.0])
    l2 = np.array([1.5, 1.0, 3.0, np.nan])
    om1 = np.full((B, art.basis.shape[1], 2), 1.0, np.float32)
    om2 = np.full((B, art.basis.shape[1], 2), 2.0, np.float32)
    r1 = dataclasses.replace(art, omega_optimized=om1, geodesic_length=l1)
    r2 = dataclasses.replace(art, omega_optimized=om2, geodesic_length=l2)
    m = merge_spline_batches(r1, r2)
    np.testing.assert_array_equal(m.geodesic_length, [1.0, 1.0, 3.0, 4.0])
    np.testing.assert_array_equal(
        np.asarray(m.omega_optimized)[:, 0, 0], [1.0, 2.0, 2.0, 1.0])
    assert m.metadata["backstop_selected"] == 2


def test_merge_spline_batches_rejects_mismatched_or_unoptimized(toy_problem):
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        merge_spline_batches,
    )

    art = _toy_artifact(toy_problem)
    B = len(art.a)
    om = np.zeros((B, art.basis.shape[1], 2), np.float32)
    opt = dataclasses.replace(art, omega_optimized=om,
                              geodesic_length=np.ones(B))
    with pytest.raises(ValueError, match="OPTIMIZED"):
        merge_spline_batches(opt, art)
    other = dataclasses.replace(opt, pair_indices=opt.pair_indices + 1)
    with pytest.raises(ValueError, match="same pair set"):
        merge_spline_batches(opt, other)
    # same pair_indices but different endpoints (e.g. two model seeds over
    # the same selected pairs): the curves are not interchangeable — the
    # merged omega would be evaluated against the wrong endpoint nodes
    other_model = dataclasses.replace(
        opt, a=np.asarray(opt.a) + 0.1,
        geodesic_length=np.full(B, 0.5))
    with pytest.raises(ValueError, match="'a'"):
        merge_spline_batches(opt, other_model)
    other_basis = dataclasses.replace(
        opt, basis=np.asarray(opt.basis) * 2.0)
    with pytest.raises(ValueError, match="'basis'"):
        merge_spline_batches(opt, other_basis)


def test_backstop_dominates_both_arms(toy_problem):
    """optimize_spline_batch_backstop: the merged result is elementwise
    not-worse than BOTH the primary (aggressive coarse ladder) and the
    backstop (fixed-recipe analogue) run separately."""
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
        optimize_spline_batch_backstop,
    )

    dec, a, b, basis, omega0 = toy_problem
    art = _toy_artifact(toy_problem)
    primary = _small_cfg(steps=60, energy={"mode": "single", "num_t": 128},
                         phase_plan=((60, 32, "cosine", 3e-2),
                                     (10, 128, "constant", 1e-2)))
    backstop = _small_cfg(steps=80, lr=1e-2,
                          energy={"mode": "single", "num_t": 128})
    r1 = optimize_spline_batch(dec, art, cfg=primary, log_every_chunk=False)
    r2 = optimize_spline_batch(dec, art, cfg=backstop, log_every_chunk=False)
    merged = optimize_spline_batch_backstop(
        dec, art, cfg=primary, backstop_cfg=backstop, log_every_chunk=False)
    lm = np.asarray(merged.geodesic_length)
    np.testing.assert_allclose(
        lm, np.minimum(np.asarray(r1.geodesic_length),
                       np.asarray(r2.geodesic_length)), rtol=1e-7)
    assert merged.metadata["backstop_selected"] >= 0
    # the winning omega is carried with its length: re-evaluating the
    # merged omegas reproduces the merged lengths
    t = jnp.linspace(0.0, 1.0, 128)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    gamma = eval_spline_design(jnp.asarray(merged.omega_optimized),
                               a, b, phi, t)
    # single-decoder batch semantics report data-space arc length
    np.testing.assert_allclose(
        lm, np.asarray(E.geodesic_lengths(dec, gamma)), rtol=1e-5)


def test_backstop_checkpoints_three_artifacts(toy_problem, tmp_path):
    from vae_latent_geometry_tpu.io.artifacts import load_spline_batch
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch_backstop,
    )

    dec, a, b, basis, omega0 = toy_problem
    art = _toy_artifact(toy_problem)
    ck = tmp_path / "opt.npz"
    merged = optimize_spline_batch_backstop(
        dec, art, cfg=_small_cfg(steps=20,
                                 energy={"mode": "single", "num_t": 64}),
        backstop_cfg=_small_cfg(steps=30, lr=1e-2,
                                energy={"mode": "single", "num_t": 64}),
        checkpoint_path=str(ck), log_every_chunk=False)
    assert ck.exists()
    assert (tmp_path / "opt.primary.npz").exists()
    assert (tmp_path / "opt.backstop.npz").exists()
    np.testing.assert_array_equal(
        np.asarray(load_spline_batch(str(ck)).geodesic_length),
        np.asarray(merged.geodesic_length))


def test_expected_rescaled_as_top_level_mode():
    """Round-4 regression: the quadrature-transfer mode as the TOP-LEVEL
    energy mode (not buried in a phase_plan) must optimize and report exact
    same-T expected energies — the final re-evaluation clears
    ``target_num_t``, which previously tripped the mode's own
    target_num_t-required check and raised at trace time."""
    rng = np.random.default_rng(5)
    decs = stack_decoders([
        nets.decoder_init(k, 2, 12, (24,))
        for k in jax.random.split(jax.random.PRNGKey(2), 3)
    ])
    B = 3
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    omega0 = jnp.zeros((B, basis.shape[1], 2))
    cfg = _small_cfg(steps=30, energy={"mode": "expected_rescaled",
                                       "num_t": 32, "target_num_t": 128})
    res = optimize_splines(decs, omega0, a, b, basis, cfg,
                           key=jax.random.PRNGKey(0))
    # reported energies are the exact expected closed form at the final
    # omegas on the full num_t grid (same-T semantics, r = 1)
    t = jnp.linspace(0.0, 1.0, 32)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    gamma = eval_spline_design(res.omega, a, b, phi, t)
    np.testing.assert_allclose(np.asarray(res.energy),
                               np.asarray(E.energy_expected(decs, gamma)),
                               rtol=1e-5)


def test_backstop_identical_configs_runs_one_arm(toy_problem, monkeypatch):
    """cfg == backstop_cfg must not double the wall clock merging a run
    with itself: one arm runs, the merge is trivial."""
    from vae_latent_geometry_tpu.pipeline import optimize_stage as mod

    dec, *_ = toy_problem
    art = _toy_artifact(toy_problem)
    calls = []
    real = mod.optimize_spline_batch

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(mod, "optimize_spline_batch", counting)
    cfg = _small_cfg(steps=20, energy={"mode": "single", "num_t": 64})
    merged = mod.optimize_spline_batch_backstop(
        dec, art, cfg=cfg, backstop_cfg=cfg, log_every_chunk=False)
    assert len(calls) == 1
    assert merged.metadata["backstop_selected"] == 0
    assert np.isfinite(np.asarray(merged.geodesic_length)).all()


def test_backstop_mc_modes_compare_noise_free(toy_problem):
    """MC-family energy modes report NOISY final energies (fresh decoder
    draws per arm), so the backstop merge switches both arms'
    final_energy_mode to the deterministic 'expected' closed form
    (= E[energy_mc]): the merged lengths are exactly the elementwise min of
    the two denoised arms, and the stamp records the switch."""
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
        optimize_spline_batch_backstop,
    )

    decs = stack_decoders([
        nets.decoder_init(k, 2, 12, (24,))
        for k in jax.random.split(jax.random.PRNGKey(3), 3)
    ])

    class P:
        decoders = decs

    art = _toy_artifact(toy_problem)
    primary = _small_cfg(steps=25, lr=2e-2,
                         energy={"mode": "mc", "num_t": 64})
    backstop = _small_cfg(steps=40, lr=5e-3,
                          energy={"mode": "mc", "num_t": 64})
    merged = optimize_spline_batch_backstop(
        P, art, cfg=primary, backstop_cfg=backstop, log_every_chunk=False)
    # expected_fused = the same deterministic expectation, via the
    # memory-flat kernel (falls back to XLA when shapes don't fit)
    assert '"final_energy_mode": "expected_fused"' in merged.metadata["recipe"]
    r1 = optimize_spline_batch(
        P, art, cfg=dataclasses.replace(primary,
                                        final_energy_mode="expected_fused"),
        log_every_chunk=False)
    r2 = optimize_spline_batch(
        P, art, cfg=dataclasses.replace(backstop,
                                        final_energy_mode="expected_fused"),
        log_every_chunk=False)
    np.testing.assert_array_equal(
        np.asarray(merged.geodesic_length),
        np.minimum(np.asarray(r1.geodesic_length),
                   np.asarray(r2.geodesic_length)))
    # an explicitly-set stochastic final mode is respected but warned about
    with pytest.warns(UserWarning, match="noise scale"):
        optimize_spline_batch_backstop(
            P, art, cfg=dataclasses.replace(primary, final_energy_mode="mc"),
            backstop_cfg=backstop, log_every_chunk=False)


def test_early_stopping_refuses_multiphase_recipes(toy_problem):
    """Guard at the public early-stopping entry: a phase_plan or
    coarse+polish recipe would be silently dropped by the single-phase
    while-loop optimizer."""
    dec, a, b, basis, omega0 = toy_problem
    cfg = _small_cfg(steps=20, energy={"mode": "single", "num_t": 32},
                     phase_plan=((10, 16, "cosine", 1e-2),
                                 (10, 32, "constant", 1e-3)))
    with pytest.raises(ValueError, match="mutually exclusive"):
        optimize_spline_early_stopping(dec, omega0, a, b, basis, cfg)
    cfg2 = _small_cfg(steps=20, traj_num_t=16, polish_steps=5,
                      energy={"mode": "single", "num_t": 32})
    with pytest.raises(ValueError, match="mutually exclusive"):
        optimize_spline_early_stopping(dec, omega0, a, b, basis, cfg2)


def test_resume_refuses_checkpoint_from_different_inputs(toy_problem,
                                                         tmp_path, capsys):
    """The resume stamp binds the INPUT artifact identity: a checkpoint
    computed from different endpoints at the same pair count and config
    must be discarded and recomputed, not adopted."""
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    dec, *_ = toy_problem
    art = _toy_artifact(toy_problem)
    cfg = _small_cfg(steps=25, energy={"mode": "single", "num_t": 64})
    ckpt = str(tmp_path / "resume.npz")
    optimize_spline_batch(dec, art, cfg=cfg, checkpoint_path=ckpt,
                          log_every_chunk=False)
    # same pair count + config, DIFFERENT endpoints
    art2 = dataclasses.replace(art, a=np.asarray(art.a) + 0.37)
    res2 = optimize_spline_batch(dec, art2, cfg=cfg, checkpoint_path=ckpt,
                                 log_every_chunk=False)
    err = capsys.readouterr().err
    assert "different config" in err or "cannot be validated" in err
    fresh = optimize_spline_batch(dec, art2, cfg=cfg, log_every_chunk=False)
    np.testing.assert_array_equal(np.asarray(res2.geodesic_length),
                                  np.asarray(fresh.geodesic_length))


def test_resume_stamp_ignores_result_neutral_fields(toy_problem, tmp_path,
                                                    capsys):
    """A checkpoint must stay resumable across flags that provably cannot
    change any produced value (gradonly_traj: bit-identical both ways,
    test below) — refusing it would discard every finished chunk of a
    long run over a how-not-what flag, and would orphan checkpoints
    written before the flag existed."""
    import dataclasses as dc

    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        _recipe_stamp,
        optimize_spline_batch,
    )

    dec, *_ = toy_problem
    art = _toy_artifact(toy_problem)
    cfg_on = _small_cfg(steps=25, energy={"mode": "single", "num_t": 64})
    cfg_off = dc.replace(cfg_on, energy=dc.replace(cfg_on.energy,
                                                   gradonly_traj=False))
    assert _recipe_stamp(cfg_on) == _recipe_stamp(cfg_off)
    assert "gradonly_traj" not in _recipe_stamp(cfg_on)

    ckpt = str(tmp_path / "resume.npz")
    res1 = optimize_spline_batch(dec, art, cfg=cfg_on, checkpoint_path=ckpt,
                                 log_every_chunk=False)
    capsys.readouterr()
    res2 = optimize_spline_batch(dec, art, cfg=cfg_off, checkpoint_path=ckpt,
                                 log_every_chunk=True)
    err = capsys.readouterr().err
    assert "different config" not in err and "cannot be validated" not in err
    np.testing.assert_array_equal(np.asarray(res1.geodesic_length),
                                  np.asarray(res2.geodesic_length))


def test_gradonly_traj_identical_trajectory(toy_problem, rng):
    """The grad-only trajectory path (skip the fused fwd kernel on steps
    whose energy value is discarded) must produce the SAME optimization as
    the value-computing path: gradients are defined by the same backward
    kernel either way (its residuals are the inputs alone)."""
    key = jax.random.PRNGKey(21)
    decs = stack_decoders([
        nets.decoder_init(k, 2, 12, (24,)) for k in jax.random.split(key, 3)
    ])
    B = 3
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    omega0 = jnp.zeros((B, basis.shape[1], 2))

    for mode in ("expected_fused", "mc_fused"):
        cfg_on = _small_cfg(steps=40, energy={
            "mode": mode, "num_t": 32, "mc_inkernel_rng": False})
        cfg_off = dataclasses.replace(cfg_on, energy=dataclasses.replace(
            cfg_on.energy, gradonly_traj=False))
        # num_active exercises the CoV path's per-spline weight plane
        # through the grad-only branch as well
        num_active = np.array([1, 2, 3])
        r_on = optimize_splines(decs, omega0, a, b, basis, cfg_on,
                                key=jax.random.PRNGKey(5),
                                num_active=num_active)
        r_off = optimize_splines(decs, omega0, a, b, basis, cfg_off,
                                 key=jax.random.PRNGKey(5),
                                 num_active=num_active)
        np.testing.assert_allclose(np.asarray(r_on.omega),
                                   np.asarray(r_off.omega),
                                   rtol=0, atol=1e-6, err_msg=mode)
        np.testing.assert_allclose(np.asarray(r_on.energy),
                                   np.asarray(r_off.energy),
                                   rtol=1e-6, err_msg=mode)


def test_gradonly_grad_bitwise_matches_value_path(toy_problem, rng):
    """Point check: jax.grad through the grad-only loss equals the
    value_and_grad gradient exactly (same backward kernel, same residuals)
    for every fused family, including the single-decoder fast path."""
    from vae_latent_geometry_tpu.optim.geodesic import make_loss_fn

    key = jax.random.PRNGKey(22)
    decs = stack_decoders([
        nets.decoder_init(k, 2, 12, (24,)) for k in jax.random.split(key, 3)
    ])
    single = nets.decoder_init(jax.random.PRNGKey(23), 2, 12, (24,))
    B = 3
    a = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
    basis, _ = nullspace_basis(4)
    omega = jnp.asarray(rng.normal(size=(B, basis.shape[1], 2)) * 0.05,
                        jnp.float32)
    for mode, dec in (("expected_fused", decs), ("mc_fused", decs),
                      ("single_fused", single)):
        cfg = _small_cfg(energy={"mode": mode, "num_t": 32,
                                 "mc_inkernel_rng": False})
        k = jax.random.PRNGKey(9)
        gv, ev = jax.grad(make_loss_fn(dec, basis, cfg, grad_only=False),
                          has_aux=True)(omega, a, b, k, None)
        gg, eg = jax.grad(make_loss_fn(dec, basis, cfg, grad_only=True),
                          has_aux=True)(omega, a, b, k, None)
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(gg),
                                      err_msg=mode)
        # the grad-only primal is zeros by contract (value must not be read)
        np.testing.assert_array_equal(np.asarray(eg), np.zeros(B),
                                      err_msg=mode)
        assert np.all(np.asarray(ev) > 0), mode
