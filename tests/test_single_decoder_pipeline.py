"""Legacy single-decoder pipeline: mean head, optimize stage, golden parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_reference
from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
from vae_latent_geometry_tpu.models import nets
from vae_latent_geometry_tpu.models.vae import (
    LEGACY_CONFIG,
    VAEParams,
    mean_decoder,
    vae_init,
)


def test_mean_decoder_matches_full(rng):
    params = vae_init(jax.random.PRNGKey(0))
    z = jnp.asarray(rng.normal(size=(16, 2)), jnp.float32)
    mean_full, _ = nets.decoder_apply_full(params.decoder, z)
    mean_only = nets.decoder_apply(mean_decoder(params.decoder), z)
    np.testing.assert_allclose(np.asarray(mean_only), np.asarray(mean_full),
                               rtol=1e-6)


def test_vae_elbo_and_sample(rng):
    from vae_latent_geometry_tpu.models.vae import elbo, sample

    params = vae_init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.normal(size=(8, 50)), jnp.float32)
    val, recon, kl = elbo(params, jax.random.PRNGKey(2), x, beta=0.5,
                          return_parts=True)
    assert np.isfinite(float(val)) and np.isfinite(float(recon))
    assert float(val) == pytest.approx(float(recon) - 0.5 * float(kl), rel=1e-5)
    s = sample(params, jax.random.PRNGKey(3), n=4)
    assert s.shape == (4, 50)


def test_optimize_stage_single_mode(rng):
    """optimize_spline_batch with a VAEParams model: single-decoder energy +
    arc-length geodesic lengths."""
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    params = vae_init(jax.random.PRNGKey(4))
    basis, _ = nullspace_basis(4)
    P = 4
    art = SplineBatchArtifact(
        a=rng.normal(size=(P, 2)).astype(np.float32),
        b=rng.normal(size=(P, 2)).astype(np.float32),
        omega_init=np.zeros((P, 5, 2), np.float32),
        basis=basis, n_poly=4,
        pair_indices=np.arange(2 * P).reshape(P, 2),
        valid=np.ones(P, bool), pair_labels=[["a", "b"]] * P,
        representatives=[],
    )
    cfg = GeodesicConfig(steps=30, batch_size=4,
                         energy=EnergyConfig(num_t=64, mode="single"))
    out = optimize_spline_batch(params, art, cfg=cfg, log_every_chunk=False)
    assert np.isfinite(out.geodesic_length).all()
    assert out.geodesic_length.min() > 0


@requires_reference
def test_golden_single_decoder_optimization():
    """Optimize the reference's single-decoder init splines with our
    pipeline; resulting arc lengths must track the stored
    ``length_geodesic`` values (same init, same decoder, both converged)."""
    from vae_latent_geometry_tpu.geometry import energy as E
    from vae_latent_geometry_tpu.geometry.spline import (
        design_matrix,
        eval_spline_design,
    )
    from vae_latent_geometry_tpu.models.torch_import import (
        load_single_vae_checkpoint,
        load_spline_blob,
    )
    from vae_latent_geometry_tpu.optim.geodesic import optimize_splines

    raw = load_single_vae_checkpoint(
        "/root/reference/src/artifacts/vae_best_seed12.pth")
    decoder = mean_decoder(raw["decoder"])
    blob = load_spline_blob(
        "/root/reference/src/artifacts/spline_batch_optimized_batched_seed12.pt")
    data = blob["spline_data"][:40]
    a = jnp.stack([jnp.asarray(d["a"]) for d in data])
    b = jnp.stack([jnp.asarray(d["b"]) for d in data])
    omega0 = jnp.stack([jnp.asarray(d["omega_init"]) for d in data])
    basis = np.asarray(data[0]["basis"])
    stored = np.array([d["length_geodesic"] for d in data])

    cfg = GeodesicConfig(steps=250, lr=1e-2,
                         energy=EnergyConfig(num_t=128, mode="single"))
    res = optimize_splines(decoder, omega0, a, b, basis, cfg)
    t = jnp.linspace(0.0, 1.0, 2000)
    phi = design_matrix(t, jnp.asarray(basis), 4)
    gamma = eval_spline_design(res.omega, a, b, phi, t)
    ours = np.asarray(E.geodesic_lengths(decoder, gamma))
    rel = np.abs(ours - stored) / stored
    assert np.median(rel) < 0.02, f"median rel {np.median(rel):.4f}"
    assert np.corrcoef(ours, stored)[0, 1] > 0.99


def test_optimize_stage_resume(tmp_path, rng):
    """Interrupting after a partial run and re-invoking resumes from the
    per-chunk checkpoint instead of recomputing finished chunks."""
    import dataclasses

    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.io.artifacts import (
        SplineBatchArtifact,
        load_spline_batch,
        save_spline_batch,
    )
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    params = vae_init(jax.random.PRNGKey(4))
    basis, _ = nullspace_basis(4)
    P = 6
    art = SplineBatchArtifact(
        a=rng.normal(size=(P, 2)).astype(np.float32),
        b=rng.normal(size=(P, 2)).astype(np.float32),
        omega_init=np.zeros((P, 5, 2), np.float32),
        basis=basis, n_poly=4,
        pair_indices=np.arange(2 * P).reshape(P, 2),
        valid=np.ones(P, bool), pair_labels=[["a", "b"]] * P,
        representatives=[],
    )
    ckpt = str(tmp_path / "opt.npz")
    cfg = GeodesicConfig(steps=20, batch_size=3,
                         energy=EnergyConfig(num_t=48, mode="single"))
    full = optimize_spline_batch(params, art, cfg=cfg, checkpoint_path=ckpt,
                                 log_every_chunk=False)

    # simulate a crash after chunk 1: blank out chunk 2's results
    partial = load_spline_batch(ckpt)
    glen = np.array(partial.geodesic_length)
    glen[3:] = np.nan
    save_spline_batch(dataclasses.replace(partial, geodesic_length=glen), ckpt)

    resumed = optimize_spline_batch(params, art, cfg=cfg,
                                    checkpoint_path=ckpt,
                                    log_every_chunk=False)
    # chunk 1 untouched (identical to first run), chunk 2 recomputed
    np.testing.assert_allclose(resumed.omega_optimized[:3],
                               full.omega_optimized[:3])
    np.testing.assert_allclose(resumed.geodesic_length[3:],
                               full.geodesic_length[3:], rtol=1e-5)


def test_async_checkpointer_survives_transient_write_failure(capsys):
    """A failing mid-run snapshot write must not destroy a completed run:
    close() reports the error instead of raising, and a later successful
    write clears an earlier failure."""
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        _AsyncCheckpointer,
    )

    calls = []

    def flaky(item):
        calls.append(item)
        if item == "bad":
            raise OSError("disk momentarily full")

    s = _AsyncCheckpointer(flaky)
    s.submit("bad")
    err = s.close()
    assert isinstance(err, OSError)

    s2 = _AsyncCheckpointer(flaky)
    s2.submit("bad")
    import time
    time.sleep(0.2)          # let the failing write land first
    s2.submit("good")
    assert s2.close() is None  # recovered: last write succeeded


def _toy_art(rng, P=6, valid=None):
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact

    basis, _ = nullspace_basis(4)
    return SplineBatchArtifact(
        a=rng.normal(size=(P, 2)).astype(np.float32),
        b=rng.normal(size=(P, 2)).astype(np.float32),
        omega_init=np.zeros((P, 5, 2), np.float32),
        basis=basis, n_poly=4,
        pair_indices=np.arange(2 * P).reshape(P, 2),
        valid=np.ones(P, bool) if valid is None else np.asarray(valid, bool),
        pair_labels=[["a", "b"]] * P,
        representatives=[],
    )


def test_resume_refuses_checkpoint_from_different_config(tmp_path, rng,
                                                         capsys):
    """A checkpoint produced under one config must never be silently mixed
    into a run with another: the stamp mismatch is detected, the checkpoint
    ignored, and the run recomputes from scratch."""
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    params = vae_init(jax.random.PRNGKey(4))
    art = _toy_art(rng)
    ckpt = str(tmp_path / "opt.npz")
    cfg_a = GeodesicConfig(steps=20, batch_size=3,
                           energy=EnergyConfig(num_t=48, mode="single"))
    optimize_spline_batch(params, art, cfg=cfg_a, checkpoint_path=ckpt,
                          log_every_chunk=False)

    cfg_b = GeodesicConfig(steps=40, batch_size=3,
                           energy=EnergyConfig(num_t=48, mode="single"))
    res_b = optimize_spline_batch(params, art, cfg=cfg_b,
                                  checkpoint_path=ckpt, log_every_chunk=True)
    err = capsys.readouterr().err
    assert "different config" in err
    # the 40-step run recomputed everything (fresh start, not resumed)
    fresh = optimize_spline_batch(params, art, cfg=cfg_b,
                                  checkpoint_path=None)
    np.testing.assert_allclose(res_b.geodesic_length, fresh.geodesic_length,
                               rtol=1e-6)


def test_resume_skips_chunks_whose_only_missing_pairs_are_invalid(tmp_path,
                                                                  rng,
                                                                  capsys):
    """A completed checkpoint containing an invalid pair (NaN-masked) must
    resume as a no-op instead of re-optimizing that pair's whole chunk."""
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    params = vae_init(jax.random.PRNGKey(4))
    valid = np.ones(6, bool)
    valid[4] = False
    art = _toy_art(rng, valid=valid)
    ckpt = str(tmp_path / "opt.npz")
    cfg = GeodesicConfig(steps=15, batch_size=3,
                         energy=EnergyConfig(num_t=48, mode="single"))
    optimize_spline_batch(params, art, cfg=cfg, checkpoint_path=ckpt,
                          log_every_chunk=False)

    res = optimize_spline_batch(params, art, cfg=cfg, checkpoint_path=ckpt,
                                log_every_chunk=True)
    out = capsys.readouterr().out
    assert "[resume] 6/6 splines already optimized" in out
    assert "[chunk" not in out          # no chunk was re-run
    assert np.isnan(res.geodesic_length[4])


def test_resume_without_data_keeps_stored_euclidean(tmp_path, rng):
    """Resuming a run that already persisted euclidean distances must not
    overwrite them with None when the resume invocation has no data."""
    import dataclasses

    from vae_latent_geometry_tpu.io.artifacts import (
        load_spline_batch,
        save_spline_batch,
    )
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    params = vae_init(jax.random.PRNGKey(4))
    art = _toy_art(rng)
    ckpt = str(tmp_path / "opt.npz")
    cfg = GeodesicConfig(steps=15, batch_size=3,
                         energy=EnergyConfig(num_t=48, mode="single"))
    optimize_spline_batch(params, art, cfg=cfg, checkpoint_path=ckpt,
                          log_every_chunk=False)
    # graft stored euclidean distances + a missing chunk into the checkpoint
    prev = load_spline_batch(ckpt)
    eucl = np.arange(6, dtype=np.float32)
    glen = np.array(prev.geodesic_length)
    glen[3:] = np.nan
    save_spline_batch(dataclasses.replace(prev, euclidean_distance=eucl,
                                          geodesic_length=glen), ckpt)

    res = optimize_spline_batch(params, art, cfg=cfg, checkpoint_path=ckpt,
                                data=None, log_every_chunk=False)
    np.testing.assert_array_equal(res.euclidean_distance, eucl)


def test_resume_refuses_same_steps_different_recipe(tmp_path, rng, capsys):
    """Recipe fields beyond steps/mode/num_t must be stamped too: a
    reference-recipe checkpoint resumed under a ladder whose resolved
    `steps` coincides is refused (the results differ)."""
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    params = vae_init(jax.random.PRNGKey(4))
    art = _toy_art(rng)
    ckpt = str(tmp_path / "opt.npz")
    cfg_plain = GeodesicConfig(steps=12, batch_size=3,
                               energy=EnergyConfig(num_t=48, mode="single"))
    optimize_spline_batch(params, art, cfg=cfg_plain, checkpoint_path=ckpt,
                          log_every_chunk=False)
    cfg_ladder = GeodesicConfig(
        steps=12, batch_size=3,
        phase_plan=((8, 32, "cosine", 1e-2), (4, 48, "constant", 1e-3)),
        energy=EnergyConfig(num_t=48, mode="single"))
    optimize_spline_batch(params, art, cfg=cfg_ladder, checkpoint_path=ckpt,
                          log_every_chunk=True)
    assert "different config" in capsys.readouterr().err


def test_optimize_stage_ignores_unstamped_checkpoint(tmp_path, rng, capsys):
    """Regression (review finding): a checkpoint whose metadata carries no
    config stamp cannot be validated, so it must be loudly IGNORED and the
    run recomputed — not silently resumed (it may hold another recipe's
    results)."""
    import dataclasses

    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.io.artifacts import (
        SplineBatchArtifact,
        load_spline_batch,
        save_spline_batch,
    )
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    params = vae_init(jax.random.PRNGKey(4))
    basis, _ = nullspace_basis(4)
    P = 4
    art = SplineBatchArtifact(
        a=rng.normal(size=(P, 2)).astype(np.float32),
        b=rng.normal(size=(P, 2)).astype(np.float32),
        omega_init=np.zeros((P, 5, 2), np.float32),
        basis=basis, n_poly=4,
        pair_indices=np.arange(2 * P).reshape(P, 2),
        valid=np.ones(P, bool), pair_labels=[["a", "b"]] * P,
        representatives=[],
    )
    ckpt = str(tmp_path / "opt.npz")
    cfg = GeodesicConfig(steps=15, batch_size=4,
                         energy=EnergyConfig(num_t=48, mode="single"))
    full = optimize_spline_batch(params, art, cfg=cfg, checkpoint_path=ckpt,
                                 log_every_chunk=False)

    # forge a legacy (pre-stamp) checkpoint: junk results, NO stamp keys
    loaded = load_spline_batch(ckpt)
    meta = {k: v for k, v in loaded.metadata.items()
            if k not in ("steps", "energy_mode", "num_t", "mc_samples",
                         "recipe")}
    forged = dataclasses.replace(
        loaded,
        omega_optimized=np.full_like(loaded.omega_optimized, 7.0),
        geodesic_length=np.full_like(loaded.geodesic_length, 99.0),
        metadata=meta)
    save_spline_batch(forged, ckpt)

    res = optimize_spline_batch(params, art, cfg=cfg, checkpoint_path=ckpt,
                                log_every_chunk=False)
    err = capsys.readouterr().err
    assert "cannot be validated" in err
    # the junk was NOT resumed: results equal the clean full run
    np.testing.assert_allclose(res.geodesic_length, full.geodesic_length,
                               rtol=1e-6)
