"""Training-driver tests on tiny synthetic data."""

import numpy as np
import pytest

from vae_latent_geometry_tpu.config import ModelConfig, TrainConfig
from vae_latent_geometry_tpu.pipeline.train import train_evae, train_single_vae


@pytest.fixture(scope="module")
def tiny_data(rng):
    # two well-separated blobs in 10 dims
    n = 512
    x = rng.normal(size=(n, 10)).astype(np.float32)
    x[: n // 2] += 4.0
    return x


def test_evae_training_reduces_loss(tiny_data):
    cfg = TrainConfig(epochs=8, batch_size=64, lr=1e-3, seed=0)
    mcfg = ModelConfig(input_dim=10, latent_dim=2, num_decoders=3,
                       encoder_hidden=(32, 16), decoder_hidden=(32,),
                       decoder_sigma=1.0)
    res = train_evae(tiny_data, cfg, mcfg, log_every=0)
    assert len(res.train_losses) == 8
    assert res.train_losses[-1] < res.train_losses[0]
    assert np.isfinite(res.val_losses).all()


def test_evae_decoders_diverge_during_training(tiny_data):
    """Ensemble members start as identical copies (reference deepcopy,
    src/train.py:53) and diverge through random decoder selection."""
    import jax
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.models.evae import decode_all, evae_init

    cfg = TrainConfig(epochs=6, batch_size=64, lr=3e-3, seed=1)
    mcfg = ModelConfig(input_dim=10, latent_dim=2, num_decoders=3,
                       encoder_hidden=(32, 16), decoder_hidden=(32,),
                       decoder_sigma=1.0)
    params0 = evae_init(jax.random.PRNGKey(0), mcfg)
    z = jnp.zeros((1, 2))
    outs0 = np.asarray(decode_all(params0.decoders, z))
    assert np.allclose(outs0[0], outs0[1])  # identical at init

    res = train_evae(tiny_data, cfg, mcfg, params=params0, log_every=0)
    outs = np.asarray(decode_all(res.params.decoders, z))
    assert not np.allclose(outs[0], outs[1], atol=1e-6)


def test_single_vae_training_with_warmup_and_best(tiny_data):
    cfg = TrainConfig(epochs=10, batch_size=64, lr=1e-3, seed=0,
                      beta_warmup_epochs=5, lr_step_size=4, lr_gamma=0.5)
    mcfg = ModelConfig(input_dim=10, latent_dim=2, heteroscedastic=True,
                       encoder_hidden=(32, 16), decoder_hidden=(32,))
    res = train_single_vae(tiny_data, cfg, mcfg, log_every=0)
    assert res.train_losses[-1] < res.train_losses[0]
    # best-val tracking: best_val_loss is the min of the val curve
    assert res.best_val_loss == pytest.approx(np.min(res.val_losses))


def test_train_resume_restores_optimizer_state(tiny_data, tmp_path):
    """Full-state resume (params + Adam moments + epoch): an interrupted run
    continues the exact trajectory — the resumed loss curve is bitwise-equal
    to the uninterrupted run's, which cannot happen if the Adam moments
    restart (first resumed step would take an lr-sized jump)."""
    mcfg = ModelConfig(input_dim=10, latent_dim=2, num_decoders=2,
                       encoder_hidden=(16,), decoder_hidden=(16,),
                       decoder_sigma=1.0)
    full_cfg = TrainConfig(epochs=6, batch_size=64, seed=3)
    ref = train_evae(tiny_data, full_cfg, mcfg, log_every=0, block_epochs=3)

    ckpt = str(tmp_path / "train_state.npz")
    half_cfg = TrainConfig(epochs=3, batch_size=64, seed=3)
    train_evae(tiny_data, half_cfg, mcfg, log_every=0, block_epochs=3,
               checkpoint_path=ckpt)
    res = train_evae(tiny_data, full_cfg, mcfg, log_every=0, block_epochs=3,
                     checkpoint_path=ckpt)
    assert len(res.train_losses) == 6
    np.testing.assert_array_equal(res.train_losses, ref.train_losses)
    np.testing.assert_array_equal(res.val_losses, ref.val_losses)


def test_train_resume_refuses_foreign_config(tiny_data, tmp_path):
    """Regression: a checkpoint written by a different run setup (here a
    different seed — any trajectory-affecting TrainConfig field) is refused
    on resume instead of silently continuing a foreign trajectory.  A
    larger epoch budget is NOT a foreign config (it is the canonical
    resume, exercised by test_train_resume_restores_optimizer_state)."""
    mcfg = ModelConfig(input_dim=10, latent_dim=2, num_decoders=2,
                       encoder_hidden=(16,), decoder_hidden=(16,),
                       decoder_sigma=1.0)
    ckpt = str(tmp_path / "train_state.npz")
    train_evae(tiny_data, TrainConfig(epochs=2, batch_size=64, seed=3),
               mcfg, log_every=0, block_epochs=2, checkpoint_path=ckpt)
    with pytest.raises(ValueError, match="different run setup"):
        train_evae(tiny_data, TrainConfig(epochs=4, batch_size=64, seed=4),
                   mcfg, log_every=0, block_epochs=2, checkpoint_path=ckpt)
    # a different model config is refused too
    mcfg_other = ModelConfig(input_dim=10, latent_dim=2, num_decoders=3,
                             encoder_hidden=(16,), decoder_hidden=(16,),
                             decoder_sigma=1.0)
    with pytest.raises(ValueError, match="different run setup"):
        train_evae(tiny_data, TrainConfig(epochs=4, batch_size=64, seed=3),
                   mcfg_other, log_every=0, block_epochs=2,
                   checkpoint_path=ckpt)


def test_multiseed_training_matches_serial_runs(tiny_data):
    """The vmapped multi-seed trainer reproduces each seed's serial
    ``train_evae`` trajectory EXACTLY (loss curves bitwise-equal on CPU):
    the seed axis is purely a vmap batch axis — same init keys, same seeded
    splits, same per-epoch shuffle keys."""
    import jax

    from vae_latent_geometry_tpu.pipeline.train import train_evae_multiseed

    mcfg = ModelConfig(input_dim=10, latent_dim=2, num_decoders=2,
                       encoder_hidden=(16,), decoder_hidden=(16,),
                       decoder_sigma=1.0)
    cfg = lambda s: TrainConfig(epochs=5, batch_size=64, seed=s)
    multi = train_evae_multiseed(tiny_data, [3, 7], cfg(0), mcfg,
                                 log_every=0, block_epochs=2)
    for s in (3, 7):
        single = train_evae(tiny_data, cfg(s), mcfg, log_every=0,
                            block_epochs=2)
        np.testing.assert_array_equal(multi[s].train_losses,
                                      single.train_losses)
        np.testing.assert_array_equal(multi[s].val_losses, single.val_losses)
        for a, b in zip(jax.tree_util.tree_leaves(multi[s].params),
                        jax.tree_util.tree_leaves(single.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the two seeds really are different runs
    assert not np.allclose(multi[3].train_losses, multi[7].train_losses)


def test_multiseed_resume_and_foreign_seedlist_refusal(tiny_data, tmp_path):
    from vae_latent_geometry_tpu.pipeline.train import train_evae_multiseed

    mcfg = ModelConfig(input_dim=10, latent_dim=2, num_decoders=2,
                       encoder_hidden=(16,), decoder_hidden=(16,),
                       decoder_sigma=1.0)
    ref = train_evae_multiseed(tiny_data,
                               [3, 7], TrainConfig(epochs=4, batch_size=64),
                               mcfg, log_every=0, block_epochs=2)
    ckpt = str(tmp_path / "multi_state.npz")
    train_evae_multiseed(tiny_data, [3, 7],
                         TrainConfig(epochs=2, batch_size=64), mcfg,
                         log_every=0, block_epochs=2, checkpoint_path=ckpt)
    res = train_evae_multiseed(tiny_data, [3, 7],
                               TrainConfig(epochs=4, batch_size=64), mcfg,
                               log_every=0, block_epochs=2,
                               checkpoint_path=ckpt)
    for s in (3, 7):
        np.testing.assert_array_equal(res[s].train_losses,
                                      ref[s].train_losses)
    with pytest.raises(ValueError, match="different run setup"):
        train_evae_multiseed(tiny_data, [3, 8],
                             TrainConfig(epochs=4, batch_size=64), mcfg,
                             log_every=0, block_epochs=2,
                             checkpoint_path=ckpt)


def test_training_is_deterministic(tiny_data):
    cfg = TrainConfig(epochs=3, batch_size=64, seed=7)
    mcfg = ModelConfig(input_dim=10, latent_dim=2, num_decoders=2,
                       encoder_hidden=(16,), decoder_hidden=(16,),
                       decoder_sigma=1.0)
    r1 = train_evae(tiny_data, cfg, mcfg, log_every=0)
    r2 = train_evae(tiny_data, cfg, mcfg, log_every=0)
    np.testing.assert_allclose(r1.train_losses, r2.train_losses, rtol=1e-6)


def test_single_vae_resume_restores_best_val_state(tiny_data, tmp_path):
    """The single-VAE trainer's full-state resume carries the best-val pair
    (value + params): an interrupted run continues the exact trajectory AND
    keeps best-val checkpointing semantics across the boundary."""
    cfg_full = TrainConfig(epochs=8, batch_size=64, lr=1e-3, seed=5,
                           beta_warmup_epochs=4, lr_step_size=3,
                           lr_gamma=0.5)
    mcfg = ModelConfig(input_dim=10, latent_dim=2, heteroscedastic=True,
                       encoder_hidden=(32, 16), decoder_hidden=(32,))
    ref = train_single_vae(tiny_data, cfg_full, mcfg, log_every=0,
                           block_epochs=2)

    import dataclasses as dc

    import jax

    ckpt = str(tmp_path / "svae_state.npz")
    train_single_vae(tiny_data, dc.replace(cfg_full, epochs=4), mcfg,
                     log_every=0, block_epochs=2, checkpoint_path=ckpt)
    res = train_single_vae(tiny_data, cfg_full, mcfg, log_every=0,
                           block_epochs=2, checkpoint_path=ckpt)
    np.testing.assert_array_equal(res.train_losses, ref.train_losses)
    np.testing.assert_array_equal(res.val_losses, ref.val_losses)
    assert res.best_val_loss == ref.best_val_loss
    for x, y in zip(jax.tree_util.tree_leaves(res.best_params),
                    jax.tree_util.tree_leaves(ref.best_params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    with pytest.raises(ValueError, match="different run setup"):
        train_single_vae(tiny_data,
                         dc.replace(cfg_full, lr=2e-3), mcfg, log_every=0,
                         block_epochs=2, checkpoint_path=ckpt)


def test_resume_is_block_boundary_invariant(tiny_data, tmp_path):
    """Regression (review finding): per-epoch RNG keys are folded by
    ABSOLUTE epoch index off the run key, so a resume from an epoch that is
    NOT a multiple of block_epochs — and even a resume with a DIFFERENT
    block_epochs — replays the uninterrupted trajectory bitwise."""
    mcfg = ModelConfig(input_dim=10, latent_dim=2, num_decoders=2,
                       encoder_hidden=(16,), decoder_hidden=(16,),
                       decoder_sigma=1.0)
    cfg_full = TrainConfig(epochs=5, batch_size=64, seed=4)
    ref = train_evae(tiny_data, cfg_full, mcfg, log_every=0, block_epochs=2)

    ckpt = str(tmp_path / "misaligned.npz")
    # interrupt at epoch 3 (not a multiple of the resume's block_epochs=2)
    train_evae(tiny_data, TrainConfig(epochs=3, batch_size=64, seed=4),
               mcfg, log_every=0, block_epochs=3, checkpoint_path=ckpt)
    res = train_evae(tiny_data, cfg_full, mcfg, log_every=0, block_epochs=2,
                     checkpoint_path=ckpt)
    np.testing.assert_array_equal(res.train_losses, ref.train_losses)
    np.testing.assert_array_equal(res.val_losses, ref.val_losses)


def test_multiseed_rejects_duplicate_seeds_and_empty_budget(tiny_data):
    from vae_latent_geometry_tpu.pipeline.train import train_evae_multiseed

    mcfg = ModelConfig(input_dim=10, latent_dim=2, num_decoders=2,
                       encoder_hidden=(16,), decoder_hidden=(16,),
                       decoder_sigma=1.0)
    with pytest.raises(ValueError, match="duplicate seeds"):
        train_evae_multiseed(tiny_data, [3, 3, 7],
                             TrainConfig(epochs=1, batch_size=64), mcfg,
                             log_every=0)
    # epochs=0: empty loss curves, no crash (review finding)
    res = train_evae_multiseed(tiny_data, [3, 7],
                               TrainConfig(epochs=0, batch_size=64), mcfg,
                               log_every=0)
    assert res[3].train_losses.shape == (0,)


def test_evae_beta_warmup_affects_trajectory(tiny_data):
    """TrainConfig.beta_warmup_epochs must actually ramp the ensemble
    trainer's KL weight (it was computed per epoch and then dropped);
    beta_warmup_epochs=0, the default, keeps the reference's constant
    beta=1 trajectory."""
    from vae_latent_geometry_tpu.config import ModelConfig, TrainConfig
    from vae_latent_geometry_tpu.pipeline.train import train_evae

    x = tiny_data
    mcfg = ModelConfig(input_dim=x.shape[1], num_decoders=2,
                       encoder_hidden=(8,), decoder_hidden=(8,))
    base = dict(epochs=3, batch_size=16, lr=1e-3, seed=3)
    r_const = train_evae(x, TrainConfig(**base), mcfg, log_every=0)
    r_warm = train_evae(x, TrainConfig(**base, beta_warmup_epochs=10), mcfg,
                        log_every=0)
    assert not np.allclose(r_const.train_losses, r_warm.train_losses)
    # epoch 0 of the warm-up run trains at beta=0 (pure reconstruction), so
    # its first-epoch loss must differ from the constant-beta run's
    assert r_const.train_losses[0] != r_warm.train_losses[0]
