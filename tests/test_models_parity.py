"""Golden parity: reference checkpoints imported into JAX must reproduce the
torch forward pass (encoder means/log-stds, decoder means) to float32 noise."""

import numpy as np
import pytest

from tests.conftest import requires_reference

EVAE_CKPT = "/root/reference/experiment/model_seed12.pt"
VAE_CKPT = "/root/reference/src/artifacts/vae_best_seed12.pth"


def _torch_mlp_forward(sd, prefix, x, act, norm_indices=()):
    """Run the torch state dict functionally (no module construction)."""
    import torch
    import torch.nn.functional as F

    h = torch.from_numpy(x)
    idx = 0
    while f"{prefix}.{idx}.weight" in sd or idx <= max(
        [int(k.split(".")[-2]) for k in sd if k.startswith(prefix)], default=-1
    ):
        wkey = f"{prefix}.{idx}.weight"
        if wkey in sd:
            w = sd[wkey]
            if w.ndim == 2:
                h = F.linear(h, w, sd[f"{prefix}.{idx}.bias"])
                if idx < max(int(k.split(".")[-2]) for k in sd if k.startswith(prefix)):
                    h = act(h)
            else:  # LayerNorm
                h = F.layer_norm(h, w.shape, w, sd[f"{prefix}.{idx}.bias"])
        idx += 1
        if idx > 20:
            break
    return h.numpy()


@requires_reference
class TestEVAEParity:
    @pytest.fixture(scope="class")
    def ckpt(self):
        import torch

        from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint

        sd = torch.load(EVAE_CKPT, map_location="cpu")
        return sd, load_evae_checkpoint(EVAE_CKPT)

    def test_encoder_forward(self, ckpt, rng):
        import torch.nn.functional as F

        sd, params = ckpt
        x = rng.normal(size=(32, 50)).astype(np.float32) * 10
        ref = _torch_mlp_forward(sd, "encoder.encoder_net", x, F.silu)

        from vae_latent_geometry_tpu.models import nets

        mean, log_std = nets.encoder_apply(params.encoder, x, activation="silu")
        got = np.concatenate([np.asarray(mean), np.asarray(log_std)], axis=-1)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_all_decoders_forward(self, ckpt, rng):
        import torch.nn.functional as F

        sd, params = ckpt
        z = rng.normal(size=(64, 2)).astype(np.float32) * 3

        from vae_latent_geometry_tpu.models.evae import decode_all

        got = np.asarray(decode_all(params.decoders, z))  # (10, 64, 50)
        assert got.shape == (10, 64, 50)
        for i in range(10):
            ref = _torch_mlp_forward(sd, f"decoder.{i}.decoder_net", z, F.relu)
            np.testing.assert_allclose(got[i], ref, atol=2e-5, rtol=1e-5)

    def test_decoders_are_diverse(self, ckpt, rng):
        """Reference sanity probe (src/optimize.py:107-116): the trained
        ensemble members must produce different outputs."""
        _, params = ckpt
        z = rng.normal(size=(1, 2)).astype(np.float32)

        from vae_latent_geometry_tpu.models.evae import decode_all

        outs = np.asarray(decode_all(params.decoders, z))
        assert not all(
            np.allclose(outs[0], outs[i], atol=1e-6) for i in range(1, 10)
        )


@requires_reference
def test_single_vae_decoder_parity(rng):
    import torch
    import torch.nn.functional as F

    from vae_latent_geometry_tpu.models import nets
    from vae_latent_geometry_tpu.models.torch_import import load_single_vae_checkpoint

    sd = torch.load(VAE_CKPT, map_location="cpu")
    params = load_single_vae_checkpoint(VAE_CKPT)
    z = rng.normal(size=(16, 2)).astype(np.float32) * 2
    ref = _torch_mlp_forward(sd, "decoder.decoder_net", z, F.relu)
    mean, log_std = nets.decoder_apply_full(params["decoder"], z)
    ref_mean, ref_logstd_raw = np.split(ref, 2, axis=-1)
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(log_std), np.clip(ref_logstd_raw, -2.0, 2.0), atol=2e-5, rtol=1e-5
    )


def test_legacy_heteroscedastic_evae():
    """Legacy ensemble family (reference src/single_decoder/vae.py:72-113):
    independently-initialized heteroscedastic decoders, one random decoder
    per elbo/sample call, decoders[0] alias for single-decoder code."""
    import jax
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.models import vae as vae_lib

    cfg = vae_lib.LEGACY_CONFIG
    params = vae_lib.legacy_evae_init(jax.random.PRNGKey(0), cfg,
                                      num_decoders=3)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, cfg.input_dim)),
                    jnp.float32)
    # decoders are independently initialized (NOT deepcopies)
    w0 = params.decoders["layers"][0]["w"]
    assert not np.allclose(np.asarray(w0[0]), np.asarray(w0[1]))

    # fixed-decoder elbo is deterministic and differs across decoders
    e0 = float(vae_lib.legacy_evae_elbo(params, jax.random.PRNGKey(1), x,
                                        decoder_idx=0))
    e1 = float(vae_lib.legacy_evae_elbo(params, jax.random.PRNGKey(1), x,
                                        decoder_idx=1))
    assert np.isfinite(e0) and np.isfinite(e1) and e0 != e1

    # decoder_idx=None draws a random decoder: over keys it hits multiple
    vals = {round(float(vae_lib.legacy_evae_elbo(
        params, jax.random.PRNGKey(k), x)), 6) for k in range(12)}
    assert len(vals) > 1

    # the decoders[0] alias equals the single-VAE elbo with that decoder
    vp = vae_lib.VAEParams(encoder=params.encoder,
                           decoder=vae_lib.legacy_decoder(params))
    zkey = jax.random.split(jax.random.PRNGKey(1))[0]
    e_alias = float(vae_lib.elbo(vp, zkey, x))
    e_fixed = float(vae_lib.legacy_evae_elbo(params, jax.random.PRNGKey(1),
                                             x, decoder_idx=0))
    assert np.isclose(e_alias, e_fixed, rtol=1e-6)

    s = vae_lib.legacy_evae_sample(params, jax.random.PRNGKey(2), n=5)
    assert s.shape == (5, cfg.input_dim) and np.isfinite(np.asarray(s)).all()

    # jits cleanly (random decoder selection is trace-safe)
    f = jax.jit(lambda p, k, x: vae_lib.legacy_evae_elbo(p, k, x))
    assert np.isfinite(float(f(params, jax.random.PRNGKey(3), x)))
