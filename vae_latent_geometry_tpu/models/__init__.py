from vae_latent_geometry_tpu.models.nets import (  # noqa: F401
    decoder_apply,
    decoder_init,
    encoder_apply,
    encoder_init,
)
from vae_latent_geometry_tpu.models.evae import (  # noqa: F401
    EVAEParams,
    decode_all,
    decode_one,
    encode,
    evae_init,
    elbo,
    stack_decoders,
)
