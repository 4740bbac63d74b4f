from vae_latent_geometry_tpu.data.tasic import (  # noqa: F401
    TasicData,
    load_tasic,
    synthesize_tasic_like,
    train_val_split,
)
