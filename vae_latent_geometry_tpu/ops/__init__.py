from vae_latent_geometry_tpu.ops.energy_pallas import (  # noqa: F401
    energy_expected_fused,
    fused_available,
)
