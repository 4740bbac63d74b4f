from vae_latent_geometry_tpu.io.checkpoint import (  # noqa: F401
    load_pytree,
    save_pytree,
)
from vae_latent_geometry_tpu.io.artifacts import (  # noqa: F401
    SplineBatchArtifact,
    load_spline_batch,
    save_spline_batch,
)
