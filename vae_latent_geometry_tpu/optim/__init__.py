from vae_latent_geometry_tpu.optim.geodesic import (  # noqa: F401
    GeodesicResult,
    optimize_splines,
    optimize_spline_early_stopping,
)
