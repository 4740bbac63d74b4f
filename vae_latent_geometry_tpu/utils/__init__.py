from vae_latent_geometry_tpu.utils.profiling import (  # noqa: F401
    Timer,
    sync,
    time_fn,
    trace_annotation,
)
from vae_latent_geometry_tpu.utils.logging import get_logger  # noqa: F401
from vae_latent_geometry_tpu.utils.compile_cache import enable_compile_cache  # noqa: F401
