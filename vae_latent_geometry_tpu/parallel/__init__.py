from vae_latent_geometry_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    named_sharding,
    replicated,
)
from vae_latent_geometry_tpu.parallel.multihost import (  # noqa: F401
    gather_global,
    init_multihost,
    is_multiprocess,
    is_primary,
    put_global,
)
from vae_latent_geometry_tpu.parallel.shard import (  # noqa: F401
    sharded_optimize_splines,
    sharded_train_step,
)
