"""Pipeline stages (reference `src/*.py` script bodies, SURVEY §1 CLI layer).

Each stage is a plain function over artifacts; the CLI (`cli.py`) and the
experiment scripts call these.  Re-exported here so library users get the
stage surface in one import.
"""

from vae_latent_geometry_tpu.pipeline.evaluate import (  # noqa: F401
    cov_analysis,
    distance_matrix,
)
from vae_latent_geometry_tpu.pipeline.init_splines import (  # noqa: F401
    initialize_splines,
)
from vae_latent_geometry_tpu.pipeline.optimize_stage import (  # noqa: F401
    merge_spline_batches,
    optimize_spline_batch,
    optimize_spline_batch_backstop,
)
from vae_latent_geometry_tpu.pipeline.select_pairs import (  # noqa: F401
    load_pairs,
    make_pairs,
    save_pairs,
    select_representatives,
)
from vae_latent_geometry_tpu.pipeline.train import (  # noqa: F401
    train_evae,
    train_evae_multiseed,
    train_single_vae,
)
