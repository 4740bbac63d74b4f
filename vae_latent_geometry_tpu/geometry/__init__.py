from vae_latent_geometry_tpu.geometry.basis import (  # noqa: F401
    constraint_matrix,
    nullspace_basis,
)
from vae_latent_geometry_tpu.geometry.spline import (  # noqa: F401
    design_matrix,
    design_matrix_derivative,
    eval_spline,
    eval_spline_design,
    eval_spline_velocity,
    fit_spline_lstsq,
)
