from vae_latent_geometry_tpu.graph.grid import (  # noqa: F401
    create_latent_grid,
    entropy_weights,
    grid_knn_graph,
    reweight_graph_by_entropy,
)
from vae_latent_geometry_tpu.graph.shortest_path import (  # noqa: F401
    dijkstra_multi,
    extract_paths,
    native_available,
)
