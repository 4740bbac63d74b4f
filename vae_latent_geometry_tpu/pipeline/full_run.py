"""High-level end-to-end distance-matrix pipeline.

One call replaces the reference's four-script sequence (select pairs ->
init splines -> optimize -> matrix eval, upstream README "Geodesics:
Ensemble" recipe) and reports per-stage wall-clock — the workload behind the
headline benchmark (full n x n ensemble geodesic matrix).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import numpy as np

from vae_latent_geometry_tpu.config import GeodesicConfig, InitConfig
from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
from vae_latent_geometry_tpu.models import evae as evae_lib
from vae_latent_geometry_tpu.pipeline.evaluate import distance_matrix
from vae_latent_geometry_tpu.pipeline.init_splines import initialize_splines
from vae_latent_geometry_tpu.pipeline.optimize_stage import optimize_spline_batch
from vae_latent_geometry_tpu.pipeline.select_pairs import (
    make_pairs,
    select_representatives,
)


@dataclass
class FullRunResult:
    matrix: np.ndarray
    labels: list
    artifact: SplineBatchArtifact
    timings: Dict[str, float] = field(default_factory=dict)


def run_distance_pipeline(
    params: evae_lib.EVAEParams,
    data: np.ndarray,
    labels: np.ndarray,
    max_labels: int = 133,
    init_cfg: InitConfig = InitConfig(),
    geo_cfg: GeodesicConfig = GeodesicConfig(),
    mesh=None,
    compute_euclidean: bool = True,
    checkpoint_path: Optional[str] = None,
    verbose: bool = True,
) -> FullRunResult:
    import jax.numpy as jnp

    timings: Dict[str, float] = {}
    t0 = time.perf_counter()
    # jit: un-jitted op-by-op dispatch pays a round trip per op on tunneled
    # backends
    z_mean = jax.jit(lambda p, x: evae_lib.encode(p, x)[0])(
        params, jnp.asarray(data))
    latents = np.asarray(z_mean)
    timings["encode"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    reps = select_representatives(latents, labels, max_labels)
    pairs = make_pairs(reps)
    timings["select_pairs"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    init = initialize_splines(latents, pairs, decoders=params.decoders,
                              cfg=init_cfg)
    timings["init_splines"] = time.perf_counter() - t0

    label_of = {r["index"]: r["label"] for r in reps}
    art = SplineBatchArtifact(
        a=init.a, b=init.b, omega_init=init.omega, basis=init.basis,
        n_poly=init.n_poly, pair_indices=init.pair_indices, valid=init.valid,
        pair_labels=[[label_of.get(int(i), "?"), label_of.get(int(j), "?")]
                     for i, j in init.pair_indices],
        representatives=reps,
        metadata={"init_type": init.init_type, "pair_count": max_labels},
    )

    t0 = time.perf_counter()
    art = optimize_spline_batch(
        params, art, data=data if compute_euclidean else None, cfg=geo_cfg,
        checkpoint_path=checkpoint_path, log_every_chunk=verbose, mesh=mesh,
    )
    timings["optimize"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    mat, mat_labels = distance_matrix(art, "geodesic")
    timings["matrix"] = time.perf_counter() - t0
    timings["total"] = sum(timings.values())
    if verbose:
        print("[timings] " + "  ".join(f"{k}={v:.2f}s"
                                       for k, v in timings.items()))
    return FullRunResult(matrix=mat, labels=mat_labels, artifact=art,
                         timings=timings)
