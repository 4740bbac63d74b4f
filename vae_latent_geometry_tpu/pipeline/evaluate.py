"""Evaluation layer: distance matrices and cross-seed CoV analysis.

Reference ``src/eval.py``:

- matrix mode (:13-66): map pair indices to local representative slots, fill
  a symmetric n x n matrix of geodesic lengths (or latent Euclidean
  distances), NaN holes for skipped pairs, zero diagonal.
- CoV mode (:70-176): for each pair x seed x decoder-count k, re-optimize a
  straight-line spline for 300 Adam steps of the MC ensemble energy with the
  first k decoders; geodesic length = sqrt(energy); CoV = std/mean over seeds
  per k; averaged per k.  The reference runs 105 x 6 x 10 = 6,300 serial
  optimizations; here each seed runs ONE batched optimization over the full
  (pair x decoder-count) grid via per-spline ``num_active`` counts.
"""

from __future__ import annotations

import json
import warnings
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
from vae_latent_geometry_tpu.models import evae as evae_lib
from vae_latent_geometry_tpu.optim.geodesic import optimize_splines


def distance_matrix(art: SplineBatchArtifact,
                    len_type: str = "geodesic") -> tuple[np.ndarray, List[str]]:
    """Symmetric (n, n) matrix over representatives with NaN holes.

    Artifacts without a representatives list (legacy single-decoder blobs,
    reference ``src/single_decoder/density_batched.py:84-142``) fall back to
    indexing by the per-pair class labels.
    """
    values = (art.geodesic_length if len_type == "geodesic"
              else art.euclidean_distance)
    if values is None:
        raise ValueError(f"artifact carries no {len_type!r} values")

    reps = art.representatives
    if reps:
        global_to_local = {int(r["index"]): i for i, r in enumerate(reps)}
        labels = [str(r.get("label", r.get("cluster_label", r["index"])))
                  for r in reps]

        def locate(p):
            ia, ib = (int(art.pair_indices[p, 0]), int(art.pair_indices[p, 1]))
            if ia not in global_to_local or ib not in global_to_local:
                return None
            return global_to_local[ia], global_to_local[ib]
    else:
        labels = sorted({l for pair in art.pair_labels for l in pair})
        label_to_local = {l: i for i, l in enumerate(labels)}

        def locate(p):
            la, lb = art.pair_labels[p]
            return label_to_local[la], label_to_local[lb]

    n = len(labels)
    mat = np.full((n, n), np.nan)
    for p in range(len(art)):
        if not art.valid[p] or not np.isfinite(values[p]):
            continue
        loc = locate(p)
        if loc is None:
            continue
        la, lb = loc
        mat[la, lb] = mat[lb, la] = float(values[p])
    np.fill_diagonal(mat, 0.0)
    return mat, labels


def compute_cov(values: np.ndarray, axis=None) -> np.ndarray:
    """std/mean with the reference's zero-mean guard (``src/eval.py:70-72``).
    NOTE: the reference uses numpy's population std (ddof=0); kept."""
    values = np.asarray(values, np.float64)
    mean = values.mean(axis=axis)
    std = values.std(axis=axis)
    return np.where(mean > 0, std / np.maximum(mean, 1e-300), 0.0)


@dataclass
class CovResult:
    avg_cov_geodesic: Dict[int, float]
    avg_cov_euclidean: float
    raw_cov_geodesic: Dict[int, np.ndarray]   # k -> (P,) per-pair CoV
    raw_cov_euclidean: np.ndarray             # (P,)
    lengths: np.ndarray                       # (S, P, K) geodesic lengths
    euclidean: np.ndarray                     # (S, P)
    seeds: List[int]
    decoder_counts: List[int]

    def to_json(self) -> dict:
        return {
            "avg_cov_geodesic": {str(k): float(v)
                                 for k, v in self.avg_cov_geodesic.items()},
            "avg_cov_euclidean": float(self.avg_cov_euclidean),
            "raw_cov_geodesic": {str(k): [float(x) for x in v]
                                 for k, v in self.raw_cov_geodesic.items()},
            "raw_cov_euclidean": [float(x) for x in self.raw_cov_euclidean],
            "seeds": list(self.seeds),
            "decoder_counts": list(self.decoder_counts),
            "num_pairs": int(self.lengths.shape[1]),
        }

    def save(self, path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(self.to_json(), indent=2))


def cov_analysis(
    models: Sequence[evae_lib.EVAEParams],
    seeds: Sequence[int],
    data: np.ndarray,
    pairs: Sequence[tuple[int, int]],
    decoder_counts: Sequence[int] = tuple(range(1, 11)),
    steps: int = 300,
    num_t: int = 2000,
    mc_samples: int = 2,
    mode: str = "mc",
    kernel_precision: str = "f32x3",
    lr: float = 1e-3,
    key=None,
    batch_size: Optional[int] = None,
    mesh=None,
    rep_latents: Optional[Sequence[np.ndarray]] = None,
) -> CovResult:
    """Cross-seed stability of geodesic lengths vs ensemble size.

    One batched optimization per seed: B = n_pairs * n_counts splines with a
    per-spline ``num_active`` decoder count, straight-line init (omega = 0,
    reference ``src/eval.py:109``).

    mesh: optional ('dp','ep') mesh — each seed's (pair x count) batch
    shards over 'dp' via ``sharded_optimize_splines`` (SURVEY §2.9's plan
    of sharding the CoV grid); results equal the unsharded run (pairs never
    communicate).

    rep_latents: optional per-seed latent arrays, one (N, D) array per
    model, with ``pairs`` indexing into them; replaces encoding ``data``
    (which may then be None).  This is how the CoV anchor runs on the
    upstream-committed spline-blob endpoints when the raw dataset
    (tasic-pca50.npy) is unavailable — the blobs carry each pair's
    endpoint latents under that seed's encoder.
    """
    import jax

    if key is None:
        key = jax.random.PRNGKey(0)
    pairs = np.asarray(list(pairs), np.int64)
    counts = np.asarray(list(decoder_counts), np.int32)
    # a count above the ensemble size is meaningless AND silently corrupts
    # the estimate (the XLA gather clamps out-of-range decoder indices to
    # M-1, over-weighting it; the fused kernels' masks select nothing) —
    # drop such counts loudly rather than emit garbage CoV values
    m_min = min(
        jax.tree_util.tree_leaves(m.decoders)[0].shape[0] for m in models)
    if (counts > m_min).any():
        dropped = counts[counts > m_min].tolist()
        warnings.warn(
            f"decoder_counts {dropped} exceed the smallest ensemble size "
            f"({m_min}) and were dropped", stacklevel=2)
        counts = counts[counts <= m_min]
        if counts.size == 0:
            raise ValueError(
                f"no decoder_counts <= ensemble size {m_min} remain")
    P, K = len(pairs), len(counts)
    basis, _ = nullspace_basis(4)
    cfg = GeodesicConfig(
        steps=steps, lr=lr,
        energy=EnergyConfig(num_t=num_t, mc_samples=mc_samples, mode=mode,
                            kernel_precision=kernel_precision),
    )

    if rep_latents is not None and len(rep_latents) != len(models):
        raise ValueError("rep_latents must have one latent array per model")
    lengths = np.zeros((len(models), P, K))
    eucl = np.zeros((len(models), P))
    data_j = None if rep_latents is not None else jnp.asarray(data)
    for s, params in enumerate(models):
        if rep_latents is not None:
            z_mean = np.asarray(rep_latents[s])
        else:
            z_mean = jax.jit(
                lambda p, x: evae_lib.encode(p, x)[0])(params, data_j)
        za = np.asarray(z_mean[pairs[:, 0]])
        zb = np.asarray(z_mean[pairs[:, 1]])
        eucl[s] = np.linalg.norm(za - zb, axis=1)

        # grid of (pair, count) -> batch axis
        a = jnp.asarray(np.repeat(za, K, axis=0))            # (P*K, 2)
        b = jnp.asarray(np.repeat(zb, K, axis=0))
        num_active = jnp.asarray(np.tile(counts, P))         # (P*K,)
        omega0 = jnp.zeros((P * K, basis.shape[1], 2))

        bs = batch_size or (P * K)
        outs = []
        for start in range(0, P * K, bs):
            stop = min(start + bs, P * K)
            n_sl = stop - start
            idx = np.arange(start, stop)
            if n_sl < bs:  # pad: one compiled shape per run
                idx = np.concatenate([idx, np.full(bs - n_sl, stop - 1)])
            # nested fold: a flat s*C+start scheme collides across seeds as
            # soon as a chunk offset reaches C (e.g. P*K=1050, bs=500 gives
            # start=1000 == seed s+1's first chunk), reusing the exact MC
            # decoder-draw stream between seeds — which correlates the very
            # cross-seed noise CoV measures
            chunk_key = jax.random.fold_in(jax.random.fold_in(key, s), start)
            if mesh is not None:
                from vae_latent_geometry_tpu.parallel import (
                    sharded_optimize_splines,
                )

                res = sharded_optimize_splines(
                    params.decoders, omega0[idx], a[idx], b[idx], basis,
                    cfg, mesh, key=chunk_key, num_active=num_active[idx])
            else:
                res = optimize_splines(
                    params.decoders, omega0[idx], a[idx], b[idx], basis,
                    cfg, key=chunk_key, num_active=num_active[idx],
                )
            outs.append(np.asarray(res.lengths)[:n_sl])
        lengths[s] = np.concatenate(outs).reshape(P, K)

    raw_cov_geo = {int(k): compute_cov(lengths[:, :, i], axis=0)
                   for i, k in enumerate(counts)}
    raw_cov_euc = compute_cov(eucl, axis=0)
    return CovResult(
        avg_cov_geodesic={k: float(np.mean(v)) for k, v in raw_cov_geo.items()},
        avg_cov_euclidean=float(np.mean(raw_cov_euc)),
        raw_cov_geodesic=raw_cov_geo,
        raw_cov_euclidean=raw_cov_euc,
        lengths=lengths, euclidean=eucl,
        seeds=list(seeds), decoder_counts=[int(k) for k in counts],
    )
