"""Spline-batch artifacts: the pipeline's stage hand-off format.

The reference hands results between stages as torch pickle blobs
(schema at ``src/optimize.py:190-201`` / ``src/init_splines_ensemble.py:212-216``:
spline_data list of per-pair dicts + representatives + pairs + metadata).
Here the same information is a columnar .npz (dense arrays, no pickle) with a
JSON sidecar for labels/metadata — loads in one shot straight into the
batched device pipeline instead of 8,778 tiny dicts.  Reference .pt blobs are
importable via ``models.torch_import.load_spline_blob`` for interop.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class SplineBatchArtifact:
    a: np.ndarray                  # (P, D)
    b: np.ndarray                  # (P, D)
    omega_init: np.ndarray         # (P, K, D)
    basis: np.ndarray              # (4*n_poly, K)
    n_poly: int
    pair_indices: np.ndarray       # (P, 2) dataset indices
    valid: np.ndarray              # (P,) bool
    pair_labels: List[List[str]]   # (P, 2) class labels
    representatives: List[dict]    # [{index, label}]
    omega_optimized: Optional[np.ndarray] = None   # (P, K, D)
    geodesic_length: Optional[np.ndarray] = None   # (P,)
    euclidean_distance: Optional[np.ndarray] = None  # (P,)
    metadata: Dict = field(default_factory=dict)

    def __len__(self) -> int:
        return len(self.a)


_ARRAY_FIELDS = ("a", "b", "omega_init", "basis", "pair_indices", "valid",
                 "omega_optimized", "geodesic_length", "euclidean_distance")


def save_spline_batch(art: SplineBatchArtifact, path: str) -> None:
    path = str(path)
    if not path.endswith(".npz"):
        path += ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {}
    for name in _ARRAY_FIELDS:
        v = getattr(art, name)
        if v is not None:
            arrays[name] = np.asarray(v)
    sidecar = {
        "n_poly": int(art.n_poly),
        "pair_labels": art.pair_labels,
        "representatives": art.representatives,
        "metadata": art.metadata,
    }
    # atomic write (temp + rename): these files are per-chunk resume
    # checkpoints of multi-minute runs — a crash mid-serialization must
    # never destroy the previous good checkpoint
    # per-process temp name: on a multi-host shared filesystem two processes
    # writing the same artifact must not interleave into one temp file — each
    # replaces atomically and last-wins with a VALID file (all processes
    # compute identical results; process-0 gating merely avoids the
    # duplicated work where it is wired)
    tmp = f"{path}.tmp.{os.getpid()}.npz"
    np.savez(tmp, __sidecar__=json.dumps(sidecar), **arrays)
    os.replace(tmp, path)


def load_spline_batch(path: str) -> SplineBatchArtifact:
    path = str(path)
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path += ".npz"
    if path.endswith((".pt", ".pth")):
        # reference torch spline blobs (src/optimize.py:190-201) load
        # directly — torch is used as a file reader only
        from vae_latent_geometry_tpu.models.torch_import import load_spline_blob

        return from_reference_blob(load_spline_blob(path))
    with np.load(path, allow_pickle=False) as f:
        sidecar = json.loads(str(f["__sidecar__"]))
        arrays = {k: f[k] for k in f.files if k != "__sidecar__"}
    return SplineBatchArtifact(
        a=arrays["a"], b=arrays["b"], omega_init=arrays["omega_init"],
        basis=arrays["basis"], n_poly=sidecar["n_poly"],
        pair_indices=arrays["pair_indices"], valid=arrays["valid"].astype(bool),
        pair_labels=sidecar["pair_labels"],
        representatives=sidecar["representatives"],
        omega_optimized=arrays.get("omega_optimized"),
        geodesic_length=arrays.get("geodesic_length"),
        euclidean_distance=arrays.get("euclidean_distance"),
        metadata=sidecar.get("metadata", {}),
    )


def to_reference_blob(art: SplineBatchArtifact, path: Optional[str] = None):
    """Export an artifact in the reference's torch blob schema
    (``src/optimize.py:190-201``) so upstream tooling can consume results
    produced here.  Returns the blob dict; writes it with torch.save when a
    path is given."""
    import torch

    spline_data = []
    for p in range(len(art)):
        d = {
            "a": torch.from_numpy(np.asarray(art.a[p])),
            "b": torch.from_numpy(np.asarray(art.b[p])),
            "a_index": int(art.pair_indices[p, 0]),
            "b_index": int(art.pair_indices[p, 1]),
            "a_label": str(art.pair_labels[p][0]),
            "b_label": str(art.pair_labels[p][1]),
            "n_poly": int(art.n_poly),
            "basis": torch.from_numpy(np.asarray(art.basis)),
            "omega_init": torch.from_numpy(np.asarray(art.omega_init[p])),
        }
        if art.omega_optimized is not None:
            d["omega_optimized"] = torch.from_numpy(
                np.asarray(art.omega_optimized[p]))
        if art.geodesic_length is not None:
            d["geodesic_length"] = float(art.geodesic_length[p])
        if art.euclidean_distance is not None:
            d["euclidean_distance"] = float(art.euclidean_distance[p])
        spline_data.append(d)
    def _plain(v):
        """Sanitize to plain Python containers/scalars: representatives and
        metadata are caller-supplied and may carry numpy scalars/arrays,
        which the hardened ``weights_only=True`` loader would refuse to
        unpickle — the exporter must not produce blobs its own loader (or
        the reference's) cannot read."""
        if isinstance(v, dict):
            return {str(k): _plain(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [_plain(x) for x in v]
        if isinstance(v, np.ndarray):
            return torch.from_numpy(np.ascontiguousarray(v))
        if isinstance(v, np.generic):
            return v.item()
        return v

    blob = {
        "spline_data": spline_data,
        "representatives": _plain(art.representatives),
        "pairs": [[int(i), int(j)] for i, j in art.pair_indices],
        "metadata": _plain(art.metadata),
    }
    if path is not None:
        torch.save(blob, path)
    return blob


def from_reference_blob(blob: dict) -> SplineBatchArtifact:
    """Convert a loaded reference .pt blob (``torch_import.load_spline_blob``)
    into the columnar artifact."""
    data = blob["spline_data"]
    if not data:
        # every per-pair field incl. basis/n_poly lives inside spline_data
        # entries, so an empty list is unconvertible — say so instead of
        # dying on data[0] below (truncated/partial exports happen)
        raise ValueError(
            "reference blob has an empty 'spline_data' list — nothing to "
            "convert (truncated or partial export?)")
    reps = blob.get("representatives") or []

    def col(key, default=None):
        if data and key in data[0]:
            return np.stack([np.asarray(d[key]) for d in data])
        return default

    def scal(*keys):
        for key in keys:
            if data and key in data[0]:
                return np.array([float(d[key]) for d in data])
        return None

    pair_idx = (np.stack([[d.get("a_index", -1), d.get("b_index", -1)]
                          for d in data])
                if data else np.zeros((0, 2), np.int64))
    labels = [[str(d.get("a_label", d.get("cluster_pair", ("?", "?"))[0])),
               str(d.get("b_label", d.get("cluster_pair", ("?", "?"))[1]))]
              for d in data]
    return SplineBatchArtifact(
        a=col("a"), b=col("b"), omega_init=col("omega_init"),
        basis=np.asarray(data[0]["basis"]), n_poly=int(data[0]["n_poly"]),
        pair_indices=pair_idx, valid=np.ones(len(data), bool),
        pair_labels=labels, representatives=reps,
        omega_optimized=col("omega_optimized"),
        geodesic_length=scal("geodesic_length", "length_geodesic"),
        euclidean_distance=scal("euclidean_distance", "length_euclidean"),
        metadata=dict(blob.get("metadata") or {}),
    )
