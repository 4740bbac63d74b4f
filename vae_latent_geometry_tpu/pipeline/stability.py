"""Cross-seed stability utilities.

Covers the reference's ``src/old_`` analysis layer:

- ``frobenius_comparison`` (``src/old_/frobenius.py``): align two seeds'
  distance matrices on their common class labels, report Frobenius norms and
  the norm of the difference.
- ``check_pair_determinism`` (``src/old_/stability.py:95-97``): assert that
  two pair files select identical representative indices/pairs (the pair
  pipeline is deterministic given latents + labels).
- ``encoder_agreement``: max deviation between two models' encoder means on
  shared data (the reference's commented-out encoder-weight stability check,
  done at the function level instead of raw weights).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Sequence

import numpy as np


@dataclass
class FrobeniusResult:
    common_labels: list
    only_in_a: list
    only_in_b: list
    frob_a: float
    frob_b: float
    frob_diff: float
    rel_diff: float


def _align(labels_a: Sequence[str], labels_b: Sequence[str]):
    set_a, set_b = set(labels_a), set(labels_b)
    common = sorted(set_a & set_b)
    idx_a = [list(labels_a).index(c) for c in common]
    idx_b = [list(labels_b).index(c) for c in common]
    return common, idx_a, idx_b, sorted(set_a - set_b), sorted(set_b - set_a)


def frobenius_comparison(mat_a: np.ndarray, labels_a: Sequence[str],
                         mat_b: np.ndarray, labels_b: Sequence[str],
                         ignore_nan: bool = True) -> FrobeniusResult:
    """Compare two distance matrices on their common labels."""
    common, ia, ib, only_a, only_b = _align(labels_a, labels_b)
    A = np.asarray(mat_a)[np.ix_(ia, ia)].astype(np.float64)
    B = np.asarray(mat_b)[np.ix_(ib, ib)].astype(np.float64)
    if ignore_nan:
        mask = np.isfinite(A) & np.isfinite(B)
        A = np.where(mask, A, 0.0)
        B = np.where(mask, B, 0.0)
    fa = float(np.linalg.norm(A))
    fb = float(np.linalg.norm(B))
    fd = float(np.linalg.norm(A - B))
    return FrobeniusResult(
        common_labels=common, only_in_a=only_a, only_in_b=only_b,
        frob_a=fa, frob_b=fb, frob_diff=fd,
        rel_diff=fd / max(0.5 * (fa + fb), 1e-30),
    )


def _as_artifact(x) -> dict:
    """Accept a path to a JSON artifact or an already-parsed dict (callers
    that validated/parsed the file need not re-read it)."""
    return x if isinstance(x, dict) else json.loads(Path(x).read_text())


def frobenius_from_json(path_a, path_b) -> FrobeniusResult:
    """Compare two distance-matrix JSON artifacts
    ({seed, cluster_ids, distance_matrix} — the reference's
    ``src/single_decoder/density_batched.py:135-142`` schema).  Each
    argument is a path or a parsed dict."""
    da = _as_artifact(path_a)
    db = _as_artifact(path_b)

    def mat(d):
        return np.array([[np.nan if v is None else v for v in row]
                         for row in d["distance_matrix"]])

    return frobenius_comparison(mat(da), da["cluster_ids"],
                                mat(db), db["cluster_ids"])


def check_pair_determinism(path_a, path_b) -> bool:
    """True when two pair files agree exactly (representatives + pairs).
    Each argument is a path or a parsed dict."""
    da = _as_artifact(path_a)
    db = _as_artifact(path_b)
    return (da["representatives"] == db["representatives"]
            and [list(p) for p in da["pairs"]] == [list(p) for p in db["pairs"]])


def encoder_agreement(params_a, params_b, data: np.ndarray) -> float:
    """Max abs deviation between two models' encoder means over the data."""
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.models.evae import encode

    za, _ = encode(params_a, jnp.asarray(data))
    zb, _ = encode(params_b, jnp.asarray(data))
    return float(jnp.max(jnp.abs(za - zb)))


def cross_seed_spread_comparison(mats_ours, labels_ours, mats_golden,
                                 labels_golden) -> dict:
    """Statistical stability parity: does OUR pipeline reproduce the
    reference's cross-seed variability *structure*?

    Inputs are two-seed matrix pairs ``((mat_a, mat_b))`` with their label
    lists.  For every class pair present in all four matrices, the relative
    cross-seed spread ``|d_a - d_b| / mean(d_a, d_b)`` is computed for ours
    and for the golden matrices, and compared (the reference's analogous
    check is the cross-seed Frobenius comparison, ``src/old_/frobenius.py``,
    and the CoV analysis, ``src/eval.py:70-176``).

    A high correlation of per-entry spreads means our geodesics are unstable
    exactly where the reference's are — pipeline-level statistical parity on
    real data even though individual seeds' trainings are not bit-identical.
    """
    (oa, ob), (la, lb) = mats_ours, labels_ours
    (ga, gb), (ma, mb) = mats_golden, labels_golden

    def _common_sub(mats, label_lists, keep):
        out = []
        for m, ls in zip(mats, label_lists):
            ix = [list(ls).index(l) for l in keep]
            out.append(np.asarray(m, float)[np.ix_(ix, ix)])
        return out

    keep = [l for l in la if l in set(lb) and l in set(ma) and l in set(mb)]
    oa_, ob_, ga_, gb_ = _common_sub([oa, ob, ga, gb], [la, lb, ma, mb],
                                     keep)
    iu = np.triu_indices(len(keep), k=1)

    def spread(x, y):
        x, y = x[iu], y[iu]
        return np.abs(x - y) / np.maximum(0.5 * (np.abs(x) + np.abs(y)),
                                          1e-12)

    ours = spread(oa_, ob_)
    gold = spread(ga_, gb_)
    ok = np.isfinite(ours) & np.isfinite(gold)
    return {
        "n_entries": int(ok.sum()),
        "n_labels": len(keep),
        "mean_spread_ours": float(ours[ok].mean()),
        "mean_spread_golden": float(gold[ok].mean()),
        "median_spread_ours": float(np.median(ours[ok])),
        "median_spread_golden": float(np.median(gold[ok])),
        "spread_correlation": float(np.corrcoef(ours[ok], gold[ok])[0, 1]),
    }
