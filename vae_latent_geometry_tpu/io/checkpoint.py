"""Pytree checkpointing.

The reference only ever calls ``torch.save(state_dict)`` at end of training
(``src/train.py:165``) with no resume capability.  Here any pytree (model
params, optimizer state, spline-optimization state) round-trips through a
single .npz file: leaves are stored under their tree paths, so files are
self-describing, portable and free of pickle.  ``save_train_state`` /
``load_train_state`` add step metadata for mid-run resume (per-batch
checkpointing of long geodesic runs — absent in the reference, whose batch
loop loses everything on a crash, ``src/optimize.py:190``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

_SEP = "/"


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = _SEP.join(_path_elem_str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def _path_elem_str(p) -> str:
    if isinstance(p, jax.tree_util.DictKey):
        return str(p.key)
    if isinstance(p, jax.tree_util.SequenceKey):
        return str(p.idx)
    if isinstance(p, jax.tree_util.GetAttrKey):
        return str(p.name)
    return str(p)


def save_pytree(tree: Any, path: str, extra_meta: Optional[dict] = None) -> None:
    """Save any pytree of arrays to ``path`` — written to exactly that name.

    ``np.savez`` silently appends ``.npz`` to bare string paths, which would
    break the save/load round trip for suffix-less names (load/read_meta
    open ``path`` verbatim); passing an open file handle keeps the name
    exact."""
    leaves, _ = _flatten_with_paths(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    meta = dict(extra_meta or {})
    with open(path, "wb") as f:
        np.savez(f, __meta__=json.dumps(meta), **leaves)


def read_meta(path: str) -> dict:
    """Read only the metadata of a checkpoint (cheap; no tree template)."""
    with np.load(path, allow_pickle=False) as f:
        return json.loads(str(f["__meta__"])) if "__meta__" in f.files else {}


def save_train_state(params: Any, opt_state: Any, path: str, *, epoch: int,
                     extra_meta: Optional[dict] = None,
                     extra_state: Optional[dict] = None) -> None:
    """Persist a full training state: params AND optimizer state (Adam
    moments etc.) plus the epoch counter, so a resumed run continues the
    same optimization trajectory instead of restarting the moments (the
    reference has no resume at all, ``src/train.py:165``; SURVEY §5 plans
    "optimizer/omega state for resume").  Atomic: written to a temp file and
    renamed, so a crash mid-save never corrupts the previous checkpoint.

    extra_state: additional array pytrees stored alongside params/opt_state
    (e.g. the single-VAE trainer's best-val pair); keys must not collide
    with 'params'/'opt_state'."""
    meta = {"epoch": int(epoch), **(extra_meta or {})}
    tree = {"params": params, "opt_state": opt_state, **(extra_state or {})}
    # per-process temp name: concurrent multi-host writers must not
    # interleave into one temp file (see io/artifacts.save_spline_batch)
    tmp = f"{path}.tmp.{os.getpid()}.npz"
    save_pytree(tree, tmp, meta)
    os.replace(tmp, path)


def load_train_state(path: str, params_like: Any, opt_state_like: Any,
                     extra_state_like: Optional[dict] = None,
                     ) -> Tuple[Any, Any, dict]:
    """Restore (params, opt_state, meta) saved by :func:`save_train_state`.
    ``params_like`` / ``opt_state_like`` supply the pytree structure (build
    them with the same init + ``opt.init`` as the original run).  With
    ``extra_state_like`` returns (params, opt_state, extra_state, meta)."""
    like = {"params": params_like, "opt_state": opt_state_like,
            **(extra_state_like or {})}
    tree, meta = load_pytree(path, like)
    if extra_state_like is not None:
        extra = {k: tree[k] for k in extra_state_like}
        return tree["params"], tree["opt_state"], extra, meta
    return tree["params"], tree["opt_state"], meta


# alias: callers validating a config stamp before a structured load read
# the meta sidecar only (shape-agnostic — a foreign-config checkpoint is
# refused with the stamp diagnostic, not a shape mismatch from deep inside
# the tree)
load_meta = read_meta


def load_pytree(path: str, like: Any) -> Tuple[Any, dict]:
    """Load a pytree saved with :func:`save_pytree` into the structure of
    ``like`` (shapes/keys must match).  Returns (tree, meta)."""
    with np.load(path, allow_pickle=False) as f:
        meta = json.loads(str(f["__meta__"])) if "__meta__" in f else {}
        stored = {k: f[k] for k in f.files if k != "__meta__"}
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path_elems, leaf in flat:
        key = _SEP.join(_path_elem_str(p) for p in path_elems)
        if key not in stored:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = stored[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key!r}: checkpoint {arr.shape} vs "
                f"template {np.shape(leaf)}"
            )
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
