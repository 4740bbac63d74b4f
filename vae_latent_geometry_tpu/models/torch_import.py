"""Interop with the PyTorch reference's checkpoints and artifacts.

Loads the reference ``state_dict`` files (``experiment/model_seed*.pt``,
``src/artifacts/vae_best_seed*.pth``) into this framework's pytree params,
unlocking golden-value parity tests without retraining.  torch (CPU build) is
used only as a file reader here; nothing in the compute path depends on it.

Layout notes: torch ``nn.Linear.weight`` is (out, in) and is transposed into
our (in, out) convention.  Sequential indices are parsed generically: a 2-D
``weight`` is a Linear layer, a 1-D ``weight`` is a LayerNorm.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

from vae_latent_geometry_tpu.models.evae import EVAEParams, stack_decoders


def _torch_load(path: str):
    """``torch.load`` restricted to data-only content (weights_only=True).

    Everything this module reads — reference state_dicts and spline blobs —
    is plain tensors/dicts/lists/primitives, so the restricted unpickler
    suffices and arbitrary-code-execution pickles from an untrusted ``.pt``
    are rejected instead of executed (this path is reachable from the CLI
    via ``--splines foo.pt``).  Blobs carrying bare numpy scalars/arrays
    (older exporters pickled metadata verbatim) get one retry with numpy's
    reconstruction machinery allowlisted — still data-only.  Full-module
    pickles are NOT supported; the error says to export a state_dict."""
    import pickle

    import torch  # local import: file-reading only

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError as ex:
        safe = [np.ndarray, np.dtype]
        for mod in ("numpy._core.multiarray", "numpy.core.multiarray"):
            try:
                import importlib

                ma = importlib.import_module(mod)
                safe += [ma._reconstruct, ma.scalar]
                break
            except (ImportError, AttributeError):
                continue
        try:
            from numpy import dtypes as _dtypes

            safe += [getattr(_dtypes, n) for n in dir(_dtypes)
                     if n.endswith("DType")]
        except ImportError:
            pass
        try:
            with torch.serialization.safe_globals(safe):
                return torch.load(path, map_location="cpu",
                                  weights_only=True)
        except pickle.UnpicklingError:
            raise RuntimeError(
                f"{path} is not loadable under weights_only=True: it "
                "pickles non-data objects (e.g. a full nn.Module). "
                "Untrusted pickle code is deliberately never executed "
                "here — re-export the checkpoint as a state_dict "
                "(torch.save(model.state_dict(), ...)) or the blob with "
                "plain tensor/primitive content") from ex


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    sd = _torch_load(path)
    return {k: v.detach().numpy() for k, v in sd.items()}


def _sequential_to_mlp(entries: Dict[int, Dict[str, np.ndarray]]):
    """Convert {seq_idx: {'weight':..., 'bias':...}} into our MLP pytree."""
    layers, norms = [], []
    for idx in sorted(entries):
        e = entries[idx]
        w = e["weight"]
        if w.ndim == 2:  # Linear
            layers.append({"w": np.ascontiguousarray(w.T), "b": e["bias"]})
        elif w.ndim == 1:  # LayerNorm
            norms.append({"scale": w, "bias": e["bias"]})
        else:
            raise ValueError(f"unrecognized weight ndim {w.ndim} at index {idx}")
    params: Dict[str, Any] = {"layers": layers}
    if norms:
        params["norms"] = norms
    return params


def _group_sequential(sd: Dict[str, np.ndarray], prefix: str):
    """Collect '<prefix>.<idx>.<weight|bias>' entries."""
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.(weight|bias)$")
    entries: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            entries.setdefault(int(m.group(1)), {})[m.group(2)] = v
    if not entries:
        raise KeyError(f"no entries under prefix {prefix!r}")
    return entries


def load_evae_checkpoint(path: str) -> EVAEParams:
    """Import an ensemble-VAE checkpoint (reference ``src/train.py:165``).

    Keys look like ``encoder.encoder_net.0.weight`` and
    ``decoder.{i}.decoder_net.{j}.weight`` for i in range(num_decoders).
    """
    sd = _load_state_dict(path)
    encoder = _sequential_to_mlp(_group_sequential(sd, "encoder.encoder_net"))

    dec_ids = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"decoder\.(\d+)\.", k))}
    )
    if not dec_ids:
        raise KeyError("no ensemble decoders found in checkpoint")
    decoder_list = [
        _sequential_to_mlp(_group_sequential(sd, f"decoder.{i}.decoder_net"))
        for i in dec_ids
    ]
    return EVAEParams(encoder=encoder, decoders=stack_decoders(decoder_list))


def load_single_vae_checkpoint(path: str):
    """Import a legacy single-VAE checkpoint
    (reference ``src/single_decoder/vae.py``; files ``vae_best_seed*.pth``).

    Returns a dict {'encoder': ..., 'decoder': ...}; the decoder is
    heteroscedastic (output 2*D, mean + clamped log_std).
    """
    sd = _load_state_dict(path)
    return {
        "encoder": _sequential_to_mlp(_group_sequential(sd, "encoder.encoder_net")),
        "decoder": _sequential_to_mlp(_group_sequential(sd, "decoder.decoder_net")),
    }


def load_decoder_checkpoint(path: str):
    """Import a bare decoder state_dict (``decoder_VAE_*.pth``)."""
    sd = _load_state_dict(path)
    return _sequential_to_mlp(_group_sequential(sd, "decoder_net"))


def mean_head(decoder_params):
    """Slice a heteroscedastic decoder (output 2*X: mean ++ log_std,
    reference ``src/single_decoder/vae.py:29-42``) down to its mean head —
    the part the single-decoder energy uses (``decoder(z).mean``,
    ``src/single_decoder/optimize_energy_batched.py:51-57``)."""
    layers = [dict(l) for l in decoder_params["layers"]]
    last = layers[-1]
    x = last["w"].shape[1] // 2
    layers[-1] = {"w": last["w"][:, :x], "b": last["b"][:x]}
    out = {k: v for k, v in decoder_params.items() if k != "layers"}
    out["layers"] = layers
    return out


def load_single_vae_mean_decoder(path: str):
    """The mean-head decoder of a legacy single-VAE checkpoint
    (``vae_best_seed*.pth``) — ready for the single-decoder energy paths."""
    return mean_head(load_single_vae_checkpoint(path)["decoder"])


def load_spline_blob(path: str) -> Dict[str, Any]:
    """Load a reference spline blob (.pt) into numpy arrays.

    Blob schema (written at ``src/optimize.py:190-201`` /
    ``src/init_splines_ensemble.py:212-216``): dict with 'spline_data' (list of
    per-pair dicts carrying a, b, basis, omega_init[, omega_optimized,
    geodesic_length, euclidean_distance]), 'representatives', 'pairs',
    optionally 'metadata'.  Bare lists (legacy single-decoder blobs,
    ``src/single_decoder/optimize_energy.py:262``) are wrapped.
    """
    blob = _torch_load(path)
    if isinstance(blob, list):
        blob = {"spline_data": blob, "representatives": None, "pairs": None}

    def conv(v):
        import torch as _t

        if isinstance(v, _t.Tensor):
            return v.detach().numpy()
        return v

    out = dict(blob)
    out["spline_data"] = [
        {k: conv(v) for k, v in d.items()} for d in blob["spline_data"]
    ]
    return out
