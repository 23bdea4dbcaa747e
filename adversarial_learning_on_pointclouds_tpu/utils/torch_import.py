"""Import reference PyTorch ``.pth`` checkpoints into this framework.

Migration path for users of the reference repo: load a
``torch.save(model.state_dict())`` file (the reference's per-epoch
checkpoint format, SURVEY.md §2.10) and translate it into our param/BN
pytrees. Layout translation is the inverse of ``tests/torch_ref.py``:
torch ``Conv1d`` weight ``[out, in, 1]`` / ``Linear`` ``[out, in]`` ->
ours ``[in, out]``; BN weight/bias/running stats -> scale/bias/mean/var.

Name mapping follows the surveyed reference module names
(``upstream:pointnet/model.py``: ``feat.stn.conv1`` ...,
``upstream:model/discriminator.py``: ``conv1..4`` + ``classifier``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np


def _w(sd: Dict[str, Any], name: str) -> np.ndarray:
    w = np.asarray(sd[f"{name}.weight"], dtype=np.float32)
    if w.ndim == 3:  # Conv1d [out, in, 1]
        w = w[..., 0]
    return w.T.copy()  # -> [in, out]


def _b(sd: Dict[str, Any], name: str) -> np.ndarray:
    return np.asarray(sd[f"{name}.bias"], dtype=np.float32)


def _dense(sd, name):
    return {"w": jnp.asarray(_w(sd, name)), "b": jnp.asarray(_b(sd, name))}


def _bn(sd, name) -> Tuple[dict, dict]:
    p = {"scale": jnp.asarray(np.asarray(sd[f"{name}.weight"], np.float32)),
         "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))}
    s = {"mean": jnp.asarray(
            np.asarray(sd[f"{name}.running_mean"], np.float32)),
         "var": jnp.asarray(
            np.asarray(sd[f"{name}.running_var"], np.float32))}
    return p, s


def _tnet_from_sd(sd, prefix: str) -> Tuple[dict, dict]:
    params, state = {}, {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _dense(sd, f"{prefix}.conv{i}")
        params[f"bn{i}"], state[f"bn{i}"] = _bn(sd, f"{prefix}.bn{i}")
    for i, bn_name in ((1, "bn4"), (2, "bn5")):
        params[f"fc{i}"] = _dense(sd, f"{prefix}.fc{i}")
        params[f"bn_fc{i}"], state[f"bn_fc{i}"] = _bn(
            sd, f"{prefix}.{bn_name}")
    params["fc3"] = _dense(sd, f"{prefix}.fc3")
    return params, state


def _encoder_from_sd(sd, prefix: str = "feat") -> Tuple[dict, dict]:
    params, state = {}, {}
    params["stn"], state["stn"] = _tnet_from_sd(sd, f"{prefix}.stn")
    for i in (1, 2, 3):
        params[f"conv{i}"] = _dense(sd, f"{prefix}.conv{i}")
        params[f"bn{i}"], state[f"bn{i}"] = _bn(sd, f"{prefix}.bn{i}")
    if any(k.startswith(f"{prefix}.fstn.") for k in sd):
        params["fstn"], state["fstn"] = _tnet_from_sd(sd, f"{prefix}.fstn")
    return params, state


def classifier_from_state_dict(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """``PointNetCls.state_dict()`` -> ``(params, bn_state)``."""
    params, state = {}, {}
    params["feat"], state["feat"] = _encoder_from_sd(sd)
    for i in (1, 2, 3):
        params[f"fc{i}"] = _dense(sd, f"fc{i}")
    for i in (1, 2):
        params[f"bn{i}"], state[f"bn{i}"] = _bn(sd, f"bn{i}")
    return params, state


def segmenter_from_state_dict(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """``PointNetDenseCls.state_dict()`` -> ``(params, bn_state)``."""
    params, state = {}, {}
    params["feat"], state["feat"] = _encoder_from_sd(sd)
    for i in (1, 2, 3):
        params[f"conv{i}"] = _dense(sd, f"conv{i}")
        params[f"bn{i}"], state[f"bn{i}"] = _bn(sd, f"bn{i}")
    params["conv4"] = _dense(sd, "conv4")
    return params, state


def discriminator_from_state_dict(sd: Dict[str, Any]) -> dict:
    """``FCDiscriminator.state_dict()`` -> params."""
    params = {}
    for i in (1, 2, 3, 4):
        params[f"conv{i}"] = _dense(sd, f"conv{i}")
    params["conv5"] = _dense(sd, "classifier")
    return params


def load_pth(path: str) -> Dict[str, Any]:
    """Load a ``.pth`` state_dict (CPU, weights-only when supported)."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        sd = torch.load(path, map_location="cpu")
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
