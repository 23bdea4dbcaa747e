"""Export this framework's parameters as reference PyTorch ``.pth`` files.

The inverse of ``utils/torch_import.py``: translate our param/BN pytrees
into ``state_dict``s with the surveyed reference module names
(``upstream:pointnet/model.py``, ``upstream:model/discriminator.py``), so
a checkpoint trained here loads straight into the reference's
``model.load_state_dict(torch.load(...))`` with ``strict=True``. Layout
translation mirrors the importer: ours ``[in, out]`` -> torch ``Conv1d``
``[out, in, 1]`` / ``Linear`` ``[out, in]``; scale/bias/mean/var ->
BN weight/bias/running_mean/running_var (+ ``num_batches_tracked``,
which torch's strict load requires).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(a) -> "object":
    import torch

    return torch.from_numpy(np.asarray(a, dtype=np.float32).copy())


def _set_dense(sd: Dict[str, Any], name: str, p: dict,
               conv: bool) -> None:
    w = np.asarray(p["w"], np.float32).T  # [in,out] -> [out,in]
    sd[f"{name}.weight"] = _t(w[..., None] if conv else w)
    sd[f"{name}.bias"] = _t(np.asarray(p["b"], np.float32))


def _set_bn(sd: Dict[str, Any], name: str, p: dict, s: dict) -> None:
    import torch

    sd[f"{name}.weight"] = _t(p["scale"])
    sd[f"{name}.bias"] = _t(p["bias"])
    sd[f"{name}.running_mean"] = _t(s["mean"])
    sd[f"{name}.running_var"] = _t(s["var"])
    sd[f"{name}.num_batches_tracked"] = torch.zeros((), dtype=torch.long)


def _tnet_to_sd(sd, prefix: str, params: dict, state: dict) -> None:
    for i in (1, 2, 3):
        _set_dense(sd, f"{prefix}.conv{i}", params[f"conv{i}"], conv=True)
        _set_bn(sd, f"{prefix}.bn{i}", params[f"bn{i}"], state[f"bn{i}"])
    for i, bn_name in ((1, "bn4"), (2, "bn5")):
        _set_dense(sd, f"{prefix}.fc{i}", params[f"fc{i}"], conv=False)
        _set_bn(sd, f"{prefix}.{bn_name}", params[f"bn_fc{i}"],
                state[f"bn_fc{i}"])
    _set_dense(sd, f"{prefix}.fc3", params["fc3"], conv=False)


def _encoder_to_sd(sd, params: dict, state: dict,
                   prefix: str = "feat") -> None:
    _tnet_to_sd(sd, f"{prefix}.stn", params["stn"], state["stn"])
    for i in (1, 2, 3):
        _set_dense(sd, f"{prefix}.conv{i}", params[f"conv{i}"], conv=True)
        _set_bn(sd, f"{prefix}.bn{i}", params[f"bn{i}"], state[f"bn{i}"])
    if "fstn" in params:
        _tnet_to_sd(sd, f"{prefix}.fstn", params["fstn"], state["fstn"])


def classifier_state_dict(params: dict, bn_state: dict) -> Dict[str, Any]:
    """``(params, bn_state)`` -> reference ``PointNetCls.state_dict()``."""
    sd: Dict[str, Any] = {}
    _encoder_to_sd(sd, params["feat"], bn_state["feat"])
    for i in (1, 2, 3):
        _set_dense(sd, f"fc{i}", params[f"fc{i}"], conv=False)
    for i in (1, 2):
        _set_bn(sd, f"bn{i}", params[f"bn{i}"], bn_state[f"bn{i}"])
    return sd


def segmenter_state_dict(params: dict, bn_state: dict) -> Dict[str, Any]:
    """``(params, bn_state)`` -> ``PointNetDenseCls.state_dict()``."""
    sd: Dict[str, Any] = {}
    _encoder_to_sd(sd, params["feat"], bn_state["feat"])
    for i in (1, 2, 3):
        _set_dense(sd, f"conv{i}", params[f"conv{i}"], conv=True)
        _set_bn(sd, f"bn{i}", params[f"bn{i}"], bn_state[f"bn{i}"])
    _set_dense(sd, "conv4", params["conv4"], conv=True)
    return sd


def discriminator_state_dict(params: dict) -> Dict[str, Any]:
    """D params -> ``FCDiscriminator.state_dict()``."""
    sd: Dict[str, Any] = {}
    for i in (1, 2, 3, 4):
        _set_dense(sd, f"conv{i}", params[f"conv{i}"], conv=True)
    _set_dense(sd, "classifier", params["conv5"], conv=True)
    return sd


def save_pth(path: str, sd: Dict[str, Any]) -> str:
    """``torch.save`` the state_dict (the reference checkpoint format)."""
    import torch

    torch.save(sd, path)
    return path
