"""Checkpoint-layout interop with the reference's torch ``state_dict``s.

The reference checkpoints carry ``g_state_dict`` / ``d_state_dict`` keyed by
torch ``nn.Sequential`` indices (reference: waveform_train.py:401-411; key
layout from waveform_train.py:101-246).  Because our pytrees keep torch
weight layouts (see scgrhc.ops.nn), conversion is a pure relabeling — no
transposes — so a reference checkpoint loads bit-exactly and vice versa.

Key maps:
  generator  ``<block>.0/.3`` ↔ ``<block>.conv1/conv2`` (double-conv blocks),
             ``att*.W_x|W_g|psi.0`` ↔ ``att*.W_x|W_g|psi``,
             ``up*`` ↔ ``up*`` (ConvTranspose, (in,out,k)), ``final``.
  critic     ``model.{0,2,5,8,11}`` ↔ ``conv0..conv4``.
"""

from __future__ import annotations

import numpy as np

_GEN_BLOCKS = ("enc1", "enc2", "enc3", "bottleneck", "dec3", "dec2", "dec1")
_ATT_NAMES = ("att3", "att2", "att1")
_UP_NAMES = ("up3", "up2", "up1")
_CRITIC_SEQ_IDX = (0, 2, 5, 8, 11)


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def generator_from_torch_sd(sd: dict) -> dict:
    p: dict = {}
    for name in _GEN_BLOCKS:
        p[name] = {
            "conv1": {"w": _np(sd[f"{name}.0.weight"]), "b": _np(sd[f"{name}.0.bias"])},
            "conv2": {"w": _np(sd[f"{name}.3.weight"]), "b": _np(sd[f"{name}.3.bias"])},
        }
    for name in _ATT_NAMES:
        p[name] = {
            sub: {
                "w": _np(sd[f"{name}.{sub}.0.weight"]),
                "b": _np(sd[f"{name}.{sub}.0.bias"]),
            }
            for sub in ("W_x", "W_g", "psi")
        }
    for name in _UP_NAMES:
        p[name] = {"w": _np(sd[f"{name}.weight"]), "b": _np(sd[f"{name}.bias"])}
    p["final"] = {"w": _np(sd["final.weight"]), "b": _np(sd["final.bias"])}
    return p


def generator_to_torch_sd(params: dict, as_torch: bool = True) -> dict:
    sd: dict = {}
    for name in _GEN_BLOCKS:
        sd[f"{name}.0.weight"] = np.asarray(params[name]["conv1"]["w"])
        sd[f"{name}.0.bias"] = np.asarray(params[name]["conv1"]["b"])
        sd[f"{name}.3.weight"] = np.asarray(params[name]["conv2"]["w"])
        sd[f"{name}.3.bias"] = np.asarray(params[name]["conv2"]["b"])
    for name in _ATT_NAMES:
        for sub in ("W_x", "W_g", "psi"):
            sd[f"{name}.{sub}.0.weight"] = np.asarray(params[name][sub]["w"])
            sd[f"{name}.{sub}.0.bias"] = np.asarray(params[name][sub]["b"])
    for name in _UP_NAMES:
        sd[f"{name}.weight"] = np.asarray(params[name]["w"])
        sd[f"{name}.bias"] = np.asarray(params[name]["b"])
    sd["final.weight"] = np.asarray(params["final"]["w"])
    sd["final.bias"] = np.asarray(params["final"]["b"])
    if as_torch:
        import torch

        sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    return sd


def critic_from_torch_sd(sd: dict) -> dict:
    return {
        f"conv{i}": {
            "w": _np(sd[f"model.{idx}.weight"]),
            "b": _np(sd[f"model.{idx}.bias"]),
        }
        for i, idx in enumerate(_CRITIC_SEQ_IDX)
    }


def critic_to_torch_sd(params: dict, as_torch: bool = True) -> dict:
    sd = {}
    for i, idx in enumerate(_CRITIC_SEQ_IDX):
        sd[f"model.{idx}.weight"] = np.asarray(params[f"conv{i}"]["w"])
        sd[f"model.{idx}.bias"] = np.asarray(params[f"conv{i}"]["b"])
    if as_torch:
        import torch

        sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    return sd
