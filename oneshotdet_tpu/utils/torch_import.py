"""Import reference torch checkpoints (.pth) into the flax param tree.

Replaces utils/model_serialization.py + utils/c2_model_loading.py for the
common case: a state dict saved by the reference's DetectronCheckpointer.
Handles:

  - conv weights OIHW -> HWIO;
  - linear weights (out, in) -> (in, out) (fc6 input ordering already
    matches because ROIBoxHeadNet flattens channel-major);
  - FrozenBN buffers -> the 'constants' collection;
  - GroupNorm weight/bias -> scale/bias;
  - the tower indexing cls_tower.{3i} = conv i, cls_tower.{3i+1} = GN i;
  - optional 'module.' (DDP) prefix stripping.

Unmatched keys are reported, mirroring align_and_update_state_dicts's
logging (model_serialization.py:10-58).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def map_reference_key(key: str):
    """Map one reference state-dict key to (collection, path, transform).

    transform: 'conv' (OIHW->HWIO), 'linear' (T), 'none'.
    Returns None for keys with no equivalent (e.g. num_batches_tracked).
    """
    key = re.sub(r"^module\.", "", key)
    if "num_batches_tracked" in key:
        return None

    # ---- backbones --------------------------------------------------------
    m = re.match(r"^(backbone|supp_backbone)\.(body|fpn)\.(.*)$", key)
    if m:
        net, part, rest = m.groups()
        if part == "body":
            r = re.match(r"^stem\.conv1\.weight$", rest)
            if r:
                return ("params", (net, "body", "stem", "conv1", "kernel"), "conv")
            r = re.match(r"^stem\.bn1\.(weight|bias|running_mean|running_var)$", rest)
            if r:
                return ("constants", (net, "body", "stem", "bn1", r.group(1)), "none")
            r = re.match(r"^layer(\d)\.(\d+)\.conv(\d)\.weight$", rest)
            if r:
                s, b, c = r.groups()
                return ("params", (net, "body", f"layer{s}_{b}", f"conv{c}", "kernel"), "conv")
            r = re.match(r"^layer(\d)\.(\d+)\.bn(\d)\.(weight|bias|running_mean|running_var)$", rest)
            if r:
                s, b, c, leaf = r.groups()
                return ("constants", (net, "body", f"layer{s}_{b}", f"bn{c}", leaf), "none")
            r = re.match(r"^layer(\d)\.(\d+)\.downsample\.0\.weight$", rest)
            if r:
                s, b = r.groups()
                return ("params", (net, "body", f"layer{s}_{b}", "downsample_conv", "kernel"), "conv")
            r = re.match(r"^layer(\d)\.(\d+)\.downsample\.1\.(weight|bias|running_mean|running_var)$", rest)
            if r:
                s, b, leaf = r.groups()
                return ("constants", (net, "body", f"layer{s}_{b}", "downsample_bn", leaf), "none")
        else:  # fpn
            r = re.match(r"^(fpn_inner\d|fpn_layer\d)\.(weight|bias)$", rest)
            if r:
                name, leaf = r.groups()
                leaf = "kernel" if leaf == "weight" else "bias"
                t = "conv" if leaf == "kernel" else "none"
                return ("params", (net, "fpn", name, leaf), t)
            r = re.match(r"^top_blocks\.p(\d)\.(weight|bias)$", rest)
            if r:
                lvl, leaf = r.groups()
                leaf2 = "kernel" if leaf == "weight" else "bias"
                t = "conv" if leaf == "weight" else "none"
                return ("params", (net, "fpn", f"top_p{lvl}", leaf2), t)

    # ---- FCOS head --------------------------------------------------------
    m = re.match(r"^rpn\.head\.(cls_tower|bbox_tower)\.(\d+)\.(weight|bias)$", key)
    if m:
        tower, idx, leaf = m.groups()
        idx = int(idx)
        block = idx // 3
        kind = idx % 3  # 0 conv, 1 gn
        if kind == 0:
            leaf2 = "kernel" if leaf == "weight" else "bias"
            t = "conv" if leaf == "weight" else "none"
            return ("params", ("fcos_head", f"{tower}_{block}", "Conv_0", leaf2), t)
        if kind == 1:
            leaf2 = "scale" if leaf == "weight" else "bias"
            return ("params", ("fcos_head", f"{tower}_{block}", "GroupNorm_0", leaf2), "none")
        return None
    m = re.match(r"^rpn\.head\.(cls_logits|bbox_pred|centerness)\.(weight|bias)$", key)
    if m:
        name, leaf = m.groups()
        leaf2 = "kernel" if leaf == "weight" else "bias"
        t = "conv" if leaf == "weight" else "none"
        return ("params", ("fcos_head", name, leaf2), t)
    m = re.match(r"^rpn\.head\.scales\.(\d)\.scale$", key)
    if m:
        return ("params", ("fcos_head", f"scale_{m.group(1)}", "scale"), "scalar")

    # ---- ROI head ---------------------------------------------------------
    m = re.match(r"^roi_heads\.box\.compress_dim_conv\.(\d)\.(weight|bias)$", key)
    if m:
        idx, leaf = int(m.group(1)), m.group(2)
        mapping = {0: ("compress_0", "conv"), 1: ("compress_gn0", "gn"),
                   3: ("compress_1", "conv"), 4: ("compress_gn1", "gn")}
        if idx not in mapping:
            return None
        name, kind = mapping[idx]
        if kind == "conv":
            leaf2 = "kernel" if leaf == "weight" else "bias"
            t = "conv" if leaf == "weight" else "none"
        else:
            leaf2 = "scale" if leaf == "weight" else "bias"
            t = "none"
        return ("params", ("roi_head", name, leaf2), t)
    m = re.match(r"^roi_heads\.box\.feature_aggreg\.(\d)\.(weight|bias)$", key)
    if m:
        idx, leaf = int(m.group(1)), m.group(2)
        if idx == 0:
            leaf2 = "kernel" if leaf == "weight" else "bias"
            return ("params", ("roi_head", "aggreg", leaf2), "conv" if leaf == "weight" else "none")
        if idx == 1:
            leaf2 = "scale" if leaf == "weight" else "bias"
            return ("params", ("roi_head", "aggreg_gn", leaf2), "none")
        return None
    m = re.match(r"^roi_heads\.box\.(fc6|fc7)\.(weight|bias)$", key)
    if m:
        name, leaf = m.groups()
        leaf2 = "kernel" if leaf == "weight" else "bias"
        return ("params", ("roi_head", name, leaf2), "linear" if leaf == "weight" else "none")
    m = re.match(r"^roi_heads\.box\.predictor\.(cls_score|bbox_pred)\.(weight|bias)$", key)
    if m:
        name, leaf = m.groups()
        leaf2 = "kernel" if leaf == "weight" else "bias"
        return ("params", ("roi_head", name, leaf2), "linear" if leaf == "weight" else "none")

    return None


def convert_state_dict(state_dict: Dict[str, "np.ndarray"]):
    """Convert a reference state dict to {'params': ..., 'constants': ...}.

    Returns (variables, matched_keys, unmatched_keys).
    """
    params: dict = {}
    constants: dict = {}
    matched, unmatched = [], []
    for key, value in state_dict.items():
        arr = np.asarray(value)
        mapping = map_reference_key(key)
        if mapping is None:
            unmatched.append(key)
            continue
        collection, path, transform = mapping
        if transform == "conv":
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif transform == "linear":
            arr = arr.transpose(1, 0)  # (out, in) -> (in, out)
        elif transform == "scalar":
            arr = arr.reshape(())
        _set(params if collection == "params" else constants, path, arr)
        matched.append(key)
    return {"params": params, "constants": constants}, matched, unmatched


def load_torch_checkpoint(path: str):
    """Load a reference .pth via torch (CPU) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    return convert_state_dict(sd)
