"""Caffe2/Detectron pickle weight import (reference: utils/c2_model_loading.py).

Loads the Caffe2 ``R-50.pkl`` ImageNet blobs (names like ``res2_0_branch2a_w``,
``res_conv1_bn_s``) and converts them into this framework's backbone body
subtree ({'params': ..., 'constants': ...}), OIHW -> HWIO. The rename pipeline
reproduces _rename_basic_resnet_weights (c2_model_loading.py:12-62) without
string-replace fragility: direct regex parsing of the C2 blob grammar.
"""

from __future__ import annotations

import pickle
import re
from typing import Dict, Tuple

import numpy as np


def load_c2_pickle(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if "blobs" in data:
        data = data["blobs"]
    return {k: np.asarray(v) for k, v in data.items() if not k.endswith("_momentum")}


def map_c2_resnet_key(key: str):
    """One C2 blob name -> (collection, path, transform) in the body subtree.

    Returns None for blobs with no equivalent (fc1000 classifier etc.).
    """
    # stem: conv1_w, res_conv1_bn_{s,b} (+ conv1_b rare)
    if key == "conv1_w":
        return ("params", ("stem", "conv1", "kernel"), "conv")
    m = re.match(r"^(?:res_)?conv1_bn_(s|b)$", key)
    if m:
        leaf = "weight" if m.group(1) == "s" else "bias"
        return ("constants", ("stem", "bn1", leaf), "none")

    # res{S}_{B}_branch{P}{sub}_{w|bn_s|bn_b}
    m = re.match(r"^res(\d)_(\d+)_branch(1|2a|2b|2c)(?:_bn)?_(w|s|b)$", key)
    if m:
        stage, block, branch, leaf = m.groups()
        layer = f"layer{int(stage) - 1}_{block}"
        conv_name = {"2a": "conv1", "2b": "conv2", "2c": "conv3", "1": "downsample_conv"}[branch]
        bn_name = {"2a": "bn1", "2b": "bn2", "2c": "bn3", "1": "downsample_bn"}[branch]
        if leaf == "w" and "_bn_" not in key:
            return ("params", (layer, conv_name, "kernel"), "conv")
        if leaf == "s":
            return ("constants", (layer, bn_name, "weight"), "none")
        if leaf == "b":
            return ("constants", (layer, bn_name, "bias"), "none")
    return None


def convert_c2_resnet(blobs: Dict[str, np.ndarray]):
    """C2 blobs -> ({'params': body, 'constants': body}, matched, unmatched).

    C2 AffineChannel layers fold BN stats into scale/bias, so running_mean
    stays 0 and running_var stays 1 (the reference relies on the same).
    """
    params: dict = {}
    constants: dict = {}
    matched, unmatched = [], []

    def _set(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for key, value in blobs.items():
        mapping = map_c2_resnet_key(key)
        if mapping is None:
            unmatched.append(key)
            continue
        collection, path, transform = mapping
        arr = value.transpose(2, 3, 1, 0) if transform == "conv" else value
        _set(params if collection == "params" else constants, path, arr)
        matched.append(key)

    # fill neutral running stats for every bn that got scale/bias
    def fill_stats(node):
        for k, v in list(node.items()):
            if isinstance(v, dict):
                if "weight" in v and "running_mean" not in v:
                    n = v["weight"].shape[0]
                    v["running_mean"] = np.zeros(n, np.float32)
                    v["running_var"] = np.ones(n, np.float32)
                else:
                    fill_stats(v)

    fill_stats(constants)
    return {"params": params, "constants": constants}, matched, unmatched


def attach_pretrained_backbone(variables, body_vars, nets=("backbone", "supp_backbone")):
    """Overlay converted C2 body weights onto (both Siamese) backbones."""
    import jax

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])  # copy
    constants = jax.tree_util.tree_map(lambda x: x, variables["constants"])

    def overlay(dst: dict, src: dict):
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst.setdefault(k, {}), v)
            else:
                expected = np.asarray(dst[k])
                arr = np.asarray(v, expected.dtype).reshape(expected.shape)
                dst[k] = arr

    import copy

    params = copy.deepcopy(jax.device_get(params))
    constants = copy.deepcopy(jax.device_get(constants))
    for net in nets:
        if net in params:
            overlay(params[net]["body"], body_vars["params"])
            overlay(constants[net]["body"], body_vars["constants"])
    return {"params": params, "constants": constants}
