"""Export the flax param tree back to a reference-compatible torch .pth.

The inverse of torch_import.py (reference utils/model_serialization.py's
load direction has no save counterpart — the reference can only consume
its own checkpoints, so a model fine-tuned HERE could never flow back).
This closes the interop loop: params trained in this framework load into
the reference torch model with ``load_state_dict`` (key-compatible with
checkpoints saved by the reference's DetectronCheckpointer).

Every generated key is verified at construction time by feeding it back
through ``torch_import.map_reference_key`` and checking it round-trips to
the exact (collection, path, transform) it came from — the two mappings
can never drift apart silently.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from .torch_import import map_reference_key

_PREDICTOR = {"cls_score", "bbox_pred"}
_FCOS_FINAL = {"cls_logits", "bbox_pred", "centerness"}
_COMPRESS = {"compress_0": 0, "compress_gn0": 1, "compress_1": 3,
             "compress_gn1": 4}


def map_flax_leaf(collection: str, path: Tuple[str, ...]):
    """Map one flax leaf (collection, path) to (reference_key, transform).

    transform names the FORWARD (torch->flax) transform from
    map_reference_key; the exporter applies its inverse. Returns None for
    leaves with no reference equivalent.
    """
    p = path
    # ---- backbones (params + FrozenBN constants) -------------------------
    if p[0] in ("backbone", "supp_backbone"):
        net = p[0]
        if p[1] == "body":
            if p[2] == "stem":
                if collection == "params" and p[3:] == ("conv1", "kernel"):
                    return f"{net}.body.stem.conv1.weight", "conv"
                if collection == "constants" and p[3] == "bn1":
                    return f"{net}.body.stem.bn1.{p[4]}", "none"
                return None
            m = re.match(r"^layer(\d)_(\d+)$", p[2])
            if not m:
                return None
            s, b = m.groups()
            if collection == "params":
                r = re.match(r"^conv(\d)$", p[3])
                if r and p[4] == "kernel":
                    return f"{net}.body.layer{s}.{b}.conv{r.group(1)}.weight", "conv"
                if p[3] == "downsample_conv" and p[4] == "kernel":
                    return f"{net}.body.layer{s}.{b}.downsample.0.weight", "conv"
            else:
                r = re.match(r"^bn(\d)$", p[3])
                if r:
                    return f"{net}.body.layer{s}.{b}.bn{r.group(1)}.{p[4]}", "none"
                if p[3] == "downsample_bn":
                    return f"{net}.body.layer{s}.{b}.downsample.1.{p[4]}", "none"
            return None
        if p[1] == "fpn" and collection == "params":
            name, leaf = p[2], p[3]
            w = "weight" if leaf == "kernel" else "bias"
            t = "conv" if leaf == "kernel" else "none"
            if re.match(r"^(fpn_inner\d|fpn_layer\d)$", name):
                return f"{net}.fpn.{name}.{w}", t
            r = re.match(r"^top_p(\d)$", name)
            if r:
                return f"{net}.fpn.top_blocks.p{r.group(1)}.{w}", t
        return None

    if collection != "params":
        return None

    # ---- FCOS head --------------------------------------------------------
    if p[0] == "fcos_head":
        m = re.match(r"^(cls_tower|bbox_tower)_(\d+)$", p[1])
        if m:
            tower, block = m.group(1), int(m.group(2))
            if p[2] == "Conv_0":
                w = "weight" if p[3] == "kernel" else "bias"
                t = "conv" if p[3] == "kernel" else "none"
                return f"rpn.head.{tower}.{3 * block}.{w}", t
            if p[2] == "GroupNorm_0":
                w = "weight" if p[3] == "scale" else "bias"
                return f"rpn.head.{tower}.{3 * block + 1}.{w}", "none"
            return None
        if p[1] in _FCOS_FINAL:
            w = "weight" if p[2] == "kernel" else "bias"
            t = "conv" if p[2] == "kernel" else "none"
            return f"rpn.head.{p[1]}.{w}", t
        m = re.match(r"^scale_(\d)$", p[1])
        if m and p[2] == "scale":
            return f"rpn.head.scales.{m.group(1)}.scale", "scalar"
        return None

    # ---- ROI head ----------------------------------------------------------
    if p[0] == "roi_head":
        name = p[1]
        if name in _COMPRESS:
            idx = _COMPRESS[name]
            gn = "gn" in name
            w = ("weight" if p[2] in ("kernel", "scale") else "bias")
            t = "conv" if (not gn and p[2] == "kernel") else "none"
            return f"roi_heads.box.compress_dim_conv.{idx}.{w}", t
        if name == "aggreg":
            w = "weight" if p[2] == "kernel" else "bias"
            t = "conv" if p[2] == "kernel" else "none"
            return f"roi_heads.box.feature_aggreg.0.{w}", t
        if name == "aggreg_gn":
            w = "weight" if p[2] == "scale" else "bias"
            return f"roi_heads.box.feature_aggreg.1.{w}", "none"
        if name in ("fc6", "fc7"):
            w = "weight" if p[2] == "kernel" else "bias"
            t = "linear" if p[2] == "kernel" else "none"
            return f"roi_heads.box.{name}.{w}", t
        if name in _PREDICTOR:
            w = "weight" if p[2] == "kernel" else "bias"
            t = "linear" if p[2] == "kernel" else "none"
            return f"roi_heads.box.predictor.{name}.{w}", t
        return None

    return None


def _leaves(tree, prefix=()):
    if isinstance(tree, dict) or type(tree).__name__ == "FrozenDict":
        for k in tree:
            yield from _leaves(tree[k], prefix + (str(k),))
    else:
        yield prefix, tree


def export_state_dict(variables) -> Tuple[Dict[str, np.ndarray],
                                          List[str], List[str]]:
    """Convert {'params', 'constants'} to a reference-keyed state dict.

    Returns (state_dict, exported reference keys, skipped flax paths).
    Raises if a generated key does not round-trip through
    torch_import.map_reference_key to the leaf it came from.
    """
    out: Dict[str, np.ndarray] = {}
    exported, skipped = [], []
    for collection in ("params", "constants"):
        for path, arr in _leaves(variables.get(collection, {})):
            mapping = map_flax_leaf(collection, path)
            if mapping is None:
                skipped.append(f"{collection}/" + "/".join(path))
                continue
            key, transform = mapping
            back = map_reference_key(key)
            if back != (collection, tuple(path), transform):
                raise ValueError(
                    f"export mapping drift: {collection}/{'/'.join(path)} -> "
                    f"{key!r} -> {back!r}")
            arr = np.asarray(arr, dtype=np.float32)
            if transform == "conv":
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            elif transform == "linear":
                arr = arr.transpose(1, 0)        # (in, out) -> (out, in)
            elif transform == "scalar":
                arr = arr.reshape((1,))          # () -> (1,) torch Scale
            out[key] = arr
            exported.append(key)
    return out, exported, skipped


def save_torch_checkpoint(variables, path: str):
    """Write a reference-loadable .pth: {'model': state_dict} exactly as the
    reference's DetectronCheckpointer.save lays it out."""
    import torch

    sd, exported, skipped = export_state_dict(variables)
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               path)
    return exported, skipped
