"""Checkpointing (reference: maskrcnn_benchmark/utils/checkpoint.py).

Orbax-backed save/load of {params, constants, opt_state, step} with the
reference's resume semantics:

  - a ``last_checkpoint`` tag file records the newest save and takes
    precedence over an explicitly configured weight (checkpoint.py:53-57);
  - FEW_SHOT.UNLOAD_KEYWORD: modules whose path matches keep their freshly
    initialized values instead of checkpoint values (checkpoint.py:99-114);
  - dual-checkpoint FSS load (rpn weights from one file, the rest from
    another — tools/train_net.py:100-110) via two successive partial loads.

Weight import from the reference's torch ``.pth`` files lives in
``torch_import.py``.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def merge_with_unload(loaded, fresh, unload_keywords: Sequence[str]):
    """Return ``loaded`` but with fresh values where a path matches a keyword."""

    def pick(path, loaded_leaf, fresh_leaf):
        p = _path_str(path)
        for kw in unload_keywords:
            if kw and kw in p:
                return fresh_leaf
        return loaded_leaf

    return jax.tree_util.tree_map_with_path(pick, loaded, fresh)


class Checkpointer:
    def __init__(self, save_dir: str, logger=None, cfg=None):
        self.save_dir = os.path.abspath(save_dir)
        self.logger = logger
        self.cfg = cfg  # for cfg.PATHS_CATALOG ModelCatalog overrides
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer() if ocp else None

    def _log(self, msg):
        if self.logger:
            self.logger.info(msg)
        else:
            print(msg, flush=True)

    def tag_file(self) -> str:
        return os.path.join(self.save_dir, "last_checkpoint")

    def has_checkpoint(self) -> bool:
        return os.path.exists(self.tag_file())

    def get_checkpoint_file(self) -> str:
        try:
            with open(self.tag_file(), "r") as f:
                return f.read().strip()
        except OSError:
            return ""

    def save(self, name: str, state) -> str:
        path = os.path.join(self.save_dir, name)
        data = jax.device_get(
            {
                "step": state.step,
                "params": state.params,
                "constants": state.constants,
                "opt_state": state.opt_state,
            }
        )
        self._ckptr.save(path, data, force=True)
        with open(self.tag_file(), "w") as f:
            f.write(path)
        self._log(f"Saved checkpoint to {path}")
        return path

    def load(
        self,
        state,
        f: Optional[str] = None,
        unload_keywords: Sequence[str] = (),
        resume: bool = True,
        prefer_tag: bool = True,
    ):
        """Load with last-checkpoint precedence + UNLOAD_KEYWORD filtering.

        Args:
          state: freshly initialized TrainState (shapes + fresh values).
          f: explicit checkpoint path (overridden by last_checkpoint tag
            unless ``prefer_tag=False``).
          resume: keep the stored iteration counter (FEW_SHOT.RESUME).
          prefer_tag: the reference's resume semantics (checkpoint.py:53-57)
            — the save_dir's last_checkpoint tag wins over ``f``. Pass False
            when ``f`` names the exact checkpoint to evaluate/export (the
            seq_test and export CLIs), otherwise a training dir's tag
            silently redirects the load to the newest checkpoint.
        """
        if prefer_tag and self.has_checkpoint():
            f = self.get_checkpoint_file()
        if not f:
            self._log("No checkpoint found. Initializing model from scratch")
            return state
        if f.startswith(("catalog://", "http://", "https://", "file://")):
            # catalog:// ModelCatalog lookup + URL download cache
            # (reference DetectronCheckpointer._load_file,
            # checkpoint.py:133-145 + model_zoo.py:20)
            from .model_zoo import resolve_weight_path

            f = resolve_weight_path(f, cfg=self.cfg, logger=self.logger)
        self._log(f"Loading checkpoint from {f}")
        if f.endswith(".pth") or f.endswith(".pkl"):
            # reference torch / Caffe2 checkpoints: weights only
            if f.endswith(".pth"):
                from .torch_import import load_torch_checkpoint

                converted, matched, unmatched = load_torch_checkpoint(f)
                self._log(f"torch import: {len(matched)} matched, {len(unmatched)} unmatched")
            else:
                from .c2_import import convert_c2_resnet, load_c2_pickle

                body, matched, unmatched = convert_c2_resnet(load_c2_pickle(f))
                self._log(f"caffe2 import: {len(matched)} matched, {len(unmatched)} unmatched")
                converted = {
                    "params": {"backbone": {"body": body["params"]},
                               "supp_backbone": {"body": body["params"]}},
                    "constants": {"backbone": {"body": body["constants"]},
                                  "supp_backbone": {"body": body["constants"]}},
                }

            def overlay(dst, src):
                out = dict(dst)
                for k, v in src.items():
                    if isinstance(v, dict) and isinstance(dst.get(k), dict):
                        out[k] = overlay(dst[k], v)
                    elif k in dst:
                        out[k] = jax.numpy.asarray(
                            np.asarray(v).reshape(np.asarray(dst[k]).shape)
                        )
                return out

            params = overlay(jax.device_get(state.params), converted["params"])
            constants = overlay(jax.device_get(state.constants), converted["constants"])
            params = merge_with_unload(
                params, jax.device_get(state.params), unload_keywords
            )
            return state.replace(
                params=jax.tree_util.tree_map(jax.numpy.asarray, params),
                constants=jax.tree_util.tree_map(jax.numpy.asarray, constants),
            )
        template = jax.device_get(
            {
                "step": state.step,
                "params": state.params,
                "constants": state.constants,
                "opt_state": state.opt_state,
            }
        )
        data = self._ckptr.restore(f, item=template)
        params = merge_with_unload(data["params"], template["params"], unload_keywords)
        constants = merge_with_unload(
            data["constants"], template["constants"], unload_keywords
        )
        new_state = state.replace(
            params=jax.tree_util.tree_map(jax.numpy.asarray, params),
            constants=jax.tree_util.tree_map(jax.numpy.asarray, constants),
            opt_state=jax.tree_util.tree_map(jax.numpy.asarray, data["opt_state"]),
        )
        if resume:
            new_state = new_state.replace(step=jax.numpy.asarray(data["step"]))
        return new_state
