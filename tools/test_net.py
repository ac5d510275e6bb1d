#!/usr/bin/env python
"""Evaluation CLI (reference: tools/test_net.py).

Supports the reference's --seq_test protocol: iterate checkpoints under
TEST.LOAD_DIR whose iteration number is within [TEST.MIN_ITER,
TEST.MAX_ITER], evaluating each (test_net.py:68-83). Per-class evaluation is
driven by FEW_SHOT.TEST_SELECTED_CLS as in the reference README.
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description="One-Shot Detection Evaluation (TPU)")
    parser.add_argument("--config-file", default="", type=str)
    parser.add_argument("--seq_test", action="store_true")
    parser.add_argument("--ckpt", default="", type=str)
    parser.add_argument("--device", default="", help="force jax platform (e.g. cpu)")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.utils.profiling import setup_compile_cache

    setup_compile_cache()
    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.data import make_data_loader
    from oneshotdet_tpu.engine import create_train_state
    from oneshotdet_tpu.engine.inference import inference
    from oneshotdet_tpu.engine.trainer import batch_to_inputs
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.solver import make_optimizer
    from oneshotdet_tpu.utils.checkpoint import Checkpointer
    from oneshotdet_tpu.utils.logger import setup_logger

    c = cfg.clone()
    if args.config_file:
        c.merge_from_file(args.config_file)
    if args.opts:
        c.merge_from_list(args.opts)

    logger = setup_logger("oneshotdet_tpu", c.OUTPUT_DIR, "test_log.txt")
    logger.info(f"config:\n{c}")
    model = build_detection_model(c)
    loader, dataset = make_data_loader(c, is_train=False)

    # init shapes on CPU
    first = next(iter(loader))
    cpu = jax.devices("cpu")[0]
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    with jax.default_device(cpu), disable_pallas():
        images, supp, targets = batch_to_inputs(
            {k: jnp.asarray(v) for k, v in first.items() if k not in ("img_ids", "idxs")}
        )
        variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp, train=False)

    def run_one(ckpt_path, out_dir):
        from oneshotdet_tpu.utils.torch_import import load_torch_checkpoint

        if ckpt_path and ckpt_path.endswith(".pth"):
            converted, matched, unmatched = load_torch_checkpoint(ckpt_path)
            logger.info(f"torch import: {len(matched)} matched, {len(unmatched)} unmatched")
            vars_ = {"params": converted["params"], "constants": converted["constants"]}
        elif ckpt_path:
            # root the checkpointer at the EVAL output dir, not LOAD_DIR:
            # load() gives a last_checkpoint tag precedence over the explicit
            # path (reference checkpoint.py:53-57), and LOAD_DIR carries the
            # tag from training — rooting there would silently evaluate the
            # newest checkpoint for every seq_test entry. The reference
            # likewise roots at OUTPUT_DIR (tools/test_net.py:59-64).
            ckptr = Checkpointer(out_dir, logger, cfg=c)
            optimizer, _ = make_optimizer(c, variables["params"])

            class _S:  # minimal state shim for Checkpointer.load
                pass

            from oneshotdet_tpu.engine import TrainState

            state = TrainState(
                step=jnp.zeros((), jnp.int32), params=variables["params"],
                constants=variables.get("constants", {}),
                opt_state=optimizer.init(variables["params"]),
            )
            state = ckptr.load(state, f=ckpt_path, resume=False)
            vars_ = {"params": state.params, "constants": state.constants}
        else:
            vars_ = variables
        fresh_loader, _ = make_data_loader(c, is_train=False)
        stop = c.FEW_SHOT.STOP_ITER if c.FEW_SHOT.STOP_ITER > 0 else None
        # shard eval over all local chips when the batch divides the mesh
        mesh = None
        n_dev = len(jax.devices())
        if n_dev > 1 and c.TEST.IMS_PER_BATCH % n_dev == 0:
            from oneshotdet_tpu.parallel import make_mesh

            mesh = make_mesh(("data",))
        else:
            vars_ = jax.device_put(vars_, jax.devices()[0])
        return inference(c, model, vars_, fresh_loader, dataset, out_dir, stop,
                         logger, mesh=mesh)

    if args.seq_test:
        files = sorted(glob.glob(os.path.join(c.TEST.LOAD_DIR, "model_*")))
        for f in files:
            m = re.search(r"model_(\d+)", os.path.basename(f))
            if not m:
                continue
            it = int(m.group(1))
            if not (c.TEST.MIN_ITER <= it <= c.TEST.MAX_ITER):
                continue
            out_dir = os.path.join(c.OUTPUT_DIR, f"eval_{it:07d}")
            logger.info(f"=== seq_test checkpoint {f} ===")
            run_one(f, out_dir)
    else:
        run_one(args.ckpt or c.MODEL.WEIGHT, os.path.join(c.OUTPUT_DIR, "eval"))


if __name__ == "__main__":
    main()
