#!/usr/bin/env python
"""Serving-export CLI: serialize the eval program to StableHLO artifacts.

No reference counterpart — the reference's deployment story is re-running
the python model per frame (demo/predictor.py, SURVEY §3.4). This produces
ahead-of-time artifacts loadable without the model-building python:

  python tools/export_model.py --config-file configs/oneshot_fcos_r50.yaml \
      --ckpt model.pth --out /models/oneshot --kind both

writes /models/oneshot.eval (full forward, support recomputed per call) and
/models/oneshot.serve.{support,detect} (cached-support deployment pair).
Load with oneshotdet_tpu.export.load(path) and call via jax.jit(exp.call).

Run on the target platform (TPU host for TPU-serving artifacts: the Pallas
ROIAlign kernel embeds its Mosaic lowering at export time; a CPU export
uses the XLA fallback and runs anywhere).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description="One-Shot Detection serving export")
    p.add_argument("--config-file", default="", type=str)
    p.add_argument("--ckpt", default="", type=str,
                   help=".pth (reference torch) or orbax checkpoint path; "
                        "random init if omitted")
    p.add_argument("--out", required=True, type=str,
                   help="output path stem for the artifacts")
    p.add_argument("--kind", default="both",
                   choices=["full", "cached_support", "both"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--device", default="", help="force jax platform")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu import export as oexport
    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    from oneshotdet_tpu.structures import ImageBatch

    c = cfg.clone()
    if args.config_file:
        c.merge_from_file(args.config_file)
    if args.opts:
        c.merge_from_list(args.opts)

    model = build_detection_model(c)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), disable_pallas():
        small = ImageBatch(
            pixels=jnp.zeros((1, 64, 64, 12 if c.TPU.HOST_S2D else 3)),
            sizes=jnp.array([[64.0, 64.0]]))
        variables = model.init({"params": jax.random.PRNGKey(0)}, small,
                               small, train=False)

    if args.ckpt.endswith(".pth"):
        from oneshotdet_tpu.utils.torch_import import load_torch_checkpoint

        converted, matched, unmatched = load_torch_checkpoint(args.ckpt)
        print(f"torch import: {len(matched)} matched, "
              f"{len(unmatched)} unmatched", file=sys.stderr)
        variables = {"params": converted["params"],
                     "constants": converted["constants"]}
    elif args.ckpt:
        from oneshotdet_tpu.engine import TrainState
        from oneshotdet_tpu.solver import make_optimizer
        from oneshotdet_tpu.utils.checkpoint import Checkpointer
        from oneshotdet_tpu.utils.logger import setup_logger

        logger = setup_logger("oneshotdet_tpu")
        optimizer, _ = make_optimizer(c, variables["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            constants=variables.get("constants", {}),
            opt_state=optimizer.init(variables["params"]),
        )
        ckptr = Checkpointer(os.path.dirname(args.ckpt) or ".", logger, cfg=c)
        # prefer_tag=False: export exactly args.ckpt, even when its dir
        # carries a training last_checkpoint tag pointing elsewhere
        state = ckptr.load(state, f=args.ckpt, resume=False, prefer_tag=False)
        variables = {"params": state.params, "constants": state.constants}

    if args.kind in ("full", "both"):
        exp = oexport.export_eval(c, variables, batch=args.batch, kind="full")
        oexport.save(exp, args.out + ".eval")
        print(f"wrote {args.out}.eval (platforms={exp.platforms})")
    if args.kind in ("cached_support", "both"):
        pair = oexport.export_eval(c, variables, batch=args.batch,
                                   kind="cached_support")
        oexport.save(pair, args.out + ".serve.stablehlo")
        print(f"wrote {args.out}.serve.stablehlo.support / .detect")


if __name__ == "__main__":
    main()
