#!/usr/bin/env python
"""One-shot detection demo over a directory of images
(reference: demo/fcos_demo.py — which was broken for the Siamese forward;
this version is support-aware, SURVEY §3.4).

Usage:
    python demo/oneshot_demo.py --config-file configs/oneshot_fcos_r50.yaml \
        --support support_crop.jpg --images demo_images/ --out out/ \
        [--ckpt path] [--threshold 0.3]
"""

import argparse
import glob
import os
import sys

import numpy as np
from PIL import Image, ImageDraw

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="configs/oneshot_fcos_r50.yaml")
    p.add_argument("--support", required=True)
    p.add_argument("--images", required=True, help="image file or directory")
    p.add_argument("--out", default="demo_out")
    p.add_argument("--ckpt", default="")
    p.add_argument("--threshold", type=float, default=0.3)
    p.add_argument("--device", default="")
    p.add_argument("--spatial-devices", type=int, default=1,
                   help="shard each frame's H across N chips for "
                        "lower per-frame latency (params replicated)")
    args = p.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    from oneshotdet_tpu.utils.profiling import setup_compile_cache

    setup_compile_cache()

    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    from oneshotdet_tpu.predictor import OneShotPredictor
    from oneshotdet_tpu.structures import ImageBatch

    c = cfg.clone()
    if args.config_file:
        c.merge_from_file(args.config_file)

    import jax.numpy as jnp

    model = build_detection_model(c)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), disable_pallas():
        imgs = ImageBatch(pixels=jnp.zeros((1, 64, 64, 3)), sizes=jnp.array([[64.0, 64.0]]))
        variables = model.init({"params": jax.random.PRNGKey(0)}, imgs, imgs, train=False)
    if args.ckpt:
        from oneshotdet_tpu.utils.torch_import import load_torch_checkpoint

        if args.ckpt.endswith(".pth"):
            converted, _, _ = load_torch_checkpoint(args.ckpt)
            variables = converted
        else:
            from oneshotdet_tpu.engine import TrainState
            from oneshotdet_tpu.utils.checkpoint import Checkpointer

            import optax

            state = TrainState(
                step=jnp.zeros((), jnp.int32), params=variables["params"],
                constants=variables.get("constants", {}),
                opt_state=optax.sgd(0.1).init(variables["params"]),
            )
            state = Checkpointer(os.path.dirname(args.ckpt) or ".").load(
                state, f=args.ckpt, resume=False
            )
            variables = {"params": state.params, "constants": state.constants}
    variables = jax.device_put(variables, jax.devices()[0])

    predictor = OneShotPredictor(c, variables, confidence_threshold=args.threshold,
                                 spatial_devices=args.spatial_devices)
    supp = np.asarray(Image.open(args.support).convert("RGB"))
    predictor.set_support(supp)
    print("support features cached")

    paths = (
        sorted(glob.glob(os.path.join(args.images, "*")))
        if os.path.isdir(args.images)
        else [args.images]
    )
    os.makedirs(args.out, exist_ok=True)
    for path in paths:
        try:
            img = Image.open(path).convert("RGB")
        except OSError:
            continue
        boxes, scores = predictor.run_on_image(np.asarray(img))
        draw = ImageDraw.Draw(img)
        for box, score in zip(boxes, scores):
            draw.rectangle(list(map(float, box)), outline=(255, 40, 40), width=3)
            draw.text((box[0] + 2, box[1] + 2), f"{score:.2f}", fill=(255, 255, 0))
        out_path = os.path.join(args.out, os.path.basename(path))
        img.save(out_path)
        print(f"{path}: {len(boxes)} detections -> {out_path}")


if __name__ == "__main__":
    main()
