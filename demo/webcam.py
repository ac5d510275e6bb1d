#!/usr/bin/env python
"""Webcam / video one-shot detection loop (reference: demo/webcam.py).

Support features are computed once (cached on device) and each frame is one
jitted device round-trip — the streaming design the reference implied but
never implemented for its Siamese model.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="configs/oneshot_fcos_r50.yaml")
    p.add_argument("--support", required=True)
    p.add_argument("--source", default="0", help="camera index or video path")
    p.add_argument("--threshold", type=float, default=0.3)
    p.add_argument("--ckpt", default="")
    p.add_argument("--spatial-devices", type=int, default=1,
                   help="shard each frame's H across N chips for "
                        "lower per-frame latency (params replicated)")
    args = p.parse_args()

    try:
        import cv2
    except ImportError:
        raise SystemExit("webcam demo requires opencv-python")

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from oneshotdet_tpu.utils.profiling import setup_compile_cache

    setup_compile_cache()
    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    from oneshotdet_tpu.predictor import OneShotPredictor
    from oneshotdet_tpu.structures import ImageBatch

    c = cfg.clone()
    c.merge_from_file(args.config_file)
    model = build_detection_model(c)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), disable_pallas():
        imgs = ImageBatch(pixels=jnp.zeros((1, 64, 64, 3)), sizes=jnp.array([[64.0, 64.0]]))
        variables = model.init({"params": jax.random.PRNGKey(0)}, imgs, imgs, train=False)
    variables = jax.device_put(variables, jax.devices()[0])

    predictor = OneShotPredictor(c, variables, confidence_threshold=args.threshold,
                                 spatial_devices=args.spatial_devices)
    predictor.set_support(np.asarray(Image.open(args.support).convert("RGB")))

    cam = cv2.VideoCapture(int(args.source) if args.source.isdigit() else args.source)
    while True:
        ok, frame_bgr = cam.read()
        if not ok:
            break
        t0 = time.perf_counter()
        boxes, scores = predictor.run_on_image(frame_bgr[:, :, ::-1])
        dt = (time.perf_counter() - t0) * 1000
        for box, score in zip(boxes, scores):
            x1, y1, x2, y2 = map(int, box)
            cv2.rectangle(frame_bgr, (x1, y1), (x2, y2), (0, 0, 255), 2)
            cv2.putText(frame_bgr, f"{score:.2f}", (x1, y1 - 4),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 255), 1)
        cv2.putText(frame_bgr, f"{dt:.0f} ms", (8, 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2)
        cv2.imshow("oneshotdet_tpu", frame_bgr)
        if cv2.waitKey(1) & 0xFF == ord("q"):
            break
    cam.release()
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
