"""Opt-in eval-lever drift report at production capacities.

Runs the flagship Siamese FCOS R-50-FPN eval forward twice with IDENTICAL
weights and inputs — once at the config compute dtype with the full
workload, once with the requested variant levers (TPU.QUANT via
--variant-quant, TPU.EVAL_ROI_TOPK via --roi-topk; both together = the
fast-eval preset) — at production capacities (PRE_NMS 6000 / POST 2000 /
2000 detections, 832x1216 query) and quantifies detection-set drift:

  - per-image valid-detection count delta
  - greedy IoU-matching rate at 0.5/0.75/0.9 between the two sets
  - matched-pair score MAE and box coordinate MAE (pixels)

This is the int8 analog of the TPU.STRICT_LEVEL_TOPK precedent: an opt-in
speed lever ships with a measured accuracy-drift bound (VERDICT r2 #3).
Run on the real chip: python tools/quant_drift.py  (add --platform cpu
--query-hw 128 192 ... for a smoke run).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def iou_matrix(a, b):
    """(N,4) x (M,4) xyxy IoU (TO_REMOVE=1 convention, matching the repo)."""
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1 + 1, 0, None) * np.clip(y2 - y1 + 1, 0, None)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def greedy_match(boxes_a, boxes_b, thresh):
    """Score-order greedy one-to-one matching; returns matched index pairs."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return []
    iou = iou_matrix(boxes_a, boxes_b)
    pairs = []
    used_b = set()
    for i in range(len(boxes_a)):
        j = int(np.argmax(np.where(
            [jj not in used_b for jj in range(len(boxes_b))], iou[i], -1.0)))
        if iou[i, j] >= thresh and j not in used_b:
            pairs.append((i, j))
            used_b.add(j)
    return pairs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--query-hw", type=int, nargs=2, default=(832, 1216))
    p.add_argument("--supp-hw", type=int, nargs=2, default=(416, 416))
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--platform", default=None)
    p.add_argument("--pre-nms", type=int, default=6000)
    p.add_argument("--post-nms", type=int, default=2000)
    p.add_argument("--dets", type=int, default=2000)
    p.add_argument("--variant-quant", default="int8",
                   choices=["none", "int8", "int8_weight"],
                   help="TPU.QUANT for the variant side (int8_weight uses "
                        "the fake-quant path: same float param tree, "
                        "numerics identical to the int8-stored tree)")
    p.add_argument("--roi-topk", type=int, default=0,
                   help="TPU.EVAL_ROI_TOPK for the variant side; with "
                        "--variant-quant int8 this measures the full "
                        "fast-eval preset (configs/oneshot_fcos_r50_"
                        "fast_eval.yaml) against the bf16 full workload")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")

    import jax.numpy as jnp

    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.data.transforms import space_to_depth
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    from oneshotdet_tpu.structures import ImageBatch

    def make_cfg(quant, roi_topk=0):
        c = cfg.clone()
        c.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
        c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
        c.MODEL.RETINANET.USE_C5 = False
        c.MODEL.FCOS.CENTER_SAMPLE = True
        c.MODEL.FCOS.LOC_LOSS_TYPE = "giou"
        c.MODEL.FCOS.PRE_NMS_TOP_N = args.pre_nms
        c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = args.post_nms
        c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = args.dets
        c.FEW_SHOT.SIAMESE_BACKBONE = True
        c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
        c.FEW_SHOT.SUPP_ROIALIGN = True
        c.TPU.COMPUTE_DTYPE = args.dtype
        c.TPU.HOST_S2D = True
        c.TPU.QUANT = quant
        c.TPU.EVAL_ROI_TOPK = roi_topk
        return c

    b = args.batch
    qh, qw = args.query_hw
    sh, sw = args.supp_hw
    rng = np.random.RandomState(20260818)
    pixels = jnp.asarray(
        space_to_depth(rng.randn(b, qh, qw, 3).astype(np.float32)))
    supp_pixels = jnp.asarray(
        space_to_depth(rng.randn(b, sh, sw, 3).astype(np.float32)))
    images_sizes = jnp.tile(jnp.array([[qh * 25 / 26.0, qw * 75 / 76.0]]),
                            (b, 1))
    supp_sizes = jnp.tile(jnp.array([[sh - 16.0, sw - 16.0]]), (b, 1))

    model_f = build_detection_model(make_cfg("none"))
    model_q = build_detection_model(make_cfg(args.variant_quant,
                                             args.roi_topk))
    levers = ([] if args.variant_quant == "none" else [args.variant_quant])
    if args.roi_topk:
        levers.append(f"topk{args.roi_topk}")
    variant = "+".join(levers) if levers else "none"

    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu), disable_pallas():
        small = ImageBatch(pixels=jnp.zeros((1, 64, 64, 3)),
                           sizes=jnp.array([[64.0, 64.0]]))
        variables = model_f.init({"params": jax.random.PRNGKey(0)}, small,
                                 small, train=False)
    variables = jax.device_put(variables, jax.devices()[0])
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    def run(model):
        @jax.jit
        def forward(v, q, s):
            dets = model.apply(
                v, ImageBatch(pixels=q, sizes=images_sizes),
                ImageBatch(pixels=s, sizes=supp_sizes),
                target_ids=jnp.ones((b,), jnp.int32), train=False)
            return dets.xyxy, dets.get_field("scores"), dets.valid

        t0 = time.time()
        out = jax.block_until_ready(forward(variables, pixels, supp_pixels))
        print(f"forward done in {time.time() - t0:.1f}s", file=sys.stderr,
              flush=True)
        return [np.asarray(o) for o in out]

    bx_f, sc_f, va_f = run(model_f)
    bx_q, sc_q, va_q = run(model_q)

    report = {"metric": f"drift_{variant}_vs_bf16", "images": b,
              "capacities": [args.pre_nms, args.post_nms, args.dets]}
    count_deltas, score_maes, box_maes = [], [], []
    match_rates = {0.5: [], 0.75: [], 0.9: []}
    for i in range(b):
        f_idx = np.where(va_f[i])[0]
        q_idx = np.where(va_q[i])[0]
        count_deltas.append(int(len(q_idx)) - int(len(f_idx)))
        a, bq = bx_f[i][f_idx], bx_q[i][q_idx]
        for th in match_rates:
            pairs = greedy_match(a, bq, th)
            denom = max(len(f_idx), len(q_idx), 1)
            match_rates[th].append(len(pairs) / denom)
            if th == 0.5 and pairs:
                ia = [p[0] for p in pairs]
                ib = [p[1] for p in pairs]
                score_maes.append(float(np.abs(
                    sc_f[i][f_idx][ia] - sc_q[i][q_idx][ib]).mean()))
                box_maes.append(float(np.abs(a[ia] - bq[ib]).mean()))
    report.update({
        "mean_valid_float": float(np.mean([va_f[i].sum() for i in range(b)])),
        "mean_valid_variant": float(np.mean([va_q[i].sum() for i in range(b)])),
        "count_delta_mean": float(np.mean(count_deltas)),
        "match_rate@0.5": round(float(np.mean(match_rates[0.5])), 4),
        "match_rate@0.75": round(float(np.mean(match_rates[0.75])), 4),
        "match_rate@0.9": round(float(np.mean(match_rates[0.9])), 4),
        "matched_score_mae": round(float(np.mean(score_maes)), 5)
        if score_maes else None,
        "matched_box_mae_px": round(float(np.mean(box_maes)), 3)
        if box_maes else None,
    })
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
