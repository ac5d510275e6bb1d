#!/usr/bin/env python
"""Stage-by-stage timing of the eval forward on the real chip.

Times, per batch: backbones, fusion+FCOS head, FCOS postprocess (top-k +
NMS), ROI pooling, ROI head net, final postprocess. Each stage is jitted
separately so the deltas are attributable (fusion across stages will make
the full model faster than the sum).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=10, warmup=2):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--query-hw", type=int, nargs=2, default=(832, 1216))
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.models.detector import _whole_image_rois
    from oneshotdet_tpu.models.fcos import compute_locations, fcos_postprocess
    from oneshotdet_tpu.ops.nms import nms_keep_mask
    from oneshotdet_tpu.ops.roi_align import fpn_level_map, multilevel_roi_align
    from oneshotdet_tpu.structures import ImageBatch

    c = cfg.clone()
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    c.MODEL.RETINANET.USE_C5 = False
    c.FEW_SHOT.SIAMESE_BACKBONE = True
    c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    c.FEW_SHOT.SUPP_ROIALIGN = True
    c.TPU.COMPUTE_DTYPE = args.dtype
    model = build_detection_model(c)
    dc = model.config

    b = args.batch
    qh, qw = args.query_hw
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(b, qh, qw, 3).astype(np.float32))
    supp_pixels = jnp.asarray(rng.randn(b, 416, 416, 3).astype(np.float32))
    sizes = jnp.tile(jnp.array([[800.0, 1200.0]]), (b, 1))
    supp_sizes = jnp.tile(jnp.array([[400.0, 400.0]]), (b, 1))

    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas

    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu), disable_pallas():
        imgs_s = ImageBatch(pixels=jnp.zeros((1, 64, 64, 3)), sizes=jnp.array([[64.0, 64.0]]))
        variables = model.init({"params": jax.random.PRNGKey(0)}, imgs_s, imgs_s, train=False)
    variables = jax.device_put(variables, jax.devices()[0])
    print(f"init {time.time() - t0:.0f}s", file=sys.stderr)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    # 1. query backbone
    backbone_apply = jax.jit(
        lambda v, x: model.apply(v, x.astype(dtype), method=lambda m, xx: m.backbone(xx))
    )
    t_backbone = timed(backbone_apply, variables, pixels)
    feats = backbone_apply(variables, pixels)

    # 2. support backbone
    supp_apply = jax.jit(
        lambda v, x: model.apply(v, x.astype(dtype), method=lambda m, xx: m._supp_features(
            ImageBatch(pixels=xx, sizes=supp_sizes)))
    )

    def supp_feats_fn(v, x):
        return model.apply(v, ImageBatch(pixels=x.astype(dtype), sizes=supp_sizes),
                           method=lambda m, sb: m._supp_features(sb))

    supp_feats_j = jax.jit(supp_feats_fn)
    t_supp = timed(supp_feats_j, variables, supp_pixels)
    feats_supp = supp_feats_j(variables, supp_pixels)

    # 3. fusion + FCOS head
    def head_fn(v, f, fs):
        def run(m, f, fs):
            combined = m._fuse(f, fs, supp_sizes, b)
            return m.fcos_head(combined)
        return model.apply(v, f, fs, method=run)

    head_j = jax.jit(head_fn)
    t_head = timed(head_j, variables, feats, feats_supp)
    logits, bbox_reg, ctrness = head_j(variables, feats, feats_supp)

    # 4. FCOS postprocess (top-k + decode + NMS)
    shapes = [(f.shape[1], f.shape[2]) for f in logits]
    locations = compute_locations(shapes, dc.fpn_strides)
    sizes_wh = sizes[:, ::-1]

    post_j = jax.jit(lambda lg, br, ct: fcos_postprocess(
        locations, lg, br, ct, sizes_wh, dc.pre_nms_top_n_test, dc.rpn_nms_thresh,
        dc.fpn_post_nms_top_n_test, dc.nms_pre_topk, 0.0, dc.score_mode))
    t_post = timed(post_j, logits, bbox_reg, ctrness)
    proposals = post_j(logits, bbox_reg, ctrness)

    # 4b. NMS alone at the pre-capped size
    boxes_nms = jnp.asarray(rng.uniform(0, 1000, (b, dc.nms_pre_topk, 4)).astype(np.float32))
    boxes_nms = boxes_nms.at[..., 2:].add(boxes_nms[..., :2])
    scores_nms = jnp.asarray(rng.uniform(size=(b, dc.nms_pre_topk)).astype(np.float32))
    nms_j = jax.jit(jax.vmap(lambda bx, sc: nms_keep_mask(bx, sc, jnp.ones(dc.nms_pre_topk, bool), 0.8)))
    t_nms = timed(nms_j, boxes_nms, scores_nms)

    # 5. ROI pooling of proposals
    def pool_fn(v, f, prop_xyxy):
        flat = prop_xyxy.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), prop_xyxy.shape[1])[:, None]
        rois = jnp.concatenate([batch_idx, flat], axis=1)
        levels = fpn_level_map(flat, 3, 7)
        return multilevel_roi_align(f, rois, levels, (7, 7), dc.pooler_scales, 2)

    pool_j = jax.jit(pool_fn)
    t_pool = timed(pool_j, variables, feats, proposals.xyxy)
    roi_feats = pool_j(variables, feats, proposals.xyxy)

    # 6. ROI head net
    supp77 = jnp.zeros((roi_feats.shape[0], 7, 7, 256), roi_feats.dtype)

    def roihead_fn(v, rf, sf):
        return model.apply(v, rf.astype(dtype), sf.astype(dtype),
                           method=lambda m, a, bb: m.roi_head(a, bb))

    roihead_j = jax.jit(roihead_fn)
    t_roihead = timed(roihead_j, variables, roi_feats, supp77)

    n_rois = roi_feats.shape[0]
    print(f"batch={b} query={qh}x{qw} dtype={args.dtype} rois={n_rois}")
    total = t_backbone + t_supp + t_head + t_post + t_pool + t_roihead
    for name, t in [
        ("query backbone", t_backbone),
        ("supp backbone", t_supp),
        ("fusion + fcos head", t_head),
        ("fcos postproc (incl NMS)", t_post),
        (f"  nms alone ({dc.nms_pre_topk})", t_nms),
        ("roi pooling", t_pool),
        ("roi head net", t_roihead),
        ("SUM", total),
    ]:
        print(f"{name:28s} {t:8.2f} ms/batch  {t / b:7.2f} ms/im")


if __name__ == "__main__":
    main()
