#!/usr/bin/env python
"""Cost attribution by ablation of the FULL eval program.

Stage-level micro-timing is unreliable over the device tunnel (per-dispatch
latency ~20 ms dwarfs small programs, and host-content executions can be
memoized across processes). What IS reliable: the bench.py protocol — one
jitted full forward, fresh-content input per timed iteration, pipelined
dispatch, block at the end. So each ablation is a model variant benched with
that protocol; cost of a component = bench(full) - bench(without it).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def bench_model(c, b, qhw, shw, iters=10, warmup=2, mode="full", seed_base=0):
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.config import cfg  # noqa
    from oneshotdet_tpu.data.transforms import space_to_depth
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    from oneshotdet_tpu.structures import ImageBatch

    model = build_detection_model(c)
    qh, qw = qhw
    sh, sw = shw
    rng = np.random.RandomState(seed_base)
    n = 1  # only shape templates + the cached_support crop are host-built
    pix = [jnp.asarray(space_to_depth(rng.randn(b, qh, qw, 3).astype(np.float32)))
           for _ in range(n)]
    sup = [jnp.asarray(space_to_depth(rng.randn(b, sh, sw, 3).astype(np.float32)))
           for _ in range(n)]
    sizes = jnp.tile(jnp.array([[800.0, 1200.0]]), (b, 1))
    supp_sizes = jnp.tile(jnp.array([[400.0, 400.0]]), (b, 1))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), disable_pallas():
        small = ImageBatch(pixels=jnp.zeros((1, 64, 64, 3)),
                           sizes=jnp.array([[64.0, 64.0]]))
        variables = model.init({"params": jax.random.PRNGKey(0)}, small, small,
                               train=False)
    variables = jax.device_put(variables, jax.devices()[0])

    if mode == "prepool":
        # ONESHOT_PREPOOL_COMPRESS=1: compress_0 query half hoisted onto the
        # FPN maps pre-pooling (detector._eval_roi_pool); delta vs full =
        # net effect of trading the per-ROI 1x1 GEMM for 2C-channel pooling
        os.environ["ONESHOT_PREPOOL_COMPRESS"] = "1"

    if mode == "no_gn":
        # measure GroupNorm's total cost: patch GN to identity (NOT
        # semantics-preserving — ablation only; run via --only, the patch
        # poisons later ablations in the same process)
        from flax import linen as fnn

        fnn.GroupNorm.__call__ = lambda self, x: x

    if mode == "no_pool":
        # zero out ROI pooling (keeps every downstream shape): in-model
        # cost of the Pallas ROIAlign = full - this
        from oneshotdet_tpu.models.detector import GeneralizedRCNN

        orig = GeneralizedRCNN._pool_rois

        def fake_pool(self, features, boxes, use_pallas=False):
            b, p = boxes.valid.shape
            r = self.config.pooler_resolution
            return jnp.zeros((b * p, r, r, features[0].shape[-1]),
                             features[0].dtype)

        GeneralizedRCNN._pool_rois = fake_pool

    if mode == "no_fuse":
        # skip _fuse entirely (1x1 supp pooling + shot-average + channel
        # multiply over the full pyramid): delta vs full = fusion cost
        from oneshotdet_tpu.models.detector import GeneralizedRCNN

        GeneralizedRCNN._fuse = lambda self, f, fs, s, bb: f

    if mode == "no_supp7":
        # skip the whole-support 7x7 pooling feeding stage 2: delta vs
        # full = _supp_roi_7x7's multilevel roi_align cost
        from oneshotdet_tpu.models.detector import GeneralizedRCNN

        def fake_supp7(self, features_supp, supp_sizes_hw, batch_size):
            r = self.config.pooler_resolution
            ch = features_supp[0].shape[-1]
            shot = features_supp[0].shape[0] // batch_size
            return jnp.zeros((batch_size, shot, r, r, ch),
                             features_supp[0].dtype)

        GeneralizedRCNN._supp_roi_7x7 = fake_supp7

    if mode == "no_final_post":
        # replace stage-2 postprocess (decode + clip + NMS + top-k) with a
        # static truncate: delta vs full = final postproc cost
        from oneshotdet_tpu.models import detector as det_mod
        from oneshotdet_tpu.models.roi_head import truncate_boxes
        from oneshotdet_tpu.structures.boxes import Boxes

        def fake_post(logits, deltas, proposals, target_ids, box_coder,
                      score_thresh=0.0, nms_thresh=0.5,
                      detections_per_img=2000, cls_loss_type="ce_loss"):
            b, p = proposals.valid.shape
            scores = logits[:, :1].reshape(b, p) + deltas[:, :4].sum(-1).reshape(b, p) * 0
            k = min(detections_per_img, p)
            out = truncate_boxes(proposals, k)
            return Boxes(xyxy=out.xyxy, valid=out.valid, size=out.size,
                         fields={"scores": scores[:, :k],
                                 "labels": jnp.zeros((b, k), jnp.int32)})

        det_mod.roi_head_postprocess = fake_post

    if mode == "no_s1_post":
        # replace stage-1 postprocess (FCOS decode + per-level topk +
        # cross-level NMS) with a static stand-in that still consumes every
        # head output (so the towers can't be DCE'd): delta vs full =
        # stage-1 postproc/NMS cost inside the preset workload
        from oneshotdet_tpu.models import detector as det_mod
        from oneshotdet_tpu.structures.boxes import Boxes

        def fake_s1_post(locations, logits, bbox_reg, ctrness,
                         image_sizes_wh, pre_nms_top_n, nms_thresh,
                         post_top_n, nms_pre_topk=8192, pre_nms_thresh=0.0,
                         score_mode="BINARY", min_size=0.0, level_topk=True,
                         dense_points=1):
            b = logits[0].shape[0]
            s = sum(l.astype(jnp.float32).mean(axis=(1, 2, 3))
                    for l in logits + bbox_reg + ctrness)
            scores = jnp.broadcast_to(s[:, None] * 1e-6, (b, post_top_n))
            xyxy = (jnp.broadcast_to(
                jnp.array([0.0, 0.0, 64.0, 64.0], jnp.float32),
                (b, post_top_n, 4)) + scores[..., None] * 0.0)
            return Boxes(xyxy=xyxy,
                         valid=jnp.ones((b, post_top_n), bool),
                         size=image_sizes_wh,
                         fields={"scores": scores, "objectness": scores})

        det_mod.fcos_postprocess = fake_s1_post

    if mode.startswith("stage_blocks:"):
        # shrink one resnet stage to 1 block (e.g. "stage_blocks:1,4,6,3"):
        # delta vs full = the removed blocks' in-program cost, per stage.
        # Program-level localization of the backbone conv ceiling
        # (VERDICT r2 #7) — per-shape standalone timings lie on this tunnel.
        from oneshotdet_tpu.models import resnet as resnet_mod

        resnet_mod.STAGE_BLOCKS = dict(resnet_mod.STAGE_BLOCKS)
        resnet_mod.STAGE_BLOCKS[50] = tuple(
            int(v) for v in mode.split(":")[1].split(","))

    if mode == "double_backbone":
        # run both backbones twice (second pass on x+1 so CSE can't elide
        # it); delta vs full = one extra query+support backbone+FPN pass.
        # This defeats the tunnel's content-memoization, which makes the
        # standalone backbone program unmeasurable.
        from typing import Any

        from flax import linen as fnn

        from oneshotdet_tpu.models import registry as reg
        from oneshotdet_tpu.models.fpn import FPN
        from oneshotdet_tpu.models.resnet import ResNet

        class DoubleResNetFPN(fnn.Module):
            depth: int = 50
            out_channels: int = 256
            use_c5_for_p6: bool = False
            stride_in_1x1: bool = True
            dtype: Any = None
            quant: str = "none"

            @fnn.compact
            def __call__(self, x):
                body = ResNet(depth=self.depth,
                              stride_in_1x1=self.stride_in_1x1,
                              quant=self.quant,
                              dtype=self.dtype, name="body")
                fpn = FPN(out_channels=self.out_channels,
                          use_c5_for_p6=self.use_c5_for_p6,
                          dtype=self.dtype, name="fpn")
                y1 = fpn(body(x))
                y2 = fpn(body(x + 1.0))
                return [a + b for a, b in zip(y1, y2)]

        # the detector instantiates ResNetFPN directly (models/detector.py
        # setup), so patch the symbol it closed over, not the registry
        from oneshotdet_tpu.models import detector as det_mod

        det_mod.ResNetFPN = DoubleResNetFPN

    if mode == "backbone_only":
        def forward(v, q, s):
            feats = model.apply(v, q, method=lambda m, qq: m.backbone(
                qq.astype(m.dtype)))
            return [x.astype(jnp.float32).sum() for x in feats]
    elif mode == "cached_support":
        supp_b = ImageBatch(pixels=sup[0], sizes=supp_sizes)
        supp_feats = jax.jit(lambda v, s: model.apply(
            v, s, b, method=lambda m, ss, nn: m.compute_support_features(ss, nn))
        )(variables, supp_b)
        jax.block_until_ready(supp_feats)

        def forward(v, q, s):
            images = ImageBatch(pixels=q, sizes=sizes)
            dets = model.apply(
                v, images, supp_feats[0], supp_feats[1],
                jnp.ones((b,), jnp.int32),
                method=lambda m, im, p, s7, t: m.detect_with_support(im, p, s7, t))
            if hasattr(dets, "xyxy"):
                return dets.xyxy, dets.get_field("scores"), dets.valid
            return dets
    elif mode == "skeleton":
        # chain-protocol floor: the scan body only reads both input slices
        # (same HBM traffic pattern as the real body's first touch) and
        # folds a scalar. full - skeleton bounds the model's true on-chip
        # time; skeleton itself = scan + input-read + dispatch overhead.
        def forward(v, q, s):
            return q.astype(jnp.float32).sum() + s.astype(jnp.float32).sum()
    else:
        def forward(v, q, s):
            images = ImageBatch(pixels=q, sizes=sizes)
            supp = ImageBatch(pixels=s, sizes=supp_sizes)
            dets = model.apply(v, images, supp,
                               target_ids=jnp.ones((b,), jnp.int32), train=False)
            if hasattr(dets, "xyxy"):
                return dets.xyxy, dets.get_field("scores"), dets.valid
            return dets

    # sum_out is now the baseline shape of every ablation (the scan folds
    # outputs to a scalar on device); keep the name as an alias of full so
    # old invocations still run.

    # ---- chained-scan timing (round 4): all iters inside ONE lax.scan
    # dispatch, synced by value-forcing the folded scalar. Per-call
    # pipelined timing broke 2026-08-19 (block_until_ready returns early on
    # warm jax.export programs; per-call value-forcing serializes a
    # ~20-25 ms round-trip per dispatch). bench.py uses the identical
    # protocol, so deltas remain comparable with the headline numbers.
    import bench as bench_mod

    def fold(acc, out):
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + leaf.astype(jnp.float32).sum()
        return acc

    if mode == "devgen_inputs":
        # inputs generated on device inside the scan body: isolates
        # host->device upload cost from compute (delta vs full = upload)
        def chain(v, seeds):
            def body(acc, seed):
                key = jax.random.PRNGKey(seed)
                q = jax.random.normal(key, pix[0].shape, jnp.float32)
                s = jax.random.normal(jax.random.fold_in(key, 1),
                                      sup[0].shape, jnp.float32)
                return fold(acc, forward(v, q, s)), jnp.float32(0.0)
            return jax.lax.scan(body, jnp.float32(0.0), seeds)[0]

        chain_j = jax.jit(chain)
        _ = float(chain_j(variables, jnp.arange(iters)))
        t0 = time.perf_counter()
        _ = float(chain_j(variables, jnp.arange(iters) + 1000))
        return (time.perf_counter() - t0) / iters * 1000

    qstream = bench_mod._FreshBatches((b, qh, qw, 3))
    sstream = bench_mod._FreshBatches((b, sh, sw, 3))
    stacked_q = jnp.stack([qstream.device() for _ in range(iters)])
    stacked_s = jnp.stack([sstream.device() for _ in range(iters)])

    def chain(v, qs, ss):
        def body(acc, q_s):
            return fold(acc, forward(v, q_s[0], q_s[1])), jnp.float32(0.0)
        return jax.lax.scan(body, jnp.float32(0.0), (qs, ss))[0]

    chain_j = jax.jit(chain)
    _ = float(chain_j(variables, stacked_q, stacked_s))  # trace+compile+upload
    stacked_q2 = stacked_q + jnp.float32(0.777)
    stacked_s2 = stacked_s + jnp.float32(0.777)
    stacked_q2.block_until_ready()
    stacked_s2.block_until_ready()
    t0 = time.perf_counter()
    _ = float(chain_j(variables, stacked_q2, stacked_s2))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--only", nargs="*", default=None)
    p.add_argument("--roi-topk", type=int, default=0,
                   help="set TPU.EVAL_ROI_TOPK on EVERY ablation's base "
                        "config, so deltas attribute the preset workload")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from oneshotdet_tpu.config import cfg

    def base_cfg():
        c = cfg.clone()
        c.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
        c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
        c.MODEL.RETINANET.USE_C5 = False
        c.FEW_SHOT.SIAMESE_BACKBONE = True
        c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
        c.FEW_SHOT.SUPP_ROIALIGN = True
        c.TPU.COMPUTE_DTYPE = "bfloat16"
        c.TPU.HOST_S2D = True
        if args.roi_topk:
            c.TPU.EVAL_ROI_TOPK = args.roi_topk
        return c

    ablations = {}
    ablations["full"] = (base_cfg(), "full")

    c = base_cfg(); c.MODEL.RPN_ONLY = True
    ablations["rpn_only (no stage2)"] = (c, "full")

    c = base_cfg(); c.MODEL.FCOS.NUM_CONVS = 0
    ablations["no towers (NUM_CONVS=0)"] = (c, "full")

    c = base_cfg(); c.MODEL.FCOS.NUM_CONVS = 2
    ablations["half towers (NUM_CONVS=2)"] = (c, "full")

    ablations["cached support"] = (base_cfg(), "cached_support")
    ablations["backbone only (query)"] = (base_cfg(), "backbone_only")

    c = base_cfg(); c.TPU.COMPUTE_DTYPE = "float32"
    ablations["full fp32"] = (c, "full")
    ablations["no_gn"] = (base_cfg(), "no_gn")
    ablations["no_pool"] = (base_cfg(), "no_pool")
    ablations["double_backbone"] = (base_cfg(), "double_backbone")
    ablations["devgen_inputs"] = (base_cfg(), "devgen_inputs")
    # env-flag variant: run via --only (the flag poisons later ablations
    # in the same process, like no_gn)
    ablations["prepool compress"] = (base_cfg(), "prepool")

    c = base_cfg(); c.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 1000
    ablations["1000 proposals (vs 2000)"] = (c, "full")

    # misc attribution (VERDICT r2 #6) — each patches a class/module symbol,
    # so run via --only in separate processes like no_gn
    ablations["no_fuse"] = (base_cfg(), "no_fuse")
    ablations["no_supp7"] = (base_cfg(), "no_supp7")
    ablations["no_final_post"] = (base_cfg(), "no_final_post")
    ablations["no_s1_post"] = (base_cfg(), "no_s1_post")
    ablations["skeleton"] = (base_cfg(), "skeleton")
    # minimal stage-1 slice: backbones + FPN + fusion + predictor convs
    # with towers, stage-1 postproc and all of stage 2 removed. minimal -
    # skeleton - backbone(18.0) localizes preproc/fusion/predictor cost.
    c = base_cfg(); c.MODEL.RPN_ONLY = True; c.MODEL.FCOS.NUM_CONVS = 0
    ablations["minimal (bb+fpn+fuse+pred)"] = (c, "no_s1_post")
    ablations["sum_out"] = (base_cfg(), "sum_out")

    # per-stage backbone localization (VERDICT r2 #7): shrink one stage to
    # 1 block; delta vs full = the removed blocks' in-program cost. Run via
    # --only (patches the STAGE_BLOCKS table for the process).
    ablations["c2 1-block (of 3)"] = (base_cfg(), "stage_blocks:1,4,6,3")
    ablations["c3 1-block (of 4)"] = (base_cfg(), "stage_blocks:3,1,6,3")
    ablations["c4 1-block (of 6)"] = (base_cfg(), "stage_blocks:3,4,1,3")
    ablations["c5 1-block (of 3)"] = (base_cfg(), "stage_blocks:3,4,6,1")

    # round-3 workload levers, measured inside the full program
    c = base_cfg(); c.TPU.QUANT = "int8"
    ablations["int8 conv stack"] = (c, "full")
    c = base_cfg(); c.TPU.EVAL_ROI_TOPK = 512
    ablations["roi topk 512"] = (c, "full")
    c = base_cfg(); c.TPU.EVAL_ROI_TOPK = 1024
    ablations["roi topk 1024"] = (c, "full")
    c = base_cfg(); c.TPU.QUANT = "int8"; c.TPU.EVAL_ROI_TOPK = 512
    ablations["int8 + topk 512"] = (c, "full")

    names = args.only if args.only else list(ablations)
    results = {}
    b = args.batch
    for i, name in enumerate(names):
        c, mode = ablations[name]
        t0 = time.time()
        ms = bench_model(c, b, (832, 1216), (416, 416), iters=args.iters,
                         mode=mode, seed_base=1000 + i)
        results[name] = ms
        print(f"{name:28s} {ms:8.2f} ms/batch  {ms / b:6.2f} ms/im   "
              f"[{time.time() - t0:.0f}s]", flush=True)

    if "full" in results:
        full = results["full"]
        print("\ndeltas vs full:")
        for name, ms in results.items():
            if name != "full":
                print(f"  {name:28s} saves {full - ms:7.2f} ms/batch "
                      f"({(full - ms) / b:5.2f} ms/im)")


if __name__ == "__main__":
    main()
