#!/usr/bin/env python
"""Train-step cost attribution by ablation of the FULL train program
(VERDICT r4 #7 — the eval side got a complete cost model in rounds 2-4;
this applies the identical methodology to training).

Protocol = bench.py --mode train: K train steps CHAINED inside one jitted
lax.scan over a stacked batch of never-seen synthetic episodes, synced by
value-forcing the final loss. Per-call timing is unusable on this tunnel
(block_until_ready returns early + content memoization — see
.claude/skills/verify/SKILL.md); stage-extracted timing lies (~20-25 ms
dispatch floor dwarfs small programs). Cost of a component = chain(full) -
chain(without it), both under the same protocol.

Ablations (run patch-based ones via --only, one per process — the patches
poison later ablations):

  full          the real train step (reference train recipe:
                configs/fcos/2019_10_25_vanilla_siamse_backbone.yaml)
  fwd_only      loss computed, no grad / no update: fwd cost; full -
                fwd_only = backward + optimizer + param update
  opt_sgd       plain SGD replaces the reference optimizer (momentum +
                bias-lr rules + warmup schedule): delta = optimizer cost
  rpn_only      MODEL.RPN_ONLY=True: no stage-2 training (ROIAlign
                fwd+VJP, ROI head fwd+bwd, sampling/matching all gone)
  no_pool       ROIAlign returns zeros (shapes kept): pooling fwd + VJP
                scatter AND the stage-2 gradient path into the backbone
  no_towers     MODEL.FCOS.NUM_CONVS=0: FCOS tower fwd+bwd
  half_towers   MODEL.FCOS.NUM_CONVS=2
  no_assign     fcos_targets -> constant targets: FCOS target assignment
                (center sampling + SOI buckets + min-area tie-break)
  no_roi_prep   prepare_roi_targets -> fixed sample: matcher + balanced
                sampling + box encode
  no_s1_post    fcos_postprocess -> static stand-in: in-train proposal
                generation (decode + topk + NMS, under stop_gradient)
  fp32          TPU.COMPUTE_DTYPE=float32
  skeleton      scan body only reads the batch and folds a scalar: chain
                floor (dispatch + input traffic), NOT model time
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def bench_train(c, b, qhw, shw, k=6, mode="full", seed_base=0):
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from oneshotdet_tpu.engine import create_train_state, make_train_step
    from oneshotdet_tpu.engine.trainer import batch_to_inputs
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    from oneshotdet_tpu.solver import make_optimizer
    from oneshotdet_tpu.utils.synthetic import make_episodic_batch

    if mode == "no_assign":
        from oneshotdet_tpu.models import detector as det_mod

        def fake_fcos_targets(locations, strides, gt_xyxy, gt_labels,
                              gt_valid, center_sample, pos_radius):
            n = sum(l.shape[0] for l in locations)
            bsz = gt_xyxy.shape[0]
            # constant positive-ish targets that still touch every input
            touch = (gt_xyxy.sum() + gt_labels.sum() + gt_valid.sum()) * 0
            labels = jnp.zeros((bsz, n), jnp.int32) + touch.astype(jnp.int32)
            reg = jnp.ones((bsz, n, 4), jnp.float32) * 8.0 + touch
            return labels, reg

        det_mod.fcos_targets = fake_fcos_targets

    if mode == "no_roi_prep":
        from oneshotdet_tpu.models import detector as det_mod

        def fake_prepare(rng, proposals, targets, box_coder, batch_per_img,
                         pos_frac, fg_iou, bg_iou, soft_labeling=False,
                         soft_labeling_func="exponential"):
            bsz, p = proposals.valid.shape
            k_s = min(batch_per_img, p)
            touch = (proposals.xyxy.sum() + targets.xyxy.sum()) * 0
            idx = jnp.broadcast_to(jnp.arange(k_s)[None], (bsz, k_s))
            s_valid = jnp.ones((bsz, k_s), bool)
            labels = jnp.zeros((bsz, k_s), jnp.int32)
            reg_t = jnp.ones((bsz, k_s, 4), jnp.float32) + touch
            gt_idx = jnp.zeros((bsz, k_s), jnp.int32)
            if soft_labeling:
                return idx, s_valid, labels, reg_t, gt_idx, \
                    jnp.ones((bsz, k_s), jnp.float32)
            return idx, s_valid, labels, reg_t, gt_idx

        det_mod.prepare_roi_targets = fake_prepare

    if mode == "no_s1_post":
        from oneshotdet_tpu.models import detector as det_mod
        from oneshotdet_tpu.structures.boxes import Boxes

        def fake_s1_post(locations, logits, bbox_reg, ctrness,
                         image_sizes_wh, pre_nms_top_n, nms_thresh,
                         post_top_n, nms_pre_topk=8192, pre_nms_thresh=0.0,
                         score_mode="BINARY", min_size=0.0, level_topk=True,
                         dense_points=1):
            bsz = logits[0].shape[0]
            s = sum(l.astype(jnp.float32).mean(axis=(1, 2, 3))
                    for l in logits + bbox_reg + ctrness)
            scores = jnp.broadcast_to(s[:, None] * 1e-6, (bsz, post_top_n))
            xyxy = (jnp.broadcast_to(
                jnp.array([0.0, 0.0, 64.0, 64.0], jnp.float32),
                (bsz, post_top_n, 4)) + scores[..., None] * 0.0)
            return Boxes(xyxy=xyxy, valid=jnp.ones((bsz, post_top_n), bool),
                         size=image_sizes_wh,
                         fields={"scores": scores, "objectness": scores})

        det_mod.fcos_postprocess = fake_s1_post

    if mode == "no_pool":
        from oneshotdet_tpu.models.detector import GeneralizedRCNN

        def fake_pool(self, features, boxes, use_pallas=False):
            bsz, p = boxes.valid.shape
            r = self.config.pooler_resolution
            touch = sum(f.astype(jnp.float32).mean() for f in features) * 0
            return jnp.zeros((bsz * p, r, r, features[0].shape[-1]),
                             features[0].dtype) + touch.astype(features[0].dtype)

        GeneralizedRCNN._pool_rois = fake_pool

    model = build_detection_model(c)
    qh, qw = qhw
    sh, sw = shw

    def stacked(off):
        # pixels generated + painted on device (bench._stacked_episodes):
        # the ~900 MB host pixel upload per ablation would dominate wall
        # time at degraded tunnel speeds
        return bench_mod._stacked_episodes(b, (qh, qw), (sh, sw), k,
                                           c.TPU.MAX_GT_BOXES,
                                           seed_base + off)

    def init_fn():
        small = make_episodic_batch(1, (64, 64), (64, 64), max_gt=4)
        images, supp, targets = batch_to_inputs(
            {kk: jnp.asarray(v) for kk, v in small.items()
             if kk not in ("img_ids", "idxs")})
        return model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                          targets, train=True, rng=jax.random.PRNGKey(1))

    # identical param tree across ablations: device init from PRNGKey(0)
    # is deterministic (threefry); optimizer built from the shape tree so
    # no host variables materialize (bench._train_state_on_device — avoids
    # the ~540 MB state upload per ablation process)
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    with jax.default_device(jax.devices("cpu")[0]), disable_pallas():
        shapes = jax.eval_shape(init_fn)

    if mode == "opt_sgd":
        import optax

        optimizer = optax.sgd(0.01)
    else:
        optimizer, _ = make_optimizer(c, shapes["params"])
    tag_bits = (f"{mode}_{c.TPU.COMPUTE_DTYPE}"
                f"_t{c.MODEL.FCOS.NUM_CONVS}r{int(c.MODEL.RPN_ONLY)}")
    state = bench_mod._train_state_on_device(
        model, optimizer, init_fn, f"abltrainstate_{tag_bits}")
    if state is None:
        class _A:  # minimal args shim for bench._init_cache_path
            dtype = c.TPU.COMPUTE_DTYPE
        variables = bench_mod._disk_cached_init(
            init_fn, bench_mod._init_cache_path("train", _A))
        state = create_train_state(model, optimizer, variables)
        state = jax.device_put(state, jax.devices()[0])
    rng = jax.random.PRNGKey(0)

    if mode == "fwd_only":
        def train_step(st, batch, r):
            images, supp, targets = batch_to_inputs(batch)
            step_rng = jax.random.fold_in(r, st.step)
            losses = model.apply(
                {"params": st.params, "constants": st.constants},
                images, supp, targets, train=True, rng=step_rng)
            return st.replace(step=st.step + 1), \
                {"loss_total": sum(losses.values())}
    elif mode == "skeleton":
        def train_step(st, batch, r):
            tot = sum(v.astype(jnp.float32).sum() for kk, v in batch.items()
                      if "pixels" in kk)
            return st.replace(step=st.step + 1), {"loss_total": tot}
    else:
        train_step = make_train_step(model, optimizer)

    def chain_fn(st, batches):
        def body(s2, batch):
            s2, m = train_step(s2, batch, rng)
            return s2, m["loss_total"]
        return jax.lax.scan(body, st, batches)

    s1 = stacked(0)
    # disk-cache the traced program per (ablation mode, dtype, shapes):
    # python tracing of the full train chain costs minutes on this 1-core
    # host, and each ablation is its own program. Patched modes embed their
    # patch in the tag so edits to a fake need a .bench_programs/abltrain_*
    # clear.
    chain = bench_mod._aot_jit(
        f"abltrain_{mode}_{c.TPU.COMPUTE_DTYPE}"
        f"_t{c.MODEL.FCOS.NUM_CONVS}r{int(c.MODEL.RPN_ONLY)}",
        chain_fn, state, s1)
    state, losses = chain(state, s1)
    _ = float(np.asarray(losses)[-1])

    # fresh pixel content for the timed chain (params differ per step on
    # the full path; pixels must be never-seen for fwd_only/skeleton)
    s2 = {kk: (v + jnp.float32(1e-3)
               if jnp.issubdtype(v.dtype, jnp.floating) and "pixels" in kk
               else v)
          for kk, v in s1.items()}
    jax.block_until_ready(s2)
    t0 = time.perf_counter()
    state, losses = chain(state, s2)
    _ = float(losses[-1])
    dt = time.perf_counter() - t0
    return dt / k * 1000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--k", type=int, default=6, help="steps per chain")
    p.add_argument("--only", nargs="*", default=None)
    p.add_argument("--seed-offset", type=int, default=0,
                   help="offset episode seeds: REQUIRED for repeat runs — "
                        "the tunnel memoizes (program, input-content) pairs "
                        "across processes and replays them in ~0.5 ms")
    p.add_argument("--query-hw", type=int, nargs=2, default=(832, 1216))
    p.add_argument("--supp-hw", type=int, nargs=2, default=(416, 416))
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for smoke runs; "
                        "env vars are too late once sitecustomize imports jax)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ONESHOT_COMPILE_CACHE",
                                     os.path.join(os.path.dirname(
                                         os.path.dirname(os.path.abspath(__file__))),
                                         ".jax_comp_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from oneshotdet_tpu.config import cfg

    def base_cfg():
        c = cfg.clone()
        c.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
        c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
        c.MODEL.RETINANET.USE_C5 = False
        c.MODEL.FCOS.CENTER_SAMPLE = True
        c.MODEL.FCOS.LOC_LOSS_TYPE = "giou"
        c.FEW_SHOT.SIAMESE_BACKBONE = True
        c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
        c.FEW_SHOT.SUPP_ROIALIGN = True
        c.TPU.COMPUTE_DTYPE = "bfloat16"
        c.TPU.HOST_S2D = True
        return c

    ablations = {"full": (base_cfg(), "full")}
    ablations["fwd_only"] = (base_cfg(), "fwd_only")
    ablations["opt_sgd"] = (base_cfg(), "opt_sgd")
    c = base_cfg(); c.MODEL.RPN_ONLY = True
    ablations["rpn_only"] = (c, "full")
    ablations["no_pool"] = (base_cfg(), "no_pool")
    c = base_cfg(); c.MODEL.FCOS.NUM_CONVS = 0
    ablations["no_towers"] = (c, "full")
    c = base_cfg(); c.MODEL.FCOS.NUM_CONVS = 2
    ablations["half_towers"] = (c, "full")
    ablations["no_assign"] = (base_cfg(), "no_assign")
    ablations["no_roi_prep"] = (base_cfg(), "no_roi_prep")
    ablations["no_s1_post"] = (base_cfg(), "no_s1_post")
    c = base_cfg(); c.TPU.COMPUTE_DTYPE = "float32"
    ablations["fp32"] = (c, "full")
    ablations["skeleton"] = (base_cfg(), "skeleton")

    names = args.only if args.only else list(ablations)
    results = {}
    for i, name in enumerate(names):
        c, mode = ablations[name]
        t0 = time.time()
        ms = bench_train(c, args.batch, tuple(args.query_hw),
                         tuple(args.supp_hw), k=args.k, mode=mode,
                         seed_base=5000 + 101 * i + args.seed_offset)
        results[name] = ms
        print(f"{name:14s} {ms:8.1f} ms/iter  "
              f"[{time.time() - t0:.0f}s]", flush=True)

    if "full" in results:
        full = results["full"]
        print("\ndeltas vs full:")
        for name, ms in results.items():
            if name != "full":
                print(f"  {name:14s} saves {full - ms:7.1f} ms/iter")


if __name__ == "__main__":
    main()
