"""Benchmark harness: one-shot eval throughput on the flagship model.

Measures steady-state images/sec of the full Siamese FCOS R-50-FPN eval
forward (backbone x2 -> fusion -> FCOS postproc -> ROI head -> NMS) at the
production input sizing (min 800 / max 1200, padded bucket 832x1216; support
bucket 416x416) in bfloat16 on the available accelerator.

Output protocol (driver parses the LAST JSON line on stdout):
  - The PRIMARY eval record is printed (flushed) as soon as it is measured.
  - Secondary modes (train / latency / eval_cached) then run as
    subprocesses under a wall-clock budget; each metric streams through as
    its own flushed JSON line the moment it exists.
  - The primary record is RE-printed as the final line (merged with any
    secondary values), so the last JSON line is always the headline metric:
      {"metric": "oneshot_eval_images_per_sec_per_chip", "value": N,
       "unit": "images/sec", "vs_baseline": N, ...extras}

vs_baseline is measured against the BASELINE.md north-star of 5,000 img/s on
a v5e-8 (= 625 images/sec/chip): vs_baseline = value / 625.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


BASELINE_IMG_PER_SEC_PER_CHIP = 625.0  # 5000 img/s on v5e-8 (BASELINE.md)
V5E_BF16_PEAK_TFLOPS = 197.0  # v5e peak bf16 TF/s (see BASELINE.md roofline)
_START = time.time()
# stop LAUNCHING secondary benches once this much wall-clock has elapsed;
# whatever remains of the budget bounds each subprocess (VERDICT r2 #1)
SECONDARY_BUDGET_S = float(os.environ.get("ONESHOT_BENCH_BUDGET_S", "420"))


def emit(rec):
    """Print one JSON metric line, flushed immediately."""
    print(json.dumps(rec), flush=True)
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--query-hw", type=int, nargs=2, default=(832, 1216))
    p.add_argument("--supp-hw", type=int, nargs=2, default=(416, 416))
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--mode", default="all",
                   choices=["all", "eval", "train", "latency", "eval_cached"])
    p.add_argument("--roi-topk", type=int, default=0,
                   help="TPU.EVAL_ROI_TOPK: keep only top-K stage-1 "
                        "proposals for stage 2 (opt-in workload cut)")
    p.add_argument("--quant", default="none", choices=["none", "int8"],
                   help="TPU.QUANT: int8 conv stack (backbone/FPN/towers); "
                        "v5e int8 MXU is ~2x bf16 peak")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for smoke runs; "
                        "env vars are too late once sitecustomize imports jax)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # persistent compilation cache: first-ever compile over the device
    # tunnel is minutes; subsequent bench runs hit the disk cache
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.structures import ImageBatch

    c = cfg.clone()
    c.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256  # FPN width (yaml override)
    c.MODEL.RETINANET.USE_C5 = False
    c.MODEL.FCOS.CENTER_SAMPLE = True
    c.MODEL.FCOS.LOC_LOSS_TYPE = "giou"
    c.FEW_SHOT.SIAMESE_BACKBONE = True
    c.FEW_SHOT.SECOND_STAGE_METHOD = "concat"
    c.FEW_SHOT.SUPP_ROIALIGN = True
    c.TPU.COMPUTE_DTYPE = args.dtype
    c.TPU.HOST_S2D = True
    c.TPU.EVAL_ROI_TOPK = args.roi_topk
    c.TPU.QUANT = args.quant

    qh, qw = args.query_hw
    sh, sw = args.supp_hw
    b = args.batch

    if args.mode == "train":
        run_train_bench(c, args)
        return
    if args.mode == "latency":
        run_latency_bench(c, args)
        return
    if args.mode == "eval_cached":
        run_eval_cached_bench(c, args)
        return

    model = build_detection_model(c)
    # session-unique seed: identical input CONTENT replays from the device
    # runtime's cross-process memoization even in a fresh process — a
    # re-benched unchanged program with fixed seeds measures cache hits
    rng = np.random.RandomState(int(time.time()) % (2**31))
    # one distinct input batch PER ITERATION — including warmup: the device
    # runtime memoizes (program, input-buffer) pairs persistently, so a
    # buffer seen during warmup replays for free if timed later. Timing must
    # only touch never-before-seen buffers. (Streaming-throughput protocol
    # validated against a per-iteration host-materialization run: marginal
    # cost per extra batch matches.)
    n_variants = args.iters + args.warmup + 1
    from oneshotdet_tpu.data.transforms import space_to_depth

    # production input pipeline delivers 2x2-blocked pixels (TPU.HOST_S2D)
    pixel_variants = [
        jnp.asarray(space_to_depth(rng.randn(b, qh, qw, 3).astype(np.float32)))
        for _ in range(n_variants)
    ]
    supp_variants = [
        jnp.asarray(space_to_depth(rng.randn(b, sh, sw, 3).astype(np.float32)))
        for _ in range(n_variants)
    ]
    images = ImageBatch(
        pixels=pixel_variants[0],
        sizes=jnp.tile(jnp.array([[800.0, 1200.0]]), (b, 1)),
    )
    supp = ImageBatch(
        pixels=supp_variants[0],
        sizes=jnp.tile(jnp.array([[400.0, 400.0]]), (b, 1)),
    )

    # Initialize on CPU (eager init over the TPU tunnel dispatches thousands
    # of tiny ops — minutes of round-trips), then transfer params once.
    t0 = time.time()
    cpu = jax.devices("cpu")[0]
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    with jax.default_device(cpu), disable_pallas():
        small_images = ImageBatch(
            pixels=jnp.zeros((1, 64, 64, 3)), sizes=jnp.array([[64.0, 64.0]])
        )
        small_supp = ImageBatch(
            pixels=jnp.zeros((1, 64, 64, 3)), sizes=jnp.array([[64.0, 64.0]])
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, small_images, small_supp, train=False
        )
    variables = jax.device_put(variables, jax.devices()[0])
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)

    @jax.jit
    def forward(variables, pixels, supp_pixels):
        imgs = ImageBatch(pixels=pixels, sizes=images.sizes)
        sup = ImageBatch(pixels=supp_pixels, sizes=supp.sizes)
        dets = model.apply(variables, imgs, sup,
                           target_ids=jnp.ones((b,), jnp.int32), train=False)
        return dets.xyxy, dets.get_field("scores"), dets.valid

    t0 = time.time()
    lowered = forward.lower(variables, images.pixels, supp.pixels)
    compiled = lowered.compile()
    print(f"compile: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    flops_per_batch = _program_flops(compiled)
    t0 = time.time()
    out = compiled(variables, images.pixels, supp.pixels)
    jax.block_until_ready(out)
    print(f"first run: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    # first run used variant 0; warmup uses variants 1..warmup;
    # the timed loop only ever sees variants warmup+1 .. warmup+iters
    for i in range(args.warmup):
        out = compiled(variables, pixel_variants[1 + i], supp_variants[1 + i])
    jax.block_until_ready(out)

    base = args.warmup + 1
    t0 = time.perf_counter()
    for i in range(args.iters):
        out = compiled(variables, pixel_variants[base + i],
                       supp_variants[base + i])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    img_per_sec = b * args.iters / dt
    ms_per_img = 1000.0 * dt / (b * args.iters)
    print(f"{ms_per_img:.2f} ms/image, batch {b}", file=sys.stderr, flush=True)
    variant = "" if args.quant == "none" else f"_{args.quant}"
    if args.roi_topk:
        variant += f"_topk{args.roi_topk}"
    rec = {
        "metric": f"oneshot_eval{variant}_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
    }
    if flops_per_batch:
        tf_per_sec = flops_per_batch * args.iters / dt / 1e12
        rec["tflops_per_image"] = round(flops_per_batch / b / 1e12, 4)
        rec["sustained_tflops_per_sec"] = round(tf_per_sec, 2)
        rec["mfu_vs_v5e_bf16_peak"] = round(tf_per_sec / V5E_BF16_PEAK_TFLOPS, 4)
        print(f"MFU: {tf_per_sec:.1f} TF/s sustained = "
              f"{100 * tf_per_sec / V5E_BF16_PEAK_TFLOPS:.1f}% of v5e bf16 peak "
              f"({flops_per_batch / b / 1e9:.1f} GFLOP/image)",
              file=sys.stderr, flush=True)
    # PRIMARY record lands NOW — a later timeout cannot erase it
    emit(rec)

    if args.mode == "all":
        extra = _run_secondaries(args)
        rec.update(extra)
        # re-print primary (merged) as the FINAL line: the driver parses the
        # last JSON line, which must be the headline eval metric either way
        emit(rec)


def _program_flops(compiled):
    """Total FLOPs of one compiled batch forward, from XLA's cost model.
    Returns 0 if the backend doesn't expose cost analysis."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001
        print(f"cost_analysis unavailable: {e}", file=sys.stderr, flush=True)
        return 0.0


def _run_secondaries(args):
    """Run train/latency/eval_cached benches as subprocesses, streaming each
    JSON metric line through (flushed) as it appears. Launch is gated on a
    wall-clock budget so a slow secondary can't push the run past the driver
    timeout (VERDICT r2 #1); the primary record has already been printed.
    """
    import subprocess

    extra = {}
    secondaries = (
        # stage-2 proposal compaction alone — measured round 3 as the best
        # single lever (int8 alone was SLOWER than bf16: dynamic activation
        # quant adds 3 extra HBM passes per conv; see BENCH_LOCAL_r03.log)
        ("eval", ["--roi-topk", "512"]),
        # best-case production protocol: topk + cached supports (fast-eval
        # preset without int8)
        ("eval_cached", ["--roi-topk", "512"]),
        ("eval_cached", []),
        # int8 variants kept for the record (drift bounds:
        # tools/quant_drift.py, tests/test_roi_compaction.py)
        ("eval", ["--quant", "int8", "--roi-topk", "512"]),
        ("eval_cached", ["--quant", "int8", "--roi-topk", "512"]),
        ("latency", []),
        ("train", []),
    )
    # Minimum remaining budget to LAUNCH a secondary. Killing a child
    # mid-compile leaves an orphan server-side compile that stalls the next
    # chip job (CLAUDE.md tunnel hazard), so don't launch unless there is
    # room for a steady-state run; a cold compile still exceeds any budget —
    # pre-warm the compile cache (tools/ or a prior full run) before relying
    # on secondaries under the default 420 s budget.
    min_launch_s = float(os.environ.get("ONESHOT_BENCH_MIN_LAUNCH_S", "120"))
    for mode, extra_cli in secondaries:
        elapsed = time.time() - _START
        remaining = SECONDARY_BUDGET_S - elapsed
        if remaining < min_launch_s:
            print(f"skipping secondary '{mode}': only {remaining:.0f}s of "
                  f"the {SECONDARY_BUDGET_S:.0f}s budget remain "
                  f"(< {min_launch_s:.0f}s launch floor)", file=sys.stderr,
                  flush=True)
            continue
        try:
            proc = subprocess.Popen(
                [sys.executable, __file__, "--mode", mode] + extra_cli +
                ["--batch", str(args.batch),
                 "--iters", str(args.iters), "--warmup", str(args.warmup),
                 "--query-hw", str(args.query_hw[0]), str(args.query_hw[1]),
                 "--supp-hw", str(args.supp_hw[0]), str(args.supp_hw[1]),
                 "--dtype", args.dtype]
                + (["--platform", args.platform] if args.platform else []),
                stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
            )
            try:
                out, _ = proc.communicate(timeout=remaining)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.communicate()
                # a killed client does NOT cancel its server-side compile;
                # anything launched next would stall behind the orphan
                # (CLAUDE.md tunnel hazard) — stop here
                print(f"secondary bench {mode} timed out after "
                      f"{remaining:.0f}s; skipping remaining secondaries",
                      file=sys.stderr, flush=True)
                break
            for line in out.splitlines():
                if line.startswith("{"):
                    r = json.loads(line)
                    emit(r)  # stream it through, flushed
                    extra[r["metric"].removeprefix("oneshot_")] = r["value"]
        except Exception as e:  # noqa: BLE001
            print(f"secondary bench {mode} failed: {e}", file=sys.stderr,
                  flush=True)
    return extra


def run_eval_cached_bench(c, args):
    """Batch eval throughput with CACHED support features — the production
    seq_test protocol (engine/inference.py split steps): one support crop
    serves every query of its class, so the support backbone + pooling run
    once per class, not once per batch. This is the deployment-realistic
    throughput; the headline eval metric recomputes supports per batch to
    match the reference's eval loop (engine/inference.py:50-66)."""
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.data.transforms import space_to_depth
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    from oneshotdet_tpu.structures import ImageBatch

    b = args.batch
    qh, qw = args.query_hw
    sh, sw = args.supp_hw
    model = build_detection_model(c)
    rng = np.random.RandomState(int(time.time()) % (2**31))  # see eval seed note
    n = args.iters + args.warmup + 1
    pix = [jnp.asarray(space_to_depth(rng.randn(b, qh, qw, 3).astype(np.float32)))
           for _ in range(n)]
    supp_pix = jnp.asarray(space_to_depth(rng.randn(1, sh, sw, 3).astype(np.float32)))
    sizes = jnp.tile(jnp.array([[800.0, 1200.0]]), (b, 1))
    supp_sizes = jnp.array([[400.0, 400.0]])

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), disable_pallas():
        small = ImageBatch(pixels=jnp.zeros((1, 64, 64, 3)),
                           sizes=jnp.array([[64.0, 64.0]]))
        variables = model.init({"params": jax.random.PRNGKey(0)}, small, small,
                               train=False)
    variables = jax.device_put(variables, jax.devices()[0])

    # support branch once, then tiled to the query batch
    pooled, s7 = jax.jit(lambda v: model.apply(
        v, ImageBatch(pixels=supp_pix, sizes=supp_sizes), 1,
        method=lambda m, s, nn_: m.compute_support_features(s, nn_))
    )(variables)
    pooled = [jnp.tile(p, (b, 1, 1, 1)) for p in pooled]
    s7 = jnp.tile(s7, (b, 1, 1, 1, 1))
    jax.block_until_ready(s7)

    @jax.jit
    def forward(v, q):
        images = ImageBatch(pixels=q, sizes=sizes)
        dets = model.apply(
            v, images, pooled, s7, jnp.ones((b,), jnp.int32),
            method=lambda m, im, p, s, t: m.detect_with_support(im, p, s, t))
        return dets.xyxy, dets.get_field("scores"), dets.valid

    out = forward(variables, pix[0])
    jax.block_until_ready(out)
    for i in range(args.warmup):
        out = forward(variables, pix[1 + i])
    jax.block_until_ready(out)
    base = args.warmup + 1
    t0 = time.perf_counter()
    for i in range(args.iters):
        out = forward(variables, pix[base + i])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    img_per_sec = b * args.iters / dt
    print(f"{1000 * dt / (b * args.iters):.2f} ms/image (cached support), "
          f"batch {b}", file=sys.stderr)
    variant = "" if args.quant == "none" else f"_{args.quant}"
    if args.roi_topk:
        variant += f"_topk{args.roi_topk}"
    emit({
        "metric": f"oneshot_eval_cached{variant}_support_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
    })


def run_latency_bench(c, args):
    """p50 single-image latency, streaming-predictor protocol: support
    features cached (computed once per class), one query per call, blocking
    per call — the BASELINE.md "p50 per-image latency" tracked metric."""
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.data.transforms import space_to_depth
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    from oneshotdet_tpu.structures import ImageBatch

    qh, qw = args.query_hw
    sh, sw = args.supp_hw
    model = build_detection_model(c)
    rng = np.random.RandomState(int(time.time()) % (2**31))  # see eval seed note
    n = args.iters + args.warmup + 1
    pix = [jnp.asarray(space_to_depth(rng.randn(1, qh, qw, 3).astype(np.float32)))
           for _ in range(n)]
    supp_pix = jnp.asarray(space_to_depth(rng.randn(1, sh, sw, 3).astype(np.float32)))
    sizes = jnp.array([[800.0, 1200.0]])
    supp_sizes = jnp.array([[400.0, 400.0]])

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), disable_pallas():
        small = ImageBatch(pixels=jnp.zeros((1, 64, 64, 3)),
                           sizes=jnp.array([[64.0, 64.0]]))
        variables = model.init({"params": jax.random.PRNGKey(0)}, small, small,
                               train=False)
    variables = jax.device_put(variables, jax.devices()[0])

    supp_feats = jax.jit(lambda v: model.apply(
        v, ImageBatch(pixels=supp_pix, sizes=supp_sizes), 1,
        method=lambda m, s, nn_: m.compute_support_features(s, nn_))
    )(variables)
    jax.block_until_ready(supp_feats)

    @jax.jit
    def predict(v, q):
        images = ImageBatch(pixels=q, sizes=sizes)
        dets = model.apply(
            v, images, supp_feats[0], supp_feats[1], jnp.ones((1,), jnp.int32),
            method=lambda m, im, p, s7, t: m.detect_with_support(im, p, s7, t))
        return dets.xyxy, dets.get_field("scores"), dets.valid

    out = predict(variables, pix[0])
    jax.block_until_ready(out)
    for i in range(args.warmup):
        out = predict(variables, pix[1 + i])
    jax.block_until_ready(out)
    lat = []
    base = args.warmup + 1
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = predict(variables, pix[base + i])
        jax.block_until_ready(out)
        lat.append((time.perf_counter() - t0) * 1000)
    lat.sort()
    p50 = lat[len(lat) // 2]
    print(f"p50 {p50:.2f} ms, min {lat[0]:.2f}, max {lat[-1]:.2f}",
          file=sys.stderr)

    # DEVICE-TIME per-image latency (VERDICT r1 Weak #6): the per-call p50
    # above includes ~20 ms of device-tunnel round-trip that a co-located
    # deployment never pays. Chain K single-image predicts inside one jitted
    # lax.scan over stacked never-seen queries — one dispatch, K device
    # iterations — so the per-image quotient is tunnel-free.
    K = args.iters
    rng2 = np.random.RandomState((int(time.time()) + 777) % (2**31))
    stacked = jnp.asarray(np.stack([
        space_to_depth(rng2.randn(1, qh, qw, 3).astype(np.float32))
        for _ in range(K)]))

    @jax.jit
    def chain(v, qs):
        def body(acc, q):
            o = predict_raw(v, q)
            return acc + o[1].astype(jnp.float32).sum(), 0.0
        return jax.lax.scan(body, 0.0, qs)[0]

    def predict_raw(v, q):
        images = ImageBatch(pixels=q, sizes=sizes)
        dets = model.apply(
            v, images, supp_feats[0], supp_feats[1], jnp.ones((1,), jnp.int32),
            method=lambda m, im, p, s7, t: m.detect_with_support(im, p, s7, t))
        return dets.xyxy, dets.get_field("scores"), dets.valid

    _ = float(chain(variables, stacked))  # compile + first chain
    stacked2 = jnp.asarray(np.stack([
        space_to_depth(rng2.randn(1, qh, qw, 3).astype(np.float32))
        for _ in range(K)]))
    _ = float(stacked2.sum())  # drain the upload before timing
    t0 = time.perf_counter()
    _ = float(chain(variables, stacked2))
    dev_ms = (time.perf_counter() - t0) / K * 1000
    print(f"device-time {dev_ms:.2f} ms/image (chained scan, K={K})",
          file=sys.stderr)

    # reference published 71 ms/image (FCOS_R_50_FPN_1x, pretrain README)
    emit({
                "metric": "oneshot_p50_latency_ms",
                "value": round(p50, 2),
                "unit": "ms",
                "vs_baseline": round(71.0 / p50, 4),
            })
    emit({
                "metric": "oneshot_device_latency_ms_per_image",
                "value": round(dev_ms, 2),
                "unit": "ms",
                "vs_baseline": round(71.0 / dev_ms, 4),
            })


def run_train_bench(c, args):
    """Steady-state training-step throughput on one chip.

    Protocol: K train steps CHAINED inside one jitted lax.scan over stacked
    never-seen batches, timed by forcing the final loss value. Per-call
    protocols are unusable for train steps on this runtime: block_until_ready
    returns early and repeated (program, buffer) executions replay — per-call
    timing reported 6 ms/iter where the chained scan (and a 30-iter CLI run)
    measure ~142 ms/iter at batch 8.
    """
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.engine import create_train_state, make_train_step
    from oneshotdet_tpu.engine.trainer import batch_to_inputs
    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    from oneshotdet_tpu.solver import make_optimizer
    from oneshotdet_tpu.utils.synthetic import make_episodic_batch

    b = args.batch
    qh, qw = args.query_hw
    sh, sw = args.supp_hw
    K = max(4, min(args.iters, 8))  # steps per chain (HBM-bounded)
    model = build_detection_model(c)
    seed_base = int(time.time()) % (2**31)

    def stacked(off):
        bs = [make_episodic_batch(b, (qh, qw), (sh, sw),
                                  max_gt=c.TPU.MAX_GT_BOXES,
                                  seed=seed_base + off + i) for i in range(K)]
        keys = [k for k in bs[0] if k not in ("img_ids", "idxs")]
        return {k: jnp.asarray(np.stack([x[k] for x in bs])) for k in keys}

    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu), disable_pallas():
        small = make_episodic_batch(1, (64, 64), (64, 64), max_gt=4)
        images, supp, targets = batch_to_inputs(
            {k: jnp.asarray(v) for k, v in small.items() if k not in ("img_ids", "idxs")}
        )
        variables = model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                               targets, train=True, rng=jax.random.PRNGKey(1))
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr)

    optimizer, _ = make_optimizer(c, variables["params"])
    state = create_train_state(model, optimizer, variables)
    state = jax.device_put(state, jax.devices()[0])
    train_step = make_train_step(model, optimizer)
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def chain(state, batches):
        def body(st, batch):
            st, m = train_step(st, batch, rng)
            return st, m["loss_total"]
        return jax.lax.scan(body, state, batches)

    t0 = time.time()
    state, losses = chain(state, stacked(0))
    print(f"compile+first chain: {time.time() - t0:.1f}s "
          f"(losses {np.asarray(losses).round(3).tolist()})", file=sys.stderr)

    s2 = stacked(10_000)
    _ = float(s2["query_pixels"].sum())  # drain the upload before timing
    t0 = time.perf_counter()
    state, losses = chain(state, s2)
    _ = float(losses[-1])  # value-forced sync (block_until_ready lies here)
    dt = time.perf_counter() - t0
    s_per_iter = dt / K
    # reference Faster R-CNN R-50-FPN train baseline: 0.3530 s/iter on 8xV100
    # at global batch 16 -> 0.1765 s/iter per-GPU-pair... we report s/iter at
    # this batch and img/s/chip; vs_baseline compares img/s to the reference's
    # global 16/0.353 = 45.3 img/s on EIGHT GPUs = 5.67 img/s per GPU.
    img_per_sec = args.batch / s_per_iter
    print(f"{s_per_iter * 1000:.1f} ms/iter, batch {args.batch}", file=sys.stderr)
    emit({
                "metric": "oneshot_train_images_per_sec_per_chip",
                "value": round(img_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(img_per_sec / 5.67, 4),
            })


if __name__ == "__main__":
    main()
