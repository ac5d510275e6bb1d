"""Benchmark harness: one-shot eval throughput on the flagship model.

Measures steady-state images/sec of the full Siamese FCOS R-50-FPN eval
forward (backbone x2 -> fusion -> FCOS postproc -> ROI head -> NMS) at the
production input sizing (min 800 / max 1200, padded bucket 832x1216; support
bucket 416x416) in bfloat16 on the available accelerator.

PRIMARY METRIC (round 4+): the shipped fast-eval preset workload
(bf16 + TPU.EVAL_ROI_TOPK=512 — configs/fast_eval_preset.yaml), i.e. what a
user of the framework actually runs for evaluation. The reference-exact
full-parity workload (no proposal compaction) is emitted as the first
secondary, `oneshot_eval_fullparity_images_per_sec_per_chip`. Rounds 1-3
used the full-parity workload as the primary; the perf table labels the
workload change (VERDICT r3 #1).

Output protocol (driver parses the LAST JSON line on stdout):
  - The PRIMARY eval record is printed (flushed) as soon as it is measured.
  - Secondary stages then run IN-PROCESS (sharing the one CPU-initialized
    param tree and the device upload) under a wall-clock budget; each metric
    streams through as its own flushed JSON line the moment it exists.
  - The primary record is RE-printed as the final line (merged with any
    secondary values), so the last JSON line is always the headline metric:
      {"metric": "oneshot_eval_images_per_sec_per_chip", "value": N,
       "unit": "images/sec", "vs_baseline": N, ...extras}

vs_baseline is measured against the BASELINE.md north-star of 5,000 img/s on
a v5e-8 (= 625 images/sec/chip): vs_baseline = value / 625.

Cold-start engineering (VERDICT r3 #1 — the round-3 driver record lost every
secondary because the primary compiled 508 s):
  - the persistent XLA compile cache lives in a REPO-LOCAL dir
    (.jax_comp_cache/, gitignored — 1.7 GB — but on-disk in the working
    tree the driver shares) so a driver run still hits warm entries;
  - the CPU model init (76-373 s on this 1-core host) is disk-cached in
    .bench_cache/ (gitignored; regenerated on miss);
  - all stages run in one process: one init, one param upload, no
    per-variant subprocess re-init.
"""

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

BASELINE_IMG_PER_SEC_PER_CHIP = 625.0  # 5000 img/s on v5e-8 (BASELINE.md)
V5E_BF16_PEAK_TFLOPS = 197.0  # v5e peak bf16 TF/s (see BASELINE.md roofline)
_START = time.time()
# stop LAUNCHING secondary stages once this much wall-clock has elapsed
SECONDARY_BUDGET_S = float(os.environ.get("ONESHOT_BENCH_BUDGET_S", "420"))

# stage order = value order: if the budget dies mid-run, the most important
# numbers have already been flushed (VERDICT r3 #1). Round 5 (VERDICT r4
# #2): plain `cached` dropped from the default list (128.93 img/s was
# strictly dominated by cached_preset's 214.75 — run standalone via
# --mode eval_cached if needed), multiclass added (the round-5 headline
# lever), and train moved AHEAD of latency/serving so the training number
# makes the driver record even on a cold-cache run. int8 variants are NOT
# in the default list — measured a regression on v5e (round 3); run them
# standalone via --mode eval --quant int8.
DEFAULT_STAGES = "preset,multiclass,cached_preset,fullparity,train,latency,serving"


def emit(rec):
    """Print one JSON metric line, flushed immediately."""
    print(json.dumps(rec), flush=True)
    return rec


def _budget_left():
    return SECONDARY_BUDGET_S - (time.time() - _START)


def _configure_jax(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # Persistent compilation cache in the REPO working tree (gitignored,
    # too big to commit; the driver shares this tree): first-ever compile
    # over the device tunnel is 300-500 s; a driver run must hit warm
    # entries. /root/.cache does NOT survive container resets (observed
    # between round-3 sessions); the repo dir does.
    cache_dir = os.environ.get(
        "ONESHOT_COMPILE_CACHE", os.path.join(REPO, ".jax_comp_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return jax


def _make_cfg(args, roi_topk=None, quant=None):
    from oneshotdet_tpu.config import cfg

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
    c.TPU.EVAL_ROI_TOPK = args.roi_topk if roi_topk is None else roi_topk
    c.TPU.QUANT = args.quant if quant is None else quant
    return c


# ---------------------------------------------------------------------------
# CPU init, disk-cached
# ---------------------------------------------------------------------------
def _init_cache_path(tag, args, quant="none"):
    os.makedirs(os.path.join(REPO, ".bench_cache"), exist_ok=True)
    import jax
    # quant in the key when set: int8_weight trees carry a quant_scales
    # collection ('none' keeps the legacy key so existing caches stay valid)
    qtag = "" if quant in ("", "none", None) else f"|{quant}"
    key = hashlib.sha256(
        f"{tag}|{args.dtype}{qtag}|{jax.__version__}".encode()).hexdigest()[:12]
    return os.path.join(REPO, ".bench_cache", f"init_{tag}_{key}.msgpack")


def _init_eval_variables(model, args, quant="none"):
    """CPU-initialize the eval param tree (seed 0), disk-cached.

    Eager init over the TPU tunnel dispatches thousands of tiny ops
    (minutes); even CPU init costs 76-373 s on this 1-core host, so the
    result is cached in .bench_cache/ and reloaded in seconds.
    """
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    from oneshotdet_tpu.structures import ImageBatch

    path = _init_cache_path("eval", args, quant)
    small = ImageBatch(pixels=jnp.zeros((1, 64, 64, 3)),
                       sizes=jnp.array([[64.0, 64.0]]))

    def init_fn():
        return model.init({"params": jax.random.PRNGKey(0)}, small, small,
                          train=False)

    return _disk_cached_init(init_fn, path)


def _disk_cached_init(init_fn, path):
    import flax.serialization as fser
    import jax

    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas

    t0 = time.time()
    cpu = jax.devices("cpu")[0]
    if os.path.exists(path):
        try:
            with jax.default_device(cpu), disable_pallas():
                shapes = jax.eval_shape(init_fn)
            target = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype), shapes)
            with open(path, "rb") as f:
                variables = fser.from_bytes(target, f.read())
            print(f"init (disk cache): {time.time() - t0:.1f}s",
                  file=sys.stderr, flush=True)
            return variables
        except Exception as e:  # noqa: BLE001 — stale cache: re-init
            print(f"init cache load failed ({e}); re-initializing",
                  file=sys.stderr, flush=True)
    with jax.default_device(cpu), disable_pallas():
        variables = init_fn()
    variables = jax.device_get(variables)
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(fser.to_bytes(variables))
    os.replace(tmp, path)
    print(f"init: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    return variables


def _variables_on_device(model, args):
    """Eval param tree created ON the device: the init program (seed 0,
    tiny 64x64 shapes — conv params are spatial-size-independent) runs as
    one _aot_jit-cached dispatch, so no 271 MB host->device parameter
    upload rides the tunnel (~13 s at the 2026-08-19 ~20 MB/s, minutes in
    the degraded state observed 2026-08-20). Initializer values come from
    deterministic threefry streams: measured vs the CPU-init msgpack,
    610/625 leaves are bit-equal and the rest differ by ~1 ulp (compiled
    vs eager rounding of the initializer stddev multiply) — numerically
    irrelevant for throughput work. ONESHOT_HOST_INIT=1 forces the old
    host-init + device_put path."""
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.structures import ImageBatch

    if os.environ.get("ONESHOT_HOST_INIT"):
        variables = _init_eval_variables(model, args)
        return jax.device_put(variables, jax.devices()[0])

    small = ImageBatch(pixels=jnp.zeros((1, 64, 64, 3)),
                       sizes=jnp.array([[64.0, 64.0]]))

    def init_fn():
        return model.init({"params": jax.random.PRNGKey(0)}, small, small,
                          train=False)

    try:
        t0 = time.time()
        init = _aot_jit(f"initeval_{args.dtype}", init_fn)
        variables = init()
        jax.block_until_ready(variables)
        print(f"device init: {time.time() - t0:.1f}s", file=sys.stderr,
              flush=True)
        return variables
    except Exception as e:  # noqa: BLE001 — any failure: host fallback
        print(f"device init failed ({e}); host init + upload",
              file=sys.stderr, flush=True)
        variables = _init_eval_variables(model, args)
        return jax.device_put(variables, jax.devices()[0])


def _train_state_on_device(model, optimizer, init_fn, tag):
    """TrainState (params + FrozenBN constants + optimizer slots) created
    ON the device in one cached dispatch — the host path device_puts
    ~540 MB (fp32 params + momentum) through the tunnel. Returns None on
    failure so the caller can fall back to host init + upload."""
    import jax

    from oneshotdet_tpu.engine import create_train_state

    if os.environ.get("ONESHOT_HOST_INIT"):
        return None

    def state_fn():
        return create_train_state(model, optimizer, init_fn())

    try:
        t0 = time.time()
        state = _aot_jit(tag, state_fn)()
        jax.block_until_ready(state)
        print(f"device train-state init: {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        return state
    except Exception as e:  # noqa: BLE001
        print(f"device train-state init failed ({e}); host init + upload",
              file=sys.stderr, flush=True)
        return None


# ---------------------------------------------------------------------------
# traced-program disk cache (jax.export)
# ---------------------------------------------------------------------------
PROG_DIR = os.path.join(REPO, ".bench_programs")
_FINGERPRINT = [None]


def _package_fingerprint():
    """Hash of every oneshotdet_tpu .py file + the jax version: any code
    change invalidates cached traced programs."""
    if _FINGERPRINT[0] is None:
        import jax

        import oneshotdet_tpu

        root = os.path.dirname(os.path.abspath(oneshotdet_tpu.__file__))
        h = hashlib.sha256(jax.__version__.encode())
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    with open(os.path.join(dirpath, fn), "rb") as f:
                        h.update(f.read())
        _FINGERPRINT[0] = h.hexdigest()[:12]
    return _FINGERPRINT[0]


def _register_export_types():
    """Register third-party pytree node types jax.export can't serialize by
    default. The train state's optimizer state is built from optax
    NamedTuple nodes (MaskedNode, TraceState, ScaleByAdamState, ...);
    register every NamedTuple class optax exposes so the traced train
    program round-trips through jax.export like the eval programs do."""
    import jax

    try:
        import optax
        from optax.transforms import _masking

        classes = {("optax.MaskedNode", _masking.MaskedNode)}
        for mod in (optax, optax.transforms):
            for name in dir(mod):
                obj = getattr(mod, name, None)
                if (isinstance(obj, type) and issubclass(obj, tuple)
                        and hasattr(obj, "_fields")):
                    classes.add((f"optax.{name}", obj))
        for ser_name, cls in sorted(classes, key=lambda p: p[0]):
            try:
                jax.export.register_namedtuple_serialization(
                    cls, serialized_name=ser_name)
            except ValueError:
                pass  # already registered
    except ImportError:
        pass

    try:
        import pickle

        from oneshotdet_tpu.engine.trainer import TrainState

        # flax struct dataclass: auxdata is static metadata only (no arrays)
        jax.export.register_pytree_node_serialization(
            TrainState, serialized_name="oneshotdet_tpu.TrainState",
            serialize_auxdata=pickle.dumps,
            deserialize_auxdata=pickle.loads)
    except (ImportError, ValueError):
        pass


def _aot_jit(tag, trace_fn, *args):
    """``jax.jit(trace_fn)`` with the TRACED PROGRAM disk-cached via
    ``jax.export`` (weights stay arguments, not baked constants).

    Why: the driver's 350-508 s eval "compile" is NOT XLA compilation —
    measured 2026-08-19 on this 1-core host: ``lower()`` (python tracing +
    StableHLO lowering of the full model) = 378 s, XLA ``compile()`` on a
    persistent-cache hit = 1.7 s. Deserializing a saved StableHLO module
    skips tracing entirely; the persistent XLA cache then makes compile
    seconds. Keyed by package-code hash + platform + arg shapes/dtypes,
    so any code or shape change re-traces and re-saves.
    """
    import jax

    _register_export_types()  # needed for BOTH serialize and deserialize

    def as_spec(x):
        a = x if hasattr(x, "dtype") else np.asarray(x)
        return jax.ShapeDtypeStruct(a.shape, a.dtype)

    specs = jax.tree.map(as_spec, args)
    plat = jax.devices()[0].platform
    sig = hashlib.sha256(
        str(jax.tree.map(lambda s: (s.shape, str(s.dtype)), specs)).encode()
    ).hexdigest()[:10]
    path = os.path.join(
        PROG_DIR, f"{tag}_{plat}_{_package_fingerprint()}_{sig}.jaxprog")
    if os.path.exists(path):
        t0 = time.time()
        with open(path, "rb") as f:
            exported = jax.export.deserialize(bytearray(f.read()))
        print(f"traced-program cache hit [{tag}]: {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        return jax.jit(exported.call)
    t0 = time.time()
    exported = jax.export.export(jax.jit(trace_fn))(*specs)
    _register_export_types()
    try:
        data = exported.serialize()
    except Exception as e:  # unregistered custom pytree type, etc.
        print(f"traced [{tag}]: {time.time() - t0:.1f}s "
              f"(NOT cached: serialize failed: {e})",
              file=sys.stderr, flush=True)
        return jax.jit(exported.call)
    os.makedirs(PROG_DIR, exist_ok=True)
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    print(f"traced [{tag}]: {time.time() - t0:.1f}s "
          f"(saved {len(data) / 1e6:.0f} MB)", file=sys.stderr, flush=True)
    return jax.jit(exported.call)


# ---------------------------------------------------------------------------
# fresh-content input streams
# ---------------------------------------------------------------------------
class _FreshBatches:
    """Never-before-seen device batches, cheaply.

    The device runtime memoizes (program, input-buffer) executions
    PERSISTENTLY ACROSS PROCESSES and keys on buffer content; every timed
    iteration must consume content the program has never seen. One randn
    base per stream + a distinct scalar offset per variant gives distinct
    content without a fresh 97 MB randn each time.

    ``device()`` derives variants ON DEVICE (base GENERATED on device, then
    a jitted add of a distinct scalar). The base used to be a host randn
    uploaded lazily — but uploads ride the tunnel (measured ~20-33 MB/s on
    2026-08-19 and as low as ~0.3 MB/s on 2026-08-20), so the 97 MB base
    landed inside the first chain execution and cost 300+ s of non-chip
    time in the driver's budget. jax.random.normal from a tiny time-seeded
    key produces the base with ZERO host transfer; iid-normal content is
    distribution-identical to the old host randn, and device-side input
    generation was validated as throughput-honest in round 2
    (tools/ablate_bench.py devgen_inputs ablation == full run).
    """

    _uid = [0]

    def __init__(self, shape, s2d=True):
        from oneshotdet_tpu.data.transforms import space_to_depth

        self._s2d = space_to_depth if s2d else (lambda x: x)
        self._seed = (int(time.time() * 1e3)
                      + 7919 * self._uid[0]) % (2**31)
        _FreshBatches._uid[0] += 1
        self._shape = tuple(shape)
        self._base = None  # host-path only, lazily built
        self._i = 0
        self._dev_base = None
        self._add = None

    def _host_base(self):
        if self._base is None:
            rng = np.random.RandomState(self._seed)
            self._base = rng.randn(*self._shape).astype(np.float32)
        return self._base

    def host(self):
        self._i += 1
        return self._s2d(self._host_base() + np.float32(self._i * 1e-3))

    def device(self):
        import jax
        import jax.numpy as jnp

        if self._dev_base is None:
            t0 = time.time()
            # s2d'd shape without materializing the 97 MB host array
            per = self._s2d(np.zeros((1,) + self._shape[1:],
                                     np.float32)).shape
            full = (self._shape[0],) + tuple(per[1:])
            key = jax.random.PRNGKey(self._seed)
            gen = jax.jit(
                lambda k: jax.random.normal(k, full, jnp.float32))
            self._dev_base = gen(key)
            self._dev_base.block_until_ready()
            dt = time.time() - t0
            if dt > 1.0:
                print(f"base devgen {self._dev_base.nbytes / 1e6:.0f} MB: "
                      f"{dt:.1f}s", file=sys.stderr, flush=True)
            self._add = jax.jit(lambda b, c: b + c)
        self._i += 1
        return self._add(self._dev_base, jnp.float32(self._i * 1e-3))


# ---------------------------------------------------------------------------
# honest synchronization
# ---------------------------------------------------------------------------
def _make_accum():
    """Jitted (scalar, output-pytree) -> scalar fold for honest timing.

    ``jax.block_until_ready`` can return EARLY for warm deserialized
    (jax.export) programs over the device tunnel — measured 2026-08-19: a
    cache-hit bench run reported "first run: 0.0s" and 13,189 img/s, while
    the identical program value-forced per call measured an honest 66
    ms/batch. Chaining every timed output into one device scalar and
    host-reading it at the end forces every execution via data dependency;
    a value computed FROM the outputs cannot lie.
    """
    import jax
    import jax.numpy as jnp

    def accum(acc, out):
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + leaf.astype(jnp.float32).sum()
        return acc

    return jax.jit(accum)


def _force(accum, out):
    """Single-output value-force: returns the host float (honest sync)."""
    import jax.numpy as jnp

    return float(accum(jnp.float32(0.0), out))


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------
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


def _variant_suffix(c):
    v = "" if c.TPU.QUANT == "none" else f"_{c.TPU.QUANT}"
    if c.TPU.EVAL_ROI_TOPK:
        v += f"_topk{c.TPU.EVAL_ROI_TOPK}"
    return v


def run_eval_stage(c, args, variables, metric=None, workload=None):
    """Batch eval throughput, supports recomputed per batch (the reference's
    eval loop protocol, engine/inference.py:50-66)."""
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.structures import ImageBatch

    b, (qh, qw), (sh, sw) = args.batch, args.query_hw, args.supp_hw
    model = build_detection_model(c)
    sizes = jnp.tile(jnp.array([[800.0, 1200.0]]), (b, 1))
    supp_sizes = jnp.tile(jnp.array([[400.0, 400.0]]), (b, 1))
    qstream = _FreshBatches((b, qh, qw, 3))
    sstream = _FreshBatches((b, sh, sw, 3))

    def forward_fn(variables, pixels, supp_pixels):
        imgs = ImageBatch(pixels=pixels, sizes=sizes)
        sup = ImageBatch(pixels=supp_pixels, sizes=supp_sizes)
        dets = model.apply(variables, imgs, sup,
                           target_ids=jnp.ones((b,), jnp.int32), train=False)
        return dets.xyxy, dets.get_field("scores"), dets.valid

    # CHAINED-SCAN protocol (the only per-iteration-artifact-free timing on
    # this tunnel, cross-validated vs per-call pipelined in round 2 at 8.69
    # vs 8.5 ms/im): K batch-forwards inside one lax.scan, outputs folded
    # into one scalar, synced by float() — one dispatch, one round-trip.
    # Per-call loops pay ~20-25 ms/dispatch serialized when value-forced
    # (measured 2026-08-19: 81.5 ms/batch vs 44.7 true), and
    # block_until_ready lies on warm deserialized programs (13,189 img/s).
    #
    # Round 4: fresh per-iteration inputs are derived IN the scan body
    # (base + never-seen scalar offset from the scan xs) instead of a
    # pre-stacked (K, ...) input block. The skeleton ablation measured the
    # one tunnel dispatch at ~25 ms — 1.25 ms/batch of non-chip overhead at
    # K=20 — and stacked inputs capped K by HBM (4.9 GB at K=20). In-body
    # derivation holds only the 122 MB base pair, so K=100 amortizes the
    # dispatch to ~0.25 ms/batch; the extra per-iteration elementwise add
    # is strictly MORE work than reading a stacked slice (conservative).
    # devgen == stacked was validated in round 2 (ablate_bench devgen_inputs).
    K = args.iters

    def chain_fn(v, qbase, sbase, offs):
        def body(acc, off):
            out = forward_fn(v, qbase + off, sbase + off * jnp.float32(0.731))
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc + leaf.astype(jnp.float32).sum()
            return acc, jnp.float32(0.0)
        return jax.lax.scan(body, jnp.float32(0.0), offs)[0]

    qbase = qstream.device()
    sbase = sstream.device()
    offs = jnp.arange(1, K + 1, dtype=jnp.float32) * jnp.float32(1e-3)
    chain = _aot_jit(f"evalgen{K}{_variant_suffix(c)}_{args.dtype}",
                     chain_fn, variables, qbase, sbase, offs)
    t0 = time.time()
    compiled = chain.lower(variables, qbase, sbase, offs).compile()
    print(f"lower+compile: {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    # XLA cost analysis counts a scan body ONCE, not × trip count (verified
    # on chip 2026-08-19: the K=10 chain reports exactly the one-batch
    # 450.1 GFLOP of the unrolled forward) — so this IS per-batch already.
    flops_per_batch = _program_flops(compiled)

    t0 = time.time()
    _ = float(compiled(variables, qbase, sbase, offs))
    print(f"first chain: {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)

    # fresh never-seen offsets (hence content) for the timed chain
    offs2 = offs + jnp.float32(0.777)
    offs2.block_until_ready()
    t0 = time.perf_counter()
    _ = float(compiled(variables, qbase, sbase, offs2))
    dt = time.perf_counter() - t0

    img_per_sec = b * K / dt
    print(f"{1000 * dt / (b * args.iters):.2f} ms/image, batch {b}",
          file=sys.stderr, flush=True)
    rec = {
        "metric": metric or f"oneshot_eval{_variant_suffix(c)}_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
    }
    if workload:
        rec["workload"] = workload
    if flops_per_batch:
        tf_per_sec = flops_per_batch * args.iters / dt / 1e12
        rec["tflops_per_image"] = round(flops_per_batch / b / 1e12, 4)
        rec["sustained_tflops_per_sec"] = round(tf_per_sec, 2)
        rec["mfu_vs_v5e_bf16_peak"] = round(tf_per_sec / V5E_BF16_PEAK_TFLOPS, 4)
        print(f"MFU: {tf_per_sec:.1f} TF/s sustained = "
              f"{100 * tf_per_sec / V5E_BF16_PEAK_TFLOPS:.1f}% of v5e bf16 "
              f"peak ({flops_per_batch / b / 1e9:.1f} GFLOP/image)",
              file=sys.stderr, flush=True)
    return emit(rec)


def run_eval_cached_stage(c, args, variables):
    """Batch eval throughput with CACHED support features — the production
    seq_test protocol (engine/inference.py split steps): one support crop
    serves every query of its class, so the support backbone + pooling run
    once per class, not once per batch."""
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.structures import ImageBatch

    b, (qh, qw), (sh, sw) = args.batch, args.query_hw, args.supp_hw
    model = build_detection_model(c)
    sizes = jnp.tile(jnp.array([[800.0, 1200.0]]), (b, 1))
    supp_sizes = jnp.array([[400.0, 400.0]])
    qstream = _FreshBatches((b, qh, qw, 3))
    sstream = _FreshBatches((1, sh, sw, 3))

    def support_fn(v, sp):
        return model.apply(
            v, ImageBatch(pixels=sp, sizes=supp_sizes), 1,
            method=lambda m, s, nn_: m.compute_support_features(s, nn_))

    s0 = sstream.device()
    pooled, s7 = _aot_jit(f"suppfeat{_variant_suffix(c)}_{args.dtype}",
                          support_fn, variables, s0)(variables, s0)
    pooled = [jnp.tile(p, (b, 1, 1, 1)) for p in pooled]
    s7 = jnp.tile(s7, (b, 1, 1, 1, 1))
    jax.block_until_ready(s7)

    def detect_fn(v, q, pooled, s7):
        images = ImageBatch(pixels=q, sizes=sizes)
        dets = model.apply(
            v, images, pooled, s7, jnp.ones((b,), jnp.int32),
            method=lambda m, im, p, s, t: m.detect_with_support(im, p, s, t))
        return dets.xyxy, dets.get_field("scores"), dets.valid

    # chained-scan protocol with in-body input derivation (see
    # run_eval_stage for why; K amortizes the one tunnel dispatch)
    K = args.iters

    def chain_fn(v, qbase, pooled, s7, offs):
        def body(acc, off):
            out = detect_fn(v, qbase + off, pooled, s7)
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc + leaf.astype(jnp.float32).sum()
            return acc, jnp.float32(0.0)
        return jax.lax.scan(body, jnp.float32(0.0), offs)[0]

    qbase = qstream.device()
    offs = jnp.arange(1, K + 1, dtype=jnp.float32) * jnp.float32(1e-3)
    chain = _aot_jit(f"cachedgen{K}{_variant_suffix(c)}_{args.dtype}",
                     chain_fn, variables, qbase, pooled, s7, offs)
    _ = float(chain(variables, qbase, pooled, s7, offs))  # compile + upload
    offs2 = offs + jnp.float32(0.777)
    offs2.block_until_ready()
    t0 = time.perf_counter()
    _ = float(chain(variables, qbase, pooled, s7, offs2))
    dt = time.perf_counter() - t0
    img_per_sec = b * K / dt
    print(f"{1000 * dt / (b * args.iters):.2f} ms/image (cached support), "
          f"batch {b}", file=sys.stderr, flush=True)
    return emit({
        "metric": (f"oneshot_eval_cached{_variant_suffix(c)}"
                   "_support_images_per_sec_per_chip"),
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
    })


def run_multiclass_stage(c, args, variables):
    """Multi-class episode batching: ONE query backbone+FPN pass amortized
    over S cached support classes (engine/inference.py::
    make_multiclass_eval_step; parity-tested in tests/test_multiclass.py).

    The eval protocol revisits each query image once per class — the
    episodic dataset's length is Σ_cat #imgs(cat) (reference
    data/datasets/coco.py:181-203) — and fusion happens after the query
    backbone (generalized_rcnn.py:270 vs :307-311), so the backbone+FPN
    pass (16.9 ms of the 42.6 ms preset batch, the largest single slice of
    the eval cost model) legally serves all S classes an image is evaluated
    against. Throughput unit: EPISODES/sec, one episode = one (image,
    class) evaluation — the same unit every other eval stage reports,
    since their episodes are 1-class.
    """
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.structures import ImageBatch

    b, (qh, qw), (sh, sw) = args.batch, args.query_hw, args.supp_hw
    S = args.multiclass_s
    model = build_detection_model(c)
    sizes = jnp.tile(jnp.array([[800.0, 1200.0]]), (b, 1))
    supp_sizes = jnp.array([[400.0, 400.0]])
    qstream = _FreshBatches((b, qh, qw, 3))
    sstream = _FreshBatches((1, sh, sw, 3))

    def support_fn(v, sp):
        return model.apply(
            v, ImageBatch(pixels=sp, sizes=supp_sizes), 1,
            method=lambda m, s, nn_: m.compute_support_features(s, nn_))

    # S class-level support feature sets (batch-1), stacked class-major;
    # distinct per-class content via per-class offsets on one support crop
    s0 = sstream.device()
    pooled1, s71 = _aot_jit(f"suppfeat{_variant_suffix(c)}_{args.dtype}",
                            support_fn, variables, s0)(variables, s0)
    cls_off = (jnp.arange(S, dtype=jnp.float32) * 1e-3).reshape(
        (S,) + (1,) * pooled1[0].ndim)
    pooled_stack = [jnp.tile(p[None], (S,) + (1,) * p.ndim) + cls_off
                    for p in pooled1]
    s7_stack = (jnp.tile(s71[None], (S,) + (1,) * s71.ndim)
                + cls_off.reshape((S,) + (1,) * s71.ndim))
    tid_stack = jnp.arange(1, S + 1, dtype=jnp.int32)
    jax.block_until_ready(s7_stack)

    # chained-scan protocol (see run_eval_stage): K outer iterations, each
    # = one query backbone+FPN pass + an inner scan over the S classes.
    # K is scaled down by S: the dispatch floor (~25 ms) amortizes over
    # b*S*K episodes, and one outer iteration already does S× the work of
    # a preset iteration.
    K = max(2, args.iters // 10)

    def chain_fn(v, qbase, pooled_stack, s7_stack, tids, offs):
        def body(acc, off):
            images = ImageBatch(pixels=qbase + off, sizes=sizes)
            features = model.apply(
                v, images, method=lambda m, im: m.backbone_features(im))
            sizes_wh = images.sizes_wh()

            def cls_body(acc_c, xs):
                pooled, s7, tid = xs
                dets = model.apply(
                    v, features, sizes_wh, list(pooled), s7, tid,
                    method=lambda m, f, sw_, p, s, t:
                        m.detect_from_features(f, sw_, p, s, t))
                out = (dets.xyxy, dets.get_field("scores"), dets.valid)
                for leaf in jax.tree_util.tree_leaves(out):
                    acc_c = acc_c + leaf.astype(jnp.float32).sum()
                return acc_c, jnp.float32(0.0)

            acc, _ = jax.lax.scan(
                cls_body, acc, (tuple(pooled_stack), s7_stack, tids))
            return acc, jnp.float32(0.0)
        return jax.lax.scan(body, jnp.float32(0.0), offs)[0]

    qbase = qstream.device()
    offs = jnp.arange(1, K + 1, dtype=jnp.float32) * jnp.float32(1e-3)
    chain = _aot_jit(
        f"multiclass{S}gen{K}{_variant_suffix(c)}_{args.dtype}",
        chain_fn, variables, qbase, pooled_stack, s7_stack, tid_stack, offs)
    _ = float(chain(variables, qbase, pooled_stack, s7_stack, tid_stack,
                    offs))  # compile + upload
    offs2 = offs + jnp.float32(0.777)
    offs2.block_until_ready()
    t0 = time.perf_counter()
    _ = float(chain(variables, qbase, pooled_stack, s7_stack, tid_stack,
                    offs2))
    dt = time.perf_counter() - t0
    eps_per_sec = b * S * K / dt
    print(f"{1000 * dt / (b * S * K):.2f} ms/episode (S={S} classes per "
          f"query pass, batch {b}, K={K})", file=sys.stderr, flush=True)
    return emit({
        "metric": (f"oneshot_eval_multiclass{_variant_suffix(c)}"
                   "_images_per_sec_per_chip"),
        "value": round(eps_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(eps_per_sec / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
        "workload": (f"multi-class episode batching: 1 query pass serves "
                     f"S={S} cached support classes"),
    })


def run_latency_stage(c, args, variables):
    """p50 single-image latency, streaming-predictor protocol: support
    features cached (computed once per class), one query per call, blocking
    per call — the BASELINE.md "p50 per-image latency" tracked metric."""
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu.models import build_detection_model
    from oneshotdet_tpu.structures import ImageBatch

    (qh, qw), (sh, sw) = args.query_hw, args.supp_hw
    model = build_detection_model(c)
    sizes = jnp.array([[800.0, 1200.0]])
    supp_sizes = jnp.array([[400.0, 400.0]])
    qstream = _FreshBatches((1, qh, qw, 3))
    sstream = _FreshBatches((1, sh, sw, 3))

    def support_fn(v, sp):
        return model.apply(
            v, ImageBatch(pixels=sp, sizes=supp_sizes), 1,
            method=lambda m, s, nn_: m.compute_support_features(s, nn_))

    s0 = sstream.device()
    supp_feats = _aot_jit(f"suppfeat{_variant_suffix(c)}_{args.dtype}",
                          support_fn, variables, s0)(variables, s0)
    jax.block_until_ready(supp_feats)

    def predict_fn(v, q, feats):
        images = ImageBatch(pixels=q, sizes=sizes)
        dets = model.apply(
            v, images, feats[0], feats[1], jnp.ones((1,), jnp.int32),
            method=lambda m, im, p, s7, t: m.detect_with_support(im, p, s7, t))
        return dets.xyxy, dets.get_field("scores"), dets.valid

    q0 = qstream.device()
    predict1 = _aot_jit(f"predict1{_variant_suffix(c)}_{args.dtype}",
                        predict_fn, variables, q0, supp_feats)
    predict = lambda v, q: predict1(v, q, supp_feats)  # noqa: E731
    predict_raw = lambda v, q: predict_fn(v, q, supp_feats)  # noqa: E731
    accum = _make_accum()
    out = predict(variables, q0)
    _force(accum, out)
    for _ in range(args.warmup):
        out = predict(variables, qstream.device())
    _force(accum, out)
    lat = []
    timed = [qstream.device() for _ in range(args.iters)]
    for q in timed:
        t0 = time.perf_counter()
        _force(accum, predict(variables, q))  # value-forced per-call sync
        lat.append((time.perf_counter() - t0) * 1000)
    lat.sort()
    p50 = lat[len(lat) // 2]
    print(f"p50 {p50:.2f} ms, min {lat[0]:.2f}, max {lat[-1]:.2f}",
          file=sys.stderr, flush=True)

    # DEVICE-TIME per-image latency (VERDICT r1 weak #6): the per-call p50
    # above includes ~20 ms of device-tunnel round-trip that a co-located
    # deployment never pays. Chain K single-image predicts inside one jitted
    # lax.scan over stacked never-seen queries — one dispatch, K device
    # iterations — so the per-image quotient is tunnel-free.
    K = args.iters

    def chain_fn(v, qbase, feats, offs):
        def body(acc, off):
            o = predict_fn(v, qbase + off, feats)
            return acc + o[1].astype(jnp.float32).sum(), 0.0
        return jax.lax.scan(body, 0.0, offs)[0]

    # fresh queries derived IN the scan body (see run_eval_stage): base
    # uploaded once, per-iteration never-seen offsets from the scan xs
    qbase = qstream.device()
    offs = jnp.arange(1, K + 1, dtype=jnp.float32) * jnp.float32(1e-3)
    chain = _aot_jit(f"latgen{K}{_variant_suffix(c)}_{args.dtype}",
                     chain_fn, variables, qbase, supp_feats, offs)
    _ = float(chain(variables, qbase, supp_feats, offs))  # compile + first
    offs2 = offs + jnp.float32(0.777)
    offs2.block_until_ready()
    t0 = time.perf_counter()
    _ = float(chain(variables, qbase, supp_feats, offs2))
    dev_ms = (time.perf_counter() - t0) / K * 1000
    print(f"device-time {dev_ms:.2f} ms/image (chained scan, K={K})",
          file=sys.stderr, flush=True)

    # reference published 71 ms/image (FCOS_R_50_FPN_1x, pretrain README)
    wl = f"fast-eval preset{_variant_suffix(c) or ' (bf16)'}"
    emit({"metric": "oneshot_p50_latency_ms", "value": round(p50, 2),
          "unit": "ms", "vs_baseline": round(71.0 / p50, 4), "workload": wl})
    emit({"metric": "oneshot_device_latency_ms_per_image",
          "value": round(dev_ms, 2), "unit": "ms",
          "vs_baseline": round(71.0 / dev_ms, 4), "workload": wl})


def run_serving_stage(c, args, variables):
    """Time the deployable artifact, not just the live-jit path (VERDICT r3
    weak #6/#4): export the cached-support (support, detect) StableHLO pair
    at batch 1, then measure serialize size, load (deserialize) time,
    FIRST-inference time (compile+run — the deployer's cold start), and
    steady-state per-call p50. The reference serves by re-running the python
    model per frame (demo/predictor.py); the artifact needs no model-build
    python at load time."""
    import jax
    import jax.numpy as jnp

    from oneshotdet_tpu import export as oexport

    (qh, qw), (sh, sw) = args.query_hw, args.supp_hw

    # artifact keyed by code fingerprint + shapes: re-export (a full trace,
    # ~6 min on this host) only when the program could have changed — the
    # serving metrics time LOAD + FIRST INFERENCE, not export
    plat = jax.devices()[0].platform
    # device-side init (round 5) no longer touches .bench_cache, so this
    # stage may be the first writer — create the dir (fix: serving failed
    # with ENOENT on a fresh checkout)
    os.makedirs(os.path.join(REPO, ".bench_cache"), exist_ok=True)
    path = os.path.join(
        REPO, ".bench_cache",
        f"serving_{plat}_{_package_fingerprint()}"
        f"_{qh}x{qw}_{sh}x{sw}_{args.dtype}")
    t_export = t_save = 0.0
    if not (os.path.exists(path + ".support")
            and os.path.exists(path + ".detect")):
        t0 = time.time()
        pair = oexport.export_eval(c, jax.device_get(variables), batch=1,
                                   query_hw=(qh, qw), supp_hw=(sh, sw),
                                   kind="cached_support")
        t_export = time.time() - t0
        t0 = time.time()
        oexport.save(pair, path)
        t_save = time.time() - t0
    size_mb = sum(os.path.getsize(path + ext)
                  for ext in (".support", ".detect")) / 1e6

    # platform-specific EXECUTABLE artifact next to the portable StableHLO
    # pair (VERDICT r4 weak #2: the StableHLO path pays lower+XLA-compile at
    # first call — 100 s cold start; the serialized executable loads in
    # ~0.1 s and runs immediately). Built once per package fingerprint.
    plat_dev = jax.devices()[0]
    have_exec = (os.path.exists(path + ".support.exec")
                 and os.path.exists(path + ".detect.exec"))
    if not have_exec:
        t0 = time.time()
        pair = (oexport.load(path + ".support"), oexport.load(path + ".detect"))
        have_exec = oexport.save_compiled(pair, path)
        print(f"serving: exec artifact build "
              f"{'ok' if have_exec else 'UNSUPPORTED on ' + plat_dev.platform}"
              f" ({time.time() - t0:.1f}s)", file=sys.stderr, flush=True)

    sstream = _FreshBatches((1, sh, sw, 3))
    qstream = _FreshBatches((1, qh, qw, 3))
    supp_sizes = jnp.array([[400.0, 400.0]])
    sizes = jnp.array([[800.0, 1200.0]])
    tids = jnp.ones((1,), jnp.int32)
    # materialize the first inputs BEFORE the cold-start clock: the first
    # _FreshBatches.device() call compiles its small derivation program
    # over the tunnel (~14 s measured) — harness cost, not artifact cost.
    # A deployer has the frame in hand when they load the artifact.
    s_in = sstream.device()
    q_in = qstream.device()
    jax.block_until_ready((s_in, q_in))

    # cold start = artifact load + first support + first detect, on the
    # FAST path (executable) when the platform supports it
    t0 = time.time()
    if have_exec:
        sup_call = oexport.load_compiled(path + ".support")
        det_call = oexport.load_compiled(path + ".detect")
        cold_workload = "compiled-executable artifact load+first-inference"
    else:  # portable fallback: StableHLO + jit (pays compile at first call)
        sup_call = jax.jit(oexport.load(path + ".support").call)
        det_call = jax.jit(oexport.load(path + ".detect").call)
        cold_workload = "AOT StableHLO artifact load+first-inference"
    t_load = time.time() - t0

    accum = _make_accum()
    t0 = time.time()
    supp_feats = sup_call(s_in, supp_sizes)
    _force(accum, supp_feats)
    t_first_support = time.time() - t0

    pooled, s7 = supp_feats
    t0 = time.time()
    out = det_call(q_in, sizes, pooled, s7, tids)
    _force(accum, out)
    t_first_detect = time.time() - t0

    lat = []
    timed = [qstream.device() for _ in range(args.iters)]
    for q in timed:
        t0 = time.perf_counter()
        _force(accum, det_call(q, sizes, pooled, s7, tids))
        lat.append((time.perf_counter() - t0) * 1000)
    lat.sort()
    p50 = lat[len(lat) // 2]

    cold_start = t_load + t_first_support + t_first_detect
    print(f"serving: export {t_export:.1f}s save {t_save:.1f}s "
          f"({size_mb:.0f} MB) load {t_load:.1f}s first support "
          f"{t_first_support:.1f}s first detect {t_first_detect:.1f}s "
          f"p50 {p50:.2f} ms", file=sys.stderr, flush=True)
    # reference cold start = build python model + load .pth + trace nothing
    # (eager) but pays python per frame; our comparable number is the 71 ms
    # published per-image time for steady state (pretrain README)
    emit({"metric": "oneshot_serving_cold_start_s",
          "value": round(cold_start, 2), "unit": "s",
          "workload": f"AOT artifact load+first-inference ({size_mb:.0f} MB pair)"})
    return emit({"metric": "oneshot_serving_p50_latency_ms",
                 "value": round(p50, 2), "unit": "ms",
                 "vs_baseline": round(71.0 / p50, 4),
                 "workload": "AOT cached-support artifact, per-call"})


def _paint_episodes(q_shape, s_shape, gt_xyxy, gt_valid, seed):
    """Device-side synthetic episode pixels: noise + per-(step, image)
    color blocks painted at the GT boxes, support crops carrying the same
    color in their center — the content semantics of
    ``utils.synthetic.make_episodic_batch`` (synthetic.py:31-46) with ZERO
    large host→device transfer. The stacked train pixels are ~900 MB;
    uploading them rode the tunnel inside the untimed first chain and cost
    30-900 s depending on the day's tunnel speed (~20-33 MB/s measured
    2026-08-19, ~0.3 MB/s observed 2026-08-20)."""
    import jax
    import jax.numpy as jnp

    K, b, qh, qw = q_shape
    _, _, sh, sw = s_shape
    G = gt_xyxy.shape[2]

    def gen(key, gt_xyxy, gt_valid):
        kq, ks, kc = jax.random.split(key, 3)
        q = jax.random.normal(kq, (K, b, qh, qw, 3), jnp.float32) * 10.0
        s = jax.random.normal(ks, (K, b, sh, sw, 3), jnp.float32) * 10.0
        colors = jax.random.uniform(kc, (K, b, 3), jnp.float32, 50.0, 255.0)
        yy = jnp.arange(qh, dtype=jnp.float32)[:, None]
        xx = jnp.arange(qw, dtype=jnp.float32)[None, :]
        for g in range(G):  # static unroll; XLA fuses the where chain
            box = gt_xyxy[:, :, g]
            x1 = box[..., 0][..., None, None]
            y1 = box[..., 1][..., None, None]
            x2 = box[..., 2][..., None, None]
            y2 = box[..., 3][..., None, None]
            m = ((xx >= x1) & (xx <= x2) & (yy >= y1) & (yy <= y2)
                 & gt_valid[:, :, g][..., None, None])
            q = jnp.where(m[..., None],
                          colors[:, :, None, None, :] + q * 0.5, q)
        cm = jnp.zeros((sh, sw), bool).at[4:-4, 4:-4].set(True)
        s = jnp.where(cm[None, None, :, :, None],
                      colors[:, :, None, None, :] + s * 0.5, s)
        return q, s

    out = jax.jit(gen)(jax.random.PRNGKey(seed % (2**31)), gt_xyxy, gt_valid)
    jax.block_until_ready(out)
    return out


def _stacked_episodes(b, qhw, shw, K, max_gt, seed):
    """(K, batch, ...) stacked synthetic train episodes with pixels painted
    ON DEVICE (_paint_episodes) and only the tiny GT/size/label arrays
    built host-side. Same key set / shapes / dtypes as stacking
    ``make_episodic_batch`` outputs directly, so existing trainchain
    traced-program caches stay valid."""
    import jax.numpy as jnp

    from oneshotdet_tpu.utils.synthetic import make_episodic_batch

    (qh, qw), (sh, sw) = qhw, shw
    # tiny-shape generator calls give us the structured GT VALIDITY/labels
    # cheaply; box coordinates are re-drawn below for the real query size
    bs = [make_episodic_batch(b, (64, 64), (64, 64), max_gt=max_gt,
                              seed=seed + i) for i in range(K)]
    keys = [k for k in bs[0] if k not in ("img_ids", "idxs")]
    out = {k: np.stack([x[k] for x in bs]) for k in keys}
    rng = np.random.RandomState(seed % (2**31))
    gt_xyxy = np.zeros((K, b, max_gt, 4), np.float32)
    gt_valid = out["gt_valid"]
    for k in range(K):
        for i in range(b):
            for g in range(max_gt):
                if gt_valid[k, i, g]:
                    w = int(rng.randint(qw // 8, qw // 2))
                    h = int(rng.randint(qh // 8, qh // 2))
                    x1 = int(rng.randint(0, qw - w))
                    y1 = int(rng.randint(0, qh - h))
                    gt_xyxy[k, i, g] = (x1, y1, x1 + w - 1, y1 + h - 1)
    out["gt_xyxy"] = gt_xyxy
    out["query_sizes"] = np.tile(np.array([[[qh, qw]]], np.float32),
                                 (K, b, 1))
    out["supp_sizes"] = np.tile(np.array([[[sh, sw]]], np.float32),
                                (K, b, 1))
    q_dev, s_dev = _paint_episodes((K, b, qh, qw), (K, b, sh, sw),
                                   jnp.asarray(gt_xyxy),
                                   jnp.asarray(gt_valid), seed)
    dev = {k: jnp.asarray(v) for k, v in out.items() if "pixels" not in k}
    dev["query_pixels"] = q_dev
    dev["supp_pixels"] = s_dev
    return dev


def run_train_stage(c, args):
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

    b, (qh, qw), (sh, sw) = args.batch, args.query_hw, args.supp_hw
    K = max(4, min(args.iters, 8))  # steps per chain (HBM-bounded)
    model = build_detection_model(c)
    seed_base = int(time.time()) % (2**31)

    def stacked(off):
        return _stacked_episodes(b, (qh, qw), (sh, sw), K,
                                 c.TPU.MAX_GT_BOXES, seed_base + off)

    def init_fn():
        small = make_episodic_batch(1, (64, 64), (64, 64), max_gt=4)
        images, supp, targets = batch_to_inputs(
            {k: jnp.asarray(v) for k, v in small.items()
             if k not in ("img_ids", "idxs")})
        return model.init({"params": jax.random.PRNGKey(0)}, images, supp,
                          targets, train=True, rng=jax.random.PRNGKey(1))

    # optimizer needs only the param TREE; eval_shape traces the tiny init
    # in seconds on CPU — no 271 MB msgpack read, no host variables at all
    from oneshotdet_tpu.ops.pallas_roi_align import disable_pallas
    with jax.default_device(jax.devices("cpu")[0]), disable_pallas():
        shapes = jax.eval_shape(init_fn)
    optimizer, _ = make_optimizer(c, shapes["params"])
    state = _train_state_on_device(model, optimizer, init_fn,
                                   f"inittrainstate_{args.dtype}")
    if state is None:  # host fallback (ONESHOT_HOST_INIT or export failure)
        variables = _disk_cached_init(init_fn, _init_cache_path("train", args))
        state = create_train_state(model, optimizer, variables)
        state = jax.device_put(state, jax.devices()[0])
    train_step = make_train_step(model, optimizer)
    rng = jax.random.PRNGKey(0)

    def chain_fn(state, batches):
        def body(st, batch):
            st, m = train_step(st, batch, rng)
            return st, m["loss_total"]
        return jax.lax.scan(body, state, batches)

    t0 = time.time()
    s1 = {k: jnp.asarray(v) for k, v in stacked(0).items()}
    chain = _aot_jit(f"trainchain_{args.dtype}", chain_fn, state, s1)
    state, losses = chain(state, s1)
    print(f"compile+first chain: {time.time() - t0:.1f}s "
          f"(losses {np.asarray(losses).round(3).tolist()})", file=sys.stderr,
          flush=True)

    # fresh pixel content derived ON DEVICE from the already-uploaded stack
    # (tunnel uploads ~25 MB/s as of 2026-08-19; this stack is ~800 MB).
    # Targets stay identical — params differ every step, so replay can't
    # trigger; only the pixels need never-seen content.
    s2 = {k: (v + jnp.float32(1e-3)
              if jnp.issubdtype(v.dtype, jnp.floating) and "pixels" in k
              else v)
          for k, v in s1.items()}
    jax.block_until_ready(s2)
    t0 = time.perf_counter()
    state, losses = chain(state, s2)
    _ = float(losses[-1])  # value-forced sync (block_until_ready lies here)
    dt = time.perf_counter() - t0
    s_per_iter = dt / K
    # reference Faster R-CNN R-50-FPN train baseline: 0.3530 s/iter at global
    # batch 16 on 8xV100 = 45.3 img/s on EIGHT GPUs = 5.67 img/s per GPU.
    img_per_sec = args.batch / s_per_iter
    print(f"{s_per_iter * 1000:.1f} ms/iter, batch {args.batch}",
          file=sys.stderr, flush=True)
    emit({"metric": "oneshot_train_images_per_sec_per_chip",
          "value": round(img_per_sec, 2), "unit": "images/sec",
          "vs_baseline": round(img_per_sec / 5.67, 4)})


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------
PRESET_TOPK = 512  # configs/fast_eval_preset.yaml


def run_all(args):
    """All stages in ONE process, value-ordered, budget-gated.

    Shares a single CPU init + device upload across the eval-family stages
    (the param tree is identical across EVAL_ROI_TOPK settings — the topk
    lever changes only the inference graph).
    """
    import jax

    from oneshotdet_tpu.models import build_detection_model

    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    preset_cfg = _make_cfg(args, roi_topk=PRESET_TOPK, quant="none")
    parity_cfg = _make_cfg(args, roi_topk=0, quant="none")

    variables = _variables_on_device(build_detection_model(preset_cfg), args)

    primary = None
    extra = {}

    def note_skip(name):
        print(f"skipping stage '{name}': only {_budget_left():.0f}s of the "
              f"{SECONDARY_BUDGET_S:.0f}s budget remain", file=sys.stderr,
              flush=True)

    for name in stages:
        if name != "preset" and _budget_left() < args.min_stage_s:
            note_skip(name)
            continue
        try:
            if name == "preset":
                # PRIMARY: the shipped fast-eval preset workload. Also
                # emitted under its explicit lever name so the parsed
                # record carries eval_topk512 (VERDICT r3 #1 done-criterion).
                rec = run_eval_stage(
                    preset_cfg, args, variables,
                    metric="oneshot_eval_images_per_sec_per_chip",
                    workload=f"fast-eval preset (bf16 + EVAL_ROI_TOPK={PRESET_TOPK})")
                alias = dict(rec)
                alias["metric"] = (f"oneshot_eval_topk{PRESET_TOPK}"
                                   "_images_per_sec_per_chip")
                emit(alias)
                extra[alias["metric"].removeprefix("oneshot_")] = alias["value"]
                primary = rec
            elif name == "multiclass":
                r = run_multiclass_stage(preset_cfg, args, variables)
                extra[r["metric"].removeprefix("oneshot_")] = r["value"]
            elif name == "cached_preset":
                r = run_eval_cached_stage(preset_cfg, args, variables)
                extra[r["metric"].removeprefix("oneshot_")] = r["value"]
            elif name == "fullparity":
                r = run_eval_stage(
                    parity_cfg, args, variables,
                    metric="oneshot_eval_fullparity_images_per_sec_per_chip",
                    workload="reference-exact workload (no proposal compaction)")
                extra[r["metric"].removeprefix("oneshot_")] = r["value"]
            elif name == "cached":
                r = run_eval_cached_stage(parity_cfg, args, variables)
                extra[r["metric"].removeprefix("oneshot_")] = r["value"]
            elif name == "latency":
                run_latency_stage(preset_cfg, args, variables)
            elif name == "train":
                run_train_stage(parity_cfg, args)
            elif name == "serving":
                run_serving_stage(preset_cfg, args, variables)
            else:
                print(f"unknown stage '{name}'", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — a dead stage must not kill the record
            print(f"stage '{name}' failed: {e}", file=sys.stderr, flush=True)
            if name == "preset":
                raise

    if primary is not None:
        primary.update(extra)
        # re-print primary (merged) as the FINAL line: the driver parses the
        # last JSON line, which must be the headline eval metric either way
        emit(primary)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    # 100 chain iterations amortize the single ~25 ms tunnel dispatch to
    # ~0.25 ms/batch (skeleton-ablation-measured); inputs are derived
    # in-body so K no longer costs HBM. p50 loops just get better stats.
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--query-hw", type=int, nargs=2, default=(832, 1216))
    p.add_argument("--supp-hw", type=int, nargs=2, default=(416, 416))
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--mode", default="all",
                   choices=["all", "eval", "train", "latency", "eval_cached",
                            "serving", "multiclass"])
    p.add_argument("--multiclass-s", type=int, default=20,
                   help="S for the multiclass stage: cached support classes "
                        "amortizing one query backbone pass (20 = the COCO "
                        "few-shot test-class split size)")
    p.add_argument("--stages", default=DEFAULT_STAGES,
                   help="comma list for --mode all (subset/reorder of "
                        f"{DEFAULT_STAGES})")
    p.add_argument("--min-stage-s", type=float,
                   default=float(os.environ.get("ONESHOT_BENCH_MIN_LAUNCH_S", "60")),
                   help="minimum remaining budget to start a secondary stage")
    p.add_argument("--roi-topk", type=int, default=0,
                   help="TPU.EVAL_ROI_TOPK: keep only top-K stage-1 "
                        "proposals for stage 2 (opt-in workload cut; "
                        "single-mode runs only — mode all fixes the preset)")
    p.add_argument("--quant", default="none", choices=["none", "int8", "int8_weight"],
                   help="TPU.QUANT (single-mode runs only): int8 = dynamic "
                        "activation+weight conv stack (measured REGRESSION "
                        "on v5e, round 3); int8_weight = static per-channel "
                        "weight-only")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for smoke runs; "
                        "env vars are too late once sitecustomize imports jax)")
    args = p.parse_args()

    _configure_jax(args)

    if args.mode == "all":
        run_all(args)
        return

    import jax

    c = _make_cfg(args)
    if args.mode == "train":
        run_train_stage(c, args)
        return

    from oneshotdet_tpu.models import build_detection_model

    if c.TPU.QUANT == "none":
        variables = _variables_on_device(build_detection_model(c), args)
    else:
        variables = _init_eval_variables(build_detection_model(c), args,
                                         quant=c.TPU.QUANT)
        if c.TPU.QUANT == "int8_weight":
            # offline weight-only transform: int8 kernels + per-cout scales
            # go to the device; weight HBM traffic halves (ops/quant.py)
            from oneshotdet_tpu.ops.quant import quantize_weights_int8
            variables = quantize_weights_int8(variables)
        variables = jax.device_put(variables, jax.devices()[0])
    if args.mode == "eval":
        run_eval_stage(c, args, variables)
    elif args.mode == "latency":
        run_latency_stage(c, args, variables)
    elif args.mode == "eval_cached":
        run_eval_cached_stage(c, args, variables)
    elif args.mode == "multiclass":
        run_multiclass_stage(c, args, variables)
    elif args.mode == "serving":
        run_serving_stage(c, args, variables)


if __name__ == "__main__":
    main()
