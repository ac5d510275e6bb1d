#!/usr/bin/env python
"""Fused ROI-head kernel: parity vs the flax module + timing vs XLA."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from oneshotdet_tpu.models.roi_head import ROIBoxHeadNet
    from oneshotdet_tpu.ops.pallas_roi_head import (
        pallas_roi_head,
        roi_head_params_from_module,
    )

    b, p, c = 8, 2000, 256
    iters, warmup = 8, 2
    n = iters + warmup + 1

    head = ROIBoxHeadNet(in_channels=c, num_classes=2, num_bbox_reg=2)
    rr = np.random.RandomState(0)
    roi_small = jnp.asarray(rr.randn(16, 7, 7, c).astype(np.float32))
    s7_small = jnp.asarray(rr.randn(2, 7, 7, c).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), roi_small, s7_small)
    w = roi_head_params_from_module(variables["params"])

    ablate = os.environ.get("ONESHOT_ROI_HEAD_ABLATE", "")
    if ablate:
        print(f"ABLATION MODE {ablate!r}: skipping parity", flush=True)

    if not ablate:
        # ---- parity (f32, small) ----------------------------------------------
        # NOTE the f32 XLA module is itself ~1.4e-3 from a f64 reference on this
        # case (measured on CPU with jax_enable_x64); the kernel is ~4e-4 from
        # f64 — i.e. MORE accurate (two-pass GN variance + HIGHEST matmuls). The
        # kernel-vs-module bound below is therefore the module's own f32 noise.
        ref_l, ref_d = head.apply(variables, roi_small, s7_small)
        got_l, got_d = pallas_roi_head(roi_small, s7_small, w, per_image=8)
        dl = float(jnp.abs(got_l - ref_l).max())
        dd = float(jnp.abs(got_d - ref_d).max())
        print(f"head parity f32: logits max|d|={dl:.3e} deltas max|d|={dd:.3e}",
              flush=True)
        assert dl < 5e-3 and dd < 5e-3, (dl, dd)

        # ---- bf16 parity sanity (loose) ---------------------------------------
        head16 = ROIBoxHeadNet(in_channels=c, num_classes=2, num_bbox_reg=2,
                               dtype=jnp.bfloat16)
        ref16 = head16.apply(variables, roi_small.astype(jnp.bfloat16),
                             s7_small.astype(jnp.bfloat16))
        got16 = pallas_roi_head(roi_small.astype(jnp.bfloat16),
                                s7_small.astype(jnp.bfloat16), w, per_image=8)
        d16 = float(jnp.abs(got16[0] - ref16[0]).max())
        print(f"head parity bf16: logits max|d|={d16:.3e}", flush=True)

    # ---- timing at production shapes --------------------------------------
    def make(seed):
        g = np.random.RandomState(seed)
        return (
            jnp.asarray(g.randn(b * p, 7, 7, c).astype(np.float32)).astype(jnp.bfloat16),
            jnp.asarray(g.randn(b, 7, 7, c).astype(np.float32)).astype(jnp.bfloat16),
        )

    inputs = [make(900 + i) for i in range(n)]

    # Weights MUST be jit arguments, not closures: closing over them bakes
    # the 25.7 MB fc6 matrix into the program as a constant literal (32.7 MB
    # MLIR), which OOM-kills the remote compile helper.
    def bench(name, fn, wt):
        f = jax.jit(lambda w_, x_, s_: sum(
            o.astype(jnp.float32).sum() for o in fn(w_, x_, s_)))
        out = f(wt, *inputs[0]); _ = float(out)
        for i in range(warmup):
            out = f(wt, *inputs[1 + i])
        _ = float(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(wt, *inputs[warmup + 1 + i])
        _ = float(out)
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:10s} {ms:7.2f} ms/batch ({ms / (b*p) * 1000:.2f} us/ROI)",
              flush=True)

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("xla", "both"):
        bench("xla", lambda v_, x_, s_: head16.apply(v_, x_, s_), variables)
    if which in ("pallas", "both"):
        bench("pallas",
              lambda w_, x_, s_: pallas_roi_head(x_, s_, w_, per_image=p), w)


if __name__ == "__main__":
    main()
