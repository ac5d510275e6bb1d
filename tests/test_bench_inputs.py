"""Unit tests for bench.py's device-side input generation (round 5).

The bench harness no longer uploads large buffers through the device
tunnel (upload speed swings 0.3-33 MB/s day to day): eval input bases are
jax.random-generated on device and train episode pixels are generated +
GT-painted on device (`_paint_episodes`). These tests pin the content
semantics that make those inputs equivalent to the host-built ones
(utils/synthetic.py::make_episodic_batch, mirroring the reference's
episodic batch content — /root/reference .../data/datasets/coco.py:296-363
support crops + collate_batch.py:15-42):

  - painted query pixels carry a bright color block exactly inside each
    valid GT box (what FCOS/ROI training fits against)
  - the support crop's center carries the same per-episode color
  - _FreshBatches.device() yields distinct content per call with the
    s2d'd shape of the host path
  - _stacked_episodes has the exact key set / shapes / dtypes of a stacked
    make_episodic_batch (the trainchain traced-program signature)
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from oneshotdet_tpu.utils.synthetic import make_episodic_batch  # noqa: E402


def test_paint_episodes_blocks_match_gt():
    K, b, qh, qw, sh, sw = 2, 2, 64, 96, 32, 32
    gt = np.zeros((K, b, 4, 4), np.float32)
    valid = np.zeros((K, b, 4), bool)
    gt[0, 0, 0] = (8, 8, 23, 19)
    valid[0, 0, 0] = True
    gt[1, 1, 0] = (40, 16, 79, 47)
    valid[1, 1, 0] = True
    q, s = bench._paint_episodes((K, b, qh, qw), (K, b, sh, sw),
                                 jnp.asarray(gt), jnp.asarray(valid), seed=7)
    q = np.asarray(q)
    # inside the box: color (>=50) + 0.5*noise -> mean well above noise
    inside = q[0, 0, 8:20, 8:24].mean()
    outside = q[0, 0, 30:, 30:].mean()
    assert inside > 40.0, inside
    assert abs(outside) < 5.0, outside
    # second episode's box painted in its own (K, b) slot only
    assert q[1, 1, 16:48, 40:80].mean() > 40.0
    assert abs(q[1, 0, 16:48, 40:80].mean()) < 5.0
    # support center carries a color block, border stays noise
    s = np.asarray(s)
    assert s[0, 0, 8:-8, 8:-8].mean() > 40.0
    assert abs(s[0, 0, :4].mean()) < 5.0


def test_stacked_episodes_signature_matches_host_stacking():
    K, b, max_gt = 2, 2, 6
    qhw, shw = (64, 96), (32, 32)
    dev = bench._stacked_episodes(b, qhw, shw, K, max_gt, seed=11)
    ref = [make_episodic_batch(b, qhw, shw, max_gt=max_gt, seed=100 + i)
           for i in range(K)]
    host = {k: np.stack([r[k] for r in ref]) for k in ref[0]
            if k not in ("img_ids", "idxs")}
    assert set(dev) == set(host), (set(dev), set(host))
    for k in host:
        assert dev[k].shape == host[k].shape, (k, dev[k].shape, host[k].shape)
        assert dev[k].dtype == host[k].dtype, (k, dev[k].dtype, host[k].dtype)
    # boxes live inside the image and valid boxes are painted
    gt = np.asarray(dev["gt_xyxy"])
    vm = np.asarray(dev["gt_valid"])
    assert (gt[vm][:, 2] < qhw[1]).all() and (gt[vm][:, 3] < qhw[0]).all()
    q = np.asarray(dev["query_pixels"])
    k0, b0, g0 = [int(x[0]) for x in np.nonzero(vm)][:3]
    x1, y1, x2, y2 = gt[k0, b0, g0].astype(int)
    assert q[k0, b0, y1:y2 + 1, x1:x2 + 1].mean() > 30.0


def test_fresh_batches_device_shape_and_freshness():
    fb = bench._FreshBatches((2, 32, 48, 3))
    a = np.asarray(fb.device())
    bb = np.asarray(fb.device())
    assert a.shape == fb.host().shape  # s2d'd shape parity with host path
    assert not np.array_equal(a, bb)  # never-seen content per call
    assert abs(float(a.mean())) < 0.2 and 0.5 < float(a.std()) < 2.0
