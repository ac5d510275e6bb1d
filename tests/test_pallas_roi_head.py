"""Interpret-mode parity for the fused Pallas ROI box-head kernel.

The kernel (ops/pallas_roi_head.py) replaces the XLA ROIBoxHeadNet chain on
the eval path (box_head.py:43-76,147-155 semantics). On CPU it runs under
pallas interpret mode; on-chip parity + timing live in tools/tune_roi_head.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oneshotdet_tpu.models.roi_head import ROIBoxHeadNet
from oneshotdet_tpu.ops.pallas_roi_head import (
    _pick_t,
    pallas_roi_head,
    roi_head_params_from_module,
)


def _setup(b=2, p=16, c=256, seed=0):
    head = ROIBoxHeadNet(in_channels=c, num_classes=2, num_bbox_reg=2)
    rr = np.random.RandomState(seed)
    roi = jnp.asarray(rr.randn(b * p, 7, 7, c).astype(np.float32))
    s7 = jnp.asarray(rr.randn(b, 7, 7, c).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), roi, s7)
    return head, variables, roi, s7


def test_fused_head_matches_xla_module():
    head, variables, roi, s7 = _setup()
    ref_l, ref_d = head.apply(variables, roi, s7)
    got_l, got_d = pallas_roi_head(
        roi, s7, roi_head_params_from_module(variables["params"]),
        per_image=16, interpret=True)
    # bound = the XLA module's own f32 noise (see tools/tune_roi_head.py)
    np.testing.assert_allclose(got_l, ref_l, atol=5e-3)
    np.testing.assert_allclose(got_d, ref_d, atol=5e-3)


def test_fused_head_multi_image_support_rows():
    # per-image support: blocks of ROIs must pick up THEIR image's support
    head, variables, roi, s7 = _setup(b=4, p=8)
    ref_l, _ = head.apply(variables, roi, s7)
    got_l, _ = pallas_roi_head(
        roi, s7, roi_head_params_from_module(variables["params"]),
        per_image=8, interpret=True)
    np.testing.assert_allclose(got_l, ref_l, atol=5e-3)
    # sanity: supports actually differ per image (swap changes outputs)
    s7_swapped = s7[::-1]
    swp_l, _ = pallas_roi_head(
        roi, s7_swapped, roi_head_params_from_module(variables["params"]),
        per_image=8, interpret=True)
    assert float(jnp.abs(swp_l - got_l).max()) > 1e-3


@pytest.mark.parametrize("p,expect", [(2000, 200), (16, 16), (24, 24),
                                      (28, 0), (7, 0), (4, 0)])
def test_pick_t(p, expect):
    assert _pick_t(p) == expect
