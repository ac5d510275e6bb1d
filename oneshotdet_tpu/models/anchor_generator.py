"""Anchor generation (reference: modeling/rpn/anchor_generator.py).

Grid anchors per FPN level from base sizes x aspect ratios, with the
Caffe2-convention anchor construction (centered on (stride-1)/2, w/h from
sqrt-area rounding) and straddle visibility (anchors crossing the image
border more than STRADDLE_THRESH are marked invisible,
anchor_generator.py:142).

Everything is static-shape: anchors per level are (H*W*A, 4) arrays and
visibility is a mask, computed inside jit.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def generate_cell_anchors(stride: int, sizes: Sequence[float],
                          aspect_ratios: Sequence[float]) -> np.ndarray:
    """(A, 4) anchors for one cell — Caffe2 _generate_anchors convention:
    base box [0, 0, stride-1, stride-1], ratio enum with rounding, scale
    enum about the center."""
    base = np.array([1, 1, stride, stride], np.float64) - 1
    anchors = _ratio_enum(base, np.asarray(aspect_ratios, np.float64))
    anchors = np.vstack(
        [_scale_enum(anchors[i, :], np.asarray(sizes, np.float64) / stride)
         for i in range(anchors.shape[0])]
    )
    return anchors.astype(np.float32)


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    x_ctr = anchor[0] + 0.5 * (w - 1)
    y_ctr = anchor[1] + 0.5 * (h - 1)
    return w, h, x_ctr, y_ctr


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack(
        (
            x_ctr - 0.5 * (ws - 1),
            y_ctr - 0.5 * (hs - 1),
            x_ctr + 0.5 * (ws - 1),
            y_ctr + 0.5 * (hs - 1),
        )
    )


def _ratio_enum(anchor, ratios):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    size = w * h
    size_ratios = size / ratios
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * ratios)
    return _mkanchors(ws, hs, x_ctr, y_ctr)


def _scale_enum(anchor, scales):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    ws = w * scales
    hs = h * scales
    return _mkanchors(ws, hs, x_ctr, y_ctr)


class AnchorGenerator:
    """Per-level grid anchors + straddle visibility."""

    def __init__(
        self,
        sizes: Sequence[float] = (32, 64, 128, 256, 512),
        aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
        anchor_strides: Sequence[int] = (8, 16, 32, 64, 128),
        straddle_thresh: float = 0.0,
        sizes_per_level: bool = True,
    ):
        if sizes_per_level:
            assert len(sizes) == len(anchor_strides)
            self.cell_anchors = [
                generate_cell_anchors(s, (size,), aspect_ratios)
                for s, size in zip(anchor_strides, sizes)
            ]
        else:  # single-level RPN: all sizes at one stride
            assert len(anchor_strides) == 1
            self.cell_anchors = [
                generate_cell_anchors(anchor_strides[0], sizes, aspect_ratios)
            ]
        self.strides = tuple(anchor_strides)
        self.straddle_thresh = straddle_thresh

    @property
    def num_anchors_per_location(self) -> List[int]:
        return [a.shape[0] for a in self.cell_anchors]

    def grid_anchors(self, feature_shapes: Sequence[Tuple[int, int]]):
        """[(H*W*A, 4)] per level, jnp arrays."""
        out = []
        for (h, w), stride, cell in zip(feature_shapes, self.strides, self.cell_anchors):
            shift_x = jnp.arange(w, dtype=jnp.float32) * stride
            shift_y = jnp.arange(h, dtype=jnp.float32) * stride
            sy, sx = jnp.meshgrid(shift_y, shift_x, indexing="ij")
            shifts = jnp.stack(
                [sx.reshape(-1), sy.reshape(-1), sx.reshape(-1), sy.reshape(-1)], axis=1
            )  # (H*W, 4)
            a = shifts[:, None, :] + jnp.asarray(cell)[None, :, :]
            out.append(a.reshape(-1, 4))
        return out

    def visibility(self, anchors: jnp.ndarray, image_size_wh) -> jnp.ndarray:
        """Straddle mask (anchor_generator.py add_visibility_to)."""
        if self.straddle_thresh < 0:
            return jnp.ones(anchors.shape[0], bool)
        w, h = image_size_wh
        t = self.straddle_thresh
        return (
            (anchors[:, 0] >= -t)
            & (anchors[:, 1] >= -t)
            & (anchors[:, 2] < w + t)
            & (anchors[:, 3] < h + t)
        )


def make_anchor_generator(cfg) -> AnchorGenerator:
    """Classic RPN anchors (anchor_generator.py:96-143)."""
    if cfg.MODEL.RPN.USE_FPN:
        assert len(cfg.MODEL.RPN.ANCHOR_STRIDE) == len(cfg.MODEL.RPN.ANCHOR_SIZES)
        return AnchorGenerator(
            cfg.MODEL.RPN.ANCHOR_SIZES,
            cfg.MODEL.RPN.ASPECT_RATIOS,
            cfg.MODEL.RPN.ANCHOR_STRIDE,
            cfg.MODEL.RPN.STRADDLE_THRESH,
            sizes_per_level=True,
        )
    return AnchorGenerator(
        cfg.MODEL.RPN.ANCHOR_SIZES,
        cfg.MODEL.RPN.ASPECT_RATIOS,
        cfg.MODEL.RPN.ANCHOR_STRIDE,
        cfg.MODEL.RPN.STRADDLE_THRESH,
        sizes_per_level=False,
    )


def make_anchor_generator_retinanet(cfg) -> AnchorGenerator:
    """RetinaNet anchors: octave scales per level (anchor_generator.py:146)."""
    octave = cfg.MODEL.RETINANET.OCTAVE
    scales_per_octave = cfg.MODEL.RETINANET.SCALES_PER_OCTAVE
    strides = cfg.MODEL.RETINANET.ANCHOR_STRIDES
    ratios = cfg.MODEL.RETINANET.ASPECT_RATIOS
    cell_anchors = []
    for stride, size in zip(strides, cfg.MODEL.RETINANET.ANCHOR_SIZES):
        per_level = []
        for i in range(scales_per_octave):
            per_level.append(size * octave ** (i / scales_per_octave))
        cell_anchors.append(generate_cell_anchors(stride, per_level, ratios))
    gen = AnchorGenerator.__new__(AnchorGenerator)
    gen.cell_anchors = cell_anchors
    gen.strides = tuple(strides)
    gen.straddle_thresh = cfg.MODEL.RETINANET.STRADDLE_THRESH
    return gen
