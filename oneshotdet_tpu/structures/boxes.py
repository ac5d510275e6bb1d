"""Padded, fixed-capacity box containers and box ops (TPU-native BoxList).

The reference's ``BoxList`` (maskrcnn_benchmark/structures/bounding_box.py) is
a dynamic container of N boxes + arbitrary fields. Dynamic N does not compile
on TPU, so this module uses *padded* arrays with validity masks:

    xyxy:  (..., K, 4) float   boxes, 'xyxy' pixel coords
    valid: (..., K)    bool    which slots hold real boxes

All semantics preserve the reference's legacy ``TO_REMOVE = 1`` pixel
convention (bounding_box.py:67,80,145,215,229; boxlist_ops.py:221-266):
width = x2 - x1 + 1, and IoU uses the same +1 extents.

Everything here is pure jnp and shape-static; it works under jit/vmap/pjit.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

TO_REMOVE = 1.0  # legacy pixel convention, see module docstring


@struct.dataclass
class Boxes:
    """A fixed-capacity set of boxes for one image (or a batch of images).

    Attributes:
      xyxy: (..., K, 4) box corners in xyxy mode.
      valid: (..., K) bool mask of live slots.
      size: (..., 2) image (width, height) — matches BoxList.size ordering.
      fields: dict of per-box arrays, each shaped (..., K) or (..., K, D).
    """

    xyxy: jnp.ndarray
    valid: jnp.ndarray
    size: jnp.ndarray
    fields: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)

    @property
    def capacity(self) -> int:
        return self.xyxy.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def get_field(self, name: str) -> jnp.ndarray:
        return self.fields[name]

    def with_field(self, name: str, value: jnp.ndarray) -> "Boxes":
        new = dict(self.fields)
        new[name] = value
        return self.replace(fields=new)

    # -- geometry ---------------------------------------------------------

    def area(self) -> jnp.ndarray:
        """Box areas with the +1 convention (bounding_box.py:226-233)."""
        return box_area(self.xyxy)

    def clip_to_image(self) -> "Boxes":
        """Clamp coordinates to [0, size - 1] (bounding_box.py:214-224)."""
        w = self.size[..., 0:1]
        h = self.size[..., 1:2]
        x1 = jnp.clip(self.xyxy[..., 0], 0, w - TO_REMOVE)
        y1 = jnp.clip(self.xyxy[..., 1], 0, h - TO_REMOVE)
        x2 = jnp.clip(self.xyxy[..., 2], 0, w - TO_REMOVE)
        y2 = jnp.clip(self.xyxy[..., 3], 0, h - TO_REMOVE)
        return self.replace(xyxy=jnp.stack([x1, y1, x2, y2], axis=-1))

    def resize(self, new_size: jnp.ndarray) -> "Boxes":
        """Rescale boxes to a new image size (bounding_box.py:91-127)."""
        new_size = jnp.asarray(new_size, self.xyxy.dtype)
        ratio = new_size / self.size  # (..., 2) = (rw, rh)
        rw = ratio[..., 0:1]
        rh = ratio[..., 1:2]
        xyxy = jnp.stack(
            [
                self.xyxy[..., 0] * rw,
                self.xyxy[..., 1] * rh,
                self.xyxy[..., 2] * rw,
                self.xyxy[..., 3] * rh,
            ],
            axis=-1,
        )
        return self.replace(xyxy=xyxy, size=jnp.broadcast_to(new_size, self.size.shape))

    def transpose_flip_lr(self) -> "Boxes":
        """Horizontal flip (bounding_box.py:129-165, FLIP_LEFT_RIGHT path)."""
        w = self.size[..., 0:1]
        x1 = w - self.xyxy[..., 2] - TO_REMOVE
        x2 = w - self.xyxy[..., 0] - TO_REMOVE
        xyxy = jnp.stack([x1, self.xyxy[..., 1], x2, self.xyxy[..., 3]], axis=-1)
        return self.replace(xyxy=xyxy)

    def remove_small(self, min_size: float) -> "Boxes":
        """Invalidate boxes smaller than min_size (boxlist_ops.py:202-218)."""
        ws = self.xyxy[..., 2] - self.xyxy[..., 0] + TO_REMOVE
        hs = self.xyxy[..., 3] - self.xyxy[..., 1] + TO_REMOVE
        keep = (ws >= min_size) & (hs >= min_size)
        return self.replace(valid=self.valid & keep)

    # -- conversions --------------------------------------------------------

    def to_xywh(self) -> jnp.ndarray:
        """xywh view with the +1 convention (bounding_box.py:55-88)."""
        x1, y1, x2, y2 = jnp.split(self.xyxy, 4, axis=-1)
        return jnp.concatenate(
            [x1, y1, x2 - x1 + TO_REMOVE, y2 - y1 + TO_REMOVE], axis=-1
        )

    @staticmethod
    def from_xywh(xywh: jnp.ndarray, valid, size, fields=None) -> "Boxes":
        x, y, w, h = jnp.split(jnp.asarray(xywh, jnp.float32), 4, axis=-1)
        xyxy = jnp.concatenate(
            [x, y, x + jnp.maximum(w - TO_REMOVE, 0.0), y + jnp.maximum(h - TO_REMOVE, 0.0)],
            axis=-1,
        )
        return Boxes(
            xyxy=xyxy,
            valid=jnp.asarray(valid, bool),
            size=jnp.asarray(size, jnp.float32),
            fields=fields or {},
        )


def box_area(xyxy: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (...) areas under the +1 convention."""
    w = xyxy[..., 2] - xyxy[..., 0] + TO_REMOVE
    h = xyxy[..., 3] - xyxy[..., 1] + TO_REMOVE
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between (..., M, 4) and (..., N, 4) -> (..., M, N).

    Matches boxlist_iou (structures/boxlist_ops.py:221-266) including the
    TO_REMOVE=1 extents.
    """
    area_a = box_area(a)[..., :, None]  # (..., M, 1)
    area_b = box_area(b)[..., None, :]  # (..., 1, N)
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])  # (..., M, N, 2)
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a + area_b - inter)


def masked_box_iou(
    a: jnp.ndarray, a_valid: jnp.ndarray, b: jnp.ndarray, b_valid: jnp.ndarray
) -> jnp.ndarray:
    """box_iou with invalid rows/cols zeroed out."""
    iou = box_iou(a, b)
    mask = a_valid[..., :, None] & b_valid[..., None, :]
    return jnp.where(mask, iou, 0.0)


def cat_boxes(a: Boxes, b: Boxes) -> Boxes:
    """Concatenate two Boxes along the capacity axis (boxlist_ops.py:270-297).

    Fields present in both are concatenated; others dropped.
    """
    k_axis = a.valid.ndim - 1  # index of the capacity axis
    xyxy = jnp.concatenate([a.xyxy, b.xyxy], axis=-2)
    valid = jnp.concatenate([a.valid, b.valid], axis=-1)
    fields = {}
    for k in a.fields:
        if k in b.fields:
            fields[k] = jnp.concatenate([a.fields[k], b.fields[k]], axis=k_axis)
    return Boxes(xyxy=xyxy, valid=valid, size=a.size, fields=fields)


def compact_boxes(boxes: Boxes, out_capacity: int | None = None) -> Boxes:
    """Stable-sort valid boxes to the front (analog of boolean-mask gather).

    Replaces the reference's dynamic `boxlist[keep]` indexing: instead of
    shrinking the array we move live slots first, so downstream fixed-K ops
    see a dense prefix. Optionally truncates to ``out_capacity``.
    """
    order = jnp.argsort(~boxes.valid, axis=-1, stable=True)

    def take(x, axis):
        return jnp.take_along_axis(
            x, order.reshape(order.shape + (1,) * (x.ndim - order.ndim)), axis=axis
        )

    k_axis = boxes.valid.ndim - 1
    xyxy = take(boxes.xyxy, k_axis)
    valid = jnp.take_along_axis(boxes.valid, order, axis=-1)
    fields = {k: take(v, k_axis) if v.ndim > valid.ndim else jnp.take_along_axis(v, order, axis=-1)
              for k, v in boxes.fields.items()}
    out = Boxes(xyxy=xyxy, valid=valid, size=boxes.size, fields=fields)
    if out_capacity is not None and out_capacity != out.capacity:
        def trunc(x):
            # slice the capacity axis, which sits at `k_axis` for every array
            idx = [slice(None)] * x.ndim
            idx[k_axis] = slice(0, out_capacity)
            return x[tuple(idx)]

        out = Boxes(
            xyxy=trunc(out.xyxy),
            valid=trunc(out.valid),
            size=out.size,
            fields={k: trunc(v) for k, v in out.fields.items()},
        )
    return out
