"""Segmentation mask containers (reference: structures/segmentation_mask.py).

The reference ships polygon + binary mask containers used only when
MODEL.MASK_ON (off in every one-shot config, SURVEY §2.2). This module keeps
the same API surface in a TPU-friendly form:

  - PolygonInstance / PolygonList: host-side polygon lists with
    resize/transpose/crop and rasterization to fixed-size binary masks;
  - BinaryMaskList: padded (N, H, W) device arrays with the same ops;
  - SegmentationMask: mode-dispatching wrapper ('poly' | 'mask').

Rasterization uses PIL (no pycocotools RLE in this image); RLE-encoded
inputs are decoded with a minimal uncompressed-RLE decoder.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np
from PIL import Image, ImageDraw

FLIP_LEFT_RIGHT = 0
FLIP_TOP_BOTTOM = 1


def _decode_uncompressed_rle(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    counts = rle["counts"]
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for c in counts:
        flat[pos:pos + c] = val
        pos += c
        val = 1 - val
    return flat.reshape(w, h).T  # COCO RLE is column-major


class PolygonInstance:
    """One object's polygons: list of [x0, y0, x1, y1, ...] lists."""

    def __init__(self, polygons: Sequence, size):
        if isinstance(polygons, PolygonInstance):
            polygons = [p.copy() for p in polygons.polygons]
        else:
            polygons = [np.asarray(p, np.float64).reshape(-1) for p in polygons]
        self.polygons = polygons
        self.size = tuple(size)  # (w, h)

    def transpose(self, method: int) -> "PolygonInstance":
        w, h = self.size
        flipped = []
        for p in self.polygons:
            p = p.copy()
            if method == FLIP_LEFT_RIGHT:
                p[0::2] = w - p[0::2] - 1
            else:
                p[1::2] = h - p[1::2] - 1
            flipped.append(p)
        return PolygonInstance(flipped, self.size)

    def crop(self, box) -> "PolygonInstance":
        x1, y1, x2, y2 = map(float, box)
        w, h = x2 - x1, y2 - y1
        cropped = []
        for p in self.polygons:
            p = p.copy()
            p[0::2] = np.clip(p[0::2] - x1, 0, w)
            p[1::2] = np.clip(p[1::2] - y1, 0, h)
            cropped.append(p)
        return PolygonInstance(cropped, (w, h))

    def resize(self, size) -> "PolygonInstance":
        rw = size[0] / self.size[0]
        rh = size[1] / self.size[1]
        out = []
        for p in self.polygons:
            p = p.copy()
            p[0::2] *= rw
            p[1::2] *= rh
            out.append(p)
        return PolygonInstance(out, size)

    def rasterize(self) -> np.ndarray:
        w, h = int(round(self.size[0])), int(round(self.size[1]))
        img = Image.new("L", (max(w, 1), max(h, 1)), 0)
        draw = ImageDraw.Draw(img)
        for p in self.polygons:
            if len(p) >= 6:
                draw.polygon([tuple(xy) for xy in p.reshape(-1, 2)], outline=1, fill=1)
        return np.asarray(img, np.uint8)

    def __len__(self):
        return len(self.polygons)


class PolygonList:
    def __init__(self, polygons: Sequence, size):
        self.instances = [
            p if isinstance(p, PolygonInstance) else PolygonInstance(p, size)
            for p in polygons
        ]
        self.size = tuple(size)

    def transpose(self, method):
        return PolygonList([i.transpose(method) for i in self.instances], self.size)

    def crop(self, box):
        w = box[2] - box[0]
        h = box[3] - box[1]
        return PolygonList([i.crop(box) for i in self.instances], (w, h))

    def resize(self, size):
        return PolygonList([i.resize(size) for i in self.instances], size)

    def convert_to_binarymask(self) -> "BinaryMaskList":
        if self.instances:
            masks = np.stack([i.rasterize() for i in self.instances])
        else:
            w, h = self.size
            masks = np.zeros((0, int(h), int(w)), np.uint8)
        return BinaryMaskList(masks, self.size)

    def __len__(self):
        return len(self.instances)

    def __getitem__(self, idx):
        if isinstance(idx, int):
            return PolygonList([self.instances[idx]], self.size)
        return PolygonList([self.instances[i] for i in idx], self.size)

    def __iter__(self):
        return iter(self.instances)


class BinaryMaskList:
    """(N, H, W) uint8 masks."""

    def __init__(self, masks: Union[np.ndarray, Sequence, dict], size):
        if isinstance(masks, dict):  # single RLE
            masks = _decode_uncompressed_rle(masks)[None]
        masks = np.asarray(masks, np.uint8)
        if masks.ndim == 2:
            masks = masks[None]
        self.masks = masks
        self.size = tuple(size)

    def transpose(self, method):
        axis = 2 if method == FLIP_LEFT_RIGHT else 1
        return BinaryMaskList(np.flip(self.masks, axis=axis).copy(), self.size)

    def crop(self, box):
        x1, y1, x2, y2 = [int(round(float(b))) for b in box]
        cropped = self.masks[:, max(y1, 0):y2 + 1, max(x1, 0):x2 + 1]
        return BinaryMaskList(cropped, (max(x2 - x1, 1), max(y2 - y1, 1)))

    def resize(self, size):
        w, h = int(size[0]), int(size[1])
        out = np.stack([
            np.asarray(Image.fromarray(m).resize((w, h), Image.NEAREST))
            for m in self.masks
        ]) if len(self.masks) else np.zeros((0, h, w), np.uint8)
        return BinaryMaskList(out, size)

    def __len__(self):
        return len(self.masks)

    def __getitem__(self, idx):
        if isinstance(idx, int):
            return BinaryMaskList(self.masks[idx:idx + 1], self.size)
        return BinaryMaskList(self.masks[np.asarray(idx)], self.size)


class SegmentationMask:
    """Mode-dispatching wrapper (segmentation_mask.py:436+)."""

    def __init__(self, instances, size, mode: str = "poly"):
        assert mode in ("poly", "mask")
        if mode == "poly":
            self.instances = (
                instances if isinstance(instances, PolygonList)
                else PolygonList(instances, size)
            )
        else:
            self.instances = (
                instances if isinstance(instances, BinaryMaskList)
                else BinaryMaskList(instances, size)
            )
        self.mode = mode
        self.size = tuple(size)

    def transpose(self, method):
        return SegmentationMask(self.instances.transpose(method), self.size, self.mode)

    def crop(self, box):
        inst = self.instances.crop(box)
        return SegmentationMask(inst, inst.size, self.mode)

    def resize(self, size):
        return SegmentationMask(self.instances.resize(size), size, self.mode)

    def convert(self, mode: str) -> "SegmentationMask":
        if mode == self.mode:
            return self
        assert self.mode == "poly" and mode == "mask"
        return SegmentationMask(self.instances.convert_to_binarymask(), self.size, "mask")

    def __len__(self):
        return len(self.instances)

    def __getitem__(self, idx):
        return SegmentationMask(self.instances[idx], self.size, self.mode)
