"""Keypoint containers (reference: structures/keypoint.py).

Present-but-unused in one-shot configs (SURVEY §2.2); kept for API parity.
Keypoints are (N, K, 3) arrays of (x, y, visibility).
"""

from __future__ import annotations

import numpy as np

FLIP_LEFT_RIGHT = 0


class Keypoints:
    def __init__(self, keypoints, size):
        kp = np.asarray(keypoints, np.float32)
        if kp.ndim == 2:
            kp = kp.reshape(kp.shape[0], -1, 3)
        self.keypoints = kp
        self.size = tuple(size)

    FLIP_INDS: list = []  # subclass provides the left/right swap map

    def resize(self, size):
        rw = size[0] / self.size[0]
        rh = size[1] / self.size[1]
        kp = self.keypoints.copy()
        kp[..., 0] *= rw
        kp[..., 1] *= rh
        out = type(self)(kp, size)
        return out

    def transpose(self, method):
        if method != FLIP_LEFT_RIGHT:
            raise NotImplementedError("only FLIP_LEFT_RIGHT is supported")
        flip_inds = type(self).FLIP_INDS or list(range(self.keypoints.shape[1]))
        w = self.size[0]
        kp = self.keypoints[:, flip_inds].copy()
        kp[..., 0] = w - kp[..., 0] - 1
        # maintain COCO convention: invisible keypoints stay at 0
        kp[..., 0] = np.where(kp[..., 2] == 0, 0.0, kp[..., 0])
        return type(self)(kp, self.size)

    def crop(self, box):
        x1, y1 = float(box[0]), float(box[1])
        w = float(box[2]) - x1
        h = float(box[3]) - y1
        kp = self.keypoints.copy()
        kp[..., 0] = np.clip(kp[..., 0] - x1, 0, w)
        kp[..., 1] = np.clip(kp[..., 1] - y1, 0, h)
        return type(self)(kp, (w, h))

    def __len__(self):
        return len(self.keypoints)

    def __getitem__(self, idx):
        if isinstance(idx, int):
            idx = [idx]
        return type(self)(self.keypoints[np.asarray(idx)], self.size)


PERSON_KEYPOINT_NAMES = (
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
)


def _person_flip_inds():
    flip_map = {}
    for i, name in enumerate(PERSON_KEYPOINT_NAMES):
        if name.startswith("left_"):
            flip_map[i] = PERSON_KEYPOINT_NAMES.index("right_" + name[5:])
        elif name.startswith("right_"):
            flip_map[i] = PERSON_KEYPOINT_NAMES.index("left_" + name[6:])
        else:
            flip_map[i] = i
    return [flip_map[i] for i in range(len(PERSON_KEYPOINT_NAMES))]


class PersonKeypoints(Keypoints):
    NAMES = PERSON_KEYPOINT_NAMES
    FLIP_INDS = _person_flip_inds()
