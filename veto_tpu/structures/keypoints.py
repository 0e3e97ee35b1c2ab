"""Keypoint containers + heatmap projection, numpy/jax-native.

Rebuild of the reference Keypoints / PersonKeypoints
(reference structures/keypoint.py:1-188): an (N, K, 3) [x, y, visibility]
array with resize / horizontal-flip semantics, and the C2-derived
``keypoints_to_heat_map`` projection used by the keypoint loss — here a
pure vectorized function that is jittable (static shapes, no host loop).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

FLIP_LEFT_RIGHT = 0
FLIP_TOP_BOTTOM = 1

__all__ = ["Keypoints", "PersonKeypoints", "keypoints_to_heat_map",
           "kp_connections"]


class Keypoints:
    """(N, K, 3) keypoints for one image (reference keypoint.py:8-86)."""

    FLIP_INDS: np.ndarray = np.arange(0)  # subclasses define

    def __init__(self, keypoints, size: Tuple[int, int], mode=None):
        keypoints = np.asarray(keypoints, np.float32)
        if keypoints.size:
            keypoints = keypoints.reshape(keypoints.shape[0], -1, 3)
        self.keypoints = keypoints
        self.size = tuple(size)
        self.mode = mode
        self.extra_fields: Dict[str, object] = {}

    def crop(self, box):
        raise NotImplementedError()

    def resize(self, size, *args, **kwargs) -> "Keypoints":
        ratio_w = float(size[0]) / float(self.size[0])
        ratio_h = float(size[1]) / float(self.size[1])
        data = self.keypoints.copy()
        data[..., 0] *= ratio_w
        data[..., 1] *= ratio_h
        out = type(self)(data, size, self.mode)
        for k, v in self.extra_fields.items():
            out.add_field(k, v)
        return out

    def transpose(self, method: int) -> "Keypoints":
        if method != FLIP_LEFT_RIGHT:
            raise NotImplementedError("Only FLIP_LEFT_RIGHT implemented")
        flipped = self.keypoints[:, np.asarray(type(self).FLIP_INDS)].copy()
        width = self.size[0]
        flipped[..., 0] = width - flipped[..., 0] - 1  # TO_REMOVE
        # COCO convention: invisible keypoints stay all-zero
        flipped[flipped[..., 2] == 0] = 0
        out = type(self)(flipped, self.size, self.mode)
        for k, v in self.extra_fields.items():
            out.add_field(k, v)
        return out

    def __getitem__(self, item) -> "Keypoints":
        item = np.asarray(item) if not isinstance(item, (int, slice)) else item
        out = type(self)(self.keypoints[item], self.size, self.mode)
        for k, v in self.extra_fields.items():
            out.add_field(k, np.asarray(v)[item])
        return out

    def __len__(self) -> int:
        return len(self.keypoints)

    def add_field(self, field: str, data) -> None:
        self.extra_fields[field] = data

    def get_field(self, field: str):
        return self.extra_fields[field]

    def __repr__(self) -> str:
        return (f"{type(self).__name__}(num_instances={len(self.keypoints)},"
                f" image_width={self.size[0]},"
                f" image_height={self.size[1]})")


def _create_flip_indices(names: Sequence[str],
                         flip_map: Dict[str, str]) -> np.ndarray:
    full = dict(flip_map)
    full.update({v: k for k, v in flip_map.items()})
    flipped = [full.get(n, n) for n in names]
    return np.asarray([names.index(n) for n in flipped], np.int64)


class PersonKeypoints(Keypoints):
    NAMES = [
        "nose", "left_eye", "right_eye", "left_ear", "right_ear",
        "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
        "left_wrist", "right_wrist", "left_hip", "right_hip", "left_knee",
        "right_knee", "left_ankle", "right_ankle",
    ]
    FLIP_MAP = {
        "left_eye": "right_eye", "left_ear": "right_ear",
        "left_shoulder": "right_shoulder", "left_elbow": "right_elbow",
        "left_wrist": "right_wrist", "left_hip": "right_hip",
        "left_knee": "right_knee", "left_ankle": "right_ankle",
    }


PersonKeypoints.FLIP_INDS = _create_flip_indices(
    PersonKeypoints.NAMES, PersonKeypoints.FLIP_MAP)


def kp_connections(keypoints: Sequence[str]):
    """Skeleton edge list (reference keypoint.py:131-149)."""
    pairs = [
        ("left_eye", "right_eye"), ("left_eye", "nose"),
        ("right_eye", "nose"), ("right_eye", "right_ear"),
        ("left_eye", "left_ear"), ("right_shoulder", "right_elbow"),
        ("right_elbow", "right_wrist"), ("left_shoulder", "left_elbow"),
        ("left_elbow", "left_wrist"), ("right_hip", "right_knee"),
        ("right_knee", "right_ankle"), ("left_hip", "left_knee"),
        ("left_knee", "left_ankle"), ("right_shoulder", "left_shoulder"),
        ("right_hip", "left_hip"),
    ]
    return [[keypoints.index(a), keypoints.index(b)] for a, b in pairs]


PersonKeypoints.CONNECTIONS = kp_connections(PersonKeypoints.NAMES)


def keypoints_to_heat_map(keypoints: jnp.ndarray, rois: jnp.ndarray,
                          heatmap_size: int):
    """(N, K, 3) keypoints + (N, 4) rois → (heatmap index, valid) pair.

    Vectorized restatement of the reference keypoints_to_heat_map
    (keypoint.py:154-188, itself a C2 translation): per-roi scale to the
    ``heatmap_size`` grid with floor discretization, the exact-boundary
    snap to the last cell, bounds check, and visibility gating.  Returns
    (N, K) int heatmap linear indices (0 where invalid) and (N, K) int
    validity.  jnp in / jnp out — usable inside jit; numpy also accepted.
    """
    offset_x = rois[:, 0][:, None]
    offset_y = rois[:, 1][:, None]
    scale_x = (heatmap_size / (rois[:, 2] - rois[:, 0]))[:, None]
    scale_y = (heatmap_size / (rois[:, 3] - rois[:, 1]))[:, None]

    x = keypoints[..., 0]
    y = keypoints[..., 1]
    x_boundary = x == rois[:, 2][:, None]
    y_boundary = y == rois[:, 3][:, None]

    xh = jnp.floor((x - offset_x) * scale_x).astype(jnp.int64)
    yh = jnp.floor((y - offset_y) * scale_y).astype(jnp.int64)
    xh = jnp.where(x_boundary, heatmap_size - 1, xh)
    yh = jnp.where(y_boundary, heatmap_size - 1, yh)

    valid_loc = (xh >= 0) & (yh >= 0) & (xh < heatmap_size) & (
        yh < heatmap_size)
    vis = keypoints[..., 2] > 0
    valid = (valid_loc & vis).astype(jnp.int64)
    lin = (yh * heatmap_size + xh) * valid
    return lin, valid
