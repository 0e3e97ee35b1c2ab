"""Pure-jnp box geometry ops.

TPU re-design of the reference's BoxList methods and boxlist_ops
(pysgg/structures/bounding_box.py, boxlist_ops.py) and BoxCoder
(pysgg/modeling/box_coder.py).  All functions are pure, mask-aware where it
matters, and operate on plain ``(..., N, 4)`` xyxy arrays so they vmap/jit
freely.

The maskrcnn-benchmark lineage uses an inclusive-pixel convention:
``width = x2 - x1 + 1`` (the ``TO_REMOVE = 1`` constant all over the
reference, e.g. boxlist_ops.py:86, box_coder.py:33).  We keep it exactly —
it affects IoU and therefore metric parity.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

TO_REMOVE = 1.0
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area with the inclusive-pixel convention (bounding_box.py:area)."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return w * h


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: (..., N, 4) × (..., M, 4) → (..., N, M).

    Matches reference boxlist_iou (boxlist_ops.py:54-91) including TO_REMOVE.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area1[..., :, None] + area2[..., None, :] - inter)


def box_union(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise enclosing box of two aligned sets (boxlist_ops.py:93)."""
    return jnp.concatenate(
        [
            jnp.minimum(boxes1[..., :2], boxes2[..., :2]),
            jnp.maximum(boxes1[..., 2:], boxes2[..., 2:]),
        ],
        axis=-1,
    )


def box_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise intersection box (may be degenerate when disjoint)."""
    return jnp.concatenate(
        [
            jnp.maximum(boxes1[..., :2], boxes2[..., :2]),
            jnp.minimum(boxes1[..., 2:], boxes2[..., 2:]),
        ],
        axis=-1,
    )


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """bounding_box.py convert('xywh'): w = x2 - x1 + 1."""
    xmin = boxes[..., 0]
    ymin = boxes[..., 1]
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return jnp.stack([xmin, ymin, w, h], axis=-1)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    xmin = boxes[..., 0]
    ymin = boxes[..., 1]
    xmax = xmin + jnp.clip(boxes[..., 2] - TO_REMOVE, 0.0)
    ymax = ymin + jnp.clip(boxes[..., 3] - TO_REMOVE, 0.0)
    return jnp.stack([xmin, ymin, xmax, ymax], axis=-1)


def center_xywh(xywh_boxes: jnp.ndarray) -> jnp.ndarray:
    """(x, y, w, h) → (cx, cy, w, h).

    Matches the reference's Ensemble.center_xywh
    (roi_relation_predictors.py:3747-3751) used for the VETO position
    embedding input.
    """
    return jnp.concatenate(
        [xywh_boxes[..., :2] + 0.5 * xywh_boxes[..., 2:], xywh_boxes[..., 2:]],
        axis=-1,
    )


def clip_to_image(boxes: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """Clamp xyxy boxes to [0, W-1] × [0, H-1] (bounding_box.clip_to_image).

    ``size`` is (..., 2) = (width, height), broadcast against boxes.
    """
    w = size[..., None, 0:1].astype(boxes.dtype)
    h = size[..., None, 1:2].astype(boxes.dtype)
    x1 = jnp.clip(boxes[..., 0:1], 0.0, w - TO_REMOVE)
    y1 = jnp.clip(boxes[..., 1:2], 0.0, h - TO_REMOVE)
    x2 = jnp.clip(boxes[..., 2:3], 0.0, w - TO_REMOVE)
    y2 = jnp.clip(boxes[..., 3:4], 0.0, h - TO_REMOVE)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def nonempty_mask(boxes: jnp.ndarray, min_size: float = 0.0) -> jnp.ndarray:
    """remove_small_boxes as a mask (boxlist_ops.py:remove_small_boxes)."""
    ws = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    hs = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return (ws >= min_size) & (hs >= min_size)


def encode_boxes(
    reference_boxes: jnp.ndarray,
    proposals: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0),
) -> jnp.ndarray:
    """BoxCoder.encode (box_coder.py:22-51): gt deltas w.r.t. proposals."""
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0] + TO_REMOVE
    ex_h = proposals[..., 3] - proposals[..., 1] + TO_REMOVE
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h
    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0] + TO_REMOVE
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1] + TO_REMOVE
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h
    return jnp.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * jnp.log(gt_w / ex_w),
            wh * jnp.log(gt_h / ex_h),
        ],
        axis=-1,
    )


def decode_boxes(
    rel_codes: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0),
) -> jnp.ndarray:
    """BoxCoder.decode (box_coder.py:53-95).

    ``rel_codes`` has shape (..., N, 4*K) — K classes of deltas per box —
    and the result matches that shape.  The asymmetric ``- 1`` on x2/y2 is
    the reference's inclusive-pixel convention.
    """
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    heights = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    codes = rel_codes.reshape(rel_codes.shape[:-1] + (-1, 4))
    dx = codes[..., 0] / wx
    dy = codes[..., 1] / wy
    dw = jnp.minimum(codes[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(codes[..., 3] / wh, BBOX_XFORM_CLIP)

    pred_cx = dx * widths[..., None] + ctr_x[..., None]
    pred_cy = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w - 1.0,
            pred_cy + 0.5 * pred_h - 1.0,
        ],
        axis=-1,
    )
    return out.reshape(rel_codes.shape)


def encode_box_info(boxes: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """9-d normalized box geometry (utils_motifs.py:126-148).

    Returns (w/W, h/H, cx/W, cy/H, x1/W, y1/H, x2/W, y2/H, wh/(WH)).
    ``size`` is (..., 2) = (width, height).
    """
    wid = size[..., None, 0].astype(boxes.dtype)
    hei = size[..., None, 1].astype(boxes.dtype)
    wh = boxes[..., 2:] - boxes[..., :2] + 1.0
    xy = boxes[..., :2] + 0.5 * wh
    w, h = wh[..., 0], wh[..., 1]
    x, y = xy[..., 0], xy[..., 1]
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [
            w / wid,
            h / hei,
            x / wid,
            y / hei,
            x1 / wid,
            y1 / hei,
            x2 / wid,
            y2 / hei,
            w * h / (wid * hei),
        ],
        axis=-1,
    )


def resize_boxes(
    boxes: jnp.ndarray, src_size: jnp.ndarray, dst_size: jnp.ndarray
) -> jnp.ndarray:
    """Scale boxes from one image size to another (BoxList.resize).

    Sizes are (..., 2) = (width, height).
    """
    ratio = dst_size.astype(boxes.dtype) / src_size.astype(boxes.dtype)
    rw = ratio[..., None, 0]
    rh = ratio[..., None, 1]
    return jnp.stack(
        [
            boxes[..., 0] * rw,
            boxes[..., 1] * rh,
            boxes[..., 2] * rw,
            boxes[..., 3] * rh,
        ],
        axis=-1,
    )
