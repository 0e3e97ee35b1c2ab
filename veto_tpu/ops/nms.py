"""Greedy NMS with static shapes.

TPU re-design of the reference's CUDA bitmask NMS (pysgg/csrc/cuda/nms.cu,
csrc/cpu/nms_cpu.cpp, wrapped at pysgg/layers/nms.py:13).  Instead of a
dynamic keep-list we run a fixed-trip select-argmax loop: at every step pick
the highest-scoring live box, emit it, and kill everything over the IoU
threshold.  With scores pre-initialized to -inf on padding this is exactly
greedy NMS (same keep set and order as score-sorted sequential suppression),
but every shape is static so it compiles once under jit.

Memory: O(N) per step (one box vs all), never the N×N IoU matrix — safe for
the RPN's 6000-box pre-NMS budget.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .box_ops import TO_REMOVE, box_area

_NEG_INF = -1e10


def _iou_one_vs_all(box: jnp.ndarray, boxes: jnp.ndarray, areas: jnp.ndarray) -> jnp.ndarray:
    """IoU of one xyxy box against (N, 4) boxes, inclusive-pixel convention."""
    area1 = (box[2] - box[0] + TO_REMOVE) * (box[3] - box[1] + TO_REMOVE)
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    return inter / (area1 + areas - inter)


@partial(jax.jit, static_argnames=("max_outputs",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    valid_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy IoU suppression.

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,).
      iou_threshold: suppress boxes with IoU > threshold vs a kept box
        (strictly greater, matching nms_cpu.cpp's ``ovr > thresh`` reject).
      max_outputs: static output budget.
      valid_mask: optional (N,) bool; False entries are never selected.

    Returns:
      (indices, keep_mask): (max_outputs,) int32 indices into ``boxes``
      in descending-score keep order (padding = 0) and a bool mask of real
      keeps.
    """
    n = boxes.shape[0]
    live = scores.astype(jnp.float32)
    if valid_mask is not None:
        live = jnp.where(valid_mask, live, _NEG_INF)
    areas = box_area(boxes)

    def body(i, state):
        live_scores, out_idx, out_ok = state
        idx = jnp.argmax(live_scores)
        best = live_scores[idx]
        ok = best > _NEG_INF / 2
        ious = _iou_one_vs_all(boxes[idx], boxes, areas)
        suppress = ious > iou_threshold
        live_scores = jnp.where(suppress & ok, _NEG_INF, live_scores)
        live_scores = jnp.where(ok, live_scores.at[idx].set(_NEG_INF), live_scores)
        out_idx = out_idx.at[i].set(jnp.where(ok, idx, 0).astype(jnp.int32))
        out_ok = out_ok.at[i].set(ok)
        return live_scores, out_idx, out_ok

    out_idx = jnp.zeros((max_outputs,), dtype=jnp.int32)
    out_ok = jnp.zeros((max_outputs,), dtype=bool)
    _, out_idx, out_ok = jax.lax.fori_loop(
        0, min(max_outputs, n), body, (live, out_idx, out_ok)
    )
    return out_idx, out_ok


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    valid_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via the coordinate-offset trick.

    Boxes of different ``idxs`` (class or image ids) never suppress each
    other — same semantics as reference boxlist_nms applied per class
    (box_head/inference.py filter_results).
    """
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = idxs.astype(boxes.dtype)[:, None] * (max_coord * 2.0 + 2.0)
    return nms(boxes + offsets, scores, iou_threshold, max_outputs, valid_mask)
