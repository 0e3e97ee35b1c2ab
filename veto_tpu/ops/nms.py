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


@partial(jax.jit, static_argnames=("max_keep_per_cls",))
def multiclass_nms_mask(
    boxes_per_cls: jnp.ndarray,   # (N, C, 4) per-class decoded boxes
    scores: jnp.ndarray,          # (N, C)
    score_thresh: float,
    iou_threshold: float,
    max_keep_per_cls: int,
    valid_mask: jnp.ndarray | None = None,  # (N,)
) -> jnp.ndarray:
    """Per-class greedy NMS keep mask (box_head/inference.py filter_results
    :157-188 per-class loop, all classes at once).

    For every class independently: candidates are boxes with
    ``score > score_thresh``; greedy suppression at ``iou_threshold`` keeps
    at most ``max_keep_per_cls``.  Returns a (N, C) bool keep mask.  The
    caller is responsible for excluding the background column.

    Implementation: one while_loop whose body advances EVERY class one
    greedy step (vmapped select-and-suppress); trip count is the max keep
    count over classes, typically far below the 300 cap.
    """
    n, c = scores.shape
    live = scores.astype(jnp.float32).T  # (C, N)
    if valid_mask is not None:
        live = jnp.where(valid_mask[None, :], live, _NEG_INF)
    live = jnp.where(live > score_thresh, live, _NEG_INF)
    boxes_t = jnp.swapaxes(boxes_per_cls, 0, 1)  # (C, N, 4)
    areas = box_area(boxes_t)

    def one_step(live_c, boxes_c, areas_c, keep_c):
        idx = jnp.argmax(live_c)
        ok = live_c[idx] > _NEG_INF / 2
        ious = _iou_one_vs_all(boxes_c[idx], boxes_c, areas_c)
        live_c = jnp.where((ious > iou_threshold) & ok, _NEG_INF, live_c)
        live_c = jnp.where(ok, live_c.at[idx].set(_NEG_INF), live_c)
        keep_c = jnp.where(ok, keep_c.at[idx].set(True), keep_c)
        return live_c, keep_c, ok

    def cond(state):
        live_s, _, i, any_live = state
        return (i < max_keep_per_cls) & any_live

    def body(state):
        live_s, keep, i, _ = state
        live_s, keep, ok = jax.vmap(one_step)(live_s, boxes_t, areas, keep)
        return live_s, keep, i + 1, jnp.any(ok)

    keep0 = jnp.zeros((c, n), dtype=bool)
    _, keep, _, _ = jax.lax.while_loop(
        cond, body, (live, keep0, jnp.asarray(0, jnp.int32), jnp.asarray(True))
    )
    return keep.T  # (N, C)


def obj_prediction_nms(
    boxes_per_cls: jnp.ndarray,  # (N, C, 4)
    pred_logits: jnp.ndarray,    # (N, C)
    nms_thresh: float = 0.3,
    valid_mask: jnp.ndarray | None = None,
    overwrite: bool = False,
    bg_init: float | None = None,
) -> jnp.ndarray:
    """Global-argmax label assignment NMS (utils_relation.py:94-130).

    Iteratively takes the globally highest (box, class) probability, assigns
    that class to the box if it is still unlabeled, then zeroes the same
    class for all boxes whose class-c IoU with it exceeds ``nms_thresh`` and
    retires the chosen box.  Returns per-box predicted labels (N,) int32
    (0 = background / never assigned).

    ``overwrite=True`` selects the nms_per_cls variant used by the context
    models (model_transformer.py:297-316, Ensemble :3855-3874): the bg
    column starts at -1 instead of 0 and each pick overwrites the label
    unconditionally.  ``bg_init`` overrides the bg column's initial value
    (the Motifs DecoderRNN post-NMS, model_motifs.py:204-219, overwrites
    labels but keeps bg at 0).
    """
    n, c = pred_logits.shape
    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    if bg_init is None:
        bg_init = -1.0 if overwrite else 0.0
    prob = prob.at[:, 0].set(bg_init)
    if valid_mask is not None:
        prob = jnp.where(valid_mask[:, None], prob, -1.0)

    # per-class pairwise IoU (nms_overlaps, utils_relation.py:56-91): (N, N, C)
    bpc = jnp.swapaxes(boxes_per_cls.astype(jnp.float32), 0, 1)  # (C, N, 4)
    lt = jnp.maximum(bpc[:, :, None, :2], bpc[:, None, :, :2])
    rb = jnp.minimum(bpc[:, :, None, 2:], bpc[:, None, :, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = box_area(bpc)
    iou = inter / (area[:, :, None] + area[:, None, :] - inter)  # (C, N, N)
    is_overlap = jnp.moveaxis(iou, 0, -1) >= nms_thresh  # (N, N, C)

    def body(_, state):
        prob_s, labels = state
        flat = jnp.argmax(prob_s)
        box_ind, cls_ind = flat // c, flat % c
        if overwrite:
            labels = labels.at[box_ind].set(cls_ind)
        else:
            labels = jnp.where(
                labels[box_ind] > 0, labels, labels.at[box_ind].set(cls_ind)
            )
        suppress = is_overlap[box_ind, :, cls_ind]
        col = prob_s[:, cls_ind]
        prob_s = prob_s.at[:, cls_ind].set(jnp.where(suppress, 0.0, col))
        prob_s = prob_s.at[box_ind].set(-1.0)
        return prob_s, labels

    _, labels = jax.lax.fori_loop(
        0, n, body, (prob, jnp.zeros((n,), jnp.int32))
    )
    return labels


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
