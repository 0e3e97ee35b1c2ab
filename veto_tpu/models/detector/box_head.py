"""Box head: feature extractor, predictor, label assignment, post-processing.

Re-design of pysgg/modeling/roi_heads/box_head/: FPN2MLPFeatureExtractor
(roi_box_feature_extractors.py:146-196), FPNPredictor
(roi_box_predictors.py), FastRCNNSampling.assign_label_to_proposals
(sampling.py:118-134), and the PostProcessor with NMS_FILTER_DUPLICATES and
``boxes_per_cls`` bookkeeping (inference.py:12-238) — the subtlest inherited
logic in the whole detector.  Everything is per-image fixed-budget masked
tensors; vmap over the batch at the call site.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from veto_tpu.ops.box_ops import box_iou, clip_to_image, decode_boxes
from veto_tpu.ops.nms import multiclass_nms_mask


class BoxFeatureExtractor(nn.Module):
    """fc6/fc7 MLP over pooled 7x7 maps (FPN2MLPFeatureExtractor).

    Input is the already-pooled (R, P, P, C) tensor (the Pooler lives at the
    model level so RGB/depth share it); output (R, mlp_dim).
    """

    mlp_dim: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        x = pooled.reshape(pooled.shape[:-3] + (-1,))
        x = nn.relu(nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc7")(x))
        return x


class BoxPredictor(nn.Module):
    """Class logits + per-class box deltas (FPNPredictor)."""

    num_classes: int = 151
    cls_agnostic_bbox_reg: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logits = nn.Dense(
            self.num_classes, dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01), name="cls_score",
        )(x)
        num_reg = 2 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_reg * 4, dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.001), name="bbox_pred",
        )(x)
        return logits, deltas


def assign_labels_to_proposals(
    prop_boxes: jnp.ndarray,  # (P, 4)
    prop_mask: jnp.ndarray,   # (P,)
    gt_boxes: jnp.ndarray,    # (T, 4)
    gt_labels: jnp.ndarray,   # (T,)
    gt_mask: jnp.ndarray,     # (T,)
    fg_iou_threshold: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-proposal class labels for the sgdet relation path
    (sampling.py:118-134: matcher without low-quality matches; any proposal
    whose best-IoU GT is below the fg threshold becomes background — the
    reference maps both BELOW_LOW and BETWEEN matches to label 0).

    Returns (labels (P,), matched_gt (P,) — index of best GT, -1 if bg).
    """
    iou = box_iou(gt_boxes, prop_boxes)  # (T, P)
    iou = jnp.where(gt_mask[:, None], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=0)
    best_iou = jnp.max(iou, axis=0)
    fg = (best_iou >= fg_iou_threshold) & prop_mask
    labels = jnp.where(fg, gt_labels[best_gt], 0)
    return labels, jnp.where(fg, best_gt, -1)


class Detections(NamedTuple):
    boxes: jnp.ndarray          # (D, 4) final per-label decoded boxes
    scores: jnp.ndarray         # (D,)
    labels: jnp.ndarray         # (D,) int32
    mask: jnp.ndarray           # (D,) bool
    orig_idx: jnp.ndarray       # (D,) index into the proposal axis
    boxes_per_cls: jnp.ndarray  # (D, C, 4) per-class decoded boxes


def box_postprocess(
    class_logits: jnp.ndarray,    # (P, C)
    box_regression: jnp.ndarray,  # (P, C*4)
    proposals: jnp.ndarray,       # (P, 4)
    prop_mask: jnp.ndarray,       # (P,)
    image_size: jnp.ndarray,      # (2,) = (w, h)
    score_thresh: float = 0.01,
    nms_thresh: float = 0.3,
    post_nms_per_cls_topn: int = 300,
    nms_filter_duplicates: bool = True,
    detections_per_img: int = 80,
    reg_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0),
) -> Detections:
    """filter_results (box_head/inference.py:157-238) on static shapes.

    Pipeline: softmax → per-class decode+clip → per-class NMS (score thresh
    0.01, IoU 0.3, ≤300/class) → NMS_FILTER_DUPLICATES one-label-per-box
    reduction (:191-211) → global top-``detections_per_img`` by the
    kthvalue-threshold rule (:218-226).

    One divergence: on exact score ties at the 80th detection the reference
    keeps every tied box (``>= image_thresh``); the static budget keeps
    exactly 80 in box-index order.  Ties between distinct float32 softmax
    scores are measure-zero, so this does not affect metric parity.
    """
    p, c = class_logits.shape
    prob = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)
    boxes_per_cls = decode_boxes(
        box_regression.astype(jnp.float32), proposals, weights=reg_weights
    ).reshape(p, c, 4)
    boxes_per_cls = clip_to_image(boxes_per_cls, image_size)
    return filter_decoded_boxes(
        prob, boxes_per_cls, prop_mask,
        score_thresh=score_thresh, nms_thresh=nms_thresh,
        post_nms_per_cls_topn=post_nms_per_cls_topn,
        nms_filter_duplicates=nms_filter_duplicates,
        detections_per_img=detections_per_img,
    )


def filter_decoded_boxes(
    prob: jnp.ndarray,           # (P, C) softmax scores
    boxes_per_cls: jnp.ndarray,  # (P, C, 4) decoded + clipped boxes
    prop_mask: jnp.ndarray,      # (P,)
    score_thresh: float = 0.01,
    nms_thresh: float = 0.3,
    post_nms_per_cls_topn: int = 300,
    nms_filter_duplicates: bool = True,
    detections_per_img: int = 80,
) -> Detections:
    """The post-decode half of filter_results — split out so bbox-aug TTA
    (engine/bbox_aug.py) can merge candidates from several augmentations in
    the identity frame before the NMS filter, matching the reference's
    merge-then-filter_results order (engine/bbox_aug.py:53-68)."""
    p, c = prob.shape

    # per-class NMS over foreground classes
    keep_fg = multiclass_nms_mask(
        boxes_per_cls[:, 1:], prob[:, 1:], score_thresh, nms_thresh,
        post_nms_per_cls_topn, valid_mask=prop_mask,
    )  # (P, C-1)

    if nms_filter_duplicates:
        dist_scores = prob[:, 1:] * keep_fg  # (:203-204)
        scores_pre = jnp.max(dist_scores, axis=1)
        labels_pre = jnp.argmax(dist_scores, axis=1) + 1
        valid = scores_pre > 0.0
        cand_scores = jnp.where(valid, scores_pre, -jnp.inf)
        top_scores, top_idx = jax.lax.top_k(
            cand_scores, min(detections_per_img, p)
        )
        mask = top_scores > -jnp.inf
        # reference emits survivors in ascending box-index order
        # (final_inds from nonzero() at :202), not score order — keep that so
        # downstream consumers (pair enumeration, obj NMS ties) line up.
        order = jnp.argsort(jnp.where(mask, top_idx, p))
        top_idx, mask = top_idx[order], mask[order]
        labels = jnp.where(mask, labels_pre[top_idx], 0)
        sel_bpc = boxes_per_cls[top_idx]
        boxes = jnp.take_along_axis(
            sel_bpc, labels[:, None, None].astype(jnp.int32).repeat(4, -1), axis=1
        )[:, 0]
        return Detections(
            boxes=jnp.where(mask[:, None], boxes, 0.0),
            scores=jnp.where(mask, scores_pre[top_idx], 0.0),
            labels=labels.astype(jnp.int32),
            mask=mask,
            orig_idx=jnp.where(mask, top_idx, 0).astype(jnp.int32),
            boxes_per_cls=sel_bpc,
        )

    # cat-boxlists branch (:212-214): every kept (box, class) pair competes
    flat_scores = jnp.where(keep_fg, prob[:, 1:], -jnp.inf).reshape(-1)
    k = min(detections_per_img, flat_scores.shape[0])
    top_scores, flat_idx = jax.lax.top_k(flat_scores, k)
    mask = top_scores > -jnp.inf
    box_idx = (flat_idx // (c - 1)).astype(jnp.int32)
    labels = (flat_idx % (c - 1) + 1).astype(jnp.int32)
    sel_bpc = boxes_per_cls[box_idx]
    boxes = jnp.take_along_axis(
        sel_bpc, labels[:, None, None].repeat(4, -1), axis=1
    )[:, 0]
    return Detections(
        boxes=jnp.where(mask[:, None], boxes, 0.0),
        scores=jnp.where(mask, top_scores, 0.0),
        labels=jnp.where(mask, labels, 0),
        mask=mask,
        orig_idx=jnp.where(mask, box_idx, 0),
        boxes_per_cls=sel_bpc,
    )
