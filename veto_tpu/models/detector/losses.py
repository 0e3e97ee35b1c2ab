"""Detector pretraining losses: RPN + Fast R-CNN head.

Re-design of pysgg/modeling/rpn/loss.py (RPNLossComputation :21-131),
modeling/matcher.py (argmax matcher with low-quality allowances),
modeling/balanced_positive_negative_sampler.py, and
roi_heads/box_head/loss.py (FastRCNNLossComputation) — all as masked
fixed-shape ops.  Loss normalizations follow the reference exactly:

  * RPN: BCE mean over the 256 sampled anchors; smooth-L1(beta=1/9) summed
    over sampled positives / #sampled (loss.py:118-129).
  * box head: CE mean over the 512 sampled proposals; smooth-L1(beta=1)
    over class-specific regression columns of positives / #sampled
    (box_head/loss.py:76-81).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from veto_tpu.ops.box_ops import box_iou, encode_boxes

BELOW_LOW = -1
BETWEEN = -2


def smooth_l1(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    """reference layers/smooth_l1_loss.py:6-16 (elementwise, no reduction)."""
    n = jnp.abs(x)
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def match_boxes(
    candidates: jnp.ndarray,   # (A, 4) anchors or proposals
    cand_mask: jnp.ndarray,    # (A,)
    gt_boxes: jnp.ndarray,     # (T, 4)
    gt_mask: jnp.ndarray,      # (T,)
    high: float,
    low: float,
    allow_low_quality: bool,
) -> jnp.ndarray:
    """modeling/matcher.py: per-candidate best-GT index, or BELOW_LOW /
    BETWEEN sentinels; low-quality mode restores the argmax match for any
    candidate that is some GT's best match (ties included)."""
    iou = box_iou(gt_boxes, candidates)                   # (T, A)
    iou = jnp.where(gt_mask[:, None] & cand_mask[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=0).astype(jnp.int32)   # (A,)
    best_val = jnp.max(iou, axis=0)
    matches = jnp.where(
        best_val >= high, best_gt,
        jnp.where(best_val < low, BELOW_LOW, BETWEEN),
    )
    if allow_low_quality:
        gt_best = jnp.max(iou, axis=1, keepdims=True)     # (T, 1)
        is_best = (iou == gt_best) & (gt_best > 0) & gt_mask[:, None]
        restore = jnp.any(is_best, axis=0)
        matches = jnp.where(restore & cand_mask, best_gt, matches)
    return jnp.where(cand_mask, matches, BELOW_LOW)


def balanced_sample(
    rng: jax.Array,
    labels: jnp.ndarray,   # (A,) 1 fg / 0 bg / -1 discard
    batch_size: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BalancedPositiveNegativeSampler: ≤ batch*frac random positives, the
    rest random negatives.  Returns (pos_mask, neg_mask)."""
    kp, kn = jax.random.split(rng)
    num_pos_budget = int(batch_size * positive_fraction)
    pos = labels == 1
    neg = labels == 0
    rp = jax.random.uniform(kp, labels.shape)
    rn = jax.random.uniform(kn, labels.shape)
    pos_rank = jnp.argsort(jnp.argsort(jnp.where(pos, rp, jnp.inf)))
    num_pos = jnp.minimum(pos.sum(), num_pos_budget)
    pos_sel = pos & (pos_rank < num_pos)
    neg_rank = jnp.argsort(jnp.argsort(jnp.where(neg, rn, jnp.inf)))
    num_neg = jnp.minimum(neg.sum(), batch_size - num_pos)
    neg_sel = neg & (neg_rank < num_neg)
    return pos_sel, neg_sel


class RPNLoss(NamedTuple):
    objectness: jnp.ndarray
    box: jnp.ndarray


def rpn_losses(
    rng: jax.Array,
    objectness: jnp.ndarray,      # (A,) raw logits, all levels concat
    box_regression: jnp.ndarray,  # (A, 4)
    anchors: jnp.ndarray,         # (A, 4)
    visibility: jnp.ndarray,      # (A,)
    gt_boxes: jnp.ndarray,        # (T, 4)
    gt_mask: jnp.ndarray,         # (T,)
    batch_size: int = 256,
    positive_fraction: float = 0.5,
    high: float = 0.7,
    low: float = 0.3,
) -> RPNLoss:
    """Single-image RPN loss (rpn/loss.py:92-131); vmap over the batch and
    average the results (the reference concatenates images before the mean,
    which is identical for equal per-image sample counts)."""
    matches = match_boxes(
        anchors, visibility, gt_boxes, gt_mask, high, low,
        allow_low_quality=True,
    )
    labels = jnp.where(
        matches >= 0, 1, jnp.where(matches == BELOW_LOW, 0, -1)
    )
    labels = jnp.where(visibility, labels, -1)  # discard not_visibility

    pos_sel, neg_sel = balanced_sample(rng, labels, batch_size, positive_fraction)
    sampled = pos_sel | neg_sel
    n_sampled = jnp.maximum(sampled.sum(), 1)

    targets = encode_boxes(
        gt_boxes[jnp.maximum(matches, 0)], anchors, weights=(1.0, 1.0, 1.0, 1.0)
    )
    box = jnp.where(
        pos_sel[:, None], smooth_l1(box_regression - targets, beta=1.0 / 9), 0.0
    ).sum() / n_sampled

    logits = objectness.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    bce = jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    obj = jnp.where(sampled, bce, 0.0).sum() / n_sampled
    return RPNLoss(objectness=obj, box=box)


class BoxSample(NamedTuple):
    idx: jnp.ndarray      # (S,) indices into the proposal axis
    mask: jnp.ndarray     # (S,)
    labels: jnp.ndarray   # (S,) class labels (0 = bg)
    targets: jnp.ndarray  # (S, 4) regression targets


def fastrcnn_sample(
    rng: jax.Array,
    proposals: jnp.ndarray,  # (P, 4)
    prop_mask: jnp.ndarray,  # (P,)
    gt_boxes: jnp.ndarray,   # (T, 4)
    gt_labels: jnp.ndarray,  # (T,)
    gt_mask: jnp.ndarray,    # (T,)
    batch_size: int = 512,
    positive_fraction: float = 0.25,
    high: float = 0.5,
    low: float = 0.3,
    reg_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0),
) -> BoxSample:
    """FastRCNNSampling.subsample (box_head/sampling.py:14-116), one image:
    match → fg/bg labels (BETWEEN → discard) → balanced 512@0.25 sample →
    class labels + encoded regression targets, compacted into S slots."""
    matches = match_boxes(
        proposals, prop_mask, gt_boxes, gt_mask, high, low,
        allow_low_quality=False,
    )
    cls = jnp.where(matches >= 0, gt_labels[jnp.maximum(matches, 0)], 0)
    fgbg = jnp.where(
        matches >= 0, 1, jnp.where(matches == BELOW_LOW, 0, -1)
    )
    pos_sel, neg_sel = balanced_sample(rng, fgbg, batch_size, positive_fraction)
    sel = pos_sel | neg_sel
    # compact to S = batch_size slots (pos first, like the reference's
    # nonzero(pos|neg) index order is arbitrary — loss is order-free)
    order = jnp.argsort(~sel, stable=True)[:batch_size]
    mask = sel[order]
    targets = encode_boxes(
        gt_boxes[jnp.maximum(matches, 0)], proposals, weights=reg_weights
    )
    return BoxSample(
        idx=jnp.where(mask, order, 0).astype(jnp.int32),
        mask=mask,
        labels=jnp.where(mask, cls[order], 0).astype(jnp.int32),
        targets=jnp.where(mask[:, None], targets[order], 0.0),
    )


class BoxLoss(NamedTuple):
    classifier: jnp.ndarray
    box_reg: jnp.ndarray


def fastrcnn_losses(
    class_logits: jnp.ndarray,    # (S, C)
    box_regression: jnp.ndarray,  # (S, C*4)
    sample: BoxSample,
) -> BoxLoss:
    """FastRCNNLossComputation.__call__ (box_head/loss.py:49-92), one image."""
    s, c = class_logits.shape
    n_sampled = jnp.maximum(sample.mask.sum(), 1)
    logp = jax.nn.log_softmax(class_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, sample.labels[:, None], axis=1)[:, 0]
    cls_loss = jnp.where(sample.mask, nll, 0.0).sum() / n_sampled

    pos = sample.mask & (sample.labels > 0)
    reg = box_regression.reshape(s, c, 4)
    reg_cls = jnp.take_along_axis(
        reg, sample.labels[:, None, None].repeat(4, -1).astype(jnp.int32), axis=1
    )[:, 0]
    box_loss = jnp.where(
        pos[:, None], smooth_l1(reg_cls - sample.targets, beta=1.0), 0.0
    ).sum() / n_sampled
    return BoxLoss(classifier=cls_loss, box_reg=box_loss)
