"""Relation post-processing: logits → ranked triplet predictions.

Device-side re-design of the plain path of the reference PostProcessor
(pysgg/.../relation_head/inference.py:398-453): object softmax with
background zeroed, per-pair predicate argmax over foreground classes, triple
score = rel_score * subj_score * obj_score, global descending sort.  The
reference loops per image on dynamic shapes; here everything is a masked
fixed-shape sort that vmaps over the batch and stays on device — only the
final padded arrays cross to the host for NumPy metric evaluation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from veto_tpu.ops.nms import obj_prediction_nms


class RelPrediction(NamedTuple):
    pair_idx: jnp.ndarray       # (P, 2) sorted by triple score desc
    rel_scores: jnp.ndarray     # (P, C) softmax over predicates (bg at 0)
    rel_labels: jnp.ndarray     # (P,) argmax fg predicate
    pair_mask: jnp.ndarray      # (P,)
    obj_labels: jnp.ndarray     # (N,) predicted object classes
    obj_scores: jnp.ndarray     # (N,) predicted object scores
    # rel-PN pair confidence aligned with pair_idx (the reference's
    # "relness" boxlist field, models.py:757-788) — diagnostics only
    relness: Optional[jnp.ndarray] = None  # (P,) or (P, I)


def postprocess_relations(
    rel_logits: jnp.ndarray,   # (P, C) float
    obj_dists: jnp.ndarray,    # (N, num_obj) logits or one-hot
    pair_idx: jnp.ndarray,     # (P, 2)
    pair_mask: jnp.ndarray,    # (P,)
    relness: Optional[jnp.ndarray] = None,
) -> RelPrediction:
    """Single image; vmap over the batch axis at the call site."""
    obj_prob = jax.nn.softmax(obj_dists.astype(jnp.float32), axis=-1)
    obj_prob = obj_prob.at[:, 0].set(0.0)
    obj_scores = jnp.max(obj_prob[:, 1:], axis=-1)
    obj_labels = jnp.argmax(obj_prob[:, 1:], axis=-1) + 1

    rel_prob = jax.nn.softmax(rel_logits.astype(jnp.float32), axis=-1)
    rel_scores_fg = jnp.max(rel_prob[:, 1:], axis=-1)
    rel_labels = jnp.argmax(rel_prob[:, 1:], axis=-1) + 1

    triple = rel_scores_fg * obj_scores[pair_idx[:, 0]] * obj_scores[pair_idx[:, 1]]
    triple = jnp.where(pair_mask, triple, -jnp.inf)
    order = jnp.argsort(-triple)

    return RelPrediction(
        pair_idx=pair_idx[order],
        rel_scores=rel_prob[order],
        rel_labels=rel_labels[order],
        pair_mask=pair_mask[order],
        obj_labels=obj_labels,
        obj_scores=obj_scores,
        relness=None if relness is None else relness[order],
    )


class SGDetPrediction(NamedTuple):
    boxes: jnp.ndarray          # (N, 4) final boxes: boxes_per_cls[i, label]
    obj_labels: jnp.ndarray     # (N,) re-NMS'd object classes
    obj_scores: jnp.ndarray     # (N,)
    det_mask: jnp.ndarray       # (N,)
    pair_idx: jnp.ndarray       # (P, 2) sorted by triple score desc
    rel_scores: jnp.ndarray     # (P, C)
    rel_labels: jnp.ndarray     # (P,)
    pair_mask: jnp.ndarray      # (P,)


def postprocess_relations_sgdet(
    rel_logits: jnp.ndarray,     # (P, C)
    obj_dists: jnp.ndarray,      # (N, num_obj) predictor obj logits/one-hot
    pair_idx: jnp.ndarray,       # (P, 2)
    pair_mask: jnp.ndarray,      # (P,)
    boxes_per_cls: jnp.ndarray,  # (N, num_obj, 4) from the box head
    det_mask: jnp.ndarray,       # (N,)
    later_nms_thres: float = 0.3,
) -> SGDetPrediction:
    """sgdet path of the reference PostProcessor (inference.py:409-433):
    late object NMS (``obj_prediction_nms`` at LATER_NMS_PREDICTION_THRES)
    re-picks each detection's class, the final box is the class-specific
    regression ``boxes_per_cls[i, cls]``, and triples sort by
    rel·subj·obj score.  Single image; vmap at the call site.
    """
    obj_pred = obj_prediction_nms(
        boxes_per_cls, obj_dists, later_nms_thres, valid_mask=det_mask
    )
    obj_prob = jax.nn.softmax(obj_dists.astype(jnp.float32), axis=-1)
    obj_prob = obj_prob.at[:, 0].set(0.0)
    obj_scores = jnp.take_along_axis(obj_prob, obj_pred[:, None], axis=1)[:, 0]
    boxes = jnp.take_along_axis(
        boxes_per_cls, obj_pred[:, None, None].repeat(4, -1).astype(jnp.int32), axis=1
    )[:, 0]

    rel_prob = jax.nn.softmax(rel_logits.astype(jnp.float32), axis=-1)
    rel_scores_fg = jnp.max(rel_prob[:, 1:], axis=-1)
    rel_labels = jnp.argmax(rel_prob[:, 1:], axis=-1) + 1

    triple = rel_scores_fg * obj_scores[pair_idx[:, 0]] * obj_scores[pair_idx[:, 1]]
    triple = jnp.where(pair_mask, triple, -jnp.inf)
    order = jnp.argsort(-triple)

    return SGDetPrediction(
        boxes=boxes,
        obj_labels=obj_pred.astype(jnp.int32),
        obj_scores=obj_scores,
        det_mask=det_mask,
        pair_idx=pair_idx[order],
        rel_scores=rel_prob[order],
        rel_labels=rel_labels[order],
        pair_mask=pair_mask[order],
    )
