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

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RelPrediction(NamedTuple):
    pair_idx: jnp.ndarray       # (P, 2) sorted by triple score desc
    rel_scores: jnp.ndarray     # (P, C) softmax over predicates (bg at 0)
    rel_labels: jnp.ndarray     # (P,) argmax fg predicate
    pair_mask: jnp.ndarray      # (P,)
    obj_labels: jnp.ndarray     # (N,) predicted object classes
    obj_scores: jnp.ndarray     # (N,) predicted object scores


def postprocess_relations(
    rel_logits: jnp.ndarray,   # (P, C) float
    obj_dists: jnp.ndarray,    # (N, num_obj) logits or one-hot
    pair_idx: jnp.ndarray,     # (P, 2)
    pair_mask: jnp.ndarray,    # (P,)
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
    )
