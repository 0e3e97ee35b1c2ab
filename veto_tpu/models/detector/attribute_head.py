"""ROI attribute head (MODEL.ATTRIBUTE_ON).

Re-design of the reference attribute head
(pysgg/modeling/roi_heads/attribute_head/{attribute_head.py,loss.py,
roi_attribute_predictors.py}): a linear attribute scorer over the shared
box-head MLP features, and a multi-label loss over the VG attribute
vocabulary (201 categories, 10 padded slots per box,
defaults.py:251-262).

TPU semantics: the reference's boolean-indexed fg/bg subset selection
(loss.py:61-87) becomes fixed-shape weighting — every box keeps a row,
positives (any attribute) weigh 1, sampled negatives weigh 1 up to
``bgfg_ratio`` x positives, everything else 0.  The BCE mean over the
reference's selected subset equals the weighted sum / weight-count here,
so losses match exactly for the same selection.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class AttributePredictor(nn.Module):
    """FPNPredictor (roi_attribute_predictors.py:29-48): one linear
    att_score over the pooled representation."""

    num_attributes: int = 201
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.num_attributes, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="att_score",
        )(x).astype(jnp.float32)


def attribute_targets(attributes: jnp.ndarray,
                      num_attributes: int = 201) -> jnp.ndarray:
    """(N, 10) padded attribute-id lists -> (N, A) multi-hot.

    Reference generate_attributes_target (loss.py:53-87) breaks at the
    first 0 slot; a cumulative nonzero mask reproduces that exactly even
    if a (malformed) row had a nonzero after a zero.
    """
    live = jnp.cumprod(attributes != 0, axis=1).astype(bool)   # (N, 10)
    onehot = jax.nn.one_hot(attributes, num_attributes)        # (N, 10, A)
    multi = jnp.max(jnp.where(live[..., None], onehot, 0.0), axis=1)
    return multi


class AttributeLossOut(NamedTuple):
    loss: jnp.ndarray
    num_pos: jnp.ndarray


def attribute_loss(
    rng: jax.Array,
    logits: jnp.ndarray,        # (N, A) raw attribute logits
    attributes: jnp.ndarray,    # (N, 10) padded attribute ids
    valid: jnp.ndarray,         # (N,) live-box mask
    loss_weight: float = 0.1,
    bgfg_sample: bool = True,
    bgfg_ratio: int = 3,
    use_binary_loss: bool = True,
    pos_weight: float = 5.0,
) -> AttributeLossOut:
    """AttributeHeadLossComputation (loss.py:35-98), fixed shapes.

    binary mode: BCE-with-logits, positive columns weighted ``pos_weight``,
    averaged over the selected rows x all attribute columns.  soft-CE mode
    (use_binary_loss=False): background boxes target column 0, loss is
    -log softmax weighted by the (normalized) target rows.
    """
    targets = attribute_targets(attributes, logits.shape[-1])
    has_attr = (targets.sum(-1) > 0) & valid
    is_neg = (~has_attr) & valid
    num_pos = has_attr.sum()

    if bgfg_sample:
        # min(num_neg, ratio * num_pos) random negatives (1 if no positives)
        neg_budget = jnp.where(num_pos > 0, bgfg_ratio * num_pos, 1)
        r = jax.random.uniform(rng, has_attr.shape)
        rank = jnp.argsort(jnp.argsort(jnp.where(is_neg, r, jnp.inf)))
        neg_sel = is_neg & (rank < neg_budget)
    else:
        neg_sel = is_neg
    selected = has_attr | neg_sel
    n_sel = jnp.maximum(selected.sum(), 1)

    logits = logits.astype(jnp.float32)
    if use_binary_loss:
        bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        # F.binary_cross_entropy_with_logits pos_weight: scale the
        # -log(sigmoid) term of positive entries
        log_sig = jax.nn.log_sigmoid(logits)
        bce = bce + (pos_weight - 1.0) * targets * (-log_sig)
        per_row = bce.mean(-1)
        loss = jnp.where(selected, per_row, 0.0).sum() / n_sel
    else:
        soft_targets = targets.at[:, 0].set(
            jnp.where(has_attr, targets[:, 0], 1.0))
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_row = -(logp * soft_targets).sum(-1) / jnp.maximum(
            soft_targets.sum(-1), 1e-12)
        loss = jnp.where(selected, per_row, 0.0).sum() / n_sel
    return AttributeLossOut(loss=loss * loss_weight, num_pos=num_pos)
