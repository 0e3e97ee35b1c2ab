"""Relation proposal network: relation-confidence-aware pre-classifier.

Re-design of RelAwareRelFeature
(pysgg/.../rel_proposal_network/models.py:600-720) and RelAwareLoss
(rel_proposal_network/loss.py:12-174): a light pair scorer over geometry +
semantic embeddings (+ optional visual features) that produces per-class
"relness" logits and a fused binary confidence — the signal BGNN-style
models use to filter/weight message passing, and that the engine can use
as an auxiliary pre-classification loss.

``predictor_type='hybrid'`` (the shipped default): per-foreground-class
logits (C-1) plus a fused binary logit whose sigmoid is the pair's relness
score (:700-712).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from veto_tpu.ops.box_ops import encode_box_info


class RelnessOutput(NamedTuple):
    logits: jnp.ndarray   # (B, P, C-1 [+1 binary col when hybrid])
    scores: jnp.ndarray   # (B, P) sigmoid relness


class RelAwareRelFeature(nn.Module):
    num_obj_classes: int = 151
    num_rel_classes: int = 51
    embed_dim: int = 200
    geometry_dim: int = 128
    hidden_dim: int = 512
    visual_features_on: bool = True
    predictor_type: str = "hybrid"  # 'hybrid' | 'single'
    embed_init: Optional[np.ndarray] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        visual_feat: jnp.ndarray,     # (B, P, D) pair/union visual features
        boxes: jnp.ndarray,           # (B, N, 4)
        predict_logits: jnp.ndarray,  # (B, N, num_obj)
        pair_idx: jnp.ndarray,        # (B, P, 2)
        pair_mask: jnp.ndarray,       # (B, P)
        image_sizes: jnp.ndarray,     # (B, 2)
    ) -> RelnessOutput:
        cdt = self.dtype
        init = (
            nn.initializers.normal(1.0)
            if self.embed_init is None
            else lambda *_: jnp.asarray(self.embed_init)
        )
        sem_tbl = nn.Embed(self.num_obj_classes, self.embed_dim,
                           embedding_init=init, dtype=cdt, name="obj_sem_embed")
        probs = jax.nn.softmax(
            jax.lax.stop_gradient(predict_logits).astype(jnp.float32), -1
        )
        sem = probs.astype(cdt) @ sem_tbl.embedding.astype(cdt)  # (B, N, e)

        binfo = encode_box_info(boxes, image_sizes).astype(cdt)
        pos = nn.Dense(self.geometry_dim, dtype=cdt, name="pos_fc1")(binfo)
        pos = nn.Dense(self.geometry_dim, dtype=cdt, name="pos_fc2")(nn.relu(pos))

        def g(x, idx):
            return jnp.take_along_axis(x, idx[..., None].astype(jnp.int32), 1)

        si, oi = pair_idx[..., 0], pair_idx[..., 1]
        symb = jnp.concatenate(
            [g(pos, si), g(sem, si), g(pos, oi), g(sem, oi)], -1
        )
        geo = nn.Dense(self.hidden_dim, dtype=cdt,
                       name="proposal_box_feat_extract")(nn.relu(symb))

        if self.visual_features_on:
            vis = nn.Dense(self.hidden_dim, dtype=cdt, name="vis_embed")(
                nn.relu(jax.lax.stop_gradient(visual_feat).astype(cdt))
            )
            x = jnp.concatenate([vis, geo], -1)
            x = nn.Dense(self.hidden_dim, dtype=cdt, name="proposal_feat_fusion")(
                nn.relu(nn.LayerNorm(dtype=cdt, name="fusion_ln")(x))
            )
        else:
            x = geo

        x = nn.relu(nn.LayerNorm(dtype=cdt, name="cls_ln")(x))
        logits = nn.Dense(self.num_rel_classes - 1, dtype=jnp.float32,
                          name="proposal_relness_cls_fc")(x)

        if self.predictor_type == "hybrid":
            bin_logit = nn.Dense(1, dtype=jnp.float32, name="fusion_layer")(logits)
            scores = jax.nn.sigmoid(bin_logit[..., 0])
            logits = jnp.concatenate([logits, bin_logit], -1)
        else:
            scores = jax.nn.sigmoid(logits).max(-1)
        scores = jnp.where(pair_mask, scores, 0.0)
        return RelnessOutput(logits=logits, scores=scores)


def rel_aware_focal_loss(
    logits: jnp.ndarray,   # (B, P, C-1 [+1]) RelnessOutput.logits
    rel_labels: jnp.ndarray,  # (B, P) predicate labels, -1 pad
    pair_mask: jnp.ndarray,
    num_rel_classes: int,
    alpha: float = 1.0,
    gamma: float = 2.0,
    hybrid: bool = True,
) -> jnp.ndarray:
    """RelAwareLoss with FocalLossFGBGNormalization (loss.py:54-69,
    loss_eval_hybrid_level): focal BCE against one-hot fg-class targets
    (plus the binary fg/bg column for hybrid), normalized by fg count."""
    safe = jnp.maximum(rel_labels, 0)
    onehot = jax.nn.one_hot(safe, num_rel_classes)[..., 1:]  # (B, P, C-1)
    onehot = jnp.where((rel_labels > 0)[..., None], onehot, 0.0)
    if hybrid:
        binary = (rel_labels > 0).astype(jnp.float32)[..., None]
        targets = jnp.concatenate([onehot, binary], -1)
    else:
        targets = onehot
    logits = logits.astype(jnp.float32)
    bce = (jnp.maximum(logits, 0) - logits * targets
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    pt = jnp.exp(-bce)
    focal = alpha * (1.0 - pt) ** gamma * bce
    focal = jnp.where(pair_mask[..., None], focal, 0.0).sum(-1)
    n_fg = jnp.maximum((targets > 0).sum(), 1)
    return (focal.sum(-1) / n_fg).mean()
