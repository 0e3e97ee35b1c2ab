"""Diagnostic baseline predictors: Naive sum-fusion head + relatedness test.

Reference: NaivePredictor (roi_relation_predictors.py:2095-2475) and
RelatednessTestPredictor (:2479-2830).  Both share the same skeleton —
PairwiseFeatureExtractor object features, a 2x-updim head/tail split, pair
concat through output_fc, optional 32-d pairwise-geometry gating, and a
sum-fusion classifier ``rel_classifier(union + pair_rep)`` plus a
label-indexed frequency bias (calculate_logits :2785-2824).

RelatednessTestPredictor additionally runs the relation-confidence-aware
module (our :class:`~veto_tpu.models.relation.rel_proposal.RelAwareRelFeature`,
reference rel_proposal_network/models.py) on the fused pair features and
returns its logits so the engine can apply the auxiliary RelAwareLoss
(:2770-2780); the relness scores themselves are diagnostics.

The reference's causal-effect branches of NaivePredictor (TDE/NIE/TE,
:2330-2424) duplicate CausalAnalysisPredictor's machinery, which lives in
``legacy/causal.py``; the shipped effect_type for NaivePredictor is "none".
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..freq_bias import FrequencyBias
from ..rel_proposal import RelAwareRelFeature
from .context import PairwiseFeatureExtractor, _box_pair_info
from .predictors import LegacyOutput, _gather


class NaivePredictor(nn.Module):
    """Sum-fusion baseline head (roi_relation_predictors.py:2095-2475)."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    hidden_dim: int = 512
    pooling_dim: int = 4096
    in_channels: int = 4096
    mode: str = "predcls"
    use_bias: bool = True
    spatial_for_vision: bool = True
    # RelatednessTestPredictor switch: run the rel-confidence module
    rel_pn_on: bool = False
    embed_init: Optional[np.ndarray] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        boxes: jnp.ndarray,
        box_mask: jnp.ndarray,
        obj_labels: jnp.ndarray,
        predict_logits: jnp.ndarray,
        pair_idx: jnp.ndarray,
        pair_mask: jnp.ndarray,
        roi_features: jnp.ndarray,
        union_features: jnp.ndarray,
        image_sizes: jnp.ndarray,
        boxes_per_cls: Optional[jnp.ndarray] = None,
        train: bool = False,
        pred_labels: Optional[jnp.ndarray] = None,
    ) -> LegacyOutput:
        cdt = self.dtype
        if pred_labels is None:
            pred_labels = obj_labels
        aug_obj, _ = PairwiseFeatureExtractor(
            num_obj_classes=self.num_obj_classes, hidden_dim=self.hidden_dim,
            pooling_dim=self.pooling_dim, in_channels=self.in_channels,
            mode=self.mode, embed_init=self.embed_init, dtype=cdt,
            name="obj_pair_feature_extractor",
        )(roi_features, union_features, boxes, box_mask, obj_labels,
          predict_logits, pred_labels, pair_idx, image_sizes, train)

        # head/tail role split (:2232-2238) + pair fuse through output_fc
        fused = nn.Dense(
            self.hidden_dim * 2, dtype=cdt,
            kernel_init=nn.initializers.normal(10.0 * self.hidden_dim ** -0.5),
            name="pairwise_obj_feat_updim_fc",
        )(aug_obj)
        head = fused[..., : self.hidden_dim]
        tail = fused[..., self.hidden_dim:]
        pair_rep = jnp.concatenate(
            [_gather(head, pair_idx[..., 0]), _gather(tail, pair_idx[..., 1])],
            -1,
        )
        pair_rep = nn.relu(
            nn.Dense(self.pooling_dim, dtype=cdt, name="output_fc")(pair_rep)
        )

        if self.spatial_for_vision:
            geo = _box_pair_info(boxes, image_sizes, pair_idx).astype(cdt)
            spt = nn.relu(nn.Dense(self.hidden_dim, dtype=cdt,
                                   name="spt_emb_fc1")(geo))
            spt = nn.relu(nn.Dense(self.pooling_dim, dtype=cdt,
                                   name="spt_emb_fc2")(spt))
            pair_rep = pair_rep * spt

        uf = union_features.astype(cdt)
        if self.pooling_dim != self.in_channels:
            uf = nn.Dense(self.pooling_dim, dtype=cdt, name="up_dim_linear")(uf)

        relness = None
        if self.rel_pn_on:
            # rel_pn_fc(union + pair_rep) → confidence module (:2728-2739)
            pn_feat = nn.Dense(
                self.pooling_dim, dtype=cdt, name="rel_pn_fc",
            )(nn.relu(uf + pair_rep))
            relness = RelAwareRelFeature(
                num_obj_classes=self.num_obj_classes,
                num_rel_classes=self.num_rel_classes,
                dtype=cdt, name="rel_pn_module",
            )(pn_feat, boxes, predict_logits, pair_idx, pair_mask,
              image_sizes).logits

        rel_dists = nn.Dense(
            self.num_rel_classes, dtype=jnp.float32, name="rel_classifier",
        )(uf + pair_rep)

        if self.mode == "predcls":
            obj_dists = jax.nn.one_hot(obj_labels, self.num_obj_classes,
                                       dtype=jnp.float32)
            obj_preds = obj_labels
        else:
            obj_dists = predict_logits.astype(jnp.float32)
            obj_preds = pred_labels

        if self.use_bias:
            pair_pred = jnp.stack(
                [
                    _gather(obj_preds[..., None], pair_idx[..., 0])[..., 0],
                    _gather(obj_preds[..., None], pair_idx[..., 1])[..., 0],
                ],
                -1,
            )
            rel_dists = rel_dists + FrequencyBias(
                num_obj_classes=self.num_obj_classes,
                num_rel_classes=self.num_rel_classes, name="freq_bias",
            )(pair_pred)
        return LegacyOutput(obj_dists, rel_dists, obj_preds,
                            relness_logits=relness)


class RelatednessTestPredictor(NaivePredictor):
    """NaivePredictor + relation-confidence module and its auxiliary
    RelAwareLoss (roi_relation_predictors.py:2479-2830)."""

    rel_pn_on: bool = True
