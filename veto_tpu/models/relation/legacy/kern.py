"""KERN: knowledge-embedded routing network.

Reference: KERNPredictor (roi_relation_predictors.py:2831-3254) with GGNNRel
(model_kern.py:92-170).  The distinctive piece is the per-pair gated graph
network over [subject, object, predicate-1..C-1] nodes whose adjacency is a
statistical knowledge prior keyed by the pair's predicted classes —
A[s_cls, o_cls] = P(predicate | s_cls, o_cls) from the dataset statistics
(the reference loads a precomputed .npy; here the prior defaults to the
uniform 1/C fallback and accepts the statistics pred-dist via
``prior_matrix``).

GGNN node update follows "Gated Graph Sequence Neural Networks" eq. 2-5,
including the reference's idiosyncrasy of reusing fc_eq3_u inside the reset
gate (model_kern.py:150-152 — replicated for weight-for-weight parity).
The fork's causal-analysis wrapper around KERN (:2900-3254) shares the
machinery of CausalPredictor and is not duplicated here; this module is the
base KERN head over the pairwise feature extractor.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..freq_bias import FrequencyBias
from .context import PairwiseFeatureExtractor
from .predictors import LegacyOutput, _gather


class GGNNRel(nn.Module):
    """Per-pair gated graph net over [subj, obj, C-1 predicate] nodes."""

    num_rel_classes: int = 51
    time_steps: int = 3
    hidden_dim: int = 512
    output_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        ent_sub: jnp.ndarray,   # (B, P, h)
        ent_obj: jnp.ndarray,   # (B, P, h)
        rel_feat: jnp.ndarray,  # (B, P, h)
        prior: jnp.ndarray,     # (B, P, C-1) knowledge rows for each pair
    ) -> jnp.ndarray:
        cdt = self.dtype
        h = self.hidden_dim
        c = self.num_rel_classes - 1
        b, p = ent_sub.shape[:2]

        # nodes: [sub, obj, pred_1..pred_{C-1}] (GGNNRelReason :247-252)
        pred_nodes = jnp.broadcast_to(rel_feat[:, :, None, :], (b, p, c, h))
        x0 = jnp.concatenate(
            [ent_sub[:, :, None, :], ent_obj[:, :, None, :], pred_nodes], 2
        )  # (B, P, 2+C, h)
        a_sub = jnp.stack([prior, prior], 2).astype(cdt)  # (B, P, 2, C)

        eq3_w = nn.Dense(h, dtype=cdt, name="fc_eq3_w")
        eq3_u = nn.Dense(h, dtype=cdt, name="fc_eq3_u")
        eq4_w = nn.Dense(h, dtype=cdt, name="fc_eq4_w")
        eq5_w = nn.Dense(h, dtype=cdt, name="fc_eq5_w")
        eq5_u = nn.Dense(h, dtype=cdt, name="fc_eq5_u")

        hidden = x0
        for _ in range(self.time_steps):
            # eq(2): predicates → entity nodes, entities → predicate nodes
            av_ent = jnp.einsum("bpnc,bpch->bpnh", a_sub, hidden[:, :, 2:])
            av_pred = jnp.einsum("bpnc,bpnh->bpch", a_sub, hidden[:, :, :2])
            av = jnp.concatenate([av_ent, av_pred], 2)
            av = jnp.concatenate([av, av], -1)  # the reference's repeat(...,2)
            # eq(3-5); note rv reuses fc_eq3_u like the reference (:150-152)
            zv = jax.nn.sigmoid(eq3_w(av) + eq3_u(hidden))
            rv = jax.nn.sigmoid(eq4_w(av) + eq3_u(hidden))
            hv = jnp.tanh(eq5_w(av) + eq5_u(rv * hidden))
            hidden = (1 - zv) * hidden + zv * hv

        # AVERAGE_GRAPH_SUMMARY output (:160-166)
        graph = jnp.concatenate([hidden, x0], -1).mean(2)  # (B, P, 2h)
        return nn.relu(
            nn.Dense(self.output_dim, dtype=cdt, name="fc_output")(graph)
        )


class KERNPredictor(nn.Module):
    """Base KERN relation head."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    embed_dim: int = 200
    hidden_dim: int = 512
    pooling_dim: int = 4096
    in_channels: int = 4096
    time_steps: int = 3
    mode: str = "predcls"
    use_bias: bool = True
    # (num_obj, num_obj, num_rel) statistics pred-dist prior; None → uniform
    prior_matrix: Optional[np.ndarray] = None
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
        aug_obj, rel_feats = PairwiseFeatureExtractor(
            num_obj_classes=self.num_obj_classes, hidden_dim=self.hidden_dim,
            pooling_dim=self.pooling_dim, in_channels=self.in_channels,
            mode=self.mode, embed_init=self.embed_init, dtype=cdt,
            name="pairwise_feature_extractor",
        )(roi_features, union_features, boxes, box_mask, obj_labels,
          predict_logits, pred_labels, pair_idx, image_sizes, train)

        ent = nn.Dense(self.hidden_dim, dtype=cdt, name="instance_fc")(aug_obj)
        rel = nn.Dense(self.hidden_dim, dtype=cdt, name="rel_union_feat_fc")(rel_feats)

        # knowledge prior rows keyed by the pair's (predicted) classes
        if self.prior_matrix is not None:
            prior_tbl = jnp.asarray(
                np.asarray(self.prior_matrix, np.float32)[..., 1:]
            )  # drop bg predicate column
        else:
            prior_tbl = jnp.full(
                (self.num_obj_classes, self.num_obj_classes,
                 self.num_rel_classes - 1),
                1.0 / self.num_rel_classes, jnp.float32,
            )
        s_lab = _gather(pred_labels[..., None], pair_idx[..., 0])[..., 0]
        o_lab = _gather(pred_labels[..., None], pair_idx[..., 1])[..., 0]
        prior = prior_tbl[s_lab, o_lab]  # (B, P, C-1)

        ggnn_out = GGNNRel(
            num_rel_classes=self.num_rel_classes, time_steps=self.time_steps,
            hidden_dim=self.hidden_dim, output_dim=self.hidden_dim,
            dtype=cdt, name="ggnn_rel",
        )(
            _gather(ent, pair_idx[..., 0]), _gather(ent, pair_idx[..., 1]),
            rel, prior,
        )
        rel_dists = nn.Dense(
            self.num_rel_classes, dtype=jnp.float32, name="rel_classifier"
        )(ggnn_out)

        if self.mode == "predcls":
            obj_dists = jax.nn.one_hot(obj_labels, self.num_obj_classes,
                                       dtype=jnp.float32)
        else:
            obj_dists = nn.Dense(self.num_obj_classes, dtype=jnp.float32,
                                 name="obj_classifier")(ent)
        obj_preds = jnp.argmax(obj_dists, -1).astype(jnp.int32)

        if self.use_bias:
            pair_pred = jnp.stack([s_lab, o_lab], -1)
            rel_dists = rel_dists + FrequencyBias(
                num_obj_classes=self.num_obj_classes,
                num_rel_classes=self.num_rel_classes, name="freq_bias",
            )(pair_pred)
        return LegacyOutput(obj_dists, rel_dists, obj_preds)
