"""BGNN: bipartite graph network with gated message passing.

Reference: BGNNPredictor (roi_relation_predictors.py:514-709) and
BGNNContext / MessagePassingUnit_v1 / MessageFusion (model_bgnn.py:20-1030).

This is the base bipartite GNN: entity nodes and predicate nodes exchange
gated messages for ``num_iter`` steps —

  * pred→entity: every pair sends its predicate feature to its subject and
    object entities through separate gates; incoming messages average per
    entity, and (sub-msgs + obj-msgs)/2 drives a MessageFusion (GRU-flavored
    two-linear) residual update (model_bgnn.py:905-928);
  * entity→pred: each pair receives its subject/object entity features
    through gates, averaged, fused residually (:979-992).

The reference's per-image loops + dense (num_inst, num_rel) scatter maps
become batched gathers + segment-means over the padded (B, N)/(B, P) axes.

The relation-confidence-aware mode (``rel_aware=True`` on BGNNPredictor;
reference RELATION_CONFIDENCE_AWARE + model_bgnn.py:240-620) runs the
RelAwareRelFeature confidence module on the pair features, recalibrates the
relness score with the learnable-scaling gate clamp(a*x - a*b, 0, 1)
(LearnableRelatednessGating :240-250, LEARNABLE_SCALING_WEIGHT=(2.5, 0.03)),
restricts message passing to the top MP_VALID_PAIRS_NUM=200 pairs
(:600-612 — here a static top-k threshold mask instead of a dynamic index
select), weights pred→entity messages by the recalibrated relness
(RELNESS_MP_WEIGHTING), and returns the confidence logits so the engine adds
the auxiliary RelAwareLoss.  The per-iteration relness re-estimation
(rel_classifier_per_iter, gating_with_relness_logits) is folded into the
single pre-MP estimate — the shipped BGNN configs iterate the *same*
proposal-network relatedness, which is what this reproduces.
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


class GatedMessageUnit(nn.Module):
    """MessagePassingUnit_v1 (model_bgnn.py:49-108, aux gating off):
    gate = mean(sigmoid(Linear(ReLU(LayerNorm([unary; pair])))));
    message = pair * gate."""

    dim: int
    filter_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, unary: jnp.ndarray, pair: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([unary, pair], -1)
        x = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        g = nn.Dense(self.filter_dim, dtype=self.dtype, name="w")(nn.relu(x))
        gate = jax.nn.sigmoid(g).mean(-1, keepdims=True)
        return pair * gate


class MessageFusion(nn.Module):
    """model_bgnn.py MessageFusion: W_ih relu(input) + W_hh relu(hidden)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp: jnp.ndarray, hidden: jnp.ndarray) -> jnp.ndarray:
        return (
            nn.Dense(self.dim, dtype=self.dtype, name="wih")(nn.relu(inp))
            + nn.Dense(self.dim, dtype=self.dtype, name="whh")(nn.relu(hidden))
        )


class BGNNContext(nn.Module):
    """Bipartite message passing over (entities, predicates)."""

    hidden_dim: int = 512
    num_iter: int = 3
    share_iter_params: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        ent: jnp.ndarray,       # (B, N, hidden)
        rel: jnp.ndarray,       # (B, P, hidden)
        pair_idx: jnp.ndarray,  # (B, P, 2)
        pair_mask: jnp.ndarray,  # (B, P)
        box_mask: jnp.ndarray,  # (B, N)
        relness: Optional[jnp.ndarray] = None,  # (B, P) recalibrated scores
    ):
        b, n, h = ent.shape
        p = rel.shape[1]
        si, oi = pair_idx[..., 0], pair_idx[..., 1]
        pm = pair_mask[..., None].astype(self.dtype)
        if relness is not None:
            # RELNESS_MP_WEIGHTING: scale pred→entity messages by the pair's
            # confidence (model_bgnn.py prepare_message relness branch)
            pm = pm * relness[..., None].astype(self.dtype)

        n_sets = 1 if self.share_iter_params else self.num_iter
        units = [
            {
                name: GatedMessageUnit(h, dtype=self.dtype, name=f"{name}{k}")
                for name in ("gate_pred2sub", "gate_pred2obj",
                             "gate_sub2pred", "gate_obj2pred")
            }
            for k in range(n_sets)
        ]
        fusions = [
            {
                name: MessageFusion(h, dtype=self.dtype, name=f"{name}{k}")
                for name in ("object_msg_fusion", "pred_msg_fusion")
            }
            for k in range(n_sets)
        ]

        def seg_mean(vals, idx):
            def one(v, i, m):
                s = jax.ops.segment_sum(v * m, i.astype(jnp.int32), n)
                c = jax.ops.segment_sum(m, i.astype(jnp.int32), n)
                return s / jnp.maximum(c, 1.0)
            return jax.vmap(one)(vals, idx, pm)

        for t in range(self.num_iter):
            k = 0 if self.share_iter_params else t
            u, f = units[k], fusions[k]
            # pred → entity (prepare_message :668-751: unary=entity target,
            # pair=relation source; mean-aggregate per entity)
            ent_s = _gather(ent, si)
            ent_o = _gather(ent, oi)
            msg_sub = u["gate_pred2sub"](ent_s, rel)   # (B, P, h)
            msg_obj = u["gate_pred2obj"](ent_o, rel)
            agg = 0.5 * (seg_mean(msg_sub, si) + seg_mean(msg_obj, oi))
            new_ent = ent + f["object_msg_fusion"](agg, ent)
            new_ent = jnp.where(box_mask[..., None], new_ent, ent)

            # entity → pred (:979-992): unary=relation, pair=entity
            phrase_sub = u["gate_sub2pred"](rel, ent_s)
            phrase_obj = u["gate_obj2pred"](rel, ent_o)
            new_rel = rel + f["pred_msg_fusion"](
                0.5 * (phrase_sub + phrase_obj), rel
            )
            ent = new_ent
            rel = jnp.where(pair_mask[..., None], new_rel, rel)
        return ent, rel


class GPSNetContext(nn.Module):
    """GPSNet message passing (model_gpsnet.py:198-546).

    Per step: a pair-wise scalar gate from subject/object/union features
    (GatingModel :15-56), masked-softmax-normalized per subject row
    (MessageGenerator.masked_softmax :91-101), a bidirectional attention
    matmul message (:119-131), residual-free fuse
    inst' = obj2obj_msg_fuse(message + down_t(inst)) (:512-516).  The rel
    update path is disabled in the reference (commented at :522-527); final
    rel feats = pairwise(inst_final) + initial rel feats (:538).
    """

    pooling_dim: int = 4096
    hidden_dim: int = 512
    num_iter: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        inst: jnp.ndarray,       # (B, N, pooling)
        rel_feats: jnp.ndarray,  # (B, P, pooling)
        pair_idx: jnp.ndarray,
        pair_mask: jnp.ndarray,
        box_mask: jnp.ndarray,
    ):
        cdt = self.dtype
        b, n, d = inst.shape
        si, oi = pair_idx[..., 0], pair_idx[..., 1]

        ws = nn.Dense(self.hidden_dim, dtype=cdt, name="gate_ws")
        wo = nn.Dense(self.hidden_dim, dtype=cdt, name="gate_wo")
        wu = nn.Dense(self.hidden_dim, dtype=cdt, name="gate_wu")
        w = nn.Dense(32, dtype=cdt, name="gate_w")
        msg_fc = nn.Dense(d // 2, dtype=cdt, name="message_fc")
        out_fc1 = nn.Dense(d // 4, dtype=cdt, name="msg_out_fc1")
        out_ln = nn.LayerNorm(dtype=cdt, name="msg_out_ln")
        out_fc2 = nn.Dense(self.hidden_dim, dtype=cdt, name="msg_out_fc2")
        fuse = nn.Dense(self.pooling_dim, dtype=cdt, name="obj2obj_msg_fuse")
        downs = [
            nn.Dense(self.hidden_dim, dtype=cdt, name=f"inst_down{t}")
            for t in range(self.num_iter)
        ]

        for t in range(self.num_iter):
            sub_f = _gather(inst, si)
            obj_f = _gather(inst, oi)
            prod = nn.relu(ws(sub_f)) * nn.relu(wo(obj_f))
            gate = nn.relu(w(prod * nn.relu(wu(rel_feats)))).mean(-1)  # (B, P)

            # masked softmax over each subject's outgoing pairs (:91-101)
            neg = -1e9
            g = jnp.where(pair_mask, gate.astype(jnp.float32), neg)
            gmax = jnp.max(g, axis=-1, keepdims=True)
            e = jnp.exp(g - gmax) * pair_mask.astype(jnp.float32)
            denom = jax.vmap(
                lambda ee, ii: jax.ops.segment_sum(ee, ii.astype(jnp.int32), n)
            )(e, si)
            atten = e / (jnp.take_along_axis(denom, si.astype(jnp.int32), 1) + 1e-6)

            # bidirectional attention message (:119-131)
            src = msg_fc(inst)  # (B, N, d/2)
            src_o = _gather(src, oi) * atten[..., None].astype(cdt)
            fwd = jax.vmap(
                lambda v, ii: jax.ops.segment_sum(v, ii.astype(jnp.int32), n)
            )(src_o, si)
            src_s = _gather(src, si) * atten[..., None].astype(cdt)
            bwd = jax.vmap(
                lambda v, ii: jax.ops.segment_sum(v, ii.astype(jnp.int32), n)
            )(src_s, oi)
            msg = jnp.concatenate([fwd, bwd], -1)  # (B, N, d)
            msg = nn.relu(out_fc2(nn.relu(out_ln(out_fc1(msg)))))
            fused = msg + nn.relu(downs[t](inst))
            new_inst = nn.relu(fuse(fused))
            inst = jnp.where(box_mask[..., None], new_inst, inst)

        # final rel feats: pairwise(inst) + initial (:367-375, :538)
        updim = nn.relu(
            nn.Dense(self.hidden_dim * 2, dtype=cdt,
                     name="pairwise_obj_feat_updim_fc")(inst)
        )
        head = updim[..., : self.hidden_dim]
        tail = updim[..., self.hidden_dim:]
        paired = jnp.concatenate(
            [_gather(head, si), _gather(tail, oi)], -1
        )
        paired = nn.relu(
            nn.Dense(self.pooling_dim, dtype=cdt,
                     name="pairwise_rel_feat_finalize_fc")(paired)
        )
        return inst, paired + rel_feats


class GPSNetPredictor(nn.Module):
    """GPSNet relation predictor (roi_relation_predictors.py:709-856)."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    embed_dim: int = 200
    hidden_dim: int = 512
    pooling_dim: int = 4096
    in_channels: int = 4096
    num_iter: int = 2
    mode: str = "predcls"
    use_bias: bool = True
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

        ent, rel = GPSNetContext(
            pooling_dim=self.pooling_dim, hidden_dim=self.hidden_dim,
            num_iter=self.num_iter, dtype=cdt, name="context_layer",
        )(aug_obj, rel_feats, pair_idx, pair_mask, box_mask)

        if self.mode == "predcls":
            obj_dists = jax.nn.one_hot(obj_labels, self.num_obj_classes,
                                       dtype=jnp.float32)
        else:
            obj_dists = nn.Dense(self.num_obj_classes, dtype=jnp.float32,
                                 name="obj_classifier")(ent)
        rel_dists = nn.Dense(self.num_rel_classes, dtype=jnp.float32,
                             name="rel_classifier")(rel)
        obj_preds = jnp.argmax(obj_dists, -1).astype(jnp.int32)

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
        return LegacyOutput(obj_dists, rel_dists, obj_preds)


class BGNNPredictor(nn.Module):
    """BGNN relation predictor (roi_relation_predictors.py:514-709)."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    embed_dim: int = 200
    hidden_dim: int = 512
    pooling_dim: int = 4096
    in_channels: int = 4096
    num_iter: int = 3
    mode: str = "predcls"
    use_bias: bool = True
    # relation-confidence-aware mode (RELATION_CONFIDENCE_AWARE)
    rel_aware: bool = False
    mp_valid_pairs: int = 200           # MP_VALID_PAIRS_NUM
    scaling_weight: tuple = (2.5, 0.03)  # LEARNABLE_SCALING_WEIGHT (a, b)
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

        relness_logits = None
        relness = None
        mp_mask = pair_mask
        if self.rel_aware:
            from ..rel_proposal import RelAwareRelFeature

            out_rel = RelAwareRelFeature(
                num_obj_classes=self.num_obj_classes,
                num_rel_classes=self.num_rel_classes,
                dtype=cdt, name="relation_conf_aware_models",
            )(rel_feats, boxes, predict_logits, pair_idx, pair_mask,
              image_sizes)
            relness_logits = out_rel.logits
            # learnable-scaling recalibration clamp(a*x - a*b, 0, 1)
            a0, b0 = self.scaling_weight
            alpha = self.param("relness_alpha",
                               lambda *_: jnp.asarray([a0], jnp.float32))
            scores = jax.lax.stop_gradient(out_rel.scores).astype(jnp.float32)
            relness = jnp.clip(alpha * scores - alpha * b0, 0.0, 1.0)
            # static top-k pair filter: threshold at the k-th best score
            masked = jnp.where(pair_mask, scores, -jnp.inf)
            k = min(self.mp_valid_pairs, pair_mask.shape[1])
            kth = jax.lax.top_k(masked, k)[0][..., -1]
            mp_mask = pair_mask & (masked >= kth[..., None])

        ent = nn.relu(
            nn.Dense(self.hidden_dim, dtype=cdt, name="obj_downdim_fc")(aug_obj)
        )
        rel = nn.relu(
            nn.Dense(self.hidden_dim, dtype=cdt, name="rel_downdim_fc")(rel_feats)
        )
        ent, rel = BGNNContext(
            hidden_dim=self.hidden_dim, num_iter=self.num_iter, dtype=cdt,
            name="context_layer",
        )(ent, rel, pair_idx, mp_mask, box_mask, relness=relness)

        if self.mode == "predcls":
            obj_dists = jax.nn.one_hot(obj_labels, self.num_obj_classes,
                                       dtype=jnp.float32)
        else:
            obj_dists = nn.Dense(self.num_obj_classes, dtype=jnp.float32,
                                 name="obj_classifier")(ent)
        rel_dists = nn.Dense(self.num_rel_classes, dtype=jnp.float32,
                             name="rel_classifier")(rel)
        obj_preds = jnp.argmax(obj_dists, -1).astype(jnp.int32)

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
                            relness_logits=relness_logits)


class MSDNPredictor(BGNNPredictor):
    """MSDN (roi_relation_predictors.py:322-514, model_msdn.py:20-449).

    The reference MSDN context is the base bipartite gated message passing
    — the same MessagePassingUnit_v1 / MessageFusion updates as BGNN with
    the relation-confidence machinery absent, which is exactly what
    :class:`BGNNPredictor` implements here (num_iter defaults likewise to
    the GRAPH_ITERATION_NUM used by both).  Registered as its own predictor
    name for config parity with the reference registry.
    """
