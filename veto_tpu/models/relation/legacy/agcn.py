"""AGRCNN: Graph R-CNN attentional graph convolution predictor.

Re-design of the reference AGRCNNPredictor
(roi_relation_predictors.py:856-995) + GRCNN (model_agcn.py:17-310):
object/predicate nodes on a bipartite graph, messages collected with
per-target multi-head attention over adjacent nodes, two rounds at the
feature level and two at the score (logit) level.

TPU-first redesign: the reference's prepare_message (model_agcn.py:330-389)
builds, per target node, a python-loop gather of its incoming neighbours
padded to max-degree and runs torch MultiheadAttention with a 1-token query.
That is exactly dense masked cross-attention with the adjacency matrix as
the attention mask — so each collect unit here is one batched masked MHA
over the full (targets, sources) grid; nodes without incoming edges keep
their features (the reference's ``vaild_mp_idx`` select-update).

Faithfully kept reference quirks (documented inline):
  * every update gate uses the REL2OBJ / SUB2REL validity sets
    (model_agcn.py:208-216, :227-233) rather than per-message sets;
  * the feature-level predicate update feeds the predicate features as both
    target AND source (model_agcn.py:228-231), i.e. valid predicates double
    rather than receive the averaged object message;
  * UpdateUnit is plain addition (model_agcn.py:325-334).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..freq_bias import FrequencyBias
from veto_tpu.ops.nms import obj_prediction_nms

from .context import PairwiseFeatureExtractor
from .predictors import LegacyOutput, _gather


class AdjacencyMHA(nn.Module):
    """One GraphConvolutionCollectLayer unit (model_agcn.py:392-422).

    ``source`` is first passed through ReLU(trans_fc(source))
    (prepare_message :332), then a torch-style MultiheadAttention with a
    single query per target, keys/values = the target's incoming neighbours.
    Batched as dense masked attention; returns (message (B, T, D),
    valid (B, T) — targets with ≥1 incoming edge).
    """

    dim: int
    heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, target, source, adj):
        """target (B,T,Dt), source (B,S,Ds), adj (B,T,S) — nonzero = edge."""
        cdt = self.dtype
        d, h = self.dim, self.heads
        dh = d // h
        src = nn.relu(nn.Dense(d, dtype=cdt, name="trans_fc")(source.astype(cdt)))
        q = nn.Dense(d, dtype=cdt, name="q_proj")(target.astype(cdt))
        k = nn.Dense(d, dtype=cdt, name="k_proj")(src)
        v = nn.Dense(d, dtype=cdt, name="v_proj")(src)
        b, t = q.shape[:2]
        s = k.shape[1]
        q = q.reshape(b, t, h, dh)
        k = k.reshape(b, s, h, dh)
        v = v.reshape(b, s, h, dh)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(dh)
        edge = adj > 0
        scores = jnp.where(edge[:, None, :, :], scores.astype(jnp.float32), -1e9)
        attn = jax.nn.softmax(scores, axis=-1).astype(cdt)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, t, d)
        out = nn.Dense(d, dtype=cdt, name="out_proj")(out)
        valid = edge.any(-1)
        return jnp.where(valid[..., None], out, 0.0), valid


class GRCNNContext(nn.Module):
    """The GRCNN graph module (model_agcn.py:17-310) on padded tensors."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    in_dim: int = 4096
    hidden_dim: int = 1024          # GRCNN_MODULE.GRAPH_HIDDEN_DIM
    feat_update_step: int = 2
    score_update_step: int = 2
    # MP_ON_VALID_PAIRS: restrict message passing to the top-K pairs by
    # relatedness.  The reference budget (MP_VALID_PAIRS_NUM=200) is global
    # across the batch; here it is per image (static shapes).
    mp_on_valid_pairs: bool = False
    mp_valid_pairs: int = 200
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        obj_feats: jnp.ndarray,     # (B, N, in_dim) augmented object feats
        rel_feats: jnp.ndarray,     # (B, P, in_dim) pair feats
        box_mask: jnp.ndarray,      # (B, N)
        pair_idx: jnp.ndarray,      # (B, P, 2)
        pair_mask: jnp.ndarray,     # (B, P)
        relness: Optional[jnp.ndarray] = None,  # (B, P) relatedness scores
    ):
        cdt = self.dtype
        dim = self.hidden_dim
        b, n = box_mask.shape
        p = pair_mask.shape[1]
        si, oi = pair_idx[..., 0], pair_idx[..., 1]

        # ---- adjacency maps (_get_map_idxs :74-168)
        mp_pair = pair_mask
        if self.mp_on_valid_pairs and relness is not None:
            k = min(self.mp_valid_pairs, p)
            score = jnp.where(pair_mask, relness, -jnp.inf)
            kth = jnp.sort(score, axis=-1)[:, -k][:, None]
            mp_pair = pair_mask & (score >= kth)
        pm = mp_pair.astype(cdt)
        sub_onehot = jax.nn.one_hot(si, n, dtype=cdt) * pm[..., None]  # (B,P,N)
        obj_onehot = jax.nn.one_hot(oi, n, dtype=cdt) * pm[..., None]
        subj_pred_map = jnp.swapaxes(sub_onehot, 1, 2)  # (B, N, P)
        obj_pred_map = jnp.swapaxes(obj_onehot, 1, 2)
        obj_obj_map = jnp.einsum("bpn,bpm->bnm", sub_onehot, obj_onehot)
        obj_obj_map = ((obj_obj_map + jnp.swapaxes(obj_obj_map, 1, 2)) > 0)
        obj_obj_map = obj_obj_map.astype(cdt) * box_mask[:, :, None] * box_mask[:, None, :]

        def mlp(name, x):
            y = nn.Dense(dim, dtype=cdt, name=f"{name}_fc1")(x.astype(cdt))
            return nn.Dense(dim, dtype=cdt, name=f"{name}_fc2")(nn.relu(y))

        x_obj = mlp("obj_embedding", obj_feats)
        x_pred = mlp("rel_embedding", rel_feats)

        # collect units shared across steps (ctor once, loop reuse :52-56)
        units_feat = {
            name: AdjacencyMHA(dim, 4, dtype=cdt, name=f"collect_feat_{name}")
            for name in ("rel2sub", "rel2obj", "sub2rel", "obj2rel", "inst2inst")
        }
        for _ in range(self.feat_update_step):
            msg_obj, _ = units_feat["inst2inst"](x_obj, x_obj, obj_obj_map)
            msg_sub, _ = units_feat["rel2sub"](x_obj, x_pred, subj_pred_map)
            msg_o, valid_rel_obj = units_feat["rel2obj"](x_obj, x_pred, obj_pred_map)
            ent_msg = (msg_obj + msg_sub + msg_o) / 3.0
            # update gated on the REL2OBJ validity set (:208-216)
            x_obj = jnp.where(valid_rel_obj[..., None], x_obj + ent_msg, x_obj)

            _, valid_obj_rel = units_feat["sub2rel"](
                x_pred, x_obj, jnp.swapaxes(subj_pred_map, 1, 2))
            _, _ = units_feat["obj2rel"](
                x_pred, x_obj, jnp.swapaxes(obj_pred_map, 1, 2))
            # reference quirk: target AND source are both the predicate
            # features (:227-233) → valid predicates double
            x_pred = jnp.where(valid_obj_rel[..., None], x_pred + x_pred, x_pred)

        obj_logits = nn.Dense(
            self.num_obj_classes, dtype=jnp.float32, name="obj_hidden_embedding"
        )(nn.relu(x_obj))
        rel_logits = nn.Dense(
            self.num_rel_classes, dtype=jnp.float32, name="rel_hidden_embedding"
        )(nn.relu(x_pred))

        units_score_obj = {
            name: AdjacencyMHA(self.num_obj_classes, 1, dtype=jnp.float32,
                               name=f"collect_score_{name}")
            for name in ("rel2sub", "rel2obj", "inst2inst")
        }
        units_score_rel = {
            name: AdjacencyMHA(self.num_rel_classes, 1, dtype=jnp.float32,
                               name=f"collect_score_{name}")
            for name in ("sub2rel", "obj2rel")
        }
        for _ in range(self.score_update_step):
            msg_obj, _ = units_score_obj["inst2inst"](obj_logits, obj_logits, obj_obj_map)
            msg_sub, _ = units_score_obj["rel2sub"](obj_logits, rel_logits, subj_pred_map)
            msg_o, valid_rel_obj = units_score_obj["rel2obj"](
                obj_logits, rel_logits, obj_pred_map)
            ent_msg = (msg_obj + msg_sub + msg_o) / 3.0
            obj_logits = jnp.where(
                valid_rel_obj[..., None], obj_logits + ent_msg, obj_logits)

            msg_s, valid_obj_rel = units_score_rel["sub2rel"](
                rel_logits, obj_logits, jnp.swapaxes(subj_pred_map, 1, 2))
            msg_t, _ = units_score_rel["obj2rel"](
                rel_logits, obj_logits, jnp.swapaxes(obj_pred_map, 1, 2))
            rel_msg = (msg_s + msg_t) / 2.0
            rel_logits = jnp.where(
                valid_obj_rel[..., None], rel_logits + rel_msg, rel_logits)

        return obj_logits, rel_logits


class AGRCNNPredictor(nn.Module):
    """roi_relation_predictors.py:856-995 on the padded batched layout."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    hidden_dim: int = 512            # unused (interface uniformity)
    pooling_dim: int = 4096
    in_channels: int = 4096
    graph_hidden_dim: int = 1024
    feat_update_step: int = 2
    score_update_step: int = 2
    mode: str = "predcls"
    use_bias: bool = True            # FREQUENCY_BAIS (sic)
    # REL_OBJ_MULTI_TASK_LOSS: refine object logits and re-NMS labels
    use_obj_recls_logits: bool = False
    obj_recls_manner: str = "replace"  # OBJECT_CLASSIFICATION_MANNER
    mp_on_valid_pairs: bool = False
    mp_valid_pairs: int = 200
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
        relness: Optional[jnp.ndarray] = None,
    ) -> LegacyOutput:
        if pred_labels is None:
            pred_labels = obj_labels
        si, oi = pair_idx[..., 0], pair_idx[..., 1]

        aug_obj, rel_feats = PairwiseFeatureExtractor(
            num_obj_classes=self.num_obj_classes, hidden_dim=512,
            pooling_dim=self.pooling_dim, in_channels=self.in_channels,
            mode=self.mode, embed_init=self.embed_init, dtype=self.dtype,
            name="pairwise_feature_extractor",
        )(roi_features, union_features, boxes, box_mask, obj_labels,
          predict_logits, pred_labels, pair_idx, image_sizes, train)

        ctx_obj_logits, ctx_rel_logits = GRCNNContext(
            num_obj_classes=self.num_obj_classes,
            num_rel_classes=self.num_rel_classes,
            in_dim=self.pooling_dim, hidden_dim=self.graph_hidden_dim,
            feat_update_step=self.feat_update_step,
            score_update_step=self.score_update_step,
            mp_on_valid_pairs=self.mp_on_valid_pairs,
            mp_valid_pairs=self.mp_valid_pairs,
            dtype=self.dtype, name="context_layer",
        )(aug_obj, rel_feats, box_mask, pair_idx, pair_mask, relness)

        # final 1:1 classifiers (build_classifier(num_cls, num_cls) :891-892)
        if self.mode == "predcls":
            refined_obj_logits = (
                jax.nn.one_hot(obj_labels, self.num_obj_classes) * 2000.0
                - 1000.0
            )  # to_onehot fill=1000 (utils_motifs.py:92-103)
        else:
            refined_obj_logits = nn.Dense(
                self.num_obj_classes, dtype=jnp.float32, name="obj_classifier"
            )(ctx_obj_logits)
        rel_cls_logits = nn.Dense(
            self.num_rel_classes, dtype=jnp.float32, name="rel_classifier"
        )(ctx_rel_logits)

        obj_pred_logits = predict_logits
        if self.use_obj_recls_logits and self.mode != "predcls":
            if self.obj_recls_manner == "add":
                obj_pred_logits = refined_obj_logits + predict_logits
            else:
                obj_pred_logits = refined_obj_logits
            bpc = (
                boxes_per_cls
                if boxes_per_cls is not None
                else jnp.broadcast_to(
                    boxes[:, :, None, :],
                    boxes.shape[:2] + (self.num_obj_classes, 4),
                )
            )
            obj_pred_labels = jax.vmap(
                lambda bx, lg, m: obj_prediction_nms(
                    bx, lg, 0.5, valid_mask=m)
            )(bpc, obj_pred_logits, box_mask)
        else:
            obj_pred_labels = pred_labels

        if self.use_bias:
            pair_pred = jnp.stack(
                [
                    _gather(obj_pred_labels[..., None], si)[..., 0],
                    _gather(obj_pred_labels[..., None], oi)[..., 0],
                ],
                -1,
            )
            rel_cls_logits = rel_cls_logits + FrequencyBias(
                num_obj_classes=self.num_obj_classes,
                num_rel_classes=self.num_rel_classes, name="freq_bias",
            )(pair_pred)

        # in predcls the returned obj logits must be the GT one-hots so the
        # shared obj-loss path is a no-op (reference returns obj_pred_logits
        # = detector logits; our engine trains on LegacyOutput.obj_dists)
        out_obj = refined_obj_logits if self.mode == "predcls" else obj_pred_logits
        return LegacyOutput(out_obj, rel_cls_logits, obj_pred_labels)
