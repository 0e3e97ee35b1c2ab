"""Causal analysis predictor (TDE — Tang et al., "Unbiased Scene Graph
Generation from Biased Training").

Re-design of CausalAnalysisPredictor
(roi_relation_predictors.py:3254-3658): a Motifs context feeds three logit
branches — context (post_cat of head/tail pair reps, optionally modulated by
a 32-d pair-geometry spatial embedding), visual (union features), and the
frequency bias — fused by 'sum' or 'gate' (:3617-3646).  During training,
moving averages of the "untreated" features accumulate (decoder input inside
the context, spatial embedding input, union features — :3555-3563, stored in
batch_stats); at inference the causal effect subtracts the counterfactual:

  TDE:  logits(ctx, vis, frq) - logits(ctx̄, vis, frq)      (:3586-3589)
  NIE:  logits(ctx̄, vis, frq) - logits(ctx̄, vis, frq̄)
  TE:   logits(ctx, vis, frq) - logits(ctx̄, vis, frq̄)

where the frequency branch uses the soft pair-probability lookup
(FrequencyBias.index_with_probability, model_motifs.py:41-51).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..freq_bias import FrequencyBias
from .context import _box_pair_info
from .predictors import LSTMContext, LegacyOutput, _gather


class VTransEContext(nn.Module):
    """VTransEFeature (model_vtranse.py:12-108): a linear object classifier
    over roi+embed+geometry features and a one-layer edge representation,
    with Causal-TDE untreated buffers."""

    num_obj_classes: int = 151
    embed_dim: int = 200
    hidden_dim: int = 512
    mode: str = "predcls"
    effect_analysis: bool = False
    average_ratio: float = 0.0005
    embed_init: Optional[np.ndarray] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        roi_features: jnp.ndarray,
        boxes: jnp.ndarray,
        box_mask: jnp.ndarray,
        obj_labels: jnp.ndarray,
        predict_logits: jnp.ndarray,
        image_sizes: jnp.ndarray,
        boxes_per_cls: Optional[jnp.ndarray] = None,
        train: bool = False,
        ctx_average: bool = False,
    ):
        from veto_tpu.ops.box_ops import encode_box_info

        cdt = self.dtype
        init = (
            nn.initializers.normal(1.0)
            if self.embed_init is None
            else lambda *_: jnp.asarray(self.embed_init)
        )
        embed1 = nn.Embed(self.num_obj_classes, self.embed_dim,
                          embedding_init=init, dtype=cdt, name="obj_embed1")
        embed2 = nn.Embed(self.num_obj_classes, self.embed_dim,
                          embedding_init=init, dtype=cdt, name="obj_embed2")
        if self.mode == "predcls":
            obj_embed = embed1(obj_labels)
        else:
            probs = jax.nn.softmax(predict_logits.astype(jnp.float32), -1)
            obj_embed = probs.astype(cdt) @ embed1.embedding.astype(cdt)

        binfo = encode_box_info(boxes, image_sizes).astype(cdt)
        pos = nn.Dense(32, dtype=cdt, name="pos_fc1")(binfo)
        pos = nn.BatchNorm(use_running_average=not train, momentum=0.999,
                           dtype=cdt, name="pos_bn")(pos)
        pos = nn.relu(nn.Dense(128, dtype=cdt, name="pos_fc2")(pos))

        x = roi_features.astype(cdt)
        obj_pre = jnp.concatenate([x, obj_embed, pos], -1)
        d_obj = obj_pre.shape[-1]
        d_edg = x.shape[-1] + 128

        if self.effect_analysis:
            u_obj = self.variable("batch_stats", "untreated_obj_feat",
                                  lambda: jnp.zeros((d_obj,), jnp.float32))
            u_edg = self.variable("batch_stats", "untreated_edg_feat",
                                  lambda: jnp.zeros((d_edg,), jnp.float32))
            if train and not self.is_initializing():
                m = box_mask.reshape(-1).astype(jnp.float32)
                cnt = jnp.maximum(m.sum(), 1.0)

                def mavg(h, t):
                    mean = (t.reshape(-1, t.shape[-1]).astype(jnp.float32)
                            * m[:, None]).sum(0) / cnt
                    return h * (1 - self.average_ratio) + self.average_ratio * mean

                u_obj.value = mavg(u_obj.value, obj_pre)
                u_edg.value = mavg(
                    u_edg.value, jnp.concatenate([x, pos], -1)
                )
            if ctx_average and not train:
                obj_pre = jnp.broadcast_to(
                    u_obj.value.astype(cdt), obj_pre.shape
                )

        obj_dists = nn.Dense(self.num_obj_classes, dtype=jnp.float32,
                             name="pred_layer")(obj_pre)
        obj_preds = jnp.argmax(obj_dists, -1).astype(jnp.int32)

        if self.effect_analysis and ctx_average and not train:
            e2 = jax.nn.softmax(obj_dists, -1).astype(cdt) @ embed2.embedding.astype(cdt)
            edge_pre = jnp.concatenate(
                [jnp.broadcast_to(u_edg.value.astype(cdt),
                                  obj_pre.shape[:-1] + (d_edg,)), e2], -1
            )
        else:
            edge_pre = jnp.concatenate([x, pos, embed2(obj_preds)], -1)
        edge_ctx = nn.relu(
            nn.Dense(self.hidden_dim, dtype=cdt, name="fc_layer")(edge_pre)
        )
        return obj_dists, obj_preds, edge_ctx


class CausalPredictor(nn.Module):
    """CausalAnalysisPredictor; ``context_layer`` selects motifs | vtranse
    (CAUSAL.CONTEXT_LAYER, :3277-3286)."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    embed_dim: int = 200
    hidden_dim: int = 512
    pooling_dim: int = 4096
    in_channels: int = 4096
    mode: str = "predcls"
    context_layer: str = "motifs"  # 'motifs' | 'vtranse'
    fusion_type: str = "sum"     # 'sum' | 'gate'
    effect_type: str = "none"    # 'none' | 'TDE' | 'NIE' | 'TE'
    spatial_for_vision: bool = True
    average_ratio: float = 0.0005
    embed_init: Optional[np.ndarray] = None
    dtype: Any = jnp.float32

    def _logits(self, params, vis_rep, ctx_rep, frq_rep, soft_freq):
        """calculate_logits (:3617-3646)."""
        vis_c, ctx_c, gate_c, freq_bias = params
        if soft_freq:
            frq = freq_bias.index_with_probability(frq_rep)
        else:
            frq = freq_bias(frq_rep)
        vis = vis_c(vis_rep)
        ctx = ctx_c(ctx_rep)
        if self.fusion_type == "gate":
            gate = gate_c(ctx_rep)
            return ctx * jax.nn.sigmoid(vis + frq + gate)
        return vis + ctx + frq

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
    ) -> LegacyOutput:
        cdt = self.dtype
        effect = self.effect_type != "none" and not train

        if self.context_layer == "vtranse":
            context = VTransEContext(
                num_obj_classes=self.num_obj_classes, embed_dim=self.embed_dim,
                hidden_dim=self.hidden_dim, mode=self.mode,
                effect_analysis=self.effect_type != "none",
                embed_init=self.embed_init, dtype=cdt, name="context_layer",
            )
        else:
            context = LSTMContext(
                num_obj_classes=self.num_obj_classes, embed_dim=self.embed_dim,
                hidden_dim=self.hidden_dim, mode=self.mode,
                effect_analysis=self.effect_type != "none",
                embed_init=self.embed_init, dtype=cdt, name="context_layer",
            )
        ctx_args = (roi_features, boxes, box_mask, obj_labels, predict_logits,
                    image_sizes, boxes_per_cls)

        post_emb = nn.Dense(
            self.hidden_dim * 2, dtype=cdt,
            kernel_init=nn.initializers.normal(10.0 * self.hidden_dim ** -0.5),
            name="post_emb",
        )
        post_cat = nn.Dense(
            self.pooling_dim, dtype=cdt,
            kernel_init=nn.initializers.xavier_uniform(), name="post_cat",
        )

        def pair_reps(edge_ctx, obj_dists, obj_preds):
            edge_rep = post_emb(edge_ctx)
            head = edge_rep[..., : self.hidden_dim]
            tail = edge_rep[..., self.hidden_dim:]
            prod = jnp.concatenate(
                [_gather(head, pair_idx[..., 0]), _gather(tail, pair_idx[..., 1])],
                -1,
            )
            post_ctx = nn.relu(post_cat(prod))
            prob = jax.nn.softmax(obj_dists.astype(jnp.float32), -1)
            pair_prob = jnp.stack(
                [_gather(prob, pair_idx[..., 0]), _gather(prob, pair_idx[..., 1])],
                -1,
            )  # (B, P, num_obj, 2)
            pair_pred = jnp.stack(
                [
                    _gather(obj_preds[..., None], pair_idx[..., 0])[..., 0],
                    _gather(obj_preds[..., None], pair_idx[..., 1])[..., 0],
                ],
                -1,
            )
            return post_ctx, pair_prob, pair_pred

        obj_dists, obj_preds, edge_ctx = context(*ctx_args, train=train)
        post_ctx, pair_prob, pair_pred = pair_reps(edge_ctx, obj_dists, obj_preds)

        # spatial modulation (:3512-3514) + untreated buffers (:3555-3563)
        pair_geo = _box_pair_info(boxes, image_sizes, pair_idx).astype(cdt)
        spt_emb = nn.Sequential([
            nn.Dense(self.hidden_dim, dtype=cdt,
                     kernel_init=nn.initializers.xavier_uniform()),
            nn.relu,
            nn.Dense(self.pooling_dim, dtype=cdt,
                     kernel_init=nn.initializers.xavier_uniform()),
            nn.relu,
        ])
        uf = union_features.astype(cdt)
        if self.pooling_dim != self.in_channels:
            uf = nn.Dense(self.pooling_dim, dtype=cdt, name="up_dim")(uf)

        if self.spatial_for_vision:
            post_ctx = post_ctx * spt_emb(pair_geo)

        if self.effect_type != "none":
            untreated_spt = self.variable(
                "batch_stats", "untreated_spt", lambda: jnp.zeros((32,), jnp.float32)
            )
            avg_post_ctx = self.variable(
                "batch_stats", "avg_post_ctx",
                lambda: jnp.zeros((self.pooling_dim,), jnp.float32),
            )
            untreated_feat = self.variable(
                "batch_stats", "untreated_feat",
                lambda: jnp.zeros((self.pooling_dim,), jnp.float32),
            )
            if train and not self.is_initializing():
                m = pair_mask.reshape(-1).astype(jnp.float32)
                cnt = jnp.maximum(m.sum(), 1.0)

                def mavg(holder, x):
                    mean = (x.reshape(-1, x.shape[-1]).astype(jnp.float32)
                            * m[:, None]).sum(0) / cnt
                    return holder * (1 - self.average_ratio) + self.average_ratio * mean

                untreated_spt.value = mavg(untreated_spt.value, pair_geo)
                avg_post_ctx.value = mavg(avg_post_ctx.value, post_ctx)
                untreated_feat.value = mavg(untreated_feat.value, uf)

        vis_c = nn.Dense(self.num_rel_classes, dtype=jnp.float32,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="vis_compress")
        ctx_c = nn.Dense(self.num_rel_classes, dtype=jnp.float32,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="ctx_compress")
        gate_c = nn.Dense(self.num_rel_classes, dtype=jnp.float32,
                          kernel_init=nn.initializers.xavier_uniform(),
                          name="ctx_gate_fc")
        freq_bias = FrequencyBias(
            num_obj_classes=self.num_obj_classes,
            num_rel_classes=self.num_rel_classes, name="freq_bias",
        )
        branch = (vis_c, ctx_c, gate_c, freq_bias)

        if not effect:
            # training path uses hard pair labels (:3521 use_label_dist=False)
            rel_dists = self._logits(branch, uf, post_ctx, pair_pred, False)
            return LegacyOutput(obj_dists, rel_dists, obj_preds)

        # counterfactual ("untreated") context forward (:3488-3505)
        avg_dists, avg_preds, avg_edge = context(*ctx_args, train=False,
                                                 ctx_average=True)
        avg_post_ctx_rep, avg_pair_prob, _ = pair_reps(avg_edge, avg_dists, avg_preds)
        avg_ctx = avg_post_ctx_rep
        if self.spatial_for_vision:
            avg_ctx = avg_ctx * spt_emb(
                jnp.broadcast_to(
                    untreated_spt.value.astype(cdt), pair_geo.shape
                )
            )
        avg_ctx = jax.lax.stop_gradient(avg_ctx)
        avg_frq = jax.lax.stop_gradient(avg_pair_prob)

        if self.effect_type == "TDE":
            rel_dists = (
                self._logits(branch, uf, post_ctx, pair_prob, True)
                - self._logits(branch, uf, avg_ctx, pair_prob, True)
            )
        elif self.effect_type == "NIE":
            rel_dists = (
                self._logits(branch, uf, avg_ctx, pair_prob, True)
                - self._logits(branch, uf, avg_ctx, avg_frq, True)
            )
        else:  # TE
            rel_dists = (
                self._logits(branch, uf, post_ctx, pair_prob, True)
                - self._logits(branch, uf, avg_ctx, avg_frq, True)
            )
        return LegacyOutput(obj_dists, rel_dists, obj_preds)
