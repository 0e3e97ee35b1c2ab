"""Legacy relation predictors: Transformer, IMP, Motifs (+VCTree later).

Re-designs of the reference zoo (roi_relation_predictors.py):
  * TransformerPredictor (:57-207) — TransformerContext + union-gated heads.
  * IMPPredictor (:207-322) — iterative GRU message passing (IMPContext,
    model_msg_passing.py:14-109) over the proposal/pair bipartite graph.
  * MotifPredictor (:995-1152) — neural-motifs biLSTM context
    (model_motifs.py LSTMContext:224-420 + DecoderRNN:58-223).

All operate on the padded batched layout: (B, N) proposals with 4096-d
pooled features, (B, P) pairs with union features.  The per-image loops of
the reference become gathers/segment-sums; torch PackedSequence sorting
becomes an explicit center-x permutation (lstm.centerx_perm).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from veto_tpu.ops.nms import obj_prediction_nms

from ..freq_bias import FrequencyBias
from .context import PairwiseFeatureExtractor, SHAContext, TransformerContext
from .lstm import HighwayDecoderLSTM, MaskedBiLSTM, centerx_perm


class LegacyOutput(NamedTuple):
    obj_dists: jnp.ndarray   # (B, N, num_obj) refined object logits
    rel_dists: jnp.ndarray   # (B, P, num_rel); None in MEET-ensemble mode
    obj_preds: jnp.ndarray   # (B, N) refined object labels
    # (B, N, N) pair-relatedness logits for VCTree's auxiliary binary loss
    binary_preds: Optional[jnp.ndarray] = None
    # MEET mode: [expert][group] (B, P, gs+2) logits (consumed by the same
    # meet_losses / postprocess machinery as VETOPredictor_MEET)
    group_logits: Optional[Tuple[Tuple[jnp.ndarray, ...], ...]] = None
    # ATTRIBUTE_ON: (B, N, num_att) attribute logits (or GT multi-hot in
    # predcls), roi_relation_predictors.py:1147-1150
    att_dists: Optional[jnp.ndarray] = None
    # (B, P, C-1+1) relation-confidence logits (RelatednessTestPredictor)
    # for the auxiliary RelAwareLoss
    relness_logits: Optional[jnp.ndarray] = None


class MeetRelHeads(nn.Module):
    """Per-expert/per-group relation classifiers for the *_MEET variants.

    Reference: MotifPredictor_MEET / VCTreePredictor_MEET heads
    (roi_relation_predictors.py:1410-1424, :2070-2084 — ``rel_out[k]`` per
    group on the pair representation) and TransLikePredictor_MEET's dual
    visual/context heads (:1673-1679, :1805-1816 — ``rel_out[k](visual_rep) +
    context_out[k](prod_rep)``).  Each group classifier has ``gs + 2``
    outputs (bg + members + OOD), matching veto_tpu's MeetPredictor naming
    so the engine's routing/loss/vote code is shared verbatim.
    """

    group_sizes: Tuple[int, ...]
    experts: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feat: jnp.ndarray,                 # (B, P, D) pair representation
        ctx_feat: Optional[jnp.ndarray] = None,  # TransLike dual-head input
    ) -> Tuple[Tuple[jnp.ndarray, ...], ...]:
        out = []
        for e in range(self.experts):
            heads = []
            for k, gs in enumerate(self.group_sizes):
                logits = nn.Dense(
                    gs + 2, dtype=jnp.float32,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name=f"rel_out_e{e}_g{k}",
                )(feat)
                if ctx_feat is not None:
                    logits = logits + nn.Dense(
                        gs + 2, dtype=jnp.float32,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"ctx_out_e{e}_g{k}",
                    )(ctx_feat)
                heads.append(logits)
            out.append(tuple(heads))
        return tuple(out)


def _gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis over the proposal axis; idx (B, P)."""
    shape = idx.shape + (1,) * (x.ndim - 2)
    return jnp.take_along_axis(x, idx.reshape(shape).astype(jnp.int32), axis=1)


class TransformerPredictor(nn.Module):
    """Self-attention context + union-gated relation head (:57-207)."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    embed_dim: int = 200
    hidden_dim: int = 512
    pooling_dim: int = 4096
    in_channels: int = 4096
    obj_layers: int = 4
    edge_layers: int = 2
    heads: int = 8
    inner_dim: int = 2048
    k_dim: int = 64
    v_dim: int = 64
    mode: str = "predcls"
    use_vision: bool = True
    use_bias: bool = False
    # "self_attention" → TransformerContext; "sha" → hybrid-attention
    # SHA_Context (TransLikePredictor, hybrid_attention.py:112-209)
    context_type: str = "self_attention"
    # MEET ensemble: per-group heads replace rel/ctx_compress
    # (TransLikePredictor_MEET, roi_relation_predictors.py:1581-1828)
    meet_group_sizes: Optional[Tuple[int, ...]] = None
    meet_experts: int = 1
    embed_init: Optional[np.ndarray] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        boxes: jnp.ndarray,           # (B, N, 4)
        box_mask: jnp.ndarray,        # (B, N)
        obj_labels: jnp.ndarray,      # (B, N) GT (predcls/train) or pred labels
        predict_logits: jnp.ndarray,  # (B, N, num_obj)
        pair_idx: jnp.ndarray,        # (B, P, 2)
        pair_mask: jnp.ndarray,       # (B, P)
        roi_features: jnp.ndarray,    # (B, N, D)
        union_features: jnp.ndarray,  # (B, P, D)
        image_sizes: jnp.ndarray,     # (B, 2)
        boxes_per_cls: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> LegacyOutput:
        cdt = self.dtype
        ctx_cls = SHAContext if self.context_type == "sha" else TransformerContext
        obj_dists, obj_preds, edge_ctx = ctx_cls(
            num_obj_classes=self.num_obj_classes, embed_dim=self.embed_dim,
            hidden_dim=self.hidden_dim, obj_layers=self.obj_layers,
            edge_layers=self.edge_layers, heads=self.heads,
            inner_dim=self.inner_dim, k_dim=self.k_dim, v_dim=self.v_dim,
            mode=self.mode, embed_init=self.embed_init, dtype=cdt,
            name="context_layer",
        )(roi_features, boxes, box_mask, obj_labels, predict_logits,
          image_sizes, boxes_per_cls, train)

        # head/tail split (:157-162)
        edge_rep = nn.Dense(
            self.hidden_dim * 2, dtype=cdt,
            kernel_init=nn.initializers.normal(10.0 * self.hidden_dim ** -0.5),
            name="post_emb",
        )(edge_ctx)
        head = edge_rep[..., : self.hidden_dim]
        tail = edge_rep[..., self.hidden_dim:]
        prod_rep = jnp.concatenate(
            [_gather(head, pair_idx[..., 0]), _gather(tail, pair_idx[..., 1])],
            -1,
        )
        ctx_gate = nn.Dense(
            self.pooling_dim, dtype=cdt,
            kernel_init=nn.initializers.xavier_uniform(), name="post_cat",
        )(prod_rep)

        if self.use_vision:
            uf = union_features.astype(cdt)
            if self.pooling_dim != self.in_channels:
                uf = nn.Dense(
                    self.pooling_dim, dtype=cdt,
                    kernel_init=nn.initializers.xavier_uniform(), name="up_dim",
                )(uf)
            visual_rep = ctx_gate * uf
        else:
            visual_rep = ctx_gate

        if self.meet_group_sizes is not None:
            # dual per-group heads mirroring the base rel/ctx_compress pair
            # (TransLikePredictor_MEET :1673-1679); no frequency bias.
            group_logits = MeetRelHeads(
                self.meet_group_sizes, self.meet_experts, name="meet_heads",
            )(visual_rep, prod_rep)
            return LegacyOutput(obj_dists, None, obj_preds,
                                group_logits=group_logits)

        rel_dists = nn.Dense(
            self.num_rel_classes, dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(), name="rel_compress",
        )(visual_rep) + nn.Dense(
            self.num_rel_classes, dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(), name="ctx_compress",
        )(prod_rep)

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


class TransLikePredictor(TransformerPredictor):
    """Transformer-style predictor over the SHA hybrid-attention context
    (TransLikePredictor_MEET, roi_relation_predictors.py:1581-1828 — the
    reference only ships the MEET variant; with ``meet_group_sizes=None``
    this degrades to the commented-out plain dual-compress head)."""

    context_type: str = "sha"


class IMPPredictor(nn.Module):
    """Iterative message passing (:207-322, model_msg_passing.py:14-109)."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    hidden_dim: int = 512
    pooling_dim: int = 4096
    in_channels: int = 4096
    num_iter: int = 3
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
        b, n = box_mask.shape
        p = pair_mask.shape[1]
        h = self.hidden_dim
        if pred_labels is None:
            pred_labels = obj_labels

        aug_obj, rel_feats = PairwiseFeatureExtractor(
            num_obj_classes=self.num_obj_classes, hidden_dim=h,
            pooling_dim=self.pooling_dim, in_channels=self.in_channels,
            mode=self.mode, embed_init=self.embed_init, dtype=cdt,
            name="pairwise_feature_extractor",
        )(roi_features, union_features, boxes, box_mask, obj_labels,
          predict_logits, pred_labels, pair_idx, image_sizes, train)

        obj_rep = nn.Dense(h, dtype=cdt, name="obj_unary")(aug_obj)
        rel_rep = nn.relu(nn.Dense(h, dtype=cdt, name="edge_unary")(rel_feats))

        node_gru = nn.GRUCell(h, dtype=cdt, name="node_gru")
        edge_gru = nn.GRUCell(h, dtype=cdt, name="edge_gru")
        gates = {
            name: nn.Dense(1, dtype=cdt, name=name)
            for name in ("sub_vert_w_fc", "obj_vert_w_fc",
                         "out_edge_w_fc", "in_edge_w_fc")
        }

        si = pair_idx[..., 0]
        oi = pair_idx[..., 1]
        pm = pair_mask[..., None].astype(cdt)

        flat_obj = obj_rep.reshape(b * n, h)
        flat_rel = rel_rep.reshape(b * p, h)
        hx_obj = jnp.zeros_like(flat_obj)
        hx_rel = jnp.zeros_like(flat_rel)
        vert, _ = node_gru(hx_obj, flat_obj)
        edge, _ = edge_gru(hx_rel, flat_rel)
        vert = vert.reshape(b, n, h)
        edge = edge.reshape(b, p, h)

        def seg_sum(vals, idx):
            return jax.vmap(
                lambda v, i: jax.ops.segment_sum(v, i.astype(jnp.int32), n)
            )(vals, idx)

        for _ in range(self.num_iter):
            sub_vert = _gather(vert, si)
            obj_vert = _gather(vert, oi)
            w_sub = jax.nn.sigmoid(
                gates["sub_vert_w_fc"](jnp.concatenate([sub_vert, edge], -1))
            )
            w_obj = jax.nn.sigmoid(
                gates["obj_vert_w_fc"](jnp.concatenate([obj_vert, edge], -1))
            )
            edge_msg = (w_sub * sub_vert + w_obj * obj_vert) * pm
            new_edge, _ = edge_gru(
                edge.reshape(b * p, h), edge_msg.reshape(b * p, h)
            )
            pre_out = jax.nn.sigmoid(
                gates["out_edge_w_fc"](jnp.concatenate([sub_vert, edge], -1))
            ) * edge * pm
            pre_in = jax.nn.sigmoid(
                gates["in_edge_w_fc"](jnp.concatenate([obj_vert, edge], -1))
            ) * edge * pm
            vert_ctx = seg_sum(pre_out, si) + seg_sum(pre_in, oi)
            new_vert, _ = node_gru(
                vert.reshape(b * n, h), vert_ctx.reshape(b * n, h)
            )
            vert = new_vert.reshape(b, n, h)
            edge = new_edge.reshape(b, p, h)

        if self.mode == "predcls":
            obj_dists = jax.nn.one_hot(obj_labels, self.num_obj_classes,
                                       dtype=jnp.float32)
        else:
            obj_dists = nn.Dense(self.num_obj_classes, dtype=jnp.float32,
                                 name="obj_classifier")(vert)
        rel_dists = nn.Dense(self.num_rel_classes, dtype=jnp.float32,
                             name="rel_classifier")(edge)
        obj_preds = jnp.argmax(obj_dists, axis=-1).astype(jnp.int32)

        if self.use_bias:
            pair_pred = jnp.stack(
                [
                    _gather(obj_preds[..., None], si)[..., 0],
                    _gather(obj_preds[..., None], oi)[..., 0],
                ],
                -1,
            )
            rel_dists = rel_dists + FrequencyBias(
                num_obj_classes=self.num_obj_classes,
                num_rel_classes=self.num_rel_classes, name="freq_bias",
            )(pair_pred)
        return LegacyOutput(obj_dists, rel_dists, obj_preds)


class LSTMContext(nn.Module):
    """Motifs biLSTM object/edge context (model_motifs.py:224-420).

    ``effect_analysis`` adds the Causal-TDE moving-average "untreated"
    decoder-input buffer (model_motifs.py:292-300, stored in batch_stats so
    the existing mutable plumbing carries it); ``ctx_average=True`` at eval
    replaces the decoder input with that average (:330-333).
    """

    num_obj_classes: int = 151
    embed_dim: int = 200
    hidden_dim: int = 512
    obj_layers: int = 1
    edge_layers: int = 1
    mode: str = "predcls"
    later_nms_thres: float = 0.3
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
        g = nn.Dense(32, dtype=cdt, name="pos_fc1")(binfo)
        g = nn.BatchNorm(use_running_average=not train, momentum=0.999,
                         dtype=cdt, name="pos_bn")(g)
        g = nn.relu(nn.Dense(128, dtype=cdt, name="pos_fc2")(g))

        obj_pre = jnp.concatenate([roi_features.astype(cdt), obj_embed, g], -1)

        perm, inv = jax.vmap(centerx_perm)(boxes, box_mask)
        sort = lambda x: _gather(x, perm)  # noqa: E731
        unsort = lambda x: _gather(x, inv)  # noqa: E731
        sorted_pre = sort(obj_pre)
        sorted_mask = jnp.take_along_axis(box_mask, perm, axis=1)

        enc = MaskedBiLSTM(self.hidden_dim, self.obj_layers, dtype=cdt,
                           name="obj_ctx_rnn")(sorted_pre, sorted_mask)
        enc = nn.Dense(self.hidden_dim, dtype=cdt, name="lin_obj_h")(enc)

        dec_dim = sorted_pre.shape[-1] + enc.shape[-1]
        if self.effect_analysis:
            untreated = self.variable(
                "batch_stats", "untreated_dcd_feat",
                lambda: jnp.zeros((dec_dim,), jnp.float32),
            )

        if self.mode == "predcls":
            obj_preds = obj_labels
            obj_dists = jax.nn.one_hot(obj_labels, self.num_obj_classes,
                                       dtype=jnp.float32)
        else:
            dec_inp = jnp.concatenate([sorted_pre, enc], -1)
            if self.effect_analysis:
                if train and not self.is_initializing():
                    m = sorted_mask.reshape(-1).astype(jnp.float32)
                    mean = (
                        dec_inp.reshape(-1, dec_dim).astype(jnp.float32)
                        * m[:, None]
                    ).sum(0) / jnp.maximum(m.sum(), 1.0)
                    untreated.value = (
                        untreated.value * (1 - self.average_ratio)
                        + self.average_ratio * mean
                    )
                if ctx_average and not train:
                    dec_inp = jnp.broadcast_to(
                        untreated.value.astype(dec_inp.dtype), dec_inp.shape
                    )
            sorted_labels = (
                jnp.take_along_axis(obj_labels, perm, axis=1) if train else None
            )
            logits_sorted, refined_sorted = HighwayDecoderLSTM(
                num_obj_classes=self.num_obj_classes,
                embed_dim=self.embed_dim, hidden=self.hidden_dim,
                dtype=cdt, name="decoder_rnn",
            )(dec_inp, sorted_mask, sorted_labels, train)
            obj_dists = unsort(logits_sorted)
            obj_preds = jnp.take_along_axis(refined_sorted, inv, axis=1)
            if self.mode == "sgdet" and not train:
                bpc = (
                    boxes_per_cls
                    if boxes_per_cls is not None
                    else jnp.broadcast_to(
                        boxes[:, :, None, :],
                        boxes.shape[:2] + (self.num_obj_classes, 4),
                    )
                )
                # decoder post-NMS relabel (model_motifs.py:204-219):
                # unconditional overwrite, bg column at 0
                obj_preds = jax.vmap(
                    lambda bx, lg, m: obj_prediction_nms(
                        bx, lg, self.later_nms_thres, valid_mask=m,
                        overwrite=True, bg_init=0.0,
                    )
                )(bpc, obj_dists, box_mask)

        obj_ctx = unsort(enc)
        edge_pre = jnp.concatenate(
            [embed2(obj_preds), roi_features.astype(cdt), obj_ctx], -1
        )
        edge_enc = MaskedBiLSTM(self.hidden_dim, self.edge_layers, dtype=cdt,
                                name="edge_ctx_rnn")(sort(edge_pre), sorted_mask)
        edge_enc = nn.Dense(self.hidden_dim, dtype=cdt, name="lin_edge_h")(edge_enc)
        edge_ctx = unsort(edge_enc)
        return obj_dists, obj_preds, edge_ctx


class AttributeLSTMContext(nn.Module):
    """Attribute-aware Motifs context (model_motifs_with_attribute.py:180-372,
    ATTRIBUTE_ON=True).

    Differences vs LSTMContext: the object stream embeds attributes too —
    GT multi-hot (normalized) through att_embed1 when labels are given,
    else ``normalize_sigmoid_logits(attribute_logits) @ att_embed1`` — the
    decoder is the attribute variant (extra constant att channel + out_att
    head, legacy/lstm.py), and the edge stream adds
    ``normalize_sigmoid_logits(att_dists) @ att_embed2``.  In predcls the
    att_dists output is the RAW GT multi-hot (:291), which the edge stream
    then sigmoids — a reference quirk kept for parity.  No pos-embed
    BatchNorm here: the reference uses Dropout instead (:219-223).
    """

    num_obj_classes: int = 151
    num_att_classes: int = 201
    embed_dim: int = 200
    hidden_dim: int = 512
    obj_layers: int = 1
    edge_layers: int = 1
    mode: str = "predcls"
    embed_init: Optional[np.ndarray] = None
    att_embed_init: Optional[np.ndarray] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        roi_features: jnp.ndarray,
        boxes: jnp.ndarray,
        box_mask: jnp.ndarray,
        obj_labels: jnp.ndarray,
        attributes: jnp.ndarray,          # (B, N, 10) padded GT attribute ids
        predict_logits: jnp.ndarray,
        attribute_logits: Optional[jnp.ndarray],  # (B, N, A) detector head
        image_sizes: jnp.ndarray,
        train: bool = False,
    ):
        from veto_tpu.models.detector.attribute_head import attribute_targets
        from veto_tpu.ops.box_ops import encode_box_info

        cdt = self.dtype
        oinit = (
            nn.initializers.normal(1.0)
            if self.embed_init is None
            else lambda *_: jnp.asarray(self.embed_init)
        )
        ainit = (
            nn.initializers.normal(1.0)
            if self.att_embed_init is None
            else lambda *_: jnp.asarray(self.att_embed_init)
        )
        obj_embed1 = nn.Embed(self.num_obj_classes, self.embed_dim,
                              embedding_init=oinit, dtype=cdt, name="obj_embed1")
        obj_embed2 = nn.Embed(self.num_obj_classes, self.embed_dim,
                              embedding_init=oinit, dtype=cdt, name="obj_embed2")
        att_embed1 = nn.Embed(self.num_att_classes, self.embed_dim,
                              embedding_init=ainit, dtype=cdt, name="att_embed1")
        att_embed2 = nn.Embed(self.num_att_classes, self.embed_dim,
                              embedding_init=ainit, dtype=cdt, name="att_embed2")

        def norm_sigmoid(logits):
            # utils_motifs.normalize_sigmoid_logits(:14-17)
            p = jax.nn.sigmoid(logits.astype(jnp.float32))
            return p / (p.sum(-1, keepdims=True) + 1e-12)

        gt_multihot = jax.vmap(
            lambda a: attribute_targets(a, self.num_att_classes)
        )(attributes)
        use_gt_label = self.mode == "predcls"
        if use_gt_label:
            obj_embed = obj_embed1(obj_labels)
            gt_norm = gt_multihot / (
                gt_multihot.sum(-1, keepdims=True) + 1e-12)
            att_embed = gt_norm.astype(cdt) @ att_embed1.embedding.astype(cdt)
        else:
            probs = jax.nn.softmax(predict_logits.astype(jnp.float32), -1)
            obj_embed = probs.astype(cdt) @ obj_embed1.embedding.astype(cdt)
            att_embed = norm_sigmoid(attribute_logits).astype(cdt) @ \
                att_embed1.embedding.astype(cdt)

        binfo = encode_box_info(boxes, image_sizes).astype(cdt)
        g = nn.relu(nn.Dense(32, dtype=cdt, name="pos_fc1")(binfo))
        g = nn.relu(nn.Dense(128, dtype=cdt, name="pos_fc2")(g))

        obj_pre = jnp.concatenate(
            [roi_features.astype(cdt), obj_embed, att_embed, g], -1)

        perm, inv = jax.vmap(centerx_perm)(boxes, box_mask)
        sort = lambda x: _gather(x, perm)  # noqa: E731
        unsort = lambda x: _gather(x, inv)  # noqa: E731
        sorted_pre = sort(obj_pre)
        sorted_mask = jnp.take_along_axis(box_mask, perm, axis=1)

        enc = MaskedBiLSTM(self.hidden_dim, self.obj_layers, dtype=cdt,
                           name="obj_ctx_rnn")(sorted_pre, sorted_mask)
        enc = nn.Dense(self.hidden_dim, dtype=cdt, name="lin_obj_h")(enc)

        if self.mode == "predcls":
            obj_preds = obj_labels
            # utils_motifs.to_onehot: +-1000 fill, not 0/1 (:36-41)
            obj_dists = (
                jax.nn.one_hot(obj_labels, self.num_obj_classes,
                               dtype=jnp.float32) * 2000.0 - 1000.0
            )
            att_dists = gt_multihot
        else:
            dec_inp = jnp.concatenate([sorted_pre, enc], -1)
            sorted_labels = (
                jnp.take_along_axis(obj_labels, perm, axis=1) if train else None
            )
            logits_sorted, refined_sorted, att_sorted = HighwayDecoderLSTM(
                num_obj_classes=self.num_obj_classes,
                num_att_classes=self.num_att_classes,
                embed_dim=self.embed_dim, hidden=self.hidden_dim,
                dtype=cdt, name="decoder_rnn",
            )(dec_inp, sorted_mask, sorted_labels, train)
            obj_dists = unsort(logits_sorted)
            obj_preds = jnp.take_along_axis(refined_sorted, inv, axis=1)
            att_dists = unsort(att_sorted)

        obj_ctx = unsort(enc)
        edge_pre = jnp.concatenate(
            [
                obj_embed2(obj_preds),
                norm_sigmoid(att_dists).astype(cdt)
                @ att_embed2.embedding.astype(cdt),
                roi_features.astype(cdt),
                obj_ctx,
            ],
            -1,
        )
        edge_enc = MaskedBiLSTM(self.hidden_dim, self.edge_layers, dtype=cdt,
                                name="edge_ctx_rnn")(sort(edge_pre), sorted_mask)
        edge_enc = nn.Dense(self.hidden_dim, dtype=cdt, name="lin_edge_h")(edge_enc)
        edge_ctx = unsort(edge_enc)
        return obj_dists, obj_preds, att_dists, edge_ctx


class MotifPredictor(nn.Module):
    """Neural-motifs predictor (:995-1152)."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    embed_dim: int = 200
    hidden_dim: int = 512
    pooling_dim: int = 4096
    in_channels: int = 4096
    mode: str = "predcls"
    use_vision: bool = True
    use_bias: bool = True
    # MEET ensemble: per-group heads on the union-gated pair rep
    # (MotifPredictor_MEET, roi_relation_predictors.py:1154-1441)
    meet_group_sizes: Optional[Tuple[int, ...]] = None
    meet_experts: int = 1
    # ATTRIBUTE_ON (roi_relation_predictors.py:999, 1083-1090, 1147-1150):
    # swap in AttributeLSTMContext and also return attribute logits
    attribute_on: bool = False
    num_att_classes: int = 201
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
        attributes: Optional[jnp.ndarray] = None,        # (B, N, 10) GT ids
        attribute_logits: Optional[jnp.ndarray] = None,  # (B, N, A) head out
    ) -> LegacyOutput:
        cdt = self.dtype
        att_dists = None
        if self.attribute_on:
            obj_dists, obj_preds, att_dists, edge_ctx = AttributeLSTMContext(
                num_obj_classes=self.num_obj_classes,
                num_att_classes=self.num_att_classes,
                embed_dim=self.embed_dim, hidden_dim=self.hidden_dim,
                mode=self.mode, embed_init=self.embed_init, dtype=cdt,
                name="context_layer",
            )(roi_features, boxes, box_mask, obj_labels, attributes,
              predict_logits, attribute_logits, image_sizes, train)
        else:
            obj_dists, obj_preds, edge_ctx = LSTMContext(
                num_obj_classes=self.num_obj_classes, embed_dim=self.embed_dim,
                hidden_dim=self.hidden_dim, mode=self.mode,
                embed_init=self.embed_init, dtype=cdt, name="context_layer",
            )(roi_features, boxes, box_mask, obj_labels, predict_logits,
              image_sizes, boxes_per_cls, train)

        edge_rep = nn.Dense(
            self.hidden_dim * 2, dtype=cdt,
            kernel_init=nn.initializers.normal(10.0 * self.hidden_dim ** -0.5),
            name="post_emb",
        )(edge_ctx)
        head = edge_rep[..., : self.hidden_dim]
        tail = edge_rep[..., self.hidden_dim:]
        prod_rep = jnp.concatenate(
            [_gather(head, pair_idx[..., 0]), _gather(tail, pair_idx[..., 1])],
            -1,
        )
        prod_rep = nn.Dense(
            self.pooling_dim, dtype=cdt,
            kernel_init=nn.initializers.xavier_uniform(), name="post_cat",
        )(prod_rep)

        if self.use_vision:
            uf = union_features.astype(cdt)
            if self.pooling_dim != self.in_channels:
                uf = nn.Dense(
                    self.pooling_dim, dtype=cdt,
                    kernel_init=nn.initializers.xavier_uniform(), name="up_dim",
                )(uf)
            prod_rep = prod_rep * uf

        if self.meet_group_sizes is not None:
            # per-group heads on the gated pair rep, bias disabled
            # (MotifPredictor_MEET :1418-1424)
            group_logits = MeetRelHeads(
                self.meet_group_sizes, self.meet_experts, name="meet_heads",
            )(prod_rep)
            return LegacyOutput(obj_dists, None, obj_preds,
                                group_logits=group_logits, att_dists=att_dists)

        rel_dists = nn.Dense(
            self.num_rel_classes, dtype=jnp.float32, name="rel_compress"
        )(prod_rep)

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
                            att_dists=att_dists)


