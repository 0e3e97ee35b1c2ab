"""Context models shared by the legacy predictor zoo.

* :class:`MaskedEncoder` — the attention-is-all-you-need post-LN encoder
  (reference model_transformer.py:12-198): per-head key/value dims, residual
  + LayerNorm after both attention and FFN, padded positions masked out.
  The reference pads each batch to max(num_objs) per call; our layout is
  already (B, N) padded, so the whole thing is a plain batched transformer.
* :class:`TransformerContext` — object + edge context stacks
  (model_transformer.py:200-316) with the sgdet decoder-NMS label pick.
* :class:`PairwiseFeatureExtractor` — Motifs-style object/pair feature
  augmentation (model_msg_passing.py:110-317) used by IMP/MSDN/BGNN/GPSNet.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from veto_tpu.ops.box_ops import encode_box_info
from veto_tpu.ops.nms import obj_prediction_nms


class _MHA(nn.Module):
    """Post-LN multi-head attention with distinct d_k/d_v
    (model_transformer.py:45-107)."""

    heads: int
    d_model: int
    d_k: int
    d_v: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h, dk, dv = self.heads, self.d_k, self.d_v
        b, n, _ = x.shape
        q = nn.Dense(h * dk, dtype=self.dtype, name="w_qs")(x).reshape(b, n, h, dk)
        k = nn.Dense(h * dk, dtype=self.dtype, name="w_ks")(x).reshape(b, n, h, dk)
        v = nn.Dense(h * dv, dtype=self.dtype, name="w_vs")(x).reshape(b, n, h, dv)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(float(dk)).astype(self.dtype)
        attn = jnp.where(mask[:, None, None, :], attn, -1e9)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, h * dv)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="fc")(out)
        return nn.LayerNorm(dtype=self.dtype, name="ln")(out + x)


class _FFN(nn.Module):
    """Post-LN position-wise FFN (model_transformer.py:110-133)."""

    d_model: int
    d_inner: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Dense(self.d_inner, dtype=self.dtype, name="w1")(x))
        y = nn.Dense(self.d_model, dtype=self.dtype, name="w2")(y)
        return nn.LayerNorm(dtype=self.dtype, name="ln")(y + x)


class MaskedEncoder(nn.Module):
    """N-layer masked encoder over the padded proposal axis."""

    layers: int = 4
    heads: int = 8
    d_model: int = 512
    d_inner: int = 2048
    d_k: int = 64
    d_v: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        m = mask[..., None].astype(x.dtype)
        for i in range(self.layers):
            x = _MHA(self.heads, self.d_model, self.d_k, self.d_v,
                     dtype=self.dtype, name=f"attn{i}")(x, mask) * m
            x = _FFN(self.d_model, self.d_inner, dtype=self.dtype,
                     name=f"ffn{i}")(x) * m
        return x


class _CrossMHA(nn.Module):
    """Post-LN multi-head CROSS attention: queries from one stream, keys and
    values from the other (utils_co_attention.py Cross_Attention_Encoder)."""

    heads: int
    d_model: int
    d_k: int
    d_v: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, kv, mask):
        h, dk, dv = self.heads, self.d_k, self.d_v
        b, n, _ = x.shape
        q = nn.Dense(h * dk, dtype=self.dtype, name="w_qs")(x).reshape(b, n, h, dk)
        k = nn.Dense(h * dk, dtype=self.dtype, name="w_ks")(kv).reshape(b, n, h, dk)
        v = nn.Dense(h * dv, dtype=self.dtype, name="w_vs")(kv).reshape(b, n, h, dv)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(float(dk)).astype(self.dtype)
        attn = jnp.where(mask[:, None, None, :], attn, -1e9)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, h * dv)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="fc")(out)
        return nn.LayerNorm(dtype=self.dtype, name="ln")(out + x)


class SHAEncoder(nn.Module):
    """Stacked hybrid self/cross attention over visual+textual streams
    (hybrid_attention.py Single_Layer_Hybrid_Attention:63-82 + SHA_Encoder
    :84-110): per layer each stream gets self-attention plus cross-attention
    against the other, summed; the final visual output adds the textual."""

    layers: int = 2
    heads: int = 8
    d_model: int = 512
    d_inner: int = 2048
    d_k: int = 64
    d_v: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vis, txt, mask):
        m = mask[..., None].astype(vis.dtype)
        for i in range(self.layers):
            tsa = _MHA(self.heads, self.d_model, self.d_k, self.d_v,
                       dtype=self.dtype, name=f"sa_txt{i}")(txt, mask)
            tsa = _FFN(self.d_model, self.d_inner, dtype=self.dtype,
                       name=f"sa_txt_ffn{i}")(tsa) * m
            tca = _CrossMHA(self.heads, self.d_model, self.d_k, self.d_v,
                            dtype=self.dtype, name=f"ca_txt{i}")(txt, vis, mask)
            tca = _FFN(self.d_model, self.d_inner, dtype=self.dtype,
                       name=f"ca_txt_ffn{i}")(tca) * m
            vsa = _MHA(self.heads, self.d_model, self.d_k, self.d_v,
                       dtype=self.dtype, name=f"sa_vis{i}")(vis, mask)
            vsa = _FFN(self.d_model, self.d_inner, dtype=self.dtype,
                       name=f"sa_vis_ffn{i}")(vsa) * m
            vca = _CrossMHA(self.heads, self.d_model, self.d_k, self.d_v,
                            dtype=self.dtype, name=f"ca_vis{i}")(vis, txt, mask)
            vca = _FFN(self.d_model, self.d_inner, dtype=self.dtype,
                       name=f"ca_vis_ffn{i}")(vca) * m
            txt = tsa + tca
            vis = vsa + vca
        return vis + txt


class SHAContext(nn.Module):
    """SHA_Context (hybrid_attention.py:112-209): visual (roi+geometry) and
    textual (class-embedding) streams fused by hybrid attention for both the
    object and the edge stages."""

    num_obj_classes: int = 151
    embed_dim: int = 200
    hidden_dim: int = 512
    obj_layers: int = 4
    edge_layers: int = 2
    heads: int = 8
    inner_dim: int = 2048
    k_dim: int = 64
    v_dim: int = 64
    mode: str = "predcls"
    later_nms_thres: float = 0.3
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
    ):
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
        pos = nn.relu(nn.Dense(32, dtype=cdt, name="bbox_fc1")(binfo))
        pos = nn.relu(nn.Dense(128, dtype=cdt, name="bbox_fc2")(pos))

        vis = nn.Dense(self.hidden_dim, dtype=cdt, name="lin_obj_visual")(
            jnp.concatenate([roi_features.astype(cdt), pos], -1)
        )
        txt = nn.Dense(self.hidden_dim, dtype=cdt, name="lin_obj_textual")(obj_embed)
        obj_feats = SHAEncoder(
            self.obj_layers, self.heads, self.hidden_dim, self.inner_dim,
            self.k_dim, self.v_dim, dtype=cdt, name="context_obj",
        )(vis, txt, box_mask)

        if self.mode == "predcls":
            obj_preds = obj_labels
            obj_dists = jax.nn.one_hot(obj_labels, self.num_obj_classes,
                                       dtype=jnp.float32)
            e2 = embed2(obj_labels)
        else:
            obj_dists = nn.Dense(self.num_obj_classes, dtype=jnp.float32,
                                 name="out_obj")(obj_feats)
            if self.mode == "sgdet" and not train:
                bpc = (
                    boxes_per_cls
                    if boxes_per_cls is not None
                    else jnp.broadcast_to(
                        boxes[:, :, None, :],
                        boxes.shape[:2] + (self.num_obj_classes, 4),
                    )
                )
                obj_preds = jax.vmap(
                    lambda b, lg, m: obj_prediction_nms(
                        b, lg, self.later_nms_thres, valid_mask=m,
                        overwrite=True,
                    )
                )(bpc, obj_dists, box_mask)
            else:
                obj_preds = (jnp.argmax(obj_dists[..., 1:], -1) + 1).astype(jnp.int32)
            e2 = embed2(obj_preds)

        edge_vis = nn.Dense(self.hidden_dim, dtype=cdt, name="lin_edge_visual")(
            jnp.concatenate([roi_features.astype(cdt), obj_feats], -1)
        )
        edge_txt = nn.Dense(self.hidden_dim, dtype=cdt, name="lin_edge_textual")(e2)
        edge_ctx = SHAEncoder(
            self.edge_layers, self.heads, self.hidden_dim, self.inner_dim,
            self.k_dim, self.v_dim, dtype=cdt, name="context_edge",
        )(edge_vis, edge_txt, box_mask)
        return obj_dists, obj_preds, edge_ctx


class TransformerContext(nn.Module):
    """Object + edge context (model_transformer.py:200-316), batched.

    Returns (obj_dists (B, N, num_obj), obj_preds (B, N), edge_ctx
    (B, N, hidden)).
    """

    num_obj_classes: int = 151
    embed_dim: int = 200
    hidden_dim: int = 512
    obj_layers: int = 4
    edge_layers: int = 2
    heads: int = 8
    inner_dim: int = 2048
    k_dim: int = 64
    v_dim: int = 64
    mode: str = "predcls"
    later_nms_thres: float = 0.3
    embed_init: Optional[np.ndarray] = None  # GloVe (num_obj, embed_dim)
    dtype: Any = jnp.float32

    def _embed_table(self, name):
        init = (
            nn.initializers.normal(1.0)
            if self.embed_init is None
            else lambda *_: jnp.asarray(self.embed_init)
        )
        return nn.Embed(
            self.num_obj_classes, self.embed_dim, embedding_init=init,
            dtype=self.dtype, name=name,
        )

    @nn.compact
    def __call__(
        self,
        roi_features: jnp.ndarray,    # (B, N, D)
        boxes: jnp.ndarray,           # (B, N, 4)
        box_mask: jnp.ndarray,        # (B, N)
        obj_labels: jnp.ndarray,      # (B, N) GT labels (train / gt-label mode)
        predict_logits: jnp.ndarray,  # (B, N, num_obj) detector logits
        image_sizes: jnp.ndarray,     # (B, 2)
        boxes_per_cls: Optional[jnp.ndarray] = None,  # (B, N, num_obj, 4)
        train: bool = False,
    ):
        cdt = self.dtype
        embed1 = self._embed_table("obj_embed1")
        embed2 = self._embed_table("obj_embed2")

        if self.mode == "predcls":
            obj_embed = embed1(obj_labels)
        else:
            probs = jax.nn.softmax(predict_logits.astype(jnp.float32), -1)
            obj_embed = probs.astype(cdt) @ embed1.embedding.astype(cdt)

        # 9-d geometry → 32 → 128 (bbox_embed, :241-244)
        binfo = encode_box_info(boxes, image_sizes).astype(cdt)
        pos = nn.relu(nn.Dense(32, dtype=cdt, name="bbox_fc1")(binfo))
        pos = nn.relu(nn.Dense(128, dtype=cdt, name="bbox_fc2")(pos))

        obj_pre = jnp.concatenate([roi_features.astype(cdt), obj_embed, pos], -1)
        obj_pre = nn.Dense(self.hidden_dim, dtype=cdt, name="lin_obj")(obj_pre)
        obj_feats = MaskedEncoder(
            self.obj_layers, self.heads, self.hidden_dim, self.inner_dim,
            self.k_dim, self.v_dim, dtype=cdt, name="context_obj",
        )(obj_pre, box_mask)

        if self.mode == "predcls":
            obj_preds = obj_labels
            obj_dists = jax.nn.one_hot(obj_labels, self.num_obj_classes,
                                       dtype=jnp.float32)
            embed2_out = embed2(obj_labels)
        else:
            obj_dists = nn.Dense(
                self.num_obj_classes, dtype=jnp.float32, name="out_obj"
            )(obj_feats)
            if self.mode == "sgdet" and not train:
                bpc = (
                    boxes_per_cls
                    if boxes_per_cls is not None
                    else jnp.broadcast_to(
                        boxes[:, :, None, :],
                        boxes.shape[:2] + (self.num_obj_classes, 4),
                    )
                )
                obj_preds = jax.vmap(
                    lambda b, lg, m: obj_prediction_nms(
                        b, lg, self.later_nms_thres, valid_mask=m,
                        overwrite=True,
                    )
                )(bpc, obj_dists, box_mask)
            else:
                obj_preds = (
                    jnp.argmax(obj_dists[..., 1:], axis=-1) + 1
                ).astype(jnp.int32)
            embed2_out = embed2(obj_preds)

        edge_pre = jnp.concatenate(
            [roi_features.astype(cdt), obj_feats, embed2_out], -1
        )
        edge_pre = nn.Dense(self.hidden_dim, dtype=cdt, name="lin_edge")(edge_pre)
        edge_ctx = MaskedEncoder(
            self.edge_layers, self.heads, self.hidden_dim, self.inner_dim,
            self.k_dim, self.v_dim, dtype=cdt, name="context_edge",
        )(edge_pre, box_mask)
        return obj_dists, obj_preds, edge_ctx


class PairwiseFeatureExtractor(nn.Module):
    """Motifs-style object/pair feature augmentation
    (model_msg_passing.py:110-317, rel_feature_type='fusion').

    Returns (augment_obj_feat (B, N, pooling_dim),
             rel_feats (B, P, pooling_dim)).
    """

    num_obj_classes: int = 151
    embed_dim: int = 200
    hidden_dim: int = 512
    pooling_dim: int = 4096
    in_channels: int = 4096
    rel_feature_type: str = "fusion"  # 'fusion' | 'obj_pair' | 'union'
    spatial_for_vision: bool = True
    word_embed_feats: bool = True
    mode: str = "predcls"
    embed_init: Optional[np.ndarray] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        roi_features: jnp.ndarray,    # (B, N, D)
        union_features: jnp.ndarray,  # (B, P, D)
        boxes: jnp.ndarray,           # (B, N, 4)
        box_mask: jnp.ndarray,
        obj_labels: jnp.ndarray,      # (B, N) labels for embedding (GT/pred)
        predict_logits: jnp.ndarray,
        pred_labels: jnp.ndarray,     # (B, N) pred labels (gt in predcls)
        pair_idx: jnp.ndarray,        # (B, P, 2)
        image_sizes: jnp.ndarray,
        train: bool = False,
    ):
        cdt = self.dtype
        b, n = boxes.shape[:2]
        roi = roi_features.astype(cdt)

        if self.word_embed_feats:
            init = (
                nn.initializers.normal(1.0)
                if self.embed_init is None
                else lambda *_: jnp.asarray(self.embed_init)
            )
            emb_dist = nn.Embed(self.num_obj_classes, self.embed_dim,
                                embedding_init=init, dtype=cdt,
                                name="obj_embed_on_prob_dist")
            emb_label = nn.Embed(self.num_obj_classes, self.embed_dim,
                                 embedding_init=init, dtype=cdt,
                                 name="obj_embed_on_pred_label")
            if self.mode == "predcls" or train:
                e_dist = emb_dist(obj_labels)
            else:
                probs = jax.nn.softmax(predict_logits.astype(jnp.float32), -1)
                e_dist = probs.astype(cdt) @ emb_dist.embedding.astype(cdt)
            e_label = emb_label(pred_labels)
            parts = [roi, e_dist]
        else:
            parts = [roi]

        # geometry embedding: 9 → 32 → BN → 128 (:173-177)
        binfo = encode_box_info(boxes, image_sizes).astype(cdt)
        g = nn.Dense(32, dtype=cdt, name="pos_fc1")(binfo)
        g = nn.BatchNorm(use_running_average=not train, momentum=0.999,
                         dtype=cdt, name="pos_bn")(g)
        g = nn.relu(nn.Dense(128, dtype=cdt, name="pos_fc2")(g))
        parts.append(g)

        obj_pre = jnp.concatenate(parts, -1)
        aug = nn.Dense(self.hidden_dim, dtype=cdt, name="obj_hidden_linear")(obj_pre)
        if self.word_embed_feats:
            aug_full = jnp.concatenate([e_label, roi, aug], -1)
        else:
            aug_full = jnp.concatenate([roi, aug], -1)

        # pairwise rel features
        si, oi = pair_idx[..., 0], pair_idx[..., 1]
        if self.rel_feature_type in ("obj_pair", "fusion"):
            fused = nn.Dense(self.hidden_dim * 2, dtype=cdt,
                             name="pairwise_obj_feat_updim_fc")(aug_full)
            head = fused[..., : self.hidden_dim]
            tail = fused[..., self.hidden_dim:]
            gather = lambda x, idx: jnp.take_along_axis(  # noqa: E731
                x, idx[..., None].astype(jnp.int32), axis=1
            )
            pair_feat = jnp.concatenate(
                [gather(head, si), gather(tail, oi)], -1
            )
            if self.spatial_for_vision:
                # 32-d pairwise geometry (get_box_pair_info) → spt_emb
                pair_geo = _box_pair_info(boxes, image_sizes, pair_idx)
                spt = nn.relu(nn.Dense(self.hidden_dim, dtype=cdt,
                                       name="spt_fc1")(pair_geo.astype(cdt)))
                spt = nn.relu(nn.Dense(self.hidden_dim * 2, dtype=cdt,
                                       name="spt_fc2")(spt))
                pair_feat = pair_feat * spt
            rel_feats = nn.relu(
                nn.Dense(self.pooling_dim, dtype=cdt,
                         name="pairwise_rel_feat_finalize_fc")(pair_feat)
            )
            if self.rel_feature_type == "fusion":
                uf = union_features.astype(cdt)
                if self.pooling_dim != self.in_channels:
                    uf = nn.Dense(self.pooling_dim, dtype=cdt,
                                  name="rel_feature_up_dim")(uf)
                rel_feats = uf + rel_feats
        else:
            uf = union_features.astype(cdt)
            if self.pooling_dim != self.in_channels:
                uf = nn.Dense(self.pooling_dim, dtype=cdt,
                              name="rel_feature_up_dim")(uf)
            rel_feats = uf

        aug_out = nn.relu(
            nn.Dense(self.pooling_dim, dtype=cdt,
                     name="obj_feat_aug_finalize_fc")(aug_full)
        )
        return aug_out, rel_feats


def _box_pair_info(boxes, image_sizes, pair_idx):
    """32-d pairwise geometry (utils_relation.py get_box_pair_info:22-53):
    per-box 12-d info for head/tail + 8-d union/intersection encoding."""
    wh = image_sizes.astype(jnp.float32)

    def box_info(b):
        # 12-d: normalized (x1, y1, x2, y2, cx, cy, w, h) + (w*h, ...) —
        # reference get_box_info: 8-d normalized + 4-d center/size
        w = wh[:, None, 0]
        h = wh[:, None, 1]
        x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        bw = x2 - x1 + 1.0
        bh = y2 - y1 + 1.0
        cx = x1 + bw * 0.5
        cy = y1 + bh * 0.5
        return jnp.stack(
            [x1 / w, y1 / h, x2 / w, y2 / h, cx / w, cy / h, bw / w, bh / h,
             bw * bh / (w * h), (x2 - x1) / (y2 - y1 + 1e-9),
             jnp.zeros_like(x1), jnp.zeros_like(x1)],
            axis=-1,
        )

    info = box_info(boxes)  # (B, N, 12)
    gather = lambda x, idx: jnp.take_along_axis(  # noqa: E731
        x, idx[..., None].astype(jnp.int32), axis=1
    )
    head = gather(info, pair_idx[..., 0])
    tail = gather(info, pair_idx[..., 1])
    # union/intersection 8-d: reference appends union box + intersection box
    # normalized coords; approximated here from the head/tail mins/maxes
    hb = gather(boxes, pair_idx[..., 0])
    tb = gather(boxes, pair_idx[..., 1])
    w = wh[:, None, 0]
    h = wh[:, None, 1]
    ux1 = jnp.minimum(hb[..., 0], tb[..., 0]) / w
    uy1 = jnp.minimum(hb[..., 1], tb[..., 1]) / h
    ux2 = jnp.maximum(hb[..., 2], tb[..., 2]) / w
    uy2 = jnp.maximum(hb[..., 3], tb[..., 3]) / h
    ix1 = jnp.maximum(hb[..., 0], tb[..., 0]) / w
    iy1 = jnp.maximum(hb[..., 1], tb[..., 1]) / h
    ix2 = jnp.minimum(hb[..., 2], tb[..., 2]) / w
    iy2 = jnp.minimum(hb[..., 3], tb[..., 3]) / h
    extra = jnp.stack([ux1, uy1, ux2, uy2, ix1, iy1, ix2, iy2], axis=-1)
    return jnp.concatenate([head, tail, extra], axis=-1)  # (B, P, 32)
