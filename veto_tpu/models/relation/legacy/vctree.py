"""VCTree: dynamic-tree context for scene graphs, TPU re-design.

Reference: VCTreePredictor (roi_relation_predictors.py:1441-1580),
VCTreeLSTMContext (model_vctree.py:72-320), tree construction
(utils_vctree.py:17-140) and the bidirectional TreeLSTM
(utils_treelstm.py).

The reference builds per-image Python tree objects and runs the TreeLSTM by
recursion — impossible under jit.  Here a tree is three integer arrays
(left, right, parent) built by the same greedy maximum-spanning construction
(Prim over the learned pair scores, utils_vctree.py gen_tree:54-89) with the
left-child/right-sibling binary encoding produced incrementally (the exact
arNode_to_biNode:111-123 transformation).  The TreeLSTM runs in "rounds": a
node fires once its dependencies (children for leaf→root, parent for
root→leaf) are done, all ready nodes updating in one masked vector step; N
rounds cover any tree shape (a chain is the worst case).

Omitted: the reference's recurrent dropout masks (CONTEXT_DROPOUT_RATE) —
a training-time regularizer, off at eval.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from veto_tpu.ops.box_ops import box_area, box_iou, encode_box_info

from ..freq_bias import FrequencyBias
from .predictors import LegacyOutput, _gather


# ----------------------------------------------------------------------
# tree construction
# ----------------------------------------------------------------------
class BinaryForest(NamedTuple):
    left: jnp.ndarray    # (N,) left-child index, -1 = none
    right: jnp.ndarray   # (N,) right-child (= next sibling) index, -1 = none
    parent: jnp.ndarray  # (N,) bi-tree parent index, -1 = root/padding
    root: jnp.ndarray    # () root node index
    in_tree: jnp.ndarray  # (N,) node participates (valid proposals)


def build_vctree(scores: jnp.ndarray, mask: jnp.ndarray) -> BinaryForest:
    """Greedy max-score spanning tree → binary tree (single image).

    Matches generate_forest + gen_tree + arbForest_to_biForest: root is the
    node with the highest mean pair score (:33-36); each step attaches the
    highest-scoring (tree-node, outside-node) edge (:76-86); a node's first
    arb-child becomes its bi-tree left child and each later arb-child
    becomes the previous sibling's right child (:111-123).
    """
    n = scores.shape[0]
    neg = -1e9
    valid2 = mask[:, None] & mask[None, :]
    s = jnp.where(valid2, scores, neg)
    node_scores = jnp.where(mask, jnp.where(mask[None, :], scores, 0.0).sum(1)
                            / jnp.maximum(mask.sum(), 1), neg)
    root = jnp.argmax(node_scores).astype(jnp.int32)

    def body(_, state):
        in_tree, left, right, parent, last_child = state
        cand = in_tree[:, None] & ~in_tree[None, :] & valid2
        flat = jnp.where(cand, s, neg).reshape(-1)
        best = jnp.argmax(flat)
        ok = flat[best] > neg / 2
        u = (best // n).astype(jnp.int32)
        v = (best % n).astype(jnp.int32)
        sib = last_child[u]
        first = sib < 0
        new_left = jnp.where(ok & first, left.at[u].set(v), left)
        new_right = jnp.where(
            ok & ~first, right.at[jnp.maximum(sib, 0)].set(v), right
        )
        bi_parent = jnp.where(first, u, sib)
        new_parent = jnp.where(ok, parent.at[v].set(bi_parent), parent)
        new_last = jnp.where(ok, last_child.at[u].set(v), last_child)
        new_in = jnp.where(ok, in_tree.at[v].set(True), in_tree)
        return new_in, new_left, new_right, new_parent, new_last

    init = (
        jnp.zeros((n,), bool).at[root].set(True),
        jnp.full((n,), -1, jnp.int32),
        jnp.full((n,), -1, jnp.int32),
        jnp.full((n,), -1, jnp.int32),
        jnp.full((n,), -1, jnp.int32),
    )
    in_tree, left, right, parent, _ = jax.lax.fori_loop(0, n - 1, body, init)
    return BinaryForest(left=left, right=right, parent=parent, root=root,
                        in_tree=in_tree & mask)


# ----------------------------------------------------------------------
# TreeLSTM passes (explicit params so lax loops may call them freely)
# ----------------------------------------------------------------------
def _ortho_init(key, shape, dtype=jnp.float32):
    return nn.initializers.orthogonal()(key, shape, dtype)


class TreeLSTMFwd(nn.Module):
    """Leaves→root pass (BiTreeLSTM_Foreward, utils_treelstm.py:117-180).

    node: ioffu = W_x x + W_hl h_left + W_hr h_right; highway gate r mixes
    with the projected input (node_forward :120-133).
    """

    in_dim: int
    h_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, forest: BinaryForest) -> jnp.ndarray:
        """feats (N, in_dim) → hidden (N, h_dim)."""
        n = feats.shape[0]
        h = self.h_dim
        cdt = self.dtype
        w_px = self.param("px_w", _ortho_init, (self.in_dim, h)).astype(cdt)
        b_px = self.param("px_b", nn.initializers.zeros, (h,)).astype(cdt)
        w_x = self.param("ioffux_w", _ortho_init, (self.in_dim, 6 * h)).astype(cdt)
        b_x = self.param("ioffux_b", nn.initializers.zeros, (6 * h,)).astype(cdt)
        w_l = self.param("ioffuh_left_w", _ortho_init, (h, 6 * h)).astype(cdt)
        w_r = self.param("ioffuh_right_w", _ortho_init, (h, 6 * h)).astype(cdt)
        # forget-gate bias 0.5 (utils_treelstm.py:113-115) — folded into b_x
        fb = jnp.zeros((6 * h,)).at[2 * h:4 * h].set(1.0).astype(cdt)

        x = feats.astype(cdt)
        px = x @ w_px + b_px
        gx = x @ w_x + b_x + fb

        def round_fn(_, state):
            hs, cs, done = state
            lc = forest.left
            rc = forest.right
            ready = (
                forest.in_tree & ~done
                & ((lc < 0) | done[jnp.maximum(lc, 0)])
                & ((rc < 0) | done[jnp.maximum(rc, 0)])
            )
            hl = jnp.where((lc >= 0)[:, None], hs[jnp.maximum(lc, 0)], 0.0)
            cl = jnp.where((lc >= 0)[:, None], cs[jnp.maximum(lc, 0)], 0.0)
            hr = jnp.where((rc >= 0)[:, None], hs[jnp.maximum(rc, 0)], 0.0)
            cr = jnp.where((rc >= 0)[:, None], cs[jnp.maximum(rc, 0)], 0.0)
            g = gx + hl @ w_l + hr @ w_r
            i, o, fl, fr, u, r = jnp.split(g, 6, axis=-1)
            c = (jax.nn.sigmoid(i) * jnp.tanh(u)
                 + jax.nn.sigmoid(fl) * cl + jax.nn.sigmoid(fr) * cr)
            hh = jax.nn.sigmoid(o) * jnp.tanh(c)
            hh = jax.nn.sigmoid(r) * hh + (1 - jax.nn.sigmoid(r)) * px
            m = ready[:, None]
            return (
                jnp.where(m, hh, hs),
                jnp.where(m, c, cs),
                done | ready,
            )

        hs = jnp.zeros((n, h), cdt)
        cs = jnp.zeros((n, h), cdt)
        done = jnp.zeros((n,), bool)
        hs, cs, done = jax.lax.fori_loop(0, n, round_fn, (hs, cs, done))
        return hs


class TreeLSTMBwd(nn.Module):
    """Root→leaves pass (BiTreeLSTM_Backward :182-250), optionally with the
    decoder's label-embedding feedback (pass_embed_postprocess :253-275)."""

    in_dim: int
    h_dim: int
    num_classes: int = 0          # >0 enables the decoder head
    embed_dim: int = 0
    embed_init: Optional[np.ndarray] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        forest: BinaryForest,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ):
        n = feats.shape[0]
        h = self.h_dim
        cdt = self.dtype
        decode = self.num_classes > 0
        in_dim = self.in_dim + (self.embed_dim if decode else 0)
        w_px = self.param("px_w", _ortho_init, (in_dim, h)).astype(cdt)
        b_px = self.param("px_b", nn.initializers.zeros, (h,)).astype(cdt)
        w_x = self.param("iofux_w", _ortho_init, (in_dim, 5 * h)).astype(cdt)
        b_x = self.param("iofux_b", nn.initializers.zeros, (5 * h,)).astype(cdt)
        w_h = self.param("iofuh_w", _ortho_init, (h, 5 * h)).astype(cdt)
        fb = jnp.zeros((5 * h,)).at[2 * h:3 * h].set(1.0).astype(cdt)

        if decode:
            init = (
                nn.initializers.normal(1.0)
                if self.embed_init is None
                else lambda *_: jnp.asarray(self.embed_init)
            )
            embed_tbl = self.param(
                "obj_embed", init, (self.num_classes + 1, self.embed_dim)
            ).astype(cdt)
            w_out = self.param(
                "out_w", nn.initializers.lecun_normal(), (h, self.num_classes)
            )
            b_out = self.param("out_b", nn.initializers.zeros, (self.num_classes,))
            gkey = rng if rng is not None else jax.random.PRNGKey(0)
            gumbel = jax.random.gumbel(gkey, (n, self.num_classes - 1))

        x = feats.astype(cdt)

        def round_fn(_, state):
            hs, cs, done, embeds, dists, labels = state
            p = forest.parent
            is_root = p < 0
            ready = forest.in_tree & ~done & (is_root | done[jnp.maximum(p, 0)])
            hp = jnp.where((~is_root)[:, None], hs[jnp.maximum(p, 0)], 0.0)
            cp = jnp.where((~is_root)[:, None], cs[jnp.maximum(p, 0)], 0.0)
            if decode:
                # parent's committed label embedding; 'start' row for roots
                pe = jnp.where(
                    (~is_root)[:, None], embeds[jnp.maximum(p, 0)],
                    embed_tbl[0][None, :],
                )
                xin = jnp.concatenate([x, pe], -1)
            else:
                xin = x
            g = xin @ w_x + b_x + fb + hp @ w_h
            i, o, f, u, r = jnp.split(g, 5, axis=-1)
            c = jax.nn.sigmoid(i) * jnp.tanh(u) + jax.nn.sigmoid(f) * cp
            hh = jax.nn.sigmoid(o) * jnp.tanh(c)
            px = xin @ w_px + b_px
            hh = jax.nn.sigmoid(r) * hh + (1 - jax.nn.sigmoid(r)) * px
            m = ready[:, None]
            hs = jnp.where(m, hh, hs)
            cs = jnp.where(m, c, cs)
            if decode:
                logit = hh.astype(jnp.float32) @ w_out + b_out
                logp = jax.nn.log_softmax(logit, -1)
                commit = (jnp.argmax(logp[:, 1:], -1) + 1).astype(jnp.int32)
                if train:
                    # sampled feedback label (pass_embed :261-263)
                    samp = (jnp.argmax(logp[:, 1:] + gumbel, -1) + 1).astype(jnp.int32)
                else:
                    samp = commit
                new_embed = embed_tbl[samp + 1]
                embeds = jnp.where(m, new_embed, embeds)
                dists = jnp.where(m, logit, dists)
                labels = jnp.where(ready, commit, labels)
            return hs, cs, done | ready, embeds, dists, labels

        hs = jnp.zeros((n, h), cdt)
        cs = jnp.zeros((n, h), cdt)
        done = jnp.zeros((n,), bool)
        embeds = jnp.zeros((n, self.embed_dim), cdt) if decode else jnp.zeros((n, 1), cdt)
        dists = jnp.zeros((n, max(self.num_classes, 1)), jnp.float32)
        labels = jnp.zeros((n,), jnp.int32)
        hs, cs, done, embeds, dists, labels = jax.lax.fori_loop(
            0, n, round_fn, (hs, cs, done, embeds, dists, labels)
        )
        if decode:
            return dists, labels
        return hs


class MultiLayerBiTreeLSTM(nn.Module):
    """Stacked bidirectional TreeLSTM (utils_treelstm.py:8-28)."""

    in_dim: int
    out_dim: int
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, forest):
        x = feats
        d = self.in_dim
        for layer in range(self.num_layers):
            fwd = TreeLSTMFwd(d, self.out_dim // 2, dtype=self.dtype,
                              name=f"fwd{layer}")(x, forest)
            bwd = TreeLSTMBwd(d, self.out_dim // 2, dtype=self.dtype,
                              name=f"bwd{layer}")(x, forest)
            x = jnp.concatenate([fwd, bwd], -1)
            d = self.out_dim
        return x


# ----------------------------------------------------------------------
# overlap geometry (utils_vctree.py get_overlap_info:355-375)
# ----------------------------------------------------------------------
def overlap_info(boxes: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(N, 6) per-box overlap statistics, IM_SCALE-normalized."""
    im_scale2 = 1024.0 * 1024.0
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt + 1.0, 0.0)
    inter = wh[..., 0] * wh[..., 1]  # (N, N) pairwise intersection areas
    iou = box_iou(boxes, boxes)
    valid2 = (mask[:, None] & mask[None, :]).astype(jnp.float32)
    inter = inter * valid2
    iou = iou * valid2
    area = box_area(boxes)[:, None]
    i1 = (inter > 0).astype(jnp.float32).sum(1, keepdims=True)
    i2 = inter.sum(1, keepdims=True) / im_scale2
    i3 = iou.sum(1, keepdims=True)
    i4 = i2 / (i1 + 1e-9)
    i5 = i3 / (i1 + 1e-9)
    i6 = area / im_scale2
    return jnp.concatenate([i1, i2, i3, i4, i5, i6], -1)


# ----------------------------------------------------------------------
# context + predictor
# ----------------------------------------------------------------------
class VCTreeContext(nn.Module):
    """VCTreeLSTMContext (model_vctree.py:72-320), batched via vmap-free
    per-image loops replaced by batched tree arrays."""

    num_obj_classes: int = 151
    embed_dim: int = 200
    hidden_dim: int = 512
    obj_layers: int = 1
    edge_layers: int = 1
    mode: str = "predcls"
    co_occur_init: Optional[np.ndarray] = None  # (num_obj, num_obj)
    embed_init: Optional[np.ndarray] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        roi_features: jnp.ndarray,    # (B, N, D)
        boxes: jnp.ndarray,
        box_mask: jnp.ndarray,
        obj_labels: jnp.ndarray,
        predict_logits: jnp.ndarray,
        image_sizes: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ):
        cdt = self.dtype
        b, n, d_in = roi_features.shape
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
            obj_logits_in = jax.nn.one_hot(obj_labels, self.num_obj_classes)
        else:
            obj_logits_in = predict_logits.astype(jnp.float32)
            probs = jax.nn.softmax(obj_logits_in, -1)
            obj_embed = probs.astype(cdt) @ embed1.embedding.astype(cdt)

        binfo = encode_box_info(boxes, image_sizes).astype(cdt)
        pos = nn.Dense(32, dtype=cdt, name="pos_fc1")(binfo)
        pos = nn.BatchNorm(use_running_average=not train, momentum=0.999,
                           dtype=cdt, name="pos_bn")(pos)
        pos = nn.relu(nn.Dense(128, dtype=cdt, name="pos_fc2")(pos))

        x = roi_features.astype(cdt)
        obj_pre = jnp.concatenate([x, obj_embed, pos], -1)

        # --- score net (vctree_score_net :291-320)
        box_emb = nn.relu(nn.BatchNorm(
            use_running_average=not train, momentum=0.999, dtype=cdt,
            name="box_bn",
        )(nn.Dense(128, dtype=cdt, name="box_fc")(binfo)))
        ov = jax.vmap(overlap_info)(boxes, box_mask).astype(cdt)
        ov_emb = nn.relu(nn.BatchNorm(
            use_running_average=not train, momentum=0.999, dtype=cdt,
            name="overlap_bn",
        )(nn.Dense(128, dtype=cdt, name="overlap_fc")(ov)))
        bi_inp = jnp.concatenate(
            [
                nn.Dense(128, dtype=cdt, name="obj_reduce")(
                    jax.lax.stop_gradient(x)
                ),
                nn.Dense(128, dtype=cdt, name="emb_reduce")(
                    jax.lax.stop_gradient(obj_embed)
                ),
                box_emb,
                ov_emb,
            ],
            -1,
        )
        pre = nn.relu(nn.Dense(self.hidden_dim, dtype=cdt, name="score_pre")(bi_inp))
        sub = nn.relu(nn.Dense(self.hidden_dim, dtype=cdt, name="score_sub")(pre))
        obj = nn.relu(nn.Dense(self.hidden_dim, dtype=cdt, name="score_obj")(pre))

        dist = jax.nn.softmax(jax.lax.stop_gradient(obj_logits_in), -1)
        # co-occurrence prior: joint (N, N, C*C) contracted with the learned
        # (initialized from pred_dist co-occurrence) weight — computed as a
        # bilinear form to avoid materializing C^2 features
        co_w = self.param(
            "bi_freq_prior",
            (lambda key, shape: jnp.asarray(self.co_occur_init).reshape(shape)
             if self.co_occur_init is not None
             else nn.initializers.lecun_normal()(key, shape)),
            (self.num_obj_classes, self.num_obj_classes),
        )
        co_prior = jnp.einsum("bic,cd,bjd->bij", dist, co_w.astype(jnp.float32), dist)

        sub_e = sub[:, :, None, :]
        obj_e = obj[:, None, :, :]
        pair_feat = jnp.concatenate(
            [
                jnp.broadcast_to(sub_e * obj_e, (b, n, n, self.hidden_dim)),
                jnp.broadcast_to(sub_e, (b, n, n, self.hidden_dim)),
                jnp.broadcast_to(obj_e, (b, n, n, self.hidden_dim)),
                co_prior[..., None].astype(cdt),
            ],
            -1,
        )
        vis_prior = nn.Dense(1, dtype=jnp.float32, name="vision_prior")(
            pair_feat
        )[..., 0]
        bi_preds = jax.nn.sigmoid(vis_prior) * co_prior
        vc_scores = jax.nn.sigmoid(bi_preds)

        # --- tree construction + context passes, per image
        forest = jax.vmap(build_vctree)(vc_scores, box_mask)

        obj_ctx_rnn = MultiLayerBiTreeLSTM(
            in_dim=d_in + self.embed_dim + 128, out_dim=self.hidden_dim,
            num_layers=self.obj_layers, dtype=cdt, name="obj_ctx_rnn",
        )
        obj_ctx = _vmap_module(obj_ctx_rnn, (0, 0), obj_pre, forest)

        if self.mode == "predcls":
            obj_preds = obj_labels
            obj_dists = jax.nn.one_hot(obj_labels, self.num_obj_classes,
                                       dtype=jnp.float32)
        else:
            decoder = TreeLSTMBwd(
                in_dim=self.hidden_dim + d_in + self.embed_dim + 128,
                h_dim=self.hidden_dim,
                num_classes=self.num_obj_classes,
                embed_dim=self.embed_dim,
                embed_init=None,
                dtype=cdt, name="decoder_rnn",
            )
            dec_inp = jnp.concatenate([obj_pre, obj_ctx], -1)
            keys = jax.random.split(
                rng if rng is not None else jax.random.PRNGKey(0), b
            )
            obj_dists, obj_preds = _vmap_module(
                decoder, (0, 0, 0, None), dec_inp, forest, keys, train
            )

        edge_pre = jnp.concatenate([embed2(obj_preds), x, obj_ctx], -1)
        edge_ctx_rnn = MultiLayerBiTreeLSTM(
            in_dim=self.embed_dim + d_in + self.hidden_dim,
            out_dim=self.hidden_dim, num_layers=self.edge_layers, dtype=cdt,
            name="edge_ctx_rnn",
        )
        edge_ctx = _vmap_module(edge_ctx_rnn, (0, 0), edge_pre, forest)
        return obj_dists, obj_preds, edge_ctx, bi_preds


def _vmap_module(mod, in_axes, *args):
    """vmap a bound module call over the leading batch axis."""
    return nn.vmap(
        lambda m, *a: m(*a),
        in_axes=in_axes, out_axes=0,
        variable_axes={"params": None, "batch_stats": None},
        split_rngs={"params": False},
    )(mod, *args)


class VCTreePredictor(nn.Module):
    """VCTree relation predictor (roi_relation_predictors.py:1441-1580)."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    embed_dim: int = 200
    hidden_dim: int = 512
    pooling_dim: int = 4096
    in_channels: int = 4096
    mode: str = "predcls"
    # MEET ensemble: per-group heads on the post_cat pair rep (pre union
    # gating — VCTreePredictor_MEET, roi_relation_predictors.py:1830-2091)
    meet_group_sizes: Optional[Tuple[int, ...]] = None
    meet_experts: int = 1
    co_occur_init: Optional[np.ndarray] = None
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
        rng: Optional[jax.Array] = None,
    ) -> LegacyOutput:
        cdt = self.dtype
        obj_dists, obj_preds, edge_ctx, bi_preds = VCTreeContext(
            num_obj_classes=self.num_obj_classes, embed_dim=self.embed_dim,
            hidden_dim=self.hidden_dim, mode=self.mode,
            co_occur_init=self.co_occur_init, embed_init=self.embed_init,
            dtype=cdt, name="context_layer",
        )(roi_features, boxes, box_mask, obj_labels, predict_logits,
          image_sizes, rng, train)

        edge_rep = nn.relu(
            nn.Dense(self.hidden_dim * 2, dtype=cdt, name="post_emb")(edge_ctx)
        )
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

        if self.meet_group_sizes is not None:
            from .predictors import MeetRelHeads

            group_logits = MeetRelHeads(
                self.meet_group_sizes, self.meet_experts, name="meet_heads",
            )(prod_rep)
            return LegacyOutput(obj_dists, None, obj_preds, bi_preds,
                                group_logits=group_logits)

        uf = union_features.astype(cdt)
        if self.pooling_dim != self.in_channels:
            uf = nn.Dense(self.pooling_dim, dtype=cdt, name="up_dim")(uf)
        ctx_dists = nn.Dense(
            self.num_rel_classes, dtype=jnp.float32, name="ctx_compress"
        )(prod_rep * uf)

        pair_pred = jnp.stack(
            [
                _gather(obj_preds[..., None], pair_idx[..., 0])[..., 0],
                _gather(obj_preds[..., None], pair_idx[..., 1])[..., 0],
            ],
            -1,
        )
        rel_dists = ctx_dists + FrequencyBias(
            num_obj_classes=self.num_obj_classes,
            num_rel_classes=self.num_rel_classes, name="freq_bias",
        )(pair_pred)
        return LegacyOutput(obj_dists, rel_dists, obj_preds, bi_preds)
