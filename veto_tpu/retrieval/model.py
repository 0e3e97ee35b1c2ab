"""Scene-graph ↔ caption-graph retrieval encoder.

Re-design of the reference image-retrieval side task
(pysgg/image_retrieval/modelv2.py SGEncode:106-194, evaluation.py:33-49):
a shared attention encoder maps an (entities, relations, incidence-graph)
triple — from either an image scene graph or a text scene graph parsed from
captions — to one 1024-d vector; training pulls matching image/text pairs
together with a smooth-L1 triplet margin loss (:170-189); evaluation ranks
text→image similarity and reports recall@{1,5,10,20,50,100}.

TPU layout: graphs are padded to static (E, R) budgets with masks; the
reference's per-sample Python loop becomes a vmap over the batch.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Graph(NamedTuple):
    entities: jnp.ndarray   # (B, E) int entity class ids
    ent_mask: jnp.ndarray   # (B, E)
    relations: jnp.ndarray  # (B, R, 3) (head_idx, tail_idx, predicate)
    rel_mask: jnp.ndarray   # (B, R)


class _Glimpse(nn.Module):
    """ApplySingleAttention (modelv2.py:80-104): bilinear pooling of
    relation features against entity features through the incidence map."""

    mid: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, v, q, atten):
        """v (B, R, dv), q (B, E, dq), atten (B, R, E) → (B, 1, mid)."""
        v_ = nn.relu(nn.Dense(self.mid, dtype=self.dtype, name="lin_v")(v))
        q_ = nn.relu(nn.Dense(self.mid, dtype=self.dtype, name="lin_q")(q))
        # h[m] = sum_e (sum_r v_[r, m] * atten[r, e]) * q_[e, m]
        ve = jnp.einsum("brm,bre->bem", v_, atten)
        h = jnp.einsum("bem,bem->bm", ve, q_)
        return nn.Dense(self.mid, dtype=self.dtype, name="lin_atten")(h)[:, None]


class SGEncode(nn.Module):
    """Graph → 1024-d retrieval embedding (img and txt vocabularies)."""

    img_num_obj: int = 151
    img_num_rel: int = 51
    txt_num_obj: int = 4460
    txt_num_rel: int = 646
    embed_dim: int = 512
    hidden_dim: int = 512
    final_dim: int = 1024
    num_layer: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, graph: Graph, is_img: bool) -> jnp.ndarray:
        pre = "img" if is_img else "txt"
        n_obj = self.img_num_obj if is_img else self.txt_num_obj
        n_rel = self.img_num_rel if is_img else self.txt_num_rel
        obj_tbl = nn.Embed(n_obj, self.embed_dim, dtype=self.dtype,
                           name=f"{pre}_obj_embed")
        head_tbl = nn.Embed(n_obj, self.embed_dim, dtype=self.dtype,
                            name=f"{pre}_rel_head_embed")
        tail_tbl = nn.Embed(n_obj, self.embed_dim, dtype=self.dtype,
                            name=f"{pre}_rel_tail_embed")
        pred_tbl = nn.Embed(n_rel, self.embed_dim, dtype=self.dtype,
                            name=f"{pre}_rel_pred_embed")

        ents = graph.entities
        heads = jnp.take_along_axis(ents, graph.relations[..., 0], axis=1)
        tails = jnp.take_along_axis(ents, graph.relations[..., 1], axis=1)
        obj_enc = obj_tbl(ents)                               # (B, E, d)
        rel_enc = jnp.concatenate(
            [head_tbl(heads), tail_tbl(tails), pred_tbl(graph.relations[..., 2])],
            -1,
        )                                                      # (B, R, 3d)

        # incidence: relation r touches entity e (head or tail), normalized
        # per entity over its incident relations (encode :163-165)
        b, e = ents.shape
        r = graph.relations.shape[1]
        inc = (
            jax.nn.one_hot(graph.relations[..., 0], e)
            + jax.nn.one_hot(graph.relations[..., 1], e)
        )
        inc = inc * graph.rel_mask[..., None] * graph.ent_mask[:, None, :]
        inc = inc / (inc.sum(1, keepdims=True) + 1e-9)        # (B, R, E)

        q = obj_enc
        for g in range(self.num_layer):
            q = q + _Glimpse(self.hidden_dim, dtype=self.dtype,
                             name=f"glimpse{g}")(rel_enc, q, inc)
        pooled = (q * graph.ent_mask[..., None]).sum(1)        # (B, hidden)
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="final_fc1")(pooled))
        return nn.relu(nn.Dense(self.final_dim, dtype=self.dtype, name="final_fc2")(x))


def _smooth_l1_sum(a: jnp.ndarray, b: jnp.ndarray,
                   beta: float = 1.0 / 9.0) -> jnp.ndarray:
    """The reference's smooth_l1_loss with its shipped defaults — beta=1/9,
    MEAN reduction (pysgg/layers/smooth_l1_loss.py:6-16).  (Historical
    name: an earlier revision summed with beta=1, which is NOT what the
    retrieval loss computes.)"""
    d = jnp.abs(a - b)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).mean(-1)


def triplet_loss(
    fg_img: jnp.ndarray, fg_txt: jnp.ndarray,
    bg_img: jnp.ndarray, bg_txt: jnp.ndarray,
    margin: float = 1.0,
) -> jnp.ndarray:
    """SGEncode.forward training loss (modelv2.py:169-189): two hinge terms
    pulling matched (img, txt) encodings together against the backgrounds.
    The reference sums per-pair terms over the batch list; the batch MEAN
    here only rescales the gradient."""
    fg = jnp.maximum(_smooth_l1_sum(fg_img, fg_txt) + margin
                     - _smooth_l1_sum(fg_img, bg_txt), 0.0)
    bg = jnp.maximum(_smooth_l1_sum(bg_txt, bg_img) + margin
                     - _smooth_l1_sum(fg_txt, bg_img), 0.0)
    return (fg + bg).mean()


def retrieval_recall(img_enc: np.ndarray, txt_enc: np.ndarray,
                     ks=(1, 5, 10, 20, 50, 100)) -> dict:
    """txt→img recall@K over the similarity matrix (evaluation.py:33-49)."""
    sim = np.asarray(txt_enc) @ np.asarray(img_enc).T  # txt x img
    diag = np.diag(sim)
    rank = (sim > diag[:, None]).sum(-1)
    n = len(rank)
    return {k: float((rank < k).sum()) / n for k in ks}
