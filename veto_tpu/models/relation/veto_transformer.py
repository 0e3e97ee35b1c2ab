"""The VETO relation transformer (pysgg/.../relation_head/model_veto.py:6-146).

A tiny ViT over per-pair tokens:

  * PatchEmbed (model_veto.py:99-115): the subject/object 8x8 pooled maps are
    concatenated channel-wise (2*256ch), cut into (8/2)^2 = 16 patches of
    2x2; the depth patches project to 512, the visual patches to 64, and the
    two are concatenated → 16 tokens x 576.
  * token sequence (model_veto.py:52-64): [CLS, 16 patches, location token,
    class token] → 19 tokens; a single shared learnable position vector is
    added to every token (the reference's pos_embedding is (1, 1, D)).
  * 6 encoder layers of PreNorm MHA + PreNorm GELU-FFN (hidden = 2*D),
    executed in VETOTransformer.forward (model_veto.py:18-21); output is the
    CLS token.

TPU notes: every pair is independent, so the module runs on a flat
(num_pairs, ...) axis — the caller collapses (batch, pairs).  19x576 with
qkv/FFN matmuls batched over thousands of pairs maps straight onto the MXU;
XLA fuses the softmax/layernorm chains.  All shapes are static.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


# attention implementation switch (perf A/B; both are mathematically the
# softmax(QK^T/sqrt(dh))V attention of model_veto.py:67-98):
#   "lane"    — unrolled per-head lane slices, no head-axis transpose
#   "batched" — one einsum pair with (pairs, heads) batch dims
ATTN_IMPL = "lane"


class _SelfAttention(nn.Module):
    """MHSA, qkv without bias + output projection (model_veto.py:67-98)."""

    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        dh = d // self.heads
        qkv = nn.Dense(3 * d, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        scale = dh ** -0.5
        if ATTN_IMPL == "batched":
            n, t = x.shape[:2]
            q = qkv[..., :d].reshape(n, t, self.heads, dh)
            k = qkv[..., d:2 * d].reshape(n, t, self.heads, dh)
            v = qkv[..., 2 * d:].reshape(n, t, self.heads, dh)
            s = jnp.einsum("bihd,bjhd->bhij", q, k,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhij,bjhd->bihd", p, v,
                             preferred_element_type=jnp.float32)
            out = out.astype(self.dtype).reshape(n, t, d)
            return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        # per-head lane slices instead of a head-axis transpose: on TPU the
        # head split is a contiguous slice of the minor (lane) dimension, so
        # no relayout copies are emitted; the unrolled head loop issues
        # plainly-batched (N, T, dh) x (N, T, dh) matmuls.
        outs = []
        for h in range(self.heads):
            q = qkv[..., h * dh:(h + 1) * dh]
            k = qkv[..., d + h * dh:d + (h + 1) * dh]
            v = qkv[..., 2 * d + h * dh:2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
            p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
            outs.append(
                jax.lax.dot_general(
                    p, v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(self.dtype)
            )
        out = jnp.concatenate(outs, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class _FeedForward(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        # exact (erf) GELU — torch nn.GELU() default (model_veto.py:141)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class PatchEmbed(nn.Module):
    """(P, 8, 8, 2C) depth & visual maps → (P, 16, 576) tokens."""

    patch_size: int = 2
    depth_proj_dim: int = 512
    visual_proj_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, d: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size

        def patchify(x):
            # (..., H, W, C) → (..., (H/p)*(W/p), p*p*C)
            *lead, h, w, c = x.shape
            x = x.reshape(*lead, h // p, p, w // p, p, c)
            x = jnp.moveaxis(x, -4, -3)  # (..., h/p, w/p, p, p, c)
            return x.reshape(*lead, (h // p) * (w // p), p * p * c)

        d_tok = nn.Dense(self.depth_proj_dim, dtype=self.dtype, name="proj_d")(patchify(d))
        v_tok = nn.Dense(self.visual_proj_dim, dtype=self.dtype, name="proj_v")(patchify(v))
        return jnp.concatenate([d_tok, v_tok], axis=-1)


class VetoTransformer(nn.Module):
    """depth/visual pair maps + location/class tokens → per-pair CLS feature."""

    dim: int = 576
    layers: int = 6
    heads: int = 6
    patch_size: int = 2
    depth_proj_dim: int = 512
    visual_proj_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        depth_maps: jnp.ndarray,   # (P, 8, 8, 2C)
        visual_maps: jnp.ndarray,  # (P, 8, 8, 2C)
        loc_token: jnp.ndarray,    # (P, dim)
        cls_token: jnp.ndarray,    # (P, dim)
    ) -> jnp.ndarray:
        tokens = PatchEmbed(
            self.patch_size, self.depth_proj_dim, self.visual_proj_dim,
            dtype=self.dtype, name="patch_embed",
        )(depth_maps, visual_maps)

        cls0 = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim), jnp.float32)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0), (1, 1, self.dim), jnp.float32)

        n = tokens.shape[0]
        x = jnp.concatenate(
            [
                jnp.broadcast_to(cls0.astype(self.dtype), (n, 1, self.dim)),
                tokens,
                loc_token[:, None, :].astype(self.dtype),
                cls_token[:, None, :].astype(self.dtype),
            ],
            axis=1,
        )
        x = x + pos.astype(self.dtype)

        for i in range(self.layers):
            y = nn.LayerNorm(dtype=self.dtype, name=f"attn_norm{i}")(x)
            x = _SelfAttention(self.dim, self.heads, dtype=self.dtype, name=f"attn{i}")(y) + x
            y = nn.LayerNorm(dtype=self.dtype, name=f"ffn_norm{i}")(x)
            x = _FeedForward(self.dim, self.dim * 2, dtype=self.dtype, name=f"ffn{i}")(y) + x
        return x[:, 0]
