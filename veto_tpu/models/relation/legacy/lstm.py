"""Masked LSTM machinery for the Motifs context (model_motifs.py).

The reference runs torch LSTMs over PackedSequences of proposals sorted by
center-x; here sequences live on a padded (B, N) axis with a mask, and the
sort is an explicit permutation computed per image.  The decoder is the
reference's highway-LSTM cell (DecoderRNN.lstm_equations :94-122) stepped
with lax.scan, feeding back label embeddings (teacher-forced GT at train,
greedy argmax at eval).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def centerx_perm(boxes: jnp.ndarray, mask: jnp.ndarray):
    """Center-x ordering of valid proposals (LSTMContext.sort_rois).

    The reference sorts DESCENDING on the normalized center-x score
    (utils_motifs.py sort_by_score:61-89: ``torch.sort(..., descending=True)``
    on ``c_x / (c_x.max() + 1)``), i.e. right-to-left.  Returns
    (perm, inv_perm): ``x[perm]`` is sorted with padding last;
    ``y[inv_perm]`` undoes it.
    """
    cx = 0.5 * (boxes[..., 0] + boxes[..., 2])
    key = jnp.where(mask, -cx, jnp.inf)
    perm = jnp.argsort(key)
    inv = jnp.argsort(perm)
    return perm, inv


class MaskedBiLSTM(nn.Module):
    """Bidirectional masked LSTM over the padded proposal axis.

    Equivalent to torch nn.LSTM(bidirectional=True) over PackedSequences:
    padded steps carry state through unchanged so the reverse direction is
    unaffected by padding.
    """

    hidden: int
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """(B, N, D), (B, N) → (B, N, 2*hidden)."""

        def run(inputs, reverse, name):
            cell = nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype, name=name)

            def step(cell, carry, inp):
                x_t, m_t = inp
                new_carry, y = cell(carry, x_t)
                keep = m_t[:, None]
                carry = jax.tree.map(
                    lambda a, b: jnp.where(keep, a, b), new_carry, carry
                )
                return carry, jnp.where(keep, y, 0.0)

            scan = nn.scan(
                step, variable_broadcast="params", split_rngs={"params": False},
                in_axes=1, out_axes=1, reverse=reverse,
            )
            b = inputs.shape[0]
            carry = cell.initialize_carry(
                jax.random.PRNGKey(0), (b, inputs.shape[-1])
            )
            _, ys = scan(cell, carry, (inputs, mask))
            return ys

        out = x.astype(self.dtype)
        for layer in range(self.num_layers):
            fwd = run(out, False, f"fwd{layer}")
            bwd = run(out, True, f"bwd{layer}")
            out = jnp.concatenate([fwd, bwd], axis=-1)
        return out


class HighwayDecoderLSTM(nn.Module):
    """The Motifs DecoderRNN (model_motifs.py:58-223) on a batched scan.

    Per step: highway-LSTM update, object logits, and the label embedding
    feedback — GT labels teacher-forced at train (bg replaced by the argmax
    foreground prediction, :186-192), greedy argmax at eval (:194-199).
    The class-embedding table has a prepended 'start' row (index 0) and
    labels shift by +1 (:66-68, :192).
    """

    num_obj_classes: int
    embed_dim: int = 200
    hidden: int = 512
    embed_init: Optional[np.ndarray] = None  # (num_obj + 1, embed_dim)
    # > 0 enables the AttributeDecoderRNN variant
    # (model_motifs_with_attribute.py:12-181): the timestep input gains a
    # CONSTANT attribute 'start' embedding — the reference only reassigns
    # previous_att_embed after the loop (:157), so it never updates during
    # decoding — and a second out_att head emits per-step attribute logits.
    num_att_classes: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,       # (B, N, D) sorted decoder inputs
        mask: jnp.ndarray,        # (B, N) sorted validity
        gt_labels: Optional[jnp.ndarray],  # (B, N) sorted GT labels (train)
        train: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (logits (B, N, C), refined labels (B, N))."""
        cdt = self.dtype
        b, n, d = feats.shape
        h = self.hidden
        init = (
            nn.initializers.normal(1.0)
            if self.embed_init is None
            else lambda *_: jnp.asarray(self.embed_init)
        )
        # explicit params so the recurrence is a plain lax.scan (no module
        # calls inside the loop body)
        embed_tbl = self.param(
            "obj_embed", init, (self.num_obj_classes + 1, self.embed_dim),
            jnp.float32,
        ).astype(cdt)
        att_on = self.num_att_classes > 0
        if att_on:
            att_tbl = self.param(
                "att_embed", init, (self.num_att_classes, self.embed_dim),
                jnp.float32,
            ).astype(cdt)
            w_att = self.param(
                "att_out_w", nn.initializers.lecun_normal(),
                (h, self.num_att_classes), jnp.float32,
            )
            b_att = self.param(
                "att_out_b", nn.initializers.zeros, (self.num_att_classes,),
                jnp.float32,
            )
        in_dim = d + self.embed_dim * (2 if att_on else 1)
        w_in = self.param(
            "input_w", nn.initializers.lecun_normal(),
            (in_dim, 6 * h), jnp.float32,
        ).astype(cdt)
        b_in = self.param("input_b", nn.initializers.zeros, (6 * h,), jnp.float32).astype(cdt)
        w_st = self.param(
            "state_w", nn.initializers.lecun_normal(), (h, 5 * h), jnp.float32
        ).astype(cdt)
        b_st = self.param("state_b", nn.initializers.zeros, (5 * h,), jnp.float32).astype(cdt)
        w_out = self.param(
            "out_w", nn.initializers.lecun_normal(), (h, self.num_obj_classes),
            jnp.float32,
        )
        b_out = self.param(
            "out_b", nn.initializers.zeros, (self.num_obj_classes,), jnp.float32
        )

        def cell(x_t, state, memory):
            pi = x_t @ w_in + b_in
            ps = state @ w_st + b_st
            sl = lambda t, i: t[:, i * h:(i + 1) * h]  # noqa: E731
            ig = jax.nn.sigmoid(sl(pi, 0) + sl(ps, 0))
            fg = jax.nn.sigmoid(sl(pi, 1) + sl(ps, 1))
            mi = jnp.tanh(sl(pi, 2) + sl(ps, 2))
            og = jax.nn.sigmoid(sl(pi, 3) + sl(ps, 3))
            memory = ig * mi + fg * memory
            out = og * jnp.tanh(memory)
            hw = jax.nn.sigmoid(sl(pi, 4) + sl(ps, 4))
            out = hw * out + (1.0 - hw) * sl(pi, 5)
            return out, memory

        start_embed = jnp.broadcast_to(embed_tbl[0], (b, self.embed_dim))
        att_start = (
            jnp.broadcast_to(att_tbl[0], (b, self.embed_dim)) if att_on else None
        )
        teacher = train and gt_labels is not None

        def step(carry, inp):
            state, memory, prev_embed = carry
            x_t, m_t, lab_t = inp
            parts = [x_t.astype(cdt), prev_embed]
            if att_on:
                parts.append(att_start)
            tin = jnp.concatenate(parts, -1)
            new_state, new_memory = cell(tin, state, memory)
            logits_t = new_state.astype(jnp.float32) @ w_out + b_out
            att_t = (
                new_state.astype(jnp.float32) @ w_att + b_att if att_on else 0.0
            )
            fg_pred = (jnp.argmax(logits_t[:, 1:], axis=-1) + 1).astype(jnp.int32)
            refined = jnp.where(lab_t > 0, lab_t, fg_pred) if teacher else fg_pred
            new_embed = embed_tbl[refined + 1]
            keep = m_t[:, None]
            state = jnp.where(keep, new_state, state)
            memory = jnp.where(keep, new_memory, memory)
            prev_embed = jnp.where(keep, new_embed, prev_embed)
            refined = jnp.where(m_t, refined, 0)
            return (state, memory, prev_embed), (logits_t, refined, att_t)

        carry = (
            jnp.zeros((b, h), cdt),
            jnp.zeros((b, h), cdt),
            start_embed,
        )
        labs = gt_labels if gt_labels is not None else jnp.zeros((b, n), jnp.int32)
        xs = (
            jnp.moveaxis(feats, 1, 0),
            jnp.moveaxis(mask, 1, 0),
            jnp.moveaxis(labs.astype(jnp.int32), 1, 0),
        )
        _, (logits, refined, att) = jax.lax.scan(step, carry, xs)
        if att_on:
            return (jnp.moveaxis(logits, 0, 1), jnp.moveaxis(refined, 0, 1),
                    jnp.moveaxis(att, 0, 1))
        return jnp.moveaxis(logits, 0, 1), jnp.moveaxis(refined, 0, 1)
