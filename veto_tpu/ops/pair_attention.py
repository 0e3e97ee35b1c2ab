"""Fused per-pair multi-head attention (Pallas TPU kernel).

The VETO relation transformer runs attention over tiny 19-token sequences
for thousands of independent pairs (model_veto.py:67-98).  Under plain XLA
this lowers to per-head batched (P, 19, 96) x (P, 19, 96) matmuls whose
operands round-trip HBM between qkv-projection, softmax, and the PV
matmul — measured at ~6x the cost of the dense projections around them.
This kernel keeps a block of pairs' q/k/v in VMEM and fuses
scores → softmax → PV for all heads in one pass; the backward kernel
recomputes the (tiny) probability tiles instead of storing them
(flash-attention-style, trivially exact at 19 tokens).

Shapes: q, k, v (P, T, D) with D = heads * head_dim; output (P, T, D).
P must be a multiple of the block size (the caller pads pairs — the pair
axis is already padded/masked everywhere in this framework).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# set True in tests to run the kernels through the interpreter (CPU)
INTERPRET = False


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, t_pad: int,
                     t_valid: int, scale: float):
    """One pair-block (flattened to (B*T, D)), all heads.

    The lane dim must stay full-width (Mosaic requires lane blocks of 128
    or the whole axis), so heads are unrolled inside the kernel over lane
    slices; the caller pre-flattens (P, T, D) → (P*T, D) so every in-kernel
    operand is 2D and MXU-sized."""
    d = q_ref.shape[-1]
    dh = d // heads
    outs = []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        outs.append(_one_head_fwd(q_ref[:, sl], k_ref[:, sl],
                                  v_ref[:, sl], t_pad, t_valid, scale,
                                  o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def _blockdiag_mask(rows, t_pad, t_valid):
    """(rows, rows) mask: query i attends key j iff same pair
    (i//t_pad == j//t_pad) and j is a real (unpadded) token."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    ids = idx // t_pad
    same = ids == ids.reshape(1, rows)
    real_key = (idx % t_pad < t_valid).reshape(1, rows)
    return same & real_key


def _one_head_fwd(q2, k2, v2, t_pad, t_valid, scale, out_dtype):
    """All pairs of the block as ONE (b*t_pad, dh) sequence with a
    block-diagonal mask: turns b tiny (t x dh x t) matmuls into a single
    MXU-tile-sized (b*t_pad, dh) x (dh, b*t_pad) one.  The off-diagonal
    waste is pure MXU throughput, far cheaper than the per-pair dispatch
    it replaces; with b*t_pad <= 128 each matmul is exactly one MXU tile."""
    rows = q2.shape[0]
    s = jax.lax.dot_general(
        q2, k2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = jnp.where(_blockdiag_mask(rows, t_pad, t_valid), s, -1e9)
    p = jax.nn.softmax(s, axis=-1).astype(v2.dtype)
    o = jax.lax.dot_general(
        p, v2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return o.astype(out_dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, heads: int, t_pad: int, t_valid: int, scale: float):
    """Backward for one pair-block; recomputes the probability tile
    instead of storing it (flash-style, exact at these sizes)."""
    d = q_ref.shape[-1]
    dh = d // heads
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        dq, dk, dv = _one_head_bwd(
            q_ref[:, sl], k_ref[:, sl], v_ref[:, sl],
            do_ref[:, sl], t_pad, t_valid, scale)
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
    dq_ref[:] = jnp.concatenate(dqs, axis=-1)
    dk_ref[:] = jnp.concatenate(dks, axis=-1)
    dv_ref[:] = jnp.concatenate(dvs, axis=-1)


def _one_head_bwd(q2, k2, v2, do2, t_pad, t_valid, scale):
    rows = q2.shape[0]
    s = jax.lax.dot_general(
        q2, k2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jax.nn.softmax(
        jnp.where(_blockdiag_mask(rows, t_pad, t_valid), s, -1e9), axis=-1)
    pb = p.astype(q2.dtype)
    dv = jax.lax.dot_general(  # dv = p^T do
        pb, do2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(  # dp = do v^T
        do2, v2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # masked entries have p = 0, so ds vanishes there automatically
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = (ds * scale).astype(q2.dtype)
    dq = jax.lax.dot_general(
        dsb, k2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        dsb, q2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dq, dk, dv


def _block_spec(d, rows):
    return pl.BlockSpec((rows, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _choose_block(p: int, block: int) -> int:
    while block > 1 and p % block:
        block //= 2
    return max(block, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pair_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   heads: int = 6, block: int = 4) -> jnp.ndarray:
    """softmax(QK^T/sqrt(dh))V over (P, T, D) per-pair sequences."""
    out, _ = _fwd(q, k, v, heads, block)
    return out


def _pad_tokens(x, t_pad):
    t = x.shape[1]
    return x if t == t_pad else jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))


def _fwd(q, k, v, heads, block):
    p, t, d = q.shape
    t_pad = -(-t // 4) * 4  # minimal Mosaic-accepted token padding
    blk = _choose_block(p, block)
    rows = blk * t_pad
    scale = (d // heads) ** -0.5
    out = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, heads=heads, t_pad=t_pad,
                          t_valid=t, scale=scale),
        out_shape=jax.ShapeDtypeStruct((p * t_pad, d), q.dtype),
        grid=(p // blk,),
        in_specs=[_block_spec(d, rows)] * 3,
        out_specs=_block_spec(d, rows),
        interpret=INTERPRET,
    )(_pad_tokens(q, t_pad).reshape(p * t_pad, d),
      _pad_tokens(k, t_pad).reshape(p * t_pad, d),
      _pad_tokens(v, t_pad).reshape(p * t_pad, d))
    return out.reshape(p, t_pad, d)[:, :t], (q, k, v)


def _bwd(heads, block, res, do):
    q, k, v = res
    p, t, d = q.shape
    t_pad = -(-t // 4) * 4
    blk = _choose_block(p, block)
    rows = blk * t_pad
    scale = (d // heads) ** -0.5
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, heads=heads, t_pad=t_pad,
                          t_valid=t, scale=scale),
        out_shape=[jax.ShapeDtypeStruct((p * t_pad, d), q.dtype)] * 3,
        grid=(p // blk,),
        in_specs=[_block_spec(d, rows)] * 4,
        out_specs=[_block_spec(d, rows)] * 3,
        interpret=INTERPRET,
    )(_pad_tokens(q, t_pad).reshape(p * t_pad, d),
      _pad_tokens(k, t_pad).reshape(p * t_pad, d),
      _pad_tokens(v, t_pad).reshape(p * t_pad, d),
      _pad_tokens(do, t_pad).reshape(p * t_pad, d))
    return tuple(
        g.reshape(p, t_pad, d)[:, :t] for g in (dq, dk, dv)
    )


pair_attention.defvjp(_fwd, _bwd)


def pair_attention_reference(q, k, v, heads: int = 6) -> jnp.ndarray:
    """Plain-XLA reference used for correctness tests."""
    p, t, d = q.shape
    dh = d // heads
    qh = q.reshape(p, t, heads, dh).astype(jnp.float32)
    kh = k.reshape(p, t, heads, dh).astype(jnp.float32)
    vh = v.reshape(p, t, heads, dh).astype(jnp.float32)
    s = jnp.einsum("bihd,bjhd->bhij", qh, kh) * (dh ** -0.5)
    pr = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bjhd->bihd", pr, vh)
    return o.reshape(p, t, d).astype(q.dtype)
