"""Fused VETO encoder layer (Pallas TPU kernel).

One kernel computes a full PreNorm transformer layer over a block of
relation pairs:

    x1 = x + Wout @ MHA(LN1(x))        (attention sub-block)
    y  = x1 + W2 @ gelu(W1 @ LN2(x1))  (FFN sub-block)

for the VETO pair transformer's tiny 19-token sequences
(model_veto.py:6-64).  Under plain XLA every arrow above materializes a
(P, 19, ·) tensor in HBM and the per-pair attention lowers to thousands
of sub-MXU-tile batched matmuls; measured on v5e this makes the encoder
~4x slower than its dense-matmul roofline.  Here a block of pairs stays
in VMEM through the whole layer and attention over the concatenated
block sequence uses ONE MXU-sized matmul with a block-diagonal mask.

Token layout: the caller pads the token axis once to t_pad = 24 (8-aligned
sublanes) and keeps x as (P * t_pad, D) 2-D across all layers; pad rows
flow through harmlessly (the attention mask excludes them as keys, and
their outputs stay confined to pad rows).

The backward pass recomputes the forward in-kernel (flash-style) and emits
dx plus the pre-projection gradients (d_qkv, d_attnout, d_ffn1, d_ffn2
inputs); the weight gradients are then plain roofline-friendly XLA matmuls
over those — see `_bwd`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

_NEG = -1e9


class EncoderLayerParams(NamedTuple):
    """One layer's parameters, all f32 except the big matrices (any dtype)."""

    ln1_scale: jnp.ndarray  # (D,)
    ln1_bias: jnp.ndarray   # (D,)
    w_qkv: jnp.ndarray      # (D, 3D)
    w_out: jnp.ndarray      # (D, D)
    b_out: jnp.ndarray      # (D,)
    ln2_scale: jnp.ndarray  # (D,)
    ln2_bias: jnp.ndarray   # (D,)
    w1: jnp.ndarray         # (D, F)
    b1: jnp.ndarray         # (F,)
    w2: jnp.ndarray         # (F, D)
    b2: jnp.ndarray         # (D,)


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7 — below
    bf16 resolution); Mosaic implements neither erf nor erfc."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(z):
    """0.5 z (1 + erf(z/sqrt(2))) — torch nn.GELU() numerics."""
    return 0.5 * z * (1.0 + _erf(z * 0.7071067811865476))


def _ln(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    m = xf.mean(-1, keepdims=True)
    c = xf - m
    v = (c * c).mean(-1, keepdims=True)
    inv = jax.lax.rsqrt(v + eps)
    return c * inv * scale + bias, c, inv


def _mask(rows, t_pad, t_valid):
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    ids = idx // t_pad
    same = ids == ids.reshape(1, rows)
    real_key = (idx % t_pad < t_valid).reshape(1, rows)
    return same & real_key


def _attention(qkv, heads, t_pad, t_valid, dtype, sub_rows=None):
    """Block-diagonal masked attention over the flattened block sequence.

    Attention only mixes rows of the SAME pair, so the (rows, rows) score
    matrix is block-diagonal at t_pad granularity: computing it over the
    whole pair block wastes a factor block/sub of the score/PV FLOPs.
    ``sub_rows`` tiles the sequence into sub-blocks of that many rows
    (a multiple of t_pad) and runs attention per tile — same math, the
    cross-tile scores were all masked anyway.
    """
    rows, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    scale = dh ** -0.5
    sub = rows if sub_rows is None else min(sub_rows, rows)
    mask = _mask(sub, t_pad, t_valid)
    sub_outs = []
    for s0 in range(0, rows, sub):
        outs = []
        for h in range(heads):
            q = qkv[s0:s0 + sub, h * dh:(h + 1) * dh]
            k = qkv[s0:s0 + sub, d + h * dh:d + (h + 1) * dh]
            v = qkv[s0:s0 + sub, 2 * d + h * dh:2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = jax.nn.softmax(jnp.where(mask, s, _NEG), axis=-1).astype(dtype)
            outs.append(jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype))
        sub_outs.append(jnp.concatenate(outs, axis=-1))
    return sub_outs[0] if len(sub_outs) == 1 else jnp.concatenate(sub_outs, axis=0)


def _fwd_kernel(x_ref, ln1s, ln1b, wqkv, wout, bout, ln2s, ln2b, w1, b1,
                w2, b2, y_ref, *rest, heads, t_pad, t_valid, sub_rows=None):
    """Forward layer; with stash outputs, ``rest = (qkv_ref, x1_ref)``."""
    dtype = x_ref.dtype
    x = x_ref[:]
    h1, _, _ = _ln(x, ln1s[:], ln1b[:])
    h1 = h1.astype(dtype)
    qkv = jnp.dot(h1, wqkv[:], preferred_element_type=jnp.float32).astype(dtype)
    att = _attention(qkv, heads, t_pad, t_valid, dtype, sub_rows)
    a = (jnp.dot(att, wout[:], preferred_element_type=jnp.float32)
         + bout[:]).astype(dtype)
    x1 = x + a
    h2, _, _ = _ln(x1, ln2s[:], ln2b[:])
    h2 = h2.astype(dtype)
    f1 = (jnp.dot(h2, w1[:], preferred_element_type=jnp.float32) + b1[:])
    g = _gelu_exact(f1).astype(dtype)
    f2 = (jnp.dot(g, w2[:], preferred_element_type=jnp.float32) + b2[:]).astype(dtype)
    y_ref[:] = x1 + f2
    if rest:
        qkv_ref, x1_ref = rest
        qkv_ref[:] = qkv
        x1_ref[:] = x1


def _row_spec(rows, d):
    return pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _full_spec(*shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _param_specs(p: EncoderLayerParams):
    return [_full_spec(*w.shape) for w in p]


# default pair-block sizes (pairs per kernel invocation) and attention
# sub-tile (pairs per block-diagonal attention matmul); benches override
# these module globals before tracing to sweep the tiling.
# Round-3 sweeps (tools/sweep_fused_encoder.py, 8192 pairs t_pad=20, v5e):
# fwd+bwd is FLAT across attn_sub ∈ {2,4,8,full} — the kernel runs near
# its matmul asymptote, so block-diagonal attention waste is not the
# binding constraint; keep full-block attention (None).  With the qkv/x1
# stash (below): stash=1 bwd_block=4 wins at every block size (170.5 /
# 172.0 / 176.4 ms for block 8/16/32 vs 178.2/179.4/181.8 without), and
# block=8 also edges fwd-only (48.5 vs 49.9/53.1 ms) → block=8.
# bwd_block=8 overflows VMEM (compile failure), 2 serializes (239 ms).
FUSED_BLOCK = 8
FUSED_BWD_BLOCK = 4
FUSED_ATTN_SUB = None
# stash qkv + x1 in the forward kernel (bf16, bit-identical to the values
# the backward used to recompute) so the backward skips its two largest
# recomputed matmuls (qkv: D*3D, out-proj: D*D per row).  The FFN-1 matmul
# and gelu stay recomputed: stashing f1 needs f32 for gradient parity and
# the extra VMEM forces a smaller forward block.  Traffic cost ~0.76 GB/layer
# round-trip vs ~0.44 TFLOP/layer compute saved.
FUSED_STASH = True
# split backward (round 4): instead of ONE kernel that computes dx AND
# emits the three FFN factor tensors (h2, df1, g — ~0.9 GB/layer at
# flagship shapes) to HBM for XLA-side dW1/dW2 matmuls, run TWO passes —
# FFN backward (emits dx1, accumulates dW1/dW2 in VMEM) then attention
# backward (emits dx, accumulates dWqkv/dWout in VMEM).  Each pass holds
# only its own weights + accumulators, so both fit bigger row blocks than
# the monolithic kernel's bwd_block=4 VMEM ceiling, and the factor-tensor
# HBM round-trips disappear (~1.9 GB/layer saved).  Requires the
# qkv/x1 stash (without it, pass A cannot form x1 without re-running the
# whole attention forward).  Gradients match the monolithic path to
# accumulation-order rounding (the dW partial-sum block size changes).
FUSED_SPLIT = True
# round-4 sweep (tools/sweep_fused_encoder.py --split, 8192 pairs t_pad=20,
# v5e, same-day same-harness): split 16/16 = 172.8 ms vs monolithic
# stash/block8/bwd4 = 242.9 ms for the 6-layer stack fwd+bwd (1.41x).
# Grid: 8/8 235.5, 8/16 181.1, 16/8 184.4, 16/16 172.9; 32-pair blocks
# overflow scoped VMEM in either pass.
FUSED_FFN_BWD_BLOCK = 4
FUSED_ATT_BWD_BLOCK = 8
# ^ round-5 revision: BOTH 16-pair passes sit ON the remote compiler's
# 16M scoped-VMEM limit (17.8M / 17.2M requests) — identical kernel
# shapes compiled inside one train step and OOMed inside another (the
# limit's headroom varies with the surrounding fusion), so 16-pair
# blocks are not compile-robust.  Same-day round-5 sweep over the
# compile-safe grid: 4/8 = 197.0 ms, 8/4 = 201.9, 8/8 = 214.0 (6-layer
# stack fwd+bwd, 8192 pairs) → 4/8.  Round-4's recorded 172.8 ms for
# 16/16 was already non-reproducible across sessions; see BASELINE.md
# round-5 notes.
# round-5 experiment (VERDICT r4 #7): accumulate the split passes' dW /
# vector grads in explicit VMEM scratch and copy to the outputs once on
# the final grid step, instead of the += read-modify-write on the output
# refs each step.  Outputs with a constant index_map already stay
# VMEM-resident across the grid on TPU, so this isolates whether the
# per-step accumulate costs anything beyond the adds themselves.
# Measured (tools/sweep_fused_encoder.py --split --dw-scratch, 8192 pairs,
# 6 layers, fwd+bwd, same-harness): see BASELINE.md round-5 section.
FUSED_DW_SCRATCH = False


def _sub_rows(blk, t_pad, attn_sub):
    """Largest attention sub-tile ≤ attn_sub pairs that divides the block;
    None (the measured default) = attention over the whole block."""
    attn_sub = FUSED_ATTN_SUB if attn_sub is None else attn_sub
    if attn_sub is None:
        return blk
    sub = max(1, min(attn_sub, blk // t_pad))
    while (blk // t_pad) % sub:
        sub -= 1
    return sub * t_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def fused_encoder_layer(x: jnp.ndarray, params: EncoderLayerParams,
                        heads: int, t_pad: int, t_valid: int,
                        block: int = None, bwd_block: int = None,
                        attn_sub: int = None,
                        bwd_stash: bool = None) -> jnp.ndarray:
    """x (P*t_pad, D) → one transformer layer; see module docstring.

    ``bwd_stash`` (renamed from ``stash`` — the name states the contract)
    only affects DIFFERENTIATED calls: this primal body runs when the call
    is NOT being differentiated (under jax.grad the custom_vjp machinery
    runs ``_fwd`` instead), and it always passes stash=False — eval/
    inference steps skip the qkv/x1 stash writes (4·D bf16 per row per
    layer — ~1.5 GB/layer at the 2048-pair eval budget) that only the
    backward consumes.  The y output is bit-identical either way, so a
    forward-only caller cannot observe the flag.
    """
    return _fwd(x, params, heads, t_pad, t_valid, block, bwd_block,
                attn_sub, False)[0]


def _fwd(x, params, heads, t_pad, t_valid, block, bwd_block=None,
         attn_sub=None, stash=None):
    block = FUSED_BLOCK if block is None else block
    stash = FUSED_STASH if stash is None else stash
    rows_total, d = x.shape
    blk = block * t_pad
    while rows_total % blk:
        blk //= 2
    out_shape = jax.ShapeDtypeStruct((rows_total, d), x.dtype)
    out_spec = _row_spec(blk, d)
    if stash:
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((rows_total, 3 * d), x.dtype),
                     jax.ShapeDtypeStruct((rows_total, d), x.dtype)]
        out_spec = [out_spec, _row_spec(blk, 3 * d), _row_spec(blk, d)]
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, t_pad=t_pad,
                          t_valid=t_valid,
                          sub_rows=_sub_rows(blk, t_pad, attn_sub)),
        out_shape=out_shape,
        grid=(rows_total // blk,),
        in_specs=[_row_spec(blk, d)] + _param_specs(params),
        out_specs=out_spec,
        interpret=INTERPRET,
    )(x, *params)
    if stash:
        y, qkv, x1 = outs
        return y, (x, params, qkv, x1)
    return outs, (x, params, None, None)


def _bwd_kernel(x_ref, ln1s, ln1b, wqkv, wout, bout, ln2s, ln2b, w1, b1,
                w2, b2, dy_ref, *rest,
                heads, t_pad, t_valid, sub_rows=None):
    """Recompute forward, emit dx + the FFN factors (h2, df1, g) for the
    XLA-side dW1/dW2 matmuls, and accumulate everything else in VMEM:
    all vector grads plus dWqkv = h1^T dqkv and dWout = att^T dx1 (their
    factor tensors are the largest — keeping them in-kernel removes
    ~1.4 GB of HBM round-trips per layer).

    With stashed inputs ``rest = (qkv_ref, x1_ref, *out_refs)`` the qkv
    and out-proj recomputation matmuls are skipped: qkv/x1 are the exact
    bf16 values the forward wrote, so gradients are bit-identical to the
    recompute path.  The per-pair attention (scores -> softmax -> p @ v)
    is still re-run from qkv — it is ~2% of the skipped matmul FLOPs.
    """
    if len(rest) == 10:
        qkv_ref, x1_ref = rest[:2]
        (dx_ref, dh2_ref, ddf1_ref, dg_ref,
         vd_ref, vf_ref, dwqkv_ref, dwout_ref) = rest[2:]
    else:
        qkv_ref = x1_ref = None
        (dx_ref, dh2_ref, ddf1_ref, dg_ref,
         vd_ref, vf_ref, dwqkv_ref, dwout_ref) = rest
    dtype = x_ref.dtype
    d = x_ref.shape[-1]
    dh = d // heads
    scale = dh ** -0.5

    # ---- recompute forward
    x = x_ref[:]
    ln1sv, ln1bv = ln1s[:], ln1b[:]
    h1f, c1, inv1 = _ln(x, ln1sv, ln1bv)
    h1 = h1f.astype(dtype)
    if qkv_ref is None:
        qkv = jnp.dot(h1, wqkv[:],
                      preferred_element_type=jnp.float32).astype(dtype)
    else:
        qkv = qkv_ref[:]
    rows = x.shape[0]
    sub = rows if sub_rows is None else min(sub_rows, rows)
    mask = _mask(sub, t_pad, t_valid)
    ps = {}
    att_subs = []
    for s0 in range(0, rows, sub):
        att_parts = []
        for h in range(heads):
            q = qkv[s0:s0 + sub, h * dh:(h + 1) * dh]
            k = qkv[s0:s0 + sub, d + h * dh:d + (h + 1) * dh]
            v = qkv[s0:s0 + sub, 2 * d + h * dh:2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = jax.nn.softmax(jnp.where(mask, s, _NEG), axis=-1)
            ps[(s0, h)] = p
            att_parts.append(jax.lax.dot_general(
                p.astype(dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype))
        att_subs.append(jnp.concatenate(att_parts, axis=-1))
    att = att_subs[0] if len(att_subs) == 1 else jnp.concatenate(att_subs, axis=0)
    if x1_ref is None:
        a = (jnp.dot(att, wout[:], preferred_element_type=jnp.float32)
             + bout[:]).astype(dtype)
        x1 = x + a
    else:
        x1 = x1_ref[:]
    ln2sv, ln2bv = ln2s[:], ln2b[:]
    h2f, c2, inv2 = _ln(x1, ln2sv, ln2bv)
    h2 = h2f.astype(dtype)
    f1 = jnp.dot(h2, w1[:], preferred_element_type=jnp.float32) + b1[:]
    g = _gelu_exact(f1)
    gb = g.astype(dtype)

    # ---- backward
    dy = dy_ref[:].astype(jnp.float32)
    # FFN: y = x1 + (g @ w2 + b2)
    dg = jnp.dot(dy.astype(dtype), w2[:].T,
                 preferred_element_type=jnp.float32)
    # exact gelu derivative: Phi(z) + z phi(z)
    z = f1
    phi = jnp.exp(-0.5 * z * z) * 0.3989422804014327
    cdf = 0.5 * (1.0 + _erf(z * 0.7071067811865476))
    df1 = dg * (cdf + z * phi)
    dh2f = jnp.dot(df1.astype(dtype), w1[:].T,
                   preferred_element_type=jnp.float32)
    # LN2 backward (scale ln2s): dh2f -> dx1a
    dx1a = _ln_bwd(dh2f, c2, inv2, ln2sv)
    dx1 = dy + dx1a
    # attention out-proj: a = att @ wout + bout
    datt = jnp.dot(dx1.astype(dtype), wout[:].T,
                   preferred_element_type=jnp.float32)
    # attention backward per sub-block per head → dqkv
    dattb = datt.astype(dtype)
    dqkv_subs = []
    for s0 in range(0, rows, sub):
        dqkv_parts_q = []
        dqkv_parts_k = []
        dqkv_parts_v = []
        for h in range(heads):
            q = qkv[s0:s0 + sub, h * dh:(h + 1) * dh]
            k = qkv[s0:s0 + sub, d + h * dh:d + (h + 1) * dh]
            v = qkv[s0:s0 + sub, 2 * d + h * dh:2 * d + (h + 1) * dh]
            p = ps[(s0, h)]
            pb = p.astype(dtype)
            do = dattb[s0:s0 + sub, h * dh:(h + 1) * dh]
            dv = jax.lax.dot_general(
                pb, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsb = (ds * scale).astype(dtype)
            dq = jax.lax.dot_general(
                dsb, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk = jax.lax.dot_general(
                dsb, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_parts_q.append(dq)
            dqkv_parts_k.append(dk)
            dqkv_parts_v.append(dv)
        dqkv_subs.append(jnp.concatenate(
            [jnp.concatenate(dqkv_parts_q, axis=-1),
             jnp.concatenate(dqkv_parts_k, axis=-1),
             jnp.concatenate(dqkv_parts_v, axis=-1)], axis=-1))
    dqkv = (dqkv_subs[0] if len(dqkv_subs) == 1
            else jnp.concatenate(dqkv_subs, axis=0))
    dh1 = jnp.dot(dqkv.astype(dtype), wqkv[:].T,
                  preferred_element_type=jnp.float32)
    dx = dx1 + _ln_bwd(dh1, c1, inv1, ln1sv)

    dx_ref[:] = dx.astype(dx_ref.dtype)
    dh2_ref[:] = h2          # for the XLA-side dW1 = h2^T df1
    ddf1_ref[:] = df1.astype(ddf1_ref.dtype)
    dg_ref[:] = gb           # for the XLA-side dW2 = g^T dy

    # ---- vector + big weight grads accumulate across grid steps in the
    # constant-index output blocks (they live in VMEM for the whole grid)
    xhat1 = c1 * inv1
    xhat2 = c2 * inv2
    vd = jnp.stack([
        (dh1 * xhat1).sum(0),   # d ln1_scale
        dh1.sum(0),             # d ln1_bias
        (dh2f * xhat2).sum(0),  # d ln2_scale
        dh2f.sum(0),            # d ln2_bias
        dx1.sum(0),             # d b_out
        dy.sum(0),              # d b2
    ])
    vf = df1.sum(0).reshape(1, -1)  # d b1
    dqkvb = dqkv.astype(dtype)
    dwqkv = jax.lax.dot_general(  # h1^T dqkv
        h1, dqkvb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx1b = dx1.astype(dtype)
    dwout = jax.lax.dot_general(  # att^T dx1
        att, dx1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        vd_ref[:] = vd
        vf_ref[:] = vf
        dwqkv_ref[:] = dwqkv
        dwout_ref[:] = dwout

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        vd_ref[:] += vd
        vf_ref[:] += vf
        dwqkv_ref[:] += dwqkv
        dwout_ref[:] += dwout


def _accumulate(acc_refs, values, out_refs=None):
    """Grid-step accumulation of weight/vector grads.

    ``acc_refs`` receive ``values`` on step 0 and ``+=`` afterwards.  When
    ``out_refs`` is given (the FUSED_DW_SCRATCH experiment), ``acc_refs``
    are VMEM scratch and the final grid step copies them to the real
    outputs — isolating whether the per-step += on output refs costs
    anything beyond the adds (constant-index outputs already stay
    VMEM-resident across the grid on TPU).
    """

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r, v in zip(acc_refs, values):
            r[:] = v

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        for r, v in zip(acc_refs, values):
            r[:] += v

    if out_refs is not None:
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _flush():
            for o, r in zip(out_refs, acc_refs):
                o[:] = r[:]


def _ln_bwd(dout, c, inv, scale):
    """LayerNorm backward wrt input (f32). c = x - mean, inv = rsqrt(var)."""
    n = c.shape[-1]
    xhat = c * inv
    dxhat = dout * scale
    return inv * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )


def _ffn_bwd_kernel(x1_ref, ln2s, ln2b, w1, b1, w2, dy_ref,
                    dx1_ref, dw1_ref, dw2_ref, vd_ref, vf_ref, *scratch):
    """Split-backward pass A: FFN sub-block ``y = x1 + W2 gelu(W1 LN2(x1))``.

    Emits dx1 (f32 — the exact value the monolithic kernel carried
    internally) and accumulates dW1/dW2 + the FFN-side vector grads
    (d ln2_scale/bias, d b_out = sum dx1, d b2, d b1) across grid steps.
    f1/gelu are recomputed from the stashed x1 (stashing f1 would need f32
    for gradient parity — see FUSED_STASH note).
    """
    dtype = x1_ref.dtype
    x1 = x1_ref[:]
    h2f, c2, inv2 = _ln(x1, ln2s[:], ln2b[:])
    h2 = h2f.astype(dtype)
    f1 = jnp.dot(h2, w1[:], preferred_element_type=jnp.float32) + b1[:]
    g = _gelu_exact(f1)
    gb = g.astype(dtype)

    dy = dy_ref[:].astype(jnp.float32)
    dg = jnp.dot(dy.astype(dtype), w2[:].T,
                 preferred_element_type=jnp.float32)
    z = f1
    phi = jnp.exp(-0.5 * z * z) * 0.3989422804014327
    cdf = 0.5 * (1.0 + _erf(z * 0.7071067811865476))
    df1 = dg * (cdf + z * phi)
    dh2f = jnp.dot(df1.astype(dtype), w1[:].T,
                   preferred_element_type=jnp.float32)
    dx1 = dy + _ln_bwd(dh2f, c2, inv2, ln2s[:])
    dx1_ref[:] = dx1

    df1b = df1.astype(dtype)
    dw1 = jax.lax.dot_general(  # h2^T df1
        h2, df1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2 = jax.lax.dot_general(  # g^T dy
        gb, dy.astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xhat2 = c2 * inv2
    vd = jnp.stack([
        (dh2f * xhat2).sum(0),  # d ln2_scale
        dh2f.sum(0),            # d ln2_bias
        dx1.sum(0),             # d b_out
        dy.sum(0),              # d b2
    ])
    vf = df1.sum(0).reshape(1, -1)  # d b1

    _accumulate(scratch or (dw1_ref, dw2_ref, vd_ref, vf_ref),
                (dw1, dw2, vd, vf),
                (dw1_ref, dw2_ref, vd_ref, vf_ref) if scratch else None)


def _att_bwd_kernel(x_ref, ln1s, ln1b, wqkv, wout, qkv_ref, dx1_ref,
                    dx_ref, dwqkv_ref, dwout_ref, vd_ref, *scratch,
                    heads, t_pad, t_valid, sub_rows=None):
    """Split-backward pass B: attention sub-block ``x1 = x + Wout MHA(LN1 x)``.

    Consumes pass A's f32 dx1, recomputes the attention probabilities from
    the stashed qkv, emits dx, and accumulates dWqkv/dWout + d ln1_scale/bias
    across grid steps.
    """
    dtype = x_ref.dtype
    d = x_ref.shape[-1]
    dh = d // heads
    scale = dh ** -0.5

    x = x_ref[:]
    ln1sv = ln1s[:]
    h1f, c1, inv1 = _ln(x, ln1sv, ln1b[:])
    h1 = h1f.astype(dtype)
    qkv = qkv_ref[:]
    rows = x.shape[0]
    sub = rows if sub_rows is None else min(sub_rows, rows)
    mask = _mask(sub, t_pad, t_valid)

    dx1 = dx1_ref[:]
    datt = jnp.dot(dx1.astype(dtype), wout[:].T,
                   preferred_element_type=jnp.float32)
    dattb = datt.astype(dtype)
    att_subs = []
    dqkv_subs = []
    for s0 in range(0, rows, sub):
        att_parts = []
        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(heads):
            q = qkv[s0:s0 + sub, h * dh:(h + 1) * dh]
            k = qkv[s0:s0 + sub, d + h * dh:d + (h + 1) * dh]
            v = qkv[s0:s0 + sub, 2 * d + h * dh:2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = jax.nn.softmax(jnp.where(mask, s, _NEG), axis=-1)
            pb = p.astype(dtype)
            att_parts.append(jax.lax.dot_general(
                pb, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype))
            do = dattb[s0:s0 + sub, h * dh:(h + 1) * dh]
            dv = jax.lax.dot_general(
                pb, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsb = (ds * scale).astype(dtype)
            dq_parts.append(jax.lax.dot_general(
                dsb, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            dk_parts.append(jax.lax.dot_general(
                dsb, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            dv_parts.append(dv)
        att_subs.append(jnp.concatenate(att_parts, axis=-1))
        dqkv_subs.append(jnp.concatenate(
            [jnp.concatenate(dq_parts, axis=-1),
             jnp.concatenate(dk_parts, axis=-1),
             jnp.concatenate(dv_parts, axis=-1)], axis=-1))
    att = att_subs[0] if len(att_subs) == 1 else jnp.concatenate(att_subs, axis=0)
    dqkv = (dqkv_subs[0] if len(dqkv_subs) == 1
            else jnp.concatenate(dqkv_subs, axis=0))

    dh1 = jnp.dot(dqkv.astype(dtype), wqkv[:].T,
                  preferred_element_type=jnp.float32)
    dx = dx1 + _ln_bwd(dh1, c1, inv1, ln1sv)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    dqkvb = dqkv.astype(dtype)
    dwqkv = jax.lax.dot_general(  # h1^T dqkv
        h1, dqkvb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwout = jax.lax.dot_general(  # att^T dx1
        att, dx1.astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xhat1 = c1 * inv1
    vd = jnp.stack([
        (dh1 * xhat1).sum(0),  # d ln1_scale
        dh1.sum(0),            # d ln1_bias
    ])

    _accumulate(scratch or (dwqkv_ref, dwout_ref, vd_ref),
                (dwqkv, dwout, vd),
                (dwqkv_ref, dwout_ref, vd_ref) if scratch else None)


def _bwd_split(heads, t_pad, t_valid, attn_sub, res, dy):
    """Two-pass backward over the stashed (x, qkv, x1) — see FUSED_SPLIT."""
    x, params, qkv_s, x1_s = res
    rows_total, d = x.shape
    f = params.w1.shape[1]
    dtype = x.dtype

    def _scratch(shapes):
        if not FUSED_DW_SCRATCH:
            return []
        return [pltpu.VMEM(s, jnp.float32) for s in shapes]

    blk_a = FUSED_FFN_BWD_BLOCK * t_pad
    while rows_total % blk_a:
        blk_a //= 2
    dx1, d_w1, d_w2, vda, vfa = pl.pallas_call(
        _ffn_bwd_kernel,
        scratch_shapes=_scratch([(d, f), (f, d), (4, d), (1, f)]),
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, d), jnp.float32),  # dx1
            jax.ShapeDtypeStruct((d, f), jnp.float32),           # dW1
            jax.ShapeDtypeStruct((f, d), jnp.float32),           # dW2
            jax.ShapeDtypeStruct((4, d), jnp.float32),           # vector grads
            jax.ShapeDtypeStruct((1, f), jnp.float32),           # d b1
        ],
        grid=(rows_total // blk_a,),
        in_specs=[
            _row_spec(blk_a, d),                       # x1 (stashed)
            _full_spec(*params.ln2_scale.shape), _full_spec(*params.ln2_bias.shape),
            _full_spec(*params.w1.shape), _full_spec(*params.b1.shape),
            _full_spec(*params.w2.shape),
            _row_spec(blk_a, d),                       # dy
        ],
        out_specs=[
            _row_spec(blk_a, d),
            _full_spec(d, f), _full_spec(f, d),
            _full_spec(4, d), _full_spec(1, f),
        ],
        interpret=INTERPRET,
    )(x1_s, params.ln2_scale, params.ln2_bias, params.w1, params.b1,
      params.w2, dy)

    blk_b = FUSED_ATT_BWD_BLOCK * t_pad
    while rows_total % blk_b:
        blk_b //= 2
    dx, d_wqkv, d_wout, vdb = pl.pallas_call(
        functools.partial(_att_bwd_kernel, heads=heads, t_pad=t_pad,
                          t_valid=t_valid,
                          sub_rows=_sub_rows(blk_b, t_pad, attn_sub)),
        scratch_shapes=_scratch([(d, 3 * d), (d, d), (2, d)]),
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, d), dtype),        # dx
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),       # dWqkv
            jax.ShapeDtypeStruct((d, d), jnp.float32),           # dWout
            jax.ShapeDtypeStruct((2, d), jnp.float32),           # vector grads
        ],
        grid=(rows_total // blk_b,),
        in_specs=[
            _row_spec(blk_b, d),                       # x
            _full_spec(*params.ln1_scale.shape), _full_spec(*params.ln1_bias.shape),
            _full_spec(*params.w_qkv.shape), _full_spec(*params.w_out.shape),
            _row_spec(blk_b, 3 * d),                   # qkv (stashed)
            _row_spec(blk_b, d),                       # dx1
        ],
        out_specs=[
            _row_spec(blk_b, d),
            _full_spec(d, 3 * d), _full_spec(d, d),
            _full_spec(2, d),
        ],
        interpret=INTERPRET,
    )(x, params.ln1_scale, params.ln1_bias, params.w_qkv, params.w_out,
      qkv_s, dx1)

    dparams = EncoderLayerParams(
        ln1_scale=vdb[0].astype(params.ln1_scale.dtype),
        ln1_bias=vdb[1].astype(params.ln1_bias.dtype),
        w_qkv=d_wqkv.astype(params.w_qkv.dtype),
        w_out=d_wout.astype(params.w_out.dtype),
        b_out=vda[2].astype(params.b_out.dtype),
        ln2_scale=vda[0].astype(params.ln2_scale.dtype),
        ln2_bias=vda[1].astype(params.ln2_bias.dtype),
        w1=d_w1.astype(params.w1.dtype),
        b1=vfa[0].astype(params.b1.dtype),
        w2=d_w2.astype(params.w2.dtype),
        b2=vda[3].astype(params.b2.dtype),
    )
    return dx, dparams


def _bwd(heads, t_pad, t_valid, block, bwd_block, attn_sub, stash, res, dy):
    if res[2] is not None and FUSED_SPLIT:
        return _bwd_split(heads, t_pad, t_valid, attn_sub, res, dy)
    bwd_block = FUSED_BWD_BLOCK if bwd_block is None else bwd_block
    x, params, qkv_s, x1_s = res
    rows_total, d = x.shape
    f = params.w1.shape[1]
    # backward emits ~6 output tiles per input tile — a smaller block keeps
    # the pipelined VMEM footprint under budget
    blk = bwd_block * t_pad
    while rows_total % blk:
        blk //= 2
    dtype = x.dtype
    stash_args = () if qkv_s is None else (qkv_s, x1_s)
    stash_specs = ([] if qkv_s is None
                   else [_row_spec(blk, 3 * d), _row_spec(blk, d)])
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, t_pad=t_pad,
                          t_valid=t_valid,
                          sub_rows=_sub_rows(blk, t_pad, attn_sub)),
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, d), dtype),       # dx
            jax.ShapeDtypeStruct((rows_total, d), dtype),       # h2
            jax.ShapeDtypeStruct((rows_total, f), dtype),       # df1
            jax.ShapeDtypeStruct((rows_total, f), dtype),       # g
            jax.ShapeDtypeStruct((6, d), jnp.float32),          # vector grads
            jax.ShapeDtypeStruct((1, f), jnp.float32),          # d b1
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),      # dWqkv
            jax.ShapeDtypeStruct((d, d), jnp.float32),          # dWout
        ],
        grid=(rows_total // blk,),
        in_specs=[_row_spec(blk, d)] + _param_specs(params)
        + [_row_spec(blk, d)] + stash_specs,
        out_specs=[
            _row_spec(blk, d), _row_spec(blk, d), _row_spec(blk, f),
            _row_spec(blk, f),
            _full_spec(6, d), _full_spec(1, f),
            _full_spec(d, 3 * d), _full_spec(d, d),
        ],
        interpret=INTERPRET,
    )(x, *params, dy, *stash_args)
    dx, h2, df1, g, vd, vf, d_wqkv, d_wout = outs

    # ---- the remaining weight grads: roofline XLA matmuls
    f32 = jnp.float32
    d_w1 = jnp.dot(h2.T, df1, preferred_element_type=f32)
    d_w2 = jnp.dot(g.T, dy.astype(dtype), preferred_element_type=f32)

    dparams = EncoderLayerParams(
        ln1_scale=vd[0].astype(params.ln1_scale.dtype),
        ln1_bias=vd[1].astype(params.ln1_bias.dtype),
        w_qkv=d_wqkv.astype(params.w_qkv.dtype),
        w_out=d_wout.astype(params.w_out.dtype),
        b_out=vd[4].astype(params.b_out.dtype),
        ln2_scale=vd[2].astype(params.ln2_scale.dtype),
        ln2_bias=vd[3].astype(params.ln2_bias.dtype),
        w1=d_w1.astype(params.w1.dtype),
        b1=vf[0].astype(params.b1.dtype),
        w2=d_w2.astype(params.w2.dtype),
        b2=vd[5].astype(params.b2.dtype),
    )
    return dx, dparams


fused_encoder_layer.defvjp(_fwd, _bwd)


def reference_encoder_layer(x, params: EncoderLayerParams, heads, t_pad,
                            t_valid):
    """Plain-XLA layer with identical math, for tests."""
    dtype = x.dtype
    h1, _, _ = _ln(x, params.ln1_scale, params.ln1_bias)
    qkv = (h1.astype(dtype) @ params.w_qkv).astype(dtype)
    att = _attention(qkv, heads, t_pad, t_valid, dtype)
    a = (att @ params.w_out + params.b_out).astype(dtype)
    x1 = x + a
    h2, _, _ = _ln(x1, params.ln2_scale, params.ln2_bias)
    f1 = h2.astype(dtype) @ params.w1 + params.b1
    g = jax.nn.gelu(f1.astype(jnp.float32), approximate=False).astype(dtype)
    return x1 + (g @ params.w2 + params.b2).astype(dtype)


def encoder_flops(pairs: int, t_pad: int, d: int, layers: int,
                  with_backward: bool = False) -> float:
    """Analytic FLOP count of the fused encoder stack.

    The XLA cost model reports 0 FLOPs for Pallas custom calls, so any
    MFU computed from ``compiled.cost_analysis()`` silently omits the
    encoder — the single largest FLOP consumer of the train step
    (~16 TF of a ~29 TF step at flagship shapes).  Per token per layer:
    qkv (2*3d^2) + out proj (2d^2) + attention scores/values (2*2*t*d)
    + MLP (2*2*d*f, f=2d).  Backward costs 2x forward (dX + dW); the
    stashed qkv/x1 kernel recomputes only LN/softmax/gelu (vector ops,
    not counted as MXU FLOPs).
    """
    f = 2 * d
    per_tok_layer = 2 * d * (3 * d) + 2 * d * d + 2 * 2 * t_pad * d \
        + 2 * 2 * d * f
    fwd = pairs * t_pad * layers * per_tok_layer
    return float(fwd * (3 if with_backward else 1))
