"""Sweep the fused-encoder tiling (block, attn_sub, bwd_block) on-chip.

Times the 6-layer encoder stack fwd+bwd at flagship shapes
(8 images x 1024 pairs, t=19 -> t_pad=20, d=576, f=1152, h=6) for each
tiling candidate.  Used to pick the FUSED_* module defaults in
ops/fused_encoder.py; results recorded in BASELINE.md.

Usage: python tools/sweep_fused_encoder.py [--pairs 8192] [--steps 20]
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import veto_tpu.ops.fused_encoder as fe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--t", type=int, default=19)
    ap.add_argument("--d", type=int, default=576)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--split", action="store_true",
                    help="sweep the two-pass split backward's block sizes")
    ap.add_argument("--dw-scratch", action="store_true",
                    help="with --split: accumulate dW in explicit VMEM "
                         "scratch, single final flush (VERDICT r4 #7)")
    args = ap.parse_args()
    fe.FUSED_DW_SCRATCH = args.dw_scratch

    t_pad = -(-args.t // 4) * 4
    d, f = args.d, 2 * args.d
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.randn(args.pairs * t_pad, d).astype(np.float32) * 0.1,
        dtype=jnp.bfloat16)
    params = [fe.EncoderLayerParams(
        ln1_scale=jnp.ones((d,)), ln1_bias=jnp.zeros((d,)),
        w_qkv=jnp.asarray(rng.randn(d, 3 * d).astype(np.float32) * 0.02),
        w_out=jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.02),
        b_out=jnp.zeros((d,)),
        ln2_scale=jnp.ones((d,)), ln2_bias=jnp.zeros((d,)),
        w1=jnp.asarray(rng.randn(d, f).astype(np.float32) * 0.02),
        b1=jnp.zeros((f,)),
        w2=jnp.asarray(rng.randn(f, d).astype(np.float32) * 0.02),
        b2=jnp.zeros((d,)),
    ) for _ in range(args.layers)]

    def stack(x, ps, block, bwd_block, attn_sub, stash):
        for p in ps:
            p16 = type(p)(*[w.astype(jnp.bfloat16) if w.ndim == 2 else w
                            for w in p])
            x = fe.fused_encoder_layer(x, p16, args.heads, t_pad, args.t,
                                       block, bwd_block, attn_sub, stash)
        return x

    def loss(x, ps, block, bwd_block, attn_sub, stash):
        return stack(x, ps, block, bwd_block, attn_sub, stash).astype(
            jnp.float32).sum()

    if args.split:
        # sweep the TWO-PASS split backward's per-pass block sizes
        # (fe.FUSED_SPLIT path; forward block fixed at the swept optimum 8)
        fe.FUSED_SPLIT = True
        results = []
        for ffn_blk, att_blk in itertools.product([8, 16, 32],
                                                  [8, 16, 32]):
            fe.FUSED_FFN_BWD_BLOCK = ffn_blk
            fe.FUSED_ATT_BWD_BLOCK = att_blk
            try:
                fn = jax.jit(jax.grad(
                    lambda x, ps: loss(x, ps, 8, None, None, True),
                    argnums=(0, 1)))
                g, gp = fn(x, params)
                _ = float(g.astype(jnp.float32)[0, 0])
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    g, gp = fn(x, params)
                _ = (float(g.astype(jnp.float32)[0, 0])
                     + float(gp[0].w_qkv[0, 0]))
                ms = (time.perf_counter() - t0) / args.steps * 1e3
                results.append((ms, ffn_blk, att_blk))
                print(f"ffn_blk={ffn_blk:3d} att_blk={att_blk:3d}  "
                      f"{ms:8.2f} ms", flush=True)
            except Exception as e:
                print(f"ffn_blk={ffn_blk:3d} att_blk={att_blk:3d}  FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        if results:
            results.sort()
            ms, ffn_blk, att_blk = results[0]
            print(f"\nBEST: ffn_blk={ffn_blk} att_blk={att_blk}  {ms:.2f} ms")
        return

    fe.FUSED_SPLIT = False  # sweep the monolithic backward
    grid = list(itertools.product([8, 16, 32], [None],
                                  [2, 4, 8, 16], [False, True]))
    results = []
    for block, attn_sub, bwd_block, stash in grid:
        sub_eff = block if attn_sub is None else min(attn_sub, block)
        if (block % sub_eff) or (args.fwd_only and bwd_block != 4):
            continue
        # the undifferentiated primal forces stash=False (eval never pays
        # the stash writes), so fwd-only stash rows would be duplicates
        if args.fwd_only and stash:
            continue
        try:
            if args.fwd_only:
                fn = jax.jit(lambda x: stack(x, params, block, None,
                                             attn_sub, stash))
                out = fn(x)
                _ = float(out.astype(jnp.float32).sum())
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    out = fn(x)
                _ = float(out.astype(jnp.float32).sum())
            else:
                # grad wrt x AND params — the train step differentiates the
                # relation head's weights, so the dW matmuls must be timed
                fn = jax.jit(jax.grad(
                    lambda x, ps: loss(x, ps, block, bwd_block, attn_sub,
                                       stash),
                    argnums=(0, 1)))
                g, gp = fn(x, params)
                _ = float(g.astype(jnp.float32)[0, 0])
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    g, gp = fn(x, params)
                _ = (float(g.astype(jnp.float32)[0, 0])
                     + float(gp[0].w_qkv[0, 0]))
            ms = (time.perf_counter() - t0) / args.steps * 1e3
            results.append((ms, block, attn_sub, bwd_block, stash))
            print(f"block={block:3d} attn_sub={str(attn_sub):>4} "
                  f"bwd_block={bwd_block:3d} stash={int(stash)}  "
                  f"{ms:8.2f} ms", flush=True)
        except Exception as e:  # VMEM overflow etc.
            print(f"block={block:3d} attn_sub={str(attn_sub):>4} "
                  f"bwd_block={bwd_block:3d} stash={int(stash)}  FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    if results:
        results.sort()
        ms, block, attn_sub, bwd_block, stash = results[0]
        print(f"\nBEST: stash={stash} block={block} attn_sub={attn_sub} "
              f"bwd_block={bwd_block}  {ms:.2f} ms")


if __name__ == "__main__":
    main()
