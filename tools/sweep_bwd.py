"""Locate backward-pass time in the flagship train step.

Times, as separate jitted programs at flagship shapes:
  * relate fwd          (depth bb + pooling + token build + encoder fwd + heads)
  * relate fwd+bwd      (grad wrt trainable params)
  * depth path fwd / fwd+bwd   (depth backbone + stride-16 ROIAlign)
  * encoder-only fwd / fwd+bwd (ops/fused_encoder at step shapes)

The differences isolate where the ~175 ms of backward goes (ROI scatter
transposes vs encoder kernel vs depth conv bwd).

Usage: python tools/sweep_bwd.py [--batch 8] [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def fence(tree):
    leaves = jax.tree.leaves(tree)
    return float(jnp.asarray(leaves[0]).reshape(-1)[0])


def timed(fn, *args, steps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--pairs", type=int, default=1024)
    ap.add_argument("--boxes", type=int, default=80)
    ap.add_argument("--hw", default="800x1344")
    args = ap.parse_args()
    hw = tuple(int(x) for x in args.hw.split("x"))

    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.models.sgg import SGGModel

    model = SGGModel(dtype=jnp.bfloat16, veto_remat=False,
                     veto_encoder_impl="fused", fold_bn=True)
    ds = SyntheticSGGDataset(
        num_images=args.batch, image_size=hw, max_objects=args.boxes - 1,
        min_objects=8, max_relations=20, seed=0,
    )
    batch, _ = next(ds.batches(batch_size=args.batch, max_boxes=args.boxes))
    batch = jax.tree.map(jnp.asarray, batch)

    rng = jax.random.PRNGKey(0)
    small = jax.tree.map(lambda x: x[:1], batch)
    pi8 = jnp.zeros((1, 8, 2), jnp.int32)
    variables = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi8, jnp.ones((1, 8), bool),
        train=False,
    )
    params = variables["params"]
    b = args.batch
    pair_idx = jnp.zeros((b, args.pairs, 2), jnp.int32)
    pair_mask = jnp.ones((b, args.pairs), bool)

    backbone = jax.jit(lambda v, x: model.apply(
        {"params": v, "batch_stats": variables.get("batch_stats", {})},
        x, method="extract_features"))
    feats = jax.tree.map(lambda x: x, backbone(params, batch.images))

    def relate_loss(p, f, d):
        out = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            f, d, batch.boxes, batch.box_mask, batch.labels,
            batch.obj_logits, pair_idx, pair_mask, train=False,
            method="relate",
        )
        return jnp.sum(out.rel_logits.astype(jnp.float32))

    relate_fwd = jax.jit(relate_loss)
    relate_fb = jax.jit(jax.grad(relate_loss))

    # depth path only: depth backbone + stride-16 ROIAlign
    from veto_tpu.ops.roi_align import roi_align

    def depth_loss(p, d):
        df = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            d, train=False,
            method=lambda m, dd, train: m.depth_backbone(dd, train=train))
        droi = jax.vmap(
            lambda f, rois: roi_align(
                f, rois, model.depth_scale, model.pooler_resolution,
                model.pooler_sampling_ratio,
            )
        )(df, batch.boxes)
        return jnp.sum(droi.astype(jnp.float32))

    depth_fwd = jax.jit(depth_loss)
    depth_fb = jax.jit(jax.grad(depth_loss))

    # encoder only at step shapes
    import veto_tpu.ops.fused_encoder as fe

    d_model = model.veto_dim if hasattr(model, "veto_dim") else 576
    t_pad, t_valid, heads = 20, 19, 6
    rows = b * args.pairs * t_pad
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (rows, d_model), jnp.bfloat16)
    lp = fe.EncoderLayerParams(
        ln1_scale=jnp.ones((d_model,), jnp.float32),
        ln1_bias=jnp.zeros((d_model,), jnp.float32),
        w_qkv=jax.random.normal(key, (d_model, 3 * d_model), jnp.bfloat16) * 0.02,
        w_out=jax.random.normal(key, (d_model, d_model), jnp.bfloat16) * 0.02,
        b_out=jnp.zeros((d_model,), jnp.float32),
        ln2_scale=jnp.ones((d_model,), jnp.float32),
        ln2_bias=jnp.zeros((d_model,), jnp.float32),
        w1=jax.random.normal(key, (d_model, 2 * d_model), jnp.bfloat16) * 0.02,
        b1=jnp.zeros((2 * d_model,), jnp.float32),
        w2=jax.random.normal(key, (2 * d_model, d_model), jnp.bfloat16) * 0.02,
        b2=jnp.zeros((d_model,), jnp.float32),
    )

    def enc_loss(px, p):
        y = px
        for _ in range(6):
            y = fe.fused_encoder_layer(y, p, heads, t_pad, t_valid)
        return jnp.sum(y.astype(jnp.float32))

    enc_fwd = jax.jit(enc_loss)
    enc_fb = jax.jit(jax.grad(enc_loss, argnums=(0, 1)))

    out = {}
    out["relate_fwd_ms"] = timed(relate_fwd, params, feats, batch.depth,
                                 steps=args.steps)
    out["relate_fwd_bwd_ms"] = timed(relate_fb, params, feats, batch.depth,
                                     steps=args.steps)
    out["depth_fwd_ms"] = timed(depth_fwd, params, batch.depth,
                                steps=args.steps)
    out["depth_fwd_bwd_ms"] = timed(depth_fb, params, batch.depth,
                                    steps=args.steps)
    out["encoder6_fwd_ms"] = timed(enc_fwd, x, lp, steps=args.steps)
    out["encoder6_fwd_bwd_ms"] = timed(enc_fb, x, lp, steps=args.steps)
    out["nonencoder_bwd_est_ms"] = round(
        (out["relate_fwd_bwd_ms"] - out["relate_fwd_ms"])
        - (out["encoder6_fwd_bwd_ms"] - out["encoder6_fwd_ms"]), 2)
    print(json.dumps({k: round(v, 2) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
