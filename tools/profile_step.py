"""Profile the flagship train step: trace dump + component breakdown.

Replaces the reference's ad-hoc Timer pairs / CUDA max-mem logging
(SURVEY.md §5 tracing) with two reproducible artifacts:

  * a jax-profiler trace (``--trace DIR``) viewable in TensorBoard /
    Perfetto — this is how the BASELINE.md step breakdowns are produced;
  * a fenced wall-clock breakdown of the step's stages (backbone, depth
    backbone, ROI pooling, pair transformer, full fwd+bwd), each timed as
    its own jitted program over the same shapes.

Usage:
  python tools/profile_step.py [--trace /tmp/trace] [--batch 8]
      [--steps 10] [--pairs 1024] [--hw 800x1344]
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

# Persistent compilation cache (same dir as bench.py) — tunneled remote
# compiles can take minutes; warm reruns of the profiler are compile-free.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/veto_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover - older jax
    pass


def fence(tree):
    """Host transfer of one scalar leaf — reliable sync on tunneled TPUs."""
    leaves = jax.tree.leaves(tree)
    x = leaves[0]
    return float(jnp.asarray(x).reshape(-1)[0])


def timed(fn, *args, steps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / steps


def profile_sgdet(args, hw):
    """Stage breakdown of the sgdet cascade: backbone, RPN propose,
    1000-proposal box head (pool + MLP + postprocess NMS), relation fwd,
    and the full train/eval steps."""
    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import (
        create_train_state, make_sgdet_eval_step, make_sgdet_train_step,
    )
    from veto_tpu.models.sgg import SGGModel
    from veto_tpu.solver.optim import make_optimizer

    model = SGGModel(dtype=jnp.bfloat16, mode="sgdet", veto_remat=False,
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
        method="init_all",
    )
    tx = make_optimizer(
        SolverConfig(), variables["params"],
        frozen_prefixes=("backbone", "rpn", "box_extractor", "box_predictor"),
    )
    state = create_train_state(model, tx, rng, small, variables=variables)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    backbone = jax.jit(lambda v, x: model.apply(v, x, method="extract_features"))
    feats = backbone(variables, batch.images)
    detect = jax.jit(lambda v, x, sz: model.apply(v, x, sz, method="detect"))
    npro = model.rpn_fpn_post_nms_top_n
    rois = jnp.tile(jnp.asarray([[0.0, 0.0, 64.0, 48.0]], jnp.float32),
                    (args.batch, npro, 1))
    pool1000 = jax.jit(
        lambda v, f, bx: model.apply(
            v, f, bx, model.box_pooler_resolution,
            method=lambda m, ff, bb, r: m._pool_boxes(ff, bb, r)))
    boxlogits = jax.jit(
        lambda v, f, bx: model.apply(
            v, f, bx, method=lambda m, ff, bb: m._box_logits(ff, bb)))

    out = {"mode": "sgdet", "proposals": int(npro)}
    out["backbone_fwd_ms"] = timed(backbone, variables, batch.images,
                                   steps=args.steps) * 1e3
    out["detect_cascade_ms"] = timed(detect, variables, batch.images,
                                     batch.sizes.astype(jnp.float32),
                                     steps=args.steps) * 1e3
    out["pool_1000_ms"] = timed(pool1000, variables, feats, rois,
                                steps=args.steps) * 1e3
    out["box_head_1000_ms"] = timed(boxlogits, variables, feats, rois,
                                    steps=args.steps) * 1e3

    # finer cascade fences: RPN head convs + proposal selection (top-k →
    # decode → per-level NMS → cross-level top-1000), and the 151-class box
    # postprocess (decode + per-class NMS + NMS_FILTER_DUPLICATES + top-80)
    import numpy as _np

    from veto_tpu.models.detector.anchors import fpn_anchors
    from veto_tpu.models.detector.box_head import box_postprocess
    from veto_tpu.models.detector.rpn import (
        flatten_level, rpn_select_proposals,
    )

    h, w = batch.images.shape[1:3]
    anchor_list = fpn_anchors((h, w), model.anchor_sizes,
                              model.anchor_strides, model.aspect_ratios)
    anchors = tuple(jnp.asarray(a) for a, _ in anchor_list)

    def rpn_heads_only(v, f):
        obj, reg = model.apply(v, f, method=lambda m, ff: m.rpn(ff))
        return [o.astype(jnp.float32) for o in obj]

    rpn_maps = jax.jit(lambda v, f: model.apply(
        v, f, method=lambda m, ff: m.rpn(ff)))
    obj_maps, reg_maps = rpn_maps(variables, feats)
    obj_maps = jax.tree.map(lambda x: x.astype(jnp.float32), obj_maps)
    reg_maps = jax.tree.map(lambda x: x.astype(jnp.float32), reg_maps)

    def propose(obj_maps, reg_maps, sizes):
        def one(obj_b, reg_b, size):
            flat = [flatten_level(o, r) for o, r in zip(obj_b, reg_b)]
            return rpn_select_proposals(
                [f[0] for f in flat], [f[1] for f in flat], anchors, size,
                model.rpn_pre_nms_top_n, model.rpn_post_nms_top_n,
                model.rpn_nms_thresh, model.rpn_fpn_post_nms_top_n,
                model.rpn_min_size,
            )
        return jax.vmap(one)(obj_maps, reg_maps, sizes)

    jpropose = jax.jit(propose)
    sizes_f = batch.sizes.astype(jnp.float32)
    proposals = jpropose(obj_maps, reg_maps, sizes_f)
    out["rpn_heads_ms"] = timed(jax.jit(rpn_heads_only), variables, feats,
                                steps=args.steps) * 1e3
    out["rpn_propose_ms"] = timed(jpropose, obj_maps, reg_maps, sizes_f,
                                  steps=args.steps) * 1e3

    logits, deltas = jax.jit(lambda v, f, bx: model.apply(
        v, f, bx, method=lambda m, ff, bb: m._box_logits(ff, bb)))(
        variables, feats, proposals.boxes)

    def postproc(lg, dl, bx, mk, sz):
        return jax.vmap(
            lambda a, b, c, d, e: box_postprocess(
                a, b, c, d, e,
                score_thresh=model.box_score_thresh,
                nms_thresh=model.box_nms_thresh,
                post_nms_per_cls_topn=model.box_post_nms_per_cls_topn,
                nms_filter_duplicates=model.nms_filter_duplicates,
                detections_per_img=model.detections_per_img,
            )
        )(lg, dl, bx, mk, sz)

    out["box_postprocess_ms"] = timed(
        jax.jit(postproc), logits, deltas, proposals.boxes, proposals.mask,
        sizes_f, steps=args.steps) * 1e3

    eval_step = jax.jit(make_sgdet_eval_step(model, max_pairs=2048))
    for _ in range(2):
        sp = eval_step(state, batch)
    fence(sp.obj_scores)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        sp = eval_step(state, batch)
    fence(sp.obj_scores)
    out["sgdet_eval_step_ms"] = (time.perf_counter() - t0) / args.steps * 1e3

    train_step = jax.jit(
        make_sgdet_train_step(model, tx, None,
                              batch_size_per_image=args.pairs),
        donate_argnums=(0,),
    )
    scale = jnp.asarray(1.0, jnp.float32)
    for _ in range(2):
        state, metrics = train_step(state, batch, scale)
    fence(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = train_step(state, batch, scale)
    fence(metrics["loss"])
    out["sgdet_train_step_ms"] = (time.perf_counter() - t0) / args.steps * 1e3

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                state, metrics = train_step(state, batch, scale)
            fence(metrics["loss"])
        out["trace_dir"] = args.trace

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--pairs", type=int, default=1024)
    ap.add_argument("--hw", default="800x1344")
    ap.add_argument("--boxes", type=int, default=80)
    ap.add_argument("--mode", default="predcls", choices=["predcls", "sgdet"])
    args = ap.parse_args()
    hw = tuple(int(x) for x in args.hw.split("x"))
    if args.mode == "sgdet":
        return profile_sgdet(args, hw)

    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import create_train_state, make_train_step
    from veto_tpu.models.sgg import SGGModel
    from veto_tpu.solver.optim import make_optimizer

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
    params = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi8, jnp.ones((1, 8), bool),
        train=False,
    )["params"]
    tx = make_optimizer(SolverConfig(), params)
    state = create_train_state(model, tx, rng, small)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    b = args.batch
    pair_idx = jnp.zeros((b, args.pairs, 2), jnp.int32)
    pair_mask = jnp.ones((b, args.pairs), bool)

    # ---- component programs
    backbone = jax.jit(lambda v, x: model.apply(v, x, method="extract_features"))
    feats = backbone(variables, batch.images)

    depth_bb = jax.jit(
        lambda v, d: model.apply(v, d, train=False, method=lambda m, dd, train: m.depth_backbone(dd, train=train))
    )

    pool = jax.jit(
        lambda v, f, bx: model.apply(
            v, f, bx, model.pooler_resolution,
            method=lambda m, ff, bb, r: m._pool_boxes(ff, bb, r))
    )

    relate = jax.jit(
        lambda v, f, d: model.apply(
            v, f, d, batch.boxes, batch.box_mask, batch.labels,
            batch.obj_logits, pair_idx, pair_mask, train=False,
            method="relate",
        )
    )

    full = jax.jit(
        make_train_step(model, tx, None, batch_size_per_image=args.pairs),
        donate_argnums=(0,),
    )
    scale = jnp.asarray(1.0, jnp.float32)

    out = {}
    out["backbone_fwd_ms"] = timed(backbone, variables, batch.images,
                                   steps=args.steps) * 1e3
    out["depth_backbone_fwd_ms"] = timed(depth_bb, variables, batch.depth,
                                         steps=args.steps) * 1e3
    out["roi_pool_ms"] = timed(pool, variables, feats, batch.boxes,
                               steps=args.steps) * 1e3
    out["relation_fwd_ms"] = timed(relate, variables, feats, batch.depth,
                                   steps=args.steps) * 1e3

    def step_once(st):
        st, m = full(st, batch, scale)
        return st, m

    for _ in range(2):
        state, metrics = step_once(state)
    fence(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_once(state)
    fence(metrics["loss"])
    out["train_step_ms"] = (time.perf_counter() - t0) / args.steps * 1e3
    out["train_img_per_sec"] = b / (out["train_step_ms"] / 1e3)

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                state, metrics = step_once(state)
            fence(metrics["loss"])
        out["trace_dir"] = args.trace

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
