"""Detector pretraining entry point (reference tools/detector_pretrain_net.py).

Trains the Faster R-CNN detector (backbone + RPN + box head) from scratch
with SGD + WarmupMultiStepLR; evaluation reports COCO-protocol bbox mAP.
Defaults run hermetically on the synthetic corpus; point
``data.data_dir`` at Visual Genome for the real thing.

Usage:
  python tools/detector_pretrain_net.py \
      solver.optimizer=sgd solver.schedule=WarmupMultiStepLR \
      solver.max_iter=50000 data.data_dir=/path/to/vg data.use_depth=false
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run_detection_eval(cfg, model, state, gen, logger):
    from veto_tpu.evaluation.coco_map import CocoMapEvaluator

    if cfg.test.bbox_aug_enabled:
        # detection TTA: merge flip/scale candidates before the NMS filter
        # (reference TEST.BBOX_AUG, engine/bbox_aug.py)
        from veto_tpu.engine.bbox_aug import detect_tta

        @jax.jit
        def detect(state, images, sizes):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            _, dets, _ = detect_tta(
                model, variables, images, sizes,
                hflip=cfg.test.bbox_aug_h_flip,
                scales=cfg.test.bbox_aug_scales,
            )
            return dets
    else:
        @jax.jit
        def detect(state, images, sizes):
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            return model.apply(variables, images, sizes, method="detect").detections

    ev = CocoMapEvaluator(num_classes=cfg.model.num_obj_classes)
    for batch, recs in gen(max_iter=0):
        batch = jax.tree.map(jnp.asarray, batch)
        dets = jax.device_get(
            detect(state, batch.images, batch.sizes.astype(jnp.float32))
        )
        sizes = np.asarray(batch.sizes)
        for i, rec in enumerate(recs):
            m = dets.mask[i]
            if m.sum() == 0:
                continue
            boxes = dets.boxes[i][m]
            ow, oh = rec.get("orig_size", (None, None))
            if ow is not None:
                sx, sy = ow / sizes[i][0], oh / sizes[i][1]
                boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
            ev.add_image(
                rec["boxes"], rec["labels"], boxes,
                dets.labels[i][m], dets.scores[i][m],
            )
    agg = ev.aggregate()
    logger.info(
        f"bbox eval: mAP {agg['mAP']:.4f}  AP50 {agg['AP50']:.4f}  "
        f"AP75 {agg['AP75']:.4f}"
    )
    return agg


def train(cfg, logger):
    from relation_train_net import batches_for, build_dataset, build_model

    from veto_tpu.engine.pretrain import make_detector_train_step
    from veto_tpu.engine.train import (
        TrainState,
        batch_sharding,
        make_mesh,
        shard_train_step,
    )
    from veto_tpu.solver.optim import make_optimizer, multistep_scale
    from veto_tpu.utils.checkpoint import CheckpointManager
    from veto_tpu.utils.logger import JSONLWriter, MetricLogger

    model = build_model(cfg)
    train_gen = batches_for(cfg, build_dataset(cfg, "train"), "train")
    val_gen = batches_for(cfg, build_dataset(cfg, "val"), "val")

    rng = jax.random.PRNGKey(cfg.solver.seed)
    first_batch, _ = next(train_gen(max_iter=1))
    small = jax.tree.map(lambda x: jnp.asarray(x[:1]), first_batch)
    pi = jnp.zeros((1, 8, 2), jnp.int32)
    variables = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi, jnp.ones((1, 8), bool),
        method="init_all",
    )
    # nothing frozen: the whole detector trains
    tx = make_optimizer(cfg.solver, variables["params"], frozen_prefixes=())
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), rng=rng,
    )
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    logger.info(f"detector init: {n_params / 1e6:.2f}M params")

    import math

    ndev = len(jax.devices())
    mesh = make_mesh(data=math.gcd(ndev, cfg.solver.ims_per_batch), pair=1)
    step_fn = shard_train_step(
        make_detector_train_step(
            model, tx,
            rpn_batch_size=cfg.model.rpn_batch_size_per_image,
            rpn_positive_fraction=cfg.model.rpn_positive_fraction,
            rpn_fg_iou=cfg.model.rpn_fg_iou_threshold,
            rpn_bg_iou=cfg.model.rpn_bg_iou_threshold,
            box_batch_size=cfg.model.box_batch_size_per_image,
            box_positive_fraction=cfg.model.box_positive_fraction,
            box_fg_iou=cfg.model.box_fg_iou_threshold,
            box_bg_iou=cfg.model.box_bg_iou_threshold,
            rpn_pre_nms_top_n=cfg.model.rpn_pre_nms_top_n_train,
            rpn_post_nms_top_n=cfg.model.rpn_post_nms_top_n_train,
            rpn_fpn_post_nms_top_n=cfg.model.rpn_post_nms_top_n_train,
            rpn_nms_thresh=cfg.model.rpn_nms_thresh,
            mesh=mesh,
            mask_on=cfg.model.mask_on,
            keypoint_on=cfg.model.keypoint_on,
            head_rois_per_image=cfg.model.head_rois_per_image,
        ),
        mesh,
    )

    ckpt = CheckpointManager(os.path.join(cfg.output_dir, "ckpt"))
    state, _ = ckpt.restore(state)
    start_iter = int(state.step)
    scale_fn = multistep_scale(cfg.solver)
    meters = MetricLogger()
    writer = JSONLWriter(cfg.output_dir,
                         tensorboard=cfg.tensorboard_on)

    from veto_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard().install()

    t_prev = time.time()
    for it, (batch, _) in enumerate(
        train_gen(cfg.solver.max_iter, start_iter), start=start_iter
    ):
        batch = jax.device_put(jax.tree.map(jnp.asarray, batch), batch_sharding(mesh))
        state, metrics = step_fn(state, batch, jnp.asarray(scale_fn(it), jnp.float32))
        now = time.time()
        meters.update(time=now - t_prev, **jax.device_get(metrics))
        t_prev = now
        if it % 30 == 0:
            writer.write(it, jax.device_get(metrics))
        if it % 100 == 0:
            logger.info(
                f"iter {it}/{cfg.solver.max_iter}  {meters}  "
                f"eta {meters.eta_string(it, cfg.solver.max_iter)}"
            )
        if guard.requested:
            ckpt.save(it + 1, state)
            logger.info(f"preemption signal: checkpointed at iter {it + 1}")
            break
        if (it + 1) % cfg.solver.checkpoint_period == 0:
            ckpt.save(it + 1, state)
        if (it + 1) % cfg.solver.val_period == 0:
            run_detection_eval(cfg, model, state, val_gen, logger)

    ckpt.save(int(state.step), state)
    logger.info("detector pretraining done")
    return state


def main():
    parser = argparse.ArgumentParser(description="VETO-TPU detector pretraining")
    parser.add_argument("--config", default=None)
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (raise at the first NaN-producing op)")
    parser.add_argument("opts", nargs="*", default=[])
    args = parser.parse_args()
    if args.debug_nans:
        # re-run any op that produced a NaN eagerly and raise at the exact
        # primitive (SURVEY §5 debug toggle; jax.config jax_debug_nans)
        jax.config.update("jax_debug_nans", True)

    from veto_tpu.config import load_config
    from veto_tpu.utils.logger import setup_logger

    cfg = load_config(args.config, args.opts)
    # detector pretraining defaults (reference detector_pretrain_net.py):
    # SGD + multistep schedule unless explicitly overridden
    if not any(o.startswith("solver.optimizer") for o in args.opts):
        cfg = cfg.override("solver.optimizer", "sgd")
    if not any(o.startswith("solver.schedule") for o in args.opts):
        cfg = cfg.override("solver.schedule", "WarmupMultiStepLR")
    os.makedirs(cfg.output_dir, exist_ok=True)
    cfg.dump(os.path.join(cfg.output_dir, "config.json"))
    logger = setup_logger("veto_tpu.detector", cfg.output_dir,
                          rank=jax.process_index())
    logger.info(f"devices: {jax.devices()}")
    train(cfg, logger)


if __name__ == "__main__":
    main()
