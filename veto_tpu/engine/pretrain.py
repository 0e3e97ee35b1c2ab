"""Detector pretraining step (tools/detector_pretrain_net.py path).

One jitted SPMD program per step: backbone+RPN forward (with gradients —
unlike relation training nothing is frozen), RPN anchor matching + balanced
sampling + losses, proposal selection, Fast R-CNN subsampling, box head
forward + losses, SGD update.  Reference: detector_pretrain_net.py:41-170 +
generalized_rcnn.py plain path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from veto_tpu.models.detector.anchors import fpn_anchors
from veto_tpu.models.detector.losses import (
    fastrcnn_losses,
    fastrcnn_sample,
    rpn_losses,
)
from veto_tpu.models.detector.rpn import flatten_level, rpn_select_proposals

from .batch import SGGBatch
from .train import TrainState


def make_detector_train_step(
    model,
    tx,
    rpn_batch_size: int = 256,
    rpn_positive_fraction: float = 0.5,
    rpn_fg_iou: float = 0.7,
    rpn_bg_iou: float = 0.3,
    box_batch_size: int = 512,
    box_positive_fraction: float = 0.25,
    box_fg_iou: float = 0.5,
    box_bg_iou: float = 0.3,
    rpn_pre_nms_top_n: int = 6000,
    rpn_post_nms_top_n: int = 1000,
    rpn_fpn_post_nms_top_n: int = 1000,
    rpn_nms_thresh: float = 0.7,
    mesh: Optional[Mesh] = None,
    mask_on: bool = False,
    keypoint_on: bool = False,
    head_rois_per_image: int = 64,
):
    def train_step(state: TrainState, batch: SGGBatch, lr_scale: jnp.ndarray):
        h, w = batch.images.shape[1:3]
        anchor_list = fpn_anchors(
            (h, w), model.anchor_sizes, model.anchor_strides, model.aspect_ratios
        )
        anchors = jnp.concatenate([jnp.asarray(a) for a, _ in anchor_list])
        visibility = jnp.concatenate([jnp.asarray(v) for _, v in anchor_list])
        per_level_anchors = tuple(jnp.asarray(a) for a, _ in anchor_list)

        step_rng = jax.random.fold_in(state.rng, state.step)
        b = batch.batch_size
        rpn_keys = jax.random.split(jax.random.fold_in(step_rng, 0), b)
        box_keys = jax.random.split(jax.random.fold_in(step_rng, 1), b)
        sizes = batch.sizes.astype(jnp.float32)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            feats, obj_maps, reg_maps = model.apply(
                variables, batch.images, method="detector_forward"
            )
            flat = [
                jax.vmap(flatten_level)(o.astype(jnp.float32), r.astype(jnp.float32))
                for o, r in zip(obj_maps, reg_maps)
            ]
            obj_flat = jnp.concatenate([f[0] for f in flat], axis=1)  # (B, A)
            reg_flat = jnp.concatenate([f[1] for f in flat], axis=1)  # (B, A, 4)

            rpn = jax.vmap(
                lambda k, o, r, gb, gm: rpn_losses(
                    k, o, r, anchors, visibility, gb, gm,
                    batch_size=rpn_batch_size,
                    positive_fraction=rpn_positive_fraction,
                    high=rpn_fg_iou, low=rpn_bg_iou,
                )
            )(rpn_keys, obj_flat, reg_flat, batch.boxes, batch.box_mask)

            # proposal selection on detached maps (selection is not
            # differentiable anyway; reference decodes inside no-grad)
            sg = jax.lax.stop_gradient
            level_obj = [sg(f[0]) for f in flat]
            level_reg = [sg(f[1]) for f in flat]

            def propose_one(i_obj, i_reg, size):
                return rpn_select_proposals(
                    list(i_obj), list(i_reg), per_level_anchors, size,
                    rpn_pre_nms_top_n, rpn_post_nms_top_n, rpn_nms_thresh,
                    rpn_fpn_post_nms_top_n,
                )

            props = jax.vmap(propose_one)(
                tuple(level_obj), tuple(level_reg), sizes
            )

            samples = jax.vmap(
                lambda k, pb, pm, gb, gl, gm: fastrcnn_sample(
                    k, pb, pm, gb, gl, gm,
                    batch_size=box_batch_size,
                    positive_fraction=box_positive_fraction,
                    high=box_fg_iou, low=box_bg_iou,
                )
            )(box_keys, props.boxes, props.mask, batch.boxes, batch.labels,
              batch.box_mask)

            rois = jnp.take_along_axis(
                props.boxes, samples.idx[..., None].astype(jnp.int32), axis=1
            )
            logits, deltas = model.apply(
                variables, feats, rois, method="box_forward"
            )
            box = jax.vmap(fastrcnn_losses)(logits, deltas, samples)

            losses = {
                "loss_objectness": rpn.objectness.mean(),
                "loss_rpn_box_reg": rpn.box.mean(),
                "loss_classifier": box.classifier.mean(),
                "loss_box_reg": box.box_reg.mean(),
            }

            if mask_on or keypoint_on:
                # positive-first static selection of the sampled rois — the
                # reference's keep_only_positive_boxes (mask_head.py:13-33)
                # with a fixed per-image budget; negatives that slip into
                # the budget get zero loss weight downstream
                pos = samples.mask & (samples.labels > 0)
                order = jnp.argsort(~pos, axis=1, stable=True)[
                    :, :head_rois_per_image]
                sel_pos = jnp.take_along_axis(pos, order, axis=1)
                sel_rois = jnp.take_along_axis(
                    rois, order[..., None].astype(jnp.int32), axis=1)
                # both reference loss evaluators re-match their proposals
                # to targets with their own Matcher (mask loss.py:55-66,
                # keypoint loss.py:66-77) rather than reusing the box
                # head's match — reproduce that
                from veto_tpu.models.detector.box_head import (
                    assign_labels_to_proposals,
                )
                m_labels, m_matched = jax.vmap(
                    lambda pb, pm, gb, gl, gm: assign_labels_to_proposals(
                        pb, pm, gb, gl, gm, fg_iou_threshold=box_fg_iou)
                )(sel_rois, sel_pos, batch.boxes, batch.labels,
                  batch.box_mask)

            if mask_on:
                from veto_tpu.models.detector.mask_head import mask_loss

                mlogits = model.apply(
                    variables, feats, sel_rois, method="mask_forward")
                ml = jax.vmap(mask_loss)(
                    mlogits, m_labels, m_matched, batch.masks, sel_rois,
                    sel_pos)
                # the reference averages BCE over the concatenation of all
                # images' positives (loss.py:112-127): combine the
                # per-image means weighted by their element counts
                mm = mlogits.shape[2]
                wts = (ml.num_pos * mm * mm).astype(jnp.float32)
                losses["loss_mask"] = (
                    (ml.loss * wts).sum() / jnp.maximum(wts.sum(), 1.0))

            if keypoint_on:
                from veto_tpu.models.detector.keypoint_head import (
                    keypoint_loss,
                )

                klogits = model.apply(
                    variables, feats, sel_rois, method="keypoint_forward")
                kps = jax.vmap(
                    lambda gk, mi: gk[jnp.maximum(mi, 0)]
                )(batch.keypoints, m_matched)
                kl = jax.vmap(keypoint_loss)(
                    klogits, kps, sel_rois, sel_pos & (m_matched >= 0))
                kwts = kl.num_valid.astype(jnp.float32)
                losses["loss_kp"] = (
                    (kl.loss * kwts).sum() / jnp.maximum(kwts.sum(), 1.0))

            return sum(losses.values()), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        opt_state = state.opt_state
        opt_state.hyperparams["lr_scale"] = lr_scale.astype(jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        ), metrics

    return train_step
