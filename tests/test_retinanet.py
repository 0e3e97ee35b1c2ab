"""RetinaNet: loss parity vs the live reference, anchor octave enumeration,
head shape/init semantics, and fixed-shape inference behavior.

The loss test runs the REAL reference RetinaNetLossComputation
(pysgg/modeling/rpn/retinanet/loss.py via ref_loader) on the same anchors,
predictions and targets — the CPU focal path needs gamma/alpha as
1-element lists (the reference's sigmoid_focal_loss_cpu indexes [0]).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import load_ref_bounding_box, load_ref_retinanet_loss
from veto_tpu.models.detector.anchors import fpn_anchors
from veto_tpu.models.detector.retinanet import (
    RetinaNetDetections,
    RetinaNetFPN,
    RetinaNetHead,
    flatten_retinanet_level,
    retinanet_anchor_sizes,
    retinanet_inference,
    retinanet_losses,
)

RATIOS = (0.5, 1.0, 2.0)
C = 6  # foreground classes in the toy setup


def test_anchor_octave_sizes():
    sizes = retinanet_anchor_sizes((32, 64), octave=2.0, scales_per_octave=3)
    # anchor_generator.py:155-161
    assert np.allclose(sizes[0], (32, 32 * 2 ** (1 / 3), 32 * 2 ** (2 / 3)))
    assert np.allclose(sizes[1], (64, 64 * 2 ** (1 / 3), 64 * 2 ** (2 / 3)))
    levels = fpn_anchors((64, 64), sizes, (8, 16), RATIOS)
    assert levels[0][0].shape == (8 * 8 * 9, 4)
    assert levels[1][0].shape == (4 * 4 * 9, 4)


def _toy_problem(seed=0):
    rng = np.random.default_rng(seed)
    img_hw = (64, 64)
    sizes = retinanet_anchor_sizes((32, 64), 2.0, 3)
    levels = fpn_anchors(img_hw, sizes, (8, 16), RATIOS)
    anchors = [a.astype(np.float32) for a, _ in levels]
    grids = [(8, 8), (4, 4)]
    A = 9
    maps_cls = [rng.standard_normal((2, h, w, A * C)).astype(np.float32)
                for h, w in grids]
    maps_reg = [0.1 * rng.standard_normal((2, h, w, A * 4)).astype(np.float32)
                for h, w in grids]
    gt_boxes = np.array(
        [[[4.0, 4.0, 40.0, 40.0], [10.0, 20.0, 60.0, 50.0],
          [0.0, 0.0, 16.0, 16.0]],
         [[8.0, 8.0, 56.0, 56.0], [2.0, 30.0, 30.0, 62.0],
          [0.0, 0.0, 0.0, 0.0]]], np.float32)
    gt_labels = np.array([[2, 5, 1], [3, 4, 0]], np.int64)
    gt_mask = np.array([[True, True, True], [True, True, False]])
    return img_hw, anchors, maps_cls, maps_reg, gt_boxes, gt_labels, gt_mask


def test_retinanet_loss_parity_vs_reference():
    ref_loss_mod = load_ref_retinanet_loss()
    bb = load_ref_bounding_box()
    from pysgg.modeling.box_coder import BoxCoder
    from pysgg.modeling.matcher import Matcher
    from pysgg.layers import SigmoidFocalLoss

    img_hw, anchors, maps_cls, maps_reg, gt_boxes, gt_labels, gt_mask = \
        _toy_problem()
    size_wh = (img_hw[1], img_hw[0])

    evaluator = ref_loss_mod.RetinaNetLossComputation(
        Matcher(0.5, 0.4, allow_low_quality_matches=True),
        BoxCoder(weights=(10.0, 10.0, 5.0, 5.0)),
        ref_loss_mod.generate_retinanet_labels,
        SigmoidFocalLoss([2.0], [0.25]),  # lists: CPU kernel indexes [0]
        bbox_reg_beta=0.11,
        regress_norm=4.0,
    )
    ref_anchors = [
        [bb.BoxList(torch.from_numpy(a), size_wh, mode="xyxy")
         for a in anchors]
        for _ in range(2)
    ]
    ref_targets = []
    for b in range(2):
        n = int(gt_mask[b].sum())
        t = bb.BoxList(torch.from_numpy(gt_boxes[b, :n]), size_wh, mode="xyxy")
        t.add_field("labels", torch.from_numpy(gt_labels[b, :n]))
        ref_targets.append(t)
    ref_cls = [torch.from_numpy(
        m.reshape(2, m.shape[1], m.shape[2], 9, C)
         .transpose(0, 3, 4, 1, 2).reshape(2, 9 * C, m.shape[1], m.shape[2])
         .copy()) for m in maps_cls]
    ref_reg = [torch.from_numpy(
        m.reshape(2, m.shape[1], m.shape[2], 9, 4)
         .transpose(0, 3, 4, 1, 2).reshape(2, 9 * 4, m.shape[1], m.shape[2])
         .copy()) for m in maps_reg]
    ref_c, ref_r = evaluator(ref_anchors, ref_cls, ref_reg, ref_targets)

    flat = [jax.vmap(lambda c, r: flatten_retinanet_level(c, r, C))(
        jnp.asarray(mc), jnp.asarray(mr))
        for mc, mr in zip(maps_cls, maps_reg)]
    box_cls = jnp.concatenate([f[0] for f in flat], axis=1)
    box_reg = jnp.concatenate([f[1] for f in flat], axis=1)
    got = retinanet_losses(
        box_cls, box_reg, jnp.asarray(np.concatenate(anchors)),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_mask),
    )
    np.testing.assert_allclose(float(got.cls), float(ref_c), rtol=2e-5)
    np.testing.assert_allclose(float(got.reg), float(ref_r), rtol=2e-5, atol=1e-7)


def test_retinanet_head_and_fpn_shapes():
    feats = [jnp.zeros((1, 8, 8, 32)), jnp.zeros((1, 4, 4, 64)),
             jnp.zeros((1, 2, 2, 128))]
    fpn = RetinaNetFPN(out_channels=32)
    params = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(params, feats)
    assert [o.shape[1] for o in outs] == [8, 4, 2, 1, 1]

    head = RetinaNetHead(num_classes=C, num_anchors=9, num_convs=2)
    hp = head.init(jax.random.PRNGKey(0), outs)
    logits, bbox = head.apply(hp, outs)
    assert logits[0].shape == (1, 8, 8, 9 * C)
    assert bbox[-1].shape == (1, 1, 1, 36)
    # prior-prob bias init (retinanet.py:75-77): sigmoid(bias) = 0.01
    bias = hp["params"]["cls_logits"]["bias"]
    np.testing.assert_allclose(
        jax.nn.sigmoid(bias), 0.01 * np.ones_like(bias), rtol=1e-5)


def test_retinanet_inference_selects_and_suppresses():
    img_hw, anchors, maps_cls, maps_reg, *_ = _toy_problem()
    cls_flat, reg_flat = [], []
    for mc, mr in zip(maps_cls, maps_reg):
        c, r = flatten_retinanet_level(jnp.asarray(mc[0]), jnp.asarray(mr[0]), C)
        # push everything below threshold, then plant two strong candidates
        cls_flat.append(jnp.full_like(c, -10.0))
        reg_flat.append(r * 0)
    # anchor 0 of level 0, class 3 — and its exact duplicate at anchor 0
    # class 3 cannot exist twice, so use anchor 1 (overlapping) same class,
    # plus a different class at the same anchor (must survive class-aware NMS)
    cls_flat[0] = cls_flat[0].at[0, 2].set(4.0)   # class 3, score ~0.982
    cls_flat[0] = cls_flat[0].at[1, 2].set(2.0)   # class 3, overlapping anchor
    cls_flat[0] = cls_flat[0].at[0, 4].set(3.0)   # class 5, same box
    det = retinanet_inference(
        cls_flat, reg_flat, [jnp.asarray(a) for a in anchors],
        jnp.asarray([img_hw[1], img_hw[0]], jnp.float32),
        pre_nms_top_n=16, detections_per_img=8, num_classes=C,
    )
    assert isinstance(det, RetinaNetDetections)
    kept = np.asarray(det.mask)
    scores = np.asarray(det.scores)[kept]
    labels = np.asarray(det.labels)[kept]
    assert kept.sum() == 2  # overlapping same-class anchor suppressed
    assert set(labels.tolist()) == {3, 5}
    assert np.isclose(scores.max(), 1 / (1 + np.exp(-4.0)), atol=1e-5)


def test_retinanet_loss_differentiable():
    img_hw, anchors, maps_cls, maps_reg, gt_boxes, gt_labels, gt_mask = \
        _toy_problem(1)
    flat = [jax.vmap(lambda c, r: flatten_retinanet_level(c, r, C))(
        jnp.asarray(mc), jnp.asarray(mr))
        for mc, mr in zip(maps_cls, maps_reg)]
    box_cls = jnp.concatenate([f[0] for f in flat], axis=1)
    box_reg = jnp.concatenate([f[1] for f in flat], axis=1)

    def total(cls_in, reg_in):
        l = retinanet_losses(
            cls_in, reg_in, jnp.asarray(np.concatenate(anchors)),
            jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(gt_mask))
        return l.cls + l.reg

    g1, g2 = jax.jit(jax.grad(total, argnums=(0, 1)))(box_cls, box_reg)
    assert np.isfinite(np.asarray(g1)).all() and np.isfinite(np.asarray(g2)).all()
    assert float(jnp.abs(g2).sum()) > 0
