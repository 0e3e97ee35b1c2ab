"""Detection-stack tests: anchors, multiclass NMS, obj NMS, box postprocess,
RPN selection, sgdet sampling, and the full sgdet cascade smoke.

Golden values come from the documented caffe2 anchor table
(reference anchor_generator.py:180-217) and NumPy replicas of the reference
algorithms (filter_results, obj_prediction_nms) — not from running torch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veto_tpu.models.detector.anchors import (
    anchor_visibility,
    fpn_anchors,
    generate_cell_anchors,
    grid_anchors,
)
from veto_tpu.models.detector.box_head import (
    assign_labels_to_proposals,
    box_postprocess,
)
from veto_tpu.models.detector.rpn import rpn_select_proposals
from veto_tpu.models.relation.sampling import detect_relsample
from veto_tpu.ops.nms import multiclass_nms_mask, obj_prediction_nms


# ----------------------------------------------------------------------
# anchors
# ----------------------------------------------------------------------
def test_cell_anchors_match_caffe2_table():
    """The classic py-faster-rcnn stride-16 anchor table (the reference's
    docstring at anchor_generator.py:180-217 shows the 1-indexed MATLAB
    variant; its Python ``generate_anchors`` — identical math to ours —
    produces these 0-indexed values)."""
    expected = np.array(
        [
            [-84.0, -40.0, 99.0, 55.0],
            [-176.0, -88.0, 191.0, 103.0],
            [-360.0, -184.0, 375.0, 199.0],
            [-56.0, -56.0, 71.0, 71.0],
            [-120.0, -120.0, 135.0, 135.0],
            [-248.0, -248.0, 263.0, 263.0],
            [-36.0, -80.0, 51.0, 95.0],
            [-80.0, -168.0, 95.0, 183.0],
            [-168.0, -344.0, 183.0, 359.0],
        ]
    )
    # table = scales (8, 16, 32) x ratios (0.5, 1, 2), ratio-major rows;
    # scale s corresponds to size s*16
    got = []
    for ratio_block in range(3):
        ratio = [0.5, 1.0, 2.0][ratio_block]
        for size in (128, 256, 512):
            got.append(generate_cell_anchors(16, size, [ratio])[0])
    np.testing.assert_allclose(np.stack(got), expected, atol=1e-6)


def test_grid_anchor_layout_and_visibility():
    cell = generate_cell_anchors(4, 32, [0.5, 1.0, 2.0])
    grid = grid_anchors((2, 3), 4, cell)
    assert grid.shape == (2 * 3 * 3, 4)
    # anchor index fastest: first 3 rows share the (0, 0) shift
    np.testing.assert_allclose(grid[:3], cell)
    # second cell shifted by stride in x
    np.testing.assert_allclose(grid[3:6], cell + np.array([4, 0, 4, 0]))
    vis = anchor_visibility(grid, (8, 12))
    assert vis.dtype == bool and vis.shape == (18,)
    assert anchor_visibility(grid, (8, 12), straddle_thresh=-1).all()


def test_fpn_anchors_shapes():
    per_level = fpn_anchors((64, 96))
    assert len(per_level) == 5
    for (a, v), stride in zip(per_level, (4, 8, 16, 32, 64)):
        hw = -(-64 // stride) * -(-96 // stride)
        assert a.shape == (hw * 4, 4)
        assert v.shape == (hw * 4,)


# ----------------------------------------------------------------------
# multiclass NMS + obj_prediction_nms
# ----------------------------------------------------------------------
def _np_per_class_nms(boxes_per_cls, scores, score_thresh, iou_thresh, topn):
    """NumPy replica of filter_results' per-class loop (inference.py:170-188)."""
    n, c = scores.shape
    keep = np.zeros((n, c), dtype=bool)
    for j in range(c):
        idx = np.where(scores[:, j] > score_thresh)[0]
        idx = idx[np.argsort(-scores[idx, j], kind="stable")]
        kept = []
        for i in idx:
            if len(kept) >= topn:
                break
            ok = True
            for k in kept:
                ok &= _iou1(boxes_per_cls[i, j], boxes_per_cls[k, j]) <= iou_thresh
            if ok:
                kept.append(i)
        keep[kept, j] = True
    return keep


def _iou1(a, b):
    area = lambda x: (x[2] - x[0] + 1) * (x[3] - x[1] + 1)  # noqa: E731
    lt = np.maximum(a[:2], b[:2])
    rb = np.minimum(a[2:], b[2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[0] * wh[1]
    return inter / (area(a) + area(b) - inter)


def test_multiclass_nms_matches_numpy(rng):
    n, c = 40, 5
    boxes = rng.uniform(0, 80, (n, 4)).astype(np.float32)
    boxes = np.concatenate(
        [np.minimum(boxes[:, :2], boxes[:, 2:]),
         np.maximum(boxes[:, :2], boxes[:, 2:]) + 5], -1
    )
    bpc = np.repeat(boxes[:, None], c, 1) + rng.uniform(-2, 2, (n, c, 4)).astype(np.float32)
    scores = rng.uniform(0, 1, (n, c)).astype(np.float32)
    got = np.asarray(
        multiclass_nms_mask(jnp.asarray(bpc), jnp.asarray(scores), 0.3, 0.5, 10)
    )
    want = _np_per_class_nms(bpc, scores, 0.3, 0.5, 10)
    np.testing.assert_array_equal(got, want)


def _np_obj_prediction_nms(boxes_per_cls, logits, thresh):
    """NumPy replica of utils_relation.py:94-130."""
    n, c = logits.shape
    e = np.exp(logits - logits.max(-1, keepdims=True))
    prob = e / e.sum(-1, keepdims=True)
    prob[:, 0] = 0
    labels = np.zeros(n, dtype=np.int64)
    for _ in range(n):
        box_ind, cls_ind = np.unravel_index(prob.argmax(), prob.shape)
        if labels[box_ind] == 0:
            labels[box_ind] = cls_ind
        for i in range(n):
            if _iou1(boxes_per_cls[i, cls_ind], boxes_per_cls[box_ind, cls_ind]) >= thresh:
                prob[i, cls_ind] = 0.0
        prob[box_ind] = -1.0
    return labels


def test_obj_prediction_nms_matches_numpy(rng):
    n, c = 12, 6
    boxes = rng.uniform(0, 60, (n, 4)).astype(np.float32)
    boxes = np.concatenate(
        [np.minimum(boxes[:, :2], boxes[:, 2:]),
         np.maximum(boxes[:, :2], boxes[:, 2:]) + 4], -1
    )
    bpc = np.repeat(boxes[:, None], c, 1).astype(np.float32)
    logits = rng.randn(n, c).astype(np.float32) * 2
    got = np.asarray(obj_prediction_nms(jnp.asarray(bpc), jnp.asarray(logits), 0.3))
    want = _np_obj_prediction_nms(bpc, logits.copy(), 0.3)
    np.testing.assert_array_equal(got, want)


# ----------------------------------------------------------------------
# box postprocess
# ----------------------------------------------------------------------
def test_box_postprocess_duplicates_reduction(rng):
    p, c = 30, 6
    logits = rng.randn(p, c).astype(np.float32) * 3
    # zero deltas → boxes_per_cls = proposals for every class
    deltas = np.zeros((p, c * 4), np.float32)
    props = rng.uniform(0, 100, (p, 4)).astype(np.float32)
    props = np.concatenate(
        [np.minimum(props[:, :2], props[:, 2:]),
         np.maximum(props[:, :2], props[:, 2:]) + 8], -1
    )
    mask = np.ones((p,), bool)
    dets = box_postprocess(
        jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(props),
        jnp.asarray(mask), jnp.asarray([128.0, 128.0]),
        detections_per_img=10,
    )
    nk = int(dets.mask.sum())
    assert 0 < nk <= 10
    # one label per surviving box, ascending original index order
    kept_idx = np.asarray(dets.orig_idx)[np.asarray(dets.mask)]
    assert (np.diff(kept_idx) > 0).all()
    # each kept box's score equals prob[labels] for that box
    prob = jax.nn.softmax(jnp.asarray(logits), -1)
    for s, l, i in zip(
        np.asarray(dets.scores)[np.asarray(dets.mask)],
        np.asarray(dets.labels)[np.asarray(dets.mask)],
        kept_idx,
    ):
        assert l > 0
        np.testing.assert_allclose(s, np.asarray(prob)[i, l], rtol=1e-5)
    # boxes equal the per-class pick
    bpc = np.asarray(dets.boxes_per_cls)
    for row, (l, m) in enumerate(zip(np.asarray(dets.labels), np.asarray(dets.mask))):
        if m:
            np.testing.assert_allclose(np.asarray(dets.boxes)[row], bpc[row, l])


# ----------------------------------------------------------------------
# RPN selection
# ----------------------------------------------------------------------
def test_rpn_select_proposals_budgets(rng):
    anchors, sizes = [], [(16, 16), (8, 8)]
    objs, regs = [], []
    for hw, stride in zip(sizes, (4, 8)):
        n = hw[0] * hw[1] * 3
        a = grid_anchors(hw, stride, generate_cell_anchors(stride, stride * 8, [0.5, 1, 2]))
        anchors.append(jnp.asarray(a))
        objs.append(jnp.asarray(rng.randn(n).astype(np.float32)))
        regs.append(jnp.asarray(rng.randn(n, 4).astype(np.float32) * 0.1))
    props = rpn_select_proposals(
        objs, regs, anchors, jnp.asarray([60.0, 60.0]),
        pre_nms_top_n=100, post_nms_top_n=20, fpn_post_nms_top_n=30,
    )
    assert props.boxes.shape == (30, 4)  # fpn_post_nms_top_n slots
    m = np.asarray(props.mask)
    assert 0 < m.sum() <= 30
    s = np.asarray(props.objectness)[m]
    assert (np.diff(s) <= 1e-6).all()  # sorted desc
    b = np.asarray(props.boxes)[m]
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 59).all()


# ----------------------------------------------------------------------
# label assignment + sgdet sampling
# ----------------------------------------------------------------------
def test_assign_labels():
    gt = jnp.asarray([[0, 0, 10, 10], [20, 20, 40, 40], [0, 0, 0, 0]], jnp.float32)
    gl = jnp.asarray([3, 7, 0])
    gm = jnp.asarray([True, True, False])
    props = jnp.asarray(
        [[0, 0, 10, 10], [21, 21, 40, 40], [100, 100, 120, 120], [0, 0, 0, 0]],
        jnp.float32,
    )
    pm = jnp.asarray([True, True, True, False])
    labels, matched = assign_labels_to_proposals(props, pm, gt, gl, gm)
    np.testing.assert_array_equal(np.asarray(labels), [3, 7, 0, 0])
    np.testing.assert_array_equal(np.asarray(matched), [0, 1, -1, -1])


def test_detect_relsample_semantics(rng):
    t, d = 10, 12
    tgt_boxes = np.zeros((t, 4), np.float32)
    for i in range(t):
        x, y = rng.uniform(0, 200, 2)
        tgt_boxes[i] = [x, y, x + 30, y + 30]
    tgt_labels = rng.randint(1, 8, t)
    tgt_mask = np.ones(t, bool)
    rel = np.zeros((t, t), np.int32)
    rel[0, 1], rel[2, 3], rel[4, 5] = 3, 1, 7

    # proposals: near-copies of GT plus noise boxes
    prp_boxes = np.concatenate([tgt_boxes + 1.0, rng.uniform(0, 200, (d - t, 4)).astype(np.float32)])
    prp_labels = np.concatenate([tgt_labels, np.zeros(d - t, np.int64)])
    prp_scores = rng.uniform(0.2, 1.0, d).astype(np.float32)
    prp_mask = np.ones(d, bool)

    out = detect_relsample(
        jax.random.PRNGKey(0), jnp.asarray(rel), jnp.asarray(rel),
        jnp.asarray(tgt_boxes), jnp.asarray(tgt_labels), jnp.asarray(tgt_mask),
        jnp.asarray(prp_boxes), jnp.asarray(prp_labels),
        jnp.asarray(prp_scores), jnp.asarray(prp_mask),
        batch_size=64, positive_fraction=0.25, max_gt_rels=16,
    )
    mask = np.asarray(out.mask)
    labels = np.asarray(out.labels)
    pairs = np.asarray(out.pair_idx)
    assert mask.sum() > 0
    fg = mask & (labels > 0)
    # each fg pair's boxes match its GT relation's classes
    for (i, j), lab in zip(pairs[fg], labels[fg]):
        # find the GT relation with this label
        hs, ts = np.where(rel == lab)
        assert any(
            prp_labels[i] == tgt_labels[h] and prp_labels[j] == tgt_labels[tt]
            for h, tt in zip(hs, ts)
        )
    # bg pairs carry label 0 and involve only fg-labeled proposals
    bg = mask & (labels == 0)
    assert (prp_labels[pairs[bg]] > 0).all()
    # padding has label -1
    assert (labels[~mask] == -1).all()
    # binary relatedness symmetric
    b = np.asarray(out.binary_rel)
    np.testing.assert_array_equal(b, b.T)


def test_detect_relsample_empty_fallback():
    t, d = 4, 5
    out = detect_relsample(
        jax.random.PRNGKey(0),
        jnp.zeros((t, t), jnp.int32), jnp.zeros((t, t), jnp.int32),
        jnp.zeros((t, 4)), jnp.zeros((t,), jnp.int32), jnp.zeros((t,), bool),
        jnp.zeros((d, 4)), jnp.zeros((d,), jnp.int32),
        jnp.zeros((d,)), jnp.zeros((d,), bool),
        batch_size=16, max_gt_rels=8,
    )
    mask = np.asarray(out.mask)
    assert mask.sum() == 2  # two dummy (0, 0, 0) triplets (sampling.py:297-303)
    assert (np.asarray(out.labels)[mask] == 0).all()
    assert (np.asarray(out.pair_idx)[mask] == 0).all()
