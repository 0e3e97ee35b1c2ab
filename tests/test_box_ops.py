"""Golden tests for box geometry ops vs the reference's conventions.

Reference semantics under test: boxlist_ops.py (TO_REMOVE=1 IoU/area),
bounding_box.py convert(), box_coder.py encode/decode, utils_motifs.py
encode_box_info.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from veto_tpu.ops import box_ops


def test_area_inclusive_pixel():
    boxes = jnp.array([[0.0, 0.0, 9.0, 9.0], [5.0, 5.0, 5.0, 5.0]])
    # (9-0+1)^2 = 100 ; degenerate single pixel = 1
    np.testing.assert_allclose(box_ops.box_area(boxes), [100.0, 1.0])


def test_iou_hand_computed():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    b = jnp.array([[0.0, 0.0, 9.0, 9.0], [5.0, 5.0, 14.0, 14.0], [20.0, 20.0, 29.0, 29.0]])
    iou = box_ops.box_iou(a, b)
    # identical: 1 ; overlap 5x5=25 over 100+100-25 ; disjoint: 0
    np.testing.assert_allclose(iou[0], [1.0, 25.0 / 175.0, 0.0], rtol=1e-6)


def test_iou_batched_shape():
    a = jnp.zeros((2, 5, 4))
    b = jnp.zeros((2, 7, 4))
    assert box_ops.box_iou(a, b).shape == (2, 5, 7)


def test_union_intersection():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[5.0, 5.0, 20.0, 20.0]])
    np.testing.assert_allclose(box_ops.box_union(a, b)[0], [0, 0, 20, 20])
    np.testing.assert_allclose(box_ops.box_intersection(a, b)[0], [5, 5, 10, 10])


def test_xyxy_xywh_roundtrip():
    boxes = jnp.array([[3.0, 4.0, 12.0, 20.0]])
    xywh = box_ops.xyxy_to_xywh(boxes)
    # w = 12-3+1 = 10, h = 20-4+1 = 17 (bounding_box.py convert)
    np.testing.assert_allclose(xywh[0], [3, 4, 10, 17])
    back = box_ops.xywh_to_xyxy(xywh)
    np.testing.assert_allclose(back, boxes)


def test_center_xywh():
    xywh = jnp.array([[3.0, 4.0, 10.0, 17.0]])
    out = box_ops.center_xywh(xywh)
    np.testing.assert_allclose(out[0], [3 + 5.0, 4 + 8.5, 10, 17])


def test_encode_decode_roundtrip(rng):
    props = jnp.asarray(rng.uniform(0, 100, (16, 4)).astype(np.float32))
    props = jnp.concatenate([props[:, :2], props[:, :2] + jnp.abs(props[:, 2:]) + 5], -1)
    gt = props + jnp.asarray(rng.uniform(-3, 3, (16, 4)).astype(np.float32))
    codes = box_ops.encode_boxes(gt, props)
    decoded = box_ops.decode_boxes(codes, props)
    np.testing.assert_allclose(decoded, gt, atol=1e-3)


def test_decode_matches_reference_formula():
    """Spot-check decode against a hand-evaluated reference computation
    (box_coder.py:53-95 with weights (10,10,5,5))."""
    # w = 9-0+1 = 10, h = 19-0+1 = 20, ctr = (x1 + 0.5w, y1 + 0.5h) = (5, 10)
    boxes = jnp.array([[0.0, 0.0, 9.0, 19.0]])
    codes = jnp.array([[1.0, -2.0, 0.5, 0.0]])
    out = np.asarray(box_ops.decode_boxes(codes, boxes))[0]
    dx, dy, dw, dh = 0.1, -0.2, 0.1, 0.0
    pcx, pcy = dx * 10 + 5.0, dy * 20 + 10.0
    pw, ph = np.exp(dw) * 10, np.exp(dh) * 20
    expect = [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw - 1, pcy + 0.5 * ph - 1]
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_encode_box_info_nine_dims():
    boxes = jnp.array([[10.0, 20.0, 29.0, 59.0]])  # w=20, h=40 (inclusive)
    size = jnp.array([100, 200])
    info = np.asarray(box_ops.encode_box_info(boxes, size))[0]
    assert info.shape == (9,)
    np.testing.assert_allclose(info[0], 20 / 100)  # w/W
    np.testing.assert_allclose(info[1], 40 / 200)  # h/H
    np.testing.assert_allclose(info[2], (10 + 10.0) / 100)  # cx/W
    np.testing.assert_allclose(info[8], 20 * 40 / (100 * 200))


def test_clip_to_image():
    boxes = jnp.array([[-5.0, -5.0, 120.0, 90.0]])
    size = jnp.array([100, 80])
    out = box_ops.clip_to_image(boxes, size)
    np.testing.assert_allclose(out[0], [0, 0, 99, 79])


def test_resize_boxes():
    boxes = jnp.array([[10.0, 10.0, 20.0, 20.0]])
    out = box_ops.resize_boxes(boxes, jnp.array([100, 100]), jnp.array([200, 50]))
    np.testing.assert_allclose(out[0], [20, 5, 40, 10])
