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


# ----------------------------------------------------------------------
# loss layers (veto_tpu/ops/losses.py)
# ----------------------------------------------------------------------
def test_sigmoid_focal_loss_matches_reference_cpu(rng):
    import jax.numpy as jnp
    from veto_tpu.ops.losses import sigmoid_focal_loss

    n, c = 12, 5
    logits = rng.randn(n, c).astype(np.float32)
    targets = rng.randint(0, c + 1, n)
    got = np.asarray(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))

    # reference sigmoid_focal_loss_cpu (layers/sigmoid_focal_loss.py:40-58)
    gamma, alpha = 2.0, 0.25
    class_range = np.arange(1, c + 1)[None, :]
    t = targets[:, None]
    p = 1 / (1 + np.exp(-logits))
    term1 = (1 - p) ** gamma * np.log(p)
    term2 = p ** gamma * np.log(1 - p)
    want = (
        -(t == class_range).astype(np.float32) * term1 * alpha
        - ((t != class_range) & (t >= 0)).astype(np.float32) * term2 * (1 - alpha)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_label_smoothing_and_entropy_and_kl(rng):
    import jax.numpy as jnp
    from veto_tpu.ops.losses import entropy_loss, kl_div_loss, label_smoothing_ce

    logits = jnp.asarray(rng.randn(6, 4).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 4, 6))
    ls = float(label_smoothing_ce(logits, targets, e=0.0))
    # at e=0 equals plain CE
    logp = np.asarray(jnp.log(jnp.exp(logits) / jnp.exp(logits).sum(-1, keepdims=True)))
    want = -logp[np.arange(6), np.asarray(targets)].mean()
    assert ls == pytest.approx(want, rel=1e-4)

    p = jnp.asarray(np.full((3, 4), 0.25, np.float32))
    assert float(entropy_loss(p)) == pytest.approx(4 * 0.25 * np.log(4), rel=1e-4)
    assert float(kl_div_loss(p, p)) == pytest.approx(0.0, abs=1e-6)


def test_learnable_balanced_norm(rng):
    import jax
    import jax.numpy as jnp
    from veto_tpu.ops.losses import LearnableBalancedNorm

    m = LearnableBalancedNorm(num_fg_classes=6)
    logits = jnp.asarray(rng.randn(5, 7).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), logits)
    out = np.asarray(m.apply(v, logits))
    assert out.shape == (5, 7)
    assert np.isfinite(out).all()
