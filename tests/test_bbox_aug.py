"""Detection TTA (engine/bbox_aug.py) + custom group-split generator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from veto_tpu.engine.bbox_aug import detect_tta, hflip_boxes, hflip_images
from veto_tpu.models.sgg import SGGModel

NUM_OBJ = 9


@pytest.fixture(scope="module")
def det_model():
    model = SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=5, mode="sgdet",
        stage_blocks=(1, 1, 1, 1), groups=1, width_per_group=16,
        fpn_channels=32, box_mlp_dim=64, detections_per_img=8,
        rpn_pre_nms_top_n=64, rpn_post_nms_top_n=16, rpn_fpn_post_nms_top_n=16,
        dtype=jnp.float32,
    )
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    sizes = jnp.asarray([[64.0, 64.0], [48.0, 40.0]])
    variables = model.init(
        jax.random.PRNGKey(0), imgs, jnp.zeros((2, 64, 64, 1)),
        jnp.zeros((2, 4, 4)), jnp.ones((2, 4), bool),
        jnp.ones((2, 4), jnp.int32), jnp.zeros((2, 4, NUM_OBJ)),
        jnp.zeros((2, 4, 2), jnp.int32), jnp.ones((2, 4), bool),
        method="init_all",
    )
    return model, variables, imgs, sizes


def test_hflip_roundtrip():
    boxes = jnp.asarray([[[2.0, 3.0, 10.0, 12.0]]])
    w = jnp.asarray([20.0])
    flipped = hflip_boxes(boxes, w[:, None])
    np.testing.assert_allclose(np.asarray(flipped), [[[9.0, 3.0, 17.0, 12.0]]])
    back = hflip_boxes(flipped, w[:, None])
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes))
    img = jnp.arange(12.0).reshape(1, 2, 6, 1)
    np.testing.assert_allclose(
        np.asarray(hflip_images(hflip_images(img))), np.asarray(img))


def test_identity_only_tta_equals_plain_detect(det_model):
    model, variables, imgs, sizes = det_model
    det = model.apply(variables, imgs, sizes, method="detect")
    feats, dets, logits = detect_tta(
        model, variables, imgs, sizes, hflip=False, scales=())
    np.testing.assert_allclose(
        np.asarray(dets.boxes), np.asarray(det.detections.boxes), atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(dets.labels), np.asarray(det.detections.labels))
    np.testing.assert_allclose(
        np.asarray(dets.scores), np.asarray(det.detections.scores), atol=1e-5)


def test_tta_with_flip_and_scale_yields_valid_detections(det_model):
    model, variables, imgs, sizes = det_model
    feats, dets, logits = detect_tta(
        model, variables, imgs, sizes, hflip=True, scales=(0.75,))
    b = np.asarray(dets.boxes)
    m = np.asarray(dets.mask)
    assert b.shape == (2, 8, 4)
    assert np.isfinite(b).all()
    # boxes clipped inside their images
    for i in range(2):
        w, h = np.asarray(sizes[i])
        assert (b[i][m[i]][:, [0, 2]] <= w - 1 + 1e-3).all()
        assert (b[i][m[i]][:, [1, 3]] <= h - 1 + 1e-3).all()
        assert (b[i][m[i]] >= -1e-3).all()
    assert logits.shape == (2, 8, NUM_OBJ)


def test_group_split_generator_matches_shipped_vg_split():
    from veto_tpu.data.predicate_stats import (
        VG_PREDICATE_COUNTS,
        generate_group_splits,
        get_group_splits,
    )

    got = generate_group_splits(VG_PREDICATE_COUNTS[1:], times=4)
    assert got == get_group_splits("VG", "divide4")[1]
    # custom synthetic dataset: strictly decreasing counts, small tail glued
    counts = [10000, 5000, 2600, 2400, 500, 450, 120, 80, 10]
    sizes = generate_group_splits(counts, times=4)
    assert sum(sizes) == len(counts)
    assert sizes[0] >= 1 and len(sizes) >= 2
