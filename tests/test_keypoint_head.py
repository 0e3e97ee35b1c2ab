"""Keypoint head + containers vs the live reference.

Covers (VERDICT r3 #6, keypoint half): the Keypoints/PersonKeypoints
container ops, the C2 heatmap projection, the spatial-softmax keypoint
loss against KeypointRCNNLossComputation's numeric core, and
heatmaps_to_keypoints inference.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import (
    load_ref_keypoint,
    load_ref_keypoint_head,
    reference_available,
)

from veto_tpu.models.detector.keypoint_head import (
    KeypointFeatureExtractor,
    KeypointPredictor,
    heatmaps_to_keypoints,
    keypoint_loss,
)
from veto_tpu.structures.keypoints import (
    FLIP_LEFT_RIGHT,
    PersonKeypoints,
    keypoints_to_heat_map,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not mounted"
)

K = 17


def _toy_keypoints(n, w, h, seed=0):
    rng = np.random.RandomState(seed)
    kps = np.zeros((n, K, 3), np.float32)
    kps[..., 0] = rng.uniform(0, w, (n, K))
    kps[..., 1] = rng.uniform(0, h, (n, K))
    kps[..., 2] = rng.randint(0, 3, (n, K))
    kps[kps[..., 2] == 0] = 0
    return kps


def test_keypoints_container_parity():
    ref = load_ref_keypoint()
    w, h = 64, 48
    kps = _toy_keypoints(3, w, h)
    ref_k = ref.PersonKeypoints(torch.from_numpy(kps.copy()), (w, h))
    got_k = PersonKeypoints(kps.copy(), (w, h))

    np.testing.assert_array_equal(np.asarray(got_k.FLIP_INDS),
                                  ref.PersonKeypoints.FLIP_INDS.numpy())
    assert got_k.CONNECTIONS == ref.PersonKeypoints.CONNECTIONS

    rr = ref_k.resize((32, 96))
    gr = got_k.resize((32, 96))
    np.testing.assert_allclose(gr.keypoints, rr.keypoints.numpy(), rtol=1e-6)

    rt = ref_k.transpose(FLIP_LEFT_RIGHT)
    gt = got_k.transpose(FLIP_LEFT_RIGHT)
    np.testing.assert_allclose(gt.keypoints, rt.keypoints.numpy(), rtol=1e-6)

    np.testing.assert_array_equal(got_k[np.asarray([1])].keypoints,
                                  ref_k[torch.tensor([1])].keypoints.numpy())


def test_heatmap_projection_parity():
    ref = load_ref_keypoint()
    w, h, n, hm = 80, 60, 6, 14
    rng = np.random.RandomState(1)
    kps = _toy_keypoints(n, w, h, seed=2)
    x1 = rng.uniform(0, w - 20, n)
    y1 = rng.uniform(0, h - 20, n)
    rois = np.stack([x1, y1, x1 + rng.uniform(5, 20, n),
                     y1 + rng.uniform(5, 20, n)], 1).astype(np.float32)
    # plant exact-boundary coordinates to hit the snap-to-last-cell branch
    kps[0, 0, :2] = rois[0, 2:4]
    kps[0, 0, 2] = 2

    ref_lin, ref_valid = ref.keypoints_to_heat_map(
        torch.from_numpy(kps), torch.from_numpy(rois), hm)
    got_lin, got_valid = keypoints_to_heat_map(
        jnp.asarray(kps), jnp.asarray(rois), hm)
    np.testing.assert_array_equal(np.asarray(got_lin), ref_lin.numpy())
    np.testing.assert_array_equal(np.asarray(got_valid), ref_valid.numpy())


def test_keypoint_loss_parity():
    """The loss core (projection + CE over valid pairs) vs the reference's
    __call__ numeric path, bypassing its BoxList plumbing."""
    loss_mod, _ = load_ref_keypoint_head()
    ref_kp = load_ref_keypoint()
    import torch.nn.functional as F

    n, hm, w, h = 8, 14, 96, 72
    rng = np.random.RandomState(3)
    kps = _toy_keypoints(n, w, h, seed=4)
    x1 = rng.uniform(0, w - 30, n)
    y1 = rng.uniform(0, h - 30, n)
    rois = np.stack([x1, y1, x1 + rng.uniform(10, 30, n),
                     y1 + rng.uniform(10, 30, n)], 1).astype(np.float32)
    logits = rng.randn(n, K, hm, hm).astype(np.float32)

    # reference numeric core (loss.py:145-169) on the same inputs
    heatmaps, valid = ref_kp.keypoints_to_heat_map(
        torch.from_numpy(kps), torch.from_numpy(rois), hm)
    valid_idx = torch.nonzero(valid.view(-1)).squeeze(1)
    tl = torch.from_numpy(logits).view(n * K, hm * hm)
    ref_loss = float(F.cross_entropy(tl[valid_idx],
                                     heatmaps.view(-1)[valid_idx]))

    got = keypoint_loss(
        jnp.asarray(np.moveaxis(logits, 1, -1)), jnp.asarray(kps),
        jnp.asarray(rois), jnp.ones((n,), bool))
    assert int(got.num_valid) == len(valid_idx) > 0
    np.testing.assert_allclose(float(got.loss), ref_loss, rtol=1e-5)

    # positives mask gates rows
    got_none = keypoint_loss(
        jnp.asarray(np.moveaxis(logits, 1, -1)), jnp.asarray(kps),
        jnp.asarray(rois), jnp.zeros((n,), bool))
    assert float(got_none.loss) == 0.0 and int(got_none.num_valid) == 0


def test_heatmaps_to_keypoints_parity(monkeypatch):
    _, inf_mod = load_ref_keypoint_head()
    import cv2 as _cv2

    # the reference passes numpy-float dsize to cv2.resize, which OpenCV 5
    # rejects; shim int-casts ONLY the dsize — the interpolation is real cv2
    real_resize = _cv2.resize
    monkeypatch.setattr(
        inf_mod.cv2, "resize",
        lambda src, dsize, **kw: real_resize(
            src, (int(dsize[0]), int(dsize[1])), **kw))
    d, hm, w, h = 4, 28, 96, 72
    rng = np.random.RandomState(5)
    maps = rng.randn(d, K, hm, hm).astype(np.float32)
    x1 = rng.uniform(0, w - 30, d)
    y1 = rng.uniform(0, h - 30, d)
    rois = np.stack([x1, y1, x1 + rng.uniform(8, 28, d),
                     y1 + rng.uniform(8, 28, d)], 1).astype(np.float32)

    ref_xy, ref_scores = inf_mod.heatmaps_to_keypoints(maps, rois)
    got_xy, got_scores = heatmaps_to_keypoints(maps, rois)
    np.testing.assert_allclose(got_xy, ref_xy, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-5, atol=1e-5)


def test_keypoint_modules_shapes():
    ext = KeypointFeatureExtractor(conv_layers=(32, 32))
    pred = KeypointPredictor(num_keypoints=K)
    x = jnp.zeros((2, 14, 14, 8))
    feats = ext.apply(ext.init(jax.random.PRNGKey(0), x), x)
    assert feats.shape == (2, 14, 14, 32)
    out = pred.apply(pred.init(jax.random.PRNGKey(1), feats), feats)
    assert out.shape == (2, 56, 56, K)  # 14 -> deconv 28 -> upsample 56
    assert np.isfinite(np.asarray(out)).all()
