"""ROIPool vs a direct NumPy transcription of the reference CUDA kernel
(pysgg/csrc/cuda/ROIPool_cuda.cu RoIPoolFForward:17-78 / Backward:81-110)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from veto_tpu.ops.roi_pool import roi_pool, roi_pool_with_argmax


def _ref_roi_pool(feat, rois, scale, p):
    """Literal NumPy port of RoIPoolFForward (test oracle only)."""
    h, w, c = feat.shape
    r = len(rois)
    out = np.zeros((r, p, p, c), np.float32)
    argmax = np.full((r, p, p, c), -1, np.int64)
    for n in range(r):
        sw = int(np.round(rois[n, 0] * scale))
        sh = int(np.round(rois[n, 1] * scale))
        ew = int(np.round(rois[n, 2] * scale))
        eh = int(np.round(rois[n, 3] * scale))
        rw = max(ew - sw + 1, 1)
        rh = max(eh - sh + 1, 1)
        # exact-integer floor/ceil of ph*rh/p — the stable form of the CUDA
        # kernel's f32 bin products (see ops/roi_pool.py)
        for ph in range(p):
            for pw in range(p):
                hs = min(max(ph * rh // p + sh, 0), h)
                he = min(max(-((-(ph + 1) * rh) // p) + sh, 0), h)
                ws = min(max(pw * rw // p + sw, 0), w)
                we = min(max(-((-(pw + 1) * rw) // p) + sw, 0), w)
                empty = he <= hs or we <= ws
                for ci in range(c):
                    maxval = 0.0 if empty else -np.inf
                    maxidx = -1
                    for hh in range(hs, he):
                        for ww in range(ws, we):
                            if feat[hh, ww, ci] > maxval:
                                maxval = feat[hh, ww, ci]
                                maxidx = hh * w + ww
                    out[n, ph, pw, ci] = maxval
                    argmax[n, ph, pw, ci] = maxidx
    return out, argmax


@pytest.mark.parametrize("seed,p,scale", [(0, 7, 0.25), (1, 3, 0.5), (2, 2, 1.0)])
def test_roi_pool_matches_cuda_semantics(seed, p, scale):
    rng = np.random.RandomState(seed)
    h, w, c = 12, 16, 5
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = np.stack([
        rng.uniform(0, w / scale * 0.7, 6),
        rng.uniform(0, h / scale * 0.7, 6),
        rng.uniform(0, w / scale, 6),
        rng.uniform(0, h / scale, 6),
    ], axis=1).astype(np.float32)
    rois[:, 2] = np.maximum(rois[:, 2], rois[:, 0])
    rois[:, 3] = np.maximum(rois[:, 3], rois[:, 1])
    # include a degenerate 1x1 roi and one fully out of range
    rois[0] = [3.0, 3.0, 3.0, 3.0]
    rois[1] = [w / scale + 5, h / scale + 5, w / scale + 9, h / scale + 9]

    want, want_idx = _ref_roi_pool(feat, rois, scale, p)
    got, got_idx = jax.device_get(
        roi_pool_with_argmax(jnp.asarray(feat), jnp.asarray(rois), scale, p)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(got_idx, want_idx)


def test_roi_pool_backward_scatters_to_argmax():
    rng = np.random.RandomState(3)
    h, w, c, p = 10, 10, 3, 2
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = np.array([[2.0, 2.0, 30.0, 30.0],
                     [0.0, 0.0, 12.0, 8.0]], np.float32)
    scale = 0.25
    g = rng.randn(2, p, p, c).astype(np.float32)

    _, argmax = jax.device_get(
        roi_pool_with_argmax(jnp.asarray(feat), jnp.asarray(rois), scale, p))
    want = np.zeros((h * w, c), np.float32)
    for n in range(2):
        for ph in range(p):
            for pw in range(p):
                for ci in range(c):
                    idx = argmax[n, ph, pw, ci]
                    if idx >= 0:
                        want[idx, ci] += g[n, ph, pw, ci]

    grad = jax.grad(
        lambda f: jnp.sum(roi_pool(f, jnp.asarray(rois), scale, p) * g)
    )(jnp.asarray(feat))
    np.testing.assert_allclose(
        np.asarray(grad).reshape(h * w, c), want, rtol=1e-5, atol=1e-6)


def test_roi_pool_empty_bin_zero_grad():
    """A roi entirely outside the map: zero output, -1 argmax, zero grad."""
    feat = jnp.ones((8, 8, 2))
    rois = jnp.array([[100.0, 100.0, 120.0, 120.0]])
    out, idx = roi_pool_with_argmax(feat, rois, 1.0, 2)
    # the clipped window collapses to [8, 8) — empty except that round()
    # keeps start==end==8 ⇒ all bins empty
    assert np.asarray(out).sum() == 0.0
    assert (np.asarray(idx) == -1).all()
    grad = jax.grad(lambda f: jnp.sum(roi_pool(f, rois, 1.0, 2)))(feat)
    assert np.abs(np.asarray(grad)).sum() == 0.0
