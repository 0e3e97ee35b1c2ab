"""Windowed Pallas pooler vs the separable/gather oracles.

The windowed kernel (ops/roi_align_windowed.py) must match
multilevel_roi_align — itself parity-tested against the reference CUDA
semantics (ROIAlign_cuda.cu) in test_roi_align.py — for every roi whose
bilinear taps fit the (32, 64) window, and fall back to the exact separable
form for rois that don't."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from veto_tpu.ops.roi_align import multilevel_roi_align
from veto_tpu.ops.roi_align_windowed import (
    WIN_H,
    WIN_W,
    _windowed_pool_raw,
    multilevel_roi_align_batched,
)

SCALES = (1 / 4, 1 / 8, 1 / 16, 1 / 32)


def _pyramid(rng, b, c, h0=64, w0=96, dtype=jnp.float32):
    return tuple(
        jnp.asarray(rng.randn(b, h0 >> i, w0 >> i, c), dtype) for i in range(4)
    )


def _boxes(rng, b, r, span=100.0):
    out = np.zeros((b, r, 4), np.float32)
    out[..., :2] = rng.rand(b, r, 2) * 150
    out[..., 2:] = out[..., :2] + 5 + rng.rand(b, r, 2) * span
    return jnp.asarray(out)


def _sep(feats, rois):
    return jax.vmap(
        lambda fs, rr: multilevel_roi_align(fs, rr, SCALES, 7, 2)
    )(feats, rois)


def test_windowed_matches_separable_f32():
    rng = np.random.RandomState(0)
    feats = _pyramid(rng, 2, 8)
    rois = _boxes(rng, 2, 24)
    ref = _sep(feats, rois)
    got = multilevel_roi_align_batched(
        feats, rois, SCALES, 7, 2, impl="windowed", interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_windowed_matches_separable_bf16():
    rng = np.random.RandomState(1)
    feats = _pyramid(rng, 1, 16, dtype=jnp.bfloat16)
    rois = _boxes(rng, 1, 16)
    ref = _sep(feats, rois)
    got = multilevel_roi_align_batched(
        feats, rois, SCALES, 7, 2, impl="windowed", interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_misfit_rois_take_exact_fallback():
    """Extreme-aspect rois whose taps exceed the window must still be exact
    (compacted separable fallback)."""
    rng = np.random.RandomState(2)
    feats = _pyramid(rng, 1, 8, h0=128, w0=192)
    boxes = np.zeros((1, 8, 4), np.float32)
    # very wide, thin boxes: large span on the assigned level's x axis
    boxes[0, :, 0] = 2.0
    boxes[0, :, 1] = rng.rand(8) * 100
    boxes[0, :, 2] = 700.0  # ~175 px at P2 scale if assigned there
    boxes[0, :, 3] = boxes[0, :, 1] + 3.0
    rois = jnp.asarray(boxes)

    _, fits = _windowed_pool_raw(feats, rois, SCALES, 7, 2, interpret=True)
    assert not bool(np.asarray(fits).all()), "test boxes should overflow the window"

    ref = _sep(feats, rois)
    got = multilevel_roi_align_batched(
        feats, rois, SCALES, 7, 2, impl="windowed", interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fits_flag_true_for_normal_boxes():
    rng = np.random.RandomState(3)
    feats = _pyramid(rng, 2, 4)
    rois = _boxes(rng, 2, 32)
    _, fits = _windowed_pool_raw(feats, rois, SCALES, 7, 2, interpret=True)
    assert bool(np.asarray(fits).all())


def test_windowed_gradient_matches_separable():
    """custom_vjp backward = gradient of the (numerically equal) separable
    forward."""
    rng = np.random.RandomState(4)
    feats = _pyramid(rng, 1, 4)
    rois = _boxes(rng, 1, 6)

    def loss_win(fs):
        out = multilevel_roi_align_batched(
            fs, rois, SCALES, 7, 2, impl="windowed", interpret=True
        )
        return jnp.sum(out * out)

    def loss_sep(fs):
        return jnp.sum(_sep(fs, rois) ** 2)

    g_win = jax.grad(loss_win)(feats)
    g_sep = jax.grad(loss_sep)(feats)
    for a, b in zip(g_win, g_sep):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_auto_impl_selects_separable_on_cpu():
    rng = np.random.RandomState(5)
    feats = _pyramid(rng, 1, 4)
    rois = _boxes(rng, 1, 4)
    got = multilevel_roi_align_batched(feats, rois, SCALES, 7, 2, impl="auto")
    ref = _sep(feats, rois)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_small_p5_map_fits_window():
    """P5 maps smaller than the window must be padded, not crash, and the
    padded rows must not contaminate results (zero weights there)."""
    rng = np.random.RandomState(6)
    feats = _pyramid(rng, 1, 4, h0=96, w0=128)  # P5 = 12x16 < (32, 64)
    boxes = np.array([[[10.0, 10.0, 460.0, 460.0],   # large -> P5
                       [20.0, 30.0, 60.0, 80.0]]], np.float32)
    rois = jnp.asarray(boxes)
    ref = _sep(feats, rois)
    got = multilevel_roi_align_batched(
        feats, rois, SCALES, 7, 2, impl="windowed", interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
