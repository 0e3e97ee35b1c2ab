"""ROIAlign vs a direct NumPy oracle implementing the reference CUDA
kernel's algorithm (csrc/cuda/ROIAlign_cuda.cu) exactly but slowly."""

import jax.numpy as jnp
import numpy as np

from veto_tpu.ops.roi_align import fpn_level_assignment, multilevel_roi_align, roi_align


def _oracle(feat_hwc, rois, scale, p, s):
    h, w, c = feat_hwc.shape

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y, x = max(y, 0.0), max(x, 0.0)
        yl, xl = int(np.floor(y)), int(np.floor(x))
        if yl >= h - 1:
            yl = yh = h - 1
            y = float(yl)
        else:
            yh = yl + 1
        if xl >= w - 1:
            xl = xh = w - 1
            x = float(xl)
        else:
            xh = xl + 1
        ly, lx = y - yl, x - xl
        hy, hx = 1 - ly, 1 - lx
        return (
            hy * hx * feat_hwc[yl, xl]
            + hy * lx * feat_hwc[yl, xh]
            + ly * hx * feat_hwc[yh, xl]
            + ly * lx * feat_hwc[yh, xh]
        )

    out = np.zeros((len(rois), p, p, c))
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * scale
        rw, rh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        bw, bh = rw / p, rh / p
        for py in range(p):
            for px in range(p):
                acc = np.zeros(c)
                for iy in range(s):
                    for ix in range(s):
                        yy = y1 + py * bh + (iy + 0.5) * bh / s
                        xx = x1 + px * bw + (ix + 0.5) * bw / s
                        acc += bilinear(yy, xx)
                out[r, py, px] = acc / (s * s)
    return out


def test_roi_align_matches_oracle(rng):
    feat = rng.randn(16, 24, 3).astype(np.float32)
    rois = np.array(
        [
            [0.0, 0.0, 40.0, 30.0],
            [8.0, 4.0, 60.0, 50.0],
            [5.0, 5.0, 5.0, 5.0],  # degenerate
            [70.0, 50.0, 95.0, 63.0],  # partially outside after scaling
        ],
        dtype=np.float32,
    )
    scale = 0.25
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), scale, 4, 2))
    want = _oracle(feat, rois, scale, 4, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_is_differentiable():
    import jax

    feat = jnp.ones((8, 8, 2))
    rois = jnp.array([[0.0, 0.0, 16.0, 16.0]])

    def f(x):
        return roi_align(x, rois, 0.5, 2, 2).sum()

    g = jax.grad(f)(feat)
    assert g.shape == feat.shape
    assert np.asarray(g).sum() > 0


def test_fpn_level_assignment():
    # FPN eq.1: sqrt(area)=224 -> level 4 -> index 2 (k_min=2)
    rois = jnp.array(
        [
            [0.0, 0.0, 223.0, 223.0],  # 224x224 -> lvl 4
            [0.0, 0.0, 31.0, 31.0],  # small -> clamped to lvl 2
            [0.0, 0.0, 1000.0, 1000.0],  # big -> clamped to lvl 5
        ]
    )
    np.testing.assert_array_equal(fpn_level_assignment(rois), [2, 0, 3])


def test_multilevel_select(rng):
    feats = [rng.randn(32 // (2**i), 32 // (2**i), 4).astype(np.float32) for i in range(4)]
    scales = (0.25, 0.125, 0.0625, 0.03125)
    rois = np.array([[0.0, 0.0, 31.0, 31.0], [0.0, 0.0, 900.0, 900.0]], np.float32)
    out = multilevel_roi_align([jnp.asarray(f) for f in feats], jnp.asarray(rois), scales, 4)
    # roi 0 assigned level 0, roi 1 level 3: outputs equal single-level pooling
    lvl0 = roi_align(jnp.asarray(feats[0]), jnp.asarray(rois[:1]), scales[0], 4)
    lvl3 = roi_align(jnp.asarray(feats[3]), jnp.asarray(rois[1:]), scales[3], 4)
    # the flattened-pyramid gather reassociates float ops vs single-level
    # pooling; equal within float32 noise
    np.testing.assert_allclose(out[0], lvl0[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[1], lvl3[0], rtol=1e-5, atol=1e-6)


def test_separable_matches_gather_formulation(rng):
    """The separable-matmul forward == the per-sample gather oracle on
    borderline rois: OOB (< -1 and > H), border-snapped, and degenerate
    (< 1px) boxes — the CUDA semantics corner cases."""
    from veto_tpu.ops.roi_align import _roi_align_gather

    feat = rng.randn(20, 28, 5).astype(np.float32)
    rois = np.array([
        [-40.0, -40.0, -20.0, -20.0],   # fully out of range → zeros
        [-6.0, -6.0, 10.0, 8.0],        # straddles the top-left border
        [20.0, 12.0, 60.0, 44.0],       # straddles the bottom-right border
        [5.0, 5.0, 5.2, 5.2],           # degenerate → 1px
        [2.0, 3.0, 26.0, 18.0],         # interior
    ], np.float32)
    a = roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0, 7, 2)
    b = _roi_align_gather(jnp.asarray(feat), jnp.asarray(rois), 1.0, 7, 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)
    assert np.abs(np.asarray(a[0])).max() == 0.0


def test_multilevel_separable_matches_gather(rng):
    from veto_tpu.ops.roi_align import _multilevel_roi_align_gather

    feats = [jnp.asarray(rng.randn(32 // 2**i, 40 // 2**i, 4).astype(np.float32))
             for i in range(4)]
    scales = (0.25, 0.125, 0.0625, 0.03125)
    rois = jnp.asarray(np.array([
        [4.0, 4.0, 60.0, 52.0],
        [0.0, 0.0, 500.0, 400.0],
        [10.0, 10.0, 11.0, 11.0],
        [-8.0, -4.0, 30.0, 20.0],
    ], np.float32))
    a = multilevel_roi_align(feats, rois, scales, 7, 2)
    b = _multilevel_roi_align_gather(feats, rois, scales, 7, 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_separable_backward_no_scatter(rng):
    """d feat of the separable form is itself two matmuls; check it equals
    the gather formulation's scatter-add gradient."""
    import jax

    from veto_tpu.ops.roi_align import _roi_align_gather

    feat = jnp.asarray(rng.randn(12, 16, 3).astype(np.float32))
    rois = jnp.asarray(np.array([[1.0, 2.0, 9.0, 8.0],
                                 [-3.0, 0.0, 20.0, 14.0]], np.float32))
    co = jnp.asarray(rng.randn(2, 7, 7, 3).astype(np.float32))
    ga = jax.grad(lambda f: (roi_align(f, rois, 1.0, 7, 2) * co).sum())(feat)
    gb = jax.grad(
        lambda f: (_roi_align_gather(f, rois, 1.0, 7, 2) * co).sum())(feat)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5,
                               atol=1e-5)


def test_separable_pool_chunked_equals_unchunked(rng):
    """R > _POOL_CHUNK runs the lax.map chunked path (added so the sgdet
    box head's 1000-proposal pooling stays HBM-bounded); results must be
    identical to the small-R path."""
    import veto_tpu.ops.roi_align as ra

    feat = rng.randn(20, 28, 5).astype(np.float32)
    r = ra._POOL_CHUNK + 37  # non-multiple → exercises the padding
    rois = np.stack([
        rng.uniform(0, 14, r), rng.uniform(0, 10, r),
        rng.uniform(14, 30, r), rng.uniform(10, 22, r),
    ], axis=1).astype(np.float32)
    chunked = roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0, 7, 2)
    ref = jnp.concatenate([
        roi_align(jnp.asarray(feat), jnp.asarray(rois[i : i + 50]), 1.0, 7, 2)
        for i in range(0, r, 50)
    ])
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
