"""Deformable PSRoI pooling vs a NumPy transcription of the CUDA kernel.

Oracle: scalar transcription of DeformablePSROIPoolForwardKernel
(deform_pool_kernel_cuda.cu:32-141) with the host's num_classes /
channels_each_class derivation (deform_pool_cuda.cu:288-290).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from veto_tpu.ops.deform_pool import (
    DeformRoIPoolingPack,
    ModulatedDeformRoIPoolingPack,
    deform_psroi_pool,
)


def _bilinear(data_hw, x, y, w, h):
    x1, x2 = int(np.floor(x)), int(np.ceil(x))
    y1, y2 = int(np.floor(y)), int(np.ceil(y))
    dx, dy = x - x1, y - y1
    return ((1 - dx) * (1 - dy) * data_hw[y1, x1]
            + (1 - dx) * dy * data_hw[y2, x1]
            + dx * (1 - dy) * data_hw[y1, x2]
            + dx * dy * data_hw[y2, x2])


def _ref_pool(data, rois, trans, scale, po, out_dim, g, ps, s, trans_std):
    """data (B,H,W,C) NHWC; rois (R,5); trans (R,2*nc,P,P) or None."""
    b, h, w, c = data.shape
    r = len(rois)
    no_trans = trans is None
    num_classes = 1 if no_trans else trans.shape[1] // 2
    channels_each = out_dim if no_trans else out_dim // num_classes
    out = np.zeros((r, po, po, out_dim), np.float64)
    cnt = np.zeros((r, po, po, out_dim), np.int64)
    for n in range(r):
        bi = int(rois[n, 0])
        sw = round(rois[n, 1]) * scale - 0.5
        sh = round(rois[n, 2]) * scale - 0.5
        ew = (round(rois[n, 3]) + 1.0) * scale - 0.5
        eh = (round(rois[n, 4]) + 1.0) * scale - 0.5
        rw = max(ew - sw, 0.1)
        rh = max(eh - sh, 0.1)
        bw, bh = rw / po, rh / po
        sub_w, sub_h = bw / s, bh / s
        for ctop in range(out_dim):
            cls = ctop // channels_each
            for ph in range(po):
                for pw_ in range(po):
                    part_h = int(np.floor(ph / po * ps))
                    part_w = int(np.floor(pw_ / po * ps))
                    tx = 0.0 if no_trans else trans[
                        n, 2 * cls, part_h, part_w] * trans_std
                    ty = 0.0 if no_trans else trans[
                        n, 2 * cls + 1, part_h, part_w] * trans_std
                    wstart = pw_ * bw + sw + tx * rw
                    hstart = ph * bh + sh + ty * rh
                    gw = min(max(int(np.floor(pw_ * g / po)), 0), g - 1)
                    gh = min(max(int(np.floor(ph * g / po)), 0), g - 1)
                    chan = (ctop * g + gh) * g + gw
                    ssum, k = 0.0, 0
                    for ih in range(s):
                        for iw in range(s):
                            x = wstart + iw * sub_w
                            y = hstart + ih * sub_h
                            if x < -0.5 or x > w - 0.5 or y < -0.5 or y > h - 0.5:
                                continue
                            x = min(max(x, 0.0), w - 1.0)
                            y = min(max(y, 0.0), h - 1.0)
                            ssum += _bilinear(data[bi, :, :, chan], x, y, w, h)
                            k += 1
                    out[n, ph, pw_, ctop] = 0.0 if k == 0 else ssum / k
                    cnt[n, ph, pw_, ctop] = k
    return out.astype(np.float32), cnt


@pytest.mark.parametrize("no_trans,g,out_dim,nc", [
    (True, 1, 4, 1), (False, 1, 4, 1), (False, 2, 8, 2), (False, 1, 6, 3),
])
def test_deform_psroi_pool_vs_cuda_transcription(no_trans, g, out_dim, nc):
    rng = np.random.RandomState(0)
    b, h, w = 2, 12, 14
    c = out_dim * g * g
    po, ps, s, scale, trans_std = 3, 3, 2, 0.5, 0.2
    data = rng.randn(b, h, w, c).astype(np.float32)
    rois = np.stack([
        rng.randint(0, b, 5).astype(np.float32),
        rng.uniform(0, w * 1.5, 5), rng.uniform(0, h * 1.5, 5),
        rng.uniform(8, w * 2.0, 5), rng.uniform(8, h * 2.0, 5),
    ], 1).astype(np.float32)
    rois[:, 3] = np.maximum(rois[:, 3], rois[:, 1] + 2)
    rois[:, 4] = np.maximum(rois[:, 4], rois[:, 2] + 2)
    trans = (None if no_trans
             else rng.randn(5, 2 * nc, ps, ps).astype(np.float32))

    ref, ref_cnt = _ref_pool(data, rois, trans, scale, po, out_dim, g, ps,
                             s, trans_std)
    got, got_cnt = deform_psroi_pool(
        jnp.asarray(data), jnp.asarray(rois),
        None if trans is None else jnp.asarray(trans), scale, po, out_dim,
        g, ps, s, trans_std)
    np.testing.assert_array_equal(np.asarray(got_cnt), ref_cnt)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_pack_modules():
    rng = np.random.RandomState(1)
    data = jnp.asarray(rng.randn(1, 10, 10, 8), jnp.float32)
    rois = jnp.asarray([[0, 1, 1, 7, 7], [0, 2, 3, 9, 8]], jnp.float32)
    for cls in (DeformRoIPoolingPack, ModulatedDeformRoIPoolingPack):
        m = cls(spatial_scale=1.0, out_size=3, out_channels=8,
                no_trans=False, group_size=1, sample_per_part=2,
                trans_std=0.1, deform_fc_channels=16)
        v = m.init(jax.random.PRNGKey(0), data, rois)
        y = m.apply(v, data, rois)
        assert y.shape == (2, 3, 3, 8)
        assert np.isfinite(np.asarray(y)).all()
        # zero-init offset layers ⇒ trans==0 ⇒ equals the no-trans pool
        # (for the plain pack; the modulated pack multiplies sigmoid(0)=0.5)
        base, _ = deform_psroi_pool(data, rois, None, 1.0, 3, 8, 1, None,
                                    2, 0.1)
        if cls is DeformRoIPoolingPack:
            np.testing.assert_allclose(np.asarray(y), np.asarray(base),
                                       rtol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(y),
                                       0.5 * np.asarray(base), rtol=1e-5)


def test_gradients_flow_through_trans():
    rng = np.random.RandomState(2)
    data = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    rois = jnp.asarray([[0, 1, 1, 6, 6]], jnp.float32)
    trans = jnp.asarray(rng.randn(1, 2, 3, 3) * 0.1, jnp.float32)

    def loss(d, t):
        out, _ = deform_psroi_pool(d, rois, t, 1.0, 3, 4, 1, None, 2, 0.3)
        return jnp.sum(out ** 2)

    gd, gt = jax.grad(loss, argnums=(0, 1))(data, trans)
    assert np.isfinite(np.asarray(gd)).all() and np.abs(gd).sum() > 0
    assert np.isfinite(np.asarray(gt)).all() and np.abs(gt).sum() > 0
