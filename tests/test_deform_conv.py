"""Deformable conv v1/v2 vs a NumPy transcription of the reference CUDA.

The reference DCN has no CPU kernel (csrc/cuda/deform_conv_kernel_cuda.cu
is CUDA-only and torchvision is unavailable), so — like
test_roi_pool.py — the oracle is a direct scalar transcription of the
CUDA im2col loops (:198-248 v1, :580-640 v2) plus the standard GEMM.
Also checked: zero offsets + all-ones mask degrade exactly to a plain
convolution, and gradients flow to input/offsets/weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from veto_tpu.ops.deform_conv import (
    DFConv2d,
    deform_conv2d,
)


def _bilinear_ref(img, h, w):
    """deformable_im2col_bilinear / dmcn_im2col_bilinear (:92-122)."""
    hh, ww = img.shape
    h_low, w_low = int(np.floor(h)), int(np.floor(w))
    h_high, w_high = h_low + 1, w_low + 1
    lh, lw = h - h_low, w - w_low
    hh_, hw_ = 1 - lh, 1 - lw
    v1 = img[h_low, w_low] if h_low >= 0 and w_low >= 0 else 0.0
    v2 = img[h_low, w_high] if h_low >= 0 and w_high <= ww - 1 else 0.0
    v3 = img[h_high, w_low] if h_high <= hh - 1 and w_low >= 0 else 0.0
    v4 = img[h_high, w_high] if h_high <= hh - 1 and w_high <= ww - 1 else 0.0
    return hh_ * hw_ * v1 + hh_ * lw * v2 + lh * hw_ * v3 + lh * lw * v4


def _deform_conv_ref(x, offsets, weight, mask, stride, pad, dilation,
                     groups, dg):
    """Scalar transcription of the CUDA im2col (+ mask) + GEMM.

    x (B,H,W,Cin) NHWC, offsets (B,Ho,Wo,DG*2*K), weight (kh,kw,Cin/g,Cout),
    mask (B,Ho,Wo,DG*K) or None.
    """
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    sh, sw = stride
    ph, pw = pad
    dh, dw = dilation
    ho = (h + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    wo = (w + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    k = kh * kw
    cpg = cin // dg
    cout_g = cout // groups
    out = np.zeros((b, ho, wo, cout), np.float64)
    for bi in range(b):
        for hc in range(ho):
            for wc in range(wo):
                h_in = hc * sh - ph
                w_in = wc * sw - pw
                cols = np.zeros((k, cin), np.float64)
                for i in range(kh):
                    for j in range(kw):
                        t = i * kw + j
                        for g in range(dg):
                            off_h = offsets[bi, hc, wc, g * 2 * k + 2 * t]
                            off_w = offsets[bi, hc, wc, g * 2 * k + 2 * t + 1]
                            h_im = h_in + i * dh + off_h
                            w_im = w_in + j * dw + off_w
                            if h_im > -1 and w_im > -1 and h_im < h and w_im < w:
                                for c in range(g * cpg, (g + 1) * cpg):
                                    cols[t, c] = _bilinear_ref(
                                        x[bi, :, :, c], h_im, w_im)
                            if mask is not None:
                                cols[t, g * cpg:(g + 1) * cpg] *= mask[
                                    bi, hc, wc, g * k + t]
                for g in range(groups):
                    wg = weight[:, :, :, g * cout_g:(g + 1) * cout_g].reshape(
                        k, cin_g, cout_g)
                    cg = cols[:, g * cin_g:(g + 1) * cin_g]
                    out[bi, hc, wc, g * cout_g:(g + 1) * cout_g] = np.einsum(
                        "kc,kco->o", cg, wg)
    return out.astype(np.float32)


@pytest.mark.parametrize(
    "groups,dg,stride,dilation,modulated",
    [(1, 1, (1, 1), (1, 1), False),
     (1, 2, (2, 2), (1, 1), False),
     (1, 1, (1, 1), (2, 2), True),
     (2, 1, (1, 1), (1, 1), True),
     (2, 2, (2, 1), (1, 2), True)],
)
def test_deform_conv_vs_cuda_transcription(groups, dg, stride, dilation,
                                           modulated):
    rng = np.random.RandomState(0)
    b, h, w, cin, cout, kh, kw = 2, 9, 11, 4, 6, 3, 3
    pad = (dilation[0] * (kh - 1) // 2, dilation[1] * (kw - 1) // 2)
    ho = (h + 2 * pad[0] - (dilation[0] * (kh - 1) + 1)) // stride[0] + 1
    wo = (w + 2 * pad[1] - (dilation[1] * (kw - 1) + 1)) // stride[1] + 1
    k = kh * kw
    x = rng.randn(b, h, w, cin).astype(np.float32)
    offsets = (rng.randn(b, ho, wo, dg * 2 * k) * 2).astype(np.float32)
    weight = rng.randn(kh, kw, cin // groups, cout).astype(np.float32)
    mask = (rng.rand(b, ho, wo, dg * k).astype(np.float32)
            if modulated else None)

    ref = _deform_conv_ref(x, offsets, weight, mask, stride, pad, dilation,
                           groups, dg)
    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
        None if mask is None else jnp.asarray(mask), None, stride, pad,
        dilation, groups, dg))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_zero_offset_equals_plain_conv():
    """Δ=0 offsets + mask=1 must reproduce a standard convolution."""
    rng = np.random.RandomState(1)
    b, h, w, cin, cout = 2, 8, 8, 3, 5
    x = rng.randn(b, h, w, cin).astype(np.float32)
    weight = rng.randn(3, 3, cin, cout).astype(np.float32)
    offsets = jnp.zeros((b, h, w, 18))
    mask = jnp.ones((b, h, w, 9))
    got = np.asarray(deform_conv2d(
        jnp.asarray(x), offsets, jnp.asarray(weight), mask))
    want = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gradients_flow():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    offsets = jnp.asarray(rng.randn(1, 6, 6, 18).astype(np.float32) * 0.5)
    weight = jnp.asarray(rng.randn(3, 3, 2, 4).astype(np.float32))

    def loss(x, offsets, weight):
        return jnp.sum(deform_conv2d(x, offsets, weight) ** 2)

    gx, go, gw = jax.grad(loss, argnums=(0, 1, 2))(x, offsets, weight)
    for g in (gx, go, gw):
        a = np.asarray(g)
        assert np.isfinite(a).all() and np.abs(a).sum() > 0


def test_dfconv2d_module():
    """The drop-in block: init + forward for both DCN versions."""
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 8, 8, 4),
                    jnp.float32)
    for modulated in (True, False):
        m = DFConv2d(features=6, with_modulated_dcn=modulated,
                     deformable_groups=2)
        v = m.init(rng, x)
        y = m.apply(v, x)
        assert y.shape == (2, 8, 8, 6)
        assert np.isfinite(np.asarray(y)).all()
        # zero offset-conv params ⇒ offsets 0, mask sigmoid(0)=0.5:
        # v2 output must equal 0.5x the plain conv of the same weights
        if modulated:
            w = v["params"]["conv"]["kernel"]
            plain = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            zeroed = jax.tree.map(jnp.zeros_like, v["params"]["offset"])
            v2 = {"params": {**v["params"], "offset": zeroed}}
            y2 = m.apply(v2, x)
            np.testing.assert_allclose(np.asarray(y2),
                                       0.5 * np.asarray(plain),
                                       rtol=1e-4, atol=1e-4)


def test_resnet_stage_with_dcn():
    """STAGE_WITH_DCN wiring: a DCN-enabled stage builds DFConv2d conv2
    params (offset conv present) and the body still emits C2..C5."""
    from veto_tpu.models.backbone.resnet import ResNetBody

    body = ResNetBody(stage_blocks=(1, 1, 1, 1), groups=1,
                      width_per_group=8,
                      stage_with_dcn=(False, True, True, False),
                      dcn_deformable_groups=2, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = body.init(jax.random.PRNGKey(0), x)
    p = v["params"]
    assert "offset" in p["layer2_block0"]["conv2"]
    assert "offset" in p["layer3_block0"]["conv2"]
    assert "offset" not in p.get("layer1_block0", {}).get("conv2", {})
    outs = body.apply(v, x)
    assert len(outs) == 4
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
