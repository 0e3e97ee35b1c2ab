"""Deformable convolution v1/v2 (DCN), TPU-native.

Re-design of the reference CUDA kernels
(/root/reference/pysgg/csrc/cuda/deform_conv_kernel_cuda.cu:92-283 v1,
:475-795 modulated v2) and their python wrappers
(pysgg/layers/dcn/deform_conv_module.py, pysgg/layers/misc.py DFConv2d).

Design: instead of translating the scalar im2col CUDA loop, the sampling
becomes one dense gather-based bilinear interpolation over the whole
output grid — (B, Ho, Wo, K) sample coordinates per deformable group —
followed by a single einsum contraction of the sampled columns against
the kernel (the MXU does the FLOPs; the gathers vectorize on the VPU).
Gradients come from jax.grad through the gather/einsum — no hand-written
col2im is needed, autodiff of this forward IS the reference backward.

Exact reference semantics preserved:
* offset channel layout per deformable group: ``2*(i*kw+j)`` = Δh,
  ``2*(i*kw+j)+1`` = Δw (kernel_cuda.cu:229-232);
* a sample contributes only when ``h > -1 and w > -1 and h < H and
  w < W`` (:236, :625), with per-corner zeroing inside the bilinear
  (:92-122) — NOT edge clamping;
* v2 multiplies the sampled value by the mask (sigmoid'd by DFConv2d);
* conv ``groups`` split the channel contraction; ``deformable_groups``
  split the offset fields over input channels.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["deform_conv2d", "DeformConv", "ModulatedDeformConv", "DFConv2d"]


def _bilinear_cuda(img: jnp.ndarray, h: jnp.ndarray,
                   w: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with the CUDA kernel's exact corner rules.

    img: (H, W, C); h, w: (...,) float sample positions.
    Returns (..., C).  Each of the four corners contributes only when it
    lies inside the image (deformable_im2col_bilinear, :92-122); the
    overall out-of-bounds test (> -1, < dim) is applied by the caller.
    """
    hh, ww = img.shape[:2]
    h_low = jnp.floor(h)
    w_low = jnp.floor(w)
    lh = h - h_low
    lw = w - w_low
    h_low_i = h_low.astype(jnp.int32)
    w_low_i = w_low.astype(jnp.int32)

    def corner(dy, dx):
        yi = h_low_i + dy
        xi = w_low_i + dx
        valid = (yi >= 0) & (yi <= hh - 1) & (xi >= 0) & (xi <= ww - 1)
        v = img[jnp.clip(yi, 0, hh - 1), jnp.clip(xi, 0, ww - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    w1 = ((1 - lh) * (1 - lw))[..., None]
    w2 = ((1 - lh) * lw)[..., None]
    w3 = (lh * (1 - lw))[..., None]
    w4 = (lh * lw)[..., None]
    return (w1 * corner(0, 0) + w2 * corner(0, 1)
            + w3 * corner(1, 0) + w4 * corner(1, 1))


def deform_conv2d(
    x: jnp.ndarray,                       # (B, H, W, Cin)
    offsets: jnp.ndarray,                 # (B, Ho, Wo, DG*2*kh*kw)
    weight: jnp.ndarray,                  # (kh, kw, Cin // groups, Cout)
    mask: Optional[jnp.ndarray] = None,   # (B, Ho, Wo, DG*kh*kw) — v2
    bias: Optional[jnp.ndarray] = None,   # (Cout,)
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (1, 1),
    dilation: Tuple[int, int] = (1, 1),
    groups: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """Deformable conv forward (v1 when mask is None, v2 otherwise)."""
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    assert cin_g * groups == cin, (weight.shape, cin, groups)
    k = kh * kw
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    ho = (h + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    wo = (w + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    dg = deformable_groups
    cpg = cin // dg  # channels per deformable group

    # base sampling grid: (Ho, Wo, K)
    hc = jnp.arange(ho) * sh - ph
    wc = jnp.arange(wo) * sw - pw
    ii, jj = jnp.meshgrid(jnp.arange(kh), jnp.arange(kw), indexing="ij")
    base_h = hc[:, None, None] + (ii.reshape(-1) * dh)[None, None, :]
    base_w = wc[None, :, None] + (jj.reshape(-1) * dw)[None, None, :]

    def per_image(xi, offi, mi):
        # offi: (Ho, Wo, DG, K, 2) — channel 2t is Δh, 2t+1 is Δw
        offi = offi.reshape(ho, wo, dg, k, 2).astype(jnp.float32)
        cols = []
        for g in range(dg):
            hs = base_h + offi[:, :, g, :, 0]       # (Ho, Wo, K)
            ws = base_w + offi[:, :, g, :, 1]
            inside = (hs > -1) & (ws > -1) & (hs < h) & (ws < w)
            v = _bilinear_cuda(
                xi[:, :, g * cpg:(g + 1) * cpg].astype(jnp.float32), hs, ws)
            v = jnp.where(inside[..., None], v, 0.0)   # (Ho, Wo, K, cpg)
            if mi is not None:
                mg = mi.reshape(ho, wo, dg, k)[:, :, g, :]
                v = v * mg[..., None].astype(jnp.float32)
            cols.append(v)
        return jnp.concatenate(cols, axis=-1)          # (Ho, Wo, K, Cin)

    if mask is None:
        cols = jax.vmap(lambda xi, offi: per_image(xi, offi, None))(
            x, offsets)
    else:
        cols = jax.vmap(per_image)(x, offsets, mask)

    # kernel contraction per conv group: cols (B,Ho,Wo,K,Cin) x
    # weight (kh*kw, Cin/g, Cout/g per group)
    wk = weight.reshape(k, cin_g, cout)
    if groups == 1:
        out = jnp.einsum("bhwkc,kco->bhwo", cols,
                         wk.astype(jnp.float32))
    else:
        cout_g = cout // groups
        outs = []
        for g in range(groups):
            outs.append(jnp.einsum(
                "bhwkc,kco->bhwo",
                cols[..., g * cin_g:(g + 1) * cin_g],
                wk[:, :, g * cout_g:(g + 1) * cout_g].astype(jnp.float32)))
        out = jnp.concatenate(outs, axis=-1)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


class DeformConv(nn.Module):
    """DCN v1 layer (reference dcn/deform_conv_module.py DeformConv):
    caller supplies the offset field."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    deformable_groups: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        weight = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (kh, kw, cin // self.groups, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return deform_conv2d(
            x, offsets, weight, None, bias, self.stride, self.padding,
            self.dilation, self.groups, self.deformable_groups,
        ).astype(self.dtype)


class ModulatedDeformConv(nn.Module):
    """DCN v2 layer (ModulatedDeformConv): offsets + sigmoid mask."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    deformable_groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, offsets: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        weight = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (kh, kw, cin // self.groups, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return deform_conv2d(
            x, offsets, weight, mask, bias, self.stride, self.padding,
            self.dilation, self.groups, self.deformable_groups,
        ).astype(self.dtype)


class DFConv2d(nn.Module):
    """The reference's drop-in deformable conv block (misc.py:114-199):
    an internal offset(+mask) conv feeding DCN v1/v2.  v2 splits the
    offset conv's output into 2K offset channels and K sigmoid'd mask
    channels per deformable group."""

    features: int
    with_modulated_dcn: bool = True
    kernel_size: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    deformable_groups: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        k = kh * kw
        padding = (self.dilation[0] * (kh - 1) // 2,
                   self.dilation[1] * (kw - 1) // 2)
        per_group = k * (3 if self.with_modulated_dcn else 2)
        off = nn.Conv(
            self.deformable_groups * per_group, self.kernel_size,
            strides=self.stride, padding=padding,
            kernel_dilation=self.dilation, dtype=jnp.float32,
            # kaiming_uniform_(a=1): gain 1 ⇒ U(±sqrt(3/fan_in))
            kernel_init=nn.initializers.variance_scaling(
                1.0, "fan_in", "uniform"),
            bias_init=nn.initializers.zeros, name="offset",
        )(x.astype(jnp.float32))
        if self.with_modulated_dcn:
            dg, kk = self.deformable_groups, k
            om = off.reshape(off.shape[:-1] + (dg, 3 * kk))
            offsets = om[..., : 2 * kk].reshape(off.shape[:-1] + (dg * 2 * kk,))
            mask = jax.nn.sigmoid(
                om[..., 2 * kk:].reshape(off.shape[:-1] + (dg * kk,)))
            return ModulatedDeformConv(
                features=self.features, kernel_size=self.kernel_size,
                stride=self.stride, padding=padding, dilation=self.dilation,
                groups=self.groups, deformable_groups=self.deformable_groups,
                use_bias=self.use_bias, dtype=self.dtype, name="conv",
            )(x, offsets, mask)
        return DeformConv(
            features=self.features, kernel_size=self.kernel_size,
            stride=self.stride, padding=padding, dilation=self.dilation,
            groups=self.groups, deformable_groups=self.deformable_groups,
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x, off)
