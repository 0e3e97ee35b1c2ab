"""Deformable (position-sensitive) ROI pooling — DCN v1's DeformRoIPooling.

Re-design of the reference CUDA kernel
(/root/reference/pysgg/csrc/cuda/deform_pool_kernel_cuda.cu:32-141 +
deform_pool_cuda.cu:279-316) and its python wrappers
(pysgg/layers/dcn/deform_pool_module.py).

Like ops/deform_conv.py, the scalar CUDA loop becomes a dense vmapped
gather: per roi, a (Po, Po, S, S) grid of bilinear samples into the
position-sensitive channel of each output bin, masked by the kernel's
[-0.5, dim-0.5] in-bounds rule and averaged over the surviving count.
Gradients come from autodiff of this forward.

Exact semantics preserved:
* roi frame: ``round(x1)*scale - 0.5`` / ``(round(x2)+1)*scale - 0.5``,
  width/height floored at 0.1;
* per-class offset field: ``trans`` is (R, 2*num_classes, P, P); the
  lookup cell is ``floor(bin_idx / pooled * part_size)``; offsets scale
  by ``trans_std`` times roi extent;
* samples outside (-0.5, dim-0.5) are SKIPPED (not clamped to zero);
  in-bounds samples clamp into [0, dim-1] before the floor/ceil
  bilinear;
* the position-sensitive channel is ``(ctop*G + gh)*G + gw``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["deform_psroi_pool", "DeformRoIPoolingPack",
           "ModulatedDeformRoIPoolingPack"]


def deform_psroi_pool(
    data: jnp.ndarray,            # (B, H, W, C) NHWC feature map
    rois: jnp.ndarray,            # (R, 5) [batch_idx, x1, y1, x2, y2]
    trans: Optional[jnp.ndarray],  # (R, 2*num_classes, P, P) or None
    spatial_scale: float,
    out_size: int,
    output_dim: int,
    group_size: int = 1,
    part_size: Optional[int] = None,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (pooled (R, Po, Po, output_dim), count (R, Po, Po, output_dim))."""
    b, h, w, c = data.shape
    po = out_size
    ps = part_size or out_size
    s = sample_per_part
    g = group_size
    assert c >= output_dim * g * g, (c, output_dim, g)
    no_trans = trans is None
    if no_trans:
        num_classes = 1
        channels_each = output_dim
    else:
        num_classes = trans.shape[1] // 2
        channels_each = output_dim // num_classes

    ph = jnp.arange(po)
    pw = jnp.arange(po)
    ctop = jnp.arange(output_dim)

    # per-bin position-sensitive group cell (clamped)
    gh = jnp.clip(jnp.floor(ph * g / po).astype(jnp.int32), 0, g - 1)
    gw = jnp.clip(jnp.floor(pw * g / po).astype(jnp.int32), 0, g - 1)
    # per-bin offset-field cell
    part_h = jnp.floor(ph / po * ps).astype(jnp.int32)
    part_w = jnp.floor(pw / po * ps).astype(jnp.int32)
    class_id = (ctop // channels_each).astype(jnp.int32)

    def one_roi(roi, tr):
        batch_ind = roi[0].astype(jnp.int32)
        start_w = jnp.round(roi[1]) * spatial_scale - 0.5
        start_h = jnp.round(roi[2]) * spatial_scale - 0.5
        end_w = (jnp.round(roi[3]) + 1.0) * spatial_scale - 0.5
        end_h = (jnp.round(roi[4]) + 1.0) * spatial_scale - 0.5
        roi_w = jnp.maximum(end_w - start_w, 0.1)
        roi_h = jnp.maximum(end_h - start_h, 0.1)
        bin_w = roi_w / po
        bin_h = roi_h / po
        sub_w = bin_w / s
        sub_h = bin_h / s

        if no_trans:
            trans_x = jnp.zeros((po, po, output_dim))
            trans_y = jnp.zeros((po, po, output_dim))
        else:
            # tr: (2*num_classes, P, P); cell (part_h[ph], part_w[pw])
            tx = tr[2 * class_id[None, None, :],
                    part_h[:, None, None], part_w[None, :, None]]
            ty = tr[2 * class_id[None, None, :] + 1,
                    part_h[:, None, None], part_w[None, :, None]]
            trans_x = tx * trans_std
            trans_y = ty * trans_std

        # (Po, Po, D) sample window origins
        wstart = (pw[None, :, None] * bin_w + start_w
                  + trans_x * roi_w)
        hstart = (ph[:, None, None] * bin_h + start_h
                  + trans_y * roi_h)

        # (Po, Po, D, S, S) sample coordinates
        iw = jnp.arange(s)
        ih = jnp.arange(s)
        xs = wstart[..., None, None] + iw[None, None, None, None, :] * sub_w
        ys = hstart[..., None, None] + ih[None, None, None, :, None] * sub_h
        inside = ((xs > -0.5) & (xs < w - 0.5)
                  & (ys > -0.5) & (ys < h - 0.5))
        xc = jnp.clip(xs, 0.0, w - 1.0)
        yc = jnp.clip(ys, 0.0, h - 1.0)

        img = data[batch_ind].astype(jnp.float32)  # (H, W, C)
        # position-sensitive channel per (ph, pw, ctop)
        chan = ((ctop[None, None, :] * g + gh[:, None, None]) * g
                + gw[None, :, None])  # (Po, Po, D)
        chan5 = jnp.broadcast_to(chan[..., None, None], xs.shape)

        x1 = jnp.floor(xc)
        y1 = jnp.floor(yc)
        x2 = jnp.ceil(xc)
        y2 = jnp.ceil(yc)
        dx = xc - x1
        dy = yc - y1

        def pick(yy, xx):
            return img[yy.astype(jnp.int32), xx.astype(jnp.int32), chan5]

        val = ((1 - dx) * (1 - dy) * pick(y1, x1)
               + (1 - dx) * dy * pick(y2, x1)
               + dx * (1 - dy) * pick(y1, x2)
               + dx * dy * pick(y2, x2))
        val = jnp.where(inside, val, 0.0)
        cnt = inside.sum(axis=(-1, -2))
        out = val.sum(axis=(-1, -2)) / jnp.maximum(cnt, 1)
        out = jnp.where(cnt > 0, out, 0.0)
        return out, cnt  # (Po, Po, D)

    if no_trans:
        pooled, count = jax.vmap(lambda r: one_roi(r, None))(
            rois.astype(jnp.float32))
    else:
        pooled, count = jax.vmap(one_roi)(rois.astype(jnp.float32),
                                          trans.astype(jnp.float32))
    return pooled, count


class DeformRoIPoolingPack(nn.Module):
    """DeformRoIPoolingPack (deform_pool_module.py:36-87): a no-trans
    pooling pass feeds a 3-layer offset MLP (zero-init last layer) whose
    output deforms the second pooling pass."""

    spatial_scale: float
    out_size: int
    out_channels: int
    no_trans: bool = False
    group_size: int = 1
    part_size: Optional[int] = None
    sample_per_part: int = 4
    trans_std: float = 0.0
    deform_fc_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        assert data.shape[-1] >= self.out_channels
        base, _ = deform_psroi_pool(
            data, rois, None, self.spatial_scale, self.out_size,
            self.out_channels, self.group_size, self.part_size,
            self.sample_per_part, self.trans_std)
        if self.no_trans:
            return base.astype(self.dtype)
        n = rois.shape[0]
        x = base.reshape(n, -1)
        x = nn.relu(nn.Dense(self.deform_fc_channels, dtype=self.dtype,
                             name="offset_fc1")(x))
        x = nn.relu(nn.Dense(self.deform_fc_channels, dtype=self.dtype,
                             name="offset_fc2")(x))
        off = nn.Dense(self.out_size * self.out_size * 2,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, dtype=jnp.float32,
                       name="offset_fc3")(x)
        trans = off.reshape(n, 2, self.out_size, self.out_size)
        pooled, _ = deform_psroi_pool(
            data, rois, trans, self.spatial_scale, self.out_size,
            self.out_channels, self.group_size, self.part_size,
            self.sample_per_part, self.trans_std)
        return pooled.astype(self.dtype)


class ModulatedDeformRoIPoolingPack(nn.Module):
    """ModulatedDeformRoIPoolingPack (deform_pool_module.py:89-150): adds
    a sigmoid mask branch multiplied onto the deformed pooling."""

    spatial_scale: float
    out_size: int
    out_channels: int
    no_trans: bool = False
    group_size: int = 1
    part_size: Optional[int] = None
    sample_per_part: int = 4
    trans_std: float = 0.0
    deform_fc_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        base, _ = deform_psroi_pool(
            data, rois, None, self.spatial_scale, self.out_size,
            self.out_channels, self.group_size, self.part_size,
            self.sample_per_part, self.trans_std)
        if self.no_trans:
            return base.astype(self.dtype)
        n = rois.shape[0]
        x = base.reshape(n, -1)
        h1 = nn.relu(nn.Dense(self.deform_fc_channels, dtype=self.dtype,
                              name="offset_fc1")(x))
        h2 = nn.relu(nn.Dense(self.deform_fc_channels, dtype=self.dtype,
                              name="offset_fc2")(h1))
        off = nn.Dense(self.out_size * self.out_size * 2,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, dtype=jnp.float32,
                       name="offset_fc3")(h2)
        trans = off.reshape(n, 2, self.out_size, self.out_size)
        pooled, _ = deform_psroi_pool(
            data, rois, trans, self.spatial_scale, self.out_size,
            self.out_channels, self.group_size, self.part_size,
            self.sample_per_part, self.trans_std)
        m1 = nn.relu(nn.Dense(self.deform_fc_channels, dtype=self.dtype,
                              name="mask_fc1")(x))
        mask = jax.nn.sigmoid(nn.Dense(
            self.out_size * self.out_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=jnp.float32,
            name="mask_fc2")(m1))
        mask = mask.reshape(n, self.out_size, self.out_size, 1)
        return (pooled * mask).astype(self.dtype)
