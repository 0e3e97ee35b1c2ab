"""ROIAlign and the multi-level FPN pooler.

TPU re-design of the reference CUDA kernel (pysgg/csrc/cuda/ROIAlign_cuda.cu,
autograd wrapper pysgg/layers/roi_align.py) and of ``Pooler``
(pysgg/modeling/poolers.py:46-183).

Semantics replicated exactly (the original, non-half-pixel-aligned variant):
  * roi coords scaled by ``spatial_scale`` with no -0.5 offset
  * ``roi_w = max(x2 - x1, 1)`` — degenerate rois treated as 1px
  * each P×P bin averaged over ``sampling_ratio²`` bilinear samples
  * out-of-range samples contribute 0, with the CUDA kernel's asymmetric
    border rule (y < -1 → 0, else clamp to [0, H-1])

Implementation (round 3): bilinear interpolation is separable, so ROIAlign
factors into two dense matmuls — ``out[r,i,j] = Wy[r,i,:] @ feat @
Wx[r,j,:]^T`` where ``Wy (R,P,H)`` / ``Wx (R,P,W)`` hold each bin's
sample-averaged 2-tap bilinear rows (`relu(1-|y-h|)` of the
clamped/snapped coordinate, zeroed when out of range — the product of a
zero y-row or x-row reproduces the CUDA kernel's joint OOB rule).  The
MXU executes both contractions at roofline and the backward is the
transposed matmuls — no gather in the forward, no scatter-add in the
backward.  Measured on v5e at flagship shapes this is ~8-10x the
per-sample gather formulation the module used before (kept below as
``_roi_align_gather`` — it remains the parity oracle in tests).
Multi-level pooling runs the separable form per FPN level with rows
masked to each roi's assigned level and sums — identical to gathering
from the assigned level only (poolers.py:157-164), static shapes, and
still cheaper than one gather pass.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample feat (H, W, C) at flat coords y, x (...,) → (..., C).

    Matches ``bilinear_interpolate`` in ROIAlign_cuda.cu: samples with
    y < -1 or y > H (resp. x) return 0; coords are then clamped to >= 0 and
    the +1 neighbor is clamped to the last pixel.
    """
    h, w = feat.shape[0], feat.shape[1]
    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.minimum(jnp.floor(y), h - 1.0)
    x_low = jnp.minimum(jnp.floor(x), w - 1.0)
    y_high = jnp.minimum(y_low + 1.0, h - 1.0)
    x_high = jnp.minimum(x_low + 1.0, w - 1.0)
    # CUDA kernel: if low >= limit-1, coord snapped onto the pixel
    y = jnp.where(y_low >= h - 1.0, y_low, y)
    x = jnp.where(x_low >= w - 1.0, x_low, x)

    ly = y - y_low
    lx = x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx

    yl = y_low.astype(jnp.int32)
    xl = x_low.astype(jnp.int32)
    yh = y_high.astype(jnp.int32)
    xh = x_high.astype(jnp.int32)

    v1 = feat[yl, xl]
    v2 = feat[yl, xh]
    v3 = feat[yh, xl]
    v4 = feat[yh, xh]
    out = (
        (hy * hx)[..., None] * v1
        + (hy * lx)[..., None] * v2
        + (ly * hx)[..., None] * v3
        + (ly * lx)[..., None] * v4
    )
    return jnp.where(oob[..., None], 0.0, out)


def _sample_coords(rois, spatial_scale, p, s):
    """Per-bin sample coordinates along each axis: (R, p, s) ys and xs."""
    rois = rois.astype(jnp.float32)
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    bin_w = jnp.maximum(x2 - x1, 1.0) / p
    bin_h = jnp.maximum(y2 - y1, 1.0) / p
    # sample grid offsets within a bin: (iy + 0.5) / s for iy in [0, s)
    off = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s  # (s,)
    bins = jnp.arange(p, dtype=jnp.float32)  # (p,)
    ys = y1[:, None, None] + (bins[None, :, None] + off[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (bins[None, :, None] + off[None, None, :]) * bin_w[:, None, None]
    return ys, xs


def _bilinear_rows(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """Sample coords (R, p, s) → sample-averaged bilinear weight rows
    (R, p, size) with the CUDA kernel's border semantics: rows are zero
    when the coordinate is out of range (< -1 or > size), otherwise the
    clamped/snapped 2-tap bilinear weights ``relu(1 - |c - h|)``."""
    n = float(size)
    oob = (coords < -1.0) | (coords > n)
    c = jnp.clip(coords, 0.0, None)
    low = jnp.minimum(jnp.floor(c), n - 1.0)
    # CUDA kernel: if low >= size-1, coord snapped onto the last pixel
    c = jnp.where(low >= n - 1.0, low, c)
    grid = jnp.arange(size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - grid))
    w = jnp.where(oob[..., None], 0.0, w)
    return w.mean(axis=2)  # average the s samples of each bin


# rois per separable-pool chunk: bounds the (R, p, H, C) column-contraction
# temp.  At the sgdet box head (1000 proposals x P2's 200x336x256 map,
# batch 8) the unchunked temp OOMs the 16 GB chip; 256-roi chunks under
# the batch vmap keep it ~1.2 GB while every matmul stays MXU-sized.
_POOL_CHUNK = 256


def _separable_pool_chunk(feat: jnp.ndarray, wy: jnp.ndarray,
                          wx: jnp.ndarray) -> jnp.ndarray:
    # contract the W axis first: the FPN maps are wider than tall
    # (800x1344 -> 200x336 at P2), so the (r, p, H, C) temp carries
    # sum(H_l)=375 rows instead of sum(W_l)=630 columns — 1.7x less HBM
    # round-trip on the stage-2 operand (measured 135 -> 95 ms at the
    # sgdet box head's 8x1000-roi pooling).
    h, w, c = feat.shape
    r, p, _ = wy.shape
    cdt = feat.dtype if feat.dtype == jnp.bfloat16 else jnp.float32
    # store the stage-1 temp in the contraction dtype: stage 2 casts it to
    # cdt anyway, so rounding is identical, and for bf16 feature maps this
    # halves the largest HBM round-trip of the whole pooler (the (R,p,H,C)
    # temp is ~367 MB/256-roi chunk at P2 in f32).  Accumulation stays f32
    # inside the matmul (preferred_element_type) — only the output buffer
    # narrows.
    t = jax.lax.dot_general(
        wx.reshape(r * p, w).astype(cdt),
        jnp.swapaxes(feat, 0, 1).reshape(w, h * c).astype(cdt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(cdt).reshape(r, p, h, c)
    out = jnp.swapaxes(
        jnp.einsum("rih,rjhc->rjic", wy.astype(cdt), t.astype(cdt),
                   preferred_element_type=jnp.float32), 1, 2)
    return out


def _separable_pool(feat: jnp.ndarray, wy: jnp.ndarray,
                    wx: jnp.ndarray) -> jnp.ndarray:
    """out[r,i,j,:] = wy[r,i,:] @ feat @ wx[r,j,:]^T — two MXU matmuls.

    feat (H, W, C); wy (R, p, H); wx (R, p, W) → (R, p, p, C) f32.
    bf16 feature maps contract in bf16 with f32 accumulation (matching the
    gather formulation's f32-weight × bf16-value products to ~1 ulp).
    Large roi counts run in _POOL_CHUNK chunks via lax.map (scan under a
    batch vmap) so the row-contraction temp stays bounded.
    """
    r, p, _ = wy.shape
    if r <= _POOL_CHUNK:
        return _separable_pool_chunk(feat, wy, wx)
    pad = (-r) % _POOL_CHUNK
    k = (r + pad) // _POOL_CHUNK
    wy_p = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))
    wx_p = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))
    out = jax.lax.map(
        lambda ws: _separable_pool_chunk(feat, ws[0], ws[1]),
        (wy_p.reshape(k, _POOL_CHUNK, p, -1),
         wx_p.reshape(k, _POOL_CHUNK, p, -1)),
    )
    return out.reshape(k * _POOL_CHUNK, p, p, -1)[:r]


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign one feature map (separable-matmul formulation).

    Args:
      features: (H, W, C) single image feature map (NHWC batch handled by
        vmap at the call site).
      rois: (R, 4) xyxy boxes in image coordinates.
      spatial_scale: multiplier mapping image coords to feature coords.
      output_size: P — pooled bins per side.
      sampling_ratio: s — bilinear samples per bin side (s=0 adaptive is not
        supported; the shipped configs use 2).

    Returns:
      (R, P, P, C) pooled features.
    """
    if sampling_ratio <= 0:
        raise ValueError("adaptive sampling_ratio not supported; configs use 2")
    p, s = output_size, sampling_ratio
    ys, xs = _sample_coords(rois, spatial_scale, p, s)
    wy = _bilinear_rows(ys, features.shape[0])
    wx = _bilinear_rows(xs, features.shape[1])
    return _separable_pool(features, wy, wx)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def _roi_align_gather(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Per-sample gather formulation — the parity oracle for tests."""
    if sampling_ratio <= 0:
        raise ValueError("adaptive sampling_ratio not supported; configs use 2")
    p, s = output_size, sampling_ratio
    ys, xs = _sample_coords(rois, spatial_scale, p, s)
    # full grid: (R, p, s, p, s)
    yy = jnp.broadcast_to(ys[:, :, :, None, None], ys.shape + (p, s))
    xx = jnp.broadcast_to(xs[:, None, None, :, :], (xs.shape[0], p, s, p, s))
    vals = _bilinear_gather(features, yy, xx)  # (R, p, s, p, s, C)
    return jnp.mean(vals, axis=(2, 4))  # (R, p, p, C)


def fpn_level_assignment(
    rois: jnp.ndarray,
    k_min: int = 2,
    k_max: int = 5,
    canonical_scale: int = 224,
    canonical_level: int = 4,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """FPN eq.1 level mapper (poolers.py LevelMapper:12-43).

    Returns 0-based level indices in [0, k_max - k_min].
    """
    from .box_ops import box_area

    s = jnp.sqrt(box_area(rois))
    target = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + eps))
    target = jnp.clip(target, k_min, k_max)
    return (target - k_min).astype(jnp.int32)


def _bilinear_gather_flat(
    flat: jnp.ndarray,  # (sum_l H_l*W_l, C) concatenated pyramid
    y: jnp.ndarray,     # (...,) per-sample level coords
    x: jnp.ndarray,
    h: jnp.ndarray,     # (...,) per-sample level height/width/offset
    w: jnp.ndarray,
    off: jnp.ndarray,
) -> jnp.ndarray:
    """Bilinear sample from a flattened FPN pyramid (same border semantics
    as :func:`_bilinear_gather`, with per-sample H/W bounds)."""
    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.minimum(jnp.floor(y), h - 1.0)
    x_low = jnp.minimum(jnp.floor(x), w - 1.0)
    y_high = jnp.minimum(y_low + 1.0, h - 1.0)
    x_high = jnp.minimum(x_low + 1.0, w - 1.0)
    y = jnp.where(y_low >= h - 1.0, y_low, y)
    x = jnp.where(x_low >= w - 1.0, x_low, x)

    ly = y - y_low
    lx = x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx

    wi = w.astype(jnp.int32)
    base = off.astype(jnp.int32)
    yl = y_low.astype(jnp.int32)
    xl = x_low.astype(jnp.int32)
    yh = y_high.astype(jnp.int32)
    xh = x_high.astype(jnp.int32)

    v1 = flat[base + yl * wi + xl]
    v2 = flat[base + yl * wi + xh]
    v3 = flat[base + yh * wi + xl]
    v4 = flat[base + yh * wi + xh]
    out = (
        (hy * hx)[..., None] * v1
        + (hy * lx)[..., None] * v2
        + (ly * hx)[..., None] * v3
        + (ly * lx)[..., None] * v4
    )
    return jnp.where(oob[..., None], 0.0, out)


def multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    scales: Tuple[float, ...],
    output_size: int,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Pool each roi from its assigned FPN level.

    Separable-matmul pooling run per level with each roi's y-weight rows
    masked to its assigned level, summed over levels — identical to
    gathering from the assigned level only (poolers.py:157-164), with
    static shapes and every contraction on the MXU.

    Args:
      features: list of (H_l, W_l, C) maps, finest first (P2..P5).
      rois: (R, 4) xyxy in image coordinates.
      scales: per-level spatial scales, e.g. (1/4, 1/8, 1/16, 1/32).

    Returns: (R, P, P, C).
    """
    if sampling_ratio <= 0:
        raise ValueError("adaptive sampling_ratio not supported; configs use 2")
    p, s = output_size, sampling_ratio
    levels = fpn_level_assignment(rois)  # (R,)
    out = None
    for lvl, (feat, scale) in enumerate(zip(features, scales)):
        ys, xs = _sample_coords(rois, scale, p, s)
        sel = (levels == lvl).astype(jnp.float32)
        wy = _bilinear_rows(ys, feat.shape[0]) * sel[:, None, None]
        wx = _bilinear_rows(xs, feat.shape[1])
        pooled = _separable_pool(feat, wy, wx)
        out = pooled if out is None else out + pooled
    return out


def _multilevel_roi_align_gather(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    scales: Tuple[float, ...],
    output_size: int,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Flattened-pyramid single-gather formulation — the parity oracle for
    tests (each roi gathers from its assigned level via a per-roi offset).
    """
    if sampling_ratio <= 0:
        raise ValueError("adaptive sampling_ratio not supported; configs use 2")
    levels = fpn_level_assignment(rois)  # (R,)
    shapes = [(int(f.shape[0]), int(f.shape[1])) for f in features]
    c = features[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)
    offsets = [0]
    for hh, ww in shapes[:-1]:
        offsets.append(offsets[-1] + hh * ww)

    scale_r = jnp.asarray(scales, jnp.float32)[levels]
    h_r = jnp.asarray([s[0] for s in shapes], jnp.float32)[levels]
    w_r = jnp.asarray([s[1] for s in shapes], jnp.float32)[levels]
    off_r = jnp.asarray(offsets, jnp.int32)[levels]

    p, s = output_size, sampling_ratio
    rois = rois.astype(jnp.float32)
    x1 = rois[:, 0] * scale_r
    y1 = rois[:, 1] * scale_r
    x2 = rois[:, 2] * scale_r
    y2 = rois[:, 3] * scale_r
    bin_w = jnp.maximum(x2 - x1, 1.0) / p
    bin_h = jnp.maximum(y2 - y1, 1.0) / p

    off = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    bins = jnp.arange(p, dtype=jnp.float32)
    ys = y1[:, None, None] + (bins[None, :, None] + off[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (bins[None, :, None] + off[None, None, :]) * bin_w[:, None, None]
    yy = jnp.broadcast_to(ys[:, :, :, None, None], ys.shape + (p, s))
    xx = jnp.broadcast_to(xs[:, None, None, :, :], (xs.shape[0], p, s, p, s))

    bc = (slice(None),) + (None,) * 4  # (R,) → (R,1,1,1,1)
    vals = _bilinear_gather_flat(
        flat, yy, xx, h_r[bc], w_r[bc], off_r[bc]
    )  # (R, p, s, p, s, C)
    return jnp.mean(vals, axis=(2, 4))
