"""Windowed Pallas multi-level ROIAlign.

The separable-matmul pooler (roi_align.py) contracts every roi against the
FULL width/height of every FPN level — exact, MXU-resident, but ~5 TFLOP of
mostly-wasted work per sgdet step (each roi's bilinear taps touch only a
~28x28 patch of its assigned level).  This module pools each roi from an
explicitly DMA'd window of its assigned level instead:

  * per roi, a fixed (win_h, win_w) window of the assigned level is copied
    HBM -> VMEM with a dynamic-start async copy, double-buffered across the
    grid so the next group's windows stream in while the current group is
    pooled; several rois share one grid step (rois_per_step) to amortize
    per-step overhead;
  * pooling inside the window is the same separable form — two small MXU
    matmuls against the roi's bilinear weight rows, expressed relative to
    the window origin — so results match the full-map separable pooler to
    accumulation order;
  * rois whose bilinear tap span exceeds the window (possible only for
    extreme aspect ratios — FPN level assignment, poolers.py LevelMapper,
    bounds each roi's on-map AREA below ~28^2 but not its extent) fall back
    to the exact full-map separable pooler on a fixed per-image budget of
    compacted rois.  Beyond-budget misfits degrade to cropped-window
    pooling rather than failing.

Semantics: identical to roi_align.multilevel_roi_align, which replicates the
reference CUDA kernel (pysgg/csrc/cuda/ROIAlign_cuda.cu) + FPN Pooler
(pysgg/modeling/poolers.py:46-183).

Gradients: the public entry carries a custom VJP whose backward runs the
transposed full-map separable pooler — the gradient of a numerically-equal
forward.  Only detector pretraining differentiates through pooling (relation
training freezes the detector, models/sgg.py:298); it pays one extra
separable forward inside the VJP.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import (
    fpn_level_assignment,
    multilevel_roi_align,
)

# Window footprint on the assigned level, in feature pixels.  FPN level
# assignment keeps each roi's on-map area < ~28^2, so 32 rows bounds all but
# extreme-tall rois and 64 columns (minus up to 7 of alignment slack) covers
# aspect ratios to ~1:4; P5 maps (<= 25x42 at the flagship 800x1344 input)
# fit entirely.  Misfits take the exact fallback.
WIN_H = 32
WIN_W = 64
# rois pooled per grid step — amortizes per-step grid/DMA-issue overhead
# (measured ~4 us/step at 1 roi/step vs ~1.3 us of pure window DMA).
ROIS_PER_STEP = 4


def _flat_sample_coords(rois: jnp.ndarray, scale_r: jnp.ndarray, p: int, s: int):
    """Per-bin sample coordinates with a PER-ROI spatial scale.

    rois (N, 4) xyxy image coords, scale_r (N,) -> ys, xs (N, p, s)."""
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
    return ys, xs


def _window_rows(coords: jnp.ndarray, size_r: jnp.ndarray, start: jnp.ndarray,
                 win: int) -> jnp.ndarray:
    """Bilinear weight rows relative to a window origin.

    coords (N, p, s) sample coords on each roi's assigned level, size_r (N,)
    the level's TRUE height/width, start (N,) the window origin.  Returns
    (N, p, win) sample-averaged 2-tap rows — the window slice of
    roi_align._bilinear_rows, with identical CUDA border semantics.
    """
    n = size_r.astype(jnp.float32)[:, None, None]
    oob = (coords < -1.0) | (coords > n)
    c = jnp.clip(coords, 0.0, None)
    low = jnp.minimum(jnp.floor(c), n - 1.0)
    c = jnp.where(low >= n - 1.0, low, c)
    grid = start.astype(jnp.float32)[:, None, None, None] + jnp.arange(
        win, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - grid))
    w = jnp.where(oob[..., None], 0.0, w)
    return w.mean(axis=2)  # (N, p, win)


def _tap_bounds(coords: jnp.ndarray, size_r: jnp.ndarray):
    """Lowest / highest feature row any bilinear tap of the roi touches.

    Matches the clamp rules of _window_rows: taps live at floor(clip(c,0))
    and +1, both clamped to [0, size-1].  (N, p, s) coords -> lo, hi (N,)."""
    n = size_r.astype(jnp.float32)[:, None, None]
    c = jnp.clip(coords, 0.0, None)
    low = jnp.minimum(jnp.floor(c), n - 1.0)
    high = jnp.minimum(low + 1.0, n - 1.0)
    return (low.min(axis=(1, 2)).astype(jnp.int32),
            high.max(axis=(1, 2)).astype(jnp.int32))


def _pool_kernel_factory(num_levels: int, p: int, c: int, cdt,
                         wh: int, ww: int, rps: int):
    """Kernel: rps rois per grid step, double-buffered window DMA."""

    def kernel(y0_ref, x8_ref, lvl_ref, img_ref, *rest):
        feat_refs = rest[:num_levels]
        wy_ref, wx_ref, out_ref, win, sem = rest[num_levels:]
        g = pl.program_id(0)
        ng = pl.num_programs(0)

        def start(step, slot):
            for j in range(rps):
                i = step * rps + j
                # one static branch per level; only the roi's own level
                # fires.  x start arrives pre-divided by 8 and re-multiplied
                # so Mosaic can PROVE the sublane-axis slice start is
                # 8-aligned (a raw dynamic value fails its divisibility
                # check).
                for l, fr in enumerate(feat_refs):
                    @pl.when(lvl_ref[i] == l)
                    def _(fr=fr, i=i, j=j):
                        pltpu.make_async_copy(
                            fr.at[img_ref[i], pl.ds(y0_ref[i], wh),
                                  pl.ds(x8_ref[i] * 8, ww), :],
                            win.at[slot, j], sem.at[slot, j]).start()

        def wait(slot, j):
            # dst shape/bytes are level-independent, so the wait needs no
            # level branch — any same-shaped descriptor drains the semaphore
            pltpu.make_async_copy(
                feat_refs[0].at[0, pl.ds(0, wh), pl.ds(0, ww), :],
                win.at[slot, j], sem.at[slot, j]).wait()

        slot = jax.lax.rem(g, 2)

        @pl.when(g == 0)
        def _():
            start(0, 0)

        @pl.when(g + 1 < ng)
        def _():
            start(g + 1, jax.lax.rem(g + 1, 2))

        for j in range(rps):
            wait(slot, j)
            w_y = wy_ref[j].astype(cdt)            # (p, wh)
            w_x = wx_ref[j].astype(cdt)            # (p, ww)
            patch = win[slot, j].reshape(wh, ww * c).astype(cdt)
            t = jax.lax.dot_general(               # (p, ww*c)
                w_y, patch, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(p, ww, c).astype(cdt)
            for i in range(p):                     # out[i,k,:] = wx[k] . t[i]
                out_ref[j, i] = jax.lax.dot_general(
                    w_x, t[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    return kernel


def _windowed_pool_raw(
    feats: Sequence[jnp.ndarray],   # per level (B, H_l, W_l, C)
    rois: jnp.ndarray,              # (B, R, 4)
    scales: Tuple[float, ...],
    output_size: int,
    sampling_ratio: int,
    interpret: bool = False,
    win_h: int = WIN_H,
    win_w: int = WIN_W,
    rois_per_step: int = ROIS_PER_STEP,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas windowed pooling for every roi.  Returns (pooled (B,R,p,p,C)
    f32, fits (B,R) bool — False where the window cropped the roi's taps)."""
    p, s = output_size, sampling_ratio
    b, r_per = rois.shape[0], rois.shape[1]
    n = b * r_per
    c = feats[0].shape[-1]
    flat_rois = rois.reshape(n, 4)

    levels = fpn_level_assignment(flat_rois)                      # (N,)
    scale_r = jnp.asarray(scales, jnp.float32)[levels]
    h_l = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    w_l = jnp.asarray([f.shape[2] for f in feats], jnp.int32)
    h_r, w_r = h_l[levels], w_l[levels]

    ys, xs = _flat_sample_coords(flat_rois, scale_r, p, s)
    ylo, yhi = _tap_bounds(ys, h_r)
    xlo, xhi = _tap_bounds(xs, w_r)

    # pad each level so a full window starting inside the map is in-bounds;
    # padded rows/cols only ever meet zero bilinear weights
    hp_l = [max(int(f.shape[1]), win_h) for f in feats]
    wp_l = [max(int(f.shape[2]), win_w) for f in feats]
    padded = [jnp.pad(f, ((0, 0), (0, hp - f.shape[1]), (0, wp - f.shape[2]),
                          (0, 0)))
              for f, hp, wp in zip(feats, hp_l, wp_l)]
    hp_r = jnp.asarray(hp_l, jnp.int32)[levels]
    wp_r = jnp.asarray(wp_l, jnp.int32)[levels]
    y0 = jnp.clip(ylo, 0, hp_r - win_h)
    # Mosaic constraint: dynamic HBM slice starts on the sublane (W) axis
    # must be 8-aligned; round down (start stays <= xlo, coverage checked
    # against the ALIGNED start below)
    x0 = (jnp.clip(xlo, 0, wp_r - win_w) // 8) * 8
    fits = ((yhi - y0) < win_h) & ((xhi - x0) < win_w)

    wy = _window_rows(ys, h_r, y0, win_h)                         # (N, p, win_h)
    wx = _window_rows(xs, w_r, x0, win_w)                         # (N, p, win_w)
    img = (jnp.arange(n, dtype=jnp.int32) // r_per)

    fdt = padded[0].dtype
    cdt = fdt if fdt == jnp.bfloat16 else jnp.float32
    num_levels = len(padded)

    # pad the roi axis to a multiple of rois_per_step with inert entries
    # (level 0, window at origin, zero weights -> zero output, sliced off)
    rps = max(1, rois_per_step)
    n_pad = (-n) % rps
    if n_pad:
        zi = jnp.zeros((n_pad,), jnp.int32)
        y0p, x0p = jnp.concatenate([y0, zi]), jnp.concatenate([x0, zi])
        lvlp, imgp = jnp.concatenate([levels, zi]), jnp.concatenate([img, zi])
        wyp = jnp.concatenate([wy, jnp.zeros((n_pad, p, win_h), wy.dtype)])
        wxp = jnp.concatenate([wx, jnp.zeros((n_pad, p, win_w), wx.dtype)])
    else:
        y0p, x0p, lvlp, imgp, wyp, wxp = y0, x0, levels, img, wy, wx
    nt = n + n_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nt // rps,),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * num_levels
            + [pl.BlockSpec((rps, p, win_h), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM),
               pl.BlockSpec((rps, p, win_w), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)]
        ),
        out_specs=pl.BlockSpec((rps, p, p, c), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rps, win_h, win_w, c), fdt),
            pltpu.SemaphoreType.DMA((2, rps)),
        ],
    )
    kernel = _pool_kernel_factory(num_levels, p, c, cdt, win_h, win_w, rps)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, p, p, c), jnp.float32),
        interpret=interpret,
    )(y0p, x0p // 8, lvlp, imgp, *padded, wyp.astype(fdt), wxp.astype(fdt))
    return out[:n].reshape(b, r_per, p, p, c), fits.reshape(b, r_per)


def _separable_batched(feats, rois, scales, output_size, sampling_ratio):
    return jax.vmap(
        lambda fs, rr: multilevel_roi_align(fs, rr, scales, output_size,
                                            sampling_ratio)
    )(tuple(feats), rois)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _windowed_pool(feats, rois, scales, output_size, sampling_ratio,
                   fallback_budget, interpret):
    out, fits = _windowed_pool_raw(feats, rois, scales, output_size,
                                   sampling_ratio, interpret)
    if fallback_budget <= 0:
        return out
    # compact the (rare) misfit rois per image and re-pool them exactly with
    # the full-map separable form.  Padding slots point at roi 0 — the
    # separable result is exact for ANY roi, so overwriting roi 0 with its
    # own exact value is harmless (and duplicate scatter indices carry
    # identical values).
    k = min(fallback_budget, rois.shape[1])
    order = jnp.argsort(fits, axis=1)[:, :k]                      # misfits first
    any_misfit = jnp.take_along_axis(~fits, order, axis=1)        # (B, k)
    sub_idx = jnp.where(any_misfit, order, 0)                     # (B, k)
    sub_rois = jnp.take_along_axis(rois, sub_idx[..., None], axis=1)
    sub_out = _separable_batched(feats, sub_rois, scales, output_size,
                                 sampling_ratio)                  # (B, k, p, p, C)
    return jax.vmap(lambda o, i, v: o.at[i].set(v))(out, sub_idx, sub_out)


def _windowed_pool_fwd(feats, rois, scales, output_size, sampling_ratio,
                       fallback_budget, interpret):
    out = _windowed_pool(feats, rois, scales, output_size, sampling_ratio,
                         fallback_budget, interpret)
    return out, (feats, rois)


def _windowed_pool_bwd(scales, output_size, sampling_ratio, fallback_budget,
                       interpret, res, g):
    feats, rois = res
    sep = lambda fs: _separable_batched(fs, rois, scales, output_size,
                                        sampling_ratio)
    _, vjp = jax.vjp(sep, tuple(feats))
    (dfeats,) = vjp(g.astype(jnp.float32))
    return tuple(dfeats), jnp.zeros_like(rois)


_windowed_pool.defvjp(_windowed_pool_fwd, _windowed_pool_bwd)


def multilevel_roi_align_batched(
    feats: Sequence[jnp.ndarray],   # per level (B, H_l, W_l, C)
    rois: jnp.ndarray,              # (B, R, 4) xyxy image coords
    scales: Tuple[float, ...],
    output_size: int,
    sampling_ratio: int = 2,
    impl: str = "auto",
    fallback_budget: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched multi-level ROIAlign: (B, R, P, P, C) f32.

    impl='windowed' runs the Pallas window kernel (TPU); 'separable' the
    full-map matmul form; 'auto' picks windowed on TPU backends and
    separable elsewhere (the window kernel interprets per-roi on CPU, which
    is only suitable for tests).
    """
    if sampling_ratio <= 0:
        raise ValueError("adaptive sampling_ratio not supported; configs use 2")
    if impl == "auto":
        impl = "windowed" if jax.default_backend() == "tpu" else "separable"
    if impl == "separable":
        return _separable_batched(feats, rois, scales, output_size,
                                  sampling_ratio)
    if impl != "windowed":
        raise ValueError(f"unknown pooler impl {impl!r}")
    return _windowed_pool(tuple(feats), rois, scales, output_size,
                          sampling_ratio, fallback_budget, interpret)
