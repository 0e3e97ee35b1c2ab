"""ROIPool — legacy max-pool RoI pooling with argmax backward.

TPU re-design of the reference CUDA kernel
(pysgg/csrc/cuda/ROIPool_cuda.cu:17-78 forward, :81-110 backward; autograd
wrapper pysgg/layers/roi_pool.py).  Semantics replicated exactly:

  * roi corners ``round(coord * spatial_scale)`` to integer feature coords
  * malformed rois forced to 1x1 (``max(end - start + 1, 1)``)
  * bin (ph, pw) spans ``[floor(ph*bh), ceil((ph+1)*bh))`` offset by the roi
    start and clipped to the map — bins may overlap by one row/column
  * empty bins produce 0 with argmax -1 (no gradient)
  * ties resolve to the FIRST row-major (h*W + w) window element (the CUDA
    loop's strict ``>`` comparison)

TPU-first shape story: the CUDA kernel's per-bin dynamic windows become a
static masked argmax over the flattened map — each (roi, ph, pw, c) output
selects its max via a boolean window mask, one fused select+argmax with no
data-dependent shapes.  The backward is a custom VJP scattering the
cotangent to the saved argmax (``mode='drop'`` eats the -1 of empty bins),
matching the reference's atomicAdd scatter.

This op exists for the legacy C4/ResNet50Conv5 extractor path; the shipped
FPN configs pool exclusively through ROIAlign (SURVEY.md §2.1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("output_size",))
def roi_pool_with_argmax(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
):
    """Forward pass returning (pooled, argmax).

    Args:
      features: (H, W, C) single-image feature map (batch via vmap).
      rois: (R, 4) xyxy boxes in image coordinates.
      spatial_scale: image→feature coordinate scale.
      output_size: P — pooled bins per side.

    Returns:
      pooled: (R, P, P, C) max-pooled features.
      argmax: (R, P, P, C) int32 flat (h*W + w) index of each max, -1 when
        the bin is empty.
    """
    h, w, _ = features.shape
    p = output_size
    r = rois.astype(jnp.float32) * spatial_scale
    start_w = jnp.round(r[:, 0]).astype(jnp.int32)
    start_h = jnp.round(r[:, 1]).astype(jnp.int32)
    end_w = jnp.round(r[:, 2]).astype(jnp.int32)
    end_h = jnp.round(r[:, 3]).astype(jnp.int32)
    roi_w = jnp.maximum(end_w - start_w + 1, 1)  # (R,) int32
    roi_h = jnp.maximum(end_h - start_h + 1, 1)

    # bin bounds floor(ph*rh/p) / ceil((ph+1)*rh/p) in EXACT integer
    # arithmetic: the CUDA kernel's f32 products sit exactly on integer
    # boundaries whenever p divides roi extent, where 1-ulp reassociation
    # (XLA fusion, GPU fma) flips the ceil — integer math is the stable
    # form of the same semantics
    bins = jnp.arange(p, dtype=jnp.int32)
    hstart = (bins[None, :] * roi_h[:, None]) // p
    hend = ((bins[None, :] + 1) * roi_h[:, None] + p - 1) // p
    wstart = (bins[None, :] * roi_w[:, None]) // p
    wend = ((bins[None, :] + 1) * roi_w[:, None] + p - 1) // p
    hstart = jnp.clip(hstart + start_h[:, None], 0, h)  # (R, P)
    hend = jnp.clip(hend + start_h[:, None], 0, h)
    wstart = jnp.clip(wstart + start_w[:, None], 0, w)
    wend = jnp.clip(wend + start_w[:, None], 0, w)

    hh = jnp.arange(h)
    ww = jnp.arange(w)
    mask_h = (hh[None, None] >= hstart[..., None]) & (hh[None, None] < hend[..., None])  # (R, P, H)
    mask_w = (ww[None, None] >= wstart[..., None]) & (ww[None, None] < wend[..., None])  # (R, P, W)

    flat = features.reshape(h * w, -1)

    def one_roi(mh, mw):
        # mh: (P, H), mw: (P, W) → window mask (P, P, H*W)
        m = (mh[:, None, :, None] & mw[None, :, None, :]).reshape(p, p, h * w)
        vals = jnp.where(m[..., None], flat[None, None], -jnp.inf)
        idx = jnp.argmax(vals, axis=2).astype(jnp.int32)  # (P, P, C)
        best = jnp.max(vals, axis=2)
        empty = ~m.any(axis=2)  # (P, P)
        pooled = jnp.where(empty[..., None], 0.0, best)
        idx = jnp.where(empty[..., None], -1, idx)
        return pooled.astype(features.dtype), idx

    return jax.vmap(one_roi)(mask_h, mask_w)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def roi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
) -> jnp.ndarray:
    """ROIPool forward; differentiable w.r.t. ``features`` via the saved
    argmax (reference RoIPoolFBackward scatter semantics)."""
    pooled, _ = roi_pool_with_argmax(features, rois, spatial_scale, output_size)
    return pooled


def _roi_pool_fwd(features, rois, spatial_scale, output_size):
    pooled, argmax = roi_pool_with_argmax(
        features, rois, spatial_scale, output_size
    )
    # residuals must be arrays; features rides along only for its static
    # shape/dtype (XLA keeps it alive anyway as the op's input)
    return pooled, (argmax, features)


def _roi_pool_bwd(spatial_scale, output_size, res, g):
    argmax, features = res
    h, w, c = features.shape
    dtype = features.dtype
    flat_idx = argmax.reshape(-1)                       # (R*P*P*C,)
    # .at[] wraps negative indices NumPy-style; push the -1 of empty bins
    # out of bounds so mode='drop' discards them instead
    flat_idx = jnp.where(flat_idx < 0, h * w, flat_idx)
    c_idx = jnp.broadcast_to(jnp.arange(c), argmax.shape).reshape(-1)
    grad_flat = jnp.zeros((h * w, c), jnp.float32).at[flat_idx, c_idx].add(
        g.astype(jnp.float32).reshape(-1), mode="drop"
    )  # -1 (empty bin) indices drop, matching argmax==-1 no-backprop
    return grad_flat.reshape(h, w, c).astype(dtype), None


roi_pool.defvjp(_roi_pool_fwd, _roi_pool_bwd)
