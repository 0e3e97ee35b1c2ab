"""Relation pair sampling, re-designed as masked fixed-shape device ops.

Reference: pysgg/modeling/roi_heads/relation_head/sampling.py
  * prepare_test_pairs (:31-52)  — all N^2 - N candidate pairs, capped at
    MAX_PROPOSAL_PAIR by descending pred-score product.
  * gtbox_relsample (:54-107)    — training pairs for predcls/sgcls: all GT
    relation pairs (random-subsampled to batch*pos_fraction if more), plus
    random background pairs filling up to batch_size_per_image.

The reference loops per image with dynamic shapes; here each image is a
fixed-budget problem solved with sort/top_k over the flattened N*N pair
grid, so the whole batch vmaps and compiles once.  Padding entries carry
label -1 and mask False.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RelSample(NamedTuple):
    pair_idx: jnp.ndarray   # (P, 2) int32 subject/object indices into boxes
    labels: jnp.ndarray     # (P,) int32 predicate labels; 0 = bg, -1 = pad
    mask: jnp.ndarray       # (P,) bool
    binary_rel: jnp.ndarray  # (N, N) int32 symmetric GT relatedness


def _pair_grid(n: int):
    ii = jnp.repeat(jnp.arange(n, dtype=jnp.int32), n)
    jj = jnp.tile(jnp.arange(n, dtype=jnp.int32), (n,))
    return ii, jj


@partial(jax.jit, static_argnames=("batch_size", "positive_fraction"))
def gtbox_relsample(
    rng: jax.Array,
    rel_matrix: jnp.ndarray,  # (N, N) int — predicate label per GT pair, 0=none
    box_mask: jnp.ndarray,    # (N,) bool
    batch_size: int = 1024,
    positive_fraction: float = 0.25,
) -> RelSample:
    """Single-image GT-box pair sampling (gtbox_relsample :54-107).

    Semantics match the reference: up to ``batch_size * positive_fraction``
    foreground pairs chosen uniformly at random from the GT relations, the
    remaining quota filled with uniformly random background pairs (all valid
    i != j pairs that carry no GT relation).  Output order is fg-then-bg like
    the reference ``cat((tgt_pair_idxs, tgt_bg_idxs))``.
    """
    n = rel_matrix.shape[0]
    num_pos = int(batch_size * positive_fraction)
    ii, jj = _pair_grid(n)
    flat_rel = rel_matrix.reshape(-1).astype(jnp.int32)

    valid = box_mask[ii] & box_mask[jj] & (ii != jj)
    fg = valid & (flat_rel > 0)
    # label -1 = resampling-dropped relation (bi_lvl_rsmp.py apply_resampling)
    # — a background candidate in the reference (rel_possibility only zeroes
    # pairs with label > 0)
    bg = valid & (flat_rel <= 0)

    r_fg, r_bg = jax.random.uniform(rng, (2, n * n))
    # random rank of each pair within its pool (non-members rank last)
    fg_rank = jnp.argsort(jnp.argsort(jnp.where(fg, r_fg, jnp.inf)))
    bg_rank = jnp.argsort(jnp.argsort(jnp.where(bg, r_bg, jnp.inf)))

    chosen_fg = fg & (fg_rank < num_pos)
    num_fg = jnp.sum(chosen_fg.astype(jnp.int32))
    chosen_bg = bg & (bg_rank < batch_size - num_fg)

    # emission order: chosen fg (by fg_rank), then chosen bg, then padding
    big = n * n
    sel_key = jnp.where(
        chosen_fg, fg_rank,
        jnp.where(chosen_bg, big + bg_rank, 2 * big + jnp.arange(big)),
    )
    order = jnp.argsort(sel_key)[:batch_size]
    mask = (chosen_fg | chosen_bg)[order]
    labels = jnp.where(mask, jnp.maximum(flat_rel[order], 0), -1)
    pair_idx = jnp.stack([ii[order], jj[order]], axis=-1)
    # padding entries point at box 0 to keep gathers in range
    pair_idx = jnp.where(mask[:, None], pair_idx, 0)

    sym = ((rel_matrix > 0) | (rel_matrix > 0).T).astype(jnp.int32)
    sym = sym * (box_mask[:, None] & box_mask[None, :]).astype(jnp.int32)
    return RelSample(pair_idx=pair_idx, labels=labels, mask=mask, binary_rel=sym)


@partial(jax.jit, static_argnames=("max_pairs", "require_overlap"))
def prepare_test_pairs(
    box_mask: jnp.ndarray,     # (N,) bool
    scores: jnp.ndarray,       # (N,) pred scores (ones in predcls)
    boxes: jnp.ndarray | None = None,  # (N, 4), needed when require_overlap
    max_pairs: int = 2048,
    require_overlap: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All-candidate test pairs (prepare_test_pairs :31-52).

    Returns (pair_idx (P, 2), mask (P,)) with P = max_pairs, ordered by
    descending score product (the reference's cap criterion) — final ranking
    happens in the post-processor by triple score, so ordering here only
    decides *which* pairs survive the cap, exactly like the reference.
    """
    n = box_mask.shape[0]
    ii, jj = _pair_grid(n)
    valid = box_mask[ii] & box_mask[jj] & (ii != jj)
    if require_overlap:
        from veto_tpu.ops.box_ops import box_iou

        iou = box_iou(boxes, boxes).reshape(-1)
        valid = valid & (iou > 0)
    quality = jnp.where(valid, scores[ii] * scores[jj], -jnp.inf)
    # stable preference for row-major order among ties (reference nonzero order)
    quality = quality - jnp.arange(n * n, dtype=jnp.float32) * 1e-9
    top_q, top_i = jax.lax.top_k(quality, min(max_pairs, n * n))
    mask = top_q > -jnp.inf
    pair_idx = jnp.stack([ii[top_i], jj[top_i]], axis=-1)
    pair_idx = jnp.where(mask[:, None], pair_idx, 0)
    if max_pairs > n * n:  # pad out to the static budget
        pad = max_pairs - n * n
        pair_idx = jnp.concatenate([pair_idx, jnp.zeros((pad, 2), jnp.int32)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    return pair_idx, mask
