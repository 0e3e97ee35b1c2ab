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


class DetRelSample(NamedTuple):
    pair_idx: jnp.ndarray     # (P, 2) int32 indices into detections
    labels: jnp.ndarray       # (P,) predicate labels from the (resampled) matrix
    labels_all: jnp.ndarray   # (P,) labels from the non-masked matrix
    mask: jnp.ndarray         # (P,)
    binary_rel: jnp.ndarray   # (D, D) symmetric GT relatedness over detections


@partial(
    jax.jit,
    static_argnames=(
        "batch_size", "positive_fraction", "num_sample_per_gt_rel",
        "fg_thres", "require_overlap", "max_gt_rels",
    ),
)
def detect_relsample(
    rng: jax.Array,
    rel_matrix: jnp.ndarray,      # (T, T) GT predicate labels (resampling-masked)
    rel_matrix_all: jnp.ndarray,  # (T, T) non-masked labels (same array if no rsmp)
    tgt_boxes: jnp.ndarray,       # (T, 4)
    tgt_labels: jnp.ndarray,      # (T,)
    tgt_mask: jnp.ndarray,        # (T,)
    prp_boxes: jnp.ndarray,       # (D, 4) post-NMS detections
    prp_labels: jnp.ndarray,      # (D,) assigned GT labels (0 = bg)
    prp_scores: jnp.ndarray,      # (D,) detection scores
    prp_mask: jnp.ndarray,        # (D,)
    batch_size: int = 1024,
    positive_fraction: float = 0.25,
    num_sample_per_gt_rel: int = 4,
    fg_thres: float = 0.5,
    require_overlap: bool = False,
    max_gt_rels: int = 160,
) -> DetRelSample:
    """Single-image sgdet pair sampling — the vectorized reformulation of
    detect_relsample + motif_rel_fg_bg_sampling (sampling.py:109-309).

    Semantics preserved:
      * a detection matches a GT box iff same label and IoU > ``fg_thres``;
      * every GT relation expands to all head-match x tail-match pairs, capped
        at ``num_sample_per_gt_rel`` by IoU-product-weighted sampling without
        replacement (:257-262 — realized here as Gumbel top-k, the exact
        same distribution as npr.choice(p=w, replace=False));
      * total foreground capped at batch*positive_fraction by uniform
        subsampling (:273-276);
      * every candidate pair of every GT relation is removed from the
        background pool (:249-251), backgrounds are drawn uniformly from the
        top-``2*num_neg`` quality-sorted (pred-score-product) pairs
        (:287-293);
      * if no fg and no bg exist the reference emits two (0, 0, 0) dummy
        triplets (:297-303) — reproduced;
      * ``binary_rel`` marks all head-match x tail-match combos symmetric,
        diagonal included (:207-213).

    Emission order is fg (GT-rel-major) then bg.  Two divergences, both
    invisible to the order-agnostic loss: the reference random-permutes fg
    when over the cap and bg always; we keep deterministic order with the
    same marginal distribution of the selected *set*.
    """
    t = rel_matrix.shape[0]
    d = prp_boxes.shape[0]
    num_pos = int(batch_size * positive_fraction)
    r = min(max_gt_rels, t * t)
    k_rng, fg_rng, bg_rng = jax.random.split(rng, 3)

    # ---- GT relation list (row-major nonzero order), static budget R
    flat_rel = rel_matrix.reshape(-1).astype(jnp.int32)
    flat_all = rel_matrix_all.reshape(-1).astype(jnp.int32)
    pair_valid = (
        (flat_rel != 0)
        & tgt_mask[jnp.repeat(jnp.arange(t), t)]
        & tgt_mask[jnp.tile(jnp.arange(t), (t,))]
    )
    order = jnp.argsort(~pair_valid, stable=True)[:r]
    rel_valid = pair_valid[order]
    rel_h = (order // t).astype(jnp.int32)
    rel_t = (order % t).astype(jnp.int32)
    rel_lab = jnp.maximum(flat_rel[order], 0)
    rel_lab_all = jnp.maximum(flat_all[order], 0)

    # ---- matching
    from veto_tpu.ops.box_ops import box_iou

    ious = box_iou(tgt_boxes, prp_boxes)  # (T, D)
    ious = jnp.where(tgt_mask[:, None] & prp_mask[None, :], ious, 0.0)
    is_match = (tgt_labels[:, None] == prp_labels[None, :]) & (ious > fg_thres)

    # ---- per-GT-rel candidate pairs (R, D, D)
    mh = is_match[rel_h] & rel_valid[:, None]  # (R, D)
    mt = is_match[rel_t] & rel_valid[:, None]
    notself = ~jnp.eye(d, dtype=bool)
    cand = mh[:, :, None] & mt[:, None, :] & notself[None]

    # binary relatedness: symmetric, diagonal kept (reference :207-213)
    marks = jnp.einsum("ri,rj->ij", mh.astype(jnp.int32), mt.astype(jnp.int32)) > 0
    binary_rel = (marks | marks.T).astype(jnp.int32)

    # ---- weighted cap per GT rel: Gumbel top-k = npr.choice(p, replace=False)
    w = ious[rel_h][:, :, None] * ious[rel_t][:, None, :]  # (R, D, D)
    gumbel = jax.random.gumbel(k_rng, (r, d * d))
    key = jnp.where(
        cand.reshape(r, -1), jnp.log(jnp.maximum(w.reshape(r, -1), 1e-20)) + gumbel,
        -jnp.inf,
    )
    top_key, top_flat = jax.lax.top_k(key, num_sample_per_gt_rel)  # (R, K)
    fg_sel = top_key > -jnp.inf
    fg_head = (top_flat // d).astype(jnp.int32)
    fg_tail = (top_flat % d).astype(jnp.int32)
    fg_lab = jnp.broadcast_to(rel_lab[:, None], fg_sel.shape)
    fg_lab_all = jnp.broadcast_to(rel_lab_all[:, None], fg_sel.shape)

    # flatten (R*K) in GT-rel-major order
    fg_sel = fg_sel.reshape(-1)
    fg_head, fg_tail = fg_head.reshape(-1), fg_tail.reshape(-1)
    fg_lab, fg_lab_all = fg_lab.reshape(-1), fg_lab_all.reshape(-1)

    # cap total fg at num_pos by uniform subsampling
    u = jax.random.uniform(fg_rng, fg_sel.shape)
    fg_rank = jnp.argsort(jnp.argsort(jnp.where(fg_sel, u, jnp.inf)))
    fg_keep = fg_sel & (fg_rank < num_pos)
    num_fg = jnp.sum(fg_keep.astype(jnp.int32))

    # ---- background pool
    if require_overlap:
        self_iou = box_iou(prp_boxes, prp_boxes)
        possibility = (self_iou > 0) & (self_iou < 1)
    else:
        possibility = notself
    possibility = (
        possibility
        & prp_mask[:, None] & prp_mask[None, :]
        & (prp_labels[:, None] > 0) & (prp_labels[None, :] > 0)
        & ~jnp.any(cand, axis=0)
    ).reshape(-1)
    quality = (prp_scores[:, None] * prp_scores[None, :]).reshape(-1)
    num_bg_avail = jnp.sum(possibility.astype(jnp.int32))
    num_neg = jnp.minimum(batch_size - num_fg, num_bg_avail)

    q_rank = jnp.argsort(jnp.argsort(jnp.where(possibility, -quality, jnp.inf)))
    eligible = possibility & (q_rank < 2 * num_neg)
    ub = jax.random.uniform(bg_rng, possibility.shape)
    bg_rank = jnp.argsort(jnp.argsort(jnp.where(eligible, ub, jnp.inf)))
    bg_keep = eligible & (bg_rank < num_neg)

    # ---- assemble: fg (in order) then bg, padded to batch_size
    nfg, nbg = fg_sel.shape[0], possibility.shape[0]
    big = nfg + nbg
    fg_key = jnp.where(fg_keep, fg_rank, big + jnp.arange(nfg))
    bg_key = jnp.where(bg_keep, num_pos + bg_rank, 2 * big + jnp.arange(nbg))
    all_key = jnp.concatenate([fg_key, bg_key])
    all_head = jnp.concatenate([fg_head, (jnp.arange(nbg) // d).astype(jnp.int32)])
    all_tail = jnp.concatenate([fg_tail, (jnp.arange(nbg) % d).astype(jnp.int32)])
    all_lab = jnp.concatenate([fg_lab, jnp.zeros((nbg,), jnp.int32)])
    all_lab_all = jnp.concatenate([fg_lab_all, jnp.zeros((nbg,), jnp.int32)])
    all_keep = jnp.concatenate([fg_keep, bg_keep])

    sel = jnp.argsort(all_key)[:batch_size]
    mask = all_keep[sel]
    # dummy fallback: two (0, 0, 0) triplets when nothing was sampled
    empty = (num_fg + jnp.sum(bg_keep.astype(jnp.int32))) == 0
    dummy = empty & (jnp.arange(batch_size) < 2)
    mask = mask | dummy
    pair_idx = jnp.where(
        mask[:, None] & ~dummy[:, None],
        jnp.stack([all_head[sel], all_tail[sel]], axis=-1),
        0,
    )
    labels = jnp.where(mask & ~dummy, all_lab[sel], jnp.where(dummy, 0, -1))
    labels = jnp.where(mask, labels, -1)
    labels_all = jnp.where(mask & ~dummy, all_lab_all[sel], jnp.where(dummy, 0, -1))
    labels_all = jnp.where(mask, labels_all, -1)
    return DetRelSample(
        pair_idx=pair_idx, labels=labels, labels_all=labels_all, mask=mask,
        binary_rel=binary_rel,
    )


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
    # stable sort on the negated quality: exact ranking by score product
    # with row-major order among EXACT ties (reference nonzero order).
    # NOT a perturbation tie-break — an additive epsilon comparable to the
    # f32 product gaps (~1e-7 at sgdet score scales) corrupts genuine
    # rankings, which the whole-model sgdet parity ladder caught.
    k = min(max_pairs, n * n)
    sneg, si, sj = jax.lax.sort(
        (-quality, ii.astype(jnp.int32), jj.astype(jnp.int32)),
        num_keys=1, is_stable=True)
    mask = sneg[:k] < jnp.inf
    pair_idx = jnp.stack([si[:k], sj[:k]], axis=-1)
    pair_idx = jnp.where(mask[:, None], pair_idx, 0)
    if max_pairs > n * n:  # pad out to the static budget
        pad = max_pairs - n * n
        pair_idx = jnp.concatenate([pair_idx, jnp.zeros((pad, 2), jnp.int32)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    return pair_idx, mask
