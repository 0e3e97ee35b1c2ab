"""Greedy NMS with static shapes.

TPU re-design of the reference's CUDA bitmask NMS (pysgg/csrc/cuda/nms.cu,
csrc/cpu/nms_cpu.cpp, wrapped at pysgg/layers/nms.py:13).

Two implementations with identical semantics (same keep set and order as
score-sorted sequential greedy suppression):

* ``nms_sequential`` — fixed-trip select-argmax loop: at every step pick the
  highest-scoring live box, emit it, kill everything over the IoU threshold.
  O(max_outputs) sequential trips; kept as the semantics reference.

* ``nms`` (blockwise, the production path) — sort once by score, then walk
  the sorted list in blocks: each block is (a) suppressed against the
  keep-masked prefix with one (block x N) IoU pass, then (b) resolved
  internally by iterating the greedy recurrence
  ``keep_i = active_i & !any_{j<i}(iou_ji > t & keep_j)`` to its fixpoint.
  The recurrence has a unique solution (induction over i), so the fixpoint
  IS the greedy keep set; the synchronous iteration stabilizes position i
  one step after all j<i are stable, i.e. it converges in at most the
  longest suppression-chain depth (typically a handful of iterations, never
  more than the block size).  Sequential work drops from ``max_outputs``
  trips (1000 for the RPN) to ``N/block`` block steps — measured ~5x on the
  sgdet cascade's RPN+postprocess stage.

Memory: the blockwise path materializes one (block, N-padded) IoU plane per
block step (e.g. 512 x 6144 = 12.6 MB f32 at the RPN's 6000-box pre-NMS
budget) plus the (block, block) within-block tile — never the full N x N
matrix.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .box_ops import TO_REMOVE, box_area

_NEG_INF = -1e10


def _iou_one_vs_all(box: jnp.ndarray, boxes: jnp.ndarray, areas: jnp.ndarray) -> jnp.ndarray:
    """IoU of one xyxy box against (N, 4) boxes, inclusive-pixel convention."""
    area1 = (box[2] - box[0] + TO_REMOVE) * (box[3] - box[1] + TO_REMOVE)
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    return inter / (area1 + areas - inter)


def _iou_matrix_coords(a: tuple, a_areas: jnp.ndarray,
                       b: tuple, b_areas: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU from coordinate-separated boxes -> (M, K).

    ``a``/``b`` are (x1, y1, x2, y2) tuples of (M,) / (K,) vectors.  The
    coordinate-wise form matters on TPU: a packed (M, K, 2) lt/rb
    intermediate puts 2 in the minor (lane) dimension, which pads to 128
    lanes — measured 7x slower than these (M, K) planes at the box-head
    postprocess shapes.
    """
    iw = (jnp.minimum(a[2][:, None], b[2][None, :])
          - jnp.maximum(a[0][:, None], b[0][None, :]) + TO_REMOVE)
    ih = (jnp.minimum(a[3][:, None], b[3][None, :])
          - jnp.maximum(a[1][:, None], b[1][None, :]) + TO_REMOVE)
    inter = jnp.clip(iw, 0.0) * jnp.clip(ih, 0.0)
    return inter / (a_areas[:, None] + b_areas[None, :] - inter)


def _greedy_keep_sorted(sboxes: jnp.ndarray, active: jnp.ndarray,
                        iou_threshold: float, max_outputs: int,
                        block: int) -> jnp.ndarray:
    """Greedy keep mask over score-DESC-sorted (N, 4) boxes.

    Returns an (N,) bool mask of the first ``max_outputs`` greedy keeps.
    ``active`` marks selectable entries (padding / below-threshold = False).
    """
    co = tuple(sboxes.astype(jnp.float32)[:, i] for i in range(4))
    return _greedy_keep_sorted_coords(co, active, iou_threshold,
                                      max_outputs, block)


def _greedy_keep_sorted_coords(co: tuple, active: jnp.ndarray,
                               iou_threshold: float, max_outputs: int,
                               block: int,
                               early_exit: bool = False) -> jnp.ndarray:
    """`_greedy_keep_sorted` over coordinate-separated (x1, y1, x2, y2)
    vectors — the form the fused multi-operand sorts already produce, so
    callers avoid re-packing (N, 4) just to split it again here."""
    n = co[0].shape[0]
    block = max(1, min(block, n))
    pad = (-n) % block
    npad = n + pad
    nb = npad // block
    co = tuple(jnp.pad(c.astype(jnp.float32), (0, pad)) for c in co)
    act_p = jnp.pad(active, (0, pad))
    areas_p = ((co[2] - co[0] + TO_REMOVE) * (co[3] - co[1] + TO_REMOVE))
    # O[j, i]: j (earlier in score order) suppresses i if kept
    upper = jnp.triu(jnp.ones((block, block), bool), k=1)
    pos_idx = jnp.arange(npad)

    # One sequential loop over blocks: block b computes IoU against ALL
    # sorted boxes at once and suppresses by the keep-masked prefix — no
    # compacted kept-box buffer and no scatters (dynamic_update_slice
    # writes the block's keeps).  Uniform shapes keep the traced body
    # small; an unrolled-prefix variant was ~20% faster at runtime but
    # blew XLA compile time up >5x on the full detection cascade.  Keeps
    # beyond ``max_outputs`` still suppress later boxes, exactly like
    # unbudgeted greedy NMS; the final cumsum cut takes the first
    # ``max_outputs`` keeps — the reference's full-NMS-then-truncate
    # semantics.
    #
    # ``early_exit``: EXACT early exit (while_loop, not fori): the sort
    # puts every selectable box in a contiguous prefix (inactives carry
    # -inf keys), so once the walk passes the active prefix no later block
    # can keep anything; and once ``max_outputs`` keeps exist, later keeps
    # are cut by the final cumsum truncation anyway — neither can change
    # the returned mask.  Opt-in per call site: it wins when the walk is
    # long and exits early (RPN, 12 block steps → 2-3: propose 18.7 →
    # 13.3 ms on-chip), but LOSES when the walk is already short (the
    # 150-class postprocess runs 4 steps and the batched while-cond
    # reduction adds ~6 ms — keep fori there).
    def body(b, keep):
        lo = b * block
        blk = tuple(jax.lax.dynamic_slice_in_dim(c, lo, block) for c in co)
        ar = jax.lax.dynamic_slice_in_dim(areas_p, lo, block)
        act = jax.lax.dynamic_slice_in_dim(act_p, lo, block)
        iou_all = _iou_matrix_coords(blk, ar, co, areas_p)  # (block, npad)
        prev_keep = keep & (pos_idx < lo)
        act = act & ~jnp.any(
            (iou_all > iou_threshold) & prev_keep[None, :], axis=1)
        # within-block fixpoint of the greedy recurrence
        omat = (jax.lax.dynamic_slice(iou_all, (0, lo), (block, block))
                > iou_threshold) & upper

        def fcond(c):
            return c[1]

        def fbody(c):
            k, _ = c
            suppressed = jnp.any(omat & k[:, None], axis=0)
            knew = act & ~suppressed
            return knew, jnp.any(knew != k)

        k, _ = jax.lax.while_loop(fcond, fbody, (act, jnp.asarray(True)))
        return jax.lax.dynamic_update_slice_in_dim(keep, k, lo, axis=0)

    if early_exit:
        n_active = jnp.sum(act_p)

        def wcond(state):
            b, keep = state
            return ((b < nb)
                    & (b * block < n_active)
                    & (jnp.sum(keep) < max_outputs))

        def wbody(state):
            b, keep = state
            return b + 1, body(b, keep)

        _, keep = jax.lax.while_loop(
            wcond, wbody,
            (jnp.asarray(0, jnp.int32), jnp.zeros((npad,), bool)))
    else:
        keep = jax.lax.fori_loop(0, nb, body, jnp.zeros((npad,), bool))
    keep = keep[:n]
    return keep & (jnp.cumsum(keep) - 1 < max_outputs)


@partial(jax.jit, static_argnames=("max_outputs", "block", "early_exit"))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    valid_mask: jnp.ndarray | None = None,
    block: int = 512,
    early_exit: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy IoU suppression (blockwise; exact greedy semantics).

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,).
      iou_threshold: suppress boxes with IoU > threshold vs a kept box
        (strictly greater, matching nms_cpu.cpp's ``ovr > thresh`` reject).
      max_outputs: static output budget.
      valid_mask: optional (N,) bool; False entries are never selected.
      block: sorted boxes processed per sequential step.

    Returns:
      (indices, keep_mask): (max_outputs,) int32 indices into ``boxes``
      in descending-score keep order (padding = 0) and a bool mask of real
      keeps.
    """
    n = boxes.shape[0]
    live = scores.astype(jnp.float32)
    if valid_mask is not None:
        live = jnp.where(valid_mask, live, _NEG_INF)
    # ONE stable 6-operand sort carries score, coords, and the original
    # index together — replaces argsort + two (N, 4) gathers, which cost
    # more than the sort itself at cascade shapes.  Stable on the negated
    # key: ties resolve to the lower index, matching the sequential
    # version's first-occurrence argmax.
    bx = boxes.astype(jnp.float32)
    sneg, sx1, sy1, sx2, sy2, sidx = jax.lax.sort(
        (-live, bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3],
         jnp.arange(n, dtype=jnp.int32)),
        num_keys=1, dimension=0, is_stable=True)
    keep_sorted = _greedy_keep_sorted_coords(
        (sx1, sy1, sx2, sy2), -sneg > _NEG_INF / 2, iou_threshold,
        max_outputs, block, early_exit=early_exit,
    )
    kpos = jnp.cumsum(keep_sorted) - 1
    spos = jnp.where(keep_sorted, kpos, max_outputs)
    out_idx = jnp.zeros((max_outputs,), jnp.int32).at[spos].set(
        sidx, mode="drop")
    out_ok = jnp.zeros((max_outputs,), bool).at[spos].set(True, mode="drop")
    return out_idx, out_ok


@partial(jax.jit, static_argnames=("max_outputs",))
def nms_sequential(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    valid_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Select-argmax greedy NMS: one kept box per loop trip.

    The semantics reference for ``nms`` (tests assert bit-parity); prefer
    ``nms`` in production paths — this version's trip count is
    ``max_outputs`` regardless of how early suppression empties the pool.
    """
    n = boxes.shape[0]
    live = scores.astype(jnp.float32)
    if valid_mask is not None:
        live = jnp.where(valid_mask, live, _NEG_INF)
    areas = box_area(boxes)

    def body(i, state):
        live_scores, out_idx, out_ok = state
        idx = jnp.argmax(live_scores)
        best = live_scores[idx]
        ok = best > _NEG_INF / 2
        ious = _iou_one_vs_all(boxes[idx], boxes, areas)
        suppress = ious > iou_threshold
        live_scores = jnp.where(suppress & ok, _NEG_INF, live_scores)
        live_scores = jnp.where(ok, live_scores.at[idx].set(_NEG_INF), live_scores)
        out_idx = out_idx.at[i].set(jnp.where(ok, idx, 0).astype(jnp.int32))
        out_ok = out_ok.at[i].set(ok)
        return live_scores, out_idx, out_ok

    out_idx = jnp.zeros((max_outputs,), dtype=jnp.int32)
    out_ok = jnp.zeros((max_outputs,), dtype=bool)
    _, out_idx, out_ok = jax.lax.fori_loop(
        0, min(max_outputs, n), body, (live, out_idx, out_ok)
    )
    return out_idx, out_ok


@partial(jax.jit, static_argnames=("max_keep_per_cls", "block"))
def multiclass_nms_mask(
    boxes_per_cls: jnp.ndarray,   # (N, C, 4) per-class decoded boxes
    scores: jnp.ndarray,          # (N, C)
    score_thresh: float,
    iou_threshold: float,
    max_keep_per_cls: int,
    valid_mask: jnp.ndarray | None = None,  # (N,)
    block: int = 256,
) -> jnp.ndarray:
    """Per-class greedy NMS keep mask (box_head/inference.py filter_results
    :157-188 per-class loop, all classes at once).

    For every class independently: candidates are boxes with
    ``score > score_thresh``; greedy suppression at ``iou_threshold`` keeps
    at most ``max_keep_per_cls``.  Returns a (N, C) bool keep mask.  The
    caller is responsible for excluding the background column.

    Implementation: the blockwise greedy core (see module docstring),
    vmapped over classes — N/block sequential steps total instead of one
    trip per kept box.  Sort machinery is fused: one stable 6-operand
    ``lax.sort`` per class carries (−score, x1, y1, x2, y2, idx) into score
    order, and a 2-operand sort keyed on idx carries the keep bits back to
    box order — measured ~2x the argsort + gather + scatter formulation at
    the sgdet postprocess shapes (1000 boxes x 150 classes x batch 8).
    """
    n, c = scores.shape
    live = scores.astype(jnp.float32).T  # (C, N)
    if valid_mask is not None:
        live = jnp.where(valid_mask[None, :], live, _NEG_INF)
    live = jnp.where(live > score_thresh, live, _NEG_INF)
    boxes_t = jnp.swapaxes(boxes_per_cls, 0, 1).astype(jnp.float32)  # (C, N, 4)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (c, n))
    sneg, sx1, sy1, sx2, sy2, sidx = jax.lax.sort(
        (-live, boxes_t[..., 0], boxes_t[..., 1], boxes_t[..., 2],
         boxes_t[..., 3], idx),
        num_keys=1, dimension=1, is_stable=True)

    def per_class(co, act):
        return _greedy_keep_sorted_coords(
            co, act, iou_threshold, max_keep_per_cls, block)

    keep_sorted = jax.vmap(per_class)((sx1, sy1, sx2, sy2),
                                      -sneg > _NEG_INF / 2)
    # un-sort by original index: a key-sort beats an (N,)-scatter per class
    _, keep = jax.lax.sort((sidx, keep_sorted), num_keys=1, dimension=1)
    return keep.T  # (N, C)


def obj_prediction_nms(
    boxes_per_cls: jnp.ndarray,  # (N, C, 4)
    pred_logits: jnp.ndarray,    # (N, C)
    nms_thresh: float = 0.3,
    valid_mask: jnp.ndarray | None = None,
    overwrite: bool = False,
    bg_init: float | None = None,
) -> jnp.ndarray:
    """Global-argmax label assignment NMS (utils_relation.py:94-130).

    Iteratively takes the globally highest (box, class) probability, assigns
    that class to the box if it is still unlabeled, then zeroes the same
    class for all boxes whose class-c IoU with it exceeds ``nms_thresh`` and
    retires the chosen box.  Returns per-box predicted labels (N,) int32
    (0 = background / never assigned).

    ``overwrite=True`` selects the nms_per_cls variant used by the context
    models (model_transformer.py:297-316, Ensemble :3855-3874): the bg
    column starts at -1 instead of 0 and each pick overwrites the label
    unconditionally.  ``bg_init`` overrides the bg column's initial value
    (the Motifs DecoderRNN post-NMS, model_motifs.py:204-219, overwrites
    labels but keeps bg at 0).

    Stays a sequential loop: every trip's pick depends on the previous
    trip's per-class zeroing, and N here is the 80-box detection budget,
    not the RPN's thousands.
    """
    n, c = pred_logits.shape
    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    if bg_init is None:
        bg_init = -1.0 if overwrite else 0.0
    prob = prob.at[:, 0].set(bg_init)
    if valid_mask is not None:
        prob = jnp.where(valid_mask[:, None], prob, -1.0)

    # per-class pairwise IoU (nms_overlaps, utils_relation.py:56-91): (N, N, C)
    bpc = jnp.swapaxes(boxes_per_cls.astype(jnp.float32), 0, 1)  # (C, N, 4)
    lt = jnp.maximum(bpc[:, :, None, :2], bpc[:, None, :, :2])
    rb = jnp.minimum(bpc[:, :, None, 2:], bpc[:, None, :, 2:])
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = box_area(bpc)
    iou = inter / (area[:, :, None] + area[:, None, :] - inter)  # (C, N, N)
    is_overlap = jnp.moveaxis(iou, 0, -1) >= nms_thresh  # (N, N, C)

    def body(_, state):
        prob_s, labels = state
        flat = jnp.argmax(prob_s)
        box_ind, cls_ind = flat // c, flat % c
        if overwrite:
            labels = labels.at[box_ind].set(cls_ind)
        else:
            labels = jnp.where(
                labels[box_ind] > 0, labels, labels.at[box_ind].set(cls_ind)
            )
        suppress = is_overlap[box_ind, :, cls_ind]
        col = prob_s[:, cls_ind]
        prob_s = prob_s.at[:, cls_ind].set(jnp.where(suppress, 0.0, col))
        prob_s = prob_s.at[box_ind].set(-1.0)
        return prob_s, labels

    _, labels = jax.lax.fori_loop(
        0, n, body, (prob, jnp.zeros((n,), jnp.int32))
    )
    return labels


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    valid_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via the coordinate-offset trick.

    Boxes of different ``idxs`` (class or image ids) never suppress each
    other — same semantics as reference boxlist_nms applied per class
    (box_head/inference.py filter_results).
    """
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = idxs.astype(boxes.dtype)[:, None] * (max_coord * 2.0 + 2.0)
    return nms(boxes + offsets, scores, iou_threshold, max_outputs, valid_mask)
