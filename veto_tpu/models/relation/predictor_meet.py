"""MEET: mutually-exclusive-expert ensemble over predicate frequency groups.

Re-design of the reference VETOPredictor_MEET + Ensemble
(pysgg/.../roi_relation_predictors.py:3661-3995):

  * the shared VETO trunk feeds G per-group heads, each a Linear
    576 → (group_size + 2) — background at 0, the group's predicates, and an
    out-of-distribution class last (:3716-3728);
  * optional 3 experts per group (ENSEMBLE_LEARNING.EXPERT_GROUP,
    :3717-3723) — all experts share the routing, diversity comes from
    initialization;
  * training routes each sampled pair to a PREFIX of groups via the
    over-sampling threshold matrix (``cur_chosen_matrix`` construction,
    :3930-3969): background pairs go to one uniformly-random group
    ('rand_insert' ZERO_LABEL_PADDING_MODE), foreground pairs draw one
    uniform number and are assigned to groups [0, act) where act is the
    LARGEST stage whose threshold accepts the draw (or, failing that, the
    stage below the label's own group);
  * per-group labels are remapped in-group: bg → 0, member predicate →
    1-based position, everything else → group_size + 1 (OOD)
    (:3806-3822);
  * per-group CE losses (:3833-3846).

Groups are consecutive ranges over the frequency-sorted predicate ids
(SHA_GCL_extra/group_chosen_function.py get_group_splits), so all remaps are
closed-form offsets.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .predictor_veto import VetoTrunk, weighted_ce_loss


class MeetPredictorOutput(NamedTuple):
    # per expert, per group: (B, P, group_size + 2) logits
    group_logits: Tuple[Tuple[jnp.ndarray, ...], ...]
    obj_dists: jnp.ndarray   # (B, N, num_obj)


class MeetConfig(NamedTuple):
    """Host-side MEET constants derived from the dataset's predicate stats."""

    group_sizes: Tuple[int, ...]
    incre_idx: np.ndarray     # (C,) 1-based group id per predicate
    sample_rate: np.ndarray   # (G, C) routing thresholds
    experts_per_group: int
    voting: str               # 'C' | 'U'


def make_meet_config(
    dataset: str = "VG",
    split: str = "divide4",
    expert_group: bool = False,
    voting: str = "C",
) -> MeetConfig:
    """Assemble routing constants (VETOPredictor_MEET.__init__ :3893-3907)."""
    from veto_tpu.data.predicate_stats import (
        generate_sample_rate_matrix,
        get_group_splits,
        incre_idx_list,
        predicate_counts,
    )

    _, sizes = get_group_splits(dataset, split)
    num_classes = len(predicate_counts(dataset))
    return MeetConfig(
        group_sizes=tuple(sizes),
        incre_idx=incre_idx_list(sizes, num_classes),
        sample_rate=generate_sample_rate_matrix(dataset, sizes),
        experts_per_group=3 if expert_group else 1,
        voting=voting,
    )


def group_starts(group_sizes: Sequence[int]) -> np.ndarray:
    """First (frequency-sorted) predicate id of each group; groups are the
    consecutive ranges [start_k, start_k + size_k)."""
    return np.cumsum([1] + list(group_sizes))[:-1]


class MeetPredictor(nn.Module):
    """VETO trunk + MEET grouped heads."""

    group_sizes: Tuple[int, ...] = (4, 6, 9, 19, 12)  # VG divide4
    experts_per_group: int = 1
    num_obj_classes: int = 151
    num_rel_classes: int = 51
    embed_dim: int = 200
    dim: int = 576
    layers: int = 6
    heads: int = 6
    patch_size: int = 2
    depth_proj_dim: int = 512
    visual_proj_dim: int = 64
    mode: str = "predcls"
    dtype: Any = jnp.float32
    remat: bool = True
    encoder_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        boxes: jnp.ndarray,
        box_mask: jnp.ndarray,
        obj_labels: jnp.ndarray,
        obj_logits: jnp.ndarray,
        pair_idx: jnp.ndarray,
        pair_mask: jnp.ndarray,
        roi_features: jnp.ndarray,
        depth_features: jnp.ndarray,
        train: bool = False,
    ) -> MeetPredictorOutput:
        rel_feat = VetoTrunk(
            num_obj_classes=self.num_obj_classes, embed_dim=self.embed_dim,
            dim=self.dim, layers=self.layers, heads=self.heads,
            patch_size=self.patch_size, depth_proj_dim=self.depth_proj_dim,
            visual_proj_dim=self.visual_proj_dim, mode=self.mode,
            hard_label_embed=True,  # Ensemble embeds the hard label (:3784)
            dtype=self.dtype, remat=self.remat,
            encoder_impl=self.encoder_impl, name="trunk",
        )(
            boxes, box_mask, obj_labels, obj_logits, pair_idx, pair_mask,
            roi_features, depth_features, train=train,
        )
        group_logits = tuple(
            tuple(
                nn.Dense(
                    gs + 2, dtype=jnp.float32,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name=f"rel_out_e{e}_g{k}",
                )(rel_feat)
                for k, gs in enumerate(self.group_sizes)
            )
            for e in range(self.experts_per_group)
        )
        # 0/1 one-hot (reference predictor parity; the eval post-processor
        # reads predict_logits instead — relation_head.py:236-238)
        obj_dists = jax.nn.one_hot(
            obj_labels, self.num_obj_classes, dtype=jnp.float32
        )
        return MeetPredictorOutput(group_logits=group_logits, obj_dists=obj_dists)


# ----------------------------------------------------------------------
# training: routing + per-group losses
# ----------------------------------------------------------------------
def meet_route(
    rng: jax.Array,
    labels: jnp.ndarray,       # (...,) predicate labels, -1 = pad
    mask: jnp.ndarray,         # (...,) bool
    incre_idx: jnp.ndarray,    # (C,) 1-based group id per predicate (0 for bg)
    sample_rate: jnp.ndarray,  # (G, C) acceptance thresholds
) -> jnp.ndarray:
    """Per-sample group membership (..., G) bool — the vectorized
    ``cur_chosen_matrix`` construction (roi_relation_predictors.py:3930-3969,
    'rand_insert' mode).
    """
    g = sample_rate.shape[0]
    k_bg, k_fg = jax.random.split(rng)
    safe = jnp.maximum(labels, 0)

    bg_group = jax.random.randint(k_bg, labels.shape, 0, g)
    bg_member = jax.nn.one_hot(bg_group, g, dtype=bool)

    u = jax.random.uniform(k_fg, labels.shape)
    rel_group = incre_idx[safe]  # 1-based group of the label
    acts = jnp.arange(1, g + 1)  # stage ids
    # cond[..., a] — stage acts[a] accepts the draw (:3961-3963)
    thresholds = jnp.moveaxis(sample_rate[:, safe], 0, -1)  # (..., G)
    cond = (u[..., None] <= thresholds) | (acts < rel_group[..., None])
    # reference breaks at the FIRST accepting stage counting DOWN from G,
    # i.e. the largest accepting stage
    act_idx = jnp.max(jnp.where(cond, acts, 0), axis=-1)
    fg_member = jnp.arange(g) < act_idx[..., None]

    member = jnp.where((labels == 0)[..., None], bg_member, fg_member)
    return member & mask[..., None]


def meet_group_labels(
    labels: jnp.ndarray, group_sizes: Sequence[int]
) -> List[jnp.ndarray]:
    """In-group label remap per group (:3806-3822): bg → 0, member →
    1-based in-group position, other fg → group_size + 1 (OOD)."""
    starts = group_starts(group_sizes)
    out = []
    for k, gs in enumerate(group_sizes):
        start = int(starts[k])
        in_group = (labels >= start) & (labels < start + gs)
        remapped = jnp.where(
            labels == 0, 0,
            jnp.where(in_group, labels - start + 1, gs + 1),
        )
        out.append(jnp.where(labels >= 0, remapped, -1))
    return out


def meet_losses(
    rng: jax.Array,
    group_logits: Tuple[Tuple[jnp.ndarray, ...], ...],
    labels: jnp.ndarray,      # (B, P)
    mask: jnp.ndarray,        # (B, P)
    incre_idx: jnp.ndarray,   # (C,)
    sample_rate: jnp.ndarray,  # (G, C)
    group_sizes: Sequence[int],
) -> dict:
    """Per-(expert, group) CE losses (:3833-3846).  All experts share one
    routing draw, like the reference (it builds cur_chosen_matrix once and
    indexes [0] for every expert)."""
    member = meet_route(rng, labels, mask, incre_idx, sample_rate)
    glabels = meet_group_labels(labels, group_sizes)
    losses = {}
    for e, expert in enumerate(group_logits):
        for k, logits in enumerate(expert):
            sel = member[..., k] & mask
            losses[f"group_{k}{e + 1}_CE_loss"] = weighted_ce_loss(
                logits, glabels[k], sel, None
            )
    return losses


# ----------------------------------------------------------------------
# evaluation: ensemble post-processing
# ----------------------------------------------------------------------
class MeetPrediction(NamedTuple):
    pair_idx: jnp.ndarray    # (G*P, 2) sorted by triple score desc
    rel_scores: jnp.ndarray  # (G*P, C) globally-scattered probabilities
    rel_labels: jnp.ndarray  # (G*P,) global predicate ids
    pair_mask: jnp.ndarray   # (G*P,)
    obj_labels: jnp.ndarray  # (N,)
    obj_scores: jnp.ndarray  # (N,)


def _group_best(logits, start, gs, num_rel):
    """softmax → drop OOD → best member; returns (score, global label,
    scattered (P, C) prob) for one group (inference.py:351-356)."""
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, :-1]  # (P, gs+1)
    score = jnp.max(prob[:, 1:], axis=-1)
    cls = jnp.argmax(prob[:, 1:], axis=-1)  # 0-based in-group
    glabel = cls + start
    p = logits.shape[0]
    scat = jnp.zeros((p, num_rel), jnp.float32)
    scat = scat.at[:, 0].set(prob[:, 0])
    scat = jax.lax.dynamic_update_slice(scat, prob[:, 1:], (0, start))
    return score, glabel.astype(jnp.int32), scat


def _obj_from_dists(obj_dists):
    obj_prob = jax.nn.softmax(obj_dists.astype(jnp.float32), axis=-1)
    obj_prob = obj_prob.at[:, 0].set(0.0)
    scores = jnp.max(obj_prob[:, 1:], axis=-1)
    labels = jnp.argmax(obj_prob[:, 1:], axis=-1) + 1
    return labels.astype(jnp.int32), scores


def postprocess_meet_single(
    group_logits: Sequence[jnp.ndarray],  # per group (P, gs+2), one expert
    obj_labels: jnp.ndarray,              # (N,) final object labels
    obj_scores: jnp.ndarray,              # (N,) final object scores
    pair_idx: jnp.ndarray,                # (P, 2)
    pair_mask: jnp.ndarray,               # (P,)
    group_sizes: Sequence[int],
    num_rel_classes: int,
) -> MeetPrediction:
    """Single-expert MEET post-processing (inference.py:284-397): every
    group contributes its best member per pair; all G·P candidates compete
    in one global triple-score sort.  Object labels/scores are computed by
    the caller (gt-box softmax-max or sgdet late NMS, like the plain path).
    """
    s0 = obj_scores[pair_idx[:, 0]]
    s1 = obj_scores[pair_idx[:, 1]]
    starts = group_starts(group_sizes)

    scores, labels, probs = [], [], []
    for k, logits in enumerate(group_logits):
        sc, lab, scat = _group_best(logits, int(starts[k]), group_sizes[k],
                                    num_rel_classes)
        scores.append(sc * s0 * s1)
        labels.append(lab)
        probs.append(scat)

    g = len(group_logits)
    all_scores = jnp.concatenate(scores)               # (G*P,)
    all_labels = jnp.concatenate(labels)
    all_probs = jnp.concatenate(probs)                 # (G*P, C)
    all_pairs = jnp.tile(pair_idx, (g, 1))
    all_mask = jnp.tile(pair_mask, (g,))

    order = jnp.argsort(jnp.where(all_mask, -all_scores, jnp.inf))
    return MeetPrediction(
        pair_idx=all_pairs[order],
        rel_scores=all_probs[order],
        rel_labels=all_labels[order],
        pair_mask=all_mask[order],
        obj_labels=obj_labels,
        obj_scores=obj_scores,
    )


def postprocess_meet_voting(
    group_logits: Tuple[Tuple[jnp.ndarray, ...], ...],  # [expert][group] (P, gs+2)
    obj_labels: jnp.ndarray,
    obj_scores: jnp.ndarray,
    pair_idx: jnp.ndarray,
    pair_mask: jnp.ndarray,
    group_sizes: Sequence[int],
    num_rel_classes: int,
    voting: str = "C",  # 'C' consensus | 'U' unanimous
) -> MeetPrediction:
    """Expert-group voting (inference.py:93-283), 3 experts per group.

    Consensus ('C'): a pair survives a group if ≥2 experts agree on its
    in-group class; score/probs average over the agreeing expert pairs.
    Unanimous ('U'): all 3 must agree; score/probs average over all experts.
    (The reference's rel_class_prob_avg2 accidentally averages expert 1 with
    itself, :216-218 — we average experts 1 and 2 as evidently intended.)
    """
    assert len(group_logits) == 3, "voting requires 3 experts per group"
    s0 = obj_scores[pair_idx[:, 0]]
    s1 = obj_scores[pair_idx[:, 1]]
    starts = group_starts(group_sizes)

    scores, labels, probs, masks = [], [], [], []
    for k, gs in enumerate(group_sizes):
        per_e = [
            _group_best(group_logits[e][k], int(starts[k]), gs, num_rel_classes)
            for e in range(3)
        ]
        tr = [sc * s0 * s1 for sc, _, _ in per_e]
        cls = [lab for _, lab, _ in per_e]
        pr = [scat for _, _, scat in per_e]
        agree = [cls[0] == cls[1], cls[1] == cls[2], cls[0] == cls[2]]
        pair_avg_t = [(tr[0] + tr[1]) / 2, (tr[1] + tr[2]) / 2, (tr[0] + tr[2]) / 2]
        pair_avg_p = [(pr[0] + pr[1]) / 2, (pr[1] + pr[2]) / 2, (pr[0] + pr[2]) / 2]

        if voting == "C":
            count = sum(a.astype(jnp.float32) for a in agree)
            t_sum = sum(jnp.where(a, t, 0.0) for a, t in zip(agree, pair_avg_t))
            p_sum = sum(
                jnp.where(a[:, None], p, 0.0) for a, p in zip(agree, pair_avg_p)
            )
            safe = jnp.maximum(count, 1.0)
            triple = jnp.where(count > 0, t_sum / safe, 0.0)
            prob = jnp.where(count[:, None] > 0, p_sum / safe[:, None], 0.0)
            # class from any agreeing pair; later writes win (:240-242)
            rel_class = jnp.zeros_like(cls[0])
            for a, c in zip(agree, (cls[0], cls[1], cls[0])):
                rel_class = jnp.where(a, c, rel_class)
            keep = agree[0] | agree[1] | agree[2]
        else:
            triple = (tr[0] + tr[1] + tr[2]) / 3
            prob = (pr[0] + pr[1] + pr[2]) / 3
            rel_class = cls[0]
            keep = agree[0] & agree[1] & agree[2]

        scores.append(triple)
        labels.append(rel_class)
        probs.append(prob)
        masks.append(keep & pair_mask)

    g = len(group_sizes)
    all_scores = jnp.concatenate(scores)
    all_labels = jnp.concatenate(labels)
    all_probs = jnp.concatenate(probs)
    all_pairs = jnp.tile(pair_idx, (g, 1))
    all_mask = jnp.concatenate(masks)

    order = jnp.argsort(jnp.where(all_mask, -all_scores, jnp.inf))
    return MeetPrediction(
        pair_idx=all_pairs[order],
        rel_scores=all_probs[order],
        rel_labels=all_labels[order],
        pair_mask=all_mask[order],
        obj_labels=obj_labels,
        obj_scores=obj_scores,
    )
