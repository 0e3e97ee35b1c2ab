"""Jitted train/eval steps with SPMD sharding.

Replaces the reference's training loop internals (tools/relation_train_net.py
:418-565) and DDP gradient all-reduce (:372-380): here the whole step —
pair sampling, forward, loss, backward, optimizer — is ONE jitted SPMD
program over a `jax.sharding.Mesh`.  Gradients are reduced by XLA-inserted
collectives over ICI instead of NCCL all-reduce; losses come back as
replicated scalars, replacing reduce_loss_dict (engine/trainer.py:8-30).

Mesh axes:
  * ``data``  — batch-parallel (the reference's only parallelism).
  * ``pair``  — the relation-pair axis, sharded like a batch axis: each
    image's P sampled pairs split across chips, with the small per-proposal
    feature tensors replicated (SURVEY.md §5 "pair-parallel").  This is the
    framework's sequence-parallel analog; it lets a single image's 2048+
    sgdet pairs span chips.

Pair sampling (random) runs in-graph with a fold-in PRNG so the step stays
pure and reproducible (reference fixed SEED=1, relation_train_net.py:44-50).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from veto_tpu.models.detector.box_head import assign_labels_to_proposals
from veto_tpu.models.relation.postprocess import (
    postprocess_relations,
    postprocess_relations_sgdet,
)
from veto_tpu.models.relation.predictor_veto import weighted_ce_loss
from veto_tpu.models.relation.sampling import (
    detect_relsample,
    gtbox_relsample,
    prepare_test_pairs,
)

from .batch import SGGBatch


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    # loss-variant running state (e.g. BalancedNorm labeling probability);
    # None for stateless variants
    loss_state: Any = None


def create_train_state(
    model, tx, rng, sample_batch: SGGBatch, variables=None
) -> TrainState:
    """Initialize parameters from a (tiny) sample batch.

    Pass pre-built ``variables`` (e.g. from ``init_all`` for sgdet so the
    RPN/box-head params exist) to skip the default ``__call__`` init.
    """
    b, n = sample_batch.boxes.shape[:2]
    pair_idx = jnp.zeros((b, 8, 2), jnp.int32)
    pair_mask = jnp.ones((b, 8), bool)
    if variables is None:
        variables = model.init(
            rng,
            sample_batch.images,
            sample_batch.depth,
            sample_batch.boxes,
            sample_batch.box_mask,
            sample_batch.labels,
            sample_batch.obj_logits,
            pair_idx,
            pair_mask,
            train=False,
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=rng,
    )


def _rel_out(out):
    """Predictor relation output: (B, P, C) array (VETO/legacy) or the MEET
    nested per-expert/per-group tuple."""
    for name in ("rel_logits", "rel_dists", "group_logits"):
        v = getattr(out, name, None)
        if v is not None:
            return v
    raise AttributeError("no relation logits on predictor output")


def _binary_loss(bi_preds, binary_rel, box_mask):
    """VCTree auxiliary pair-relatedness BCE (roi_relation_predictors.py
    :1572-1578), masked mean over valid proposal pairs."""
    y = (binary_rel > 0).astype(jnp.float32)
    logits = bi_preds.astype(jnp.float32)
    bce = (jnp.maximum(logits, 0) - logits * y
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    m2 = (box_mask[:, :, None] & box_mask[:, None, :]).astype(jnp.float32)
    return (bce * m2).sum() / jnp.maximum(m2.sum(), 1.0)


def _rel_losses(meet, cw, step_rng, rel_logits, labels, mask,
                loss_variant="weighted_ce", ldam_m=None, loss_state=None):
    """Relation loss dict + new loss state.

    Variants (reference loss.py:13-120 RelationLossComputation branches —
    constructed but unwired there; here selectable via config):
      weighted_ce      — (beta-)weighted CE (the VETO in-predictor loss)
      label_smoothing  — Label_Smoothing_Regression e=0.01 (:71-72)
      ldam             — LDAMLoss margins + weighted CE (:99-120, :311-333)
      balanced_norm    — BalancedNorm1d re-normalized NLL (:73-98)
    MEET routing overrides the variant (losses are per-group CEs).
    """
    if meet is not None:
        from veto_tpu.models.relation.predictor_meet import meet_losses

        return meet_losses(
            jax.random.fold_in(step_rng, 1), rel_logits, labels, mask,
            jnp.asarray(meet.incre_idx), jnp.asarray(meet.sample_rate),
            meet.group_sizes,
        ), loss_state
    if loss_variant == "label_smoothing":
        from veto_tpu.ops.losses import label_smoothing_ce

        return {"rel_loss": label_smoothing_ce(
            rel_logits, jnp.where(mask, labels, 0), mask=mask)}, loss_state
    if loss_variant == "ldam":
        from veto_tpu.ops.losses import ldam_loss

        return {"rel_loss": ldam_loss(
            rel_logits, labels, mask, ldam_m, class_weights=cw)}, loss_state
    if loss_variant == "balanced_norm":
        from veto_tpu.ops.losses import balanced_norm_nll, balanced_norm_probs

        probs_norm, new_prob = balanced_norm_probs(
            rel_logits, labels, mask, loss_state, train=True,
        )
        return {"rel_loss": balanced_norm_nll(
            probs_norm, labels, mask, cw)}, new_prob
    return {"rel_loss": weighted_ce_loss(rel_logits, labels, mask, cw)}, loss_state


def constrain_pair_tree(tree, mesh, ref_shape=None):
    """Shard the sampled/test-pair axis over mesh axis 'pair' (SURVEY.md §5).

    Applies a (data, pair) sharding constraint to every array in ``tree``
    whose leading two dims match ``ref_shape`` (default: tree.mask's shape),
    so the per-pair relation transformer workload is actually partitioned
    across the 'pair' axis instead of silently replicated by XLA.
    """
    if mesh is None or "pair" not in mesh.axis_names:
        return tree
    if ref_shape is None:
        ref_shape = tree.mask.shape[:2]
    sh = NamedSharding(mesh, P("data", "pair"))
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, sh)
        if x.ndim >= 2 and x.shape[:2] == tuple(ref_shape)
        else x,
        tree,
    )


def make_train_step(
    model,
    tx,
    rel_class_weights: Optional[np.ndarray],
    batch_size_per_image: int = 1024,
    positive_fraction: float = 0.25,
    mode: str = "predcls",
    mesh: Optional[Mesh] = None,
    meet=None,
    loss_variant: str = "weighted_ce",
    ldam_margins: Optional[np.ndarray] = None,
    collect_diagnostics: bool = False,
    attribute_cfg: Optional[dict] = None,  # attribute_loss kwargs (ATTRIBUTE_ON)
    loss_only: bool = False,
) -> Callable[[TrainState, SGGBatch, jnp.ndarray], tuple]:
    """Build the jitted train step: (state, batch, lr_scale) → (state, metrics).

    ``collect_diagnostics`` adds a non-scalar ``buffer`` entry to the
    metrics (rel-PN relness targets/scores + pair mask) for the host-side
    global debug buffer (utils/global_buffer.py; reference
    rel_proposal_network/models.py:346-356) when the predictor emits
    relness logits.

    ``loss_only`` skips backward + optimizer and returns the unchanged
    state with loss metrics only — a cheap reference evaluation for
    sharded-vs-single-device parity checks (same sampling PRNG, same loss
    math, no grad compile; used by __graft_entry__.dryrun_multichip).
    """
    cw = None if rel_class_weights is None else jnp.asarray(rel_class_weights)
    ldam_m = None if ldam_margins is None else jnp.asarray(ldam_margins)

    def train_step(state: TrainState, batch: SGGBatch, lr_scale: jnp.ndarray):
        step_rng = jax.random.fold_in(state.rng, state.step)
        sample_keys = jax.random.split(step_rng, batch.batch_size)
        samples = jax.vmap(
            lambda k, rel, m: gtbox_relsample(
                k, rel, m, batch_size=batch_size_per_image,
                positive_fraction=positive_fraction,
            )
        )(sample_keys, batch.rel_matrix, batch.box_mask)
        samples = constrain_pair_tree(samples, mesh)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch.images,
                batch.depth,
                batch.boxes,
                batch.box_mask,
                batch.labels,
                batch.obj_logits,
                samples.pair_idx,
                samples.mask,
                train=True,
                mutable=["batch_stats"],
            )
            losses, new_loss_state = _rel_losses(
                meet, cw, step_rng, _rel_out(out), samples.labels,
                samples.mask, loss_variant, ldam_m, state.loss_state,
            )
            bp = getattr(out, "binary_preds", None)
            if bp is not None:
                losses["binary_loss"] = _binary_loss(
                    bp, samples.binary_rel, batch.box_mask
                )
            al = getattr(out, "attribute_logits", None)
            if al is not None:
                # MODEL.ATTRIBUTE_ON box-level multi-label loss
                # (attribute_head/loss.py; loss_weight folded inside).
                # Deviation: the reference trains this head in its detector
                # stage and freezes it during relation training
                # (attribute_head.py:33-44); here it trains jointly in the
                # relation step — same loss, no separate stage.  Import a
                # pretrained head (torch_import) to reproduce the frozen
                # behavior exactly.
                from veto_tpu.models.detector.attribute_head import (
                    attribute_loss,
                )
                b_, n_ = batch.box_mask.shape
                losses["attribute_loss"] = attribute_loss(
                    jax.random.fold_in(step_rng, 7),
                    al.reshape(b_ * n_, -1),
                    batch.attributes.reshape(b_ * n_, -1),
                    batch.box_mask.reshape(-1),
                    **(attribute_cfg or {}),
                ).loss
            rl = getattr(out, "relness_logits", None)
            diag = {}
            if rl is not None:
                # RelatednessTestPredictor auxiliary RelAwareLoss
                # (roi_relation_predictors.py:2770-2780)
                from veto_tpu.models.relation.rel_proposal import (
                    rel_aware_focal_loss,
                )
                losses["pre_rel_classify_loss"] = rel_aware_focal_loss(
                    rl, samples.labels, samples.mask, model.num_rel_classes
                )
                if collect_diagnostics:
                    diag = {
                        "rel_pn-train_y": (samples.labels > 0),
                        "rel_pn-train_pred": jax.nn.sigmoid(
                            rl[..., -1].astype(jnp.float32)),
                        "mask": samples.mask,
                    }
            if mode != "predcls":
                obj_loss = weighted_ce_loss(
                    out.obj_dists, batch.labels, batch.box_mask, None
                )
                losses["obj_loss"] = obj_loss
            total = sum(losses.values())
            return total, (losses, mutated["batch_stats"], new_loss_state,
                           diag)

        if loss_only:
            total, (losses, _, _, _) = loss_fn(state.params)
            metrics = dict(losses)
            metrics["loss"] = total
            return state, metrics

        (total, (losses, new_stats, new_loss_state, diag)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params))

        opt_state = state.opt_state
        opt_state.hyperparams["lr_scale"] = lr_scale.astype(jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        if diag:
            metrics["buffer"] = diag
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            loss_state=new_loss_state,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model, max_pairs: int = 2048, mode: str = "predcls",
                   mesh: Optional[Mesh] = None):
    """Build the jitted eval step: (state, batch) → per-image RelPrediction.

    Pairs are the full candidate set (prepare_test_pairs); the result arrays
    stay padded/masked so a single compile serves every image.
    """

    def eval_step(state: TrainState, batch: SGGBatch):
        scores = jnp.where(batch.box_mask, 1.0, 0.0)
        pair_idx, pair_mask = jax.vmap(
            lambda m, s, bx: prepare_test_pairs(m, s, bx, max_pairs=max_pairs)
        )(batch.box_mask, scores, batch.boxes)
        pair_idx, pair_mask = constrain_pair_tree(
            (pair_idx, pair_mask), mesh, ref_shape=pair_mask.shape)

        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.images,
            batch.depth,
            batch.boxes,
            batch.box_mask,
            batch.labels,
            batch.obj_logits,
            pair_idx,
            pair_mask,
            train=False,
        )
        # rel-PN pair confidence for the stagewise ranking diagnostics
        # (reference keeps it as a "relness" boxlist field)
        relness = out.relness_logits
        if relness is not None:
            relness = jax.nn.sigmoid(relness.astype(jnp.float32))
        # the post-processor consumes the proposals' predict_logits (±1000
        # GT injection in predcls, frozen box-head logits in sgcls) — the
        # predictor's refined obj_dists are discarded at eval because
        # OBJECT_CLASSIFICATION_REFINE is False in every shipped config
        # (relation_head.py:236-245, defaults.py:527)
        return jax.vmap(postprocess_relations)(
            out.rel_logits, out.predict_logits, pair_idx, pair_mask, relness
        )

    return eval_step


def make_meet_eval_step(
    model, meet, max_pairs: int = 2048, mode: str = "predcls",
    later_nms_thres: float = 0.3, require_overlap: bool = False,
    mesh: Optional[Mesh] = None,
):
    """MEET ensemble eval step for all three modes.

    Returns (MeetPrediction batch, final boxes (B, N, 4), det_mask (B, N)) —
    boxes are GT boxes in the gt-box modes, per-class regressed picks in
    sgdet (reference inference.py:93-397 ensemble branches).
    """
    from veto_tpu.models.relation.predictor_meet import (
        postprocess_meet_single,
        postprocess_meet_voting,
    )
    from veto_tpu.ops.nms import obj_prediction_nms

    num_rel = len(meet.incre_idx)
    group_sizes = meet.group_sizes
    voting = meet.experts_per_group == 3

    def _post(group_logits, obj_labels, obj_scores, pair_idx, pair_mask):
        if voting:
            return postprocess_meet_voting(
                group_logits, obj_labels, obj_scores, pair_idx, pair_mask,
                group_sizes, num_rel, voting=meet.voting,
            )
        return postprocess_meet_single(
            group_logits[0], obj_labels, obj_scores, pair_idx, pair_mask,
            group_sizes, num_rel,
        )

    def eval_step(state: TrainState, batch: SGGBatch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if mode == "sgdet":
            sizes = batch.sizes.astype(jnp.float32)
            det = model.apply(variables, batch.images, sizes, method="detect")
            dets = det.detections
            pair_idx, pair_mask = jax.vmap(
                lambda m, s, bx: prepare_test_pairs(
                    m, s, bx, max_pairs=max_pairs,
                    require_overlap=require_overlap,
                )
            )(dets.mask, dets.scores, dets.boxes)
            pair_idx, pair_mask = constrain_pair_tree(
                (pair_idx, pair_mask), mesh, ref_shape=pair_mask.shape)
            out = model.apply(
                variables, det.features, batch.depth, dets.boxes, dets.mask,
                dets.labels, det.predict_logits, pair_idx, pair_mask,
                train=False, method="relate",
            )
            glogits = out.group_logits
            # eval re-NMS runs on the frozen box-head predict_logits
            # (OBJECT_CLASSIFICATION_REFINE=False, relation_head.py:236-245)
            obj_labels = jax.vmap(
                lambda b, lg, m: obj_prediction_nms(
                    b, lg, later_nms_thres, valid_mask=m
                )
            )(dets.boxes_per_cls, det.predict_logits, dets.mask)
            obj_prob = jax.nn.softmax(
                det.predict_logits.astype(jnp.float32), -1)
            obj_prob = obj_prob.at[..., 0].set(0.0)
            obj_scores = jnp.take_along_axis(
                obj_prob, obj_labels[..., None], axis=-1
            )[..., 0]
            boxes = jnp.take_along_axis(
                dets.boxes_per_cls,
                obj_labels[..., None, None].repeat(4, -1).astype(jnp.int32),
                axis=2,
            )[:, :, 0]
            det_mask = dets.mask
        else:
            scores = jnp.where(batch.box_mask, 1.0, 0.0)
            pair_idx, pair_mask = jax.vmap(
                lambda m, s, bx: prepare_test_pairs(m, s, bx, max_pairs=max_pairs)
            )(batch.box_mask, scores, batch.boxes)
            pair_idx, pair_mask = constrain_pair_tree(
                (pair_idx, pair_mask), mesh, ref_shape=pair_mask.shape)
            fwd = model.apply(
                variables, batch.images, batch.depth, batch.boxes,
                batch.box_mask, batch.labels, batch.obj_logits,
                pair_idx, pair_mask, train=False,
            )
            # predict_logits, not the predictor's obj_dists
            # (relation_head.py:236-245)
            out_obj = jax.nn.softmax(
                fwd.predict_logits.astype(jnp.float32), -1)
            out_obj = out_obj.at[..., 0].set(0.0)
            obj_scores = jnp.max(out_obj[..., 1:], axis=-1)
            obj_labels = (jnp.argmax(out_obj[..., 1:], axis=-1) + 1).astype(jnp.int32)
            boxes = batch.boxes
            det_mask = batch.box_mask
            glogits = fwd.rel_logits

        preds = jax.vmap(_post)(
            glogits, obj_labels, obj_scores, pair_idx, pair_mask
        )
        return preds, boxes, det_mask

    return eval_step


def make_sgdet_train_step(
    model,
    tx,
    rel_class_weights: Optional[np.ndarray],
    batch_size_per_image: int = 1024,
    positive_fraction: float = 0.25,
    num_sample_per_gt_rel: int = 4,
    require_overlap: bool = False,
    mesh: Optional[Mesh] = None,
    meet=None,
    loss_variant: str = "weighted_ce",
    ldam_margins: Optional[np.ndarray] = None,
    loss_only: bool = False,
):
    """sgdet train step: frozen detection cascade → pair sampling → relation.

    Mirrors the reference sgdet path (box_head.py:92-105 +
    relation_head.py:112-131 detect_relsample + predictor losses).  The
    detection cascade runs once outside the loss closure (it is frozen and
    carries stop_gradients); the sampled pairs feed the trainable relation
    head.  The relation predictor's object inputs are the NMS-reduced
    ``pred_labels`` / ``predict_logits`` of the 80 detections, while the
    sampler consumes GT-assigned labels (sampling.py:126-128).
    """
    cw = None if rel_class_weights is None else jnp.asarray(rel_class_weights)
    ldam_m = None if ldam_margins is None else jnp.asarray(ldam_margins)

    def train_step(state: TrainState, batch: SGGBatch, lr_scale: jnp.ndarray):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        sizes = batch.sizes.astype(jnp.float32)
        det = model.apply(variables, batch.images, sizes, method="detect")
        dets = det.detections

        gt_labels, _ = jax.vmap(
            lambda pb, pm, gb, gl, gm: assign_labels_to_proposals(pb, pm, gb, gl, gm)
        )(dets.boxes, dets.mask, batch.boxes, batch.labels, batch.box_mask)

        step_rng = jax.random.fold_in(state.rng, state.step)
        sample_keys = jax.random.split(step_rng, batch.batch_size)
        samples = jax.vmap(
            lambda k, rel, gb, gl, gm, pb, pl, ps, pm: detect_relsample(
                k, rel, rel, gb, gl, gm, pb, pl, ps, pm,
                batch_size=batch_size_per_image,
                positive_fraction=positive_fraction,
                num_sample_per_gt_rel=num_sample_per_gt_rel,
                require_overlap=require_overlap,
            )
        )(
            sample_keys, batch.rel_matrix, batch.boxes, batch.labels,
            batch.box_mask, dets.boxes, gt_labels, dets.scores, dets.mask,
        )

        # legacy context models teacher-force GT-assigned labels; VETO embeds
        # the box head's NMS-reduced pred_labels (predictors differ here)
        legacy = getattr(model, "predictor", "") in getattr(
            model, "LEGACY_PREDICTORS", ()
        )
        embed_labels = gt_labels if legacy else dets.labels

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                det.features, batch.depth, dets.boxes, dets.mask,
                embed_labels, det.predict_logits,
                samples.pair_idx, samples.mask,
                train=True, mutable=["batch_stats"], method="relate",
                image_sizes=sizes, boxes_per_cls=dets.boxes_per_cls,
                pred_labels=dets.labels,
            )
            losses, new_loss_state = _rel_losses(
                meet, cw, step_rng, _rel_out(out), samples.labels,
                samples.mask, loss_variant, ldam_m, state.loss_state,
            )
            bp = getattr(out, "binary_preds", None)
            if bp is not None:
                losses["binary_loss"] = _binary_loss(
                    bp, samples.binary_rel, dets.mask
                )
            # obj refine loss on GT-assigned labels.  For VETO obj_dists are
            # one-hot (roi_relation_predictors.py:4129-4133) so this is a
            # constant; for legacy predictors the refined logits train the
            # context (TransformerContext.out_obj / Motifs DecoderRNN).
            losses["obj_loss"] = weighted_ce_loss(
                out.obj_dists, gt_labels, dets.mask, None
            )
            total = sum(losses.values())
            return total, (losses, mutated["batch_stats"], new_loss_state)

        if loss_only:
            total, (losses, _, _) = loss_fn(state.params)
            metrics = dict(losses)
            metrics["loss"] = total
            return state, metrics

        (total, (losses, new_stats, new_loss_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        opt_state = state.opt_state
        opt_state.hyperparams["lr_scale"] = lr_scale.astype(jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state, loss_state=new_loss_state,
        )
        return new_state, metrics

    return train_step


def make_sgdet_eval_step(
    model, max_pairs: int = 2048, later_nms_thres: float = 0.3,
    require_overlap: bool = False, mesh: Optional[Mesh] = None,
):
    """sgdet eval: detect → all-pair enumeration over detections → relation
    → sgdet post-processing (late obj NMS + per-class regression pick)."""

    def eval_step(state: TrainState, batch: SGGBatch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        sizes = batch.sizes.astype(jnp.float32)
        det = model.apply(variables, batch.images, sizes, method="detect")
        dets = det.detections

        pair_idx, pair_mask = jax.vmap(
            lambda m, s, bx: prepare_test_pairs(
                m, s, bx, max_pairs=max_pairs, require_overlap=require_overlap
            )
        )(dets.mask, dets.scores, dets.boxes)
        pair_idx, pair_mask = constrain_pair_tree(
            (pair_idx, pair_mask), mesh, ref_shape=pair_mask.shape)

        out = model.apply(
            variables, det.features, batch.depth, dets.boxes, dets.mask,
            dets.labels, det.predict_logits, pair_idx, pair_mask,
            train=False, method="relate",
            image_sizes=sizes, boxes_per_cls=dets.boxes_per_cls,
            pred_labels=dets.labels,
        )
        # the sgdet re-NMS consumes the detector's raw predict_logits on
        # the kept detections (OBJECT_CLASSIFICATION_REFINE=False,
        # relation_head.py:236-245), not the predictor's one-hot obj_dists
        return jax.vmap(
            lambda rl, od, pi, pm, bpc, dm: postprocess_relations_sgdet(
                rl, od, pi, pm, bpc, dm, later_nms_thres=later_nms_thres
            )
        )(
            _rel_out(out), det.predict_logits, pair_idx, pair_mask,
            dets.boxes_per_cls, dets.mask,
        )

    return eval_step


# ----------------------------------------------------------------------
# sharding
# ----------------------------------------------------------------------
def make_mesh(data: int = 1, pair: int = 1) -> Mesh:
    devices = np.array(jax.devices()[: data * pair]).reshape(data, pair)
    return Mesh(devices, axis_names=("data", "pair"))


def batch_sharding(mesh: Mesh) -> SGGBatch:
    """NamedShardings placing the batch on the data axis."""
    s = lambda *axes: NamedSharding(mesh, P(*axes))  # noqa: E731
    return SGGBatch(
        images=s("data"),
        depth=s("data"),
        boxes=s("data"),
        box_mask=s("data"),
        labels=s("data"),
        obj_logits=s("data"),
        rel_matrix=s("data"),
        sizes=s("data"),
        attributes=s("data"),
    )


def shard_train_step(train_step, mesh: Mesh):
    """jit the step with batch sharded over ('data',) and state replicated.

    The pair axis is introduced inside the step via sharding constraints on
    the sampled pair tensors (see constrain_pairs), letting XLA split the
    relation transformer's (B*P, 19, D) workload across the 'pair' axis.
    """
    repl = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(None, batch_sharding(mesh), repl),
        donate_argnums=(0,),
    )
