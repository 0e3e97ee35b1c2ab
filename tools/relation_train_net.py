"""Relation training entry point.

The TPU rebuild of tools/relation_train_net.py (reference :124-785): config
merge → data → model → optimizer → jitted SPMD train loop with validation-
driven plateau LR, checkpointing, and metric logging.

Differences by design:
  * one process per host, all local chips via a `jax.sharding.Mesh`
    (reference: one process per GPU + NCCL DDP).
  * the train step (sampling, forward, loss, backward, update) is a single
    jitted program; losses come back as replicated scalars.
  * dataset defaults to the deterministic synthetic corpus when
    ``data.data_dir`` is empty so the tool runs hermetically.

Usage:
  python tools/relation_train_net.py --config configs/veto_vg_predcls.yaml \
      solver.max_iter=100 data.data_dir=/path/to/vg
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build_dataset(cfg, split: str):
    if not cfg.data.data_dir:
        from veto_tpu.data.synthetic import SyntheticSGGDataset

        return SyntheticSGGDataset(
            num_images=64 if split == "train" else 16,
            image_size=(256, 256),
            num_obj_classes=cfg.model.num_obj_classes,
            num_rel_classes=cfg.relation.num_classes,
            max_objects=min(cfg.data.max_boxes, 16) - 1,
            seed=cfg.solver.seed + (0 if split == "train" else 7),
            with_masks=cfg.model.mask_on,
            with_keypoints=cfg.model.num_keypoints if cfg.model.keypoint_on
            else 0,
        )
    d = cfg.data.data_dir
    if "+" in cfg.data.dataset and split == "train":
        # multi-dataset pretraining, e.g. data.dataset=VOC2007+VOC2012
        # (reference DATASETS.TRAIN tuples + concat_dataset.py; val/test
        # evaluate the first-named part)
        import dataclasses

        from veto_tpu.data.compound import ConcatDataset

        parts = [
            build_dataset(
                dataclasses.replace(
                    cfg, data=dataclasses.replace(cfg.data, dataset=part)
                ),
                split,
            )
            for part in cfg.data.dataset.split("+")
        ]
        return ConcatDataset(parts)
    name = cfg.data.dataset.split("+")[0].upper()
    if "COCO" in name:
        # detector pretraining on COCO instances (reference coco.py +
        # paths_catalog.py:14-34 layouts)
        from veto_tpu.data.coco import COCODetDataset

        year = "2017" if "2017" in name or "201" not in name else "2014"
        coco_split = "train" if split == "train" else "val"
        return COCODetDataset(
            ann_file=os.path.join(
                d, "annotations", f"instances_{coco_split}{year}.json"),
            img_dir=os.path.join(d, f"{coco_split}{year}"),
        )
    if "OI" in name or "OPEN" in name:
        # Open Images VRD (reference open_image.py + paths_catalog.py:126-137)
        from veto_tpu.data.open_image import OIDataset

        oi_split = {"train": "train", "val": "val", "test": "test"}[split]
        return OIDataset(
            oi_split,
            ann_file=os.path.join(d, "annotations", f"vrd-{oi_split}-anno.json"),
            cate_info_file=os.path.join(d, "annotations", "categories_dict.json"),
            img_dir=os.path.join(d, "images"),
            filter_duplicate_rels=cfg.data.filter_duplicate_relations,
            seed=cfg.solver.seed,
        )
    if "VOC" in name:
        from veto_tpu.data.voc import VOCDataset

        voc_split = {"train": "train", "val": "val", "test": "test"}[split]
        # VOC2007 / VOC2012 devkit subdirectories (paths_catalog.py voc/VOC{year})
        for year in ("2007", "2012"):
            if year in name and os.path.isdir(os.path.join(d, f"VOC{year}")):
                return VOCDataset(os.path.join(d, f"VOC{year}"), voc_split)
        return VOCDataset(d, voc_split)
    if "GQA" in cfg.data.dataset:
        from veto_tpu.data.gqa import GQADataset

        return GQADataset(
            split,
            dict_file=os.path.join(d, "GQA_200_ID_Info.json"),
            train_file=os.path.join(d, "GQA_200_Train.json"),
            test_file=os.path.join(d, "GQA_200_Test.json"),
            img_dir=os.path.join(d, "images"),
            depth_img_dir=os.path.join(d, "depth") if cfg.data.use_depth else None,
            num_val_im=cfg.data.num_val_images,
            filter_duplicate_rels=cfg.data.filter_duplicate_relations,
            resampling=(
                {"repeat_factor": cfg.data.repeat_factor,
                 "instance_drop_rate": cfg.data.instance_drop_rate}
                if cfg.data.resampling and split == "train" else None
            ),
            seed=cfg.solver.seed,
        )
    from veto_tpu.data.visual_genome import VGDataset

    return VGDataset(
        split,
        roidb_file=os.path.join(d, "VG-SGG-with-attri.h5"),
        dict_file=os.path.join(d, "VG-SGG-dicts-with-attri.json"),
        image_file=os.path.join(d, "image_data.json"),
        img_dir=os.path.join(d, "VG_100K"),
        depth_img_dir=os.path.join(d, "VG_100K_depth") if cfg.data.use_depth else None,
        num_val_im=cfg.data.num_val_images,
        filter_duplicate_rels=cfg.data.filter_duplicate_relations,
        filter_non_overlap=cfg.data.filter_non_overlap,
        reorder_freq_based=cfg.data.reorder_freq_based,
        resampling=(
            {"repeat_factor": cfg.data.repeat_factor,
             "instance_drop_rate": cfg.data.instance_drop_rate}
            if cfg.data.resampling and split == "train" else None
        ),
        seed=cfg.solver.seed,
    )


def batches_for(cfg, dataset, split: str):
    from veto_tpu.data.synthetic import SyntheticSGGDataset

    if isinstance(dataset, SyntheticSGGDataset):
        bsz = cfg.solver.ims_per_batch if split == "train" else cfg.test.ims_per_batch

        def gen(max_iter, start_iter=0):
            if split != "train":  # eval: one pass regardless of max_iter
                yield from dataset.batches(bsz, cfg.data.max_boxes)
                return
            it = start_iter
            while it < max_iter:
                for batch, recs in dataset.batches(bsz, cfg.data.max_boxes):
                    yield batch, recs
                    it += 1
                    if it >= max_iter:
                        return
        return gen
    from veto_tpu.data.loader import SGGLoader

    loader = SGGLoader(
        dataset,
        batch_size=cfg.solver.ims_per_batch if split == "train" else cfg.test.ims_per_batch,
        max_boxes=cfg.data.max_boxes,
        num_obj_classes=cfg.model.num_obj_classes,
        min_size=cfg.data.min_size_train if split == "train" else cfg.data.min_size_test,
        max_size=cfg.data.max_size_train if split == "train" else cfg.data.max_size_test,
        pixel_mean=cfg.data.pixel_mean,
        pixel_std=cfg.data.pixel_std,
        use_depth=cfg.data.use_depth,
        shuffle=split == "train",
        seed=cfg.solver.seed,
        host_id=jax.process_index(),
        num_hosts=jax.process_count(),
        size_divisibility=cfg.data.size_divisibility,
    )

    def gen(max_iter, start_iter=0):
        if split == "train":
            yield from loader.iterations(max_iter, start_iter)
        else:
            yield from loader.epochs()

    return gen


def build_meet_config(cfg):
    """MEET routing constants, or None when the ensemble is disabled."""
    if not cfg.ensemble.enabled:
        return None
    from veto_tpu.models.relation.predictor_meet import make_meet_config

    return make_meet_config(
        dataset="GQA" if "GQA" in cfg.data.dataset else "VG",
        split=cfg.ensemble.group_split,
        expert_group=cfg.ensemble.expert_group,
        voting=cfg.ensemble.voting,
    )


def resolve_encoder_impl(impl: str) -> str:
    """'auto' → the fused Pallas encoder on TPU, plain XLA elsewhere."""
    if impl != "auto":
        return impl
    try:
        return "fused" if jax.devices()[0].platform == "tpu" else "xla"
    except Exception:
        return "xla"


def build_model(cfg):
    from veto_tpu.models.sgg import SGGModel

    meet = build_meet_config(cfg)
    predictor = cfg.relation.predictor
    if predictor.endswith("_MEET"):
        # *_MEET registry names select the base predictor; the ensemble
        # heads are switched on via meet_group_sizes (requires
        # ensemble.enabled=true so build_meet_config returns the routing)
        predictor = predictor[: -len("_MEET")]
        if predictor == "TransLike":
            predictor = "TransLikePredictor"
    # the legacy single-scale VGG-16 body implies the reference's non-FPN
    # geometry: all ANCHOR_SIZES on one stride-16 grid, 1/16 pooling
    # (reference backbone.py:13-22, defaults.py:152-158)
    if cfg.model.backbone == "VGG-16":
        anchor_sizes = (tuple(cfg.model.anchor_sizes),)
        anchor_strides = (16,)
        pooler_scales = (0.0625,)
    else:
        anchor_sizes = cfg.model.anchor_sizes
        anchor_strides = cfg.model.anchor_strides
        pooler_scales = cfg.relation.pooler_scales
    return SGGModel(
        num_obj_classes=cfg.model.num_obj_classes,
        num_rel_classes=cfg.relation.num_classes,
        mode=cfg.relation.mode,
        predictor=predictor,
        backbone_type=cfg.model.backbone,
        attribute_on=cfg.model.attribute_on,
        num_attributes=cfg.model.num_attributes,
        stage_with_dcn=cfg.model.stage_with_dcn,
        dcn_modulated=cfg.model.dcn_modulated,
        dcn_deformable_groups=cfg.model.dcn_deformable_groups,
        mask_on=cfg.model.mask_on,
        mask_conv_layers=cfg.model.mask_conv_layers,
        mask_pooler_resolution=cfg.model.mask_pooler_resolution,
        keypoint_on=cfg.model.keypoint_on,
        num_keypoints=cfg.model.num_keypoints,
        keypoint_conv_layers=cfg.model.keypoint_conv_layers,
        keypoint_pooler_resolution=cfg.model.keypoint_pooler_resolution,
        stage_blocks=cfg.model.stage_blocks,
        groups=cfg.model.resnet_groups,
        width_per_group=cfg.model.resnet_width_per_group,
        fpn_channels=cfg.model.fpn_channels,
        fold_bn=cfg.model.fold_bn,
        anchor_sizes=anchor_sizes,
        anchor_strides=anchor_strides,
        aspect_ratios=cfg.model.aspect_ratios,
        rpn_pre_nms_top_n=cfg.model.rpn_pre_nms_top_n_test,
        rpn_post_nms_top_n=cfg.model.rpn_post_nms_top_n_test,
        rpn_nms_thresh=cfg.model.rpn_nms_thresh,
        rpn_fpn_post_nms_top_n=cfg.model.rpn_post_nms_top_n_test,
        box_pooler_resolution=cfg.model.box_pooler_resolution,
        box_mlp_dim=cfg.model.box_mlp_head_dim,
        box_score_thresh=cfg.model.box_score_thresh,
        box_nms_thresh=cfg.model.box_nms_thresh,
        nms_filter_duplicates=cfg.model.nms_filter_duplicates,
        detections_per_img=cfg.model.box_detections_per_img,
        pooler_resolution=cfg.relation.pooler_resolution,
        pooler_scales=pooler_scales,
        pooler_sampling_ratio=cfg.relation.pooler_sampling_ratio,
        meet_group_sizes=meet.group_sizes if meet else None,
        meet_experts=meet.experts_per_group if meet else 1,
        context_hidden_dim=cfg.relation.context_hidden_dim,
        context_pooling_dim=cfg.relation.context_pooling_dim,
        veto_dim=cfg.veto.t_input_dim,
        veto_layers=cfg.veto.enc_layers,
        veto_heads=cfg.veto.nheads,
        veto_patch_size=cfg.veto.patch_size,
        veto_depth_proj_dim=cfg.veto.depth_proj_dim,
        veto_visual_proj_dim=cfg.veto.visual_proj_dim,
        veto_remat=cfg.veto.remat,
        veto_encoder_impl=resolve_encoder_impl(cfg.veto.encoder_impl),
        pooler_impl=cfg.model.pooler_impl,
        causal_effect_type=cfg.relation.causal_effect_type,
        causal_fusion_type=cfg.relation.causal_fusion_type,
        bgnn_rel_aware=cfg.relation.rel_aware,
        bgnn_mp_valid_pairs=cfg.relation.mp_valid_pairs,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
    )


FROZEN_DETECTOR = ("backbone", "rpn", "box_extractor", "box_predictor")


def init_model(cfg, model, rng, small_batch):
    """Init the param tree; sgdet traces the full cascade (init_all)."""
    pi = jnp.zeros((1, 8, 2), jnp.int32)
    pm = jnp.ones((1, 8), bool)
    kwargs = dict(train=False)
    method = None
    if cfg.relation.mode in ("sgcls", "sgdet"):
        method = "init_all"
        kwargs = {}
    return model.init(
        rng, small_batch.images, small_batch.depth, small_batch.boxes,
        small_batch.box_mask, small_batch.labels, small_batch.obj_logits,
        pi, pm, method=method, **kwargs,
    )


def make_eval_fn(cfg, model, mesh=None):
    """Mode/ensemble-aware jitted eval step.  ``mesh`` (with a 'pair'
    axis) shards the candidate-pair axis across chips (SURVEY §5)."""
    from veto_tpu.engine.train import (
        make_eval_step,
        make_meet_eval_step,
        make_sgdet_eval_step,
    )

    meet = build_meet_config(cfg)
    mp = cfg.relation.max_proposal_pairs
    if meet is not None:
        return jax.jit(
            make_meet_eval_step(
                model, meet, max_pairs=mp, mode=cfg.relation.mode,
                later_nms_thres=cfg.relation.later_nms_prediction_thres,
                require_overlap=cfg.test.relation_require_overlap,
                mesh=mesh,
            )
        ), "meet"
    if cfg.relation.mode == "sgdet":
        return jax.jit(
            make_sgdet_eval_step(
                model, max_pairs=mp,
                later_nms_thres=cfg.relation.later_nms_prediction_thres,
                require_overlap=cfg.test.relation_require_overlap,
                mesh=mesh,
            )
        ), "sgdet"
    return jax.jit(make_eval_step(model, max_pairs=mp, mesh=mesh)), "gtbox"


def _feed_oi(oi_evaluator, rec, pred_boxes, classes, scores, pair_idx,
             rel_scores):
    """One image into the Open Images wmAP evaluator (oi_eval.py): triplet
    detections sorted by triple score + GT triplets from the record."""
    if len(pair_idx) == 0 or len(rec["rel_tuples"]) == 0:
        return
    prd = 1 + rel_scores[:, 1:].argmax(1)
    trip = rel_scores[:, 1:].max(1) * scores[pair_idx[:, 0]] * scores[pair_idx[:, 1]]
    order = np.argsort(-trip)
    si, oi = pair_idx[order, 0], pair_idx[order, 1]
    gt = np.asarray(rec["rel_tuples"])
    oi_evaluator.add_image(
        det_sbj_boxes=pred_boxes[si], det_obj_boxes=pred_boxes[oi],
        det_sbj_labels=classes[si], det_obj_labels=classes[oi],
        det_prd_labels=prd[order], det_scores=trip[order],
        gt_sbj_boxes=rec["boxes"][gt[:, 0]], gt_obj_boxes=rec["boxes"][gt[:, 1]],
        gt_sbj_labels=rec["labels"][gt[:, 0]],
        gt_obj_labels=rec["labels"][gt[:, 1]], gt_prd_labels=gt[:, 2],
    )


def accumulate_eval(kind, preds_out, recs, evaluator, input_sizes=None,
                    coco_evaluator=None, oi_evaluator=None):
    """Feed one batch of padded predictions into the NumPy evaluator(s).

    ``coco_evaluator`` (sgdet only) additionally collects detections for the
    COCO bbox mAP pass (reference vg_eval.py:67-182); ``oi_evaluator``
    collects triplet detections for Open Images wmAP_rel/phr."""
    if kind == "meet":
        preds, boxes, det_mask = preds_out
        for i, rec in enumerate(recs):
            pm = preds.pair_mask[i]
            dm = det_mask[i]
            if pm.sum() == 0 or dm.sum() == 0:
                continue
            remap = np.cumsum(dm) - 1
            pred_boxes = boxes[i][dm]
            if input_sizes is not None:  # rescale to original coords
                pred_boxes = pred_boxes * _scale(rec, input_sizes[i])
            evaluator.add_image(
                rec["boxes"], rec["labels"], rec["rel_tuples"], pred_boxes,
                preds.obj_labels[i][dm], preds.obj_scores[i][dm],
                remap[preds.pair_idx[i][pm]], preds.rel_scores[i][pm],
            )
            if oi_evaluator is not None:
                _feed_oi(oi_evaluator, rec, pred_boxes,
                         preds.obj_labels[i][dm], preds.obj_scores[i][dm],
                         remap[preds.pair_idx[i][pm]], preds.rel_scores[i][pm])
        return
    if kind == "sgdet":
        preds = preds_out
        for i, rec in enumerate(recs):
            dm = preds.det_mask[i]
            pm = preds.pair_mask[i]
            if dm.sum() == 0 or pm.sum() == 0:
                continue
            remap = np.cumsum(dm) - 1
            pred_boxes = preds.boxes[i][dm]
            if input_sizes is not None:
                pred_boxes = pred_boxes * _scale(rec, input_sizes[i])
            evaluator.add_image(
                rec["boxes"], rec["labels"], rec["rel_tuples"], pred_boxes,
                preds.obj_labels[i][dm], preds.obj_scores[i][dm],
                remap[preds.pair_idx[i][pm]], preds.rel_scores[i][pm],
            )
            if coco_evaluator is not None:
                coco_evaluator.add_image(
                    rec["boxes"], rec["labels"], pred_boxes,
                    preds.obj_labels[i][dm], preds.obj_scores[i][dm],
                )
            if oi_evaluator is not None:
                _feed_oi(oi_evaluator, rec, pred_boxes,
                         preds.obj_labels[i][dm], preds.obj_scores[i][dm],
                         remap[preds.pair_idx[i][pm]], preds.rel_scores[i][pm])
        return
    preds = preds_out
    for i, rec in enumerate(recs):
        n = len(rec["boxes"])
        pm = preds.pair_mask[i]
        relness = getattr(preds, "relness", None)
        evaluator.add_image(
            rec["boxes"], rec["labels"], rec["rel_tuples"], rec["boxes"],
            preds.obj_labels[i][:n], preds.obj_scores[i][:n],
            preds.pair_idx[i][pm], preds.rel_scores[i][pm],
            relness=None if relness is None else relness[i][pm],
        )
        if oi_evaluator is not None:
            _feed_oi(oi_evaluator, rec, rec["boxes"],
                     preds.obj_labels[i][:n], preds.obj_scores[i][:n],
                     preds.pair_idx[i][pm], preds.rel_scores[i][pm])


def _scale(rec, input_size):
    """(1, 4) multiplier mapping resized-image boxes → original coords
    (reference vg_eval.py:50-58 resize-back)."""
    ow, oh = rec.get("orig_size", (None, None))
    if ow is None:
        return np.ones((1, 4), np.float32)
    iw, ih = float(input_size[0]), float(input_size[1])
    return np.asarray([[ow / iw, oh / ih, ow / iw, oh / ih]], np.float32)


def make_sgg_evaluator(cfg, train_ds=None, eval_ds=None):
    """SGGEvaluator with the full reference metric set.

    The reference's vg_eval always evaluates zero-shot recall (against the
    shipped zeroshot_triplet.pytorch binary) and can report head/body/tail
    splits and stage-wise diagnostics; here the unseen-triplet set is
    derived from the datasets and cached next to the run
    (sgg_eval.py:346-366 vs reference vg_eval.py:459-583).
    """
    from veto_tpu.evaluation.sgg_eval import (
        SGGEvaluator,
        compute_zeroshot_triplets,
        vg_longtail_parts,
    )

    zs = None
    if cfg.test.zeroshot_eval and cfg.test.zeroshot_file:
        from veto_tpu.evaluation.sgg_eval import load_zeroshot_triplets_file

        zs = load_zeroshot_triplets_file(cfg.test.zeroshot_file)
    elif (
        cfg.test.zeroshot_eval
        and train_ds is not None
        and eval_ds is not None
        and hasattr(train_ds, "relationships")
        and hasattr(eval_ds, "relationships")
    ):
        cache = os.path.join(cfg.output_dir, "zeroshot_triplets.npy")
        if os.path.exists(cache):
            zs = np.load(cache)
        else:
            zs = compute_zeroshot_triplets(train_ds, eval_ds)
            os.makedirs(cfg.output_dir, exist_ok=True)
            np.save(cache, zs)
    parts = None
    if (
        cfg.test.longtail_eval
        and cfg.relation.num_classes == 51
        and "GQA" not in cfg.data.dataset
    ):
        parts = vg_longtail_parts(reordered=cfg.data.reorder_freq_based)
    return SGGEvaluator(
        mode=cfg.relation.mode,
        num_rel_classes=cfg.relation.num_classes,
        iou_thres=cfg.test.iou_threshold,
        zeroshot_triplets=zs,
        longtail_parts=parts,
        stagewise=cfg.test.stagewise_eval,
    )


def run_validation(cfg, model, state, val_gen, evaluator, eval_fn=None):
    if eval_fn is None:
        eval_fn = make_eval_fn(cfg, model)
    step, kind = eval_fn
    evaluator.reset()
    for batch, recs in val_gen(max_iter=0):
        batch = jax.tree.map(jnp.asarray, batch)
        preds = jax.device_get(step(state, batch))
        accumulate_eval(kind, preds, recs, evaluator,
                        input_sizes=np.asarray(batch.sizes))
    if cfg.test.sync_gather:
        from veto_tpu.engine.gather import sync_gather_evaluator

        sync_gather_evaluator(evaluator)  # no-op on a single host
    return evaluator.aggregate()


def train(cfg, logger):
    from veto_tpu.data.predicate_stats import predicate_counts
    from veto_tpu.engine.train import (
        batch_sharding, create_train_state, make_mesh, make_train_step,
        shard_train_step,
    )
    from veto_tpu.models.relation.predictor_veto import beta_class_weights
    from veto_tpu.solver.optim import LRController, make_optimizer
    from veto_tpu.utils.checkpoint import CheckpointManager
    from veto_tpu.utils.logger import JSONLWriter, MetricLogger

    model = build_model(cfg)
    train_ds = build_dataset(cfg, "train")
    val_ds = build_dataset(cfg, "val")
    train_gen = batches_for(cfg, train_ds, "train")
    val_gen = batches_for(cfg, val_ds, "val")

    # class weights (Rwt beta loss, roi_relation_predictors.py:4057-4070).
    # pred_counts_path loads a reference-format pred_counts.pkl (the path
    # the reference hard-codes at :4059); default = built-in constants.
    cw = None
    if cfg.pred_counts_path:
        import pickle

        with open(cfg.pred_counts_path, "rb") as fin:
            counts = np.asarray(pickle.load(fin), np.float64)
    else:
        counts = predicate_counts(
            "GQA" if "GQA" in cfg.data.dataset else "VG"
        )[: cfg.relation.num_classes]
    if cfg.relation.beta_loss:
        cw = beta_class_weights(counts, cfg.relation.beta)

    # relation loss variant (loss.py:13-120 branches made configurable)
    loss_variant = cfg.relation.loss_variant
    if cfg.relation.label_smoothing and loss_variant == "weighted_ce":
        loss_variant = "label_smoothing"
    ldam_m = None
    loss_state = None
    if loss_variant == "ldam":
        from veto_tpu.ops.losses import ldam_margins

        ldam_m = ldam_margins(counts, cfg.relation.ldam_max_m)
    elif loss_variant == "balanced_norm":
        # init_prob 0.03, bg pinned at 1 (layers/balanced_norm.py:52-54)
        lp = np.full(cfg.relation.num_classes, 0.03, np.float32)
        lp[0] = 1.0
        loss_state = jnp.asarray(lp)

    rng = jax.random.PRNGKey(cfg.solver.seed)
    first_batch, _ = next(train_gen(max_iter=1))
    small = jax.tree.map(lambda x: jnp.asarray(x[:1]), first_batch)
    variables = init_model(cfg, model, rng, small)
    if cfg.model.pretrained_detector_ckpt:
        from veto_tpu.utils.torch_import import import_detector_weights

        new_params, _, _ = import_detector_weights(
            variables["params"], cfg.model.pretrained_detector_ckpt, logger,
            fold_bn=cfg.model.fold_bn,
        )
        variables = dict(variables, params=jax.tree.map(jnp.asarray, new_params))
    tx = make_optimizer(cfg.solver, variables["params"],
                        frozen_prefixes=FROZEN_DETECTOR)
    state = create_train_state(model, tx, rng, small, variables=variables)
    if loss_state is not None:
        state = state.replace(loss_state=loss_state)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    logger.info(f"model init: {n_params / 1e6:.2f}M params")

    meet = build_meet_config(cfg)
    ndev = len(jax.devices())
    # batch must divide over the data axis; leftover devices shard the
    # relation-pair axis instead (SURVEY.md §5 pair-parallel)
    import math

    data_axis = math.gcd(ndev, cfg.solver.ims_per_batch)
    mesh = make_mesh(data=data_axis, pair=ndev // data_axis)
    if ndev > 1:
        logger.info(f"mesh: data={data_axis} pair={ndev // data_axis}")
    if cfg.relation.mode == "sgdet":
        from veto_tpu.engine.train import make_sgdet_train_step

        raw_step = make_sgdet_train_step(
            model, tx, cw,
            batch_size_per_image=cfg.relation.batch_size_per_image,
            positive_fraction=cfg.relation.positive_fraction,
            num_sample_per_gt_rel=cfg.relation.num_sample_per_gt_rel,
            require_overlap=cfg.relation.require_box_overlap,
            mesh=mesh, meet=meet,
            loss_variant=loss_variant, ldam_margins=ldam_m,
        )
    else:
        attribute_cfg = None
        if cfg.model.attribute_on:
            attribute_cfg = dict(
                loss_weight=cfg.model.attribute_loss_weight,
                bgfg_sample=cfg.model.attribute_bgfg_sample,
                bgfg_ratio=cfg.model.attribute_bgfg_ratio,
                use_binary_loss=cfg.model.attribute_use_binary_loss,
                pos_weight=cfg.model.attribute_pos_weight,
            )
        raw_step = make_train_step(
            model, tx, cw,
            batch_size_per_image=cfg.relation.batch_size_per_image,
            positive_fraction=cfg.relation.positive_fraction,
            mode=cfg.relation.mode, mesh=mesh, meet=meet,
            loss_variant=loss_variant, ldam_margins=ldam_m,
            collect_diagnostics=cfg.global_buffer_on,
            attribute_cfg=attribute_cfg,
        )
    step_fn = shard_train_step(raw_step, mesh)

    ckpt = CheckpointManager(os.path.join(cfg.output_dir, "ckpt"))
    state, extra = ckpt.restore(state)
    start_iter = int(state.step)
    ctrl = LRController(cfg.solver)
    if extra:
        ctrl.__dict__.update({
            k: v for k, v in extra.items()
            if k not in ("cfg", "decay_scale")  # decay_scale is derived now
        })
    if start_iter:
        logger.info(f"resumed from iteration {start_iter}")

    if cfg.global_buffer_on:
        from veto_tpu.utils import global_buffer

        global_buffer.enable(True)
    meters = MetricLogger()
    writer = JSONLWriter(cfg.output_dir,
                         tensorboard=cfg.tensorboard_on)
    evaluator = make_sgg_evaluator(cfg, train_ds, val_ds)
    eval_fn = None
    n_evals = 0
    if cfg.test.save_plots:
        # startup frequency-distribution PNG (reference draws it while
        # building dataset statistics, visual_genome.py:236-295)
        from veto_tpu.utils.viz import save_rel_freq_dist

        names = getattr(
            train_ds, "ind_to_predicates",
            [str(i) for i in range(cfg.relation.num_classes)],
        )[1:cfg.relation.num_classes]
        parts = (evaluator.longtail_parts[1:]
                 if evaluator.longtail_parts is not None
                 else [None] * len(names))
        p = save_rel_freq_dist(
            names, counts[1:cfg.relation.num_classes], parts,
            os.path.join(cfg.output_dir, "rel_freq_dist.png"))
        if p:
            logger.info(f"wrote {p}")

    from veto_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard().install()

    t_prev = time.time()
    for it, (batch, _) in enumerate(
        train_gen(cfg.solver.max_iter, start_iter), start=start_iter
    ):
        batch = jax.device_put(jax.tree.map(jnp.asarray, batch), batch_sharding(mesh))
        scale = jnp.asarray(ctrl.scale(it), jnp.float32)
        state, metrics = step_fn(state, batch, scale)
        buf = metrics.pop("buffer", None) if isinstance(metrics, dict) else None
        if buf is not None and cfg.global_buffer_on:
            from veto_tpu.utils import global_buffer

            bh = jax.device_get(buf)
            global_buffer.store_data("rel_pn-train_y", bh["rel_pn-train_y"],
                                     mask=bh["mask"])
            global_buffer.store_data("rel_pn-train_pred",
                                     bh["rel_pn-train_pred"], mask=bh["mask"])

        now = time.time()
        meters.update(time=now - t_prev, **jax.device_get(metrics))
        t_prev = now
        if it % 30 == 0:
            writer.write(it, jax.device_get(metrics))
        if it % 100 == 0:
            logger.info(
                f"iter {it}/{cfg.solver.max_iter}  {meters}  "
                f"lr_scale {float(scale):.4f}  eta {meters.eta_string(it, cfg.solver.max_iter)}"
            )
        if guard.requested:
            # preemption notice (SIGTERM): save after the completed step
            # and exit cleanly (SURVEY §5 preemption-aware save)
            ckpt.save(it + 1, state, extra={
                "best": ctrl.best,
                "bad_epochs": ctrl.bad_epochs,
                "cooldown_counter": ctrl.cooldown_counter,
                "num_decays": ctrl.num_decays,
            })
            logger.info(f"preemption signal: checkpointed at iter {it + 1}")
            break
        if (it + 1) % cfg.solver.checkpoint_period == 0:
            ckpt.save(it + 1, state, extra={
                "best": ctrl.best,
                "bad_epochs": ctrl.bad_epochs,
                "cooldown_counter": ctrl.cooldown_counter,
                "num_decays": ctrl.num_decays,
            })
        if (it + 1) % cfg.solver.val_period == 0:
            if eval_fn is None:
                eval_fn = make_eval_fn(cfg, model, mesh=mesh)
            agg = run_validation(cfg, model, state, val_gen, evaluator, eval_fn)
            mr100 = agg["mR"][100]
            logger.info(
                f"validation @ {it + 1}:\n{evaluator.summary_string()}"
            )
            writer.write(it + 1, {"val_mR100": mr100})
            n_evals += 1
            if cfg.test.save_plots and evaluator.longtail_parts is not None:
                # per-eval frequency→recall PNG (reference vg_eval.py:208-248)
                from veto_tpu.utils.viz import eval_plots_from_aggregate

                eval_plots_from_aggregate(
                    agg,
                    getattr(train_ds, "ind_to_predicates",
                            [str(i) for i in
                             range(cfg.relation.num_classes)]),
                    counts, evaluator.longtail_parts,
                    cfg.output_dir, cfg.relation.mode, n_evals)
            ctrl.report_validation(mr100)  # plateau signal (reference :559-563)
            if ctrl.should_stop:
                logger.info("max LR decays reached; stopping")
                break

    ckpt.save(int(state.step), state)
    if cfg.global_buffer_on:
        from veto_tpu.utils import global_buffer

        path = global_buffer.save_buffer(cfg.output_dir)
        if path:
            logger.info(f"saved global buffer: {path}")
    logger.info("training done")
    return state


def main():
    parser = argparse.ArgumentParser(description="VETO-TPU relation training")
    parser.add_argument("--config", default=None)
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (raise at the first NaN-producing op)")
    parser.add_argument("opts", nargs="*", default=[])
    args = parser.parse_args()
    if args.debug_nans:
        # re-run any op that produced a NaN eagerly and raise at the exact
        # primitive (SURVEY §5 debug toggle; jax.config jax_debug_nans)
        jax.config.update("jax_debug_nans", True)

    from veto_tpu.config import load_config
    from veto_tpu.utils.logger import setup_logger

    cfg = load_config(args.config, args.opts)
    if cfg.global_buffer_on:
        from veto_tpu.utils import global_buffer

        global_buffer.enable(True)
    os.makedirs(cfg.output_dir, exist_ok=True)
    cfg.dump(os.path.join(cfg.output_dir, "config.json"))
    logger = setup_logger("veto_tpu", cfg.output_dir, rank=jax.process_index())
    from veto_tpu.utils.env_info import collect_env_info

    logger.info("environment:\n" + collect_env_info())
    train(cfg, logger)


if __name__ == "__main__":
    main()
