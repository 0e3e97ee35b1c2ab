"""End-to-end scene-graph-generation model, all three task modes.

Composes the frozen RGB detector (ResNeXt-FPN backbone, RPN, box head), the
trainable depth backbone, multi-level ROI pooling, and the VETO relation
predictor — the TPU re-design of GeneralizedRCNN + CombinedROIHeads +
ROIRelationHead (reference generalized_rcnn.py:16-76, roi_heads.py:11-45,
box_head.py:40-144, relation_head.py:26-257).

Mode map (relation_train_net.py:735-741):
  * predcls — GT boxes + GT labels; only ``__call__`` path, no detector head.
  * sgcls   — GT boxes; the frozen box predictor produces ``predict_logits``
    on pooled GT boxes and ``pred_labels`` via obj_prediction_nms
    (box_head.py add_predict_info:20-37).
  * sgdet   — full cascade: ``detect`` runs backbone→RPN→box head→
    post-processing (80 detections with ``boxes_per_cls``), then ``relate``
    runs the relation head over those detections.  Pair sampling happens
    OUTSIDE the module (engine/train.py) so forwards stay pure.

The module is pure-functional: (params, batch) → logits.  The frozen
detector runs under stop_gradient in bf16; only the depth backbone +
relation head receive gradients (relation_train_net.py:161-170).

Layout: NHWC images, (B, N) padded proposals, (B, P) padded pairs.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from veto_tpu.ops.nms import obj_prediction_nms
from veto_tpu.ops.roi_align import roi_align
from veto_tpu.ops.roi_align_windowed import multilevel_roi_align_batched

from .backbone.depth_resnet import DepthResNet18
from .backbone.resnet import ResNetFPNBackbone
from .detector.anchors import fpn_anchors
from .detector.box_head import (
    BoxFeatureExtractor,
    BoxPredictor,
    Detections,
    box_postprocess,
)
from .detector.rpn import RPNHead, flatten_level, rpn_select_proposals
from .relation.predictor_meet import MeetPredictor
from .relation.predictor_veto import VetoPredictor, VetoPredictorOutput


class SGGForward(NamedTuple):
    rel_logits: jnp.ndarray   # (B, P, num_rel) float32
    obj_dists: jnp.ndarray    # (B, N, num_obj) float32
    pred_labels: jnp.ndarray  # (B, N) int32 predicted object labels
    predict_logits: jnp.ndarray  # (B, N, num_obj) frozen box-head logits
    binary_preds: Optional[jnp.ndarray] = None  # VCTree aux relatedness
    # RelatednessTestPredictor confidence logits for RelAwareLoss
    relness_logits: Optional[jnp.ndarray] = None
    # ATTRIBUTE_ON: (B, N, num_attributes) box-level attribute logits
    attribute_logits: Optional[jnp.ndarray] = None


class DetectOutput(NamedTuple):
    features: Tuple[jnp.ndarray, ...]   # FPN maps (stop-gradient)
    detections: Detections              # batched (B, D, ...) fields
    predict_logits: jnp.ndarray         # (B, D, num_obj)


class SGGModel(nn.Module):
    """Multi-mode SGG model; ``mode`` selects the forward topology."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    mode: str = "predcls"
    # detector conv body (reference registry backbone.py:13-55): the FPN
    # ResNet/ResNeXt family, or the legacy single-scale "VGG-16" body.
    # With VGG-16, pass the matching non-FPN RPN/pooler geometry:
    # anchor_sizes=((32, 64, 128, 256, 512),), anchor_strides=(16,),
    # pooler_scales=(0.0625,) (defaults.py:152-158, vgg.py).
    backbone_type: str = "R-101-FPN"
    stage_blocks: Tuple[int, ...] = (3, 4, 23, 3)
    groups: int = 32
    width_per_group: int = 8
    # RESNETS.STRIDE_IN_1X1 — False in the shipped config
    # (VETO_final.yaml:12; reference defaults.py legacy default is True)
    stride_in_1x1: bool = False
    fpn_channels: int = 256
    # RPN (configs/VETO_final.yaml:17-29)
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    anchor_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    aspect_ratios: Tuple[float, ...] = (0.23232838, 0.63365731, 1.28478321, 3.15089189)
    rpn_pre_nms_top_n: int = 6000
    rpn_post_nms_top_n: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_fpn_post_nms_top_n: int = 1000
    rpn_min_size: float = 0.0
    # box head (yaml :30-46)
    box_pooler_resolution: int = 7
    box_mlp_dim: int = 4096
    box_score_thresh: float = 0.01
    box_nms_thresh: float = 0.3
    box_post_nms_per_cls_topn: int = 300
    nms_filter_duplicates: bool = True
    detections_per_img: int = 80
    # pooling (VETOFeatureExtractor: relation-head resolution 8,
    # box-head scales P2..P5; depth pooled at the stride-16 level)
    pooler_resolution: int = 8
    pooler_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125)
    pooler_sampling_ratio: int = 2
    depth_scale: float = 0.0625
    # relation predictor selection (reference ROI_RELATION_PREDICTOR registry)
    predictor: str = "VETOPredictor"
    # MEET ensemble (None = plain VETOPredictor)
    meet_group_sizes: Optional[Tuple[int, ...]] = None
    meet_experts: int = 1
    # legacy-predictor hyperparams (CONTEXT_HIDDEN_DIM / CONTEXT_POOLING_DIM)
    context_hidden_dim: int = 512
    context_pooling_dim: int = 4096
    # VETO transformer hyperparams (VETOTRANSFORMER.*, defaults.py:331-338)
    veto_dim: int = 576
    veto_layers: int = 6
    veto_heads: int = 6
    veto_patch_size: int = 2
    veto_depth_proj_dim: int = 512
    veto_visual_proj_dim: int = 64
    # rematerialize the pair-transformer encoder in backward (memory vs
    # compute: off saves one full trunk recompute per step)
    veto_remat: bool = True
    # encoder implementation: 'xla' (portable) | 'fused' (Pallas, TPU)
    veto_encoder_impl: str = "xla"
    # multi-level pooler implementation: 'separable' (full-map matmuls,
    # portable) | 'windowed' (per-roi window DMA Pallas kernel, TPU) |
    # 'auto' (windowed on TPU backends)
    pooler_impl: str = "auto"
    embed_dim: int = 200
    # fold the frozen detector's BatchNorm affines into the conv weights
    # (backbone/resnet.py fold_frozen_bn_params); removes every BN
    # elementwise pass from the hot path — exact, since the detector is
    # frozen (relation_train_net.py:161-165)
    fold_bn: bool = False
    dtype: Any = jnp.bfloat16

    LEGACY_PREDICTORS = (
        "TransformerPredictor", "TransLikePredictor", "IMPPredictor",
        "MotifPredictor", "VCTreePredictor", "BGNNPredictor",
        "GPSNetPredictor", "MSDNPredictor", "CausalAnalysisPredictor",
        "KERNPredictor", "NaivePredictor", "RelatednessTestPredictor",
        "AGRCNNPredictor",
    )
    # legacy predictors that accept the MEET per-group ensemble heads
    # (MotifPredictor_MEET / TransLikePredictor_MEET / VCTreePredictor_MEET)
    MEET_CAPABLE = (
        "TransformerPredictor", "TransLikePredictor", "MotifPredictor",
        "VCTreePredictor",
    )
    # attribute head (MODEL.ATTRIBUTE_ON, defaults.py:251-262); shares the
    # box head's MLP features (SHARE_BOX_FEATURE_EXTRACTOR=True)
    attribute_on: bool = False
    num_attributes: int = 201
    # deformable conv stages (MODEL.RESNETS.STAGE_WITH_DCN /
    # WITH_MODULATED_DCN / DEFORMABLE_GROUPS; ops/deform_conv.py)
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    dcn_modulated: bool = True
    dcn_deformable_groups: int = 1
    # mask head (MODEL.MASK_ON + ROI_MASK_HEAD.*, defaults.py:263-280);
    # FPN variant: own 14x14 pooling + conv stack + deconv predictor
    mask_on: bool = False
    mask_conv_layers: Tuple[int, ...] = (256, 256, 256, 256)
    mask_pooler_resolution: int = 14
    # keypoint head (MODEL.KEYPOINT_ON + ROI_KEYPOINT_HEAD.*,
    # defaults.py:282-292)
    keypoint_on: bool = False
    num_keypoints: int = 17
    keypoint_conv_layers: Tuple[int, ...] = tuple(512 for _ in range(8))
    keypoint_pooler_resolution: int = 14
    # causal predictor knobs (MODEL.ROI_RELATION_HEAD.CAUSAL.*)
    causal_effect_type: str = "none"
    causal_fusion_type: str = "sum"
    # BGNN/MSDN relation-confidence-aware mode
    bgnn_rel_aware: bool = False
    bgnn_mp_valid_pairs: int = 200

    def setup(self):
        if self.backbone_type == "VGG-16":
            from .backbone.vgg import VGG16Body
            self.backbone = VGG16Body(dtype=self.dtype)
        else:
            self.backbone = ResNetFPNBackbone(
                stage_blocks=self.stage_blocks, groups=self.groups,
                width_per_group=self.width_per_group, fpn_channels=self.fpn_channels,
                fold_bn=self.fold_bn, stride_in_1x1=self.stride_in_1x1,
                stage_with_dcn=self.stage_with_dcn,
                dcn_modulated=self.dcn_modulated,
                dcn_deformable_groups=self.dcn_deformable_groups,
                dtype=self.dtype,
            )
        self.depth_backbone = DepthResNet18(dtype=self.dtype)
        # anchors per position: len(ratios) per FPN level (one size each);
        # len(ratios) * len(sizes) for a single-level body (scale enum)
        sz0 = self.anchor_sizes[0]
        sizes_per_level = len(sz0) if isinstance(sz0, (tuple, list)) else 1
        self.rpn = RPNHead(
            mid_channels=256,
            num_anchors=len(self.aspect_ratios) * sizes_per_level,
            dtype=self.dtype,
        )
        self.box_extractor = BoxFeatureExtractor(
            mlp_dim=self.box_mlp_dim, dtype=self.dtype
        )
        self.box_predictor = BoxPredictor(
            num_classes=self.num_obj_classes, dtype=self.dtype
        )
        if self.attribute_on:
            from .detector.attribute_head import AttributePredictor
            self.attribute_predictor = AttributePredictor(
                num_attributes=self.num_attributes, dtype=self.dtype
            )
        if self.mask_on:
            from .detector.mask_head import MaskFeatureExtractor, MaskPredictor
            self.mask_extractor = MaskFeatureExtractor(
                conv_layers=self.mask_conv_layers, dtype=self.dtype
            )
            self.mask_predictor = MaskPredictor(
                num_classes=self.num_obj_classes,
                dim_reduced=self.mask_conv_layers[-1], dtype=self.dtype
            )
        if self.keypoint_on:
            from .detector.keypoint_head import (
                KeypointFeatureExtractor, KeypointPredictor,
            )
            self.keypoint_extractor = KeypointFeatureExtractor(
                conv_layers=self.keypoint_conv_layers, dtype=self.dtype
            )
            self.keypoint_predictor = KeypointPredictor(
                num_keypoints=self.num_keypoints, dtype=self.dtype
            )
        if self.predictor in self.LEGACY_PREDICTORS:
            from .relation.legacy import (
                AGRCNNPredictor,
                BGNNPredictor,
                CausalPredictor,
                KERNPredictor,
                GPSNetPredictor,
                MSDNPredictor,
                IMPPredictor,
                MotifPredictor,
                NaivePredictor,
                RelatednessTestPredictor,
                TransformerPredictor,
                TransLikePredictor,
                VCTreePredictor,
            )
            from .relation.union_features import UnionFeatureExtractor

            cls = {
                "TransformerPredictor": TransformerPredictor,
                "TransLikePredictor": TransLikePredictor,
                "IMPPredictor": IMPPredictor,
                "MotifPredictor": MotifPredictor,
                "VCTreePredictor": VCTreePredictor,
                "BGNNPredictor": BGNNPredictor,
                "GPSNetPredictor": GPSNetPredictor,
                "MSDNPredictor": MSDNPredictor,
                "CausalAnalysisPredictor": CausalPredictor,
                "KERNPredictor": KERNPredictor,
                "NaivePredictor": NaivePredictor,
                "RelatednessTestPredictor": RelatednessTestPredictor,
                "AGRCNNPredictor": AGRCNNPredictor,
            }[self.predictor]
            kwargs = dict(
                num_obj_classes=self.num_obj_classes,
                num_rel_classes=self.num_rel_classes,
                hidden_dim=self.context_hidden_dim,
                pooling_dim=self.context_pooling_dim,
                in_channels=self.context_pooling_dim,
                mode=self.mode,
                dtype=self.dtype,
            )
            if self.predictor == "CausalAnalysisPredictor":
                kwargs["effect_type"] = self.causal_effect_type
                kwargs["fusion_type"] = self.causal_fusion_type
            if (self.meet_group_sizes is not None
                    and self.predictor in self.MEET_CAPABLE):
                kwargs["meet_group_sizes"] = self.meet_group_sizes
                kwargs["meet_experts"] = self.meet_experts
            if self.predictor in ("BGNNPredictor", "MSDNPredictor"):
                kwargs["rel_aware"] = self.bgnn_rel_aware
                kwargs["mp_valid_pairs"] = self.bgnn_mp_valid_pairs
            self.relation = cls(**kwargs)
            # trainable relation copy of the box MLP (reference
            # make_roi_box_feature_extractor(..., for_relation=True))
            self.rel_box_extractor = BoxFeatureExtractor(
                mlp_dim=self.context_pooling_dim, dtype=self.dtype
            )
            self.union_extractor = UnionFeatureExtractor(
                pooler_resolution=self.box_pooler_resolution,
                pooler_scales=self.pooler_scales,
                pooler_sampling_ratio=self.pooler_sampling_ratio,
                pooler_impl=self.pooler_impl,
                mlp_dim=self.context_pooling_dim,
                in_channels=self.fpn_channels,
                dtype=self.dtype,
            )
        elif self.meet_group_sizes is not None:
            self.relation = MeetPredictor(
                group_sizes=self.meet_group_sizes,
                experts_per_group=self.meet_experts,
                num_obj_classes=self.num_obj_classes,
                num_rel_classes=self.num_rel_classes,
                embed_dim=self.embed_dim,
                dim=self.veto_dim,
                layers=self.veto_layers,
                heads=self.veto_heads,
                patch_size=self.veto_patch_size,
                depth_proj_dim=self.veto_depth_proj_dim,
                visual_proj_dim=self.veto_visual_proj_dim,
                mode=self.mode,
                dtype=self.dtype,
                remat=self.veto_remat,
                encoder_impl=self.veto_encoder_impl,
            )
        else:
            self.relation = VetoPredictor(
                num_obj_classes=self.num_obj_classes,
                num_rel_classes=self.num_rel_classes,
                embed_dim=self.embed_dim,
                dim=self.veto_dim,
                layers=self.veto_layers,
                heads=self.veto_heads,
                patch_size=self.veto_patch_size,
                depth_proj_dim=self.veto_depth_proj_dim,
                visual_proj_dim=self.veto_visual_proj_dim,
                mode=self.mode,
                dtype=self.dtype,
                remat=self.veto_remat,
                encoder_impl=self.veto_encoder_impl,
            )

    # ------------------------------------------------------------------
    # shared stages
    # ------------------------------------------------------------------
    def extract_features(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """Frozen FPN pyramid (P2..P6), stop-gradient."""
        feats = self.backbone(images)
        return tuple(jax.lax.stop_gradient(f) for f in feats)

    def _pool_boxes(self, feats, boxes, resolution):
        """Multi-level 8x8/7x7 RGB pooling, vmapped over the batch.

        Single-level bodies (VGG-16) bypass the FPN level mapper — every
        roi pools from the one stride-16 map (reference make_pooler with
        one POOLER_SCALES entry skips LevelMapper, poolers.py:105-118).
        """
        if len(self.pooler_scales) == 1:
            return jax.vmap(
                lambda fs, rois: roi_align(
                    fs, rois, self.pooler_scales[0], resolution,
                    self.pooler_sampling_ratio,
                )
            )(feats[0], boxes)
        return multilevel_roi_align_batched(
            feats[: len(self.pooler_scales)], boxes, self.pooler_scales,
            resolution, self.pooler_sampling_ratio, impl=self.pooler_impl,
        )

    def _box_logits(self, feats, boxes):
        """predict_logits + deltas for rois via the frozen box head."""
        pooled = self._pool_boxes(feats, boxes, self.box_pooler_resolution)
        x = self.box_extractor(pooled)
        logits, deltas = self.box_predictor(x)
        return (
            jax.lax.stop_gradient(logits.astype(jnp.float32)),
            jax.lax.stop_gradient(deltas.astype(jnp.float32)),
        )

    def attribute_forward(self, feats, boxes):
        """Attribute logits via the shared box-head MLP features
        (ROIAttributeHead with SHARE_BOX_FEATURE_EXTRACTOR,
        attribute_head.py:28-58).  (B, D, 4) boxes -> (B, D, A) logits."""
        pooled = self._pool_boxes(feats, boxes, self.box_pooler_resolution)
        x = self.box_extractor(pooled)
        return self.attribute_predictor(x)

    # ------------------------------------------------------------------
    # detector pretraining (no stop_gradient — the detector trains)
    # ------------------------------------------------------------------
    def detector_forward(self, images: jnp.ndarray):
        """Trainable FPN features + raw RPN maps (detector_pretrain_net.py
        path: RELATION_ON=False, RPN + box losses active)."""
        feats = self.backbone(images)
        obj_maps, reg_maps = self.rpn(feats)
        return feats, obj_maps, reg_maps

    def box_forward(self, feats, rois):
        """Trainable box head on given rois → (class_logits, box_deltas)."""
        pooled = self._pool_boxes(feats, rois, self.box_pooler_resolution)
        x = self.box_extractor(pooled)
        logits, deltas = self.box_predictor(x)
        return logits.astype(jnp.float32), deltas.astype(jnp.float32)

    def mask_forward(self, feats, rois):
        """Mask head on given rois (MODEL.MASK_ON): own 14x14 pooling →
        conv stack → deconv predictor (ROIMaskHead with
        SHARE_BOX_FEATURE_EXTRACTOR=False, mask_head.py:46-79).
        (B, R, 4) rois → (B, R, 2M, 2M, C) per-class mask logits."""
        pooled = self._pool_boxes(feats, rois, self.mask_pooler_resolution)
        b, r = pooled.shape[:2]
        flat = pooled.reshape((b * r,) + pooled.shape[2:])
        logits = self.mask_predictor(self.mask_extractor(flat))
        return logits.reshape((b, r) + logits.shape[1:])

    def keypoint_forward(self, feats, rois):
        """Keypoint head on given rois (MODEL.KEYPOINT_ON):
        (B, R, 4) rois → (B, R, 4M, 4M, K) heatmap logits
        (ROIKeypointHead, keypoint_head.py:24-51)."""
        pooled = self._pool_boxes(
            feats, rois, self.keypoint_pooler_resolution)
        b, r = pooled.shape[:2]
        flat = pooled.reshape((b * r,) + pooled.shape[2:])
        logits = self.keypoint_predictor(self.keypoint_extractor(flat))
        return logits.reshape((b, r) + logits.shape[1:])

    # ------------------------------------------------------------------
    # sgdet detection cascade
    # ------------------------------------------------------------------
    def detect(
        self,
        images: jnp.ndarray,       # (B, H, W, 3)
        image_sizes: jnp.ndarray,  # (B, 2) = (w, h) un-padded
    ) -> DetectOutput:
        """backbone → RPN → box head → 80 padded detections per image."""
        feats = self.extract_features(images)
        h, w = images.shape[1:3]
        anchor_list = fpn_anchors(
            (h, w), self.anchor_sizes, self.anchor_strides, self.aspect_ratios
        )
        anchors = tuple(jnp.asarray(a) for a, _ in anchor_list)

        obj_maps, reg_maps = self.rpn(feats)
        obj_maps = tuple(jax.lax.stop_gradient(m.astype(jnp.float32)) for m in obj_maps)
        reg_maps = tuple(jax.lax.stop_gradient(m.astype(jnp.float32)) for m in reg_maps)

        def propose_one(obj_b, reg_b, size):
            flat = [flatten_level(o, r) for o, r in zip(obj_b, reg_b)]
            return rpn_select_proposals(
                [f[0] for f in flat], [f[1] for f in flat], anchors, size,
                self.rpn_pre_nms_top_n, self.rpn_post_nms_top_n,
                self.rpn_nms_thresh, self.rpn_fpn_post_nms_top_n,
                self.rpn_min_size,
            )

        proposals = jax.vmap(propose_one)(obj_maps, reg_maps, image_sizes)

        logits, deltas = self._box_logits(feats, proposals.boxes)
        dets = jax.vmap(
            lambda lg, dl, bx, mk, sz: box_postprocess(
                lg, dl, bx, mk, sz,
                score_thresh=self.box_score_thresh,
                nms_thresh=self.box_nms_thresh,
                post_nms_per_cls_topn=self.box_post_nms_per_cls_topn,
                nms_filter_duplicates=self.nms_filter_duplicates,
                detections_per_img=self.detections_per_img,
            )
        )(logits, deltas, proposals.boxes, proposals.mask, image_sizes)

        det_logits = jnp.take_along_axis(logits, dets.orig_idx[..., None], axis=1)
        return DetectOutput(
            features=feats, detections=dets, predict_logits=det_logits
        )

    def detect_candidates(self, images: jnp.ndarray, image_sizes: jnp.ndarray):
        """Pre-NMS detection candidates for bbox-aug TTA
        (engine/bbox_aug.py): softmax class scores + per-class decoded boxes
        for every RPN proposal, BEFORE filter_results — the reference merges
        augmented candidates at exactly this point (bbox_aug.py:53-68)."""
        from veto_tpu.ops.box_ops import clip_to_image, decode_boxes

        feats = self.extract_features(images)
        h, w = images.shape[1:3]
        anchor_list = fpn_anchors(
            (h, w), self.anchor_sizes, self.anchor_strides, self.aspect_ratios
        )
        anchors = tuple(jnp.asarray(a) for a, _ in anchor_list)
        obj_maps, reg_maps = self.rpn(feats)
        obj_maps = tuple(jax.lax.stop_gradient(m.astype(jnp.float32)) for m in obj_maps)
        reg_maps = tuple(jax.lax.stop_gradient(m.astype(jnp.float32)) for m in reg_maps)

        def propose_one(obj_b, reg_b, size):
            flat = [flatten_level(o, r) for o, r in zip(obj_b, reg_b)]
            return rpn_select_proposals(
                [f[0] for f in flat], [f[1] for f in flat], anchors, size,
                self.rpn_pre_nms_top_n, self.rpn_post_nms_top_n,
                self.rpn_nms_thresh, self.rpn_fpn_post_nms_top_n,
                self.rpn_min_size,
            )

        proposals = jax.vmap(propose_one)(obj_maps, reg_maps, image_sizes)
        logits, deltas = self._box_logits(feats, proposals.boxes)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        b, p, c = prob.shape
        bpc = jax.vmap(
            lambda dl, bx, sz: clip_to_image(
                decode_boxes(dl.astype(jnp.float32), bx).reshape(p, c, 4), sz
            )
        )(deltas, proposals.boxes, image_sizes)
        return feats, prob, bpc, proposals.mask

    # ------------------------------------------------------------------
    # relation head over given boxes (GT or detections)
    # ------------------------------------------------------------------
    def relate(
        self,
        feats: Tuple[jnp.ndarray, ...],
        depth: jnp.ndarray,
        boxes: jnp.ndarray,
        box_mask: jnp.ndarray,
        obj_labels: jnp.ndarray,
        obj_logits: jnp.ndarray,
        pair_idx: jnp.ndarray,
        pair_mask: jnp.ndarray,
        train: bool = False,
        image_sizes: Optional[jnp.ndarray] = None,
        boxes_per_cls: Optional[jnp.ndarray] = None,
        pred_labels: Optional[jnp.ndarray] = None,
    ):
        if self.predictor in self.LEGACY_PREDICTORS:
            # legacy path: 7x7 box MLP features + union features, no depth
            # (reference relation_head.py:140-190 non-VETO branch)
            if image_sizes is None:
                h, w = depth.shape[1:3]
                image_sizes = jnp.tile(
                    jnp.asarray([[w, h]], jnp.float32), (boxes.shape[0], 1)
                )
            pooled = self._pool_boxes(feats, boxes, self.box_pooler_resolution)
            roi_vec = self.rel_box_extractor(pooled)
            union = self.union_extractor(
                feats, boxes, pair_idx, image_sizes, train=train
            )
            kwargs = {}
            if self.predictor in ("IMPPredictor", "NaivePredictor",
                                  "RelatednessTestPredictor"):
                kwargs["pred_labels"] = pred_labels
            return self.relation(
                boxes, box_mask, obj_labels, obj_logits, pair_idx, pair_mask,
                roi_vec, union, image_sizes, boxes_per_cls, train=train,
                **kwargs,
            )
        depth_feat = self.depth_backbone(depth, train=train)
        roi_feats = self._pool_boxes(feats, boxes, self.pooler_resolution)
        depth_roi = jax.vmap(
            lambda f, rois: roi_align(
                f, rois, self.depth_scale, self.pooler_resolution,
                self.pooler_sampling_ratio,
            )
        )(depth_feat, boxes)
        return self.relation(
            boxes, box_mask, obj_labels, obj_logits, pair_idx, pair_mask,
            roi_feats, depth_roi, train=train,
        )

    # ------------------------------------------------------------------
    # GT-box forward (predcls / sgcls) — the original entry point
    # ------------------------------------------------------------------
    def __call__(
        self,
        images: jnp.ndarray,       # (B, H, W, 3)
        depth: jnp.ndarray,        # (B, H, W, 1)
        boxes: jnp.ndarray,        # (B, N, 4) xyxy in padded-image coords
        box_mask: jnp.ndarray,     # (B, N)
        obj_labels: jnp.ndarray,   # (B, N) GT labels
        obj_logits: jnp.ndarray,   # (B, N, num_obj) unused placeholder
        pair_idx: jnp.ndarray,     # (B, P, 2)
        pair_mask: jnp.ndarray,    # (B, P)
        train: bool = False,
    ) -> SGGForward:
        feats = self.extract_features(images)

        if self.mode == "sgcls":
            # frozen box predictor on GT boxes (box_head.py:85-90);
            # pred_labels via tiled-box obj_prediction_nms at 0.5
            # (add_predict_info:20-37)
            predict_logits, _ = self._box_logits(feats, boxes)
            tiled = jnp.broadcast_to(
                boxes[:, :, None, :],
                boxes.shape[:2] + (self.num_obj_classes, 4),
            )
            pred_labels = jax.vmap(
                lambda b, lg, m: obj_prediction_nms(b, lg, 0.5, valid_mask=m)
            )(tiled, predict_logits, box_mask)
            rel_labels_in = pred_labels
        else:
            # ±1000 GT-logit injection (to_onehot fill — relation_head.py
            # :104-111) so eval softmax obj_scores are exactly 1.0
            predict_logits = (
                jax.nn.one_hot(
                    obj_labels, self.num_obj_classes, dtype=jnp.float32
                ) * 2000.0 - 1000.0
            )
            pred_labels = obj_labels
            rel_labels_in = obj_labels

        # ATTRIBUTE_ON: box-level attribute logits off the shared box
        # features (attribute_head.py ROIAttributeHead semantics)
        att_logits = (
            self.attribute_forward(feats, boxes) if self.attribute_on else None
        )

        if self.predictor in self.LEGACY_PREDICTORS:
            # legacy context models embed GT labels at train and refine
            # their own predictions; feed GT labels + box-head logits
            out = self.relate(
                feats, depth, boxes, box_mask, obj_labels, predict_logits,
                pair_idx, pair_mask, train=train, pred_labels=pred_labels,
            )
            rel = out.rel_dists
            if rel is None:
                rel = out.group_logits  # legacy MEET ensemble heads
            return SGGForward(
                rel_logits=rel,
                obj_dists=out.obj_dists,
                pred_labels=out.obj_preds,
                predict_logits=predict_logits,
                binary_preds=getattr(out, "binary_preds", None),
                relness_logits=getattr(out, "relness_logits", None),
                attribute_logits=att_logits,
            )
        out = self.relate(
            feats, depth, boxes, box_mask, rel_labels_in, predict_logits,
            pair_idx, pair_mask, train=train,
        )
        # MEET returns nested per-expert/per-group logits; plain VETO a
        # single (B, P, C) array — both ride the same pytree slot.
        rel = getattr(out, "rel_logits", None)
        if rel is None:
            rel = out.group_logits
        return SGGForward(
            rel_logits=rel,
            obj_dists=out.obj_dists,
            pred_labels=pred_labels,
            predict_logits=predict_logits,
            attribute_logits=att_logits,
        )

    # ------------------------------------------------------------------
    def init_all(
        self, images, depth, boxes, box_mask, obj_labels, obj_logits,
        pair_idx, pair_mask, image_sizes=None,
    ):
        """Trace every submodule once so init builds the full param tree."""
        if image_sizes is None:
            h, w = images.shape[1:3]
            image_sizes = jnp.tile(
                jnp.asarray([[w, h]], jnp.float32), (images.shape[0], 1)
            )
        det = self.detect(images, image_sizes)
        if self.mask_on:
            self.mask_forward(det.features, boxes[:, :1])
        if self.keypoint_on:
            self.keypoint_forward(det.features, boxes[:, :1])
        out = self.relate(
            det.features, depth, boxes, box_mask, obj_labels, obj_logits,
            pair_idx, pair_mask, train=False,
        )
        return out
