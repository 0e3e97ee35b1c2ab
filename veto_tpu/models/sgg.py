"""End-to-end scene-graph-generation model.

Composes the frozen RGB detector backbone, the trainable depth backbone, the
multi-level ROI pooling, and the VETO relation predictor — the TPU
re-design of GeneralizedRCNN + ROIRelationHead for the GT-box modes
(reference generalized_rcnn.py:16-76, relation_head.py:26-257,
roi_box_feature_extractors.py:75-141 VETOFeatureExtractor).

The module is a pure function of (params, batch): pair sampling (random) and
losses live OUTSIDE in the train step, keeping this forward reusable for
train/eval and for the sgdet detection cascade later.

Layout: NHWC images, (B, N) padded proposals, (B, P) padded pairs.  The
frozen detector runs under stop_gradient in bf16; only depth backbone +
relation head receive gradients (relation_train_net.py:161-170).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from veto_tpu.ops.roi_align import multilevel_roi_align, roi_align

from .backbone.depth_resnet import DepthResNet18
from .backbone.resnet import ResNetFPNBackbone
from .relation.predictor_veto import VetoPredictor, VetoPredictorOutput


class SGGForward(NamedTuple):
    rel_logits: jnp.ndarray   # (B, P, num_rel) float32
    obj_dists: jnp.ndarray    # (B, N, num_obj) float32


class SGGModel(nn.Module):
    """predcls/sgcls forward: GT boxes in, relation logits out."""

    num_obj_classes: int = 151
    num_rel_classes: int = 51
    mode: str = "predcls"
    # detector
    stage_blocks: Tuple[int, ...] = (3, 4, 23, 3)
    groups: int = 32
    width_per_group: int = 8
    fpn_channels: int = 256
    # pooling (VETOFeatureExtractor: relation-head resolution 8,
    # box-head scales P2..P5; depth pooled at the stride-16 level)
    pooler_resolution: int = 8
    pooler_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125)
    pooler_sampling_ratio: int = 2
    depth_scale: float = 0.0625
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,       # (B, H, W, 3)
        depth: jnp.ndarray,        # (B, H, W, 1)
        boxes: jnp.ndarray,        # (B, N, 4) xyxy in padded-image coords
        box_mask: jnp.ndarray,     # (B, N)
        obj_labels: jnp.ndarray,   # (B, N) GT labels (predcls) / pred labels
        obj_logits: jnp.ndarray,   # (B, N, num_obj) detector logits
        pair_idx: jnp.ndarray,     # (B, P, 2)
        pair_mask: jnp.ndarray,    # (B, P)
        train: bool = False,
    ) -> SGGForward:
        feats = ResNetFPNBackbone(
            stage_blocks=self.stage_blocks, groups=self.groups,
            width_per_group=self.width_per_group, fpn_channels=self.fpn_channels,
            dtype=self.dtype, name="backbone",
        )(images)
        # detector is frozen during relation training
        feats = tuple(jax.lax.stop_gradient(f) for f in feats)

        depth_feat = DepthResNet18(dtype=self.dtype, name="depth_backbone")(
            depth, train=train
        )

        # ROI pooling: RGB from assigned FPN level (P2..P5), depth from its
        # single stride-16 map (reference poolers.py:144-153 uses the level-2
        # pooler for all rois).
        pool = jax.vmap(
            lambda fs, rois: multilevel_roi_align(
                fs, rois, self.pooler_scales, self.pooler_resolution,
                self.pooler_sampling_ratio,
            )
        )
        roi_feats = pool(feats[: len(self.pooler_scales)], boxes)
        depth_roi = jax.vmap(
            lambda f, rois: roi_align(
                f, rois, self.depth_scale, self.pooler_resolution,
                self.pooler_sampling_ratio,
            )
        )(depth_feat, boxes)

        out: VetoPredictorOutput = VetoPredictor(
            num_obj_classes=self.num_obj_classes,
            num_rel_classes=self.num_rel_classes,
            mode=self.mode,
            dtype=self.dtype,
            name="relation",
        )(
            boxes, box_mask, obj_labels, obj_logits, pair_idx, pair_mask,
            roi_feats, depth_roi, train=train,
        )
        return SGGForward(rel_logits=out.rel_logits, obj_dists=out.obj_dists)
