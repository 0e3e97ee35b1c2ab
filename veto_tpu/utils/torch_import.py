"""Torch → JAX detector weight import.

The pretrained Faster R-CNN detectors for VETO come from the
Scene-Graph-Benchmark lineage as torch checkpoints (maskrcnn-benchmark
module naming).  This is the TPU rebuild's equivalent of
DetectronCheckpointer.load + model_serialization name matching
(reference utils/checkpoint.py:138-177, utils/model_serialization.py).

Layout conversions:
  * conv kernels  (O, I, kH, kW) → (kH, kW, I, O)   (grouped convs too)
  * linear        (out, in)      → (in, out)
  * FrozenBatchNorm buffers fold into (scale, bias):
      scale = weight * rsqrt(running_var), bias = bias - mean * scale
    (reference layers/batch_norm.py:28-30 — note: no eps)

Covered modules: backbone body + FPN, RPN head, box fc6/fc7 + predictor —
i.e. everything under FROZEN_DETECTOR.  The depth backbone and relation
head are trained from scratch (reference trains them too).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into {name: np.ndarray} (CPU, no grad)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _fc(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    w = sd[f"{prefix}.weight"]
    b = sd[f"{prefix}.bias"]
    mean = sd[f"{prefix}.running_mean"]
    var = sd[f"{prefix}.running_var"]
    scale = w / np.sqrt(var)
    return scale.astype(np.float32), (b - mean * scale).astype(np.float32)


def detector_param_updates(sd: Dict[str, np.ndarray]) -> Dict[Tuple[str, ...], np.ndarray]:
    """Translate a maskrcnn-benchmark state dict into veto_tpu param paths.

    Returns {path tuple → array}; paths are relative to the SGGModel params
    root, e.g. ('backbone', 'body', 'layer1_block0', 'conv1', 'kernel').
    """
    out: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(path, arr):
        out[tuple(path)] = np.asarray(arr, np.float32)

    # ---- stem
    if "backbone.body.stem.conv1.weight" in sd:
        put(("backbone", "body", "stem_conv", "kernel"),
            _conv(sd["backbone.body.stem.conv1.weight"]))
        s, b = _fold_bn(sd, "backbone.body.stem.bn1")
        put(("backbone", "body", "stem_bn", "scale"), s)
        put(("backbone", "body", "stem_bn", "bias"), b)

    # ---- residual stages
    pat = re.compile(r"^backbone\.body\.layer(\d)\.(\d+)\.(conv\d)\.weight$")
    for k in list(sd):
        m = pat.match(k)
        if not m:
            continue
        layer, block, conv = m.group(1), m.group(2), m.group(3)
        base = ("backbone", "body", f"layer{layer}_block{block}")
        put(base + (conv, "kernel"), _conv(sd[k]))
        bn = conv.replace("conv", "bn")
        s, b = _fold_bn(sd, f"backbone.body.layer{layer}.{block}.{bn}")
        put(base + (bn, "scale"), s)
        put(base + (bn, "bias"), b)
    pat_ds = re.compile(r"^backbone\.body\.layer(\d)\.(\d+)\.downsample\.0\.weight$")
    for k in list(sd):
        m = pat_ds.match(k)
        if not m:
            continue
        layer, block = m.group(1), m.group(2)
        base = ("backbone", "body", f"layer{layer}_block{block}")
        put(base + ("downsample_conv", "kernel"), _conv(sd[k]))
        s, b = _fold_bn(sd, f"backbone.body.layer{layer}.{block}.downsample.1")
        put(base + ("downsample_bn", "scale"), s)
        put(base + ("downsample_bn", "bias"), b)

    # ---- FPN (same 1-indexed names on both sides, fpn.py)
    pat_fpn = re.compile(r"^backbone\.fpn\.fpn_(inner|layer)(\d)\.(weight|bias)$")
    for k in list(sd):
        m = pat_fpn.match(k)
        if not m:
            continue
        kind, idx, wb = m.group(1), int(m.group(2)), m.group(3)
        name = f"fpn_{kind}{idx}"
        if wb == "weight":
            put(("backbone", "fpn", name, "kernel"), _conv(sd[k]))
        else:
            put(("backbone", "fpn", name, "bias"), sd[k])

    # ---- VGG-16 body (legacy single-scale backbone, vgg.py:32-44):
    # checkpoint names are either torchvision ``features.<i>`` or the
    # reference's wrapped ``backbone.conv_body.<i>`` Sequential indices
    pat_vgg = re.compile(r"^(?:backbone\.conv_body|features)\.(\d+)\.weight$")
    for k in list(sd):
        m = pat_vgg.match(k)
        if not m:
            continue
        idx = int(m.group(1))
        put(("backbone", f"conv{idx}", "kernel"), _conv(sd[k]))
        put(("backbone", f"conv{idx}", "bias"),
            sd[k.replace(".weight", ".bias")])

    # ---- RPN head
    for src, dst in (("conv", "conv"), ("cls_logits", "cls_logits"),
                     ("bbox_pred", "bbox_pred")):
        wk = f"rpn.head.{src}.weight"
        if wk in sd:
            put(("rpn", dst, "kernel"), _conv(sd[wk]))
            put(("rpn", dst, "bias"), sd[f"rpn.head.{src}.bias"])

    # ---- box head MLP + predictor (+ the ATTRIBUTE_ON head when the
    # checkpoint carries one, attribute_head/roi_attribute_predictors.py)
    for src, dst in (
        ("roi_heads.box.feature_extractor.fc6", ("box_extractor", "fc6")),
        ("roi_heads.box.feature_extractor.fc7", ("box_extractor", "fc7")),
        ("roi_heads.box.predictor.cls_score", ("box_predictor", "cls_score")),
        ("roi_heads.box.predictor.bbox_pred", ("box_predictor", "bbox_pred")),
        ("roi_heads.attribute.predictor.att_score",
         ("attribute_predictor", "att_score")),
    ):
        wk = f"{src}.weight"
        if wk in sd:
            w = sd[wk]
            if dst[-1] == "fc6":
                # fc6 eats the FLATTENED pooled map: the reference flattens
                # NCHW (C, P, P) while the rebuild pools NHWC and flattens
                # (P, P, C) — permute fc6's input axis accordingly
                # (FPN2MLPFeatureExtractor roi_box_feature_extractors.py:46
                # `x.view(x.size(0), -1)` on an NCHW pooler output).
                c = 256  # FPN channel count feeding the box pooler
                p = int(round((max(w.shape[1] // c, 1)) ** 0.5))
                if p * p * c == w.shape[1]:
                    w = (w.reshape(w.shape[0], c, p, p)
                         .transpose(0, 2, 3, 1)
                         .reshape(w.shape[0], -1))
            put(dst + ("kernel",), _fc(w))
            put(dst + ("bias",), sd[f"{src}.bias"])

    return out


def depth_backbone_param_updates(
    sd: Dict[str, np.ndarray], src_prefix: str = "depth_backbone.body",
) -> Tuple[Dict[Tuple[str, ...], np.ndarray], Dict[Tuple[str, ...], np.ndarray]]:
    """Translate the reference depth backbone (ResNetDepth = torchvision
    resnet18 truncated after layer3, resnet_depth.py:11-46; wrapped as
    Sequential([('body', ...)]), backbone.py:83-93) into DepthResNet18
    paths.  Unlike the frozen detector this module trains, so BatchNorm
    stays live: returns (param_updates, batch_stats_updates)."""
    p = src_prefix + "."
    sd = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    root = ("depth_backbone",)

    def put_bn(src, dst):
        out[dst + ("scale",)] = np.asarray(sd[f"{src}.weight"], np.float32)
        out[dst + ("bias",)] = np.asarray(sd[f"{src}.bias"], np.float32)
        stats[dst + ("mean",)] = np.asarray(
            sd[f"{src}.running_mean"], np.float32)
        stats[dst + ("var",)] = np.asarray(
            sd[f"{src}.running_var"], np.float32)

    out[root + ("conv1", "kernel")] = _conv(sd["conv1.weight"])
    put_bn("bn1", root + ("bn1",))
    pat = re.compile(r"^layer(\d)\.(\d+)\.conv(\d)\.weight$")
    for k in list(sd):
        m = pat.match(k)
        if not m:
            continue
        layer, block, conv = m.group(1), m.group(2), m.group(3)
        base = root + (f"layer{layer}_block{block}",)
        out[base + (f"conv{conv}", "kernel")] = _conv(sd[k])
        put_bn(f"layer{layer}.{block}.bn{conv}", base + (f"bn{conv}",))
        ds = f"layer{layer}.{block}.downsample"
        if conv == "1" and f"{ds}.0.weight" in sd:
            out[base + ("downsample_conv", "kernel")] = _conv(
                sd[f"{ds}.0.weight"])
            put_bn(f"{ds}.1", base + ("downsample_bn",))
    return out, stats


def apply_updates(params, updates: Dict[Tuple[str, ...], np.ndarray], logger=None):
    """Write translated weights into a (nested-dict) flax param tree.

    Returns (new_params, loaded, skipped) — skipped lists shape mismatches
    and paths missing from the tree, mirroring load_weight_partially's
    per-key logging (reference utils/checkpoint.py:81-108).
    """
    import jax

    params = jax.tree.map(np.asarray, params)  # mutable host copy
    loaded, skipped = [], []
    for path, arr in updates.items():
        node = params
        ok = True
        for p in path[:-1]:
            if not isinstance(node, dict) or p not in node:
                ok = False
                break
            node = node[p]
        leaf = path[-1]
        if not ok or not isinstance(node, dict) or leaf not in node:
            skipped.append(("missing", "/".join(path)))
            continue
        if tuple(node[leaf].shape) != tuple(arr.shape):
            skipped.append(
                (f"shape {node[leaf].shape} vs {arr.shape}", "/".join(path))
            )
            continue
        node[leaf] = arr.astype(node[leaf].dtype)
        loaded.append("/".join(path))
    if logger is not None:
        logger.info(f"torch import: {len(loaded)} tensors loaded, "
                    f"{len(skipped)} skipped")
        for why, path in skipped:
            logger.info(f"  SKIP [{why}] {path}")
    return params, loaded, skipped


_BN_FOR_CONV = {
    "conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
    "downsample_conv": "downsample_bn", "stem_conv": "stem_bn",
}


def fold_detector_updates(updates):
    """Fold backbone-body BN updates into their conv updates
    (models/backbone/resnet.py fold_bn layout): kernel *= scale (output
    channel is the trailing dim for both nn.Conv HWIO and GroupedConv3x3),
    conv gains ``bias`` = bn bias, the bn entries disappear."""
    bn_names = set(_BN_FOR_CONV.values())
    out = {}
    for path, arr in updates.items():
        if "body" in path and len(path) >= 2:
            mod, leaf = path[-2], path[-1]
            if mod in _BN_FOR_CONV and leaf == "kernel":
                bn = path[:-2] + (_BN_FOR_CONV[mod],)
                scale = updates.get(bn + ("scale",))
                if scale is not None:
                    out[path] = np.asarray(arr) * np.asarray(scale)
                    out[path[:-1] + ("bias",)] = updates[bn + ("bias",)]
                    continue
            if mod in bn_names:
                continue  # absorbed into the conv
        out[path] = arr
    return out


def import_detector_weights(params, ckpt_path: str, logger=None,
                            fold_bn: bool = False):
    """One-call import: checkpoint file → updated flax params.

    Dispatches on the path: ``catalog://...`` resolves through the
    Detectron model catalog to a locally cached file; ``*.pkl`` is read as
    a caffe2/Detectron pickle (C2 blob naming); anything else is a torch
    checkpoint (maskrcnn-benchmark naming).  Mirrors
    DetectronCheckpointer._load_file (reference utils/checkpoint.py:138-160).

    ``fold_bn=True`` targets a model built with ``fold_bn=True`` (BN
    affines folded into conv kernels/biases)."""
    if ckpt_path.startswith("catalog://"):
        ckpt_path = resolve_catalog(ckpt_path)
    if ckpt_path.endswith(".pkl"):
        sd = load_c2_state_dict(ckpt_path)
    else:
        sd = load_torch_state_dict(ckpt_path)
    updates = detector_param_updates(sd)
    if fold_bn:
        updates = fold_detector_updates(updates)
    return apply_updates(params, updates, logger)


# ---------------------------------------------------------------------------
# caffe2 / Detectron weight ingestion (reference utils/c2_model_loading.py
# :1-206 + config/paths_catalog.py:251-282).  Pure pickle + numpy: the
# Detectron .pkl files store raw float arrays under 'blobs', no torch needed.
# ---------------------------------------------------------------------------

# ordered replacement chain of _rename_basic_resnet_weights
# (c2_model_loading.py:12-63).  Quirk preserved: the blanket '.b'→'.bias'
# rule mangles '.branch' into '.biasranch', which a later pair repairs —
# the chain below reproduces the reference's net effect pair-for-pair.
_C2_BASIC_RENAMES = (
    (".w", ".weight"),
    (".bn", "_bn"),
    (".b", ".bias"),
    ("_bn.s", "_bn.scale"),
    (".biasranch", ".branch"),
    ("bbox.pred", "bbox_pred"),
    ("cls.score", "cls_score"),
    ("res.conv1_", "conv1_"),
    (".biasbox", ".bbox"),
    ("conv.rpn", "rpn.conv"),
    ("rpn.bbox.pred", "rpn.bbox_pred"),
    ("rpn.cls.logits", "rpn.cls_logits"),
    ("_bn.scale", "_bn.weight"),   # AffineChannel scale → BN weight
    ("conv1_bn.", "bn1."),
    ("res2.", "layer1."),
    ("res3.", "layer2."),
    ("res4.", "layer3."),
    ("res5.", "layer4."),
    (".branch2a.", ".conv1."),
    (".branch2a_bn.", ".bn1."),
    (".branch2b.", ".conv2."),
    (".branch2b_bn.", ".bn2."),
    (".branch2c.", ".conv3."),
    (".branch2c_bn.", ".bn3."),
    (".branch1.", ".downsample.0."),
    (".branch1_bn.", ".downsample.1."),
    # GroupNorm variants (R-50-GN et al.)
    ("conv1.gn.s", "bn1.weight"),
    ("conv1.gn.bias", "bn1.bias"),
    ("conv2.gn.s", "bn2.weight"),
    ("conv2.gn.bias", "bn2.bias"),
    ("conv3.gn.s", "bn3.weight"),
    ("conv3.gn.bias", "bn3.bias"),
    ("downsample.0.gn.s", "downsample.1.weight"),
    ("downsample.0.gn.bias", "downsample.1.bias"),
)


def c2_rename_key(key: str) -> str:
    """caffe2 blob name → fully-prefixed maskrcnn-benchmark name.

    Composes _rename_basic_resnet_weights + _rename_fpn_weights +
    _rename_weights_for_resnet's head renames (c2_model_loading.py:12-116),
    then attaches the module prefixes that the reference's fuzzy suffix
    matcher (model_serialization.py align_and_update_state_dicts) would
    resolve — so the result feeds :func:`detector_param_updates` directly.
    """
    k = "fc1000_b" if key == "pred_b" else ("fc1000_w" if key == "pred_w"
                                            else key)
    k = k.replace("_", ".")
    for old, new in _C2_BASIC_RENAMES:
        k = k.replace(old, new)
    # FPN: fpn.inner.layer{L}.{last-block}.sum[.lateral] → fpn_inner{L};
    # the reference enumerates per-arch stage names (R-50 "1.2" etc.,
    # c2_model_loading.py:66-84) — a block-count-agnostic regex covers all
    k = re.sub(r"fpn\.inner\.layer(\d)\.\d+\.sum(\.lateral)?", r"fpn_inner\1", k)
    k = re.sub(r"fpn\.layer(\d)\.\d+\.sum", r"fpn_layer\1", k)
    k = k.replace("rpn.conv.fpn2", "rpn.conv")
    k = k.replace("rpn.bbox_pred.fpn2", "rpn.bbox_pred")
    k = k.replace("rpn.cls_logits.fpn2", "rpn.cls_logits")
    # mask / keypoint blobs (kept so a Detectron COCO pkl round-trips; they
    # simply don't match any veto_tpu path and are skipped downstream)
    k = k.replace("mask.fcn.logits", "mask_fcn_logits")
    k = k.replace(".[mask].fcn", "mask_fcn")
    k = k.replace("conv5.mask", "conv5_mask")
    k = k.replace("kps.score.lowres", "kps_score_lowres")
    k = k.replace("kps.score", "kps_score")
    k = k.replace("conv.fcn", "conv_fcn")
    if k.startswith("rpn."):
        k = "rpn.head." + k[len("rpn."):]
    # module prefixes (what the reference leaves to suffix matching)
    if re.match(r"^layer\d\.", k):
        return "backbone.body." + k
    if k.startswith("conv1.") or k.startswith("bn1."):
        return "backbone.body.stem." + k
    if k.startswith("fpn_inner") or k.startswith("fpn_layer"):
        return "backbone.fpn." + k
    if k.startswith("fc6.") or k.startswith("fc7."):
        return "roi_heads.box.feature_extractor." + k
    if k.startswith("cls_score.") or k.startswith("bbox_pred."):
        return "roi_heads.box.predictor." + k
    return k


def load_c2_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a Detectron/caffe2 ``.pkl`` into maskrcnn-benchmark-named
    numpy arrays (reference _load_c2_pickled_weights +
    _rename_weights_for_resnet, c2_model_loading.py:87-144).

    caffe2 AffineChannel has no running statistics (the stats are already
    folded into scale/bias), so synthetic ``running_mean=0`` /
    ``running_var=1`` buffers are added for every BN affine — the shared
    :func:`_fold_bn` then degenerates to scale=weight, bias=bias exactly.
    """
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    blobs = data.get("blobs", data)
    out: Dict[str, np.ndarray] = {}
    for k, v in blobs.items():
        if "_momentum" in k or not isinstance(v, np.ndarray):
            continue
        out[c2_rename_key(k)] = np.asarray(v, np.float32)
    for k in list(out):
        m = re.match(r"^(.*(?:\bbn\d|downsample\.1|stem\.bn1))\.weight$", k)
        if m and f"{m.group(1)}.bias" in out:
            out[f"{m.group(1)}.running_mean"] = np.zeros_like(out[k])
            out[f"{m.group(1)}.running_var"] = np.ones_like(out[k])
    return out


_C2_DETECTRON_URL = "https://dl.fbaipublicfiles.com/detectron"
_C2_IMAGENET_MODELS = {
    "MSRA/R-50": "ImageNetPretrained/MSRA/R-50.pkl",
    "MSRA/R-50-GN": "ImageNetPretrained/47261647/R-50-GN.pkl",
    "MSRA/R-101": "ImageNetPretrained/MSRA/R-101.pkl",
    "MSRA/R-101-GN": "ImageNetPretrained/47592356/R-101-GN.pkl",
    "FAIR/20171220/X-101-32x8d": "ImageNetPretrained/20171220/X-101-32x8d.pkl",
}
_C2_DETECTRON_MODELS = {
    "35857197/e2e_faster_rcnn_R-50-C4_1x": "01_33_49.iAX0mXvW",
    "35857345/e2e_faster_rcnn_R-50-FPN_1x": "01_36_30.cUF7QR7I",
    "35857890/e2e_faster_rcnn_R-101-FPN_1x": "01_38_50.sNxI7sX7",
    "36761737/e2e_faster_rcnn_X-101-32x8d-FPN_1x": "06_31_39.5MIHi1fZ",
    "35858791/e2e_mask_rcnn_R-50-C4_1x": "01_45_57.ZgkA7hPB",
    "35858933/e2e_mask_rcnn_R-50-FPN_1x": "01_48_14.DzEQe4wC",
    "35861795/e2e_mask_rcnn_R-101-FPN_1x": "02_31_37.KqyEK4tT",
    "36761843/e2e_mask_rcnn_X-101-32x8d-FPN_1x": "06_35_59.RZotkLKI",
    "37129812/e2e_mask_rcnn_X-152-32x8d-FPN-IN5k_1.44x": "09_35_36.8pzTQKYK",
    "37697547/e2e_keypoint_rcnn_R-50-FPN_1x": "08_42_54.kdzV35ao",
}


def catalog_url(name: str) -> str:
    """``catalog://...`` → the public Detectron download URL
    (reference paths_catalog.py ModelCatalog.get:251-282)."""
    name = name[len("catalog://"):] if name.startswith("catalog://") else name
    if name.startswith("ImageNetPretrained/"):
        short = name[len("ImageNetPretrained/"):]
        return f"{_C2_DETECTRON_URL}/{_C2_IMAGENET_MODELS[short]}"
    if name.startswith("Caffe2Detectron/COCO/"):
        rest = name[len("Caffe2Detectron/COCO/"):]
        tag = "keypoints_" if "keypoint" in rest else ""
        signature = _C2_DETECTRON_MODELS[rest]
        model_id, model_name = rest.split("/", 1)
        suffix = (f"output/train/{tag}coco_2014_train%3A{tag}"
                  "coco_2014_valminusminival/generalized_rcnn/model_final.pkl")
        return (f"{_C2_DETECTRON_URL}/{model_id}/12_2017_baselines/"
                f"{model_name}.yaml.{signature}/{suffix}")
    raise KeyError(f"model not present in the catalog: {name}")


def resolve_catalog(name: str, cache_dir: str = None) -> str:
    """``catalog://...`` → a local file path under the weight cache.

    The reference downloads through ``cache_url`` into ``$TORCH_HOME``; this
    environment has no egress, so the file must already sit in the cache
    (``$VETO_WEIGHTS_CACHE``, default ``~/.cache/veto_tpu/models``) under
    the URL's basename (query-stripped, as cache_url names it)."""
    import os
    from urllib.parse import urlparse

    url = catalog_url(name)
    cache_dir = cache_dir or os.environ.get(
        "VETO_WEIGHTS_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "veto_tpu", "models"),
    )
    fname = os.path.basename(urlparse(url).path)
    path = os.path.join(cache_dir, fname)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{name} resolves to {url}; place the file at {path} "
            f"(no network egress available for auto-download)"
        )
    return path


def _split_pair_columns(w: np.ndarray, half: int):
    """Split a torch (out, 2*half) concat-projection into subj/obj kernels.

    The reference projects concat(subj_feat, obj_feat); W @ [s; o] =
    W[:, :half] @ s + W[:, half:] @ o, so each half becomes an independent
    per-proposal projection (predictor_veto.py module docstring).
    Returns (kernel_subj (half, out), kernel_obj (half, out)).
    """
    return _fc(w[:, :half]), _fc(w[:, half:])


def _split_patch_columns(w: np.ndarray, channels: int, patch_area: int):
    """Split a torch PatchEmbed projection into subj/obj patch kernels.

    The reference concatenates the subject and object pooled maps
    channel-wise (rel_depth = cat([d_s, d_o], dim=1),
    roi_relation_predictors.py:4121-4123) and then patchifies with
    einops '(p1 p2 c)' ordering (model_veto.py:108-110): each patch
    position contributes ``2*channels`` adjacent columns — the first
    ``channels`` from the subject map, the next from the object map.
    """
    out_dim = w.shape[0]
    w = w.reshape(out_dim, patch_area, 2 * channels)
    ws = w[:, :, :channels].reshape(out_dim, patch_area * channels)
    wo = w[:, :, channels:].reshape(out_dim, patch_area * channels)
    return _fc(ws), _fc(wo)


def veto_encoder_updates(
    sd: Dict[str, np.ndarray], src: str, dst: Tuple[str, ...], layers: int = 6,
    flat: bool = False,
) -> Dict[Tuple[str, ...], np.ndarray]:
    """Map the reference Transformer encoder stack (model_veto.py:28-64)
    onto a :class:`VetoEncoder` (``flat=True``: weights declared directly on
    the module so the XLA and Pallas paths share them) or the nested
    ``VetoTransformer`` layout.

    ``src`` is the torch prefix of the inner ``Transformer`` module (e.g.
    ``fusion_transformer.transformer``), ``dst`` the flax path prefix.
    """
    out: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(path, arr):
        out[dst + tuple(path)] = np.asarray(arr, np.float32)

    put(("cls_token",), sd[f"{src}.cls_token"])
    put(("pos_embedding",), sd[f"{src}.pos_embedding"])
    for i in range(layers):
        lp = f"{src}.layers.{i}"
        if flat:
            put((f"attn_norm{i}_scale",), sd[f"{lp}.0.norm.weight"])
            put((f"attn_norm{i}_bias",), sd[f"{lp}.0.norm.bias"])
            put((f"attn{i}_qkv",), _fc(sd[f"{lp}.0.fn.to_qkv.weight"]))
            put((f"attn{i}_out",), _fc(sd[f"{lp}.0.fn.to_out.0.weight"]))
            put((f"attn{i}_out_bias",), sd[f"{lp}.0.fn.to_out.0.bias"])
            put((f"ffn_norm{i}_scale",), sd[f"{lp}.1.norm.weight"])
            put((f"ffn_norm{i}_bias",), sd[f"{lp}.1.norm.bias"])
            put((f"ffn{i}_fc1",), _fc(sd[f"{lp}.1.fn.net.0.weight"]))
            put((f"ffn{i}_fc1_bias",), sd[f"{lp}.1.fn.net.0.bias"])
            put((f"ffn{i}_fc2",), _fc(sd[f"{lp}.1.fn.net.3.weight"]))
            put((f"ffn{i}_fc2_bias",), sd[f"{lp}.1.fn.net.3.bias"])
            continue
        put((f"attn_norm{i}", "scale"), sd[f"{lp}.0.norm.weight"])
        put((f"attn_norm{i}", "bias"), sd[f"{lp}.0.norm.bias"])
        put((f"attn{i}", "to_qkv", "kernel"), _fc(sd[f"{lp}.0.fn.to_qkv.weight"]))
        put((f"attn{i}", "to_out", "kernel"), _fc(sd[f"{lp}.0.fn.to_out.0.weight"]))
        put((f"attn{i}", "to_out", "bias"), sd[f"{lp}.0.fn.to_out.0.bias"])
        put((f"ffn_norm{i}", "scale"), sd[f"{lp}.1.norm.weight"])
        put((f"ffn_norm{i}", "bias"), sd[f"{lp}.1.norm.bias"])
        put((f"ffn{i}", "fc1", "kernel"), _fc(sd[f"{lp}.1.fn.net.0.weight"]))
        put((f"ffn{i}", "fc1", "bias"), sd[f"{lp}.1.fn.net.0.bias"])
        put((f"ffn{i}", "fc2", "kernel"), _fc(sd[f"{lp}.1.fn.net.3.weight"]))
        put((f"ffn{i}", "fc2", "bias"), sd[f"{lp}.1.fn.net.3.bias"])
    return out


def veto_relation_param_updates(
    sd: Dict[str, np.ndarray],
    src_prefix: str = "roi_heads.relation.predictor",
    layers: int = 6,
    in_channels: int = 256,
    patch_size: int = 2,
):
    """Translate a reference VETOPredictor state dict
    (roi_relation_predictors.py:3997-4070) into VetoPredictor param paths.

    Concat-projection weights are split into the pair-factorized
    subject/object kernels (mathematically identical — see
    predictor_veto.py).  Returns (param_updates, batch_stats_updates); the
    latter carries the pos_embed BatchNorm running statistics.
    """
    p = (src_prefix + ".") if src_prefix else ""
    # strip the prefix so lookups below are predictor-local
    sd = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)} if p else dict(sd)

    out: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(path, arr):
        out[tuple(path)] = np.asarray(arr, np.float32)

    t = ("trunk",)
    put(t + ("obj_embed", "embedding"), sd["obj_embed.weight"])
    # pos_embed: BatchNorm1d(4) + Linear(4, 128) (:4042-4047)
    put(t + ("pos_bn", "scale"), sd["pos_embed.0.weight"])
    put(t + ("pos_bn", "bias"), sd["pos_embed.0.bias"])
    stats[t + ("pos_bn", "mean")] = np.asarray(sd["pos_embed.0.running_mean"], np.float32)
    stats[t + ("pos_bn", "var")] = np.asarray(sd["pos_embed.0.running_var"], np.float32)
    put(t + ("pos_fc", "kernel"), _fc(sd["pos_embed.1.weight"]))
    put(t + ("pos_fc", "bias"), sd["pos_embed.1.bias"])

    # location/class projections over concat(subj, obj) (:4118-4121)
    ks, ko = _split_pair_columns(sd["location_projection.0.weight"], 128)
    put(t + ("loc_proj_subj", "kernel"), ks)
    put(t + ("loc_proj_obj", "kernel"), ko)
    put(t + ("loc_proj_bias",), sd["location_projection.0.bias"])
    ks, ko = _split_pair_columns(sd["class_projection.0.weight"], 200)
    put(t + ("class_proj_subj", "kernel"), ks)
    put(t + ("class_proj_obj", "kernel"), ko)
    put(t + ("class_proj_bias",), sd["class_projection.0.bias"])

    # patch projections (model_veto.py:102-115)
    area = patch_size * patch_size
    ks, ko = _split_patch_columns(
        sd["fusion_transformer.transformer.patch_embed.proj_d.weight"],
        in_channels, area)
    put(t + ("proj_d_subj", "kernel"), ks)
    put(t + ("proj_d_obj", "kernel"), ko)
    put(t + ("proj_d_bias",),
        sd["fusion_transformer.transformer.patch_embed.proj_d.bias"])
    ks, ko = _split_patch_columns(
        sd["fusion_transformer.transformer.patch_embed.proj_v.weight"],
        in_channels, area)
    put(t + ("proj_v_subj", "kernel"), ks)
    put(t + ("proj_v_obj", "kernel"), ko)
    put(t + ("proj_v_bias",),
        sd["fusion_transformer.transformer.patch_embed.proj_v.bias"])

    out.update(veto_encoder_updates(
        sd, "fusion_transformer.transformer", t + ("fusion_transformer",),
        layers=layers, flat=True))

    if "rel_out.weight" in sd:
        put(("rel_out", "kernel"), _fc(sd["rel_out.weight"]))
        put(("rel_out", "bias"), sd["rel_out.bias"])
    return out, stats


def lstm_cell_updates(
    sd: Dict[str, np.ndarray], src: str, dst: Tuple[str, ...], layers: int = 1
) -> Dict[Tuple[str, ...], np.ndarray]:
    """Map a torch nn.LSTM(bidirectional=True) onto a MaskedBiLSTM subtree.

    torch packs gates as [i, f, g, o] rows of weight_ih/weight_hh
    (4H, in)/(4H, H) with two bias vectors; flax OptimizedLSTMCell keeps
    per-gate dense layers ii/if/ig/io (input, no bias) and hi/hf/hg/ho
    (hidden, bias) — the torch biases sum into the hidden-side bias.
    """
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    gates = ("i", "f", "g", "o")
    for layer in range(layers):
        for cell, sfx in ((f"fwd{layer}", ""), (f"bwd{layer}", "_reverse")):
            w_ih = sd[f"{src}.weight_ih_l{layer}{sfx}"]
            w_hh = sd[f"{src}.weight_hh_l{layer}{sfx}"]
            bias = (sd[f"{src}.bias_ih_l{layer}{sfx}"]
                    + sd[f"{src}.bias_hh_l{layer}{sfx}"])
            h = w_hh.shape[1]
            for gi, g in enumerate(gates):
                rows = slice(gi * h, (gi + 1) * h)
                out[dst + (cell, f"i{g}", "kernel")] = _fc(w_ih[rows])
                out[dst + (cell, f"h{g}", "kernel")] = _fc(w_hh[rows])
                out[dst + (cell, f"h{g}", "bias")] = bias[rows].astype(np.float32)
    return out


def decoder_rnn_updates(
    sd: Dict[str, np.ndarray], src: str, dst: Tuple[str, ...]
) -> Dict[Tuple[str, ...], np.ndarray]:
    """Map the reference DecoderRNN (model_motifs.py:58-223) onto a
    HighwayDecoderLSTM subtree."""
    return {
        dst + ("obj_embed",): np.asarray(sd[f"{src}.obj_embed.weight"], np.float32),
        dst + ("input_w",): _fc(sd[f"{src}.input_linearity.weight"]),
        dst + ("input_b",): np.asarray(sd[f"{src}.input_linearity.bias"], np.float32),
        dst + ("state_w",): _fc(sd[f"{src}.state_linearity.weight"]),
        dst + ("state_b",): np.asarray(sd[f"{src}.state_linearity.bias"], np.float32),
        dst + ("out_w",): _fc(sd[f"{src}.out_obj.weight"]),
        dst + ("out_b",): np.asarray(sd[f"{src}.out_obj.bias"], np.float32),
    }


def motifs_context_param_updates(
    sd: Dict[str, np.ndarray],
    src_prefix: str = "",
    obj_layers: int = 1,
    edge_layers: int = 1,
):
    """Translate a reference LSTMContext state dict (model_motifs.py:224-420)
    into our LSTMContext param paths.

    Returns (param_updates, batch_stats_updates) — the latter carries the
    pos_embed BatchNorm1d(32) running statistics.
    """
    p = (src_prefix + ".") if src_prefix else ""
    sd = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)} if p else dict(sd)

    out: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(path, arr):
        out[tuple(path)] = np.asarray(arr, np.float32)

    put(("obj_embed1", "embedding"), sd["obj_embed1.weight"])
    put(("obj_embed2", "embedding"), sd["obj_embed2.weight"])
    # pos_embed: Linear(9,32) → BN(32) → Linear(32,128) → ReLU (:255-259)
    put(("pos_fc1", "kernel"), _fc(sd["pos_embed.0.weight"]))
    put(("pos_fc1", "bias"), sd["pos_embed.0.bias"])
    put(("pos_bn", "scale"), sd["pos_embed.1.weight"])
    put(("pos_bn", "bias"), sd["pos_embed.1.bias"])
    stats[("pos_bn", "mean")] = np.asarray(sd["pos_embed.1.running_mean"], np.float32)
    stats[("pos_bn", "var")] = np.asarray(sd["pos_embed.1.running_var"], np.float32)
    put(("pos_fc2", "kernel"), _fc(sd["pos_embed.2.weight"]))
    put(("pos_fc2", "bias"), sd["pos_embed.2.bias"])
    out.update(lstm_cell_updates(sd, "obj_ctx_rnn", ("obj_ctx_rnn",), obj_layers))
    out.update(lstm_cell_updates(sd, "edge_ctx_rnn", ("edge_ctx_rnn",), edge_layers))
    if "decoder_rnn.obj_embed.weight" in sd:
        out.update(decoder_rnn_updates(sd, "decoder_rnn", ("decoder_rnn",)))
    put(("lin_obj_h", "kernel"), _fc(sd["lin_obj_h.weight"]))
    put(("lin_obj_h", "bias"), sd["lin_obj_h.bias"])
    put(("lin_edge_h", "kernel"), _fc(sd["lin_edge_h.weight"]))
    put(("lin_edge_h", "bias"), sd["lin_edge_h.bias"])
    return out, stats


def attribute_context_param_updates(
    sd: Dict[str, np.ndarray],
    src_prefix: str = "",
    obj_layers: int = 1,
    edge_layers: int = 1,
):
    """Translate a reference AttributeLSTMContext state dict
    (model_motifs_with_attribute.py:180-372) into our AttributeLSTMContext
    param paths.  Unlike the plain context there is no pos-embed BatchNorm
    (the reference uses Dropout), so no batch_stats updates are produced.
    """
    p = (src_prefix + ".") if src_prefix else ""
    sd = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)} if p else dict(sd)

    out: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(path, arr):
        out[tuple(path)] = np.asarray(arr, np.float32)

    for name in ("obj_embed1", "obj_embed2", "att_embed1", "att_embed2"):
        put((name, "embedding"), sd[f"{name}.weight"])
    # pos_embed: Linear(9,32) @0, ReLU, Dropout, Linear(32,128) @3 (:219-223)
    put(("pos_fc1", "kernel"), _fc(sd["pos_embed.0.weight"]))
    put(("pos_fc1", "bias"), sd["pos_embed.0.bias"])
    put(("pos_fc2", "kernel"), _fc(sd["pos_embed.3.weight"]))
    put(("pos_fc2", "bias"), sd["pos_embed.3.bias"])
    out.update(lstm_cell_updates(sd, "obj_ctx_rnn", ("obj_ctx_rnn",), obj_layers))
    out.update(lstm_cell_updates(sd, "edge_ctx_rnn", ("edge_ctx_rnn",), edge_layers))
    if "decoder_rnn.obj_embed.weight" in sd:
        out.update(decoder_rnn_updates(sd, "decoder_rnn", ("decoder_rnn",)))
        # AttributeDecoderRNN extras (:22-40): att start embedding + out_att
        put(("decoder_rnn", "att_embed"), sd["decoder_rnn.att_embed.weight"])
        put(("decoder_rnn", "att_out_w"), _fc(sd["decoder_rnn.out_att.weight"]))
        put(("decoder_rnn", "att_out_b"), sd["decoder_rnn.out_att.bias"])
    put(("lin_obj_h", "kernel"), _fc(sd["lin_obj_h.weight"]))
    put(("lin_obj_h", "bias"), sd["lin_obj_h.bias"])
    put(("lin_edge_h", "kernel"), _fc(sd["lin_edge_h.weight"]))
    put(("lin_edge_h", "bias"), sd["lin_edge_h.bias"])
    return out
