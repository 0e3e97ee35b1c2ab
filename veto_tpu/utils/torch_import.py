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

    # ---- FPN (reference names indexed by stage 2..5; ours 1..4)
    pat_fpn = re.compile(r"^backbone\.fpn\.fpn_(inner|layer)(\d)\.(weight|bias)$")
    for k in list(sd):
        m = pat_fpn.match(k)
        if not m:
            continue
        kind, idx, wb = m.group(1), int(m.group(2)), m.group(3)
        name = f"fpn_{kind}{idx - 1}"
        if wb == "weight":
            put(("backbone", "fpn", name, "kernel"), _conv(sd[k]))
        else:
            put(("backbone", "fpn", name, "bias"), sd[k])

    # ---- RPN head
    for src, dst in (("conv", "conv"), ("cls_logits", "cls_logits"),
                     ("bbox_pred", "bbox_pred")):
        wk = f"rpn.head.{src}.weight"
        if wk in sd:
            put(("rpn", dst, "kernel"), _conv(sd[wk]))
            put(("rpn", dst, "bias"), sd[f"rpn.head.{src}.bias"])

    # ---- box head MLP + predictor
    for src, dst in (
        ("roi_heads.box.feature_extractor.fc6", ("box_extractor", "fc6")),
        ("roi_heads.box.feature_extractor.fc7", ("box_extractor", "fc7")),
        ("roi_heads.box.predictor.cls_score", ("box_predictor", "cls_score")),
        ("roi_heads.box.predictor.bbox_pred", ("box_predictor", "bbox_pred")),
    ):
        wk = f"{src}.weight"
        if wk in sd:
            put(dst + ("kernel",), _fc(sd[wk]))
            put(dst + ("bias",), sd[f"{src}.bias"])

    return out


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


def import_detector_weights(params, ckpt_path: str, logger=None):
    """One-call import: torch checkpoint file → updated flax params."""
    sd = load_torch_state_dict(ckpt_path)
    updates = detector_param_updates(sd)
    return apply_updates(params, updates, logger)
