"""Build the reference's FULL GeneralizedRCNN and run an eval forward.

This drives `build_detection_model(cfg)` → `GeneralizedRCNN`
(/root/reference/pysgg/modeling/detector/detectors.py:1-10,
generalized_rcnn.py:16-76) — the complete live torch stack: backbone →
(depth backbone) → RPN → box head → relation head → post-processor — on a
seeded synthetic image, then exports the model's state_dict and the final
BoxList fields so tests/test_whole_model_parity.py can import the same
weights into the rebuild and assert end-to-end field-level agreement.

Heavy external deps absent from this environment are stubbed at the
IMPORT level only (yacs→MiniCN, apex.amp→identity decorators,
torchvision.models.resnet→minimal faithful BasicBlock/ResNet,
pysgg._C→the reference's own CPU kernels compiled by ref_cpu_ops.py,
pysgg.data.get_dataset_statistics→synthetic class lists, graphviz/ipdb
→no-ops).  Every line of MODEL code that executes is the reference's.

Run as a script (isolated interpreter — the real pysgg package import
would collide with ref_loader's partial stubs inside a shared pytest
process):

    python ref_full_model.py --mode predcls --out /tmp/ref_whole.pkl
"""

import argparse
import os
import pickle
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))


# ---------------------------------------------------------------------------
# mini-yacs: the subset of CfgNode the reference's defaults.py + model
# builders actually use (attribute tree, clone, freeze, merge)
# ---------------------------------------------------------------------------
class MiniCN(dict):
    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None, **kwargs):
        super().__init__()
        d = dict(init_dict or {}, **kwargs)
        for k, v in d.items():
            self[k] = MiniCN(v) if isinstance(v, dict) else v

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def clone(self):
        import copy

        return copy.deepcopy(self)

    def freeze(self):
        pass

    def defrost(self):
        pass

    def is_frozen(self):
        return False

    def merge_from_other_cfg(self, other):
        def rec(dst, src):
            for k, v in src.items():
                if isinstance(v, MiniCN) and isinstance(dst.get(k), MiniCN):
                    rec(dst[k], v)
                else:
                    dst[k] = v

        rec(self, other)

    def merge_from_list(self, opts):
        for key, val in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = val

    def dump(self, **kwargs):
        import json

        return json.dumps(self, indent=2, default=str)


# ---------------------------------------------------------------------------
# torchvision.models.resnet stub: the minimal faithful BasicBlock/ResNet
# (standard architecture; only the structure + param naming matter — the
# depth backbone ResNetDepth(BasicBlock, [2,2,2,2]) subclasses it and
# overrides forward, resnet_depth.py:11-46)
# ---------------------------------------------------------------------------
def _build_torchvision_stub():
    import torch.nn as nn

    def conv3x3(inp, out, stride=1):
        return nn.Conv2d(inp, out, 3, stride=stride, padding=1, bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = conv3x3(planes, planes, stride)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], 2)
            self.layer3 = self._make_layer(block, 256, layers[2], 2)
            self.layer4 = self._make_layer(block, 512, layers[3], 2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)

        def _make_layer(self, block, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                              stride=stride, bias=False),
                    nn.BatchNorm2d(planes * block.expansion),
                )
            layers = [block(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(block(self.inplanes, planes))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x).flatten(1)
            return self.fc(x)

    def resnet18(pretrained=False, **kw):
        assert not pretrained, "no downloads in this environment"
        return ResNet(BasicBlock, [2, 2, 2, 2], **kw)

    def resnet50(pretrained=False, **kw):
        assert not pretrained, "no downloads in this environment"
        return ResNet(Bottleneck, [3, 4, 6, 3], **kw)

    mod = types.ModuleType("torchvision.models.resnet")
    mod.ResNet = ResNet
    mod.BasicBlock = BasicBlock
    mod.Bottleneck = Bottleneck
    mod.model_urls = {f"resnet{n}": "" for n in (18, 34, 50, 101, 152)}
    mod.resnet18 = resnet18
    mod.resnet50 = resnet50
    return mod


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


NUM_OBJ, NUM_REL = 151, 51


def synthetic_statistics():
    """Deterministic stand-ins for get_dataset_statistics(cfg)."""
    import torch

    rng = np.random.RandomState(1234)
    obj_classes = ["__background__"] + [f"obj{i}" for i in range(1, NUM_OBJ)]
    rel_classes = ["__background__"] + [f"rel{i}" for i in range(1, NUM_REL)]
    att_classes = ["__background__"] + [f"att{i}" for i in range(1, 201)]
    fg = rng.randint(0, 50, (NUM_OBJ, NUM_OBJ, NUM_REL)).astype(np.float32)
    pred_dist = fg / np.maximum(fg.sum(2, keepdims=True), 1)
    return {
        "obj_classes": obj_classes,
        "rel_classes": rel_classes,
        "att_classes": att_classes,
        "fg_matrix": torch.from_numpy(fg),
        "pred_dist": torch.from_numpy(np.log(pred_dist + 1e-3)),
    }


def install_stubs():
    """Install import-level stubs; must run before any pysgg import."""
    # drop partial pysgg stubs a prior ref_loader use may have left
    for k in [k for k in list(sys.modules) if k.split(".")[0] == "pysgg"]:
        del sys.modules[k]
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if HERE not in sys.path:
        sys.path.insert(0, HERE)

    _stub_module("yacs")
    _stub_module("yacs.config", CfgNode=MiniCN)

    # numpy 1.x aliases the reference era relied on
    for alias, typ in (("float", float), ("int", int), ("bool", bool),
                       ("object", object), ("long", int)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)

    def _identity_dec(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda f: f

    amp = types.SimpleNamespace(
        float_function=_identity_dec, half_function=_identity_dec,
        promote_function=_identity_dec,
    )
    _stub_module("apex", amp=amp)
    _stub_module("apex.amp", **vars(amp))
    _stub_module("ipdb", set_trace=lambda: None)
    _stub_module("graphviz", Digraph=object)

    tv_resnet = _build_torchvision_stub()
    tv = _stub_module("torchvision")
    tv_models = _stub_module("torchvision.models")
    sys.modules["torchvision.models.resnet"] = tv_resnet
    tv.models = tv_models
    tv_models.resnet = tv_resnet

    class _UnusedRoIAlign:  # imported by poolers.py, never instantiated
        def __init__(self, *a, **k):
            raise NotImplementedError("torchvision RoIAlign stub")

    tv_ops = _stub_module("torchvision.ops", RoIAlign=_UnusedRoIAlign)
    tv.ops = tv_ops
    for name in ("ResNet", "BasicBlock", "Bottleneck", "model_urls",
                 "resnet18", "resnet50"):
        setattr(tv_models, name, getattr(tv_resnet, name))

    # pycocotools over our numpy codec (only segmentation_mask imports it)
    import torch

    from veto_tpu.utils import coco_mask as _cm

    def _decode(rle):
        if isinstance(rle, list):
            return torch.from_numpy(
                np.stack([_cm.rle_decode(r) for r in rle], axis=2))
        return torch.from_numpy(_cm.rle_decode(rle))

    _stub_module("pycocotools")
    _stub_module("pycocotools.mask", frPyObjects=_cm.frPyObjects,
                 merge=_cm.merge_rles, decode=_decode)
    sys.modules["pycocotools"].mask = sys.modules["pycocotools.mask"]

    # the reference's own CPU kernels as pysgg._C
    from ref_cpu_ops import load_ref_cpu_ops

    cpu_ops = load_ref_cpu_ops()

    def _roi_align_forward(input, rois, spatial_scale, ph, pw, sampling):
        return cpu_ops.roi_align_forward(
            input.contiguous(), rois.contiguous(),
            float(spatial_scale), int(ph), int(pw), int(sampling))

    _stub_module("pysgg._C", nms=cpu_ops.nms,
                 roi_align_forward=_roi_align_forward)

    # data package: statistics only (the real package pulls h5py datasets)
    stats = synthetic_statistics()
    _stub_module("pysgg.data", get_dataset_statistics=lambda cfg: stats)

    import pysgg  # real package (trivial __init__)

    pysgg._C = sys.modules["pysgg._C"]
    pysgg.data = sys.modules["pysgg.data"]
    return stats


def reference_cfg(mode="predcls"):
    """The global pysgg cfg mutated to the VETO_final.yaml model settings
    (configs/VETO_final.yaml) with plain VETOPredictor + BETA_LOSS off
    (its ctor hard-codes a .cuda() weight load, :4059-4068 — loss weights
    don't enter the eval forward)."""
    from pysgg.config import cfg

    M = cfg.MODEL
    M.BACKBONE.CONV_BODY = "R-101-FPN"
    M.RESNETS.BACKBONE_OUT_CHANNELS = 256
    M.RESNETS.STRIDE_IN_1X1 = False
    M.RESNETS.NUM_GROUPS = 32
    M.RESNETS.WIDTH_PER_GROUP = 8
    M.RELATION_ON = True
    M.ATTRIBUTE_ON = False
    M.RPN.USE_FPN = True
    M.RPN.ANCHOR_SIZES = (32, 64, 128, 256, 512)
    M.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
    M.RPN.ASPECT_RATIOS = (0.23232838, 0.63365731, 1.28478321, 3.15089189)
    M.RPN.PRE_NMS_TOP_N_TEST = 6000
    M.RPN.POST_NMS_TOP_N_TEST = 1000
    M.RPN.FPN_POST_NMS_TOP_N_TEST = 1000
    M.RPN.FPN_POST_NMS_PER_BATCH = False
    M.RPN.RPN_MID_CHANNEL = 256
    M.ROI_HEADS.USE_FPN = True
    M.ROI_HEADS.DETECTIONS_PER_IMG = 80
    M.ROI_HEADS.NMS_FILTER_DUPLICATES = True
    M.ROI_HEADS.NMS = 0.3
    M.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    M.ROI_BOX_HEAD.POOLER_SCALES = (0.25, 0.125, 0.0625, 0.03125)
    M.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    M.ROI_BOX_HEAD.FEATURE_EXTRACTOR = "FPN2MLPFeatureExtractor"
    M.ROI_BOX_HEAD.PREDICTOR = "FPNPredictor"
    M.ROI_BOX_HEAD.NUM_CLASSES = NUM_OBJ
    M.ROI_BOX_HEAD.MLP_HEAD_DIM = 4096
    R = M.ROI_RELATION_HEAD
    R.POOLER_RESOLUTION = 8
    R.NUM_CLASSES = NUM_REL
    R.BATCH_SIZE_PER_IMAGE = 1024
    R.POSITIVE_FRACTION = 0.25
    R.CONTEXT_POOLING_DIM = 128
    R.CONTEXT_HIDDEN_DIM = 512
    R.POOLING_ALL_LEVELS = True
    R.FEATURE_EXTRACTOR = "RelationFeatureExtractor"
    R.FEATURE_EXTRACTOR_MINI = "VETOFeatureExtractor"
    R.PREDICTOR = "VETOPredictor"
    R.VETOTRANSFORMER.PATCH_SIZE = 2
    R.VETOTRANSFORMER.T_INPUT_DIM = 576
    R.VETOTRANSFORMER.ENC_LAYERS = 6
    R.VETOTRANSFORMER.NHEADS = 6
    R.VETOTRANSFORMER.EMB_DROPOUT = 0.35
    R.VETOTRANSFORMER.T_DROPOUT = 0.35
    if mode == "predcls":
        R.USE_GT_BOX = True
        R.USE_GT_OBJECT_LABEL = True
    elif mode == "sgcls":
        R.USE_GT_BOX = True
        R.USE_GT_OBJECT_LABEL = False
    else:
        R.USE_GT_BOX = False
        R.USE_GT_OBJECT_LABEL = False
    cfg.DATASETS.USE_DEPTH = True
    cfg.DATALOADER.SIZE_DIVISIBILITY = 32
    cfg.TEST.RELATION.LATER_NMS_PREDICTION_THRES = 0.5
    cfg.TEST.RELATION.REQUIRE_OVERLAP = False
    cfg.GLOBAL_SETTING.BETA_LOSS = False
    cfg.GLOBAL_SETTING.USE_BIAS = False
    cfg.ENSEMBLE_LEARNING.ENABLED = False
    cfg.ENSEMBLE_LEARNING.EXPERT_GROUP = False
    return cfg


def _patch_glove():
    """Replace the GloVe file loader with the shared deterministic N(0,1)
    embedding (the values end up in state_dict; the rebuild imports them)."""
    from ref_loader import deterministic_glove

    um = sys.modules[
        "pysgg.modeling.roi_heads.relation_head.utils_motifs"]
    um.obj_edge_vectors = deterministic_glove
    rp = sys.modules[
        "pysgg.modeling.roi_heads.relation_head.roi_relation_predictors"]
    rp.obj_edge_vectors = deterministic_glove


def randomize_bn_buffers(model, seed=7):
    """Give every (Frozen)BatchNorm non-trivial running statistics so the
    parity test actually exercises BN folding/import (default init is the
    identity transform)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for name, mod in model.named_modules():
        if hasattr(mod, "running_mean") and hasattr(mod, "running_var"):
            with torch.no_grad():
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=g) * 0.5)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=g) * 2 + 0.5)
                n = mod.weight.shape[0]
                mod.weight.data.copy_(torch.rand(n, generator=g) + 0.5)
                mod.bias.data.copy_(torch.randn(n, generator=g) * 0.2)


def _tame_head_magnitudes(model, seed=13):
    """Rescale the detection heads so an UNTRAINED cascade yields sane
    logits.  The default-init ResNeXt amplifies the (realistically-scaled,
    std~40) input to O(100+) features; linear heads on top saturate softmax
    /sigmoid to exact 1.0 in f32, which ties every score — and greedy
    NMS/top-k selection on fully-tied scores is ill-posed (torch's
    unstable sort and the kthvalue tie-keeping cut diverge from ANY
    static-shape implementation).  Shrinking the head weights (logits =
    tiny*features + O(1) random bias) keeps every score distinct and the
    feature path exercised while staying off the saturation plateau.
    Runs BEFORE state_dict export, so the rebuild imports the same tamed
    weights."""
    import torch

    g = torch.Generator().manual_seed(seed)

    def tame(lin, wscale, bstd):
        with torch.no_grad():
            lin.weight.data.mul_(wscale)
            lin.bias.data.copy_(
                torch.randn(lin.bias.shape, generator=g) * bstd)

    # Scale choice: the reference heads ALREADY init at std 0.01 (RPNHead /
    # FPNPredictor), so the factors below are relative to that.  The scores
    # must keep a healthy FEATURE-dependent spread — if the weight is
    # over-shrunk, scores collapse to (per-channel bias ± epsilon) and the
    # greedy NMS / top-k rank order becomes chaotic under the ~1e-4
    # cross-implementation conv noise, which is exactly the ill-posedness
    # this function exists to avoid (measured: x1e-2 here -> only 55% of
    # RPN proposals match even from IDENTICAL input features).
    rpn_head = model.rpn.head
    tame(rpn_head.cls_logits, 0.1, 0.5)   # logits ~ +-3: spread, unsaturated
    tame(rpn_head.bbox_pred, 0.01, 0.05)  # deltas ~ +-0.3: sane geometry
    box_pred = model.roi_heads.box.predictor
    tame(box_pred.cls_score, 3e-3, 1.0)
    tame(box_pred.bbox_pred, 1e-3, 0.05)


def build_reference_model(mode="predcls", seed=11):
    import torch

    cfg = reference_cfg(mode)
    # import AFTER cfg is set (several modules read the global at import)
    import pysgg.modeling.roi_heads.relation_head.utils_motifs  # noqa: F401
    import pysgg.modeling.roi_heads.relation_head.roi_relation_predictors  # noqa: F401

    _patch_glove()
    from pysgg.modeling.detector.detectors import build_detection_model

    torch.manual_seed(seed)
    model = build_detection_model(cfg)
    randomize_bn_buffers(model, seed + 1)
    _tame_head_magnitudes(model, seed + 2)
    model.eval()
    return model, cfg


def make_inputs(seed=5, width=480, height=320, n_boxes=6):
    """Seeded normalized image + depth + GT BoxList, pre-padded to /32."""
    import torch

    from pysgg.structures.bounding_box import BoxList
    from pysgg.structures.image_list import ImageList

    rng = np.random.RandomState(seed)
    img = rng.randn(1, 3, height, width).astype(np.float32) * 40.0
    depth = rng.randn(1, 1, height, width).astype(np.float32)
    boxes = np.zeros((n_boxes, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, width * 0.6, n_boxes)
    boxes[:, 1] = rng.uniform(0, height * 0.6, n_boxes)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(24, width * 0.35, n_boxes)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(24, height * 0.35, n_boxes)
    boxes[:, 2] = np.minimum(boxes[:, 2], width - 1)
    boxes[:, 3] = np.minimum(boxes[:, 3], height - 1)
    labels = rng.randint(1, NUM_OBJ, n_boxes).astype(np.int64)

    images = ImageList(torch.from_numpy(img), [(height, width)])
    depth_images = ImageList(torch.from_numpy(depth), [(height, width)])
    target = BoxList(torch.from_numpy(boxes), (width, height), "xyxy")
    target.add_field("labels", torch.from_numpy(labels))
    return images, depth_images, target, dict(
        image=img, depth=depth, boxes=boxes, labels=labels,
        width=width, height=height,
    )


def run_reference(mode="predcls", seed=11, input_seed=5, width=480,
                  height=320, n_boxes=6):
    import torch

    model, cfg = build_reference_model(mode, seed)
    images, depth_images, target, raw = make_inputs(
        input_seed, width, height, n_boxes)

    # stage taps for the parity test's divergence bisect
    inter = {}

    def tap(name, transform=None):
        def hook(mod, args, out):
            v = transform(out) if transform else out
            if isinstance(v, torch.Tensor):
                inter[name] = v.detach().numpy()
            elif isinstance(v, (list, tuple)):
                inter[name] = [x.detach().numpy() for x in v
                               if isinstance(x, torch.Tensor)]
        return hook

    model.backbone.register_forward_hook(tap("fpn"))
    model.rpn.register_forward_hook(
        tap("rpn_boxes", lambda out: [b.bbox for b in out[0]]
            + [b.get_field("objectness") for b in out[0]
               if b.has_field("objectness")]))
    box_head = getattr(model.roi_heads, "box", None)
    if box_head is not None and mode == "sgdet":
        box_head.register_forward_hook(
            tap("box_dets", lambda out: [
                out[1][0].bbox,
                out[1][0].get_field("pred_scores"),
                out[1][0].get_field("pred_labels"),
                out[1][0].get_field("boxes_per_cls"),
                out[1][0].get_field("predict_logits"),
            ]))
        box_head.feature_extractor.register_forward_hook(tap("box_feats"))
        box_head.predictor.register_forward_hook(
            tap("box_logits", lambda out: [out[0], out[1]]))
    if getattr(model, "depth_backbone", None) is not None:
        model.depth_backbone.register_forward_hook(tap("depth_feat"))
    rel = getattr(model.roi_heads, "relation", None)
    if rel is not None:
        rel.box_feature_extractor.register_forward_hook(
            tap("rel_pool", lambda out: [out[0], out[1]]))
        rel.predictor.register_forward_hook(
            tap("predictor", lambda out: [out[1][0], out[0][0]]
                if out[1] is not None else []))

    with torch.no_grad():
        (result,) = model(images, targets=[target],
                          depth_images=depth_images)

    # per-level RPN internals for the parity bisect: re-run the RPN
    # components manually on the tapped backbone features
    if mode == "sgdet":
        with torch.no_grad():
            feats = model.backbone(images.tensors)
            objn, regm = model.rpn.head(feats)
            anchors_all = model.rpn.anchor_generator(images, feats)
            inter["rpn_obj_maps"] = [o.detach().numpy() for o in objn]
            inter["rpn_reg_maps"] = [r.detach().numpy() for r in regm]
            inter["rpn_anchors"] = [a.bbox.detach().numpy()
                                    for a in anchors_all[0]]
            sel = model.rpn.box_selector_test
            lvl_boxes, lvl_scores = [], []
            for a, o, r in zip(anchors_all[0], objn, regm):
                bl = sel.forward_for_single_feature_map([a], o, r)[0]
                lvl_boxes.append(bl.bbox.detach().numpy())
                lvl_scores.append(
                    bl.get_field("objectness").detach().numpy())
            inter["rpn_level_boxes"] = lvl_boxes
            inter["rpn_level_scores"] = lvl_scores

    fields = {
        "boxes": result.bbox.numpy(),
        "size": np.asarray(result.size),
    }
    for f in result.fields():
        v = result.get_field(f)
        if hasattr(v, "numpy"):
            fields[f] = v.detach().numpy()
    sd = {k: v.detach().cpu().numpy()
          for k, v in model.state_dict().items()}
    return dict(mode=mode, fields=fields, state_dict=sd, raw=raw,
                intermediates=inter)


def run_reference_batch(mode, images_pkl, ckpt=None, seed=11):
    """tools/parity_vs_reference.py phase A: run the reference model over a
    PREPARED image list (normalized CHW tensors + GT), optionally with a
    real training checkpoint loaded (strict=False after 'module.' strip —
    the DetectronCheckpointer load for a full relation checkpoint,
    utils/checkpoint.py:34-79)."""
    import torch

    from pysgg.structures.bounding_box import BoxList
    from pysgg.structures.image_list import ImageList

    model, cfg = build_reference_model(mode, seed)
    if ckpt:
        blob = torch.load(ckpt, map_location="cpu", weights_only=False)
        sd_in = blob.get("model", blob.get("state_dict", blob))
        sd_in = {k[len("module."):] if k.startswith("module.") else k: v
                 for k, v in sd_in.items()}
        missing, unexpected = model.load_state_dict(sd_in, strict=False)
        print(f"ckpt load: {len(missing)} missing, "
              f"{len(unexpected)} unexpected", flush=True)

    with open(images_pkl, "rb") as fh:
        items = pickle.load(fh)

    per_image = []
    for item in items:
        img = torch.from_numpy(item["image"])[None]         # (1, 3, H, W)
        dep = torch.from_numpy(item["depth"])[None]         # (1, 1, H, W)
        h, w = img.shape[2:]
        images = ImageList(img, [(h, w)])
        depth_images = ImageList(dep, [(h, w)])
        target = BoxList(torch.from_numpy(item["boxes"]), (w, h), "xyxy")
        target.add_field("labels", torch.from_numpy(
            np.asarray(item["labels"], np.int64)))
        with torch.no_grad():
            (result,) = model(images, targets=[target],
                              depth_images=depth_images)
        fields = {"boxes": result.bbox.numpy()}
        for f in result.fields():
            v = result.get_field(f)
            if hasattr(v, "numpy"):
                fields[f] = v.detach().numpy()
        per_image.append(fields)

    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return dict(mode=mode, per_image=per_image, state_dict=sd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="predcls",
                    choices=["predcls", "sgcls", "sgdet"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--input-seed", type=int, default=5)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--n-boxes", type=int, default=6)
    ap.add_argument("--from-batch", default="",
                    help="prepared image-list pkl (parity_vs_reference.py)")
    ap.add_argument("--ckpt", default="",
                    help="reference training checkpoint (.pth) to load")
    args = ap.parse_args()

    install_stubs()
    if args.from_batch:
        out = run_reference_batch(args.mode, args.from_batch,
                                  ckpt=args.ckpt or None, seed=args.seed)
    else:
        out = run_reference(args.mode, args.seed, args.input_seed,
                            args.width, args.height, args.n_boxes)
    with open(args.out, "wb") as fh:
        pickle.dump(out, fh)
    keys = sorted(out.get("fields", out.get("per_image", [{}])[0]))
    print(f"wrote {args.out}: {keys}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(HERE))  # veto_tpu importable
    main()
