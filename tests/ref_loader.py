"""Load reference (/root/reference) torch modules standalone for parity tests.

The reference files live inside the `pysgg` package with heavy deps (yacs,
CUDA _C, ipdb, sklearn...).  We exec individual files with their package
context stubbed, following the tools/gen_eval_fixtures.py pattern, so the
real torch code runs unmodified and our flax rebuilds can be compared
numerically against it.
"""

import importlib.util
import os
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"
REL_HEAD = os.path.join(
    REF_ROOT, "pysgg", "modeling", "roi_heads", "relation_head"
)


def reference_available() -> bool:
    return os.path.isdir(REL_HEAD)


class _AttrDict(dict):
    """Recursive attribute dict standing in for a yacs config node."""

    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        return self.setdefault(k, _AttrDict())

    def __setattr__(self, k, v):
        self[k] = v


def make_cfg(**leaves) -> _AttrDict:
    """Build a yacs-style config stub; leaves are dotted paths."""
    cfg = _AttrDict()
    for path, val in leaves.items():
        node = cfg
        parts = path.split("__")
        for p in parts[:-1]:
            node = getattr(node, p)
        node[parts[-1]] = val
    return cfg


def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _ensure_pkg(name, path=None):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [path] if path else []
    sys.modules[name] = mod
    return mod


def load_ref_module(fname, modname, pre_stub=None):
    """Exec a relation_head file under its real dotted name.

    ``pre_stub`` is a callable run after the package skeleton is in place
    and before the module executes (to stub siblings it imports).
    """
    pkgs = [
        ("pysgg", os.path.join(REF_ROOT, "pysgg")),
        ("pysgg.modeling", os.path.join(REF_ROOT, "pysgg", "modeling")),
        ("pysgg.modeling.roi_heads",
         os.path.join(REF_ROOT, "pysgg", "modeling", "roi_heads")),
        ("pysgg.modeling.roi_heads.relation_head", REL_HEAD),
    ]
    for name, path in pkgs:
        _ensure_pkg(name, path)
    if pre_stub:
        pre_stub()
    full = f"pysgg.modeling.roi_heads.relation_head.{modname}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, os.path.join(REL_HEAD, fname)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_model_veto():
    """model_veto.py is self-contained (torch + einops only)."""
    return load_ref_module("model_veto.py", "model_veto")


def _torch_cat(tensors, dim=0):
    import torch

    return tensors[0] if len(tensors) == 1 else torch.cat(tensors, dim)


def deterministic_glove(names, wv_dir=None, wv_type=None, wv_dim=200):
    """obj_edge_vectors replacement: seeded N(0,1), no GloVe files needed."""
    import torch

    rng = np.random.RandomState(abs(hash(tuple(names))) % (2 ** 31))
    return torch.from_numpy(rng.randn(len(names), wv_dim).astype(np.float32))


def load_ref_utils_motifs():
    """The REAL utils_motifs.py (sort_by_score, encode_box_info, to_onehot),
    with only obj_edge_vectors patched to skip the GloVe file load."""

    def pre_stub():
        _stub("ipdb", set_trace=lambda: None)
        _stub("pysgg.modeling.utils", cat=_torch_cat)
        # satisfy the import without clobbering the REAL utils_relation if
        # load_ref_utils_relation already executed it
        ur = sys.modules.get(
            "pysgg.modeling.roi_heads.relation_head.utils_relation")
        if ur is None or not hasattr(ur, "nms_overlaps"):
            _stub(
                "pysgg.modeling.roi_heads.relation_head.utils_relation",
                nms_overlaps=None,
            )

    mod = load_ref_module("utils_motifs.py", "utils_motifs", pre_stub)
    mod.obj_edge_vectors = deterministic_glove
    return mod


def load_ref_model_motifs():
    """model_motifs.py over the real utils_motifs (GloVe load patched)."""
    load_ref_utils_motifs()
    return load_ref_module("model_motifs.py", "model_motifs")


class FakeBoxList:
    """Minimal BoxList stand-in (bbox/size/mode/fields) for reference
    modules that only read those members."""

    def __init__(self, bbox, size, **fields):
        self.bbox = bbox
        self.size = size
        self.mode = "xyxy"
        self._fields = fields

    def get_field(self, k):
        return self._fields[k]

    def __len__(self):
        return self.bbox.shape[0]


def _exec_ref_file(relpath, dotted):
    """Exec an arbitrary reference file under its real dotted name."""
    parts = dotted.split(".")
    for i in range(1, len(parts)):
        _ensure_pkg(".".join(parts[:i]))
    spec = importlib.util.spec_from_file_location(
        dotted, os.path.join(REF_ROOT, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_bounding_box():
    """The REAL structures/bounding_box.py (torch-only)."""
    name = "pysgg.structures.bounding_box"
    mod = sys.modules.get(name)
    if mod is not None and hasattr(mod, "BoxList"):
        return mod
    return _exec_ref_file("pysgg/structures/bounding_box.py", name)


def load_ref_boxlist_ops():
    """The REAL structures/boxlist_ops.py (boxlist_iou/union/cat); the
    `pysgg.layers.nms` import is stubbed — boxlist_iou never calls it."""
    name = "pysgg.structures.boxlist_ops"
    mod = sys.modules.get(name)
    if mod is not None and hasattr(mod, "boxlist_iou"):
        return mod
    load_ref_bounding_box()
    _stub("pysgg.layers", nms=None)
    return _exec_ref_file("pysgg/structures/boxlist_ops.py", name)


def load_ref_utils_relation():
    """The REAL utils_relation.py (obj_prediction_nms, nms_overlaps)."""
    name = "pysgg.modeling.roi_heads.relation_head.utils_relation"
    mod = sys.modules.get(name)
    if mod is not None and not hasattr(mod, "obj_prediction_nms"):
        del sys.modules[name]  # replace an earlier attr-only stub
    _stub("ipdb", set_trace=lambda: None)
    return load_ref_module("utils_relation.py", "utils_relation")


def load_ref_inference():
    """The REAL relation_head/inference.py (PostProcessor + MEET paths)."""
    load_ref_bounding_box()
    load_ref_utils_relation()

    def pre_stub():
        _stub("ipdb", set_trace=lambda: None)

    return load_ref_module("inference.py", "inference", pre_stub)


def load_ref_rel_sampling():
    """The REAL relation_head/sampling.py (RelationSampling) over the real
    boxlist_iou."""
    load_ref_boxlist_ops()

    def pre_stub():
        _stub("ipdb", set_trace=lambda: None)
        _stub("pysgg.modeling.utils", cat=_torch_cat)

    return load_ref_module("sampling.py", "sampling", pre_stub)


def load_ref_retinanet_loss():
    """The REAL rpn/retinanet/loss.py over the real Matcher, BoxCoder,
    boxlist ops, smooth_l1 and the CPU focal-loss path (_C stubbed)."""
    name = "pysgg.modeling.rpn.retinanet.loss"
    mod = sys.modules.get(name)
    if mod is not None and hasattr(mod, "RetinaNetLossComputation"):
        return mod
    load_ref_boxlist_ops()
    _stub("pysgg", _C=types.SimpleNamespace())
    _exec_ref_file("pysgg/layers/smooth_l1_loss.py", "pysgg.layers.smooth_l1_loss")
    _exec_ref_file("pysgg/layers/sigmoid_focal_loss.py",
                   "pysgg.layers.sigmoid_focal_loss")
    layers = sys.modules["pysgg.layers"]
    layers.smooth_l1_loss = sys.modules["pysgg.layers.smooth_l1_loss"].smooth_l1_loss
    layers.SigmoidFocalLoss = sys.modules[
        "pysgg.layers.sigmoid_focal_loss"].SigmoidFocalLoss
    _exec_ref_file("pysgg/modeling/matcher.py", "pysgg.modeling.matcher")
    _exec_ref_file("pysgg/modeling/box_coder.py", "pysgg.modeling.box_coder")
    _exec_ref_file("pysgg/modeling/balanced_positive_negative_sampler.py",
                   "pysgg.modeling.balanced_positive_negative_sampler")
    _stub("pysgg.modeling.utils", cat=_torch_cat)
    _ensure_pkg("pysgg.modeling.rpn",
                os.path.join(REF_ROOT, "pysgg", "modeling", "rpn"))
    _ensure_pkg("pysgg.modeling.rpn.retinanet",
                os.path.join(REF_ROOT, "pysgg", "modeling", "rpn", "retinanet"))
    _exec_ref_file("pysgg/modeling/rpn/utils.py", "pysgg.modeling.rpn.utils")
    _exec_ref_file("pysgg/modeling/rpn/loss.py", "pysgg.modeling.rpn.loss")
    return _exec_ref_file("pysgg/modeling/rpn/retinanet/loss.py", name)


def load_ref_attribute_loss():
    """The REAL attribute_head/loss.py (AttributeHeadLossComputation)."""
    name = "pysgg.modeling.roi_heads.attribute_head.loss"
    mod = sys.modules.get(name)
    if mod is not None and hasattr(mod, "AttributeHeadLossComputation"):
        return mod
    load_ref_boxlist_ops()
    _exec_ref_file("pysgg/layers/smooth_l1_loss.py", "pysgg.layers.smooth_l1_loss")
    layers = sys.modules["pysgg.layers"]
    layers.smooth_l1_loss = sys.modules["pysgg.layers.smooth_l1_loss"].smooth_l1_loss
    if "pysgg.modeling.matcher" not in sys.modules:
        _exec_ref_file("pysgg/modeling/matcher.py", "pysgg.modeling.matcher")
    if "pysgg.modeling.box_coder" not in sys.modules:
        _exec_ref_file("pysgg/modeling/box_coder.py", "pysgg.modeling.box_coder")
    _stub("pysgg.modeling.utils", cat=_torch_cat)
    _ensure_pkg("pysgg.modeling.roi_heads",
                os.path.join(REF_ROOT, "pysgg", "modeling", "roi_heads"))
    _ensure_pkg("pysgg.modeling.roi_heads.attribute_head",
                os.path.join(REF_ROOT, "pysgg", "modeling", "roi_heads",
                             "attribute_head"))
    return _exec_ref_file("pysgg/modeling/roi_heads/attribute_head/loss.py", name)


def load_ref_solver():
    """The REAL solver/build.py + lr_scheduler.py (torch-only).

    Returns (build, lr_scheduler) modules: ``build.make_optimizer`` (per-group
    Adam, solver/build.py:7-34) and ``lr_scheduler.WarmupReduceLROnPlateau`` /
    ``WarmupMultiStepLR``.
    """
    bname = "pysgg.solver.build"
    sname = "pysgg.solver.lr_scheduler"
    if bname in sys.modules and sname in sys.modules:
        return sys.modules[bname], sys.modules[sname]
    _ensure_pkg("pysgg", os.path.join(REF_ROOT, "pysgg"))
    _ensure_pkg("pysgg.solver", os.path.join(REF_ROOT, "pysgg", "solver"))
    lrs = _exec_ref_file("pysgg/solver/lr_scheduler.py", sname)
    build = _exec_ref_file("pysgg/solver/build.py", bname)
    return build, lrs


def ref_clip_grad_norm_(named_parameters, max_norm):
    """The reference's gradient clip applied in-place (the exact formula of
    pysgg/utils/checkpoint.py:180-206, clip=True — that file's module-level
    imports pull in the whole checkpoint stack, so the 6-line numeric core is
    restated here): total L2 norm over all grads, scale by
    ``max_norm / (total_norm + 1e-6)`` only when that coefficient < 1."""
    import torch

    total = 0.0
    for _, p in named_parameters:
        if p.grad is not None:
            total += float(p.grad.norm(2)) ** 2
    total = total ** 0.5
    coef = max_norm / (total + 1e-6)
    if coef < 1:
        for _, p in named_parameters:
            if p.grad is not None:
                p.grad.mul_(coef)
    return total


def load_ref_model_motifs_with_attribute():
    """model_motifs_with_attribute.py over the real utils_motifs /
    utils_relation (registry import stubbed)."""
    load_ref_utils_motifs()
    load_ref_utils_relation()

    def pre_stub():
        import types as _t

        class _Reg(dict):
            def register(self, *a, **k):
                return lambda f: f

        _stub("pysgg.modeling", registry=_t.SimpleNamespace(
            ROI_RELATION_PREDICTOR=_Reg()))
        _stub("pysgg.modeling.utils", cat=_torch_cat)

    return load_ref_module("model_motifs_with_attribute.py",
                           "model_motifs_with_attribute", pre_stub)


def load_ref_segmentation_mask():
    """The REAL structures/segmentation_mask.py.

    pycocotools is absent in this environment, so its three primitives are
    stubbed with veto_tpu.utils.coco_mask (the numpy restatement of the same
    maskApi.c algorithms) wrapped to speak torch; cv2/cv2_util are real.
    Binary-mask paths (crop/resize/transpose/get_mask_tensor) never touch
    the stub, so parity tests on those exercise pure reference code.
    """
    name = "pysgg.structures.segmentation_mask"
    mod = sys.modules.get(name)
    if mod is not None and hasattr(mod, "SegmentationMask"):
        return mod
    import numpy as _np
    import torch as _torch

    from veto_tpu.utils import coco_mask as _cm

    def _decode(rle):
        if isinstance(rle, list):
            return _torch.from_numpy(
                _np.stack([_cm.rle_decode(r) for r in rle], axis=2))
        return _torch.from_numpy(_cm.rle_decode(rle))

    _ensure_pkg("pycocotools")
    _stub("pycocotools.mask", frPyObjects=_cm.frPyObjects,
          merge=_cm.merge_rles, decode=_decode)
    sys.modules["pycocotools"].mask = sys.modules["pycocotools.mask"]
    _exec_ref_file("pysgg/utils/cv2_util.py", "pysgg.utils.cv2_util")
    _exec_ref_file("pysgg/layers/misc.py", "pysgg.layers.misc")
    return _exec_ref_file("pysgg/structures/segmentation_mask.py", name)


def load_ref_mask_head():
    """The REAL mask_head loss.py + inference.py (matcher, boxlist_iou and
    layers.misc all real; registry not needed for these two files)."""
    lname = "pysgg.modeling.roi_heads.mask_head.loss"
    iname = "pysgg.modeling.roi_heads.mask_head.inference"
    if lname in sys.modules and iname in sys.modules:
        return sys.modules[lname], sys.modules[iname]
    load_ref_bounding_box()
    load_ref_boxlist_ops()
    load_ref_segmentation_mask()
    import torch as _torch

    smooth = _exec_ref_file("pysgg/layers/smooth_l1_loss.py",
                            "pysgg.layers.smooth_l1_loss")
    _stub("pysgg.layers", smooth_l1_loss=smooth.smooth_l1_loss,
          interpolate=sys.modules["pysgg.layers.misc"].interpolate)
    sys.modules["pysgg.layers"].misc = sys.modules["pysgg.layers.misc"]
    _exec_ref_file("pysgg/modeling/matcher.py", "pysgg.modeling.matcher")
    _stub("pysgg.modeling.utils", cat=_torch_cat)
    loss = _exec_ref_file("pysgg/modeling/roi_heads/mask_head/loss.py", lname)
    inf = _exec_ref_file("pysgg/modeling/roi_heads/mask_head/inference.py",
                         iname)
    return loss, inf


def load_ref_keypoint():
    """The REAL structures/keypoint.py (torch-only)."""
    name = "pysgg.structures.keypoint"
    mod = sys.modules.get(name)
    if mod is not None and hasattr(mod, "PersonKeypoints"):
        return mod
    return _exec_ref_file("pysgg/structures/keypoint.py", name)


def load_ref_keypoint_head():
    """The REAL keypoint_head loss.py + inference.py."""
    lname = "pysgg.modeling.roi_heads.keypoint_head.loss"
    iname = "pysgg.modeling.roi_heads.keypoint_head.inference"
    if lname in sys.modules and iname in sys.modules:
        return sys.modules[lname], sys.modules[iname]
    load_ref_bounding_box()
    load_ref_boxlist_ops()
    load_ref_keypoint()
    smooth = _exec_ref_file("pysgg/layers/smooth_l1_loss.py",
                            "pysgg.layers.smooth_l1_loss")
    _stub("pysgg.layers", smooth_l1_loss=smooth.smooth_l1_loss)
    _exec_ref_file("pysgg/modeling/matcher.py", "pysgg.modeling.matcher")
    _exec_ref_file("pysgg/modeling/balanced_positive_negative_sampler.py",
                   "pysgg.modeling.balanced_positive_negative_sampler")
    _stub("pysgg.modeling.utils", cat=_torch_cat)
    loss = _exec_ref_file("pysgg/modeling/roi_heads/keypoint_head/loss.py",
                          lname)
    inf = _exec_ref_file(
        "pysgg/modeling/roi_heads/keypoint_head/inference.py", iname)
    return loss, inf


def load_ref_retrieval_v1():
    """The REAL image_retrieval/model.py (v1 fc-fusion SGEncode).

    The file's module level drags in the full training stack (data loaders,
    solver, engine, checkpointing — none touched by the model classes), so
    those imports are stubbed; torch math + the real smooth_l1_loss run
    unmodified."""
    name = "pysgg.image_retrieval.model"
    mod = sys.modules.get(name)
    if mod is not None and hasattr(mod, "SGEncode"):
        return mod
    smooth = _exec_ref_file("pysgg/layers/smooth_l1_loss.py",
                            "pysgg.layers.smooth_l1_loss")
    _stub("pysgg.layers", smooth_l1_loss=smooth.smooth_l1_loss)
    _stub("pysgg.utils.env", setup_environment=None)
    _stub("pysgg.config", cfg=_AttrDict())
    _stub("pysgg.data", make_data_loader=None)
    _stub("pysgg.solver", make_lr_scheduler=None, make_optimizer=None)
    _stub("pysgg.engine.trainer", reduce_loss_dict=None)
    _stub("pysgg.engine.inference", inference=None)
    _stub("pysgg.modeling.detector", build_detection_model=None)
    _stub("pysgg.utils.checkpoint", DetectronCheckpointer=None,
          clip_grad_norm=None)
    _stub("pysgg.utils.collect_env", collect_env_info=None)
    _stub("pysgg.utils.comm", synchronize=None, get_rank=lambda: 0,
          all_gather=None)
    _stub("pysgg.utils.imports", import_file=None)
    _stub("pysgg.utils.logger", setup_logger=None, debug_print=None)
    _stub("pysgg.utils.miscellaneous", mkdir=None, save_config=None)
    _stub("pysgg.utils.metric_logger", MetricLogger=None)
    _stub("tqdm", tqdm=lambda x, **k: x)
    return _exec_ref_file("pysgg/image_retrieval/model.py", name)


def load_ref_fbnet():
    """The REAL fbnet_builder.py + fbnet_modeldef.py (torch).

    pysgg.layers is stubbed with the plain torch ops it re-exports
    (BatchNorm2d/Conv2d/interpolate are vanilla; FrozenBatchNorm2d is only
    needed for bn_type='af').
    """
    bname = "pysgg.modeling.backbone.fbnet_builder"
    mname = "pysgg.modeling.backbone.fbnet_modeldef"
    if bname in sys.modules and mname in sys.modules:
        return sys.modules[bname], sys.modules[mname]
    import torch as _torch
    import torch.nn as _nn
    import torch.nn.functional as _F

    if "pysgg.layers.misc" not in sys.modules:
        _exec_ref_file("pysgg/layers/misc.py", "pysgg.layers.misc")
    misc = sys.modules["pysgg.layers.misc"]

    class _FrozenBN(_nn.Module):
        def __init__(self, n):
            super().__init__()
            self.register_buffer("weight", _torch.ones(n))
            self.register_buffer("bias", _torch.zeros(n))

        def forward(self, x):
            return x * self.weight.view(1, -1, 1, 1) + self.bias.view(
                1, -1, 1, 1)

    _stub("pysgg.layers", BatchNorm2d=_nn.BatchNorm2d, Conv2d=_nn.Conv2d,
          FrozenBatchNorm2d=_FrozenBN, interpolate=_F.interpolate)
    sys.modules["pysgg.layers"].misc = misc
    builder = _exec_ref_file("pysgg/modeling/backbone/fbnet_builder.py",
                             bname)
    modeldef = _exec_ref_file("pysgg/modeling/backbone/fbnet_modeldef.py",
                              mname)
    return builder, modeldef
