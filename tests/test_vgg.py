"""VGG-16 legacy backbone: torch forward parity + single-level detect wiring.

The reference body is torchvision ``vgg16.features`` with the last maxpool
deleted and the last ReLU dropped (pysgg/modeling/backbone/vgg.py:32-44).
torchvision is not installed here, so the test hand-builds the identical
Sequential layout in torch, exports ``features.<i>.*`` names, and imports
through detector_param_updates.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from veto_tpu.models.backbone.vgg import VGG16Body, VGG16_CONVS, _POOL_AFTER
from veto_tpu.utils.torch_import import apply_updates, detector_param_updates


def _torch_vgg_body():
    """torchvision vgg16.features[:29] with indices preserved, minus the
    final ReLU (the reference's [:-1] slice)."""
    layers = {}
    in_ch = 3
    for idx, ch in VGG16_CONVS:
        layers[str(idx)] = tnn.Conv2d(in_ch, ch, 3, padding=1)
        if idx != 28:
            layers[str(idx + 1)] = tnn.ReLU(inplace=False)
        if idx in _POOL_AFTER:
            layers[str(idx + 2)] = tnn.MaxPool2d(2, 2)
        in_ch = ch
    seq = tnn.Sequential()
    for name, mod in layers.items():
        seq.add_module(name, mod)
    return seq


def test_vgg16_forward_parity():
    torch.manual_seed(0)
    body = _torch_vgg_body().eval()
    sd = {f"features.{n}": p.detach().numpy()
          for n, p in body.state_dict().items()}

    x = np.random.default_rng(0).standard_normal((1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = body(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = VGG16Body(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    updates = detector_param_updates({k: np.asarray(v) for k, v in sd.items()})
    # importer emits ('backbone', conv, ...) paths; the body here IS the root
    updates = {p[1:]: v for p, v in updates.items() if p[0] == "backbone"}
    params, loaded, skipped = apply_updates(params, updates)
    assert len(loaded) == 26 and not skipped  # 13 convs x (kernel, bias)

    out = model.apply({"params": params}, jnp.asarray(x))[0]
    np.testing.assert_allclose(
        np.transpose(ref, (0, 2, 3, 1)), np.asarray(out), atol=2e-4)
    # stride 16, 512 channels (MODEL.VGG.VGG16_OUT_CHANNELS)
    assert out.shape == (1, 4, 6, 512)


def test_vgg16_single_level_detect_smoke():
    """SGGModel with backbone_type=VGG-16 runs the full sgdet detect path
    on the single stride-16 level (non-FPN RPN: 5 sizes x ratios/cell)."""
    from veto_tpu.models.sgg import SGGModel

    model = SGGModel(
        mode="sgdet",
        backbone_type="VGG-16",
        anchor_sizes=((32, 64, 128, 256, 512),),
        anchor_strides=(16,),
        pooler_scales=(0.0625,),
        aspect_ratios=(0.5, 1.0, 2.0),  # reference non-FPN default :158
        rpn_pre_nms_top_n=200,
        rpn_post_nms_top_n=50,
        rpn_fpn_post_nms_top_n=50,
        detections_per_img=8,
        dtype=jnp.float32,
    )
    images = jnp.zeros((1, 64, 96, 3), jnp.float32)
    sizes = jnp.asarray([[96, 64]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, sizes, method=model.detect)
    det = model.apply(variables, images, sizes, method=model.detect)
    assert det.detections.boxes.shape == (1, 8, 4)
    assert np.isfinite(np.asarray(det.detections.boxes)).all()
    # RPN head sized for the scale enumeration: 15 anchors/cell
    cls_kernel = variables["params"]["rpn"]["cls_logits"]["kernel"]
    assert cls_kernel.shape[-1] == 15
