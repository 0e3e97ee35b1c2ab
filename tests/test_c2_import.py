"""caffe2/Detectron weight ingestion (VERDICT r3 #5).

Golden tests for the blob-rename chain of c2_model_loading.py:12-116, the
catalog:// URL resolution of paths_catalog.py:251-282, and the .pkl →
flax-params pipeline on a synthetic caffe2-named state dict shaped like
the X-101-32x8d ImageNet file.
"""

import os
import pickle

import numpy as np
import pytest

from veto_tpu.utils.torch_import import (
    c2_rename_key,
    catalog_url,
    load_c2_state_dict,
    resolve_catalog,
)


# golden pairs spanning every rename family (stem, stages, branches,
# downsample, FPN, RPN, heads, mask/keypoint blobs, fc1000)
GOLDEN = {
    "conv1_w": "backbone.body.stem.conv1.weight",
    "res_conv1_bn_s": "backbone.body.stem.bn1.weight",
    "res_conv1_bn_b": "backbone.body.stem.bn1.bias",
    "res2_0_branch2a_w": "backbone.body.layer1.0.conv1.weight",
    "res2_0_branch2a_bn_s": "backbone.body.layer1.0.bn1.weight",
    "res2_0_branch2b_w": "backbone.body.layer1.0.conv2.weight",
    "res2_0_branch2c_bn_b": "backbone.body.layer1.0.bn3.bias",
    "res2_0_branch1_w": "backbone.body.layer1.0.downsample.0.weight",
    "res2_0_branch1_bn_s": "backbone.body.layer1.0.downsample.1.weight",
    "res3_5_branch2b_w": "backbone.body.layer2.5.conv2.weight",
    "res4_22_branch2c_w": "backbone.body.layer3.22.conv3.weight",
    "res5_2_branch2a_bn_b": "backbone.body.layer4.2.bn1.bias",
    "fpn_inner_res2_2_sum_lateral_w": "backbone.fpn.fpn_inner1.weight",
    "fpn_inner_res3_3_sum_lateral_b": "backbone.fpn.fpn_inner2.bias",
    "fpn_inner_res5_2_sum_w": "backbone.fpn.fpn_inner4.weight",
    "fpn_res2_2_sum_w": "backbone.fpn.fpn_layer1.weight",
    "fpn_res5_2_sum_b": "backbone.fpn.fpn_layer4.bias",
    "conv_rpn_fpn2_w": "rpn.head.conv.weight",
    "rpn_cls_logits_fpn2_b": "rpn.head.cls_logits.bias",
    "rpn_bbox_pred_fpn2_w": "rpn.head.bbox_pred.weight",
    "fc6_w": "roi_heads.box.feature_extractor.fc6.weight",
    "fc7_b": "roi_heads.box.feature_extractor.fc7.bias",
    "cls_score_w": "roi_heads.box.predictor.cls_score.weight",
    "bbox_pred_b": "roi_heads.box.predictor.bbox_pred.bias",
    "pred_w": "fc1000.weight",  # ImageNet classifier head (dropped later)
    "pred_b": "fc1000.bias",
}


def test_c2_rename_goldens():
    for c2, expected in GOLDEN.items():
        assert c2_rename_key(c2) == expected, (c2, c2_rename_key(c2))


def test_catalog_urls():
    # ModelCatalog.get (paths_catalog.py:251-282) shapes
    u = catalog_url("catalog://ImageNetPretrained/FAIR/20171220/X-101-32x8d")
    assert u == ("https://dl.fbaipublicfiles.com/detectron/"
                 "ImageNetPretrained/20171220/X-101-32x8d.pkl")
    u = catalog_url("catalog://ImageNetPretrained/MSRA/R-50")
    assert u.endswith("ImageNetPretrained/MSRA/R-50.pkl")
    u = catalog_url(
        "catalog://Caffe2Detectron/COCO/35857345/e2e_faster_rcnn_R-50-FPN_1x")
    assert u == ("https://dl.fbaipublicfiles.com/detectron/35857345/"
                 "12_2017_baselines/e2e_faster_rcnn_R-50-FPN_1x.yaml."
                 "01_36_30.cUF7QR7I/output/train/coco_2014_train%3A"
                 "coco_2014_valminusminival/generalized_rcnn/model_final.pkl")
    # keypoint models add the keypoints_ dataset tag
    u = catalog_url("catalog://Caffe2Detectron/COCO/37697547/"
                    "e2e_keypoint_rcnn_R-50-FPN_1x")
    assert "keypoints_coco_2014_train" in u
    with pytest.raises(KeyError):
        catalog_url("catalog://ImageNetPretrained/NOPE/X-1")


def test_load_c2_pickle_and_synthetic_stats(tmp_path):
    rng = np.random.RandomState(0)
    blobs = {
        "conv1_w": rng.randn(64, 3, 7, 7).astype(np.float32),
        "res_conv1_bn_s": rng.rand(64).astype(np.float32) + 0.5,
        "res_conv1_bn_b": rng.randn(64).astype(np.float32),
        "res2_0_branch2a_w": rng.randn(64, 64, 1, 1).astype(np.float32),
        "res2_0_branch2a_bn_s": rng.rand(64).astype(np.float32) + 0.5,
        "res2_0_branch2a_bn_b": rng.randn(64).astype(np.float32),
        # momentum blobs must be dropped (c2_model_loading.py:97-99)
        "res2_0_branch2a_w_momentum": rng.randn(64, 64, 1, 1).astype(
            np.float32),
        "fc6_w": rng.randn(8, 8).astype(np.float32),
        "pred_w": rng.randn(1000, 2048).astype(np.float32),
    }
    path = tmp_path / "R-50.pkl"
    with open(path, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    sd = load_c2_state_dict(str(path))
    assert "backbone.body.stem.conv1.weight" in sd
    assert not any("momentum" in k for k in sd)
    # caffe2 AffineChannel has no running stats: synthetic zero-mean /
    # unit-var buffers are added so downstream BN folding degenerates to
    # scale=weight, bias=bias exactly
    np.testing.assert_array_equal(
        sd["backbone.body.stem.bn1.running_mean"], np.zeros(64))
    np.testing.assert_array_equal(
        sd["backbone.body.layer1.0.bn1.running_var"], np.ones(64))
    np.testing.assert_array_equal(
        sd["backbone.body.stem.bn1.weight"], blobs["res_conv1_bn_s"])


def test_resolve_catalog_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("VETO_WEIGHTS_CACHE", str(tmp_path))
    with pytest.raises(FileNotFoundError) as ei:
        resolve_catalog("catalog://ImageNetPretrained/MSRA/R-50")
    assert "R-50.pkl" in str(ei.value)
    # place the file where the URL basename maps and it resolves
    open(tmp_path / "R-50.pkl", "wb").close()
    path = resolve_catalog("catalog://ImageNetPretrained/MSRA/R-50")
    assert path == str(tmp_path / "R-50.pkl")


def test_c2_pipeline_to_param_updates(tmp_path):
    """End-to-end: a tiny caffe2 pickle flows through load_c2_state_dict →
    detector_param_updates into flax-path updates (HWIO conv layout,
    AffineChannel folded to scale/bias)."""
    from veto_tpu.utils.torch_import import detector_param_updates

    rng = np.random.RandomState(1)
    w = rng.randn(16, 3, 7, 7).astype(np.float32)
    scale = (rng.rand(16) + 0.5).astype(np.float32)
    bias = rng.randn(16).astype(np.float32)
    blobs = {"conv1_w": w, "res_conv1_bn_s": scale, "res_conv1_bn_b": bias}
    path = tmp_path / "tiny.pkl"
    with open(path, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    updates = detector_param_updates(load_c2_state_dict(str(path)))
    k = updates[("backbone", "body", "stem_conv", "kernel")]
    assert k.shape == (7, 7, 3, 16)  # OIHW -> HWIO
    np.testing.assert_allclose(k, np.transpose(w, (2, 3, 1, 0)))
    # synthetic running stats (mean 0, var 1) fold to identity: the BN
    # scale/bias must equal the AffineChannel scale/bias up to the eps term
    s = updates[("backbone", "body", "stem_bn", "scale")]
    b = updates[("backbone", "body", "stem_bn", "bias")]
    np.testing.assert_allclose(s, scale, rtol=1e-4)
    np.testing.assert_allclose(b, bias, rtol=1e-4, atol=1e-5)
