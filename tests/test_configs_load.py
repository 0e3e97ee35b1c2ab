"""Every shipped YAML merges into the config tree (reference
tests/test_configs.py:9-21 analog) and carries consistent mode bits."""

import glob
import os

import pytest

from veto_tpu.config.defaults import load_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")
YAMLS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


@pytest.mark.parametrize("path", YAMLS, ids=[os.path.basename(p) for p in YAMLS])
def test_config_loads(path):
    cfg = load_config(path)
    name = os.path.basename(path)
    if "gqa" in name:
        assert cfg.relation.num_classes == 101
        assert cfg.model.num_obj_classes == 201
        assert "GQA" in cfg.data.dataset
    if "sgdet" in name:
        assert not cfg.relation.use_gt_box
    elif "sgcls" in name:
        assert cfg.relation.use_gt_box
        assert not cfg.relation.use_gt_object_label
    elif "predcls" in name:
        assert cfg.relation.use_gt_box and cfg.relation.use_gt_object_label
    if "meet" in name:
        assert cfg.ensemble.enabled
        assert cfg.relation.predictor == "VETOPredictor_MEET"


def test_config_count_covers_reference_modes():
    names = {os.path.basename(p) for p in YAMLS}
    for required in ("veto_vg_predcls.yaml", "veto_vg_sgcls.yaml",
                     "veto_vg_sgdet.yaml", "veto_meet_vg_predcls.yaml",
                     "gqa_predcls.yaml", "gqa_sgcls.yaml", "gqa_sgdet.yaml",
                     "gqa_meet_predcls.yaml"):
        assert required in names, required
