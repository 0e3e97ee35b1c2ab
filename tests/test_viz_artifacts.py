"""Diagnostic-PNG artifact tests (utils/viz.py).

Reference analogs: rel_freq_dist.png (visual_genome.py:236-295,
data/build.py:97-141) and rel_freq_dist2recall-*.png (vg_eval.py:208-248).
"""

import os

import numpy as np

from veto_tpu.utils.viz import (
    eval_plots_from_aggregate,
    save_freq_to_recall,
    save_rel_freq_dist,
)

NAMES = [f"pred{i}" for i in range(12)]
PARTS = ["h"] * 4 + ["b"] * 4 + ["t"] * 4


def _png(path):
    assert path is not None and os.path.exists(path)
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(path) > 1000


def test_freq_dist_single_panel(tmp_path):
    counts = np.arange(12)[::-1] * 100 + 5
    _png(save_rel_freq_dist(NAMES, counts, PARTS,
                            str(tmp_path / "rel_freq_dist.png")))


def test_freq_dist_two_panel_resampled(tmp_path):
    init = np.arange(12)[::-1] * 100 + 5
    post = init * 0.5
    _png(save_rel_freq_dist(NAMES, post, PARTS,
                            str(tmp_path / "two.png"), counts_init=init))


def test_freq_to_recall(tmp_path):
    freq = np.arange(12)[::-1] * 100
    recall = np.linspace(0.9, 0.1, 12)
    _png(save_freq_to_recall(NAMES, freq, recall, PARTS,
                             str(tmp_path / "f2r.png")))


def test_eval_plots_from_aggregate(tmp_path):
    # predicate 0 is background; mR_per_class index i ↔ predicate id i+1
    agg = {"mR_per_class": {100: list(np.linspace(0.05, 0.95, 12))}}
    path = eval_plots_from_aggregate(
        agg, ["__background__"] + NAMES, [0] + [100] * 12,
        [None] + PARTS, str(tmp_path), "predcls", 3)
    assert path.endswith("rel_freq_dist2recall-predcls-3.png")
    _png(path)


def test_eval_plots_missing_k_is_noop(tmp_path):
    assert eval_plots_from_aggregate(
        {"mR_per_class": {}}, NAMES, [1] * 12, PARTS,
        str(tmp_path), "predcls", 1) is None
