"""Model-level numerical parity vs the reference torch implementation.

These tests load the REFERENCE modules (or replicate their constructor lines
verbatim where the full class needs the whole pysgg runtime), copy weights
through the deterministic name maps in veto_tpu.utils.torch_import, and
assert the flax rebuilds produce the same numbers.  This validates in
particular the pair-factorized VETO projection trick
(predictor_veto.py docstring) claimed mathematically identical to
roi_relation_predictors.py:4104-4126 + model_veto.py:99-115.
"""

import os
import pickle

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from ref_loader import (
    load_ref_model_motifs,
    load_ref_model_veto,
    make_cfg,
    reference_available,
)
from veto_tpu.utils.torch_import import (
    apply_updates,
    veto_encoder_updates,
    veto_relation_param_updates,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not mounted"
)

DIM, LAYERS, HEADS, PATCH = 576, 6, 6, 2
NUM_OBJ, NUM_REL, C = 151, 51, 256


def _veto_cfg():
    return make_cfg(
        MODEL__ROI_RELATION_HEAD__VETOTRANSFORMER__PATCH_SIZE=PATCH,
        MODEL__ROI_RELATION_HEAD__VETOTRANSFORMER__T_INPUT_DIM=DIM,
        MODEL__ROI_RELATION_HEAD__VETOTRANSFORMER__ENC_LAYERS=LAYERS,
        MODEL__ROI_RELATION_HEAD__VETOTRANSFORMER__NHEADS=HEADS,
        MODEL__ROI_RELATION_HEAD__VETOTRANSFORMER__EMB_DROPOUT=0.0,
        MODEL__ROI_RELATION_HEAD__VETOTRANSFORMER__T_DROPOUT=0.0,
    )


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_veto_transformer_parity():
    """VetoTransformer vs reference model_veto.VETOTransformer (:6-26)."""
    from veto_tpu.models.relation.veto_transformer import VetoTransformer

    ref_mod = load_ref_model_veto()
    torch.manual_seed(0)
    ref = ref_mod.VETOTransformer(config=_veto_cfg(), in_channels=C).eval()

    p = 3
    d = torch.randn(p, 2 * C, 8, 8)
    v = torch.randn(p, 2 * C, 8, 8)
    loc = torch.randn(p, DIM)
    cls = torch.randn(p, DIM)
    with torch.no_grad():
        want = ref(d, v, loc, cls).numpy()

    ours = VetoTransformer(dim=DIM, layers=LAYERS, heads=HEADS, patch_size=PATCH)
    dj, vj = jnp.asarray(_nhwc(d)), jnp.asarray(_nhwc(v))
    lj, cj = jnp.asarray(loc.numpy()), jnp.asarray(cls.numpy())
    variables = ours.init(jax.random.PRNGKey(0), dj, vj, lj, cj)

    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    updates = veto_encoder_updates(sd, "transformer", (), layers=LAYERS)
    for name in ("proj_d", "proj_v"):
        w = sd[f"transformer.patch_embed.{name}.weight"]
        updates[("patch_embed", name, "kernel")] = np.transpose(w, (1, 0))
        updates[("patch_embed", name, "bias")] = sd[
            f"transformer.patch_embed.{name}.bias"
        ]
    new_params, loaded, skipped = apply_updates(variables["params"], updates)
    assert not skipped, skipped[:5]

    got = np.asarray(ours.apply({"params": new_params}, dj, vj, lj, cj))
    np.testing.assert_allclose(got, want, atol=2e-4)


class _RefVetoHead(tnn.Module):
    """The reference VETOPredictor's feature path, constructor lines copied
    verbatim (roi_relation_predictors.py:4021-4059) with the GloVe load and
    CUDA pinning dropped."""

    def __init__(self, ref_veto_mod):
        super().__init__()
        self.obj_embed = tnn.Embedding(NUM_OBJ, 200)
        self.pos_embed = tnn.Sequential(*[
            tnn.BatchNorm1d(4, momentum=0.001),
            tnn.Linear(4, 128),
            tnn.ReLU(inplace=True),
            tnn.Dropout(0.1),
        ])
        self.location_projection = tnn.Sequential(
            tnn.Linear(256, DIM), tnn.ReLU(inplace=True))
        self.class_projection = tnn.Sequential(
            tnn.Linear(200 * 2, DIM), tnn.ReLU(inplace=True))
        self.fusion_transformer = ref_veto_mod.VETOTransformer(
            config=_veto_cfg(), in_channels=C)
        self.rel_out = tnn.Linear(DIM, NUM_REL, bias=True)

    def forward(self, boxes_xyxy, labels, roi, depth, pairs):
        """Forward lines :4086-4126, single image (predcls, eval)."""
        # BoxList.convert('xywh') uses w = x2 - x1 + 1 (bounding_box.py:72-92)
        xywh = torch.cat(
            [boxes_xyxy[:, :2], boxes_xyxy[:, 2:] - boxes_xyxy[:, :2] + 1], 1)
        center = torch.cat(
            (xywh[:, :2] + 0.5 * xywh[:, 2:], xywh[:, 2:]), dim=-1)
        pos_embed = self.pos_embed(center)
        obj_embed = self.obj_embed(labels.long())
        subj_inds, obj_inds = pairs[:, 0].long(), pairs[:, 1].long()
        rel_location = self.location_projection(
            torch.cat((pos_embed[subj_inds], pos_embed[obj_inds]), dim=1))
        rel_class = self.class_projection(
            torch.cat((obj_embed[subj_inds], obj_embed[obj_inds]), dim=1))
        rel_visual = torch.cat((roi[subj_inds], roi[obj_inds]), 1)
        rel_depth = torch.cat((depth[subj_inds], depth[obj_inds]), 1)
        feat = self.fusion_transformer(
            rel_depth, rel_visual, rel_location, rel_class)
        return self.rel_out(feat), feat


def test_veto_pair_factorized_predictor_parity():
    """The pair-factorized VetoPredictor must equal the reference's
    concat-then-project pipeline bit-for-bit (up to float assoc)."""
    from veto_tpu.models.relation.predictor_veto import VetoPredictor

    ref_mod = load_ref_model_veto()
    torch.manual_seed(1)
    ref = _RefVetoHead(ref_mod).eval()
    # non-trivial BN running stats
    with torch.no_grad():
        ref.pos_embed[0].running_mean.copy_(torch.randn(4) * 50)
        ref.pos_embed[0].running_var.copy_(torch.rand(4) * 100 + 1)

    n, p = 5, 7
    rng = np.random.RandomState(0)
    boxes = np.sort(rng.uniform(0, 500, (n, 2, 2)), axis=1).reshape(n, 4)
    boxes = boxes[:, [0, 2, 1, 3]].astype(np.float32)  # xyxy
    labels = rng.randint(1, NUM_OBJ, n).astype(np.int64)
    roi = rng.randn(n, C, 8, 8).astype(np.float32)
    depth = rng.randn(n, C, 8, 8).astype(np.float32)
    pairs = np.stack(
        [rng.randint(0, n, p), rng.randint(0, n, p)], axis=1).astype(np.int64)

    with torch.no_grad():
        want_logits, want_feat = ref(
            torch.from_numpy(boxes), torch.from_numpy(labels),
            torch.from_numpy(roi), torch.from_numpy(depth),
            torch.from_numpy(pairs),
        )

    ours = VetoPredictor(mode="predcls", remat=False, dtype=jnp.float32)
    args = dict(
        boxes=jnp.asarray(boxes)[None],
        box_mask=jnp.ones((1, n), bool),
        obj_labels=jnp.asarray(labels)[None].astype(jnp.int32),
        obj_logits=jnp.zeros((1, n, NUM_OBJ)),
        pair_idx=jnp.asarray(pairs)[None].astype(jnp.int32),
        pair_mask=jnp.ones((1, p), bool),
        roi_features=jnp.asarray(np.transpose(roi, (0, 2, 3, 1)))[None],
        depth_features=jnp.asarray(np.transpose(depth, (0, 2, 3, 1)))[None],
    )
    variables = ours.init(jax.random.PRNGKey(0), **args, train=False)

    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    # _RefVetoHead keys are already predictor-local
    updates, stats = veto_relation_param_updates(sd, src_prefix="")
    new_params, loaded, skipped = apply_updates(variables["params"], updates)
    assert not skipped, skipped[:5]
    new_stats, s_loaded, s_skipped = apply_updates(
        variables.get("batch_stats", {}), stats)
    assert not s_skipped, s_skipped

    out = ours.apply(
        {"params": new_params, "batch_stats": new_stats}, **args, train=False)
    got = np.asarray(out.rel_logits[0])
    np.testing.assert_allclose(got, want_logits.numpy(), atol=3e-4)


def test_beta_class_weights_parity():
    """beta_class_weights vs the reference expression evaluated on the real
    pred_counts.pkl (roi_relation_predictors.py:4059-4070)."""
    from veto_tpu.models.relation.predictor_veto import beta_class_weights

    path = "/root/reference/pred_counts.pkl"
    if not os.path.exists(path):
        pytest.skip("pred_counts.pkl missing")
    with open(path, "rb") as fin:
        rel_counts = pickle.load(fin)
    rel_counts = np.asarray(rel_counts, dtype=np.float64)

    want = rel_counts.copy()
    want[::-1].sort()  # reference line: rel_counts[::-1].sort()
    beta = 0.999
    w = (1.0 - beta) / (1 - (beta ** want))
    w *= float(len(w)) / np.sum(w)

    got = beta_class_weights(rel_counts, beta=beta)
    assert got.shape == w.shape
    np.testing.assert_allclose(got, w.astype(np.float32), rtol=1e-6)


def test_frequency_bias_parity():
    """FrequencyBias vs reference model_motifs.py:14-56 (hard and soft
    lookups)."""
    from veto_tpu.models.relation.freq_bias import FrequencyBias

    ref_mod = load_ref_model_motifs()
    no, nr = 13, 9
    rng = np.random.RandomState(3)
    pred_dist = rng.dirichlet(np.ones(nr), (no, no)).astype(np.float32) + 1e-3

    stats = {"pred_dist": torch.from_numpy(pred_dist)}
    ref = ref_mod.FrequencyBias(None, stats).eval()

    ours = FrequencyBias(num_obj_classes=no, num_rel_classes=nr,
                         pred_dist=pred_dist)
    variables = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 2), jnp.int32))

    pairs = rng.randint(0, no, (17, 2))
    with torch.no_grad():
        want = ref.index_with_labels(torch.from_numpy(pairs)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(pairs)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    pair_prob = rng.dirichlet(np.ones(no), (6, 2)).astype(np.float32)
    pair_prob = np.transpose(pair_prob, (0, 2, 1))  # (B, num_obj, 2)
    with torch.no_grad():
        want = ref.index_with_probability(torch.from_numpy(pair_prob)).numpy()
    got = np.asarray(
        ours.apply(variables, jnp.asarray(pair_prob),
                   method=FrequencyBias.index_with_probability)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def _decoder_updates(ref):
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    t = lambda w: np.transpose(w, (1, 0))  # noqa: E731
    return {
        ("obj_embed",): sd["obj_embed.weight"],
        ("input_w",): t(sd["input_linearity.weight"]),
        ("input_b",): sd["input_linearity.bias"],
        ("state_w",): t(sd["state_linearity.weight"]),
        ("state_b",): sd["state_linearity.bias"],
        ("out_w",): t(sd["out_obj.weight"]),
        ("out_b",): sd["out_obj.bias"],
    }


@pytest.mark.parametrize("train", [False, True])
def test_decoder_rnn_parity(train):
    """HighwayDecoderLSTM vs reference DecoderRNN (model_motifs.py:58-223),
    greedy eval and teacher-forced train."""
    from torch.nn.utils.rnn import PackedSequence

    from veto_tpu.models.relation.legacy.lstm import HighwayDecoderLSTM

    ref_mod = load_ref_model_motifs()
    no, d, h, n = 11, 24, 32, 6
    cfg = make_cfg(
        GLOVE_DIR="/nonexistent",
        TEST__RELATION__LATER_NMS_PREDICTION_THRES=0.5,
    )
    torch.manual_seed(4)
    obj_classes = [f"c{i}" for i in range(no)]
    ref = ref_mod.DecoderRNN(cfg, obj_classes, embed_dim=16, inputs_dim=d,
                             hidden_dim=h, rnn_drop=0.0)
    ref.train(train)

    rng = np.random.RandomState(5)
    feats = rng.randn(n, d).astype(np.float32)
    labels = rng.randint(0, no, n).astype(np.int64)
    labels[1] = 0  # exercise the bg → argmax replacement (:186-192)

    # single sequence, one active element per timestep
    packed = PackedSequence(
        torch.from_numpy(feats), torch.tensor([1] * n),
    )
    with torch.no_grad():
        want_dists, want_labels = ref(
            packed, labels=torch.from_numpy(labels) if train else None)

    ours = HighwayDecoderLSTM(num_obj_classes=no, embed_dim=16, hidden=h)
    fj = jnp.asarray(feats)[None]
    mj = jnp.ones((1, n), bool)
    lj = jnp.asarray(labels)[None].astype(jnp.int32)
    variables = ours.init(jax.random.PRNGKey(0), fj, mj, lj, train)
    new_params, loaded, skipped = apply_updates(
        variables["params"], _decoder_updates(ref))
    assert not skipped, skipped
    new_params = jax.tree.map(jnp.asarray, new_params)

    logits, refined = ours.apply(
        {"params": new_params}, fj, mj, lj if train else None, train)
    np.testing.assert_allclose(
        np.asarray(logits[0]), want_dists.numpy(), atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(refined[0]), want_labels.numpy())


@pytest.mark.parametrize("train", [False, True])
def test_lstm_context_parity(train):
    """Our LSTMContext vs the reference model_motifs.LSTMContext (:224-420)
    end-to-end in sgcls mode: biLSTM object context, highway decoder, edge
    context, with the reference's own sort_by_score/encode_box_info."""
    from ref_loader import FakeBoxList
    from veto_tpu.models.relation.legacy.predictors import LSTMContext
    from veto_tpu.utils.torch_import import motifs_context_param_updates

    ref_mod = load_ref_model_motifs()
    no, embed, hidden, d, n = 11, 16, 24, 20, 7
    cfg = make_cfg(
        GLOVE_DIR="/nonexistent",
        MODEL__ROI_RELATION_HEAD__USE_GT_BOX=True,
        MODEL__ROI_RELATION_HEAD__USE_GT_OBJECT_LABEL=False,  # sgcls
        MODEL__ROI_RELATION_HEAD__EMBED_DIM=embed,
        MODEL__ROI_RELATION_HEAD__CONTEXT_DROPOUT_RATE=0.0,
        MODEL__ROI_RELATION_HEAD__CONTEXT_HIDDEN_DIM=hidden,
        MODEL__ROI_RELATION_HEAD__CONTEXT_OBJ_LAYER=1,
        MODEL__ROI_RELATION_HEAD__CONTEXT_REL_LAYER=1,
        MODEL__ROI_RELATION_HEAD__CAUSAL__EFFECT_ANALYSIS=False,
        TEST__RELATION__LATER_NMS_PREDICTION_THRES=0.5,
    )
    obj_classes = [f"c{i}" for i in range(no)]
    torch.manual_seed(7)
    ref = ref_mod.LSTMContext(cfg, obj_classes, [], in_channels=d)
    ref.train(train)
    with torch.no_grad():  # non-trivial BN running stats for the eval path
        ref.pos_embed[1].running_mean.copy_(torch.randn(32) * 0.3)
        ref.pos_embed[1].running_var.copy_(torch.rand(32) + 0.5)

    rng = np.random.RandomState(8)
    boxes = np.sort(rng.uniform(0, 300, (n, 2, 2)), axis=1)
    boxes = boxes[:, [0, 1], :].reshape(n, 4)[:, [0, 2, 1, 3]].astype(np.float32)
    labels = rng.randint(1, no, n).astype(np.int64)
    logits = rng.randn(n, no).astype(np.float32)
    feats = rng.randn(n, d).astype(np.float32)
    size = (400, 320)  # (w, h)

    prop = FakeBoxList(
        torch.from_numpy(boxes), size,
        labels=torch.from_numpy(labels),
        predict_logits=torch.from_numpy(logits),
    )
    with torch.no_grad():
        want_dists, want_preds, want_edge, _ = ref(
            torch.from_numpy(feats), [prop], None)

    ours = LSTMContext(
        num_obj_classes=no, embed_dim=embed, hidden_dim=hidden,
        mode="sgcls", dtype=jnp.float32,
    )
    args = dict(
        roi_features=jnp.asarray(feats)[None],
        boxes=jnp.asarray(boxes)[None],
        box_mask=jnp.ones((1, n), bool),
        obj_labels=jnp.asarray(labels)[None].astype(jnp.int32),
        predict_logits=jnp.asarray(logits)[None],
        image_sizes=jnp.asarray([[size[0], size[1]]], jnp.float32),
    )
    variables = ours.init(jax.random.PRNGKey(0), **args, train=train)

    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    updates, stats = motifs_context_param_updates(sd)
    new_params, loaded, skipped = apply_updates(variables["params"], updates)
    assert not skipped, skipped[:8]
    new_stats, _, s_skipped = apply_updates(variables["batch_stats"], stats)
    assert not s_skipped, s_skipped
    new_params = jax.tree.map(jnp.asarray, new_params)
    new_stats = jax.tree.map(jnp.asarray, new_stats)

    out, _ = ours.apply(
        {"params": new_params, "batch_stats": new_stats}, **args, train=train,
        mutable=["batch_stats"],
    )
    obj_dists, obj_preds, edge_ctx = out
    np.testing.assert_allclose(
        np.asarray(obj_dists[0]), want_dists.numpy(), atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(obj_preds[0]), want_preds.numpy())
    np.testing.assert_allclose(
        np.asarray(edge_ctx[0]), want_edge.numpy(), atol=2e-4)
