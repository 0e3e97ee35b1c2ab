"""Attribute-aware Motifs context vs the live reference
AttributeLSTMContext (model_motifs_with_attribute.py:180-372), predcls and
sgcls modes, weights imported from the real torch module.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import (
    FakeBoxList,
    load_ref_model_motifs_with_attribute,
    make_cfg,
)
from veto_tpu.models.relation.legacy.predictors import AttributeLSTMContext
from veto_tpu.utils.torch_import import (
    apply_updates,
    attribute_context_param_updates,
)

NO, NA, EMBED, HIDDEN, D, N = 11, 9, 16, 24, 20, 7


def _cfg(predcls):
    return make_cfg(
        GLOVE_DIR="/nonexistent",
        MODEL__ROI_RELATION_HEAD__USE_GT_BOX=True,
        MODEL__ROI_RELATION_HEAD__USE_GT_OBJECT_LABEL=predcls,
        MODEL__ROI_RELATION_HEAD__EMBED_DIM=EMBED,
        MODEL__ROI_RELATION_HEAD__CONTEXT_DROPOUT_RATE=0.0,
        MODEL__ROI_RELATION_HEAD__CONTEXT_HIDDEN_DIM=HIDDEN,
        MODEL__ROI_RELATION_HEAD__CONTEXT_OBJ_LAYER=1,
        MODEL__ROI_RELATION_HEAD__CONTEXT_REL_LAYER=1,
        MODEL__ROI_ATTRIBUTE_HEAD__MAX_ATTRIBUTES=10,
        MODEL__ROI_ATTRIBUTE_HEAD__NUM_ATTRIBUTES=NA,
        TEST__RELATION__LATER_NMS_PREDICTION_THRES=0.5,
    )


@pytest.mark.parametrize("mode", ["predcls", "sgcls"])
def test_attribute_lstm_context_parity(mode):
    ref_mod = load_ref_model_motifs_with_attribute()
    torch.manual_seed(11)
    obj_classes = [f"c{i}" for i in range(NO)]
    att_classes = [f"a{i}" for i in range(NA)]
    ref = ref_mod.AttributeLSTMContext(
        _cfg(mode == "predcls"), obj_classes, att_classes, [], in_channels=D
    ).eval()

    rng = np.random.RandomState(12)
    boxes = np.sort(rng.uniform(0, 300, (N, 2, 2)), axis=1)
    boxes = boxes[:, [0, 1], :].reshape(N, 4)[:, [0, 2, 1, 3]].astype(np.float32)
    labels = rng.randint(1, NO, N).astype(np.int64)
    logits = rng.randn(N, NO).astype(np.float32)
    att_logits = rng.randn(N, NA).astype(np.float32)
    attrs = np.zeros((N, 10), np.int64)
    attrs[0, :2] = [2, 5]
    attrs[3, 0] = 7
    feats = rng.randn(N, D).astype(np.float32)
    size = (400, 320)

    prop = FakeBoxList(
        torch.from_numpy(boxes), size,
        labels=torch.from_numpy(labels),
        attributes=torch.from_numpy(attrs),
        predict_logits=torch.from_numpy(logits),
        attribute_logits=torch.from_numpy(att_logits),
    )
    with torch.no_grad():
        want_obj, want_preds, want_att, want_edge = ref(
            torch.from_numpy(feats), [prop], None)

    ours = AttributeLSTMContext(
        num_obj_classes=NO, num_att_classes=NA, embed_dim=EMBED,
        hidden_dim=HIDDEN, mode=mode, dtype=jnp.float32,
    )
    args = dict(
        roi_features=jnp.asarray(feats)[None],
        boxes=jnp.asarray(boxes)[None],
        box_mask=jnp.ones((1, N), bool),
        obj_labels=jnp.asarray(labels)[None].astype(jnp.int32),
        attributes=jnp.asarray(attrs)[None].astype(jnp.int32),
        predict_logits=jnp.asarray(logits)[None],
        attribute_logits=jnp.asarray(att_logits)[None],
        image_sizes=jnp.asarray([[size[0], size[1]]], jnp.float32),
    )
    variables = ours.init(jax.random.PRNGKey(0), **args, train=False)

    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    updates = attribute_context_param_updates(sd)
    if mode == "predcls":
        # predcls never runs the decoder, so the compact module has no
        # decoder subtree to load into (reference constructs-but-skips it)
        updates = {p: v for p, v in updates.items() if p[0] != "decoder_rnn"}
    new_params, loaded, skipped = apply_updates(variables["params"], updates)
    assert not skipped, skipped[:8]
    new_params = jax.tree.map(jnp.asarray, new_params)

    obj_dists, obj_preds, att_dists, edge_ctx = ours.apply(
        {"params": new_params}, **args, train=False)
    if mode == "predcls":
        # reference returns the GT one-hot / raw multi-hot
        np.testing.assert_allclose(np.asarray(obj_dists[0]),
                                   want_obj.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(att_dists[0]),
                                   want_att.numpy(), atol=1e-5)
    else:
        np.testing.assert_allclose(np.asarray(obj_dists[0]),
                                   want_obj.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(att_dists[0]),
                                   want_att.numpy(), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(obj_preds[0]),
                                  want_preds.numpy())
    np.testing.assert_allclose(np.asarray(edge_ctx[0]),
                               want_edge.numpy(), atol=2e-4)


def test_motif_predictor_attribute_mode_smoke():
    from veto_tpu.models.relation.legacy.predictors import MotifPredictor

    P = 6
    rng = np.random.RandomState(13)
    model = MotifPredictor(
        num_obj_classes=NO, num_rel_classes=5, embed_dim=EMBED,
        hidden_dim=HIDDEN, pooling_dim=32, in_channels=D, mode="predcls",
        attribute_on=True, num_att_classes=NA, use_vision=True,
        use_bias=False, dtype=jnp.float32,
    )
    boxes = jnp.asarray(
        np.sort(rng.uniform(0, 100, (1, N, 4)), -1), jnp.float32)
    args = dict(
        boxes=boxes,
        box_mask=jnp.ones((1, N), bool),
        obj_labels=jnp.asarray(rng.randint(1, NO, (1, N)), jnp.int32),
        predict_logits=jnp.asarray(rng.randn(1, N, NO), jnp.float32),
        pair_idx=jnp.asarray(rng.randint(0, N, (1, P, 2)), jnp.int32),
        pair_mask=jnp.ones((1, P), bool),
        roi_features=jnp.asarray(rng.randn(1, N, D), jnp.float32),
        union_features=jnp.asarray(rng.randn(1, P, D), jnp.float32),
        image_sizes=jnp.asarray([[128.0, 128.0]], jnp.float32),
        attributes=jnp.zeros((1, N, 10), jnp.int32).at[0, 0, 0].set(3),
    )
    variables = model.init(jax.random.PRNGKey(0), **args, train=False)
    out = model.apply(variables, **args, train=False)
    assert out.rel_dists.shape == (1, P, 5)
    assert out.att_dists.shape == (1, N, NA)
    assert np.isfinite(np.asarray(out.att_dists)).all()
