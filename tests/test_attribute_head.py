"""Attribute head: target generation + both loss branches vs the live
reference AttributeHeadLossComputation, and the SGGModel wiring.

The reference binary branch calls ``.cuda()`` on its pos_weight tensor
(loss.py:91), so on CPU the parity for that branch monkeypatches
``torch.FloatTensor`` objects' ``.cuda`` to identity via
torch.Tensor.cuda patching within the test.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import FakeBoxList, load_ref_attribute_loss
from veto_tpu.models.detector.attribute_head import (
    AttributePredictor,
    attribute_loss,
    attribute_targets,
)

A = 13   # toy attribute vocabulary
N = 12


def _toy(seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((N, A)).astype(np.float32)
    attrs = np.zeros((N, 10), np.int64)
    attrs[0, :3] = [2, 5, 9]
    attrs[1, 0] = 7
    attrs[2, :2] = [1, 1]      # duplicate ids collapse in the multi-hot
    attrs[3, :4] = [4, 0, 6, 8]  # break-at-zero: only 4 counts
    return logits, attrs


def test_attribute_targets_parity():
    ref = load_ref_attribute_loss()
    logits, attrs = _toy()
    ev = ref.AttributeHeadLossComputation(
        num_attri_cat=A, max_num_attri=10, attribute_sampling=False,
        use_binary_loss=True)
    ref_t, ref_sel = ev.generate_attributes_target(torch.from_numpy(attrs))
    got = attribute_targets(jnp.asarray(attrs), A)
    np.testing.assert_array_equal(np.asarray(got), ref_t.numpy())


@pytest.mark.parametrize("binary", [True, False])
def test_attribute_loss_parity(monkeypatch, binary):
    ref = load_ref_attribute_loss()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    logits, attrs = _toy(1)
    ev = ref.AttributeHeadLossComputation(
        loss_weight=0.1, num_attri_cat=A, max_num_attri=10,
        attribute_sampling=False,  # deterministic: select everything
        use_binary_loss=binary, pos_weight=5.0)
    proposals = [FakeBoxList(torch.zeros(N, 4), (32, 32),
                             attributes=torch.from_numpy(attrs))]
    ref_loss = ev(proposals, torch.from_numpy(logits))

    got = attribute_loss(
        jax.random.PRNGKey(0), jnp.asarray(logits), jnp.asarray(attrs),
        jnp.ones((N,), bool), loss_weight=0.1, bgfg_sample=False,
        use_binary_loss=binary, pos_weight=5.0)
    np.testing.assert_allclose(float(got.loss), float(ref_loss), rtol=1e-5)
    assert int(got.num_pos) == 4


def test_attribute_loss_sampling_budget():
    logits, attrs = _toy(2)
    out_all = attribute_loss(
        jax.random.PRNGKey(0), jnp.asarray(logits), jnp.asarray(attrs),
        jnp.ones((N,), bool), bgfg_sample=True, bgfg_ratio=1)
    assert np.isfinite(float(out_all.loss))
    # masked-out boxes contribute nothing
    valid = jnp.zeros((N,), bool)
    out_none = attribute_loss(
        jax.random.PRNGKey(0), jnp.asarray(logits), jnp.asarray(attrs),
        valid, bgfg_sample=True)
    assert int(out_none.num_pos) == 0


def test_sggmodel_attribute_forward():
    from veto_tpu.models.sgg import SGGModel

    model = SGGModel(mode="predcls", attribute_on=True, num_attributes=A,
                     stage_blocks=(1, 1, 1, 1), groups=1, width_per_group=4,
                     dtype=jnp.float32)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    boxes = jnp.asarray([[[4.0, 4.0, 30.0, 30.0]] * 4], jnp.float32)

    def full(m, im, bx):
        return m.attribute_forward(m.extract_features(im), bx)

    variables = model.init(jax.random.PRNGKey(0), images, boxes, method=full)
    out = model.apply(variables, images, boxes, method=full)
    assert out.shape == (1, 4, A)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_attribute_train_step_end_to_end():
    """ATTRIBUTE_ON predcls train step: batch carries attributes, the step
    reports an attribute_loss that responds to the attribute head params."""
    import jax.numpy as jnp
    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import create_train_state, make_train_step
    from veto_tpu.models.sgg import SGGModel
    from veto_tpu.solver.optim import make_optimizer

    model = SGGModel(
        mode="predcls", attribute_on=True, num_attributes=A,
        stage_blocks=(1, 1, 1, 1), groups=1, width_per_group=4,
        fpn_channels=32, veto_dim=36, veto_layers=1, veto_heads=2,
        dtype=jnp.float32,
    )
    ds = SyntheticSGGDataset(num_images=2, image_size=(64, 64),
                             max_objects=5, min_objects=3,
                             max_relations=4, seed=0)
    batch, _ = next(iter(ds.batches(2, max_boxes=6)))
    # plant attributes on the first boxes
    attrs = np.asarray(batch.attributes).copy()
    attrs[:, 0, 0] = 2
    batch = batch.replace(attributes=jnp.asarray(attrs))

    import jax as _jax
    rng = _jax.random.PRNGKey(0)
    small = _jax.tree.map(lambda x: x[:1], batch)
    variables = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits,
        jnp.zeros((1, 4, 2), jnp.int32), jnp.ones((1, 4), bool),
    )
    tx = make_optimizer(SolverConfig(), variables["params"],
                        frozen_prefixes=())
    state = create_train_state(model, tx, rng, batch, variables=variables)
    step = make_train_step(model, tx, None, batch_size_per_image=8,
                           attribute_cfg=dict(pos_weight=5.0))
    new_state, metrics = jax.jit(step)(state, batch, jnp.asarray(1.0))
    assert "attribute_loss" in metrics
    assert np.isfinite(float(metrics["attribute_loss"]))
    assert float(metrics["attribute_loss"]) > 0
