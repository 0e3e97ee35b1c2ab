"""Loss-variant wiring: LDAM / label-smoothing / balanced-norm.

Parity: BalancedNorm1d is loaded from the reference (layers/balanced_norm.py)
and compared against balanced_norm_probs; LDAM against a CPU transcription
of LDAMLoss.forward (loss.py:311-333 — the class itself hard-codes
torch.cuda.FloatTensor).  Each variant is also driven through a real
sharded train step.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ref_loader import reference_available


def load_ref_balanced_norm():
    mod = types.ModuleType("pysgg.modeling.utils")
    mod.cat = lambda ts, dim=0: ts[0] if len(ts) == 1 else torch.cat(ts, dim)
    sys.modules.setdefault("pysgg", types.ModuleType("pysgg"))
    sys.modules.setdefault("pysgg.modeling", types.ModuleType("pysgg.modeling"))
    sys.modules["pysgg.modeling.utils"] = mod
    spec = importlib.util.spec_from_file_location(
        "ref_balanced_norm", "/root/reference/pysgg/layers/balanced_norm.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.skipif(not reference_available(), reason="reference absent")
def test_balanced_norm_parity_with_reference():
    from veto_tpu.ops.losses import balanced_norm_probs

    ref_mod = load_ref_balanced_norm()
    C, N = 9, 40
    ref = ref_mod.BalancedNorm1d(C, normalized_probs=False, with_gradient=False)
    ref.train()

    rng = np.random.RandomState(0)
    running = np.full(C, 0.03, np.float32)
    running[0] = 1.0
    ours_running = jnp.asarray(running)

    for step in range(3):
        logits = rng.randn(N, C).astype(np.float32) * 2
        labels = rng.randint(0, C, N)
        labels[: N // 3] = 0  # plenty of bg
        with torch.no_grad():
            want_norm, want_prob, _ = ref(
                torch.from_numpy(logits), torch.from_numpy(labels))
        got_norm, ours_running = balanced_norm_probs(
            jnp.asarray(logits), jnp.asarray(labels),
            jnp.ones(N, bool), ours_running, train=True,
        )
        np.testing.assert_allclose(
            np.asarray(ours_running), want_prob.numpy(), atol=1e-5,
            err_msg=f"running prob step {step}")
        np.testing.assert_allclose(
            np.asarray(got_norm), want_norm.numpy(), atol=1e-4)


def test_ldam_loss_matches_torch_transcription():
    from veto_tpu.ops.losses import ldam_loss, ldam_margins

    C, N = 11, 30
    rng = np.random.RandomState(1)
    counts = rng.randint(10, 10000, C).astype(np.float64)
    m_list = ldam_margins(counts, max_m=0.5)
    # reference expression (loss.py:315-316)
    want_m = 1.0 / np.sqrt(np.sqrt(counts))
    want_m = want_m * (0.5 / np.max(want_m))
    np.testing.assert_allclose(m_list, want_m, rtol=1e-6)

    logits = rng.randn(N, C).astype(np.float32)
    labels = rng.randint(0, C, N)
    weights = rng.rand(C).astype(np.float32) + 0.5

    # CPU transcription of LDAMLoss.forward (loss.py:323-333)
    x = torch.from_numpy(logits)
    target = torch.from_numpy(labels)
    index = torch.zeros_like(x, dtype=torch.bool)
    index.scatter_(1, target.view(-1, 1), 1)
    batch_m = torch.from_numpy(m_list)[None, :] @ index.float().T
    x_m = x - batch_m.view(-1, 1)
    output = torch.where(index, x_m, x)
    want = F.cross_entropy(30.0 * output, target,
                           weight=torch.from_numpy(weights))

    got = ldam_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.ones(N, bool),
        jnp.asarray(m_list), s=30.0, class_weights=jnp.asarray(weights),
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    # masked entries must not contribute
    mask = np.ones(N, bool)
    mask[-5:] = False
    got_masked = ldam_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask),
        jnp.asarray(m_list), s=30.0, class_weights=jnp.asarray(weights),
    )
    want_masked = F.cross_entropy(
        30.0 * output[:-5], target[:-5], weight=torch.from_numpy(weights))
    np.testing.assert_allclose(float(got_masked), float(want_masked), rtol=1e-5)


@pytest.mark.parametrize("variant", ["label_smoothing", "ldam", "balanced_norm"])
def test_train_step_with_loss_variant(variant):
    """Each config knob drives a full sharded train step (VERDICT item 6)."""
    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import (
        batch_sharding, create_train_state, make_mesh, make_train_step,
        shard_train_step,
    )
    from veto_tpu.models.sgg import SGGModel
    from veto_tpu.ops.losses import ldam_margins
    from veto_tpu.solver.optim import make_optimizer

    NUM_OBJ, NUM_REL, MAX_BOXES = 13, 9, 8
    model = SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, mode="predcls",
        stage_blocks=(1, 1, 1, 1), groups=1, width_per_group=16,
        fpn_channels=32, veto_dim=96, veto_layers=1, veto_heads=6,
        veto_depth_proj_dim=64, veto_visual_proj_dim=32, embed_dim=32,
        dtype=jnp.float32,
    )
    ds = SyntheticSGGDataset(
        num_images=4, image_size=(64, 64), num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=MAX_BOXES - 2, min_objects=3,
        max_relations=4, seed=3,
    )
    batch, _ = next(ds.batches(batch_size=4, max_boxes=MAX_BOXES))
    batch = jax.tree.map(jnp.asarray, batch)
    cfg = SolverConfig(base_lr=1e-3, ims_per_batch=4, scale_lr_by_batch=False,
                       warmup_iters=0)
    rng = jax.random.PRNGKey(0)
    pair_idx = jnp.zeros((4, 8, 2), jnp.int32)
    variables = model.init(
        rng, batch.images, batch.depth, batch.boxes, batch.box_mask,
        batch.labels, batch.obj_logits, pair_idx, jnp.ones((4, 8), bool),
        train=False,
    )
    tx = make_optimizer(cfg, variables["params"])
    state = create_train_state(model, tx, rng, jax.tree.map(lambda x: x[:1], batch))

    kwargs = dict(loss_variant=variant)
    if variant == "ldam":
        counts = np.linspace(5000, 10, NUM_REL)
        kwargs["ldam_margins"] = ldam_margins(counts)
    if variant == "balanced_norm":
        lp = np.full(NUM_REL, 0.03, np.float32)
        lp[0] = 1.0
        state = state.replace(loss_state=jnp.asarray(lp))

    mesh = make_mesh(data=4, pair=2)
    step = shard_train_step(
        make_train_step(model, tx, None, batch_size_per_image=16,
                        positive_fraction=0.5, mesh=mesh, **kwargs),
        mesh,
    )
    batch_sh = jax.device_put(batch, batch_sharding(mesh))
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch_sh, jnp.asarray(1.0, jnp.float32))
        losses.append(float(metrics["rel_loss"]))
    assert all(np.isfinite(losses)), losses
    if variant == "balanced_norm":
        lp_after = np.asarray(state.loss_state)
        assert lp_after[0] == 1.0
        assert not np.allclose(lp_after[1:], 0.03)  # EMA actually moved
