"""Global debug buffer (utils/global_buffer.py) — re-design of the
reference singleton (pysgg/utils/global_buffer.py:19-63) with collection
moved to the jit boundary."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from veto_tpu.utils import global_buffer

NUM_OBJ, NUM_REL, N = 8, 6, 8


def test_store_and_save(tmp_path):
    global_buffer.reset()
    # disabled → no-op (reference store_data gates on GLOBAL_BUFFER_ON)
    global_buffer.store_data("k", np.arange(4.0))
    assert global_buffer.save_buffer(str(tmp_path)) is None

    global_buffer.enable(True)
    global_buffer.store_data("rel_pn-train_y", jnp.asarray([1.0, 0.0, 1.0]))
    global_buffer.store_data(
        "rel_pn-train_pred", np.asarray([[0.9, 0.1, 0.7]]).T,
        mask=np.asarray([True, True, False]),
    )
    path = global_buffer.save_buffer(str(tmp_path))
    assert path and os.path.exists(path)
    with open(path, "rb") as f:
        data = pickle.load(f)
    assert set(data) == {"rel_pn-train_y", "rel_pn-train_pred"}
    np.testing.assert_allclose(data["rel_pn-train_y"][0].ravel(), [1, 0, 1])
    # masked row dropped
    np.testing.assert_allclose(data["rel_pn-train_pred"][0].ravel(), [0.9, 0.1])
    global_buffer.reset()


def test_train_step_emits_buffer_diagnostics():
    """collect_diagnostics=True surfaces rel-PN relness targets/scores in
    the metrics (reference rel_proposal_network/models.py:346-356)."""
    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import create_train_state, make_train_step
    from veto_tpu.models.sgg import SGGModel
    from veto_tpu.solver.optim import make_optimizer

    model = SGGModel(
        num_obj_classes=NUM_OBJ, num_rel_classes=NUM_REL, mode="predcls",
        predictor="RelatednessTestPredictor", stage_blocks=(1, 1, 1, 1),
        groups=1, width_per_group=16, fpn_channels=32, context_hidden_dim=32,
        context_pooling_dim=64, dtype=jnp.float32,
    )
    ds = SyntheticSGGDataset(
        num_images=2, image_size=(64, 64), num_obj_classes=NUM_OBJ,
        num_rel_classes=NUM_REL, max_objects=4, min_objects=3, seed=3,
    )
    batch, _ = next(ds.batches(batch_size=2, max_boxes=N))
    batch = jax.tree.map(jnp.asarray, batch)
    small = jax.tree.map(lambda x: x[:1], batch)
    scfg = SolverConfig(base_lr=1e-3, ims_per_batch=2, scale_lr_by_batch=False,
                        warmup_iters=0)
    rng = jax.random.PRNGKey(0)
    tx_params = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, jnp.zeros((1, 8, 2), jnp.int32),
        jnp.ones((1, 8), bool), train=False,
    )["params"]
    tx = make_optimizer(scfg, tx_params)
    state = create_train_state(model, tx, rng, small)
    step = jax.jit(make_train_step(model, tx, None, batch_size_per_image=16,
                                   collect_diagnostics=True))
    _, metrics = step(state, batch, jnp.asarray(1.0))
    buf = metrics.pop("buffer")
    assert buf["rel_pn-train_y"].shape == buf["mask"].shape == (2, 16)
    assert buf["rel_pn-train_pred"].shape == (2, 16)
    pred = np.asarray(buf["rel_pn-train_pred"])
    assert ((pred >= 0) & (pred <= 1)).all()
    # host-side feed, as tools/relation_train_net.py does
    global_buffer.reset()
    global_buffer.enable(True)
    bh = jax.device_get(buf)
    global_buffer.store_data("rel_pn-train_y", bh["rel_pn-train_y"],
                             mask=bh["mask"])
    assert global_buffer._buffer().data["rel_pn-train_y"][0].shape[0] == int(
        np.asarray(bh["mask"]).sum())
    global_buffer.reset()
