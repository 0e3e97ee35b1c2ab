"""Standalone detector evaluation (reference tools/detector_pretest_net.py).

Loads the latest (or a given) detector checkpoint and runs COCO-protocol
bbox mAP on the chosen split — the evaluation half of
detector_pretrain_net.py without any training.

Usage:
  python tools/detector_pretest_net.py --config cfg.yaml \
      [--split val|test] [output_dir=...] [opts...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser(
        description="VETO-TPU detector evaluation")
    parser.add_argument("--config", default=None)
    parser.add_argument("--split", default="val", choices=["val", "test"])
    parser.add_argument("--checkpoint", default=None,
                        help="checkpoint step to load (default: latest)")
    parser.add_argument("--debug-nans", action="store_true")
    parser.add_argument("opts", nargs="*", default=[])
    args = parser.parse_args()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from veto_tpu.config import load_config
    from veto_tpu.utils.logger import setup_logger

    cfg = load_config(args.config, args.opts)
    os.makedirs(cfg.output_dir, exist_ok=True)
    logger = setup_logger("veto_tpu.detector_eval", cfg.output_dir,
                          rank=jax.process_index())

    from detector_pretrain_net import run_detection_eval
    from relation_train_net import batches_for, build_dataset, build_model

    from veto_tpu.config.defaults import SolverConfig
    from veto_tpu.engine.train import TrainState
    from veto_tpu.solver.optim import make_optimizer
    from veto_tpu.utils.checkpoint import CheckpointManager

    model = build_model(cfg)
    gen = batches_for(cfg, build_dataset(cfg, args.split), args.split)

    rng = jax.random.PRNGKey(cfg.solver.seed)
    first_batch, _ = next(iter(gen(max_iter=0)))
    small = jax.tree.map(lambda x: jnp.asarray(x[:1]), first_batch)
    pi = jnp.zeros((1, 8, 2), jnp.int32)
    variables = model.init(
        rng, small.images, small.depth, small.boxes, small.box_mask,
        small.labels, small.obj_logits, pi, jnp.ones((1, 8), bool),
        method="init_all",
    )
    tx = make_optimizer(SolverConfig(), variables["params"])
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), rng=rng,
    )
    ckpt = CheckpointManager(os.path.join(cfg.output_dir, "ckpt"))
    step = int(args.checkpoint) if args.checkpoint else None
    state, _ = ckpt.restore(state, step=step)
    if int(state.step) == 0:
        logger.warning("no checkpoint found — evaluating random weights")
    else:
        logger.info(f"evaluating checkpoint at iteration {int(state.step)}")

    agg = run_detection_eval(cfg, model, state, gen, logger)
    import json

    with open(os.path.join(cfg.output_dir,
                           f"bbox_eval_{args.split}.json"), "w") as f:
        json.dump(agg, f, indent=1)
    logger.info(f"wrote bbox_eval_{args.split}.json")


if __name__ == "__main__":
    main()
