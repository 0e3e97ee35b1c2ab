"""Preemption-aware save (SURVEY §5): the SIGTERM guard and its loop wiring."""

import os
import signal

import numpy as np
import pytest

from veto_tpu.utils.preemption import PreemptionGuard


def test_guard_catches_sigterm_and_restores():
    guard = PreemptionGuard().install()
    assert not guard.requested
    os.kill(os.getpid(), signal.SIGTERM)
    assert guard.requested
    guard.restore()
    # after restore the old disposition is back (default would kill us, so
    # install a sentinel first and check the chain)
    seen = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
    try:
        g2 = PreemptionGuard().install()
        g2.restore()
        os.kill(os.getpid(), signal.SIGTERM)
        assert seen == [signal.SIGTERM]
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_guard_multiple_signals():
    guard = PreemptionGuard(signals=(signal.SIGTERM, signal.SIGUSR1)).install()
    os.kill(os.getpid(), signal.SIGUSR1)
    assert guard.requested
    guard.restore()


@pytest.mark.slow
def test_train_loop_checkpoints_on_preemption(tmp_path, monkeypatch):
    """relation_train_net.train exits after the in-flight step and leaves a
    resumable checkpoint when the guard reports a preemption."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import relation_train_net as rtn

    from veto_tpu.config import load_config
    from veto_tpu.utils import preemption as pre
    from veto_tpu.utils.logger import setup_logger

    class _FakeGuard(pre.PreemptionGuard):
        def install(self):
            # simulate the SIGTERM arriving during the first step
            self._requested = True
            return self

    monkeypatch.setattr(pre, "PreemptionGuard", _FakeGuard)

    cfg = load_config(None, [
        f"output_dir={tmp_path}", "solver.max_iter=50",
        "solver.checkpoint_period=1000", "solver.val_period=1000",
        "solver.ims_per_batch=1", "data.max_boxes=6",
        "model.stage_blocks=(1,1,1,1)", "model.resnet_groups=1",
        "model.resnet_width_per_group=4", "model.fpn_channels=16",
        "model.fold_bn=false", "model.num_obj_classes=7",
        "relation.num_classes=6", "relation.batch_size_per_image=8",
        "veto.t_input_dim=36", "veto.enc_layers=1", "veto.nheads=2",
        "model.box_mlp_head_dim=64",
    ])
    logger = setup_logger("veto_tpu.test_preempt", str(tmp_path), rank=0)
    rtn.train(cfg, logger)

    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    assert os.path.isdir(ckpt_dir)
    from veto_tpu.utils.checkpoint import CheckpointManager

    # the loop must have stopped at iteration 1 (not 50) with a checkpoint
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 1
