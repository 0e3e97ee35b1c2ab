"""Optimizer + LR-schedule training-dynamics parity vs the live reference.

Three layers (VERDICT r3 directive #3):

* plateau scheduler: the live ``WarmupReduceLROnPlateau``
  (pysgg/solver/lr_scheduler.py:56-171) driven through the exact
  relation_train_net.py:547-565 calling pattern vs our host-side
  ``LRController`` — LR must match at EVERY iteration, including warmup,
  cooldown, the constructor-quirk initial state, and the
  MAX_DECAY_STEP stop.
* multistep scheduler: live ``WarmupMultiStepLR`` (lr_scheduler.py:11-54)
  vs ``multistep_scale``.
* Adam trajectory: the live ``build.make_optimizer`` (per-group LRs with
  rl_factor/bias factor/per-group weight decay, solver/build.py:7-34) +
  reference grad clip (utils/checkpoint.py:180-206) + the plateau scheduler,
  stepped N times on identical weights and synthetic grads vs our optax
  chain + LRController — parameter trajectories must match to float32
  tolerance.
"""

import numpy as np
import pytest

from ref_loader import load_ref_solver, ref_clip_grad_norm_, reference_available

from veto_tpu.config.defaults import SolverConfig
from veto_tpu.solver.optim import LRController, make_optimizer, multistep_scale

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not mounted"
)

torch = pytest.importorskip("torch")


def _dummy_torch_optimizer(base_lrs):
    params = [torch.nn.Parameter(torch.zeros(1)) for _ in base_lrs]
    return torch.optim.SGD(
        [{"params": [p], "lr": lr} for p, lr in zip(params, base_lrs)], lr=0.1
    )


def _val_series(n, seed=0):
    """A validation-metric series with plateaus: rises, stalls, rises, stalls."""
    rng = np.random.RandomState(seed)
    out, v = [], 0.05
    for i in range(n):
        if (i // 4) % 2 == 0:
            v += 0.03 + 0.01 * rng.rand()
        else:
            v += 1e-6  # below threshold: a plateau
        out.append(v)
    return out


@pytest.mark.parametrize("cooldown,patience", [(1, 2), (0, 1), (2, 3)])
def test_plateau_scheduler_parity(cooldown, patience):
    _, lrs = load_ref_solver()
    cfg = SolverConfig(
        base_lr=0.01, scale_lr_by_batch=False, warmup_factor=1.0 / 3,
        warmup_iters=8, plateau_factor=0.5, plateau_patience=patience,
        plateau_threshold=1e-4, plateau_cooldown=cooldown, max_decay_step=3,
    )
    opt = _dummy_torch_optimizer([cfg.base_lr])
    sched = lrs.WarmupReduceLROnPlateau(
        opt, gamma=cfg.plateau_factor, warmup_factor=cfg.warmup_factor,
        warmup_iters=cfg.warmup_iters, warmup_method="linear",
        patience=cfg.plateau_patience, threshold=cfg.plateau_threshold,
        cooldown=cfg.plateau_cooldown,
    )
    ctrl = LRController(cfg)

    vals = _val_series(40)
    val_period = 3
    vi = 0
    for iteration in range(1, 120):  # 1-based, as in the reference loop
        # LR in effect during this iteration's optimizer.step()
        ref_lr = opt.param_groups[0]["lr"]
        ours = cfg.base_lr * ctrl.scale(iteration - 1)
        assert ref_lr == pytest.approx(ours, rel=1e-12), (
            iteration, ref_lr, ours, sched.stage_count, ctrl.num_decays)

        # end-of-iteration schedule update (relation_train_net.py:547-565)
        metric = None
        if iteration % val_period == 0 and vi < len(vals):
            metric = vals[vi]
            vi += 1
        sched.step(metric, epoch=iteration)
        if metric is not None:
            ctrl.report_validation(metric)
        assert sched.stage_count == ctrl.num_decays, iteration
        ref_stop = sched.stage_count >= cfg.max_decay_step
        assert ref_stop == ctrl.should_stop, iteration
        if ref_stop:
            break
    assert ctrl.num_decays > 0, "series never triggered a decay — weak test"


def test_plateau_constructor_quirk():
    """The torch constructor self.step(0) seeds best=0.0 and burns one
    cooldown tick (lr_scheduler.py:106) — a first validation BELOW
    0 + threshold must already count as a bad epoch in both."""
    _, lrs = load_ref_solver()
    cfg = SolverConfig(base_lr=0.01, scale_lr_by_batch=False, warmup_iters=0,
                       plateau_factor=0.5, plateau_patience=1,
                       plateau_threshold=1e-4, plateau_cooldown=0)
    opt = _dummy_torch_optimizer([cfg.base_lr])
    sched = lrs.WarmupReduceLROnPlateau(
        opt, gamma=0.5, warmup_iters=0, patience=1, threshold=1e-4, cooldown=0)
    ctrl = LRController(cfg)
    assert sched.best == 0.0 and ctrl.best == 0.0
    # metric 0.0 does not beat best(0.0)+threshold → bad epoch → decay at
    # patience=1 in BOTH
    sched.step(0.0, epoch=1)
    ctrl.report_validation(0.0)
    assert sched.stage_count == 1 == ctrl.num_decays


def test_multistep_scheduler_parity():
    _, lrs = load_ref_solver()
    cfg = SolverConfig(
        base_lr=0.02, scale_lr_by_batch=False, warmup_factor=1.0 / 3,
        warmup_iters=10, steps=(30, 60), gamma=0.1,
    )
    opt = _dummy_torch_optimizer([cfg.base_lr])
    sched = lrs.WarmupMultiStepLR(
        opt, cfg.steps, cfg.gamma, warmup_factor=cfg.warmup_factor,
        warmup_iters=cfg.warmup_iters, warmup_method="linear",
    )
    scale = multistep_scale(cfg)
    for iteration in range(90):
        ref_lr = opt.param_groups[0]["lr"]
        # torch _LRScheduler's constructor pre-advances to last_epoch=0 and
        # the loop steps after the optimizer, so iteration i runs at
        # get_lr(last_epoch=i) here (detector_pretrain_net.py:139-210)
        assert ref_lr == pytest.approx(cfg.base_lr * scale(iteration), rel=1e-12)
        sched.step()


class _TinyTorchNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.proj = torch.nn.Linear(6, 8)
        self.out = torch.nn.Linear(8, 3)
        self.gate_bias = torch.nn.Parameter(torch.zeros(3))  # bare 'bias' name


def _flat_names(model):
    return [n for n, _ in model.named_parameters()]


def test_adam_trajectory_parity():
    """N steps of live torch Adam (per-group lr/wd, rl_factor, clip-5.0,
    warmup+plateau LR) vs the optax chain + LRController on identical
    weights and grads — final params must match to float32 tolerance."""
    build, lrs = load_ref_solver()
    from ref_loader import make_cfg

    ims_per_batch = 4
    cfg = SolverConfig(
        base_lr=1e-3, bias_lr_factor=2.0, weight_decay=1e-4,
        weight_decay_bias=0.0, grad_clip_norm=5.0, ims_per_batch=ims_per_batch,
        scale_lr_by_batch=True, warmup_factor=1.0 / 3, warmup_iters=6,
        plateau_factor=0.5, plateau_patience=1, plateau_threshold=1e-4,
        plateau_cooldown=1, max_decay_step=5,
    )

    torch.manual_seed(0)
    net = _TinyTorchNet()
    ref_cfg = make_cfg(
        SOLVER__BASE_LR=cfg.base_lr,
        SOLVER__WEIGHT_DECAY=cfg.weight_decay,
        SOLVER__BIAS_LR_FACTOR=cfg.bias_lr_factor,
        SOLVER__WEIGHT_DECAY_BIAS=cfg.weight_decay_bias,
    )

    class _Logger:
        def info(self, *a, **k):
            pass

    opt = build.make_optimizer(ref_cfg, net, _Logger(),
                               rl_factor=float(ims_per_batch))
    sched = lrs.WarmupReduceLROnPlateau(
        opt, gamma=cfg.plateau_factor, warmup_factor=cfg.warmup_factor,
        warmup_iters=cfg.warmup_iters, warmup_method="linear",
        patience=cfg.plateau_patience, threshold=cfg.plateau_threshold,
        cooldown=cfg.plateau_cooldown,
    )

    # mirror the torch params as a flax-style tree; _label_params keys off a
    # leaf name of 'bias' exactly as the reference keys off 'bias' in the
    # parameter name (solver/build.py:16-18)
    import jax.numpy as jnp

    names = _flat_names(net)
    t_params = dict(net.named_parameters())
    params = {}
    for n in names:
        path = n.split(".")
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        leaf = "bias" if n.endswith("bias") else path[-1]
        # .copy(): on CPU jax, jnp.asarray can zero-copy-alias the numpy
        # buffer, which SHARES memory with the live torch parameter — the
        # torch opt.step() below would then mutate our params in place
        node[leaf] = jnp.asarray(t_params[n].detach().numpy().copy())
    # gate_bias is a bare Parameter named '...bias' in torch; our tree named
    # its leaf 'bias' above so both sides put it in the bias group
    tx = make_optimizer(cfg, params, frozen_prefixes=())
    opt_state = tx.init(params)
    ctrl = LRController(cfg)

    rng = np.random.RandomState(1)
    val_period, vals, vi = 5, _val_series(12, seed=3), 0
    n_steps = 40
    for iteration in range(1, n_steps + 1):
        grads_np = {n: rng.randn(*t_params[n].shape).astype(np.float32) * 0.5
                    for n in names}
        # --- torch side
        for n, p in net.named_parameters():
            p.grad = torch.from_numpy(grads_np[n].copy())
        ref_clip_grad_norm_(list(net.named_parameters()), cfg.grad_clip_norm)
        opt.step()
        metric = None
        if iteration % val_period == 0 and vi < len(vals):
            metric = vals[vi]
            vi += 1
        sched.step(metric, epoch=iteration)

        # --- optax side
        g = {}
        for n in names:
            path = n.split(".")
            node = g
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node["bias" if n.endswith("bias") else path[-1]] = jnp.asarray(
                grads_np[n])
        opt_state.hyperparams["lr_scale"] = jnp.asarray(
            ctrl.scale(iteration - 1), jnp.float32)
        import optax

        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        if metric is not None:
            ctrl.report_validation(metric)

    assert sched.stage_count == ctrl.num_decays
    assert ctrl.num_decays > 0, "no decay triggered — schedule untested"
    for n in names:
        path = n.split(".")
        node = params
        for p in path[:-1]:
            node = node[p]
        ours = np.asarray(node["bias" if n.endswith("bias") else path[-1]])
        ref = t_params[n].detach().numpy()
        np.testing.assert_allclose(ours, ref, rtol=5e-5, atol=1e-5,
                                   err_msg=f"param {n} diverged")
