"""Optimizer + LR scheduling.

Re-design of the reference solver (pysgg/solver/build.py:7-45,
lr_scheduler.py:11-130) on optax:

  * Adam with per-group LRs: base LR is scaled by ``ims_per_batch``
    (rl_factor, solver/build.py:30-33), biases get ``bias_lr_factor`` and
    ``weight_decay_bias``.
  * warmup + ReduceLROnPlateau (lr_scheduler.py:56-130): linear warmup for
    ``warmup_iters``, then decay by ``gamma`` each time the validation
    metric (val mR@100) fails to improve for ``patience`` epochs, with
    cooldown; training stops after ``max_decay_step`` decays
    (relation_train_net.py:559-563).

The plateau decision is inherently host-side (it consumes a validation
scalar every VAL_PERIOD), so the design splits cleanly:
  * device: optax chain with an injected multiplicative ``lr_scale``
    hyperparameter (optax.inject_hyperparams) — jit-stable, no recompiles.
  * host: ``LRController`` mirrors the reference scheduler state machine and
    emits the current scale.

The detector is frozen by masking: parameters under 'backbone' get zero
updates (optax.set_to_zero), exactly mirroring eval_modules vs train_modules
(relation_train_net.py:161-170).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
import optax

from veto_tpu.config.defaults import SolverConfig


def _label_params(params: Any, frozen_prefixes: tuple) -> Any:
    """Map each param leaf to 'frozen' | 'bias' | 'weight' by path."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_one(path):
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if keys and any(str(keys[0]).startswith(p) for p in frozen_prefixes):
            return "frozen"
        last = str(keys[-1]) if keys else ""
        if last in ("bias",):
            return "bias"
        return "weight"

    labels = [label_one(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels)


def make_optimizer(
    cfg: SolverConfig,
    params: Any,
    frozen_prefixes: tuple = ("backbone",),
) -> optax.GradientTransformation:
    """Build the training optimizer.

    Returns an optax transformation whose hyperparameter ``lr_scale`` (in
    ``opt_state.hyperparams``) is the warmup/plateau multiplier driven by
    :class:`LRController`.
    """
    rl_factor = float(cfg.ims_per_batch) if cfg.scale_lr_by_batch else 1.0
    base_lr = cfg.base_lr * rl_factor
    bias_lr = cfg.base_lr * cfg.bias_lr_factor * rl_factor

    def adam_group(lr: float, wd: float) -> optax.GradientTransformation:
        if cfg.optimizer == "sgd":
            # detector pretraining uses SGD+momentum (reference
            # detector_pretrain_net.py / solver defaults)
            return optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.trace(decay=cfg.momentum),
                optax.scale(-lr),
            )
        return optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_adam(),
            optax.scale(-lr),
        )

    @optax.inject_hyperparams
    def tx(lr_scale: jnp.ndarray) -> optax.GradientTransformation:
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.multi_transform(
                {
                    "frozen": optax.set_to_zero(),
                    "bias": adam_group(bias_lr, cfg.weight_decay_bias),
                    "weight": adam_group(base_lr, cfg.weight_decay),
                },
                _label_params(params, frozen_prefixes),
            ),
            optax.scale(lr_scale),
        )

    return tx(lr_scale=jnp.asarray(1.0, jnp.float32))


class LRController:
    """Host-side warmup + plateau state machine → lr multiplier.

    Exact state-machine port of WarmupReduceLROnPlateau
    (lr_scheduler.py:56-171): linear warmup from ``warmup_factor`` to 1 over
    ``warmup_iters``; on each validation report, decay by ``gamma``
    (``plateau_factor``) once the metric hasn't beaten ``best + threshold``
    for ``patience`` consecutive reports, then ``cooldown`` reports of grace
    (during which the bad-epoch counter is pinned to zero).  ``should_stop``
    after ``max_decay_step`` decays (relation_train_net.py:559-563).

    Reference quirks reproduced exactly (verified step-for-step against the
    live torch scheduler in tests/test_solver_parity.py):

    * the torch constructor calls ``self.step(last_epoch)`` with
      ``last_epoch == 0``, so the plateau logic runs once with *metric 0.0*
      before training: ``best`` starts at 0.0 (not −1e12) and one cooldown
      tick is consumed (lr_scheduler.py:106, 146-171);
    * the cooldown counter decrements on EVERY validation report — improving
      or not — and zeroes the bad-epoch counter while active;
    * decay triggers at ``num_bad_epochs >= patience`` (the reference
      increments first, then compares with ``>=``).
    """

    def __init__(self, cfg: SolverConfig):
        self.cfg = cfg
        self.best: float = -1e12
        self.bad_epochs = 0
        self.cooldown_counter = cfg.plateau_cooldown
        self.num_decays = 0
        # constructor quirk: the reference scheduler runs one plateau step
        # with metrics = last_epoch = 0 at construction (lr_scheduler.py:106)
        self.report_validation(0.0)

    @property
    def decay_scale(self) -> float:
        return self.cfg.plateau_factor ** self.num_decays

    def scale(self, step: int) -> float:
        """LR multiplier for 0-based train step ``step``.

        Mapping to the reference: its loop calls ``scheduler.step(...,
        epoch=iteration)`` AFTER optimizer.step() (relation_train_net.py:560),
        so 1-based iteration ``i`` trains at ``get_lr(last_epoch=i-1)`` —
        except iteration 1, which uses the constructor-set LR at
        ``last_epoch=1``.  With our 0-based ``step = i - 1`` that is
        ``warmup(max(step, 1))``.
        """
        e = max(step, 1)
        if e < self.cfg.warmup_iters and self.cfg.warmup_method == "linear":
            alpha = e / max(self.cfg.warmup_iters, 1)
            warm = self.cfg.warmup_factor * (1 - alpha) + alpha
        elif e < self.cfg.warmup_iters and self.cfg.warmup_method == "constant":
            warm = self.cfg.warmup_factor
        else:
            warm = 1.0
        return warm * self.decay_scale

    def report_validation(self, metric: float) -> None:
        # lr_scheduler.py:146-171 — order matters: improvement check, then
        # cooldown (which also zeroes the bad counter), then the decay test
        if float(metric) > self.best + self.cfg.plateau_threshold:
            self.best = float(metric)
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.bad_epochs = 0
        if self.bad_epochs >= self.cfg.plateau_patience:
            self.num_decays += 1
            self.cooldown_counter = self.cfg.plateau_cooldown
            self.bad_epochs = 0

    @property
    def should_stop(self) -> bool:
        return self.num_decays >= self.cfg.max_decay_step


def multistep_scale(cfg: SolverConfig) -> Callable[[int], float]:
    """WarmupMultiStepLR alternative (lr_scheduler.py:11-54) as a pure fn."""

    def scale(step: int) -> float:
        if step < cfg.warmup_iters and cfg.warmup_method == "linear":
            alpha = step / max(cfg.warmup_iters, 1)
            warm = cfg.warmup_factor * (1 - alpha) + alpha
        else:
            warm = 1.0
        return warm * cfg.gamma ** sum(step >= s for s in cfg.steps)

    return scale
