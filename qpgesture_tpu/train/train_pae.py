"""PAE trainer: AdamW + cosine warm restarts on velocity windows.

Mirrors the reference envelope (codebook/PAE.py:273-474): AdamW(1e-4, weight
decay 1e-4), CyclicLRWithRestarts(cosine, restart_period=10 epochs, t_mult=2),
MSE x 300 on frame-difference velocity windows, best-validation
checkpointing. Data-parallel over the 'data' mesh axis like the VQ-VAE
trainer; BatchNorm statistics are synchronized by pmean inside the step.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.config import PAEConfig
from ..models.pae import PAE, velocity_input
from ..parallel.mesh import DATA_AXIS, make_mesh


def cyclic_cosine_restarts(base_lr: float, steps_per_epoch: int,
                           restart_period: int = 10, t_mult: float = 2.0,
                           n_cycles: int = 8):
    """optax schedule reproducing CyclicLRWithRestarts(policy='cosine'):
    lr = base * 0.5 * (1 + cos(pi * t)) within each period, periods growing
    by t_mult (Library/AdamWR/cyclic_scheduler.py:48)."""
    boundaries = []
    schedules = []
    period = restart_period * steps_per_epoch
    for _ in range(n_cycles):
        schedules.append(optax.cosine_decay_schedule(base_lr, max(period, 1)))
        boundaries.append(period)
        period = int(period * t_mult)
    bounds = np.cumsum(boundaries)[:-1].tolist()
    return optax.join_schedules(schedules, bounds)


@partial(jax.tree_util.register_dataclass,
         data_fields=["params", "batch_stats", "opt_state", "step"],
         meta_fields=[])
@dataclass
class PAETrainState:
    params: dict
    batch_stats: dict
    opt_state: tuple
    step: jnp.ndarray


class PAETrainer:
    def __init__(self, cfg: PAEConfig, mesh: Optional[Mesh] = None,
                 steps_per_epoch: int = 1):
        self.cfg = cfg
        self.model = PAE(cfg)
        self.mesh = mesh or make_mesh()
        schedule = cyclic_cosine_restarts(cfg.learning_rate, steps_per_epoch,
                                          cfg.restart_period,
                                          cfg.restart_mult)
        self.tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def init_state(self, rng: jax.Array) -> PAETrainState:
        x = jnp.zeros((1, self.cfg.input_channels * self.cfg.frames))
        variables = self.model.init(rng, x, train=True)
        return PAETrainState(params=variables["params"],
                             batch_stats=variables["batch_stats"],
                             opt_state=self.tx.init(variables["params"]),
                             step=jnp.zeros((), jnp.int32))

    def _build_train_step(self):
        model, tx, cfg = self.model, self.tx, self.cfg

        def step_fn(state: PAETrainState, pose_windows):
            x = velocity_input(pose_windows)

            def loss_fn(params):
                (y, *_), updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, train=True, mutable=["batch_stats"])
                loss = cfg.loss_weight * jnp.mean((y - x) ** 2)
                return loss, updates["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return PAETrainState(params=params, batch_stats=new_stats,
                                 opt_state=opt_state,
                                 step=state.step + 1), loss

        return jax.jit(shard_map(step_fn, mesh=self.mesh,
                                 in_specs=(P(), P(DATA_AXIS)),
                                 out_specs=(P(), P()), check_rep=False),
                       donate_argnums=(0,))

    def _build_eval_step(self):
        model, cfg = self.model, self.cfg

        def step_fn(state: PAETrainState, pose_windows):
            x = velocity_input(pose_windows)
            y, *_ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x, train=False)
            return jax.lax.pmean(cfg.loss_weight * jnp.mean((y - x) ** 2),
                                 DATA_AXIS)

        return jax.jit(shard_map(step_fn, mesh=self.mesh,
                                 in_specs=(P(), P(DATA_AXIS)),
                                 out_specs=P(), check_rep=False))

    def train_step(self, state, pose_windows):
        return self._train_step(state, jnp.asarray(pose_windows))

    def eval_step(self, state, pose_windows):
        return self._eval_step(state, jnp.asarray(pose_windows))
