"""Data-parallel VQ-VAE trainer.

The reference trains with Adam(3e-5, betas (0.5, 0.999)) + MultiStepLR
([100, 200] epochs, gamma 0.1), batch 256, best-validation checkpointing
(codebook/train.py:53-148). Here the train step is one jitted shard_map
program over a 1-D 'data' mesh: per-shard forward/backward, pmean'ed grads
and metrics, and the EMA codebook update psums its batch statistics across
replicas (the collectives the reference stubs out, bottleneck.py:75-77).
"""
from __future__ import annotations

import os

from dataclasses import dataclass, replace
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.config import TrainConfig, VQVAEConfig
from ..models import bottleneck as bn
from ..models.vqvae import VQVAE, eval_pose_error
from ..parallel.mesh import DATA_AXIS, make_mesh


@partial(jax.tree_util.register_dataclass,
         data_fields=["params", "opt_state", "codebook", "step"],
         meta_fields=[])
@dataclass
class TrainState:
    params: dict
    opt_state: tuple
    codebook: bn.CodebookState
    step: jnp.ndarray


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """MultiStepLR at epoch milestones (train.py:85)."""
    boundaries = {int(m) * steps_per_epoch: cfg.gamma
                  for m in cfg.milestones}
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1):
    return optax.adam(make_lr_schedule(cfg, steps_per_epoch),
                      b1=cfg.betas[0], b2=cfg.betas[1])


class VQVAETrainer:
    def __init__(self, model_cfg: VQVAEConfig, train_cfg: TrainConfig,
                 mesh: Optional[Mesh] = None, steps_per_epoch: int = 1):
        self.model = VQVAE(model_cfg)
        self.cfg = train_cfg
        self.mesh = mesh or make_mesh()
        self.tx = make_optimizer(train_cfg, steps_per_epoch)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # -- state --------------------------------------------------------------
    def init_state(self, rng: jax.Array, sample_len: int = 240) -> TrainState:
        params, cb = self.model.init(rng, sample_len=sample_len)
        opt_state = self.tx.init(params)
        return TrainState(params=params, opt_state=opt_state, codebook=cb,
                          step=jnp.zeros((), jnp.int32))

    def init_codebook(self, state: TrainState, batch: np.ndarray,
                      rng: jax.Array) -> TrainState:
        """Data-dependent codebook init from the first batch (init_k,
        bottleneck.py:39-49)."""
        cb = self.model.init_codebook_from_batch(
            state.params, jnp.asarray(batch), rng)
        return replace(state, codebook=cb)

    # -- steps --------------------------------------------------------------
    def _build_train_step(self):
        model, tx, mesh = self.model, self.tx, self.mesh

        def step_fn(state: TrainState, batch, rng):
            def loss_fn(params):
                x_out, loss, metrics, new_cb = model.forward(
                    params, state.codebook, batch, train=True, rng=rng,
                    axis_name=DATA_AXIS)
                return loss, (metrics, new_cb)

            (loss, (metrics, new_cb)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            metrics = {k: jax.lax.pmean(v, DATA_AXIS)
                       for k, v in metrics.items()}
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   codebook=new_cb, step=state.step + 1)
            return new_state, loss, metrics

        sharded = shard_map(
            step_fn, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P()),
            out_specs=(P(), P(), P()),
            check_rep=False)
        return jax.jit(sharded, donate_argnums=(0,))

    def _build_eval_step(self):
        model, mesh = self.model, self.mesh

        def step_fn(state: TrainState, batch):
            x_out, loss, _, _ = model.forward(
                state.params, state.codebook, batch, train=False)
            err = eval_pose_error(batch, x_out,
                                  model.cfg.joint_channel)
            return (jax.lax.pmean(loss, DATA_AXIS),
                    jax.lax.pmean(err, DATA_AXIS))

        sharded = shard_map(step_fn, mesh=mesh,
                            in_specs=(P(), P(DATA_AXIS)),
                            out_specs=(P(), P()), check_rep=False)
        return jax.jit(sharded)

    def train_step(self, state, batch, rng):
        return self._train_step(state, jnp.asarray(batch), rng)

    def eval_step(self, state, batch):
        return self._eval_step(state, jnp.asarray(batch))

    # -- loop ---------------------------------------------------------------
    def fit(self, state: TrainState, train_batches, val_batches=None,
            epochs: Optional[int] = None, rng: Optional[jax.Array] = None,
            log_every: int = 50, checkpoint_dir: Optional[str] = None,
            history_path: Optional[str] = None, start_epoch: int = 1,
            initial_best: Optional[Tuple[float, int]] = None):
        """Simple epoch loop over in-memory batch iterables; mirrors the
        best-validation selection of train.py:94-117.

        history_path: JSONL scalar-history sink (loss + the codebook health
        metrics fit/entropy/usage/dk per logged step, val_err per epoch) —
        the persistent equivalent of the reference's TensorBoard scalars
        (train.py:90-100). Defaults to <checkpoint_dir>/scalars.jsonl when
        checkpointing."""
        import logging

        from ..utils.metrics_log import ScalarHistory
        from .data import device_prefetch
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # when resuming, pass the prior best (val_err, epoch) so the first
        # post-resume validation cannot clobber the true 'best' checkpoint
        best = initial_best if initial_best is not None else (float("inf"), 0)
        epochs = epochs or self.cfg.epochs
        if history_path is None and checkpoint_dir:
            history_path = os.path.join(checkpoint_dir, "scalars.jsonl")
        hist = ScalarHistory(history_path) if history_path else None

        def validate(epoch, state):
            nonlocal best
            errs = [self.eval_step(state, b)[1] for b in val_batches]
            val_err = float(np.mean([np.asarray(e) for e in errs]))
            if val_err < best[0]:
                best = (val_err, epoch)
                if checkpoint_dir:
                    from .checkpoints import save_checkpoint
                    save_checkpoint(checkpoint_dir, state, name="best")
            logging.info("epoch %d val_err %.5f (best %.5f @ %d)",
                         epoch, val_err, best[0], best[1])
            if hist:
                hist.log(epoch=epoch, val_err=val_err, best_val_err=best[0])

        for epoch in range(start_epoch, epochs + 1):
            if val_batches is not None:
                # validate at epoch START, like the reference
                # (train.py:94-99: evaluate_testset precedes the train loop
                # inside each epoch)
                validate(epoch, state)
            for bi, batch in enumerate(device_prefetch(train_batches)):
                rng, sub = jax.random.split(rng)
                state, loss, metrics = self.train_step(state, batch, sub)
                # Only materialize loss on host at log points: float(loss)
                # every step would synchronize host and device, serializing
                # dispatch and defeating device_prefetch's overlap. The
                # divergence guard therefore fires within log_every steps.
                if bi % log_every == 0:
                    loss_v = float(loss)
                    if not np.isfinite(loss_v):
                        # failure detection (absent in the reference,
                        # SURVEY §5): stop on divergence instead of silently
                        # writing NaNs into checkpoints.
                        raise FloatingPointError(
                            f"non-finite loss at epoch {epoch} step {bi}")
                    logging.info("epoch %d step %d loss %.5f", epoch, bi,
                                 loss_v)
                    if hist:
                        hist.log(epoch=epoch, step=bi, loss=loss_v,
                                 **{k: float(np.asarray(v))
                                    for k, v in metrics.items()})
            if checkpoint_dir:
                from .checkpoints import save_checkpoint
                # rolling resume point (exceeds the reference, which saves
                # an epoch counter but never restores it — train.py:114-117)
                save_checkpoint(checkpoint_dir, state, name="latest")
                if epoch % self.cfg.save_per_epochs == 0:
                    save_checkpoint(checkpoint_dir, state,
                                    name=f"{epoch:03d}")
        if val_batches is not None:
            # the reference never evaluates the final epoch's weights (its
            # epoch loop also validates first); do it here so the last
            # training epoch can still win the 'best' checkpoint
            validate(epochs + 1, state)
        if hist:
            hist.close()
        return state, best
