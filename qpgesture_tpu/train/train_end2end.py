"""End-to-end GRU baseline trainer: Adam + CE on codes.

Mirrors codebook/end2end.py:46-137: Adam(2e-4, betas (0.99, 0.999)),
cross-entropy between predicted code logits and VQ-VAE codes, best-validation
checkpointing. Data-parallel over the 'data' mesh axis.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.config import End2EndConfig
from ..models.gru_baseline import GeneratorGRU
from ..parallel.mesh import DATA_AXIS, make_mesh


@partial(jax.tree_util.register_dataclass,
         data_fields=["params", "batch_stats", "opt_state", "step"],
         meta_fields=[])
@dataclass
class End2EndTrainState:
    params: dict
    batch_stats: dict
    opt_state: tuple
    step: jnp.ndarray


class End2EndTrainer:
    def __init__(self, cfg: End2EndConfig, mesh: Optional[Mesh] = None,
                 wav_len: int = 64000):
        self.cfg = cfg
        self.model = GeneratorGRU(hidden=cfg.hidden_size,
                                  output=cfg.output_size)
        self.mesh = mesh or make_mesh()
        self.wav_len = wav_len
        self.tx = optax.adam(cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1])
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def init_state(self, rng: jax.Array) -> End2EndTrainState:
        wav = jnp.zeros((1, self.wav_len))
        tgt = jnp.zeros((1, 30), jnp.int32)
        variables = self.model.init(rng, wav, tgt, train=True)
        return End2EndTrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32))

    def _build_train_step(self):
        model, tx = self.model, self.tx

        def step_fn(state, wav, codes, rng):
            def loss_fn(params):
                (logits, loss), updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    wav, codes, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                return loss, updates.get("batch_stats", {})

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return End2EndTrainState(params=params, batch_stats=new_stats,
                                     opt_state=opt_state,
                                     step=state.step + 1), loss

        return jax.jit(shard_map(step_fn, mesh=self.mesh,
                                 in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS),
                                           P()),
                                 out_specs=(P(), P()), check_rep=False),
                       donate_argnums=(0,))

    def _build_eval_step(self):
        model = self.model

        def step_fn(state, wav, codes):
            _, loss = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                wav, codes, train=False)
            return jax.lax.pmean(loss, DATA_AXIS)

        return jax.jit(shard_map(step_fn, mesh=self.mesh,
                                 in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                                 out_specs=P(), check_rep=False))

    def train_step(self, state, wav, codes, rng):
        return self._train_step(state, jnp.asarray(wav), jnp.asarray(codes),
                                rng)

    def eval_step(self, state, wav, codes):
        return self._eval_step(state, jnp.asarray(wav), jnp.asarray(codes))
