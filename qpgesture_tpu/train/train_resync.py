"""ResyncNet WGAN-GP trainer.

Mirrors Speech2GestureMatching/train_resync_gestureknn.py:38-187: the critic
trains every iteration on (mfcc | motion) stacks with gradient penalty
(lambda 100); the UNet generator trains every GEN_HOP=5 iterations
(curr_iter % GEN_HOP == 0 — BURNIN_ITER gates only best-model selection,
fit():142), with adversarial weight 1 and L1 reconstruction against the
KNN input motion (the generator resyncs the matched motion, it does not
regress to ground truth — loss_batch:93); Adam(lr, weight_decay=4e-5,
betas=(0.0, 0.9)) for both (get_model:172-173; torch-style coupled L2,
decay folded into the gradient before the Adam statistics).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import ResyncConfig
from ..models.resync import Discriminator, ResyncNet, gradient_penalty


@partial(jax.tree_util.register_dataclass,
         data_fields=["g_params", "g_stats", "d_params", "g_opt", "d_opt",
                      "step"],
         meta_fields=[])
@dataclass
class ResyncTrainState:
    g_params: dict
    g_stats: dict
    d_params: dict
    g_opt: tuple
    d_opt: tuple
    step: jnp.ndarray


class ResyncTrainer:
    def __init__(self, cfg: ResyncConfig, n_mfcc: int, n_joints: int,
                 num_frames: int, mesh=None):
        """mesh: optional jax.sharding.Mesh for data-parallel steps (grads,
        losses, and generator BN stats pmean'ed over the 'data' axis — the
        same collectives as the VQ-VAE/PAE trainers); None keeps the
        single-device path. The WGAN-GP interpolation eps are drawn for the
        FULL batch before sharding, so the DP step equals the single-device
        step (tests/test_trainers_aux.py)."""
        self.cfg = cfg
        self.n_mfcc = n_mfcc
        self.mesh = mesh
        bn_axis = None
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS as bn_axis  # noqa: F811
        # SyncBN: in the mesh path the generator's BatchNorm statistics
        # psum over the data axis, making DP == single-device exactly
        self.gen = ResyncNet(out_features=n_joints, bn_axis_name=bn_axis)
        # same param structure with no axis name, for init outside shard_map
        self._gen_init = ResyncNet(out_features=n_joints)
        self.disc = Discriminator(num_frames=num_frames)
        # torch Adam(weight_decay=...) adds wd*param to the gradient BEFORE
        # the moment estimates (coupled L2, not AdamW's decoupled decay)
        def _tx():
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
                optax.scale(-cfg.lr))
        self.g_tx = _tx()
        self.d_tx = _tx()
        if mesh is not None:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS
            self._d_step = jax.jit(shard_map(
                self._build_d_step(axis=DATA_AXIS), mesh=mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=(P(), P()), check_rep=False))
            self._g_step = jax.jit(shard_map(
                self._build_g_step(axis=DATA_AXIS), mesh=mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=(P(), P()), check_rep=False))
        else:
            self._d_step = jax.jit(self._build_d_step())
            self._g_step = jax.jit(self._build_g_step())

    def init_state(self, rng: jax.Array, num_frames: int
                   ) -> ResyncTrainState:
        rg, rd = jax.random.split(rng)
        x = jnp.zeros((1, num_frames, self.n_mfcc + self.gen.out_features))
        gv = self._gen_init.init(rg, x, train=True)
        dv = self.disc.init(rd, x)
        return ResyncTrainState(
            g_params=gv["params"], g_stats=gv.get("batch_stats", {}),
            d_params=dv["params"], g_opt=self.g_tx.init(gv["params"]),
            d_opt=self.d_tx.init(dv["params"]),
            step=jnp.zeros((), jnp.int32))

    def _generate(self, state, x_knn, train):
        variables = {"params": state.g_params,
                     "batch_stats": state.g_stats}
        if train:
            (motion), updates = self.gen.apply(variables, x_knn, train=True,
                                               mutable=["batch_stats"])
            return motion, updates["batch_stats"]
        return self.gen.apply(variables, x_knn, train=False), state.g_stats

    def _build_d_step(self, axis: Optional[str] = None):
        cfg, disc = self.cfg, self.disc

        def step(state: ResyncTrainState, x_knn, x_real, eps):
            mfcc = x_knn[:, :, :self.n_mfcc]
            # the reference generates D-step fakes with the generator in
            # train mode (fit():129 model_resync.train(), then
            # loss_batch:70 .detach()) — batch statistics, and the BN
            # running averages advance during the D step too
            fake_motion, g_stats = self._generate(state, x_knn, train=True)
            fake = jax.lax.stop_gradient(
                jnp.concatenate([mfcc, fake_motion], axis=-1))

            def loss_fn(d_params):
                dv = {"params": d_params}
                d_fake = jnp.mean(disc.apply(dv, fake))
                d_real = jnp.mean(disc.apply(dv, x_real))
                gp = gradient_penalty(disc.apply, dv, x_real, fake,
                                      eps=eps)
                return d_fake - d_real + cfg.lambda_gp * gp

            loss, grads = jax.value_and_grad(loss_fn)(state.d_params)
            if axis is not None:
                grads = jax.lax.pmean(grads, axis)
                loss = jax.lax.pmean(loss, axis)
                g_stats = jax.lax.pmean(g_stats, axis)
            updates, d_opt = self.d_tx.update(grads, state.d_opt,
                                              state.d_params)
            d_params = optax.apply_updates(state.d_params, updates)
            return ResyncTrainState(
                g_params=state.g_params, g_stats=g_stats,
                d_params=d_params, g_opt=state.g_opt, d_opt=d_opt,
                step=state.step + 1), loss

        return step

    def _build_g_step(self, axis: Optional[str] = None):
        cfg, gen, disc = self.cfg, self.gen, self.disc

        def step(state: ResyncTrainState, x_knn, x_real):
            mfcc = x_knn[:, :, :self.n_mfcc]
            # reconstruction target is the KNN INPUT motion (loss_batch:93
            # L1(train_knn_xb[:, NUM_MFCC_FEAT:], pred_gen)): the generator
            # stays close to the matched gestures it resyncs, it does not
            # regress to ground truth (x_real feeds only the critic)
            knn_motion = x_knn[:, :, self.n_mfcc:]

            def loss_fn(g_params):
                (motion), updates = gen.apply(
                    {"params": g_params, "batch_stats": state.g_stats},
                    x_knn, train=True, mutable=["batch_stats"])
                fake = jnp.concatenate([mfcc, motion], axis=-1)
                adv = -jnp.mean(disc.apply({"params": state.d_params}, fake))
                recon = jnp.mean(jnp.abs(motion - knn_motion))
                loss = (cfg.weight_gen * adv + cfg.weight_recon * recon)
                return loss, updates["batch_stats"]

            (loss, g_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.g_params)
            if axis is not None:
                grads = jax.lax.pmean(grads, axis)
                loss = jax.lax.pmean(loss, axis)
                g_stats = jax.lax.pmean(g_stats, axis)
            updates, g_opt = self.g_tx.update(grads, state.g_opt,
                                              state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            return ResyncTrainState(
                g_params=g_params, g_stats=g_stats,
                d_params=state.d_params, g_opt=g_opt, d_opt=state.d_opt,
                step=state.step), loss

        return step

    def train_iteration(self, state, x_knn, x_real, rng, it: int
                        ) -> Tuple[ResyncTrainState, dict]:
        """One reference-style iteration: D always; G every gen_hop
        (loss_batch:87 `curr_iter % GEN_HOP == 0`; burnin_iters gates only
        best-model selection in the reference's fit loop)."""
        # the WGAN-GP interpolation points for the whole batch, drawn
        # BEFORE any sharding: identical values in the single-device and
        # data-parallel paths (same rng consumption as the old in-step draw)
        eps = jax.random.uniform(rng, (np.asarray(x_knn).shape[0], 1, 1))
        state, d_loss = self._d_step(state, jnp.asarray(x_knn),
                                     jnp.asarray(x_real), eps)
        logs = {"d_loss": float(d_loss)}
        if it % self.cfg.gen_hop == 0:
            state, g_loss = self._g_step(state, jnp.asarray(x_knn),
                                         jnp.asarray(x_real))
            logs["g_loss"] = float(g_loss)
        return state, logs
