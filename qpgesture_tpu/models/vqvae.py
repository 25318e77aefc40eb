"""Gesture VQ-VAE: 240-frame rotation-matrix windows -> 30 codebook indices.

Same model family as the reference (codebook/models/vqvae.py:52-302,
Jukebox/Bailando-style, 1 level, x8 temporal downsampling, EMA codebook
512x512, loss = L1 recon + commit + velocity L1 + acceleration L1 + optional
smoothness regularizer), re-designed functionally for JAX: parameters and the
EMA codebook are explicit pytrees, encode/decode/train_forward are pure jitted
functions, and the data layout is NTC end to end.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VQVAEConfig
from . import bottleneck as bn
from .encdec import Decoder, Encoder


@dataclass
class VQVAE:
    """Stateless model definition; all state is passed explicitly."""
    cfg: VQVAEConfig

    def __post_init__(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    # ---- initialization -------------------------------------------------
    def init(self, rng: jax.Array, sample_len: int = 240):
        """Returns (params, codebook_state). The codebook starts zeroed and
        must be data-initialized with `init_codebook_from_batch` before the
        first real update (mirroring init_k-on-first-batch,
        bottleneck.py:163-164)."""
        r_enc, r_dec = jax.random.split(rng)
        x = jnp.zeros((1, sample_len, self.cfg.input_dim), jnp.float32)
        enc_params = self.encoder.init(r_enc, x)["params"]
        h = self.encoder.apply({"params": enc_params}, x)[-1]
        dec_params = self.decoder.init(r_dec, h)["params"]
        params = {"encoder": enc_params, "decoder": dec_params}
        K, D = self.cfg.l_bins, self.cfg.emb_width
        cb = bn.CodebookState(k=jnp.zeros((K, D)), k_sum=jnp.zeros((K, D)),
                              k_elem=jnp.ones((K,)))
        return params, cb

    def init_codebook_from_batch(self, params, x: jnp.ndarray,
                                 rng: jax.Array) -> bn.CodebookState:
        h = self.encoder.apply({"params": params["encoder"]}, x)[-1]
        flat = h.reshape(-1, h.shape[-1])
        return bn.init_codebook(flat, self.cfg.l_bins, rng)

    # ---- inference ------------------------------------------------------
    def encode(self, params, cb: bn.CodebookState,
               x: jnp.ndarray) -> jnp.ndarray:
        """(N, T, 135) -> (N, T/hop) int codes (vqvae.py:174-181)."""
        h = self.encoder.apply({"params": params["encoder"]}, x)[-1]
        N, T, D = h.shape
        codes, _ = bn.quantise(cb, h.reshape(N * T, D))
        return codes.reshape(N, T)

    def decode(self, params, cb: bn.CodebookState,
               codes: jnp.ndarray) -> jnp.ndarray:
        """(N, Tc) int codes -> (N, Tc*hop, 135) poses (vqvae.py:152-159)."""
        x_d = bn.dequantise(cb, codes)
        return self.decoder.apply({"params": params["decoder"]}, x_d)

    # ---- training -------------------------------------------------------
    def forward(self, params, cb: bn.CodebookState, x: jnp.ndarray, *,
                train: bool, rng: Optional[jax.Array] = None,
                axis_name: Optional[str] = None):
        """Full forward with losses (vqvae.py:187-302).

        Returns (x_out, loss, metrics, new_codebook_state).
        """
        cfg = self.cfg
        h = self.encoder.apply({"params": params["encoder"]}, x)[-1]
        codes, x_d, commit_loss, metrics, new_cb = bn.forward(
            cb, h, mu=cfg.l_mu, train=train, rng=rng, axis_name=axis_name)
        x_out = self.decoder.apply({"params": params["decoder"]}, x_d)

        def l1(a, b):
            return jnp.mean(jnp.abs(a - b))

        x_t = x.astype(jnp.float32)
        recons_loss = l1(x_t, x_out)
        vel_loss = l1(x_out[:, 1:] - x_out[:, :-1],
                      x_t[:, 1:] - x_t[:, :-1])
        acc_loss = l1(x_out[:, 2:] + x_out[:, :-2] - 2 * x_out[:, 1:-1],
                      x_t[:, 2:] + x_t[:, :-2] - 2 * x_t[:, 1:-1])
        regularization = jnp.mean(
            (x_out[:, 2:] + x_out[:, :-2] - 2 * x_out[:, 1:-1]) ** 2)

        loss = (recons_loss + commit_loss * cfg.commit
                + cfg.reg * regularization + cfg.vel * vel_loss
                + cfg.acc * acc_loss)
        metrics = dict(metrics, recons_loss=recons_loss, l1_loss=recons_loss,
                       commit_loss=commit_loss, regularization=regularization,
                       velocity_loss=vel_loss, acceleration_loss=acc_loss)
        return x_out, loss, metrics, new_cb


def eval_pose_error(x: jnp.ndarray, x_out: jnp.ndarray,
                    joint_channel: int = 9) -> jnp.ndarray:
    """Validation metric: mean per-joint Frobenius error over 9-dim rows
    (train.py:41-45)."""
    b, t, c = x.shape
    diff = (x - x_out).reshape(b, t, c // joint_channel, joint_channel)
    return jnp.mean(jnp.sqrt(jnp.sum(diff ** 2, axis=3)))


def save_vqvae_native(path: str, params, cb: bn.CodebookState) -> None:
    """Single-file msgpack checkpoint (weights + EMA codebook)."""
    from flax import serialization
    payload = {"params": params,
               "codebook": {"k": cb.k, "k_sum": cb.k_sum,
                            "k_elem": cb.k_elem}}
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_vqvae_native(path: str, model: "VQVAE"):
    """Inverse of save_vqvae_native; shapes from a fresh init."""
    from flax import serialization
    params0, cb0 = model.init(jax.random.PRNGKey(0))
    template = {"params": params0,
                "codebook": {"k": cb0.k, "k_sum": cb0.k_sum,
                             "k_elem": cb0.k_elem}}
    with open(path, "rb") as f:
        payload = serialization.from_bytes(template, f.read())
    cb = bn.CodebookState(k=jnp.asarray(payload["codebook"]["k"]),
                          k_sum=jnp.asarray(payload["codebook"]["k_sum"]),
                          k_elem=jnp.asarray(payload["codebook"]["k_elem"]))
    return payload["params"], cb


def codebook_signature(model: VQVAE, params, cb: bn.CodebookState,
                       data_mean: Optional[np.ndarray] = None,
                       data_std: Optional[np.ndarray] = None):
    """Decode every code as a constant 30-code block; signature = mean pose
    over time (VisualizeCodebook.cal_distance:93-116). Returns
    (code (512, 30), poses (512, 240, 135), signature (512, 135)),
    denormalized if stats are given."""
    K = model.cfg.l_bins
    codes = jnp.tile(jnp.arange(K, dtype=jnp.int32)[:, None],
                     (1, model.cfg.sample_length))
    decode = jax.jit(lambda p, s_, c: model.decode(p, s_, c))
    poses = np.asarray(decode(params, cb, codes))
    if data_mean is not None:
        std = np.clip(np.asarray(data_std), 0.01, None)
        poses = poses * std + np.asarray(data_mean)
    signature = poses.mean(axis=1)
    return np.asarray(codes), poses, signature
