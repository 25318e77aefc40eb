"""simpleVQVAE: the VQ-CPC-style alternative quantizer.

Port of codebook/models/simpleVqvae.py:71-226 (unused in the main path but
part of the reference's model inventory): a strided conv encoder + LSTM over
half-width features, an EMA VQEmbedding, and a conv-transpose decoder.
Downsamples 240 frames by x8 like the main VQ-VAE.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import VQVAEConfig
from . import bottleneck as bn
from .encdec import Conv1dTorch, ConvTranspose1dTorch


class SimpleEncoder(nn.Module):
    """Strided conv stack (240 -> 30) + LSTM refinement."""
    width: int = 256
    emb_width: int = 512

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        h = nn.relu(Conv1dTorch(self.width, 4, 2, 1, name="conv0")(x))
        h = nn.relu(Conv1dTorch(self.width, 4, 2, 1, name="conv1")(h))
        h = nn.relu(Conv1dTorch(self.width, 4, 2, 1, name="conv2")(h))
        lstm = nn.OptimizedLSTMCell(self.width, name="lstm")
        B = h.shape[0]
        carry = lstm.initialize_carry(jax.random.PRNGKey(0),
                                      (B, self.width))
        scan = nn.scan(lambda c, carry_x, xt: c(carry_x, xt),
                       variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        _, h = scan(lstm, carry, h)
        return nn.Dense(self.emb_width, name="proj")(h)


class SimpleDecoder(nn.Module):
    width: int = 256
    out_dim: int = 135

    @nn.compact
    def __call__(self, z):  # (B, Tc, D)
        h = nn.relu(Conv1dTorch(self.width, 3, 1, 1, name="conv_in")(z))
        h = nn.relu(ConvTranspose1dTorch(self.width, 4, 2, 1, name="up0")(h))
        h = nn.relu(ConvTranspose1dTorch(self.width, 4, 2, 1, name="up1")(h))
        h = nn.relu(ConvTranspose1dTorch(self.width, 4, 2, 1, name="up2")(h))
        return Conv1dTorch(self.out_dim, 3, 1, 1, name="conv_out")(h)


class SimpleVQVAE:
    """Functional wrapper mirroring the main VQVAE API (encode/decode/
    forward with explicit EMA codebook state)."""

    def __init__(self, cfg: VQVAEConfig):
        self.cfg = cfg
        self.encoder = SimpleEncoder(emb_width=cfg.emb_width)
        self.decoder = SimpleDecoder(out_dim=cfg.input_dim)

    def init(self, rng: jax.Array, sample_len: int = 240):
        r1, r2 = jax.random.split(rng)
        x = jnp.zeros((1, sample_len, self.cfg.input_dim))
        enc = self.encoder.init(r1, x)["params"]
        h = self.encoder.apply({"params": enc}, x)
        dec = self.decoder.init(r2, h)["params"]
        K, D = self.cfg.l_bins, self.cfg.emb_width
        cb = bn.CodebookState(k=jnp.zeros((K, D)), k_sum=jnp.zeros((K, D)),
                              k_elem=jnp.ones((K,)))
        return {"encoder": enc, "decoder": dec}, cb

    def encode(self, params, cb, x):
        h = self.encoder.apply({"params": params["encoder"]}, x)
        N, T, D = h.shape
        codes, _ = bn.quantise(cb, h.reshape(N * T, D))
        return codes.reshape(N, T)

    def decode(self, params, cb, codes):
        z = bn.dequantise(cb, codes)
        return self.decoder.apply({"params": params["decoder"]}, z)

    def forward(self, params, cb, x, *, train: bool, rng=None,
                axis_name=None):
        h = self.encoder.apply({"params": params["encoder"]}, x)
        codes, h_q, commit, metrics, new_cb = bn.forward(
            cb, h, mu=self.cfg.l_mu, train=train, rng=rng,
            axis_name=axis_name)
        x_out = self.decoder.apply({"params": params["decoder"]}, h_q)
        recon = jnp.mean(jnp.abs(x_out - x))
        loss = recon + self.cfg.commit * commit
        return x_out, loss, dict(metrics, recons_loss=recon,
                                 commit_loss=commit), new_cb
