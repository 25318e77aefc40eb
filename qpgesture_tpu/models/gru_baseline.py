"""End-to-end GRU baseline ("w/o motion matching" ablation).

Same model as the reference (codebook/generate/generate.py:9-31,312-350):
raw 4 s wav (64000 samples) -> 5-layer strided Conv1d WavEncoder -> (B, 30,
32) -> 2-layer bidirectional GRU(200) with summed directions -> LayerNorm ->
Linear(512) code logits; cross-entropy against VQ-VAE codes; sample() takes
the argmax per slot.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core import constants as C
from .encdec import Conv1dTorch


class WavEncoder(nn.Module):
    """Conv1d(1->8->16->32->64->32, k=16, strides 3/3/6/6/6), BatchNorm +
    LeakyReLU(0.3) between layers (generate.py:9-31). 64000 -> (30, 32)."""

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = wav[..., None]  # (B, T, 1)
        specs = [(8, 3), (16, 3), (32, 6), (64, 6)]
        for i, (ch, stride) in enumerate(specs):
            x = Conv1dTorch(ch, 16, stride, 0, name=f"conv{i}")(x)
            x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, axis=-1,
                             use_running_average=not train,
                             name=f"bn{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.3)
        x = Conv1dTorch(32, 16, 6, 0, name="conv4")(x)
        return x  # (B, 30, 32)


class TorchGRUCell(nn.Module):
    """GRU cell with torch gate math: r/z/n gates, the candidate's hidden
    bias inside the reset product (torch.nn.GRU semantics)."""
    hidden: int

    @nn.compact
    def __call__(self, h, x):
        w_ih = self.param("w_ih", nn.initializers.lecun_normal(),
                          (x.shape[-1], 3 * self.hidden))
        w_hh = self.param("w_hh", nn.initializers.lecun_normal(),
                          (self.hidden, 3 * self.hidden))
        b_ih = self.param("b_ih", nn.initializers.zeros, (3 * self.hidden,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (3 * self.hidden,))
        gi = x @ w_ih + b_ih
        gh = h @ w_hh + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1 - z) * n + z * h
        return h_new, h_new


def _run_gru(cell: TorchGRUCell, x: jnp.ndarray, reverse: bool):
    B, T, D = x.shape
    h0 = jnp.zeros((B, cell.hidden), x.dtype)
    xs = jnp.flip(x, axis=1) if reverse else x
    scan = nn.scan(lambda c, h, xt: c(h, xt),
                   variable_broadcast="params",
                   split_rngs={"params": False},
                   in_axes=1, out_axes=1)
    _, ys = scan(cell, h0, xs)
    return jnp.flip(ys, axis=1) if reverse else ys


class GeneratorGRU(nn.Module):
    """WavEncoder + 2-layer BiGRU(200) + LayerNorm + Linear(512)
    (generate.py:312-350)."""
    hidden: int = 200
    output: int = C.CODEBOOK_SIZE
    layers: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, wav: jnp.ndarray, targets: Optional[jnp.ndarray] = None,
                 train: bool = False):
        x = WavEncoder(name="wav_encoder")(wav, train=train)
        for layer in range(self.layers):
            fwd = _run_gru(TorchGRUCell(self.hidden, name=f"gru{layer}_f"),
                           x, reverse=False)
            bwd = _run_gru(TorchGRUCell(self.hidden, name=f"gru{layer}_b"),
                           x, reverse=True)
            x = jnp.concatenate([fwd, bwd], axis=-1)
            if train and layer < self.layers - 1 and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        out = x[..., :self.hidden] + x[..., self.hidden:]  # sum directions
        out = nn.LayerNorm(epsilon=1e-5, name="norm")(out)  # torch eps
        logits = nn.Dense(self.output, name="out")(out)    # (B, 30, 512)

        loss = None
        if targets is not None:
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, targets[..., None].astype(jnp.int32), axis=-1)
            loss = jnp.mean(nll)
        return logits, loss

    def sample(self, variables, wav: jnp.ndarray) -> jnp.ndarray:
        logits, _ = self.apply(variables, wav, train=False)
        return jnp.argmax(logits, axis=-1)


class GeneratorLinear(nn.Module):
    """Legacy linear variant (Generator_linear, generate.py:34-60):
    WavEncoder -> LayerNorm -> bias-free Linear(512) per code slot; CE
    loss; sample() takes the per-slot argmax (its softmax+top1 is argmax).

    The reference's remaining generate.py content — the Seq2Seq attention
    decoder (generate.py:69-309) — is ported in models/seq2seq.py."""
    output: int = C.CODEBOOK_SIZE

    @nn.compact
    def __call__(self, wav: jnp.ndarray,
                 targets: Optional[jnp.ndarray] = None,
                 train: bool = False):
        x = WavEncoder(name="wav_encoder")(wav, train=train)
        # torch LayerNorm eps (1e-5, vs flax 1e-6): the encoder
        # output variance here is ~1e-4, where the eps gap alone shifts
        # normalized values by ~4%
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        logits = nn.Dense(self.output, use_bias=False,
                          name="project")(x)         # (B, 30, 512)
        loss = None
        if targets is not None:
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, targets[..., None].astype(jnp.int32), axis=-1)
            loss = jnp.mean(nll)
        return logits, loss

    def sample(self, variables, wav: jnp.ndarray) -> jnp.ndarray:
        logits, _ = self.apply(variables, wav, train=False)
        return jnp.argmax(logits, axis=-1)
