"""Legacy text->pose Seq2Seq attention network (completeness port).

The reference vendors a Bahdanau-attention Seq2Seq stack in
codebook/generate/generate.py:69-309 (EncoderRNN / Attn /
BahdanauAttnDecoderRNN / Generator / Seq2SeqNet) from the
Yoon-et-al-lineage text-to-gesture baselines. Nothing in the reference
constructs it — the shipped end2end path uses Generator_gru — but "every
component" includes it, so this is a faithful JAX port with a
checkpoint converter and torch parity tests (tests/test_seq2seq.py).

Semantics preserved from the torch original:

* EncoderRNN (generate.py:70-113): vocab embedding -> n_layers
  bidirectional GRU over a PACKED sequence -> summed directions.
  Packing means (a) hidden states stop updating past each sequence's
  length, (b) pad positions of the unpacked output are zero, and (c) the
  backward direction starts at each sequence's LAST VALID token. All
  three are reproduced with masked scans + per-sequence flips.
* Attn (generate.py:116-144): additive score v . tanh(W [h; enc_t]),
  softmaxed over ALL T encoder steps — the reference does NOT mask pad
  positions out of the softmax (their encoder outputs are zero vectors
  but W [h; 0] still scores), and neither do we.
* BahdanauAttnDecoderRNN (generate.py:147-243): one step = attention
  context + input -> pre_linear (Dense + BatchNorm1d + ReLU) -> n_layers
  GRU -> output Dense. Optional discrete-code embedding input and 8-d
  speaker embedding, as upstream.
* Seq2SeqNet (generate.py:275-309): decoder initial hidden =
  encoder_hidden[:n_layers] — with torch's (layers*directions) hidden
  layout [l0_f, l0_b, l1_f, l1_b, ...] that is the first n_layers
  entries of that interleaved stack, NOT "forward hiddens of all
  layers"; quirky, but reproduced. Teacher forcing for the first
  n_pre_poses steps, autoregressive after; outputs[0] is the seed pose.

The per-step decode loop is a lax.scan (nn.scan) instead of the
reference's Python loop; in train mode the pre_linear BatchNorm's
running statistics are threaded through the scan carry, matching
torch's sequential per-step running-stat updates. One consequence:
initialize the module with train=False (the eval path creates the
BatchNorm statistics; a collection cannot be created from inside a
variable_carry scan), then apply with train=True and
mutable=["batch_stats"].
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .gru_baseline import TorchGRUCell


def _flip_by_length(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each sequence within its own valid length (the packed-GRU
    backward-direction ordering): out[b, t] = x[b, len_b - 1 - t] for
    t < len_b; positions past the length gather a clamped index and are
    masked off by the caller."""
    T = x.shape[1]
    t = jnp.arange(T)
    idx = jnp.clip(lengths[:, None] - 1 - t[None, :], 0, T - 1)  # (B, T)
    return jnp.take_along_axis(x, idx[(...,) + (None,) * (x.ndim - 2)],
                               axis=1)


def _masked_gru(cell: TorchGRUCell, x: jnp.ndarray, mask: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a GRU over (B, T, D) updating the hidden state only where
    mask (B, T) is true — torch packed-sequence semantics. Returns the
    per-step hiddens (B, T, H) and the final (= last-valid) hidden."""
    B = x.shape[0]
    h0 = jnp.zeros((B, cell.hidden), x.dtype)

    def step(c, h, xm):
        xt, mt = xm
        h_new, _ = c(h, xt)
        h_new = jnp.where(mt[:, None], h_new, h)
        return h_new, h_new

    scan = nn.scan(step, variable_broadcast="params",
                   split_rngs={"params": False}, in_axes=1, out_axes=1)
    h_last, ys = scan(cell, h0, (x, mask))
    return ys, h_last


class TextEncoderRNN(nn.Module):
    """EncoderRNN (generate.py:70-113): embedding + n_layers bi-GRU with
    packed-sequence semantics, directions SUMMED in the returned outputs.
    Also returns the torch-layout hidden stack (layers*2, B, H) ordered
    [l0_f, l0_b, l1_f, l1_b, ...]."""
    vocab: int
    embed: int
    hidden: int
    layers: int = 1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        T = tokens.shape[1]
        mask = jnp.arange(T)[None, :] < lengths[:, None]        # (B, T)
        fmask = mask[..., None].astype(jnp.float32)
        x = nn.Embed(self.vocab, self.embed, name="embedding")(
            tokens.astype(jnp.int32))

        hiddens = []
        for layer in range(self.layers):
            fwd, h_f = _masked_gru(
                TorchGRUCell(self.hidden, name=f"gru{layer}_f"), x, mask)
            xrev = _flip_by_length(x, lengths)
            brev, h_b = _masked_gru(
                TorchGRUCell(self.hidden, name=f"gru{layer}_b"), xrev, mask)
            bwd = _flip_by_length(brev, lengths)
            # pad positions are zero after torch pad_packed_sequence
            x = jnp.concatenate([fwd, bwd], axis=-1) * fmask
            hiddens += [h_f, h_b]
            if train and layer < self.layers - 1 and self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        outputs = (x[..., :self.hidden] + x[..., self.hidden:]) * fmask
        return outputs, jnp.stack(hiddens, axis=0)


class BahdanauAttn(nn.Module):
    """Attn (generate.py:116-144): softmax_t( v . tanh(W [h; enc_t]) ),
    unmasked over all T steps as in the reference."""
    hidden: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, enc: jnp.ndarray) -> jnp.ndarray:
        hT = jnp.broadcast_to(h[:, None, :], enc.shape)        # (B, T, H)
        energy = jnp.tanh(nn.Dense(self.hidden, name="attn")(
            jnp.concatenate([hT, enc], axis=-1)))              # (B, T, H)
        v = self.param("v", nn.initializers.normal(
            1.0 / jnp.sqrt(self.hidden)), (self.hidden,))
        return jax.nn.softmax(energy @ v, axis=1)              # (B, T)


class AttnDecoderCell(nn.Module):
    """One BahdanauAttnDecoderRNN step (generate.py:196-243): attention
    context over the encoder outputs, pre_linear (Dense+BatchNorm1d+ReLU),
    n_layers stacked GRU cells, output Dense."""
    hidden: int
    output: int
    layers: int = 1
    dropout_p: float = 0.1
    discrete: bool = False
    speaker_n: Optional[int] = None

    @nn.compact
    def __call__(self, motion_input: jnp.ndarray, last_hidden: jnp.ndarray,
                 enc: jnp.ndarray, vid: Optional[jnp.ndarray] = None,
                 train: bool = False):
        if self.discrete:
            emb = nn.Embed(self.output, self.hidden, name="embedding")(
                motion_input.astype(jnp.int32))                # (B, H)
            motion_input = nn.Dropout(
                self.dropout_p, deterministic=not train)(emb)

        attn_w = BahdanauAttn(self.hidden, name="attn")(
            last_hidden[-1], enc)                              # (B, T)
        context = jnp.einsum("bt,bth->bh", attn_w, enc)        # (B, H)

        rnn_in = jnp.concatenate([motion_input, context], axis=-1)
        if self.speaker_n is not None:
            assert vid is not None
            spk = nn.Embed(self.speaker_n, 8, name="speaker_embedding")(
                vid.astype(jnp.int32))
            rnn_in = jnp.concatenate([rnn_in, spk], axis=-1)

        x = nn.Dense(self.hidden, name="pre_linear")(rnn_in)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, axis=-1,
                         use_running_average=not train, name="pre_bn")(x)
        x = nn.relu(x)

        new_hidden = []
        for layer in range(self.layers):
            h, _ = TorchGRUCell(self.hidden, name=f"gru{layer}")(
                last_hidden[layer], x)
            new_hidden.append(h)
            x = h
            if train and layer < self.layers - 1 and self.dropout_p > 0:
                x = nn.Dropout(self.dropout_p,
                               deterministic=not train)(x)
        out = nn.Dense(self.output, name="out")(x)             # (B, output)
        return out, jnp.stack(new_hidden, axis=0), attn_w


class Seq2SeqNet(nn.Module):
    """Seq2SeqNet (generate.py:275-309): text -> pose sequence with the
    first n_pre_poses frames teacher-forced. The reference's Python
    per-frame loop is a single nn.scan here."""
    vocab: int
    embed: int
    hidden: int
    pose_dim: int
    n_frames: int
    n_pre_poses: int = 10
    n_layers: int = 1
    dropout: float = 0.1
    speaker_n: Optional[int] = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                 poses: jnp.ndarray, vid: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        if train and self.is_initializing():
            # batch_stats cannot be CREATED inside the variable_carry
            # scan; without this guard the failure is an opaque flax
            # scan error instead of the fix
            raise ValueError(
                "Seq2SeqNet must be initialized with train=False (the "
                "eval path creates the BatchNorm batch_stats); apply "
                "with train=True and mutable=['batch_stats'] afterwards")
        enc_out, enc_hidden = TextEncoderRNN(
            self.vocab, self.embed, self.hidden, self.n_layers,
            self.dropout, name="encoder")(tokens, lengths, train=train)
        # torch hidden layout is [l0_f, l0_b, l1_f, ...]; the reference
        # seeds the decoder with the FIRST n_layers entries of that
        # interleaved stack (generate.py:296)
        dec_hidden = enc_hidden[:self.n_layers]

        cell = AttnDecoderCell(self.hidden, self.pose_dim, self.n_layers,
                               self.dropout, discrete=False,
                               speaker_n=self.speaker_n, name="decoder")

        def step(c, carry, pose_t, t):
            prev, hid = carry
            out, hid, _ = c(prev, hid, enc_out, vid, train)
            nxt = jnp.where(t < self.n_pre_poses, pose_t, out)
            return (nxt, hid), out

        if train:
            scan = nn.scan(step, variable_broadcast="params",
                           variable_carry="batch_stats",
                           split_rngs={"params": False, "dropout": True},
                           in_axes=(1, 0), out_axes=1)
        else:
            scan = nn.scan(step,
                           variable_broadcast=("params", "batch_stats"),
                           split_rngs={"params": False, "dropout": False},
                           in_axes=(1, 0), out_axes=1)
        first = poses[:, 0]
        ts = jnp.arange(1, self.n_frames)
        _, outs = scan(cell, (first, dec_hidden), poses[:, 1:], ts)
        return jnp.concatenate([first[:, None], outs], axis=1)
