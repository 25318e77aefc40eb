"""VQ-VAE encoder/decoder conv stacks (flax).

Same topology as the reference (codebook/models/encdec.py:8-136,
resnet.py:27-77): EncoderConvBlock = down_t x [Conv1d(k=2s, stride s, pad s/2)
+ Resnet1D(width, depth, dilation growth 3)] + Conv1d(k3) projection;
DecoderConvBock mirrors with transposed convs and reversed dilations.

TPU-native layout: activations are NTC (batch, time, channels) so XLA maps
the convs onto the MXU directly; torch checkpoints convert via
models/torch_convert.py. Padding is explicit to match torch Conv1d exactly.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import VQVAEConfig

# Conv precision: "highest" = true f32 on the MXU (checkpoint parity,
# quantizer correctness); "default" = bf16 multiplications with f32
# accumulate (the standard TPU training speed point). Select per-model via
# VQVAEConfig.conv_precision.
PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


class Conv1dTorch(nn.Module):
    """Conv1d with torch semantics on NTC data: explicit symmetric padding,
    cross-correlation kernel (k, in, out)."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    precision: str = "highest"

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.kernel_size, in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.stride,),
            padding=((self.padding, self.padding),),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=PRECISIONS[self.precision])
        return y + bias


class ConvTranspose1dTorch(nn.Module):
    """ConvTranspose1d with torch semantics: out_len = (L-1)*s - 2p + k.

    Implemented as an input-dilated cross-correlation with a flipped kernel
    and padding (k-1-p); the kernel parameter is stored flipped relative to
    torch's (in, out, k) weight (see torch_convert.convert_conv_transpose).
    """
    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    precision: str = "highest"

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,),
            padding=((k - 1 - p, k - 1 - p),),
            lhs_dilation=(s,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=PRECISIONS[self.precision])
        return y + bias


class ResConv1DBlock(nn.Module):
    """ReLU -> Conv(k3, dilated) -> ReLU -> Conv(k1), residual
    (resnet.py:27-46)."""
    n_in: int
    n_state: int
    dilation: int = 1
    res_scale: float = 1.0
    precision: str = "highest"

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = Conv1dTorch(self.n_state, 3, 1, self.dilation, self.dilation,
                        precision=self.precision, name="conv1")(h)
        h = nn.relu(h)
        h = Conv1dTorch(self.n_in, 1, 1, 0, precision=self.precision,
                        name="conv2")(h)
        return x + self.res_scale * h


class Resnet1D(nn.Module):
    """Stack of dilated residual blocks; dilation = growth^depth, optionally
    reversed for the decoder (resnet.py:48-77)."""
    n_in: int
    n_depth: int
    m_conv: float = 1.0
    dilation_growth_rate: int = 1
    dilation_cycle: int | None = None
    reverse_dilation: bool = False
    res_scale: bool = False
    precision: str = "highest"
    # activation checkpointing per residual block (reference checkpoint_res,
    # resnet.py:63-75): recompute the block in the backward pass instead of
    # storing its activations
    checkpoint_res: bool = False

    @nn.compact
    def __call__(self, x):
        def get_depth(depth):
            return depth if self.dilation_cycle is None \
                else depth % self.dilation_cycle

        scale = 1.0 if not self.res_scale else 1.0 / (self.n_depth ** 0.5)
        depths = list(range(self.n_depth))
        if self.reverse_dilation:
            depths = depths[::-1]
        block_cls = nn.remat(ResConv1DBlock) if self.checkpoint_res \
            else ResConv1DBlock
        for i, depth in enumerate(depths):
            x = block_cls(
                self.n_in, int(self.m_conv * self.n_in),
                dilation=self.dilation_growth_rate ** get_depth(depth),
                res_scale=scale, precision=self.precision,
                name=f"block{i}")(x)
        return x


class EncoderConvBlock(nn.Module):
    input_emb_width: int
    output_emb_width: int
    down_t: int
    stride_t: int
    width: int
    depth: int
    m_conv: float
    dilation_growth_rate: int = 1
    dilation_cycle: int | None = None
    precision: str = "highest"
    checkpoint_res: bool = False

    @nn.compact
    def __call__(self, x):
        filter_t, pad_t = self.stride_t * 2, self.stride_t // 2
        for i in range(self.down_t):
            x = Conv1dTorch(self.width, filter_t, self.stride_t, pad_t,
                            precision=self.precision,
                            name=f"down{i}_conv")(x)
            x = Resnet1D(self.width, self.depth, self.m_conv,
                         self.dilation_growth_rate, self.dilation_cycle,
                         precision=self.precision,
                         checkpoint_res=self.checkpoint_res,
                         name=f"down{i}_resnet")(x)
        x = Conv1dTorch(self.output_emb_width, 3, 1, 1,
                        precision=self.precision, name="proj")(x)
        return x


class DecoderConvBlock(nn.Module):
    input_emb_width: int   # final output channels of this block chain
    output_emb_width: int  # embedding width at the input
    down_t: int
    stride_t: int
    width: int
    depth: int
    m_conv: float
    dilation_growth_rate: int = 1
    dilation_cycle: int | None = None
    reverse_decoder_dilation: bool = False
    precision: str = "highest"
    checkpoint_res: bool = False

    @nn.compact
    def __call__(self, x):
        filter_t, pad_t = self.stride_t * 2, self.stride_t // 2
        x = Conv1dTorch(self.width, 3, 1, 1, precision=self.precision,
                        name="proj")(x)
        for i in range(self.down_t):
            x = Resnet1D(self.width, self.depth, self.m_conv,
                         self.dilation_growth_rate, self.dilation_cycle,
                         reverse_dilation=self.reverse_decoder_dilation,
                         precision=self.precision,
                         checkpoint_res=self.checkpoint_res,
                         name=f"up{i}_resnet")(x)
            out_ch = self.input_emb_width if i == self.down_t - 1 \
                else self.width
            x = ConvTranspose1dTorch(out_ch, filter_t, self.stride_t, pad_t,
                                     precision=self.precision,
                                     name=f"up{i}_convt")(x)
        return x


class Encoder(nn.Module):
    """Multi-level encoder; level l downsamples by stride^down cumulative
    (encdec.py:53-90). NTC in/out."""
    cfg: VQVAEConfig

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        cfg = self.cfg
        xs = []
        for level in range(cfg.levels):
            mult = cfg.hvqvae_multipliers[level]
            x = EncoderConvBlock(
                cfg.input_dim if level == 0 else cfg.emb_width,
                cfg.emb_width, cfg.downs_t[level], cfg.strides_t[level],
                width=cfg.width * mult, depth=cfg.depth * mult,
                m_conv=cfg.m_conv,
                dilation_growth_rate=cfg.dilation_growth_rate,
                dilation_cycle=cfg.dilation_cycle,
                precision=cfg.conv_precision,
                checkpoint_res=cfg.checkpoint_res,
                name=f"level{level}")(x)
            xs.append(x)
        return xs


class Decoder(nn.Module):
    """Single-level decode path (the reference always decodes from the
    lowest level, vqvae.py:147-148). NTC in/out."""
    cfg: VQVAEConfig

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        cfg = self.cfg
        mult = cfg.hvqvae_multipliers[0]
        x = DecoderConvBlock(
            cfg.emb_width, cfg.emb_width, cfg.downs_t[0], cfg.strides_t[0],
            width=cfg.width * mult, depth=cfg.depth * mult, m_conv=cfg.m_conv,
            dilation_growth_rate=cfg.dilation_growth_rate,
            dilation_cycle=cfg.dilation_cycle,
            reverse_decoder_dilation=cfg.vqvae_reverse_decoder_dilation,
            precision=cfg.conv_precision,
            checkpoint_res=cfg.checkpoint_res,
            name="level0")(x)
        x = Conv1dTorch(cfg.input_dim, 3, 1, 1,
                        precision=cfg.conv_precision, name="out")(x)
        return x
