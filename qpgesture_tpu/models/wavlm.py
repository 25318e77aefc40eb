"""WavLM encoder (JAX port, inference path).

The reference vendors Microsoft's WavLM (process/WavLM/WavLM.py:220-376,
modules.py) and uses `extract_features(wav)[0]` — the last transformer
layer — as the audio embedding for matching (make_beat_dataset.py:337-385).
This is a from-scratch flax implementation of that inference graph:

  * ConvFeatureExtractionModel: 7 strided Conv1d layers
    [(512,10,5), (512,3,2)x4, (512,2,2)x2]; 'default' mode group-norms the
    first block, 'layer_norm' mode layer-norms every block; GELU;
  * feature LayerNorm + Linear projection to the encoder width;
  * TransformerEncoder: weight-normed grouped conv positional embedding
    (k=128, groups=16, SamePad trim) + GELU, post-LN or pre-LN layers;
  * MultiheadAttention with T5-style bucketed relative position bias
    (computed once in layer 0, shared down the stack) and WavLM's gated
    relative position bias (per-layer sigmoid gate on the query,
    modules.py:520-534).

Weights convert from the published torch checkpoints via
convert_wavlm() below.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .encdec import PRECISIONS as _PRECISIONS


@dataclass(frozen=True)
class WavLMJaxConfig:
    encoder_layers: int = 24
    encoder_embed_dim: int = 1024
    encoder_ffn_embed_dim: int = 4096
    encoder_attention_heads: int = 16
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 2, 2), (512, 2, 2))
    extractor_mode: str = "layer_norm"   # 'default' | 'layer_norm'
    conv_bias: bool = True
    layer_norm_first: bool = True
    normalize: bool = True               # layer-norm the raw waveform
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True
    # MXU precision of EVERY contraction in the encoder (convs, attention
    # einsums, and all Dense projections — fc1/fc2 hold most of the FLOPs):
    #   "highest" = true f32 (feature fidelity / checkpoint-parity tests);
    #   "high"    = 3-pass bf16x3 (~f32-accurate, ~2x faster);
    #   "default" = 1-pass bf16 (fastest; feature perturbation ~1e-3 — for
    #               raw-wav serving, certify with the on-chip index-parity
    #               probe: examples/rawwav_latency.py --parity).
    precision: str = "highest"
    # scan the homogeneous layers 1..N-1 (compile one layer body instead of
    # N unrolled copies — large models compile ~20x faster); unrolled mode
    # additionally supports output_layer extraction
    scan_layers: bool = True
    # attention implementation:
    #   "xla"   — plain einsum attention (materialises (B, H, T, T) logits,
    #             bias and weights per layer; the checkpoint-parity path);
    #   "flash" — ops/flash_attention.gated_flash_attention: online-softmax
    #             Pallas kernel with the per-layer bias gate fused in, so
    #             the only (T, T) HBM traffic is one bias read per layer.
    #             Casts q/k/v/bias/gate to bf16 when precision == "default"
    #             (the preset's 1-pass-bf16 contract), f32 otherwise;
    #   "auto"  — "flash" on the TPU backend when precision == "default"
    #             (the raw-wav serving fast path), else "xla". Resolved at
    #             trace time from jax.default_backend().
    attn_impl: str = "auto"

    @classmethod
    def base(cls) -> "WavLMJaxConfig":
        return cls(encoder_layers=12, encoder_embed_dim=768,
                   encoder_ffn_embed_dim=3072, encoder_attention_heads=12,
                   extractor_mode="default", conv_bias=False,
                   layer_norm_first=False, normalize=False,
                   max_distance=1280)


class ConvFeatureExtractor(nn.Module):
    cfg: WavLMJaxConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, n_samples) -> (B, frames, 512)."""
        cfg = self.cfg
        x = wav[..., None]
        for i, (dim, k, stride) in enumerate(self.cfg.conv_feature_layers):
            kernel = self.param(f"conv{i}_kernel",
                                nn.initializers.he_normal(),
                                (k, x.shape[-1], dim))
            y = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(stride,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                precision=_PRECISIONS[cfg.precision])
            if self.cfg.conv_bias:
                y = y + self.param(f"conv{i}_bias", nn.initializers.zeros,
                                   (dim,))
            if self.cfg.extractor_mode == "layer_norm":
                y = nn.LayerNorm(name=f"ln{i}")(y)
            elif i == 0:  # 'default': GroupNorm(dim, dim) on block 0 only
                mean = y.mean(axis=1, keepdims=True)
                var = y.var(axis=1, keepdims=True)
                y = (y - mean) / jnp.sqrt(var + 1e-5)
                y = y * self.param("gn_scale", nn.initializers.ones, (dim,))
                y = y + self.param("gn_bias", nn.initializers.zeros, (dim,))
            x = nn.gelu(y, approximate=False)
        return x


def relative_position_bucket(relative_positions: np.ndarray,
                             num_buckets: int, max_distance: int
                             ) -> np.ndarray:
    """T5 bidirectional bucketing (modules.py:419-444), host precompute."""
    rp = relative_positions.astype(np.int64)
    nb = num_buckets // 2
    buckets = (rp > 0).astype(np.int64) * nb
    rp = np.abs(rp)
    max_exact = nb // 2
    is_small = rp < max_exact
    large = max_exact + (
        np.log(np.maximum(rp, 1).astype(np.float64) / max_exact)
        / math.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return buckets + np.where(is_small, rp, large)


class WavLMAttention(nn.Module):
    cfg: WavLMJaxConfig
    has_bias_table: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 position_bias: Optional[jnp.ndarray]):
        """x: (B, T, D). Returns (out, position_bias (H, T, T))."""
        cfg = self.cfg
        D, H = cfg.encoder_embed_dim, cfg.encoder_attention_heads
        hd = D // H
        B, T, _ = x.shape

        if cfg.relative_position_embedding and position_bias is None:
            assert self.has_bias_table
            table = self.param("rel_bias", nn.initializers.normal(1.0),
                               (cfg.num_buckets, H))
            pos = np.arange(T)
            buckets = relative_position_bucket(
                pos[None, :] - pos[:, None], cfg.num_buckets,
                cfg.max_distance)
            position_bias = table[jnp.asarray(buckets)]     # (T, T, H)
            position_bias = position_bias.transpose(2, 0, 1)  # (H, T, T)

        prec = _PRECISIONS[cfg.precision]
        q = nn.Dense(D, name="q_proj", precision=prec)(x).reshape(B, T, H, hd)
        k = nn.Dense(D, name="k_proj", precision=prec)(x).reshape(B, T, H, hd)
        v = nn.Dense(D, name="v_proj", precision=prec)(x).reshape(B, T, H, hd)

        gate = None
        if position_bias is not None and cfg.gru_rel_pos:
            # gated relative position bias (modules.py:523-533). The
            # gate input is the RAW hidden state split into heads
            # (query.transpose/view in the fast path the reference
            # actually executes), NOT the q_proj output — the two
            # differ by the projection and produce different gates on
            # trained checkpoints.
            q_raw = x.reshape(B, T, H, hd)
            g = nn.Dense(8, name="grep_linear",
                         precision=prec)(q_raw)           # (B,T,H,8)
            g = g.transpose(0, 2, 1, 3)                   # (B,H,T,8)
            g = jax.nn.sigmoid(g.reshape(B, H, T, 2, 4).sum(-1))
            gate_a, gate_b = g[..., 0:1], g[..., 1:2]     # (B,H,T,1)
            grep_a = self.param("grep_a", nn.initializers.ones,
                                (1, H, 1, 1))
            gate = gate_a * (gate_b * grep_a - 1.0) + 2.0  # (B,H,T,1)

        impl = cfg.attn_impl
        if impl == "auto":
            impl = ("flash" if jax.default_backend() == "tpu"
                    and cfg.precision == "default"
                    and position_bias is not None else "xla")

        if impl == "flash" and position_bias is not None:
            # fused online-softmax kernel: no (B, H, T, T) intermediates
            # hit HBM; the bias table streams through once per layer.
            from ..ops.flash_attention import gated_flash_attention
            kd = (jnp.bfloat16 if cfg.precision == "default"
                  else jnp.float32)
            out = gated_flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), position_bias,
                None if gate is None else gate[..., 0],
                sm_scale=hd ** -0.5, kernel_dtype=kd)
            out = out.transpose(0, 2, 1, 3)               # (B,T,H,hd)
        else:
            scores = jnp.einsum("bthd,bshd->bhts", q * (hd ** -0.5), k,
                                precision=prec)
            if position_bias is not None:
                bias = position_bias[None]                # (1, H, T, T)
                if gate is not None:
                    bias = gate * bias                    # (B, H, T, T)
                scores = scores + bias
            attn = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhts,bshd->bthd", attn, v, precision=prec)

        out = nn.Dense(D, name="out_proj",
                       precision=prec)(out.reshape(B, T, D))
        return out, position_bias


class WavLMLayer(nn.Module):
    cfg: WavLMJaxConfig
    has_bias_table: bool

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        attn = WavLMAttention(cfg, self.has_bias_table, name="self_attn")
        prec = _PRECISIONS[cfg.precision]
        if cfg.layer_norm_first:
            h, position_bias = attn(
                nn.LayerNorm(name="self_attn_layer_norm")(x), position_bias)
            x = x + h
            h = nn.LayerNorm(name="final_layer_norm")(x)
            h = nn.gelu(nn.Dense(cfg.encoder_ffn_embed_dim, name="fc1",
                                 precision=prec)(h),
                        approximate=False)
            x = x + nn.Dense(cfg.encoder_embed_dim, name="fc2",
                             precision=prec)(h)
        else:
            h, position_bias = attn(x, position_bias)
            x = nn.LayerNorm(name="self_attn_layer_norm")(x + h)
            h = nn.gelu(nn.Dense(cfg.encoder_ffn_embed_dim, name="fc1",
                                 precision=prec)(x),
                        approximate=False)
            h = nn.Dense(cfg.encoder_embed_dim, name="fc2",
                         precision=prec)(h)
            x = nn.LayerNorm(name="final_layer_norm")(x + h)
        return x, position_bias


class _ScanWavLMLayer(nn.Module):
    """nn.scan-compatible wrapper: carry = x, broadcast position_bias."""
    cfg: WavLMJaxConfig

    @nn.compact
    def __call__(self, x, position_bias):
        x, _ = WavLMLayer(self.cfg, has_bias_table=False,
                          name="layer")(x, position_bias)
        return x, None


class WavLMJax(nn.Module):
    cfg: WavLMJaxConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray,
                 output_layer: Optional[int] = None) -> jnp.ndarray:
        """(B, n_samples) raw 16 kHz wav -> (B, frames, D) features
        (extract_features, WavLM.py:323-376)."""
        cfg = self.cfg
        if cfg.normalize:
            mean = wav.mean(axis=-1, keepdims=True)
            var = wav.var(axis=-1, keepdims=True)
            wav = (wav - mean) / jnp.sqrt(var + 1e-5)
        feats = ConvFeatureExtractor(cfg, name="feature_extractor")(wav)
        feats = nn.LayerNorm(name="feat_layer_norm")(feats)
        if feats.shape[-1] != cfg.encoder_embed_dim:
            feats = nn.Dense(cfg.encoder_embed_dim,
                             name="post_extract_proj",
                             precision=_PRECISIONS[cfg.precision])(feats)

        # conv positional embedding: grouped conv + SamePad trim + GELU
        k, groups = cfg.conv_pos, cfg.conv_pos_groups
        D = cfg.encoder_embed_dim
        pos_kernel = self.param("pos_conv_kernel",
                                nn.initializers.normal(0.02),
                                (k, D // groups, D))
        pos_bias_p = self.param("pos_conv_bias", nn.initializers.zeros, (D,))
        x_conv = jax.lax.conv_general_dilated(
            feats, pos_kernel, window_strides=(1,),
            padding=((k // 2, k // 2),), feature_group_count=groups,
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=_PRECISIONS[cfg.precision]) + pos_bias_p
        if k % 2 == 0:  # SamePad: drop the trailing element
            x_conv = x_conv[:, :-1]
        x = feats + nn.gelu(x_conv, approximate=False)
        if not cfg.layer_norm_first:
            x = nn.LayerNorm(name="encoder_layer_norm")(x)

        position_bias = None
        if cfg.scan_layers and output_layer is None:
            x, position_bias = WavLMLayer(cfg, has_bias_table=True,
                                          name="layer0")(x, position_bias)
            if cfg.encoder_layers > 1:
                scan = nn.scan(
                    _ScanWavLMLayer,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    in_axes=nn.broadcast,
                    length=cfg.encoder_layers - 1)
                x, _ = scan(cfg, name="layers_scan")(x, position_bias)
        else:
            n_layers = cfg.encoder_layers if output_layer is None \
                else output_layer
            for i in range(cfg.encoder_layers):
                if i >= n_layers:
                    break
                x, position_bias = WavLMLayer(
                    cfg, has_bias_table=(i == 0), name=f"layer{i}")(
                        x, position_bias)
        if cfg.layer_norm_first and output_layer is None:
            x = nn.LayerNorm(name="encoder_layer_norm")(x)
        return x


# ---- torch checkpoint conversion ----------------------------------------

def convert_wavlm(state_dict: dict, cfg: WavLMJaxConfig) -> dict:
    """Reference/Microsoft WavLM state_dict -> flax params."""
    from .torch_convert import _np

    def dense(key):
        return {"kernel": _np(state_dict[f"{key}.weight"]).T,
                "bias": _np(state_dict[f"{key}.bias"])}

    def ln(key):
        return {"scale": _np(state_dict[f"{key}.weight"]),
                "bias": _np(state_dict[f"{key}.bias"])}

    params: dict = {}
    fe: dict = {}
    for i in range(len(cfg.conv_feature_layers)):
        w = _np(state_dict[f"feature_extractor.conv_layers.{i}.0.weight"])
        fe[f"conv{i}_kernel"] = np.ascontiguousarray(w.transpose(2, 1, 0))
        bkey = f"feature_extractor.conv_layers.{i}.0.bias"
        if bkey in state_dict:
            fe[f"conv{i}_bias"] = _np(state_dict[bkey])
        if cfg.extractor_mode == "layer_norm":
            lnw = state_dict[f"feature_extractor.conv_layers.{i}.2.1.weight"]
            lnb = state_dict[f"feature_extractor.conv_layers.{i}.2.1.bias"]
            fe[f"ln{i}"] = {"scale": _np(lnw), "bias": _np(lnb)}
        elif i == 0:
            fe["gn_scale"] = _np(
                state_dict["feature_extractor.conv_layers.0.2.weight"])
            fe["gn_bias"] = _np(
                state_dict["feature_extractor.conv_layers.0.2.bias"])
    params["feature_extractor"] = fe
    params["feat_layer_norm"] = ln("layer_norm")
    if "post_extract_proj.weight" in state_dict:
        params["post_extract_proj"] = dense("post_extract_proj")

    # weight-normed positional conv: weight = g * v / ||v|| along dim=2
    g = _np(state_dict["encoder.pos_conv.0.weight_g"])
    v = _np(state_dict["encoder.pos_conv.0.weight_v"])  # (D, D/g, k)
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g / norm * v if g.ndim == 3 else (g / norm) * v
    params["pos_conv_kernel"] = np.ascontiguousarray(w.transpose(2, 1, 0))
    params["pos_conv_bias"] = _np(state_dict["encoder.pos_conv.0.bias"])
    params["encoder_layer_norm"] = ln("encoder.layer_norm")

    layers = []
    for i in range(cfg.encoder_layers):
        base = f"encoder.layers.{i}"
        layer = {
            "self_attn": {
                "q_proj": dense(f"{base}.self_attn.q_proj"),
                "k_proj": dense(f"{base}.self_attn.k_proj"),
                "v_proj": dense(f"{base}.self_attn.v_proj"),
                "out_proj": dense(f"{base}.self_attn.out_proj"),
            },
            "self_attn_layer_norm": ln(f"{base}.self_attn_layer_norm"),
            "final_layer_norm": ln(f"{base}.final_layer_norm"),
            "fc1": dense(f"{base}.fc1"),
            "fc2": dense(f"{base}.fc2"),
        }
        if cfg.gru_rel_pos:
            layer["self_attn"]["grep_linear"] = dense(
                f"{base}.self_attn.grep_linear")
            layer["self_attn"]["grep_a"] = _np(
                state_dict[f"{base}.self_attn.grep_a"])
        if i == 0 and cfg.relative_position_embedding:
            layer["self_attn"]["rel_bias"] = _np(
                state_dict[f"{base}.self_attn.relative_attention_bias"
                           ".weight"])
        layers.append(layer)

    if cfg.scan_layers:
        import jax as _jax
        params["layer0"] = layers[0]
        if len(layers) > 1:
            params["layers_scan"] = {"layer": _jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *layers[1:])}
    else:
        for i, layer in enumerate(layers):
            params[f"layer{i}"] = layer
    return {"params": params}


def load_wavlm_checkpoint(path: str):
    """Load a published WavLM .pt checkpoint: returns (model, variables)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    raw_cfg = ckpt.get("cfg", {})
    cfg = WavLMJaxConfig(
        encoder_layers=raw_cfg.get("encoder_layers", 24),
        encoder_embed_dim=raw_cfg.get("encoder_embed_dim", 1024),
        encoder_ffn_embed_dim=raw_cfg.get("encoder_ffn_embed_dim", 4096),
        encoder_attention_heads=raw_cfg.get("encoder_attention_heads", 16),
        extractor_mode=raw_cfg.get("extractor_mode", "layer_norm"),
        conv_bias=raw_cfg.get("conv_bias", True),
        layer_norm_first=raw_cfg.get("layer_norm_first", True),
        normalize=raw_cfg.get("normalize", True),
        relative_position_embedding=raw_cfg.get(
            "relative_position_embedding", True),
        num_buckets=raw_cfg.get("num_buckets", 320),
        max_distance=raw_cfg.get("max_distance", 800),
        gru_rel_pos=raw_cfg.get("gru_rel_pos", True))
    model = WavLMJax(cfg)
    variables = convert_wavlm(ckpt["model"], cfg)
    return model, variables
