"""vq-wav2vec audio code extraction (JAX inference port).

The reference extracts the 2-group x 320-vocab Gumbel code indices with
fairseq's vq-wav2vec (`model.feature_extractor` +
`model.vector_quantizer.forward_idx`, make_test_data.py:43-57,
make_beat_dataset.py:388-429): a 4 s window (64000 samples) becomes
(398, 2) int codes — the strings the Levenshtein matcher compares.

Architecture (wav2vec v1 feature extractor + Gumbel VQ, Baevski et al.
2019; fairseq layer names preserved in the converter):
  * conv stack [(512,10,5), (512,8,4), (512,4,2), (512,4,2), (512,4,2)]:
    Conv1d(bias=False) -> GroupNorm(1 group, affine) -> activation, with
    optional skip connections and log compression log(1+|x|);
  * GumbelVectorQuantizer: a weight projection (linear, or an MLP when the
    checkpoint was trained with weight_proj_depth > 1) to groups*num_vars
    logits; inference codes are the per-group argmax.

Fidelity: fairseq is not installed in this image and the public
vq-wav2vec.pt is not vendored, so the port is output-verified against a
plain-torch transcription of the published fairseq inference graph
(tests/test_vq_wav2vec.py: random weights loaded strict=True into the
oracle — which pins the state-dict key layout — then layer-by-layer and
end-to-end code equality on a 64000-sample window). The matching engine
also accepts precomputed wavvq features as the escape hatch (SURVEY §2.9).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class VQWav2VecConfig:
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2), (512, 4, 2))
    activation: str = "gelu"        # vq-wav2vec default
    log_compression: bool = True
    skip_connections: bool = False
    residual_scale: float = 0.5
    groups: int = 2
    num_vars: int = 320
    weight_proj_depth: int = 1
    weight_proj_factor: int = 2


def _act(name: str):
    # torch nn.GELU() is the exact erf form; jax defaults to tanh-approx
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    return nn.relu


class VQW2VFeatureExtractor(nn.Module):
    cfg: VQWav2VecConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, n_samples) -> (B, frames, 512). 64000 -> 398 frames."""
        cfg = self.cfg
        act = _act(cfg.activation)
        x = wav[..., None]
        for i, (dim, k, stride) in enumerate(cfg.conv_layers):
            residual = x
            kernel = self.param(f"conv{i}_kernel",
                                nn.initializers.he_normal(),
                                (k, x.shape[-1], dim))
            x = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(stride,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                precision=jax.lax.Precision.HIGHEST)
            # Fp32GroupNorm(1, dim, affine): normalize over (T, C) per sample
            mean = x.mean(axis=(1, 2), keepdims=True)
            var = x.var(axis=(1, 2), keepdims=True)
            x = (x - mean) / jnp.sqrt(var + 1e-5)
            x = x * self.param(f"gn{i}_scale", nn.initializers.ones, (dim,))
            x = x + self.param(f"gn{i}_bias", nn.initializers.zeros, (dim,))
            x = act(x)
            if cfg.skip_connections and residual.shape[-1] == dim:
                t = x.shape[1]
                r = residual[:, ::residual.shape[1] // t][:, :t]
                x = (x + r) * cfg.residual_scale
            self.sow("intermediates", f"conv{i}", x)
        if cfg.log_compression:
            x = jnp.log1p(jnp.abs(x))
        return x


class GumbelCodebook(nn.Module):
    """Inference path of fairseq's GumbelVectorQuantizer: logits argmax."""
    cfg: VQWav2VecConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, T, 512) -> (B, T, groups) int32 codes (forward_idx)."""
        cfg = self.cfg
        out_dim = cfg.groups * cfg.num_vars
        # full f32 matmuls: on TPU the MXU's default bf16 precision perturbs
        # logits enough to flip near-tie argmaxes (~0.8% of code slots on a
        # real chip) — and the codes ARE the output contract
        hi = jax.lax.Precision.HIGHEST
        h = z
        if cfg.weight_proj_depth > 1:
            # fairseq: inner_dim = input_dim * weight_proj_factor
            # (GumbelVectorQuantizer with weight_proj_factor=2 -> 1024)
            inner = cfg.weight_proj_factor * z.shape[-1]
            for d in range(cfg.weight_proj_depth - 1):
                h = _act(cfg.activation)(
                    nn.Dense(inner, name=f"proj{d}", precision=hi)(h))
            logits = nn.Dense(out_dim, name="proj_out", precision=hi)(h)
        else:
            logits = nn.Dense(out_dim, name="proj_out", precision=hi)(h)
        self.sow("intermediates", "logits", logits)
        logits = logits.reshape(z.shape[0], z.shape[1], cfg.groups,
                                cfg.num_vars)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)


class VQWav2Vec(nn.Module):
    cfg: VQWav2VecConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, 64000) -> (B, 398, 2) codes — the wavvq_240.npz schema."""
        z = VQW2VFeatureExtractor(self.cfg, name="feature_extractor")(wav)
        return GumbelCodebook(self.cfg, name="vector_quantizer")(z)


def convert_vq_wav2vec(state_dict: dict, cfg: Optional[VQWav2VecConfig] = None
                       ) -> Tuple[VQWav2VecConfig, dict]:
    """fairseq vq-wav2vec state_dict -> (config, flax variables). The
    weight_proj depth is inferred from the checkpoint's keys."""
    from .torch_convert import _np

    # fairseq key layouts for vector_quantizer.weight_proj:
    #   depth == 1:  nn.Linear                    -> weight_proj.{weight,bias}
    #   depth  > 1:  nn.Sequential of (depth-1) x Sequential(Linear, act)
    #                blocks plus a final Linear   -> weight_proj.{i}.0.weight
    #                for blocks, weight_proj.{depth-1}.weight for the last
    if "vector_quantizer.weight_proj.weight" in state_dict:
        depth = 1
    else:
        depth = len({int(k.split(".")[2]) for k in state_dict
                     if k.startswith("vector_quantizer.weight_proj.")
                     and k.split(".")[2].isdigit()})
    cfg = cfg or VQWav2VecConfig(weight_proj_depth=max(depth, 1))

    fe: dict = {}
    for i in range(len(cfg.conv_layers)):
        base = f"feature_extractor.conv_layers.{i}"
        w = _np(state_dict[f"{base}.0.weight"])   # (out, in, k)
        fe[f"conv{i}_kernel"] = np.ascontiguousarray(w.transpose(2, 1, 0))
        fe[f"gn{i}_scale"] = _np(state_dict[f"{base}.2.weight"]).reshape(-1)
        fe[f"gn{i}_bias"] = _np(state_dict[f"{base}.2.bias"]).reshape(-1)

    vq: dict = {}

    def _linear(prefix):
        return {"kernel": _np(state_dict[prefix + ".weight"]).T,
                "bias": _np(state_dict[prefix + ".bias"])}

    if cfg.weight_proj_depth > 1:
        # Decide the layout ONCE: nested (fairseq: Sequential of
        # Sequential(Linear, act) blocks + final Linear -> '.{d}.0.weight'
        # exists for block 0) vs flat (Sequential(Linear, act, Linear, ...)
        # -> Linear params at even indices). A per-key presence check would
        # collide at depth >= 3: flat '.{depth-1}.weight' is a MIDDLE
        # Linear, not the output projection.
        nested = "vector_quantizer.weight_proj.0.0.weight" in state_dict
        for d in range(cfg.weight_proj_depth - 1):
            vq[f"proj{d}"] = _linear(
                f"vector_quantizer.weight_proj.{d}.0" if nested
                else f"vector_quantizer.weight_proj.{2 * d}")
        last = cfg.weight_proj_depth - 1
        vq["proj_out"] = _linear(
            f"vector_quantizer.weight_proj.{last}" if nested
            else f"vector_quantizer.weight_proj.{2 * last}")
    else:
        vq["proj_out"] = _linear("vector_quantizer.weight_proj")

    return cfg, {"params": {"feature_extractor": fe,
                            "vector_quantizer": vq}}


def load_vq_wav2vec_checkpoint(path: str):
    """Load a fairseq vq-wav2vec.pt checkpoint (torch pickle with
    state under 'model')."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    cfg, variables = convert_vq_wav2vec(sd)
    return VQWav2Vec(cfg), variables
