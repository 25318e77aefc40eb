"""Torch checkpoint -> flax parameter conversion.

Converts the reference's saved state_dicts (torch.save({'model_dict': ...}),
train.py:114-116) into this framework's parameter pytrees, so the published
pretrained VQ-VAE / PAE checkpoints decode here without retraining.

Layout facts encoded below (from the reference module trees):
  * Conv1d weight (out, in, k) -> flax nn.Conv kernel (k, in, out);
  * ConvTranspose1d weight (in, out, k) -> our ConvTranspose1dTorch kernel
    (k, in, out) flipped along k (see encdec.ConvTranspose1dTorch);
  * encoder blocks live at encoders.0.level_blocks.0.model.{i} where
    i < down_t is Sequential(Conv1d, Resnet1D) and i == down_t is the
    projection conv (encdec.py:17-27);
  * decoder blocks at decoders.0.level_blocks.0.model.{i}: i == 0 is the
    projection conv, i >= 1 is Sequential(Resnet1D, ConvTranspose1d), plus
    decoders.0.out (encdec.py:37-48,113);
  * ResConv1DBlock convs sit at .model.1 / .model.3 inside each depth
    (resnet.py:31-38); the decoder's reversed-dilation list is reversed at
    module level (resnet.py:61-62) so indices map 1:1;
  * the EMA codebook buffer is bottleneck.level_blocks.0.k
    (bottleneck.py:28).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..core.config import VQVAEConfig
from .bottleneck import CodebookState


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def strip_prefix(state_dict: Dict, prefix: str = "module.") -> Dict:
    """Remove nn.DataParallel's 'module.' wrapper prefix."""
    return {k[len(prefix):] if k.startswith(prefix) else k: v
            for k, v in state_dict.items()}


def conv1d(state_dict: Dict, key: str) -> Dict:
    w = _np(state_dict[f"{key}.weight"])  # (out, in, k)
    return {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
            "bias": _np(state_dict[f"{key}.bias"])}


def conv_transpose1d(state_dict: Dict, key: str) -> Dict:
    w = _np(state_dict[f"{key}.weight"])  # (in, out, k)
    kernel = np.ascontiguousarray(w.transpose(2, 0, 1)[::-1])
    return {"kernel": kernel, "bias": _np(state_dict[f"{key}.bias"])}


def _resnet(state_dict: Dict, key: str, depth: int) -> Dict:
    out = {}
    for d in range(depth):
        out[f"block{d}"] = {
            "conv1": conv1d(state_dict, f"{key}.model.{d}.model.1"),
            "conv2": conv1d(state_dict, f"{key}.model.{d}.model.3"),
        }
    return out


def convert_vqvae(state_dict: Dict, cfg: VQVAEConfig
                  ) -> Tuple[Dict, CodebookState]:
    """state_dict: the reference VQVAE's model_dict (optionally with the
    DataParallel 'module.' prefix). Returns (params, codebook_state)."""
    sd = strip_prefix(state_dict)
    down_t = cfg.downs_t[0]
    depth = cfg.depth * cfg.hvqvae_multipliers[0]

    enc_base = "encoders.0.level_blocks.0"
    enc_level = {}
    for i in range(down_t):
        enc_level[f"down{i}_conv"] = conv1d(sd, f"{enc_base}.model.{i}.0")
        enc_level[f"down{i}_resnet"] = _resnet(
            sd, f"{enc_base}.model.{i}.1", depth)
    enc_level["proj"] = conv1d(sd, f"{enc_base}.model.{down_t}")

    dec_base = "decoders.0.level_blocks.0"
    dec_level = {"proj": conv1d(sd, f"{dec_base}.model.0")}
    for i in range(down_t):
        dec_level[f"up{i}_resnet"] = _resnet(
            sd, f"{dec_base}.model.{i + 1}.0", depth)
        dec_level[f"up{i}_convt"] = conv_transpose1d(
            sd, f"{dec_base}.model.{i + 1}.1")

    params = {
        "encoder": {"level0": enc_level},
        "decoder": {"level0": dec_level,
                    "out": conv1d(sd, "decoders.0.out")},
    }

    k = _np(sd["bottleneck.level_blocks.0.k"]).astype(np.float32)
    # restore_k semantics (bottleneck.py:51-61): resume EMA stats from k.
    cb = CodebookState(k=k, k_sum=k.copy(),
                       k_elem=np.ones((k.shape[0],), np.float32))
    return params, cb


def _batchnorm(state_dict: Dict, key: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(state_dict[f"{key}.weight"]),
              "bias": _np(state_dict[f"{key}.bias"])}
    stats = {"mean": _np(state_dict[f"{key}.running_mean"]),
             "var": _np(state_dict[f"{key}.running_var"])}
    return params, stats


def _dense(state_dict: Dict, key: str) -> Dict:
    w = _np(state_dict[f"{key}.weight"])  # (out, in)
    return {"kernel": np.ascontiguousarray(w.T),
            "bias": _np(state_dict[f"{key}.bias"])}


def convert_pae(state_dict: Dict, phase_channels: int = 8) -> Dict:
    """Reference PAE state_dict (PAE.py:50-96 layer names) -> flax variables
    {'params': ..., 'batch_stats': ...}."""
    sd = strip_prefix(state_dict)
    params: Dict = {}
    stats: Dict = {}
    for name in ("conv1", "conv2", "deconv1", "deconv2"):
        params[name] = conv1d(sd, name)
    for name in ("bn_conv1", "bn_conv2", "bn_deconv1"):
        p, s = _batchnorm(sd, name)
        params[name], stats[name] = p, s
    for i in range(phase_channels):
        params[f"fc{i}"] = _dense(sd, f"fc.{i}")
        p, s = _batchnorm(sd, f"bn.{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = p, s
    return {"params": params, "batch_stats": stats}


def _torch_load_reference(path: str):
    """torch.load for reference checkpoints, tolerant of the pickled
    EasyDict config. The reference saves {'args': EasyDict, 'epoch',
    'model_dict'} (train.py:114-116); unpickling the args requires the
    easydict package, which a converting user may not have — synthesize an
    equivalent shim module so the load succeeds regardless."""
    import torch
    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    except ModuleNotFoundError as e:
        if "easydict" not in str(e):
            raise
        import sys
        import types

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

        mod = types.ModuleType("easydict")
        mod.EasyDict = EasyDict
        sys.modules["easydict"] = mod
        try:
            return torch.load(path, map_location="cpu", weights_only=False)
        finally:
            sys.modules.pop("easydict", None)


def load_pae_checkpoint(path: str, phase_channels: int = 8):
    ckpt = _torch_load_reference(path)
    sd = ckpt["model_dict"] if "model_dict" in ckpt else ckpt
    return convert_pae(sd, phase_channels)


def convert_generator_gru(state_dict: Dict, hidden: int = 200,
                          layers: int = 2) -> Dict:
    """Reference Generator_gru state_dict (generate.py:312-350) -> flax
    variables for models.gru_baseline.GeneratorGRU: WavEncoder convs + BN,
    the 2-layer bidirectional GRU, LayerNorm, output Dense."""
    sd = strip_prefix(state_dict)
    params: Dict = {}
    stats: Dict = {}

    # WavEncoder: Sequential indices 0,3,6,9 = convs, 1,4,7,10 = BN,
    # final conv at 12 (generate.py:12-26)
    enc_p: Dict = {}
    enc_s: Dict = {}
    conv_idx = [0, 3, 6, 9]
    for i, k in enumerate(conv_idx):
        enc_p[f"conv{i}"] = conv1d(sd, f"WavEncoder.feat_extractor.{k}")
        p, st = _batchnorm(sd, f"WavEncoder.feat_extractor.{k + 1}")
        enc_p[f"bn{i}"], enc_s[f"bn{i}"] = p, st
    enc_p["conv4"] = conv1d(sd, "WavEncoder.feat_extractor.12")
    params["wav_encoder"] = enc_p
    stats["wav_encoder"] = enc_s

    # torch GRU: weight_ih_l{n}[_reverse] (3H, in), biases (3H,)
    for layer in range(layers):
        for direction, suffix in (("f", ""), ("b", "_reverse")):
            base = f"project.weight_ih_l{layer}{suffix}"
            params[f"gru{layer}_{direction}"] = {
                "w_ih": _np(sd[base]).T,
                "w_hh": _np(sd[f"project.weight_hh_l{layer}{suffix}"]).T,
                "b_ih": _np(sd[f"project.bias_ih_l{layer}{suffix}"]),
                "b_hh": _np(sd[f"project.bias_hh_l{layer}{suffix}"]),
            }
    params["norm"] = {"scale": _np(sd["norm.weight"]),
                      "bias": _np(sd["norm.bias"])}
    params["out"] = _dense(sd, "out")
    return {"params": params, "batch_stats": stats}


def convert_generator_linear(state_dict: Dict) -> Dict:
    """Reference Generator_linear state_dict (generate.py:34-60) -> flax
    variables for models.gru_baseline.GeneratorLinear: WavEncoder convs +
    BN, LayerNorm(32), bias-free projection Linear(32, 512)."""
    sd = strip_prefix(state_dict)
    enc_p: Dict = {}
    enc_s: Dict = {}
    for i, k in enumerate([0, 3, 6, 9]):
        enc_p[f"conv{i}"] = conv1d(sd, f"WavEncoder.feat_extractor.{k}")
        p, st = _batchnorm(sd, f"WavEncoder.feat_extractor.{k + 1}")
        enc_p[f"bn{i}"], enc_s[f"bn{i}"] = p, st
    enc_p["conv4"] = conv1d(sd, "WavEncoder.feat_extractor.12")
    params = {
        "wav_encoder": enc_p,
        "norm": {"scale": _np(sd["norm.weight"]),
                 "bias": _np(sd["norm.bias"])},
        "project": {"kernel": _np(sd["project.weight"]).T},
    }
    return {"params": params, "batch_stats": {"wav_encoder": enc_s}}


def load_generator_gru_checkpoint(path: str):
    ckpt = _torch_load_reference(path)
    sd = ckpt["model_dict"] if "model_dict" in ckpt else ckpt
    return convert_generator_gru(sd)


def load_vqvae_checkpoint(path: str, cfg: VQVAEConfig):
    """Load a reference .bin checkpoint (torch pickle) and convert."""
    ckpt = _torch_load_reference(path)
    sd = ckpt["model_dict"] if "model_dict" in ckpt else ckpt
    return convert_vqvae(sd, cfg)


def _torch_gru_layer(sd: Dict, prefix: str, layer: int,
                     suffix: str = "") -> Dict:
    """One torch nn.GRU layer[/direction] -> TorchGRUCell params."""
    return {
        "w_ih": np.ascontiguousarray(
            _np(sd[f"{prefix}.weight_ih_l{layer}{suffix}"]).T),
        "w_hh": np.ascontiguousarray(
            _np(sd[f"{prefix}.weight_hh_l{layer}{suffix}"]).T),
        "b_ih": _np(sd[f"{prefix}.bias_ih_l{layer}{suffix}"]),
        "b_hh": _np(sd[f"{prefix}.bias_hh_l{layer}{suffix}"]),
    }


def convert_seq2seq(state_dict: Dict, n_layers: int = 1) -> Dict:
    """Reference Seq2SeqNet state_dict (generate.py:275-309) -> flax
    variables for models.seq2seq.Seq2SeqNet: the EncoderRNN embedding +
    bidirectional GRU stack, the Bahdanau attention (W, v), the decoder's
    pre_linear Dense + BatchNorm1d, GRU stack, output Dense, and the
    optional discrete/speaker embeddings when present."""
    sd = strip_prefix(state_dict)

    enc: Dict = {"embedding": {"embedding": _np(sd["encoder.embedding.weight"])}}
    for layer in range(n_layers):
        enc[f"gru{layer}_f"] = _torch_gru_layer(sd, "encoder.gru", layer)
        enc[f"gru{layer}_b"] = _torch_gru_layer(sd, "encoder.gru", layer,
                                                "_reverse")

    dkey = "decoder.decoder"
    bn_p, bn_s = _batchnorm(sd, f"{dkey}.pre_linear.1")
    dec: Dict = {
        "pre_linear": _dense(sd, f"{dkey}.pre_linear.0"),
        "pre_bn": bn_p,
        "attn": {"attn": _dense(sd, f"{dkey}.attn.attn"),
                 "v": _np(sd[f"{dkey}.attn.v"])},
        "out": _dense(sd, f"{dkey}.out"),
    }
    for layer in range(n_layers):
        dec[f"gru{layer}"] = _torch_gru_layer(sd, f"{dkey}.gru", layer)
    if f"{dkey}.embedding.weight" in sd:
        dec["embedding"] = {"embedding": _np(sd[f"{dkey}.embedding.weight"])}
    if f"{dkey}.speaker_embedding.weight" in sd:
        dec["speaker_embedding"] = {
            "embedding": _np(sd[f"{dkey}.speaker_embedding.weight"])}

    return {"params": {"encoder": enc, "decoder": dec},
            "batch_stats": {"decoder": {"pre_bn": bn_s}}}


def convert_resync(state_dict: Dict) -> Dict:
    """Reference ResyncNet state_dict (Speech2GestureMatching/model.py:
    50-93; saved under 'model_resync_state_dict',
    train_resync_gestureknn.py:119-128) -> flax variables for
    models.resync.ResyncNet. Each double_conv Sequential holds Conv1d at
    .0/.3 and BatchNorm1d at .1/.4 (model.py:20-29); the UNet blocks map
    dconv_down{1..4} -> down{1..4}, dconv_up{3,2,1} -> up{3,2,1}, and
    conv_last -> last."""
    sd = strip_prefix(state_dict)
    params: Dict = {}
    stats: Dict = {}
    blocks = [(f"dconv_down{i}", f"down{i}") for i in (1, 2, 3, 4)]
    blocks += [(f"dconv_up{i}", f"up{i}") for i in (3, 2, 1)]
    for tkey, fkey in blocks:
        p: Dict = {}
        s: Dict = {}
        for i, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4))):
            p[f"conv{i}"] = conv1d(sd, f"{tkey}.{conv_idx}")
            bp, bs = _batchnorm(sd, f"{tkey}.{bn_idx}")
            p[f"norm{i}"], s[f"norm{i}"] = bp, bs
        params[fkey], stats[fkey] = p, s
    params["last"] = conv1d(sd, "conv_last")
    return {"params": params, "batch_stats": stats}


def load_resync_checkpoint(path: str):
    """Load a reference resync checkpoint ({'model_resync_state_dict'},
    train_resync_gestureknn.save_model) or a bare state_dict and
    convert."""
    ckpt = _torch_load_reference(path)
    sd = ckpt.get("model_resync_state_dict", ckpt) if isinstance(
        ckpt, dict) else ckpt
    return convert_resync(sd)
