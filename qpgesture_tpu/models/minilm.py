"""MiniLM sentence encoder (JAX port, inference path).

The reference embeds per-slot context text with sentence-transformers
`paraphrase-MiniLM-L6-v2` (make_beat_dataset.py:446-447) — a 6-layer
384-wide BERT encoder followed by attention-mask mean pooling (the
paraphrase-* family has no output normalization).  This module is a
from-scratch flax implementation of that stack so context embeddings run
on device like the WavLM / vq-wav2vec featurizers:

  * BertEmbeddings: word + learned absolute position + token-type
    embeddings, LayerNorm(eps 1e-12);
  * post-LN transformer layers: self-attention (additive key mask),
    attention-output LayerNorm, GELU(erf) FFN, output LayerNorm;
  * mean pooling over the attention mask (SentenceTransformer's
    Pooling(mean) module).

A host-side WordPiece tokenizer (`WordPieceTokenizer`) reproduces the
HF BertTokenizer (basic tokenizer + greedy longest-match WordPiece) so
the whole text path needs no torch/transformers at serve time.  Weights
convert from the published torch checkpoint via convert_minilm().
"""
from __future__ import annotations

import json
import os
import unicodedata
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .encdec import PRECISIONS as _PRECISIONS


@dataclass(frozen=True)
class MiniLMConfig:
    """paraphrase-MiniLM-L6-v2 defaults (BERT-architecture encoder)."""
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    max_seq_length: int = 128       # sentence-transformers truncation
    precision: str = "highest"


class BertSelfAttention(nn.Module):
    cfg: MiniLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, D); mask: (B, T) 1=real token."""
        cfg = self.cfg
        D, H = cfg.hidden_size, cfg.num_heads
        hd = D // H
        B, T, _ = x.shape
        q = nn.Dense(D, name="query")(x).reshape(B, T, H, hd)
        k = nn.Dense(D, name="key")(x).reshape(B, T, H, hd)
        v = nn.Dense(D, name="value")(x).reshape(B, T, H, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q * (hd ** -0.5), k,
                            precision=_PRECISIONS[cfg.precision])
        # additive key mask (get_extended_attention_mask): masked keys get
        # a huge negative bias; every query row keeps >=1 live key ([CLS])
        neg = jnp.asarray(-1e9, scores.dtype)
        scores = scores + jnp.where(mask[:, None, None, :] > 0, 0.0, neg)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", attn, v,
                         precision=_PRECISIONS[cfg.precision])
        return out.reshape(B, T, D)


class BertLayer(nn.Module):
    cfg: MiniLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = BertSelfAttention(cfg, name="self_attn")(x, mask)
        h = nn.Dense(cfg.hidden_size, name="attn_output")(h)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_ln")(x + h)
        h = nn.Dense(cfg.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)   # BERT gelu = erf-based
        h = nn.Dense(cfg.hidden_size, name="output")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="output_ln")(x + h)


class MiniLMJax(nn.Module):
    """BERT encoder; returns the last hidden state (B, T, D)."""
    cfg: MiniLMConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray,
                 token_type_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        B, T = input_ids.shape
        word = self.param("word_embeddings", nn.initializers.normal(0.02),
                          (cfg.vocab_size, cfg.hidden_size))
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size))
        typ = self.param("token_type_embeddings",
                         nn.initializers.normal(0.02),
                         (cfg.type_vocab_size, cfg.hidden_size))
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = word[input_ids] + pos[jnp.arange(T)][None] + typ[token_type_ids]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embed_ln")(x)
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"layer{i}")(x, attention_mask)
        return x


def mean_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray
              ) -> jnp.ndarray:
    """SentenceTransformer Pooling(mean): (B, T, D), (B, T) -> (B, D)."""
    m = attention_mask[..., None].astype(hidden.dtype)
    return (hidden * m).sum(axis=1) / jnp.clip(m.sum(axis=1), 1e-9, None)


# ---- torch checkpoint conversion -----------------------------------------

def convert_minilm(state_dict: dict, cfg: MiniLMConfig) -> dict:
    """HF BertModel state_dict -> flax params.

    Accepts both bare BertModel keys (`embeddings.…`) and the
    sentence-transformers layout (`0.auto_model.embeddings.…`)."""
    from .torch_convert import _np

    sd = {}
    for k, v in state_dict.items():
        k = k.replace("0.auto_model.", "").replace("bert.", "", 1) \
             if k.startswith(("0.auto_model.", "bert.")) else k
        sd[k] = v

    def dense(key):
        return {"kernel": _np(sd[f"{key}.weight"]).T,
                "bias": _np(sd[f"{key}.bias"])}

    def ln(key):
        return {"scale": _np(sd[f"{key}.weight"]),
                "bias": _np(sd[f"{key}.bias"])}

    params: dict = {
        "word_embeddings": _np(sd["embeddings.word_embeddings.weight"]),
        "position_embeddings": _np(
            sd["embeddings.position_embeddings.weight"]),
        "token_type_embeddings": _np(
            sd["embeddings.token_type_embeddings.weight"]),
        "embed_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        base = f"encoder.layer.{i}"
        params[f"layer{i}"] = {
            "self_attn": {
                "query": dense(f"{base}.attention.self.query"),
                "key": dense(f"{base}.attention.self.key"),
                "value": dense(f"{base}.attention.self.value"),
            },
            "attn_output": dense(f"{base}.attention.output.dense"),
            "attn_ln": ln(f"{base}.attention.output.LayerNorm"),
            "intermediate": dense(f"{base}.intermediate.dense"),
            "output": dense(f"{base}.output.dense"),
            "output_ln": ln(f"{base}.output.LayerNorm"),
        }
    return {"params": params}


# ---- WordPiece tokenizer (host) -------------------------------------------

def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96
            or 123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_cjk(cp: int) -> bool:
    return (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
            or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
            or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
            or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F)


class WordPieceTokenizer:
    """HF BertTokenizer semantics: basic tokenizer (clean, CJK spacing,
    lowercase + accent strip, punctuation split) + greedy longest-match
    WordPiece with '##' continuations."""

    def __init__(self, vocab: Dict[str, int], do_lower_case: bool = True,
                 unk_token: str = "[UNK]", cls_token: str = "[CLS]",
                 sep_token: str = "[SEP]", pad_token: str = "[PAD]",
                 max_input_chars_per_word: int = 100):
        self.vocab = vocab
        self.do_lower_case = do_lower_case
        self.unk_token = unk_token
        self.cls_id = vocab[cls_token]
        self.sep_id = vocab[sep_token]
        self.pad_id = vocab[pad_token]
        self.unk_id = vocab[unk_token]
        self.max_input_chars_per_word = max_input_chars_per_word

    @classmethod
    def from_vocab_file(cls, path: str, **kw) -> "WordPieceTokenizer":
        vocab: Dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab, **kw)

    # -- basic tokenizer ----------------------------------------------------
    def _clean(self, text: str) -> str:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            out.append(" " if _is_whitespace(ch) else ch)
        return "".join(out)

    def _basic_tokenize(self, text: str) -> List[str]:
        text = self._clean(text)
        text = "".join(f" {ch} " if _is_cjk(ord(ch)) else ch for ch in text)
        tokens: List[str] = []
        for tok in text.split():
            if self.do_lower_case:
                tok = tok.lower()
                tok = "".join(ch for ch in unicodedata.normalize("NFD", tok)
                              if unicodedata.category(ch) != "Mn")
            # split on punctuation
            cur: List[str] = []
            for ch in tok:
                if _is_punctuation(ch):
                    if cur:
                        tokens.append("".join(cur))
                        cur = []
                    tokens.append(ch)
                else:
                    cur.append(ch)
            if cur:
                tokens.append("".join(cur))
        return tokens

    # -- wordpiece ------------------------------------------------------------
    def _wordpiece(self, token: str) -> List[str]:
        if len(token) > self.max_input_chars_per_word:
            return [self.unk_token]
        pieces: List[str] = []
        start = 0
        while start < len(token):
            end = len(token)
            cur = None
            while start < end:
                sub = token[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> List[str]:
        return [p for t in self._basic_tokenize(text)
                for p in self._wordpiece(t)]

    def encode(self, text: str, max_length: int) -> List[int]:
        """[CLS] ids [SEP], truncated to max_length."""
        ids = [self.vocab[p] for p in self.tokenize(text)]
        return [self.cls_id] + ids[:max_length - 2] + [self.sep_id]


# ---- serving encoder -------------------------------------------------------

def _bucket(n: int, lo: int, hi: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return min(b, hi)


class MiniLMEncoder:
    """texts -> (n, D) sentence embeddings on device.

    Pads (batch, length) up to power-of-two buckets so jit compiles a
    small fixed set of programs regardless of input text; empty strings
    embed as [CLS][SEP] exactly like SentenceTransformer.encode("")."""

    def __init__(self, model: MiniLMJax, params: dict,
                 tokenizer: WordPieceTokenizer,
                 min_len: int = 16, min_batch: int = 8,
                 device=None):
        self.model = model
        self.params = jax.device_put(params, device)
        self.tokenizer = tokenizer
        self.min_len = min_len
        self.min_batch = min_batch
        self._device = device

        def fwd(params, ids, mask):
            hidden = model.apply(params, ids, mask)
            return mean_pool(hidden, mask)

        self._fwd = jax.jit(fwd)

    def encode(self, texts: List[str]) -> np.ndarray:
        cfg = self.model.cfg
        if not texts:
            return np.zeros((0, cfg.hidden_size), np.float32)
        seqs = [self.tokenizer.encode(t, cfg.max_seq_length) for t in texts]
        L = _bucket(max(len(s) for s in seqs), self.min_len,
                    cfg.max_seq_length)
        B = _bucket(len(seqs), self.min_batch, 1 << 30)
        ids = np.full((B, L), self.tokenizer.pad_id, np.int32)
        mask = np.zeros((B, L), np.int32)
        for i, s in enumerate(seqs):
            ids[i, :len(s)] = s
            mask[i, :len(s)] = 1
        out = self._fwd(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out[:len(seqs)], np.float32)

    def __call__(self, texts: List[str]) -> np.ndarray:
        return self.encode(texts)


def load_minilm(path: str, device=None, **encoder_kw) -> MiniLMEncoder:
    """Load a sentence-transformers / HF MiniLM checkpoint directory
    (config.json + vocab.txt + pytorch_model.bin|model.safetensors) into a
    device-native MiniLMEncoder."""
    with open(os.path.join(path, "config.json"), encoding="utf-8") as f:
        raw = json.load(f)
    cfg = MiniLMConfig(
        vocab_size=raw.get("vocab_size", 30522),
        hidden_size=raw.get("hidden_size", 384),
        num_layers=raw.get("num_hidden_layers", 6),
        num_heads=raw.get("num_attention_heads", 12),
        intermediate_size=raw.get("intermediate_size", 1536),
        max_position_embeddings=raw.get("max_position_embeddings", 512),
        type_vocab_size=raw.get("type_vocab_size", 2),
        layer_norm_eps=raw.get("layer_norm_eps", 1e-12))

    bin_path = os.path.join(path, "pytorch_model.bin")
    st_path = os.path.join(path, "model.safetensors")
    if os.path.exists(bin_path):
        import torch
        state_dict = torch.load(bin_path, map_location="cpu",
                                weights_only=True)
    elif os.path.exists(st_path):
        from safetensors.numpy import load_file
        state_dict = load_file(st_path)
    else:
        raise FileNotFoundError(
            f"no pytorch_model.bin or model.safetensors under {path}")
    variables = convert_minilm(state_dict, cfg)

    do_lower = True
    tok_cfg = os.path.join(path, "tokenizer_config.json")
    if os.path.exists(tok_cfg):
        with open(tok_cfg, encoding="utf-8") as f:
            do_lower = json.load(f).get("do_lower_case", True)
    tokenizer = WordPieceTokenizer.from_vocab_file(
        os.path.join(path, "vocab.txt"), do_lower_case=do_lower)

    # sentence_bert_config.json carries the truncation length (128)
    sb_cfg = os.path.join(path, "sentence_bert_config.json")
    if os.path.exists(sb_cfg):
        with open(sb_cfg, encoding="utf-8") as f:
            msl = json.load(f).get("max_seq_length")
        if msl:
            import dataclasses
            cfg = dataclasses.replace(cfg, max_seq_length=msl)

    model = MiniLMJax(cfg)
    return MiniLMEncoder(model, variables, tokenizer, device=device,
                         **encoder_kw)
