"""Device-side test-query staging.

stage_test_audio (match/database.py) runs on host: the serving caller must
extract WavLM / vq-wav2vec features, interpolate, context-stack and select
per-step frames in NumPy before anything reaches the chip. These are the
same ops XLA runs well, and the encoders already have JAX ports
(models/wavlm.py, models/vq_wav2vec.py) — so the whole ingress can live
INSIDE the serving program (serve.RawWavServer): raw 16 kHz audio in,
poses out, one dispatch.

Each function mirrors the host staging arithmetic — the same interpolation
coefficients (f64 coords, f32 weights), the same stacking shifts and zero
padding, computed from the static ModeGeometry at trace time. The integer
gathers (wavvq strings, frame selection, context slots) are bit-exact; the
wavlm interpolation matches within 1 ulp (XLA contracts the lerp's
multiply-add into an FMA, skipping one intermediate rounding the NumPy
path performs). tests/test_serve.py pins both, plus end-to-end
selected-index parity of the fused server against the host-staged path.

Reference staging semantics: data_processing.py:208-335 (stacks),
:258-261 (interpolate), GestureKNN.py:549-551 (context slots).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..core.config import MatchConfig
from .geometry import ModeGeometry


def interp_coeffs(T: int, size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static (lo, w) for linear interpolation T -> size frames, matching
    ops/stacking.interpolate_linear (torch F.interpolate align_corners=True):
    out[t] = x[lo[t]] * (1 - w[t]) + x[lo[t] + 1] * w[t]."""
    coords = np.arange(size, dtype=np.float64) * (T - 1) / (size - 1)
    lo = np.clip(np.floor(coords).astype(np.int64), 0, T - 2)
    w = (coords - lo).astype(np.float32)
    return lo, w


def _interpolate_jnp(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """(W, T, F) -> (W, size, F), bit-matching the host interpolate (the
    weights are the identical f32 constants; the lerp is the identical
    mul/add order)."""
    T = x.shape[1]
    if size == T:
        return x
    lo, w = interp_coeffs(T, size)
    one_minus = np.float32(1.0) - w
    return x[:, lo] * one_minus[None, :, None] + x[:, lo + 1] * w[None, :, None]


def stage_wavlm_jnp(cfg: MatchConfig, geom: ModeGeometry,
                    feats: jnp.ndarray) -> jnp.ndarray:
    """WavLM features (W, 199, 1024) -> per-step queries.

    wavlm_feat: interpolate to geom.n_db_frm, 6-frame stride-2 context
    stack, select step frames -> (W, S, 6144). wavlm (raw): step_sz
    consecutive interpolated frames per step -> (W, S, step*1024)."""
    interp = _interpolate_jnp(feats.astype(jnp.float32), geom.n_db_frm)
    sidx = geom.step_clip_idx
    if cfg.audio_mode == "wavlm_feat":
        offs = np.arange(C.NUM_AUDIO_FEAT_FRAMES) * (C.FRAME_INTERVAL - 2)
        idx = sidx[:, None] + offs[None, :]                   # (S, 6)
    else:
        idx = sidx[:, None] + np.arange(int(geom.step_sz))[None, :]
    valid = idx < geom.n_db_frm                               # stack_post pad
    sel = interp[:, np.clip(idx, 0, geom.n_db_frm - 1)]       # (W, S, k, F)
    sel = jnp.where(jnp.asarray(valid)[None, :, :, None], sel, 0.0)
    return sel.reshape(sel.shape[0], len(sidx), -1)


def wavvq_shifts(T: int, n_stack: int = 6,
                 num_frames_code: int = C.NUM_FRAMES_CODE) -> np.ndarray:
    """The 11 two-sided stacking shifts of ops/stacking.stack_wavvq: frame t
    slot s reads codes[t + shifts[s]] (zero where out of range)."""
    fi = T / num_frames_code
    past = [-int((n_stack - 1 - i) * fi) for i in range(n_stack)]
    future = [int(j * fi) for j in range(1, n_stack)]
    return np.array(past + future, dtype=np.int64)


def stage_wavvq_jnp(cfg: MatchConfig, geom: ModeGeometry,
                    codes: jnp.ndarray) -> jnp.ndarray:
    """vq-wav2vec codes (W, 398, 2) int32 -> per-step query strings:
    (W, S, 11) combined symbols g0*320+g1 ('combine') or (W, S, 2, 11)
    per-group strings ('sum')."""
    T = codes.shape[1]
    idx = geom.step_clip_idx[:, None] + wavvq_shifts(T)[None, :]  # (S, 11)
    valid = (idx >= 0) & (idx < T)
    sel = codes[:, np.clip(idx, 0, T - 1)]                    # (W, S, 11, 2)
    sel = jnp.where(jnp.asarray(valid)[None, :, :, None], sel, 0)
    if cfg.wavvq_mode == "sum":
        return jnp.moveaxis(sel, -1, -2).astype(jnp.int32)    # (W, S, 2, 11)
    return (sel[..., 0] * C.WAVVQ_VOCAB + sel[..., 1]).astype(jnp.int32)


def stage_context_jnp(geom: ModeGeometry, context: jnp.ndarray) -> jnp.ndarray:
    """(W, 30, 384) context embeddings -> (W, S, 384) per-step queries
    (stage_test_context's static slot gather)."""
    ctx = context.astype(jnp.float32)
    if ctx.ndim == 4:
        ctx = ctx.squeeze(2)
    return ctx[:, geom.step_context_idx]
