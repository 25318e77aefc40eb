"""Fused flash attention with WavLM's gated relative position bias.

The serving-dominant cost of the raw-wav path is the WavLM encoder
(models/wavlm.py): at 24 s of 16 kHz audio the encoder runs 24 transformer
layers at T~1200, and the XLA attention materialises three (B, H, T, T)
f32 intermediates per layer (gated bias, logits, softmax weights) — ~100 MB
each — so the whole encoder is HBM-bound on bias/score round-trips, not
MXU-bound. The reference never faces this shape of problem: it runs the
vendored torch WavLM once per clip on GPU (process/process_wavlm.py) and
caches features to disk.

This kernel computes

    softmax( (q @ k^T) * sm_scale + gate * bias ) @ v

in one pass with the standard online-softmax (flash) recurrence, so the
only (T, T)-shaped HBM traffic left is ONE read of the layer-shared
relative-position bias table per layer (bf16 when the encoder runs the
1-pass bf16 'default' preset). The gate — WavLM's per-layer, per-query
sigmoid gate on the T5 bucket bias (reference vendored modules.py:520-534)
— is fused into the logit tile in-kernel instead of being materialised as
a (B, H, T, T) product.

Layout notes (TPU):
  * grid = (B, H, nq, nk) with the key axis innermost and 'arbitrary'
    (sequential) semantics; m/l/acc live in VMEM scratch across the kv
    sweep and the output block is written once on the last kv step.
  * the per-query gate rides in as a (B, H, T, LANES)-tiled array (the
    same trick the in-tree kernel uses for segment ids): per-row scalars
    need a full 128-lane tile to stream through VMEM; only lane 0 is read.
  * q is pre-scaled by sm_scale outside the kernel (exact in bf16 for the
    1/8 of head_dim 64), so the kernel adds the gated bias un-scaled —
    matching models/wavlm.py's `q * hd**-0.5` XLA path bit-for-bit in
    ordering.
  * padding to the block multiple is handled with an in-kernel column
    mask (col >= t_valid -> -1e30); padded query rows compute garbage
    that the wrapper slices off. Padded KEY blocks never occur entirely
    masked because Tp - T < block_k, so the online max never sees an
    all-masked tile (the classic exp(0)=1 flash bug).

On non-TPU backends the kernel runs in interpreter mode (tests compare it
against the plain XLA attention); models/wavlm.py only routes to it on
TPU via WavLMJaxConfig.attn_impl = 'auto'.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_NEG = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, o_ref,
                  m_scr, l_scr, acc_scr, *,
                  t_valid: int, block_k: int, nk: int):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, _NEG, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0, 0]                                   # (bq, hd), pre-scaled
    k = k_ref[0, 0]                                   # (bk, hd)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (bq, bk)

    bias = bias_ref[0].astype(jnp.float32)            # (bq, bk)
    if gate_ref is not None:
        gate = gate_ref[0, 0].astype(jnp.float32)     # (bq, LANES)
        s += gate[:, :1] * bias
    else:
        s += bias

    if t_valid % block_k:                             # mask padded key cols
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < t_valid, s, _NEG)

    m_prev = m_scr[:, :1]                             # (bq, 1)
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=1)[:, None]               # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                            # (bq, bk)
    l_new = alpha * l_prev + jnp.sum(p, axis=1)[:, None]

    m_scr[...] = jax.lax.broadcast_in_dim(m_new, m_scr.shape, (0, 1))
    l_scr[...] = jax.lax.broadcast_in_dim(l_new, l_scr.shape, (0, 1))

    v = v_ref[0, 0]                                   # (bk, hd)
    pv = jax.lax.dot(p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(ki == nk - 1)
    def _flush():
        o_ref[0, 0] = (acc_scr[...] / l_scr[:, :1]).astype(o_ref.dtype)


def gated_flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: jnp.ndarray,
                          gate: Optional[jnp.ndarray] = None,
                          *, sm_scale: float = 1.0,
                          block_q: int = 256, block_k: int = 256,
                          kernel_dtype: Optional[jnp.dtype] = None,
                          interpret: Optional[bool] = None) -> jnp.ndarray:
    """softmax(q @ k^T * sm_scale + gate * bias) @ v, flash-fused.

    q, k, v : (B, H, T, hd)
    bias    : (H, T, T) — batch-shared relative position bias
    gate    : (B, H, T) per-query bias gate, or None (plain additive bias)
    kernel_dtype : dtype q/k/v/bias/gate are cast to for the kernel
        (softmax statistics and the accumulator stay f32). None keeps the
        input dtype; bf16 halves every HBM stream and runs the two matmuls
        1-pass on the MXU — the flash twin of the encoder's 'default'
        precision preset.
    Returns (B, H, T, hd) f32.
    """
    B, H, T, hd = q.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    if kernel_dtype is not None:
        q, k, v = (x.astype(kernel_dtype) for x in (q, k, v))
        bias = bias.astype(kernel_dtype)
        if gate is not None:
            gate = gate.astype(kernel_dtype)
    if sm_scale != 1.0:
        q = q * jnp.asarray(sm_scale, q.dtype)

    bq = min(block_q, max(LANES, -(-T // LANES) * LANES))
    bk = min(block_k, max(LANES, -(-T // LANES) * LANES))
    tp = -(-T // max(bq, bk)) * max(bq, bk)
    pad = tp - T
    if pad:
        q, k, v = (jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
                   for x in (q, k, v))
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)))
    nq, nk = tp // bq, tp // bk

    in_specs = [
        pl.BlockSpec((1, 1, bq, hd), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, bk, hd), lambda b, h, qi, ki: (b, h, ki, 0)),
        pl.BlockSpec((1, 1, bk, hd), lambda b, h, qi, ki: (b, h, ki, 0)),
        pl.BlockSpec((1, bq, bk), lambda b, h, qi, ki: (h, qi, ki)),
    ]
    args = [q, k, v, bias]
    if gate is not None:
        gate_lanes = jnp.broadcast_to(
            jnp.pad(gate, ((0, 0), (0, 0), (0, pad)))[..., None],
            (B, H, tp, LANES))
        in_specs.append(pl.BlockSpec((1, 1, bq, LANES),
                                     lambda b, h, qi, ki: (b, h, qi, 0)))
        args.append(gate_lanes)

    if gate is not None:
        def kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, o_ref,
                   m_scr, l_scr, acc_scr):
            _flash_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, o_ref,
                          m_scr, l_scr, acc_scr,
                          t_valid=T, block_k=bk, nk=nk)
    else:
        def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                   m_scr, l_scr, acc_scr):
            _flash_kernel(q_ref, k_ref, v_ref, bias_ref, None, o_ref,
                          m_scr, l_scr, acc_scr,
                          t_valid=T, block_k=bk, nk=nk)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, tp, hd), jnp.float32),
        grid=(B, H, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, hd),
                               lambda b, h, qi, ki: (b, h, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(*args)
    return out[:, :, :T]
