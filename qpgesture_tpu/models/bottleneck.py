"""EMA vector-quantization bottleneck, as explicit functional state.

Same quantizer as the reference (codebook/models/bottleneck.py:15-186):
nearest-code assignment via ||x||^2 - 2 x W^T + ||W||^2, straight-through
estimator, EMA codebook statistics (mu=0.99) with dead-code random restarts,
and the codebook health metrics (fit / prenorm / entropy / used_curr /
usage / dk).

TPU-native design: the codebook is an explicit pytree (CodebookState)
threaded through the jitted train step instead of mutable module buffers,
and the cross-replica synchronization the reference stubs out
(bottleneck.py:75-77, commented dist.all_reduce/broadcast) is implemented
for real: under a data-parallel mesh the one-hot count/sum statistics are
``psum``-reduced over the 'data' axis, and restart candidates derive from a
shared PRNG key so every replica applies an identical update.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "k_sum", "k_elem"], meta_fields=[])
@dataclass
class CodebookState:
    k: jnp.ndarray       # (K, D) codebook vectors
    k_sum: jnp.ndarray   # (K, D) EMA numerator
    k_elem: jnp.ndarray  # (K,) EMA denominator


def _tile_to_k(x: jnp.ndarray, k_bins: int, rng: jax.Array) -> jnp.ndarray:
    """Repeat batch rows (with tiny noise) until there are >= k_bins
    candidates for (re)initialization (bottleneck.py:30-37)."""
    d, ew = x.shape
    if d < k_bins:
        n_repeats = (k_bins + d - 1) // d
        std = 0.01 / jnp.sqrt(jnp.float32(ew))
        x = jnp.tile(x, (n_repeats, 1))
        x = x + jax.random.normal(rng, x.shape, x.dtype) * std
    return x


def init_codebook(x: jnp.ndarray, k_bins: int,
                  rng: jax.Array) -> CodebookState:
    """Initialize from random rows of the first batch (init_k,
    bottleneck.py:39-49). x: (N*T, D) flattened encoder outputs. The caller
    must pass an identical rng on every data-parallel replica (the role of
    the reference's commented-out dist.broadcast)."""
    rng_tile, rng_perm = jax.random.split(rng)
    y = _tile_to_k(x, k_bins, rng_tile)
    perm = jax.random.permutation(rng_perm, y.shape[0])
    k = y[perm[:k_bins]]
    # k_sum must not alias k: the train step donates its input buffers.
    return CodebookState(k=k, k_sum=k + 0.0,
                         k_elem=jnp.ones((k_bins,), x.dtype))


def quantise(state: CodebookState,
             x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest code per row (bottleneck.py:120-126). x: (M, D).
    Returns (codes (M,), fit = mean min distance)."""
    k_w = state.k.T
    distance = (jnp.sum(x ** 2, axis=-1, keepdims=True)
                - 2.0 * jnp.dot(x, k_w, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                + jnp.sum(k_w ** 2, axis=0, keepdims=True))
    codes = jnp.argmin(distance, axis=-1)
    fit = jnp.mean(jnp.min(distance, axis=-1))
    return codes, fit


def dequantise(state: CodebookState, codes: jnp.ndarray) -> jnp.ndarray:
    return state.k[codes]


def update_codebook(state: CodebookState, x: jnp.ndarray,
                    codes: jnp.ndarray, mu: float, rng: jax.Array,
                    threshold: float = 1.0,
                    axis_name: Optional[str] = None
                    ) -> Tuple[CodebookState, Dict[str, jnp.ndarray]]:
    """EMA update + dead-code restart (update_k, bottleneck.py:63-94).

    axis_name: data-parallel mesh axis to psum the batch statistics over —
    the collective the reference left commented out (bottleneck.py:75-77).
    rng must be identical across replicas.
    """
    k_bins, emb_width = state.k.shape
    onehot = jax.nn.one_hot(codes, k_bins, dtype=x.dtype)       # (M, K)
    _k_sum = jnp.einsum("mk,md->kd", onehot, x,
                        precision=jax.lax.Precision.HIGHEST)
    _k_elem = jnp.sum(onehot, axis=0)

    # Dead-code restart candidates must be identical on every replica (the
    # reference broadcasts rank 0's rows, bottleneck.py:75): draw them from
    # the all-gathered batch with a replica-identical rng, which also makes
    # an N-way data-parallel step bit-equal to the single-device step.
    x_pool = x
    if axis_name is not None:
        x_pool = jax.lax.all_gather(x, axis_name).reshape(-1, x.shape[-1])
    y = _tile_to_k(x_pool, k_bins, jax.random.fold_in(rng, 1))
    perm = jax.random.permutation(jax.random.fold_in(rng, 2), y.shape[0])
    _k_rand = y[perm[:k_bins]]

    if axis_name is not None:
        _k_sum = jax.lax.psum(_k_sum, axis_name)
        _k_elem = jax.lax.psum(_k_elem, axis_name)

    old_k = state.k
    k_sum = mu * state.k_sum + (1.0 - mu) * _k_sum
    k_elem = mu * state.k_elem + (1.0 - mu) * _k_elem
    usage = (k_elem[:, None] >= threshold).astype(x.dtype)
    k = usage * (k_sum / jnp.maximum(k_elem[:, None], 1e-12)) \
        + (1 - usage) * _k_rand

    _k_prob = _k_elem / jnp.maximum(jnp.sum(_k_elem), 1e-12)
    entropy = -jnp.sum(_k_prob * jnp.log(_k_prob + 1e-8))
    metrics = dict(
        entropy=entropy,
        used_curr=jnp.sum((_k_elem >= threshold).astype(jnp.float32)),
        usage=jnp.sum(usage),
        dk=jnp.linalg.norm(k - old_k) / jnp.sqrt(
            jnp.float32(old_k.shape[0] * old_k.shape[1])),
    )
    return CodebookState(k=k, k_sum=k_sum, k_elem=k_elem), metrics


def prenorm(x: jnp.ndarray) -> jnp.ndarray:
    """||x - mean(x)|| / sqrt(numel) (bottleneck.py:102)."""
    return jnp.linalg.norm(x - jnp.mean(x)) / jnp.sqrt(
        jnp.float32(x.shape[0] * x.shape[1]))


def forward(state: CodebookState, x: jnp.ndarray, *, mu: float,
            train: bool, rng: Optional[jax.Array] = None,
            axis_name: Optional[str] = None):
    """Quantise/dequantise with straight-through + optional EMA update
    (BottleneckBlock.forward, bottleneck.py:156-186).

    x: (N, T, D). Returns (codes (N, T), x_d (N, T, D), commit_loss,
    metrics, new_state).
    """
    N, T, D = x.shape
    flat = x.reshape(N * T, D)
    pn = prenorm(flat)
    codes, fit = quantise(state, flat)
    x_d = dequantise(state, codes)

    metrics: Dict[str, jnp.ndarray] = dict(fit=fit, pn=pn)
    new_state = state
    if train:
        new_state, upd = update_codebook(state, flat, codes, mu, rng,
                                         axis_name=axis_name)
        metrics.update(upd)

    commit_loss = (jnp.linalg.norm(jax.lax.stop_gradient(x_d) - flat) ** 2
                   / (N * T * D))
    # Straight-through estimator; in eval the reference additionally detaches
    # the quantised output (bottleneck.py:221-225).
    x_d = flat + jax.lax.stop_gradient(x_d - flat)
    if not train:
        x_d = jax.lax.stop_gradient(x_d)
    return (codes.reshape(N, T), x_d.reshape(N, T, D), commit_loss, metrics,
            new_state)
