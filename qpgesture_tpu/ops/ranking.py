"""Rank-sum fusion primitives.

The reference fuses heterogeneous scores by double argsort
(``np.array(d).argsort().argsort()`` — GestureKNN.py:540,553,574): each score
vector is replaced by the rank of each element, and ranks are summed.

One deliberate, documented deviation: NumPy's default argsort is an unstable
introsort, so the rank order *within exact ties* is implementation-defined.
This framework uses stable ranks everywhere (ties broken by index), in both
the NumPy oracle and the device engine, so the two are bit-identical. For
untied inputs — the generic case for float distances — stable and unstable
ranks coincide with the reference.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rank_np(x: np.ndarray) -> np.ndarray:
    """Stable double-argsort rank: rank[i] = position of x[i] in sorted order,
    ties broken by index. Matches np.argsort(kind='stable').argsort()."""
    order = np.argsort(x, kind="stable")
    ranks = np.empty_like(order)
    ranks[order] = np.arange(len(x))
    return ranks


def rank_jnp(x: jnp.ndarray) -> jnp.ndarray:
    """Stable rank on device. jnp.argsort is stable by default."""
    order = jnp.argsort(x)
    n = x.shape[-1]
    ranks = jnp.zeros(n, dtype=jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return ranks


def kth_smallest_index_np(x: np.ndarray, k: int) -> int:
    """Index of the k-th smallest element, ties broken by index
    (= np.argsort(x, kind='stable')[k], the reference's
    combined_sorted_idx[desired_k] selection at GestureKNN.py:555,576)."""
    return int(np.argsort(x, kind="stable")[k])


def kth_smallest_index_jnp(x: jnp.ndarray, k) -> jnp.ndarray:
    return jnp.argsort(x)[k]
