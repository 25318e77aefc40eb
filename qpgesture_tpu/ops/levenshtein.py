"""Edit distance over vq-wav2vec code strings.

The reference computes audio similarity in its hottest loop via
``Levenshtein.distance`` (a C extension) over short code strings
(GestureKNN.py:44-67,677). Code strings are built from the 22-dim stacked
wavvq features: 11 frames x 2 groups; in 'combine' mode each frame becomes one
symbol ``g0*320 + g1`` giving an 11-symbol string (wavvq_distances, mode
'combine'); in 'sum' mode the two group strings are edit-distanced separately
and summed.

TPU-native design: all strings have a fixed length (11 combined symbols), so
the DP table is tiny and fully unrollable. ``levenshtein_matrix`` computes
the full (Q, N) distance matrix between query and database strings as one
device program: the DP recurrence runs as an unrolled row loop whose state is
a (Q, N)-shaped vector per DP column — i.e., the *pairs* dimension is
vectorized onto the VPU while the 11x11 recurrence is sequential. A Pallas
kernel with the same layout lives in ops/pallas_kernels.py.

Oracles: `levenshtein_np` (pure NumPy DP) is cross-checked in tests against
the same python-Levenshtein C library the reference uses.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def levenshtein_np(a, b) -> int:
    """Plain DP edit distance between two int sequences (NumPy oracle)."""
    a = list(a)
    b = list(b)
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[n]


def combine_wavvq(feat: np.ndarray, vocab: int = 320) -> np.ndarray:
    """Stacked wavvq feature (..., 2*F) -> combined code string (..., F).

    Matches wavvq_distances mode='combine' (GestureKNN.py:57-61):
    reshape(-1, 2) rows are frames, columns are the two quantizer groups;
    each frame becomes symbol g0*vocab + g1.
    """
    feat = np.asarray(feat)
    frames = feat.reshape(feat.shape[:-1] + (-1, 2))
    return (frames[..., 0] * vocab + frames[..., 1]).astype(np.int32)


def split_wavvq_groups(feat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Stacked wavvq feature (..., 2*F) -> the two per-group strings
    (mode='sum', GestureKNN.py:46-55)."""
    feat = np.asarray(feat)
    frames = feat.reshape(feat.shape[:-1] + (-1, 2))
    return frames[..., 0].astype(np.int32), frames[..., 1].astype(np.int32)


@partial(jax.jit, static_argnames=())
def levenshtein_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs edit distance between code strings.

    a: (Q, L) int32 query strings; b: (N, L) int32 database strings.
    Returns (Q, N) int32 distances. The (Q, N) pairs dimension is the
    vectorized axis; the L x L DP recurrence is a compile-time-unrolled loop
    (L is 11 for wavvq 'combine' strings).
    """
    Q, L = a.shape
    N = b.shape[0]
    eq = a[:, None, :, None] == b[None, :, None, :]   # (Q, N, L, L)
    eq = eq.reshape(Q * N, L, L)

    # prev[j] (j = 0..L) is DP row i over pairs: shape (L+1, Q*N).
    prev = jnp.broadcast_to(
        jnp.arange(L + 1, dtype=jnp.int32)[:, None], (L + 1, Q * N))

    def row(i, prev):
        cur = [jnp.full((Q * N,), i + 1, dtype=jnp.int32)]
        for j in range(1, L + 1):
            cost = jnp.where(eq[:, i, j - 1], 0, 1).astype(jnp.int32)
            cur.append(jnp.minimum(jnp.minimum(prev[j] + 1, cur[j - 1] + 1),
                                   prev[j - 1] + cost))
        return jnp.stack(cur)

    for i in range(L):  # unrolled: L is small and static
        prev = row(i, prev)
    return prev[L].reshape(Q, N)


def levenshtein_matrix_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """NumPy oracle for levenshtein_matrix."""
    Q, N = a.shape[0], b.shape[0]
    out = np.zeros((Q, N), dtype=np.int32)
    for qi in range(Q):
        for ni in range(N):
            out[qi, ni] = levenshtein_np(a[qi], b[ni])
    return out
