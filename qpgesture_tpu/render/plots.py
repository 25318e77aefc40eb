"""Offline training plots: scalar-history curves and phase-manifold PCA.

The reference shows live matplotlib windows during training — loss via
PlottingWindow (Library/Utility.py:21-75) and the PAE phase manifold via
Plotting.py PCA2D/Phase2D (PAE.py:438-468). Headless TPU training has no
display, so these render the same views as PNGs after (or during) a run:
loss curves come from the persistent JSONL scalar history
(utils/metrics_log.ScalarHistory), the manifold from stored phase params.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_scalar_history(history_path: str, out_path: str,
                        tags: Optional[Sequence[str]] = None) -> str:
    """Render per-tag training curves from a scalars.jsonl file into one
    PNG grid (the PlottingWindow equivalent)."""
    from ..utils.metrics_log import ScalarHistory
    series = ScalarHistory.read(history_path)
    if tags:
        series = {t: series[t] for t in tags if t in series}
    if not series:
        raise ValueError(f"no scalar series found in {history_path}")
    plt = _plt()
    n = len(series)
    cols = min(3, n)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(4.5 * cols, 3 * rows),
                             squeeze=False)
    for ax in axes.flat[n:]:
        ax.axis("off")
    for ax, (tag, rows_) in zip(axes.flat, sorted(series.items())):
        max_step = max(r[1] for r in rows_) + 1
        epochs = [e + s / max(1, max_step) for e, s, _ in rows_]
        values = [v for _, _, v in rows_]
        ax.plot(epochs, values, lw=1.0)
        ax.set_title(tag)
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def plot_phase_manifold(phase: np.ndarray, out_path: str,
                        max_points: int = 5000) -> str:
    """PCA scatter of the phase manifold (the Plotting.py PCA2D view):
    phase: (T, 4, C) dense params [phase, freq, amp, offset] x channels.
    Embeds the 2C-dim manifold points a*sin(2*pi*p), a*cos(2*pi*p) and
    scatters the first two principal components colored by time."""
    phase = np.asarray(phase)
    assert phase.ndim == 3 and phase.shape[1] == 4, phase.shape
    p = phase[:, 0, :]
    a = phase[:, 2, :]
    pts = np.concatenate([a * np.sin(2 * np.pi * p),
                          a * np.cos(2 * np.pi * p)], axis=1)  # (T, 2C)
    if len(pts) > max_points:
        idx = np.linspace(0, len(pts) - 1, max_points).astype(int)
        pts = pts[idx]
    centered = pts - pts.mean(axis=0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    proj = centered @ vt[:2].T
    plt = _plt()
    fig, ax = plt.subplots(figsize=(5, 5))
    sc = ax.scatter(proj[:, 0], proj[:, 1], s=3,
                    c=np.arange(len(proj)), cmap="viridis", alpha=0.7)
    fig.colorbar(sc, ax=ax, label="frame")
    ax.set_title("phase manifold (PCA)")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
