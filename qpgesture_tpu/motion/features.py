"""Motion feature utilities (process/pymo/features.py equivalents).

The reference vendors plant/foot-contact detection (unused in its main path,
SURVEY §2.1); provided here for completeness: a joint is 'planted' in frames
where both its height and its velocity fall under thresholds.
"""
from __future__ import annotations

import numpy as np


def joint_velocity(positions: np.ndarray, fps: float = 60.0) -> np.ndarray:
    """(T, J, 3) world positions -> (T, J) speed in units/s (first frame
    repeats the second)."""
    vel = np.linalg.norm(np.diff(positions, axis=0), axis=2) * fps
    return np.concatenate([vel[:1], vel], axis=0)


def plant_frames(positions: np.ndarray, joint: int,
                 height_threshold: float, velocity_threshold: float,
                 fps: float = 60.0, up_axis: int = 1) -> np.ndarray:
    """(T,) bool mask of frames where `joint` is planted (low + still) —
    pymo create_foot_contact_idxs semantics."""
    height = positions[:, joint, up_axis]
    vel = joint_velocity(positions, fps)[:, joint]
    return (height < height_threshold) & (vel < velocity_threshold)


def reverse_time(values: np.ndarray) -> np.ndarray:
    """ReverseTime transform (preprocessing.py:1119): time-flipped copy for
    augmentation."""
    return values[::-1].copy()
