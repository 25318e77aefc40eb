"""Device mesh helpers.

The reference's parallelism is single-process nn.DataParallel plus an inert
torch.distributed adapter (SURVEY §2.8). The TPU-native equivalent: a 1-D
jax.sharding.Mesh over the 'data' axis; gradients and EMA-codebook statistics
all-reduce over ICI via psum inside shard_map; the matching database shards
over the same axis with a min-reduce. Like the reference's dist_adapter, all
helpers degrade gracefully to a single device.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        # fail at the source: silently truncating to fewer devices gives
        # callers wrong sharding or shape errors far from the cause
        raise ValueError(f"requested a {n}-device mesh but only "
                         f"{len(devices)} device(s) are available "
                         f"(platform {jax.default_backend()})")
    return Mesh(np.array(devices[:n]), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad axis to a device-count multiple; returns (padded, original_len)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad), n
