"""Orbax checkpointing for params + optimizer + EMA codebook state.

Replaces torch.save({'args','epoch','model_dict'}) (train.py:114-116) and
adds what the reference lacks (SURVEY §5): full optimizer/codebook state so
training resumes mid-run, not just weights.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, state: Any, name: str = "latest") -> str:
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(directory: str, template: Any,
                       name: str = "latest", to_host: bool = True) -> Any:
    """Restore a checkpoint against a state template.

    to_host=True returns numpy leaves: orbax restores arrays COMMITTED to
    specific devices, which a subsequently-jitted shard_map over a
    different mesh rejects ('incompatible devices'); host arrays let the
    next jit place them wherever the computation needs."""
    import jax
    import numpy as np
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, template)
    if to_host:
        restored = jax.tree_util.tree_map(np.asarray, restored)
    return restored
