"""Forward kinematics: euler channel values -> world joint positions.

Device-side replacement for PyMO's per-frame recursive FK
(MocapParameterizer('position')._to_pos, process/pymo/preprocessing.py:
288-368). That implementation composes *extrinsic* (lowercase-order) euler
rotations through scipy's inverted-rotation chaining; algebraically its world
rotation is W_j = W_parent @ E_j with E_j the extrinsic euler matrix of the
joint's channel order, and p_j = p_parent + W_parent @ (offset + pos). We
implement exactly that recurrence, vectorized over frames, jittable.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import BVHData
from .rotations import euler_to_matrix


def _topo_order(skeleton: Dict[str, dict], root: str) -> List[str]:
    order = []

    def visit(j):
        order.append(j)
        for c in skeleton[j]["children"]:
            visit(c)

    visit(root)
    return order


def fk_tables(data: BVHData):
    """Static FK tables from a skeleton: joint order, parent indices,
    offsets, and per-joint euler column indices (-1 rows for channel-less
    end sites)."""
    joints = _topo_order(data.skeleton, data.root_name)
    parent_idx = np.array(
        [joints.index(data.skeleton[j]["parent"])
         if data.skeleton[j]["parent"] is not None else -1 for j in joints])
    offsets = np.array([data.skeleton[j]["offsets"] or [0.0, 0.0, 0.0]
                        for j in joints], dtype=np.float32)
    rot_cols = np.full((len(joints), 3), -1, dtype=np.int64)
    pos_cols = np.full((len(joints), 3), -1, dtype=np.int64)
    orders = []
    for ji, j in enumerate(joints):
        order = data.skeleton[j]["order"] or "ZXY"
        orders.append(order)
        for ci in range(3):
            rc = f"{j}_{order[ci]}rotation"
            if rc in data.channel_names:
                rot_cols[ji, ci] = data.channel_names.index(rc)
        for ci, ax in enumerate("XYZ"):
            pc = f"{j}_{ax}position"
            if pc in data.channel_names:
                pos_cols[ji, ci] = data.channel_names.index(pc)
    return joints, parent_idx, offsets, rot_cols, pos_cols, orders


def forward_kinematics(data: BVHData, use_jax: bool = False) -> np.ndarray:
    """-> (T, n_joints, 3) world positions, joints in depth-first order."""
    joints, parent_idx, offsets, rot_cols, pos_cols, orders = fk_tables(data)
    values = data.values.astype(np.float32)
    T = values.shape[0]
    J = len(joints)

    # gather per-joint euler angles in channel order (zeros where absent)
    eul = np.zeros((T, J, 3), np.float32)
    pos = np.zeros((T, J, 3), np.float32)
    for ji in range(J):
        for ci in range(3):
            if rot_cols[ji, ci] >= 0:
                eul[:, ji, ci] = values[:, rot_cols[ji, ci]]
            if pos_cols[ji, ci] >= 0:
                pos[:, ji, ci] = values[:, pos_cols[ji, ci]]

    xp = jnp if use_jax else np
    eul_x = xp.asarray(eul)
    # local rotations: extrinsic in channel order (pymo convention)
    locals_ = np.zeros((T, J, 3, 3), np.float32)
    for ji in range(J):
        locals_[:, ji] = np.asarray(euler_to_matrix(
            eul[:, ji], orders[ji], degrees=True, intrinsic=False, xp=np))
    if use_jax:
        return np.asarray(_fk_jit(jnp.asarray(locals_), jnp.asarray(pos),
                                  jnp.asarray(offsets),
                                  tuple(int(p) for p in parent_idx)))
    return _fk_np(locals_, pos, offsets, parent_idx)


def _fk_np(locals_, pos, offsets, parent_idx):
    T, J = locals_.shape[:2]
    world_rot = np.zeros_like(locals_)
    world_pos = np.zeros((T, J, 3), np.float32)
    for ji in range(J):
        p = parent_idx[ji]
        if p < 0:
            world_rot[:, ji] = locals_[:, ji]
            world_pos[:, ji] = pos[:, ji]
        else:
            world_rot[:, ji] = world_rot[:, p] @ locals_[:, ji]
            k = offsets[ji] + pos[:, ji]
            world_pos[:, ji] = world_pos[:, p] + np.einsum(
                "tab,tb->ta", world_rot[:, p], k)
    return world_pos


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("parent_idx",))
def _fk_jit(locals_, pos, offsets, parent_idx: Tuple[int, ...]):
    T, J = locals_.shape[:2]
    world_rot = [None] * J
    world_pos = [None] * J
    for ji in range(J):
        p = parent_idx[ji]
        if p < 0:
            world_rot[ji] = locals_[:, ji]
            world_pos[ji] = pos[:, ji]
        else:
            world_rot[ji] = jnp.einsum("tab,tbc->tac", world_rot[p],
                                       locals_[:, ji],
                                       precision=jax.lax.Precision.HIGHEST)
            k = offsets[ji] + pos[:, ji]
            world_pos[ji] = world_pos[p] + jnp.einsum(
                "tab,tb->ta", world_rot[p], k,
                precision=jax.lax.Precision.HIGHEST)
    return jnp.stack(world_pos, axis=1)


def positions_for_render(data: BVHData, joints_subset: List[str] | None = None
                         ) -> np.ndarray:
    """(T, J*3) positions for the selected joints (bvh_to_position.py:68-96
    equivalent: FK then keep the 15 upper-body joints)."""
    joints, *_ = fk_tables(data)
    pos = forward_kinematics(data)
    if joints_subset is not None:
        idx = [joints.index(j) for j in joints_subset]
        pos = pos[:, idx]
    return pos.reshape(pos.shape[0], -1)
