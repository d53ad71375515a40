"""Joint-angle error measures (MPJAE variants).

Replaces tuch/utils/error_measures.py (unused by the main paths in the
reference but part of its public surface): geodesic rotation distance via
quaternions and the mean per-joint angle error.
"""

import jax.numpy as jnp

from tuch_tpu.utils.rotations import batch_rodrigues, rotmat_to_quat


def quat_angle_distance(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between quaternions (..., 4) -> (...) radians."""
    dot = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(dot, -1.0, 1.0))


def rotmat_angle_distance(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between rotation matrices (..., 3, 3) -> (...)."""
    return quat_angle_distance(rotmat_to_quat(R1), rotmat_to_quat(R2))


def mpjae(pred_pose: jnp.ndarray, gt_pose: jnp.ndarray,
          degrees: bool = True) -> jnp.ndarray:
    """Mean per-joint angle error for (B, 72) axis-angle poses -> (B,)."""
    R1 = batch_rodrigues(pred_pose.reshape(-1, 24, 3))
    R2 = batch_rodrigues(gt_pose.reshape(-1, 24, 3))
    ang = rotmat_angle_distance(R1, R2)  # (B, 24)
    out = ang.mean(axis=-1)
    return jnp.rad2deg(out) if degrees else out
