"""Rotation representations, all jittable and batched.

TPU-native replacements for the reference's torch/torchgeometry/cv2 rotation
helpers (reference: tuch/utils/geometry.py:29-81, tuch/utils/imutils.py:135-146,
tuch/train/fits_dict.py:97-119). Everything here is a pure function over
jnp arrays so it can live inside jit/vmap/scan; there are no host round-trips
(the reference called cv2.Rodrigues per sample on CPU).
"""

import jax
import jax.numpy as jnp


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Convert quaternions (..., 4) (w, x, y, z) to rotation matrices (..., 3, 3)."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = (quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3])
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ], axis=-1)
    return rot.reshape(quat.shape[:-1] + (3, 3))


def batch_rodrigues(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Matches the reference numerics (tuch/utils/geometry.py:29-43): the angle is
    the norm of (theta + 1e-8) and the conversion goes through a quaternion.
    """
    angle = jnp.linalg.norm(aa + 1e-8, axis=-1, keepdims=True)
    axis = aa / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    return quat_to_rotmat(quat)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> (N, 3, 3) via Gram-Schmidt.

    Zhou et al., "On the Continuity of Rotation Representations in Neural
    Networks", CVPR 2019. Matches tuch/utils/geometry.py:67-81: input is
    reshaped to (-1, 3, 2) and the two columns are orthonormalized.
    """
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[:, :, 0], x[:, :, 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2u = a2 - dot * b1
    b2 = b2u / jnp.maximum(jnp.linalg.norm(b2u, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> quaternions (..., 4) (w, x, y, z).

    Branch-free Shepperd-style conversion: computes all four candidate
    quaternion constructions and selects the numerically best one with
    jnp.where, so it is safe under jit/vmap and differentiable away from the
    branch boundaries.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Four candidates, each scaled by 4*q_i^2 (all >= 0 up to fp error).
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # Candidate built from w.
    w_w = safe_sqrt(qw2) / 2.0
    cand_w = jnp.stack([
        w_w, (m21 - m12) / (4 * w_w), (m02 - m20) / (4 * w_w),
        (m10 - m01) / (4 * w_w)], axis=-1)
    # Candidate built from x.
    x_x = safe_sqrt(qx2) / 2.0
    cand_x = jnp.stack([
        (m21 - m12) / (4 * x_x), x_x, (m01 + m10) / (4 * x_x),
        (m02 + m20) / (4 * x_x)], axis=-1)
    # Candidate built from y.
    y_y = safe_sqrt(qy2) / 2.0
    cand_y = jnp.stack([
        (m02 - m20) / (4 * y_y), (m01 + m10) / (4 * y_y), y_y,
        (m12 + m21) / (4 * y_y)], axis=-1)
    # Candidate built from z.
    z_z = safe_sqrt(qz2) / 2.0
    cand_z = jnp.stack([
        (m10 - m01) / (4 * z_z), (m02 + m20) / (4 * z_z),
        (m12 + m21) / (4 * z_z), z_z], axis=-1)

    # Pick the candidate with the largest squared pivot.
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    quat = jnp.take_along_axis(
        cands, idx[..., None, None].astype(jnp.int32), axis=-2).squeeze(-2)
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    # Canonicalize sign (w >= 0).
    return quat * jnp.where(quat[..., :1] < 0, -1.0, 1.0)


def quat_to_aa(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternions (..., 4) -> axis-angle (..., 3)."""
    w = jnp.clip(quat[..., 0], -1.0, 1.0)
    xyz = quat[..., 1:]
    # zero-safe norm: jnp.linalg.norm's gradient is NaN at exactly 0
    # (identity rotation) and a downstream where() does not mask it
    s2 = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    pos = s2 > 0
    sin_half = jnp.sqrt(jnp.where(pos, s2, 1.0)) * pos
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], w)[..., None]
    # Near angle==0 the axis is ill-defined; the small-angle limit of
    # axis*angle is 2*xyz/w, so fall back to that first-order expression.
    axis = xyz / jnp.maximum(sin_half, 1e-12)
    small = sin_half < 1e-6
    return jnp.where(small, 2.0 * xyz, axis * angle)


def rotmat_to_aa(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3).

    Replaces torchgeometry.rotation_matrix_to_angle_axis (used by the
    reference at tuch/train/train_module.py:211 and tuch/train/fits_dict.py).
    """
    return quat_to_aa(rotmat_to_quat(R))


def rot_z_deg(deg: jnp.ndarray) -> jnp.ndarray:
    """In-image-plane rotation matrix about +z by ``-deg`` degrees.

    This matches the augmentation convention of the reference
    (tuch/utils/imutils.py:135-140): a crop rotated by ``rot`` degrees
    requires rotating the global orientation by R_z(-rot).
    """
    rad = -jnp.deg2rad(deg)
    c, s = jnp.cos(rad), jnp.sin(rad)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([s, c, z], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)


def rot_aa(aa: jnp.ndarray, deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate global-orientation axis-angle params by ``deg`` image degrees.

    Pure-JAX, batched replacement for the per-sample cv2.Rodrigues loop in
    tuch/utils/imutils.py:135-146 and tuch/train/fits_dict.py:97-119.
    aa: (..., 3), deg: broadcastable to aa.shape[:-1].
    """
    R = rot_z_deg(deg)
    per = batch_rodrigues(aa)
    return rotmat_to_aa(R @ per)


def flip_pose(pose: jnp.ndarray, flip_perm: jnp.ndarray) -> jnp.ndarray:
    """Flip SMPL pose parameters (..., 72) left<->right.

    flip_perm is constants.SMPL_POSE_FLIP_PERM. The y and z axis-angle
    components are negated (reference: tuch/utils/imutils.py:165-174).
    """
    pose = pose[..., flip_perm]
    sign = jnp.ones((pose.shape[-1],), dtype=pose.dtype)
    sign = sign.at[1::3].set(-1.0).at[2::3].set(-1.0)
    return pose * sign
