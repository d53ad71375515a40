"""SMPL body model as a pure JAX function over a pytree of parameters.

TPU-native replacement for the reference's smplx-backed wrapper
(tuch/models/smpl.py:34-56 plus the smplx package internals it relies on):
shape blendshapes, pose-corrective blendshapes, joint regressor, linear blend
skinning, the 21 surface-vertex "joints", the 9 extra regressed joints, and
the remap to the 49-joint convention. The whole forward is jit/vmap-friendly:
the kinematic-chain walk is unrolled over the (static) 24 joints, and there
are no data-dependent shapes.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tuch_tpu import constants
from tuch_tpu.utils.rotations import batch_rodrigues


class SMPLModel(NamedTuple):
    """Static SMPL parameters (a pytree of arrays).

    Shapes use V = #vertices, F = #faces, J = #skeleton joints (24),
    S = #shape coeffs (10), P = 9*(J-1) pose-corrective features (207).
    """
    v_template: jnp.ndarray      # (V, 3)
    shapedirs: jnp.ndarray       # (V, 3, S)
    posedirs: jnp.ndarray        # (V, 3, P)
    J_regressor: jnp.ndarray     # (J, V)
    lbs_weights: jnp.ndarray     # (V, J)
    parents: np.ndarray          # (J,) int, static (host) array
    faces: jnp.ndarray           # (F, 3) int32
    # Extra joint machinery of the SPIN/TUCH convention:
    vertex_joint_ids: jnp.ndarray   # (21,) int32 surface vertex ids
    J_regressor_extra: jnp.ndarray  # (9, V)
    joint_map: jnp.ndarray          # (49,) int32 into the 54-joint output


class SMPLOutput(NamedTuple):
    vertices: jnp.ndarray    # (B, V, 3)
    joints: jnp.ndarray      # (B, 49, 3)
    joints_smpl: jnp.ndarray  # (B, 24, 3) posed skeleton joints


def _transform_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> homogeneous (..., 4, 4)."""
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                    parents: np.ndarray):
    """Forward-kinematics along the (static) kinematic tree.

    rot_mats: (B, J, 3, 3); joints: (B, J, 3); parents: host int array (J,).
    Returns posed joints (B, J, 3) and per-joint skinning transforms
    (B, J, 4, 4) relative to the rest pose.
    """
    B, J = joints.shape[:2]
    rel = joints.at[:, 1:].add(-joints[:, np.asarray(parents[1:])])
    mats = _transform_mat(rot_mats, rel)  # (B, J, 4, 4)

    chains = [mats[:, 0]]
    for j in range(1, J):
        chains.append(chains[parents[j]] @ mats[:, j])
    A_global = jnp.stack(chains, axis=1)  # (B, J, 4, 4)

    posed_joints = A_global[:, :, :3, 3]
    # Subtract the rest-pose joint contribution: A_rel = A_global - [0 | A R j].
    joints_h = jnp.concatenate([joints, jnp.zeros((B, J, 1))], axis=-1)
    correction = jnp.einsum('bjik,bjk->bji', A_global, joints_h)
    A_rel = A_global.at[:, :, :3, 3].add(-correction[..., :3])
    return posed_joints, A_rel


def smpl_forward(model: SMPLModel,
                 betas: jnp.ndarray,
                 body_pose: jnp.ndarray,
                 global_orient: jnp.ndarray,
                 pose2rot: bool = True) -> SMPLOutput:
    """SMPL forward pass.

    betas: (B, 10). If pose2rot: body_pose (B, 69) and global_orient (B, 3)
    axis-angle; else body_pose (B, 23, 3, 3), global_orient (B, 1, 3, 3)
    rotation matrices (matching the reference call signatures at
    tuch/train/train_module.py:142-146, 202-203).
    """
    B = betas.shape[0]
    J = model.J_regressor.shape[0]

    if pose2rot:
        full_aa = jnp.concatenate(
            [global_orient.reshape(B, 1, 3), body_pose.reshape(B, J - 1, 3)],
            axis=1)
        rot_mats = batch_rodrigues(full_aa)  # (B, J, 3, 3)
    else:
        rot_mats = jnp.concatenate(
            [global_orient.reshape(B, 1, 3, 3),
             body_pose.reshape(B, J - 1, 3, 3)], axis=1)

    # Shape blendshapes.
    v_shaped = model.v_template[None] + jnp.einsum(
        'vds,bs->bvd', model.shapedirs, betas)
    joints_rest = jnp.einsum('jv,bvd->bjd', model.J_regressor, v_shaped)

    # Pose-corrective blendshapes (identity-subtracted rotations, joints 1:).
    eye = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)  # (B, 207)
    v_posed = v_shaped + jnp.einsum('vdp,bp->bvd', model.posedirs, pose_feature)

    posed_joints, A = rigid_transform(rot_mats, joints_rest, model.parents)

    # Linear blend skinning.
    T = jnp.einsum('vj,bjik->bvik', model.lbs_weights, A)  # (B, V, 4, 4)
    verts = jnp.einsum('bvik,bvk->bvi', T[..., :3, :3], v_posed) \
        + T[..., :3, 3]

    # 54-joint output: 24 skeleton + 21 surface verts + 9 extra regressed.
    vertex_joints = verts[:, model.vertex_joint_ids, :]
    extra_joints = jnp.einsum('jv,bvd->bjd', model.J_regressor_extra, verts)
    joints54 = jnp.concatenate([posed_joints, vertex_joints, extra_joints],
                               axis=1)
    joints49 = joints54[:, model.joint_map, :]

    return SMPLOutput(vertices=verts, joints=joints49,
                      joints_smpl=posed_joints)


def smpl_forward_pose72(model: SMPLModel, betas: jnp.ndarray,
                        pose: jnp.ndarray) -> SMPLOutput:
    """Convenience wrapper for 72-dim axis-angle pose vectors (B, 72)."""
    return smpl_forward(model, betas, pose[:, 3:], pose[:, :3], pose2rot=True)


def vertices2joints(J_regressor: jnp.ndarray,
                    vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V), (B, V, 3) -> (B, J, 3)."""
    return jnp.einsum('jv,bvd->bjd', J_regressor, vertices)
