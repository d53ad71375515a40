"""Body model tests against a reference numpy LBS implementation."""

import numpy as np
import jax
import jax.numpy as jnp

from tuch_tpu import assets, constants
from tuch_tpu.models import smpl as jsmpl
from tuch_tpu.utils.rotations import batch_rodrigues


def numpy_lbs(model, betas, pose_aa):
    """Straightforward single-sample numpy LBS for cross-checking."""
    v_t = np.asarray(model.v_template)
    sd = np.asarray(model.shapedirs)
    pd = np.asarray(model.posedirs)
    Jr = np.asarray(model.J_regressor)
    W = np.asarray(model.lbs_weights)
    parents = np.asarray(model.parents)

    v_shaped = v_t + np.einsum('vds,s->vd', sd, betas)
    joints = Jr @ v_shaped  # (J, 3)
    R = np.asarray(batch_rodrigues(jnp.asarray(pose_aa.reshape(-1, 3))))
    pose_feat = (R[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + np.einsum('vdp,p->vd', pd, pose_feat)

    J = joints.shape[0]
    G = np.zeros((J, 4, 4))
    for j in range(J):
        t = joints[j] - (joints[parents[j]] if j > 0 else 0)
        local = np.eye(4)
        local[:3, :3] = R[j]
        local[:3, 3] = t
        G[j] = local if j == 0 else G[parents[j]] @ local
    posed_joints = G[:, :3, 3].copy()
    A = G.copy()
    for j in range(J):
        A[j, :3, 3] -= G[j, :3, :3] @ joints[j]
    T = np.einsum('vj,jik->vik', W, A)
    verts = np.einsum('vik,vk->vi', T[:, :3, :3], v_posed) + T[:, :3, 3]
    return verts, posed_joints


def test_smpl_matches_numpy_lbs(tiny_smpl, rng):
    model, _ = tiny_smpl
    betas = rng.randn(10).astype(np.float32) * 0.5
    pose = rng.randn(72).astype(np.float32) * 0.3
    out = jsmpl.smpl_forward_pose72(
        model, jnp.asarray(betas)[None], jnp.asarray(pose)[None])
    v_np, j_np = numpy_lbs(model, betas, pose)
    np.testing.assert_allclose(np.asarray(out.vertices[0]), v_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.joints_smpl[0]), j_np,
                               atol=1e-4)


def test_smpl_rest_pose_is_template(tiny_smpl):
    model, _ = tiny_smpl
    out = jsmpl.smpl_forward_pose72(
        model, jnp.zeros((1, 10)), jnp.zeros((1, 72)))
    np.testing.assert_allclose(np.asarray(out.vertices[0]),
                               np.asarray(model.v_template), atol=1e-5)


def test_smpl_global_rotation_rotates_all(tiny_smpl):
    model, _ = tiny_smpl
    pose = np.zeros(72, np.float32)
    pose[:3] = [0, 0, np.pi / 2]
    out = jsmpl.smpl_forward_pose72(
        model, jnp.zeros((1, 10)), jnp.asarray(pose)[None])
    root = np.asarray(model.J_regressor @ np.asarray(model.v_template))[0]
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    expect = (np.asarray(model.v_template) - root) @ Rz.T + root
    np.testing.assert_allclose(np.asarray(out.vertices[0]), expect, atol=1e-4)


def test_smpl_pose2rot_false_consistency(tiny_smpl, rng):
    model, _ = tiny_smpl
    pose = rng.randn(2, 72).astype(np.float32) * 0.4
    betas = rng.randn(2, 10).astype(np.float32) * 0.3
    out_aa = jsmpl.smpl_forward_pose72(model, jnp.asarray(betas),
                                       jnp.asarray(pose))
    rotmat = batch_rodrigues(jnp.asarray(pose.reshape(2, 24, 3)))
    out_rm = jsmpl.smpl_forward(model, jnp.asarray(betas),
                                rotmat[:, 1:], rotmat[:, :1], pose2rot=False)
    np.testing.assert_allclose(np.asarray(out_aa.vertices),
                               np.asarray(out_rm.vertices), atol=1e-5)


def test_smpl_output_shapes(tiny_smpl):
    model, _ = tiny_smpl
    V = model.v_template.shape[0]
    out = jsmpl.smpl_forward_pose72(model, jnp.zeros((3, 10)),
                                    jnp.zeros((3, 72)))
    assert out.vertices.shape == (3, V, 3)
    assert out.joints.shape == (3, 49, 3)
    assert out.joints_smpl.shape == (3, 24, 3)


def test_smpl_jit_and_grad(tiny_smpl):
    model, _ = tiny_smpl

    @jax.jit
    def loss(pose, betas):
        out = jsmpl.smpl_forward_pose72(model, betas, pose)
        return jnp.sum(out.vertices ** 2)

    g = jax.grad(loss)(jnp.full((1, 72), 0.1), jnp.zeros((1, 10)))
    assert np.isfinite(np.asarray(g)).all()


def test_full_size_synthetic_topology():
    model, _ = assets.synthetic_smpl()  # full size
    assert model.v_template.shape[0] == constants.SMPL_NUM_VERTS
    assert model.faces.shape[0] == constants.SMPL_NUM_FACES
    # Closed 2-manifold: every edge appears exactly twice, once per direction.
    f = np.asarray(model.faces)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    fwd = set(map(tuple, edges))
    assert len(fwd) == len(edges), 'duplicate directed edge -> non-manifold'
    rev = set((b, a) for a, b in fwd)
    assert fwd == rev, 'boundary edges found -> mesh not closed'
