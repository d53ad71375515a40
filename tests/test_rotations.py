"""Unit tests for rotation representations (SURVEY.md section 4: golden-value
and round-trip tests for geometry.py equivalents)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tuch_tpu.utils import rotations as R
from tuch_tpu import constants


def random_aa(rng, n, scale=2.0):
    return (rng.randn(n, 3) * scale).astype(np.float32)


def test_rodrigues_identity():
    out = R.batch_rodrigues(jnp.zeros((4, 3)))
    np.testing.assert_allclose(out, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)


def test_rodrigues_known_axis():
    # 90 degrees about z.
    aa = jnp.array([[0.0, 0.0, np.pi / 2]])
    out = np.asarray(R.batch_rodrigues(aa))[0]
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_rodrigues_orthonormal(rng):
    aa = random_aa(rng, 32)
    out = np.asarray(R.batch_rodrigues(jnp.asarray(aa)))
    eye = np.einsum('bij,bkj->bik', out, out)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(out), 1.0, atol=1e-5)


def test_aa_rotmat_roundtrip(rng):
    aa = random_aa(rng, 64, scale=1.5)
    Rm = R.batch_rodrigues(jnp.asarray(aa))
    aa2 = np.asarray(R.rotmat_to_aa(Rm))
    Rm2 = np.asarray(R.batch_rodrigues(jnp.asarray(aa2)))
    np.testing.assert_allclose(np.asarray(Rm), Rm2, atol=1e-4)


def test_rotmat_to_aa_near_pi(rng):
    # Rotations close to pi exercise the worst-conditioned branch.
    axis = rng.randn(16, 3)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    aa = (axis * (np.pi - 1e-3)).astype(np.float32)
    Rm = R.batch_rodrigues(jnp.asarray(aa))
    aa2 = np.asarray(R.rotmat_to_aa(Rm))
    Rm2 = np.asarray(R.batch_rodrigues(jnp.asarray(aa2)))
    np.testing.assert_allclose(np.asarray(Rm), Rm2, atol=1e-3)


def test_rot6d_identity():
    # 6d layout is row-interleaved: [r11, r12, r21, r22, r31, r32].
    x = jnp.tile(jnp.array([1., 0., 0., 1., 0., 0.]), (3, 1))
    out = np.asarray(R.rot6d_to_rotmat(x))
    np.testing.assert_allclose(out, np.tile(np.eye(3), (3, 1, 1)), atol=1e-6)


def test_rot6d_valid_rotation(rng):
    x = jnp.asarray(rng.randn(20, 6).astype(np.float32))
    out = np.asarray(R.rot6d_to_rotmat(x))
    eye = np.einsum('bij,bkj->bik', out, out)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (20, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(out), 1.0, atol=1e-5)


def test_rot6d_recovers_rotation(rng):
    # Feeding the first two columns of a rotation matrix recovers it.
    aa = random_aa(rng, 10)
    Rm = np.asarray(R.batch_rodrigues(jnp.asarray(aa)))
    x6 = Rm[:, :, :2].reshape(10, 6)
    out = np.asarray(R.rot6d_to_rotmat(jnp.asarray(x6)))
    np.testing.assert_allclose(out, Rm, atol=1e-5)


def test_rot_aa_involution(rng):
    """Rotating by r then by -r returns the original global orientation."""
    aa = random_aa(rng, 8, scale=1.0)
    deg = jnp.asarray(rng.uniform(-45, 45, size=(8,)).astype(np.float32))
    out = R.rot_aa(R.rot_aa(jnp.asarray(aa), deg), -deg)
    Rm1 = np.asarray(R.batch_rodrigues(jnp.asarray(aa)))
    Rm2 = np.asarray(R.batch_rodrigues(out))
    np.testing.assert_allclose(Rm1, Rm2, atol=1e-4)


def test_flip_pose_involution(rng):
    pose = jnp.asarray(rng.randn(6, 72).astype(np.float32))
    perm = jnp.asarray(np.array(constants.SMPL_POSE_FLIP_PERM))
    out = R.flip_pose(R.flip_pose(pose, perm), perm)
    np.testing.assert_allclose(out, pose, atol=1e-6)


def test_flip_perm_is_permutation():
    perm = np.array(constants.SMPL_POSE_FLIP_PERM)
    assert sorted(perm.tolist()) == list(range(72))
    perm49 = np.array(constants.J49_FLIP_PERM)
    assert sorted(perm49.tolist()) == list(range(49))
    perm24 = np.array(constants.J24_FLIP_PERM)
    assert sorted(perm24.tolist()) == list(range(24))


@pytest.mark.slow
def test_rotmat_to_aa_gradient_finite_at_identity():
    """The identity rotation is the worst case: sin(angle/2) == 0 exactly,
    where an unguarded norm has a NaN gradient that a downstream where()
    cannot mask."""
    import jax
    for aa in (np.zeros(3), np.array([1e-8, 0, 0]),
               np.array([np.pi, 0, 0])):
        M = R.batch_rodrigues(jnp.asarray(aa, jnp.float32)[None])
        g = jax.jacobian(lambda m: R.rotmat_to_aa(m).sum())(M)
        assert bool(jnp.all(jnp.isfinite(g))), aa
