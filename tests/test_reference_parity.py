"""Numerical parity against the ACTUAL reference implementation.

Loads the reference's pure-torch/numpy modules straight from
/root/reference (read-only) by file path and compares our JAX ops on the
same inputs -- stronger evidence than reimplemented brute force.
Reference modules used (all dependency-free beyond torch/numpy):
  tuch/utils/contact.py   batch_pairwise_dist, winding_numbers
  tuch/utils/geometry.py  batch_rodrigues, rot6d_to_rotmat,
                          perspective_projection
  tuch/utils/pose_utils.py reconstruction_error (PA-MPJPE)
Skips cleanly if /root/reference or torch is unavailable.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

from tuch_tpu.ops import contact as contact_ops
from tuch_tpu.utils import procrustes, projection, rotations

REF = '/root/reference/tuch/utils'

torch = pytest.importorskip('torch')
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip('reference repo not mounted', allow_module_level=True)


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f'ref_{name}', os.path.join(REF, f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_contact = _load('contact')
ref_geometry = _load('geometry')
ref_pose_utils = _load('pose_utils')


@pytest.fixture(scope='module')
def rng():
    return np.random.RandomState(7)


def test_pairwise_dist_matches_reference_fp64(rng):
    """Our direct-difference distances vs the reference's Gram form run in
    float64 (the reference's own fp32 Gram form cancels at near-contact
    distances; fp64 makes it the ground truth)."""
    x = rng.randn(2, 64, 3).astype(np.float32)
    ref = ref_contact.batch_pairwise_dist(
        torch.tensor(x, dtype=torch.float64),
        torch.tensor(x, dtype=torch.float64), use_cuda=False).numpy()
    ours = np.asarray(contact_ops.pairwise_dist2(jnp.asarray(x),
                                                 jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_winding_numbers_match_reference(rng):
    """Winding numbers on a posed synthetic body vs the reference's
    torch implementation (float64 ground truth)."""
    from tuch_tpu import assets as assets_mod
    from tuch_tpu.models.smpl import smpl_forward_pose72

    model, extras = assets_mod.synthetic_smpl(num_verts=170, seed=0)
    pose = jnp.asarray((rng.randn(2, 72) * 0.2).astype(np.float32))
    verts = np.asarray(smpl_forward_pose72(
        model, jnp.zeros((2, 10)), pose).vertices)
    faces = np.asarray(model.faces)

    tris64 = torch.tensor(verts, dtype=torch.float64)[:, faces.astype(int)]
    ref = ref_contact.winding_numbers(
        torch.tensor(verts, dtype=torch.float64), tris64).numpy()
    ours = np.asarray(contact_ops.winding_numbers_same_tris(
        jnp.asarray(verts), jnp.asarray(verts), jnp.asarray(faces),
        block_f=128))
    np.testing.assert_allclose(ours, ref, atol=2e-4)
    # the in/out decisions at the reference threshold must be identical
    np.testing.assert_array_equal(ours > 0.99, ref > 0.99)


def test_batch_rodrigues_matches_reference(rng):
    aa = (rng.randn(17, 3) * 1.3).astype(np.float32)
    ref = ref_geometry.batch_rodrigues(torch.tensor(aa)).numpy()
    ours = np.asarray(rotations.batch_rodrigues(jnp.asarray(aa)))
    np.testing.assert_allclose(ours, ref.reshape(ours.shape), atol=2e-6)


def test_rot6d_matches_reference(rng):
    x = rng.randn(11, 144).astype(np.float32)
    ref = ref_geometry.rot6d_to_rotmat(torch.tensor(x)).numpy()
    ours = np.asarray(rotations.rot6d_to_rotmat(
        jnp.asarray(x.reshape(11, 24, 6)))).reshape(ref.shape)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_perspective_projection_matches_reference(rng):
    B, N = 3, 49
    pts = rng.randn(B, N, 3).astype(np.float32) + np.array([0, 0, 20],
                                                           np.float32)
    rot = np.tile(np.eye(3, dtype=np.float32)[None], (B, 1, 1))
    t = rng.randn(B, 3).astype(np.float32) * 0.1
    cc = np.full((B, 2), 112.0, np.float32)
    ref = ref_geometry.perspective_projection(
        torch.tensor(pts), torch.tensor(rot), torch.tensor(t),
        torch.tensor(5000.0), torch.tensor(cc)).numpy()
    ours = np.asarray(projection.perspective_projection(
        jnp.asarray(pts), jnp.asarray(rot), jnp.asarray(t), 5000.0,
        jnp.asarray(cc)))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_reconstruction_error_matches_reference(rng):
    B, J = 4, 14
    s1 = rng.randn(B, J, 3).astype(np.float32)
    s2 = s1 * 0.9 + rng.randn(B, J, 3).astype(np.float32) * 0.05
    ref = ref_pose_utils.reconstruction_error(s1.copy(), s2.copy(),
                                              reduction=None)
    ours = np.asarray(procrustes.reconstruction_error(
        jnp.asarray(s1), jnp.asarray(s2), reduction=None))
    # fp32 SVD vs the reference's fp64 numpy SVD: ~1e-4 absolute noise
    np.testing.assert_allclose(ours, np.asarray(ref), atol=5e-4)
