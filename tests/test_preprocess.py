"""Tests for the offline preprocessing helpers and conversion utilities."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tuch_tpu import constants
from tuch_tpu.data.preprocess import dsc, mtp, pw3d


def test_mirror_label():
    assert dsc.mirror_label('leftarm') == 'rightarm'
    assert dsc.mirror_label('rightknee') == 'leftknee'
    assert dsc.mirror_label('head') == 'head'


def test_contact_vector_and_mirror():
    classes = np.array(sorted([sorted(p) for p in
                               [('leftarm', 'rightleg'),
                                ('head', 'leftarm'),
                                ('leftleg', 'rightarm')]]))
    vec, vec_m = dsc.contact_vector(['leftarm_rightleg'], classes)
    # annotated pair set
    idx = np.where(np.all(classes == sorted(['leftarm', 'rightleg']),
                          axis=1))[0]
    assert vec[idx] == 1 and vec.sum() == 1
    # mirrored pair set in the flipped vector
    idx_m = np.where(np.all(classes == sorted(['rightarm', 'leftleg']),
                            axis=1))[0]
    assert vec_m[idx_m] == 1 and vec_m.sum() == 1


def test_bbox_from_openpose_visibility_gate():
    kp = np.zeros((25, 3))
    c, s, ok = dsc.bbox_from_openpose(kp)
    assert not ok
    kp[:, :2] = np.random.RandomState(0).uniform(50, 150, (25, 2))
    kp[:, 2] = 0.9
    c, s, ok = dsc.bbox_from_openpose(kp)
    assert ok and s > 0
    np.testing.assert_allclose(c, kp[:, :2].mean(0), atol=1e-6)


def test_match_op_gt_keypoints():
    rng = np.random.RandomState(0)
    gt = np.zeros((24, 3))
    gt[:12, :2] = rng.uniform(0, 200, (12, 2))
    gt[:12, 2] = 1
    op = np.zeros((25, 3))
    op[dsc.OP_TO_12, :2] = gt[:12, :2] + rng.randn(12, 2) * 1.0
    op[dsc.OP_TO_12, 2] = 0.9
    assert dsc.match_op_gt_keypoints(op, gt, 'lsp')
    op_far = op.copy()
    op_far[dsc.OP_TO_12, :2] += 500
    assert not dsc.match_op_gt_keypoints(op_far, gt, 'lsp')


def test_select_center_person():
    # confidence 0.5 so the distance term matters (score = dist . (1-conf))
    mkkp = lambda center: np.concatenate(
        [np.tile(center, (25, 1)), np.full((25, 1), 0.5)], -1).reshape(-1)
    people = [{'pose_keypoints_2d': mkkp([10, 10]).tolist()},
              {'pose_keypoints_2d': mkkp([100, 100]).tolist()}]
    kp, sel = mtp.select_center_person({'people': people}, (200, 200))
    assert sel == 1  # center of a 200x200 image is (100, 100)


def test_fold_camera_rotation_identity():
    aa = np.array([0.3, -0.2, 0.5])
    out = mtp.fold_camera_rotation(aa, np.zeros(3))
    np.testing.assert_allclose(out, aa, atol=1e-5)


def test_pw3d_rotation_roundtrip():
    rng = np.random.RandomState(0)
    aa = rng.randn(3) * 0.7
    R = pw3d._aa_to_R(aa)
    aa2 = pw3d._R_to_aa(R)
    np.testing.assert_allclose(aa, aa2, atol=1e-6)


def test_coco_to_body25_is_injective():
    for m, n in ((constants.COCO_TO_BODY25, 17),
                 (constants.COCO18_TO_BODY25, 18)):
        assert len(m) == n
        assert len(set(m)) == n
        assert max(m) < 25
    # COCO-18 is OpenPose order: identity through the arm joints, skip
    # the BODY25 midhip slot (8)
    assert constants.COCO18_TO_BODY25[:8] == list(range(8))
    assert 8 not in constants.COCO18_TO_BODY25


def test_error_measures():
    from tuch_tpu.utils.error_measures import mpjae
    pose = np.zeros((2, 72), np.float32)
    pose2 = pose.copy()
    pose2[:, 3] = np.pi / 2  # rotate joint 1 by 90 degrees about x
    out = np.asarray(mpjae(jnp.asarray(pose), jnp.asarray(pose2)))
    np.testing.assert_allclose(out, 90.0 / 24, atol=1e-3)


def test_smplx_to_smpl_vertex_fit(tiny_smpl):
    from tuch_tpu.fitting.smplx_to_smpl import fit_smpl_to_vertices
    model, _ = tiny_smpl
    rng = np.random.RandomState(0)
    gt_pose = jnp.asarray(rng.randn(1, 72).astype(np.float32) * 0.1)
    gt_betas = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.3)
    from tuch_tpu.models.smpl import smpl_forward_pose72
    target = smpl_forward_pose72(model, gt_betas, gt_pose).vertices
    # reference semantics: global orient is FIXED at its init -- seed it
    # with the GT orient (the CLI seeds from the smplx global_orient)
    init = jnp.concatenate([gt_pose[:, :3], jnp.zeros((1, 69))], axis=1)
    res = fit_smpl_to_vertices(model, target, init_pose=init,
                               num_steps=200, lr=2e-2)
    assert float(res.loss[0]) < 5e-2  # mean per-vertex L2 norm
    # the fixed orient came through untouched
    np.testing.assert_array_equal(np.asarray(res.pose[:, :3]),
                                  np.asarray(gt_pose[:, :3]))
    # opt-in deviation: free orient converges from a zero init too
    res2 = fit_smpl_to_vertices(model, target, num_steps=200, lr=2e-2,
                                optimize_global_orient=True, loss='mse')
    assert float(res2.loss[0]) < 1e-3


def test_smplx_to_smpl_cli_synthetic(tmp_path):
    """End-to-end CLI: generated smplx-style pkls -> fitted SMPL pkls in
    the mirrored /smpl/ path, with near-zero vertex error."""
    import pickle
    from tuch_tpu.cli.smplx_to_smpl import main
    main(['--synthetic', '--steps', '800', '--folder', str(tmp_path)])
    outs = sorted((tmp_path / 'smpl' / 'params').glob('*.pkl'))
    assert len(outs) == 2
    with open(outs[0], 'rb') as f:
        d = pickle.load(f)
    assert d['pose'].shape == (72,) and d['betas'].shape == (10,)


def test_vertex_fit_with_translation_offset(tiny_smpl):
    """fit_translation recovers pose/shape from targets with an arbitrary
    global offset (the reference's transl parameter, discarded on save)."""
    from tuch_tpu.fitting.smplx_to_smpl import fit_smpl_to_vertices
    from tuch_tpu.models.smpl import smpl_forward_pose72
    model, _ = tiny_smpl
    rng = np.random.RandomState(1)
    gt_pose = jnp.asarray(rng.randn(1, 72).astype(np.float32) * 0.1)
    gt_betas = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.3)
    target = smpl_forward_pose72(model, gt_betas, gt_pose).vertices
    target = target + jnp.asarray([[[0.5, -1.0, 2.0]]])  # translated
    init = jnp.concatenate([gt_pose[:, :3], jnp.zeros((1, 69))], axis=1)
    res = fit_smpl_to_vertices(model, target, init_pose=init,
                               num_steps=200, lr=2e-2,
                               fit_translation=True)
    assert float(res.loss[0]) < 5e-2
    # without the translation dof the same fit cannot reach the target
    res_no = fit_smpl_to_vertices(model, target, init_pose=init,
                                  num_steps=200, lr=2e-2)
    assert float(res_no.loss[0]) > 1e-1


def test_rotmat_to_aa_np_pi_about_arbitrary_axis():
    """Near-pi extraction must recover axes whose x-component is ~0 (the
    old sign fix-up only handled axis[0] > 0)."""
    from tuch_tpu.data.transforms import aa_to_rotmat_np, rotmat_to_aa_np
    rng = np.random.RandomState(0)
    for ax in ([0, 0.7071068, -0.7071068], [0, 0, 1.0], [0, -1.0, 0],
               rng.randn(3), rng.randn(3)):
        ax = np.asarray(ax, np.float64)
        ax /= np.linalg.norm(ax)
        M = aa_to_rotmat_np(ax * np.pi)
        M2 = aa_to_rotmat_np(rotmat_to_aa_np(M))
        np.testing.assert_allclose(M2, M, atol=1e-5)


def test_crop_image_fully_outside_returns_zeros():
    from tuch_tpu.data.transforms import crop_image
    img = (np.ones((100, 120, 3)) * 50).astype(np.uint8)
    out = crop_image(img, (130, 110), 0.05, (64, 64))
    assert out.shape == (64, 64, 3)
    assert np.all(out == 0)


def test_flip_and_rotation_involutions():
    """flip twice == identity; rotating the global orient by r then -r
    round-trips (the augmentation/fits-writeback pair relies on this)."""
    from tuch_tpu.data.transforms import (flip_kp, flip_pose_np, flip_img,
                                          rot_aa_np)
    rng = np.random.RandomState(0)
    kp = rng.randn(49, 3).astype(np.float32)
    np.testing.assert_allclose(flip_kp(flip_kp(kp)), kp, atol=1e-7)
    pose = (rng.randn(72) * 0.3).astype(np.float32)
    np.testing.assert_allclose(flip_pose_np(flip_pose_np(pose)), pose,
                               atol=1e-7)
    img = rng.rand(8, 6, 3).astype(np.float32)
    np.testing.assert_array_equal(flip_img(flip_img(img)), img)
    aa = (rng.randn(3) * 0.8).astype(np.float32)
    back = rot_aa_np(rot_aa_np(aa, 37.0), -37.0)
    np.testing.assert_allclose(back, aa, atol=1e-5)


def test_uncrop_inverts_crop_inside_region():
    """uncrop(crop(img)) reproduces the source inside the crop region
    (imutils.py:108-133 semantics; nearest-neighbor paste tolerance)."""
    from tuch_tpu.data.transforms import crop_image, uncrop_image
    rng = np.random.RandomState(1)
    # smooth image so bilinear-vs-nearest differences stay small
    base = rng.rand(6, 6, 3).astype(np.float32)
    img = np.kron(base, np.ones((20, 20, 1))).astype(np.float32)
    center, scale = (60, 60), 0.4  # 80x80 region
    crop = crop_image(img, center, scale, (64, 64))
    back = uncrop_image(crop, center, scale, img.shape[:2])
    lo, hi = 60 - 30, 60 + 30  # interior of the crop region
    diff = np.abs(back[lo:hi, lo:hi] - img[lo:hi, lo:hi])
    assert np.median(diff) < 0.05
