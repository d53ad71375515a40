"""End-to-end extractor tests on synthetic RAW trees.

Each test writes a miniature raw dataset in the exact on-disk layout the
extractor reads (reference: tuch/datasets/preprocess/*) and checks the
semantic invariants of the produced .pt database.
"""

import os
import joblib
import numpy as np

from tuch_tpu.data.preprocess import synthetic_raw as sr
from tuch_tpu.data.preprocess.dsc import (read_df_subset, read_lsp_subset,
                                          contact_vector)
from tuch_tpu.data.preprocess.mtp import mtp_extract
from tuch_tpu.data.preprocess.pw3d import pw3d_extract, _aa_to_R
from tuch_tpu.data.preprocess.mpi_inf_3dhp import (mpi_inf_3dhp_extract,
                                                   JOINTS_IDX)


def test_dsc_df_extract(tmp_path):
    dirs = sr.write_dsc_raw(str(tmp_path / 'raw'), n_df=4)
    out = read_df_subset(dirs['dsc_dir'], dirs['df_img_dir'],
                         str(tmp_path))
    db = joblib.load(out)
    assert len(db['imgname']) == 4
    classes = sr._bodypart_classes()
    # contact vector marks exactly the annotated pair (+ its mirror in
    # the mirrored vector)
    vec, vec_m = contact_vector(['leftHand_rightHand'], classes)
    np.testing.assert_array_equal(db['contact_vec_pc'][0], vec)
    np.testing.assert_array_equal(db['contact_vec_mirror_pc'][0], vec_m)
    assert vec.sum() == 1 and vec_m.sum() == 1
    # mirror of a left/right-symmetric pair is the same class
    np.testing.assert_array_equal(vec, vec_m)
    assert all(np.asarray(db['scale']) > 0)


def test_dsc_lsp_mismatch_drops_contact(tmp_path):
    dirs = sr.write_dsc_raw(str(tmp_path / 'raw'), n_lsp=3)
    out = read_lsp_subset(dirs['dsc_dir'], dirs['lsp_img_dir'], 'lsp',
                          str(tmp_path))
    db = joblib.load(out)
    assert len(db['imgname']) == 3
    # sample 0: OpenPose far from GT -> contact dropped, openpose zeroed,
    # GT keypoints kept
    assert not db['has_contact_pc'][0]
    assert db['contact_vec_pc'][0].sum() == 0
    assert np.all(db['openpose'][0] == 0)
    assert db['part'][0][:14, 2].sum() == 14
    # samples 1, 2: aligned -> contact kept
    assert db['has_contact_pc'][1] and db['has_contact_pc'][2]
    assert db['contact_vec_pc'][1].sum() == 1


def test_mtp_extract_folds_camera_rotation(tmp_path):
    raw = sr.write_mtp_raw(str(tmp_path / 'raw'), n=4)
    out = mtp_extract(ds_dir=raw['ds_dir'], out_path=str(tmp_path),
                      mode='train')
    db = joblib.load(out)
    assert len(db['imgname']) == len(raw['split']['train'])
    # genders follow subject_meta (male for odd indices)
    assert db['gender'][:2] == ['f', 'm']
    # sample 0 has camera_rotation 0 -> global orient unchanged;
    # later samples have nonzero rotation folded in
    import pickle
    import os.path as osp
    with open(osp.join(raw['ds_dir'], 'smplify-xmc/smpl/params',
                       raw['names'][1] + '.pkl'), 'rb') as f:
        raw_pose = np.asarray(pickle.load(f)['pose']).reshape(-1)
    assert not np.allclose(db['pose'][1][:3], raw_pose[:3])
    np.testing.assert_allclose(db['pose'][1][3:], raw_pose[3:], atol=1e-7)
    # the body pose is preserved verbatim; val split is disjoint
    out_v = mtp_extract(ds_dir=raw['ds_dir'], out_path=str(tmp_path),
                        mode='val')
    dbv = joblib.load(out_v)
    assert set(dbv['imgname']).isdisjoint(db['imgname'])


def test_pw3d_extract_world_to_cam(tmp_path):
    raw = sr.write_pw3d_raw(str(tmp_path / 'raw'), n_frames=6)
    out = pw3d_extract(dataset_path=raw['ds_dir'], out_path=str(tmp_path),
                       split='test')
    db = joblib.load(out)
    # one camera-invalid frame dropped
    assert len(db['imgname']) == raw['n_expected']
    assert set(db['gender']) == {'m', 'f'}
    # frames with non-identity cam pose have rotated global orientation:
    # R_cam @ R_world == stored R
    import pickle as pkl
    import os.path as osp
    with open(osp.join(raw['ds_dir'], 'sequenceFiles', 'test',
                       'synthseq_00.pkl'), 'rb') as f:
        seq = pkl.load(f)
    i_late = 4  # actor 0, frame 4 (>= F//2 -> rotated camera)
    R_expected = (seq['cam_poses'][i_late][:3, :3]
                  @ _aa_to_R(seq['poses'][0][i_late][:3]))
    R_stored = _aa_to_R(db['pose'][i_late][:3])
    np.testing.assert_allclose(R_stored, R_expected, atol=1e-6)
    assert db['betas'][0].shape == (10,)


def test_mpi_inf_3dhp_extract(tmp_path):
    raw = sr.write_3dhp_raw(str(tmp_path / 'raw'), n_frames=12)
    out_tr = mpi_inf_3dhp_extract(dataset_path=raw['ds_dir'],
                                  out_path=str(tmp_path), mode='train')
    db = joblib.load(out_tr)
    # 12 in-bounds frames in the single video dir, subsample keeps
    # counter % 10 == 1 -> frames 1 and 11
    assert len(db['imgname']) == 2
    # root joint (original 28-joint index 4 -> slot JOINTS_IDX[0]) is
    # zero-centered with confidence 1
    S = db['S'][0]
    np.testing.assert_allclose(S[JOINTS_IDX[0]], [0, 0, 0, 1], atol=1e-9)
    assert db['part'][0][JOINTS_IDX, 2].sum() == 17
    assert np.all(db['has_smpl'] == 0)

    out_te = mpi_inf_3dhp_extract(dataset_path=raw['ds_dir'],
                                  out_path=str(tmp_path), mode='test')
    dbt = joblib.load(out_te)
    assert len(dbt['imgname']) == raw['n_test_expected']
    np.testing.assert_allclose(dbt['S'][0][JOINTS_IDX[0], :3], 0,
                               atol=1e-9)


def test_mpi_inf_3dhp_read_calibration(tmp_path):
    """The calibration parser recovers the synthetic extrinsics exactly
    (reference parser semantics, mpi_inf_3dhp.py:29-43)."""
    from tuch_tpu.data.preprocess.mpi_inf_3dhp import read_calibration
    raw = sr.write_3dhp_raw(str(tmp_path / 'raw'), n_frames=3)
    calib = os.path.join(raw['ds_dir'], 'S1', 'Seq1', 'camera.calibration')
    vid_list = list(range(3)) + list(range(4, 9))
    Ks, Rs, Ts = read_calibration(calib, vid_list)
    assert len(Rs) == 8
    for j, vid in enumerate(vid_list):
        np.testing.assert_allclose(Rs[j], sr.synthetic_3dhp_camera_R(vid),
                                   atol=1e-5)
        np.testing.assert_allclose(Ks[j][0, 0], 1500.0, atol=1e-6)
        # T is converted mm -> m
        np.testing.assert_allclose(Ts[j], [0.1 * vid, -0.05, 3.0],
                                   atol=1e-6)


def test_mpi_inf_3dhp_static_fits_camera_folding(tmp_path):
    """static_fits merge + fold_camera: poses land in the output db; with
    folding the global orient is premultiplied by the video's camera
    rotation (reference computes cam_aa at :109; folding itself is the
    opt-in fix for world-frame fits)."""
    raw = sr.write_3dhp_raw(str(tmp_path / 'raw'), n_frames=12)
    # Plain extraction to learn how many samples are retained.
    base = mpi_inf_3dhp_extract(dataset_path=raw['ds_dir'],
                                out_path=str(tmp_path / 'b'), mode='train')
    n = len(joblib.load(base)['imgname'])
    assert n == 2
    rng = np.random.RandomState(3)
    pose = rng.randn(n, 72) * 0.3
    fits_npz = str(tmp_path / 'mpi_inf_3dhp_spin_fits.npz')
    np.savez(fits_npz, pose=pose, shape=rng.randn(n, 10) * 0.1)

    # Reference semantics: fits merged verbatim, has_smpl defaults to 1.
    out = mpi_inf_3dhp_extract(dataset_path=raw['ds_dir'],
                               out_path=str(tmp_path / 'o1'), mode='train',
                               static_fits=fits_npz)
    db = joblib.load(out)
    np.testing.assert_allclose(db['pose'], pose, atol=1e-12)
    assert np.all(db['has_smpl'] == 1)

    # Folding: retained samples all come from S1/Seq1 video_0.
    out2 = mpi_inf_3dhp_extract(dataset_path=raw['ds_dir'],
                                out_path=str(tmp_path / 'o2'),
                                mode='train', static_fits=fits_npz,
                                fold_camera=True)
    db2 = joblib.load(out2)
    R_cam = sr.synthetic_3dhp_camera_R(0)
    for i in range(n):
        R_expected = R_cam @ _aa_to_R(pose[i, :3])
        np.testing.assert_allclose(_aa_to_R(db2['pose'][i, :3]),
                                   R_expected, atol=1e-5)
        # body pose beyond the global orient is untouched
        np.testing.assert_allclose(db2['pose'][i, 3:], pose[i, 3:],
                                   atol=1e-12)


def test_mpi_inf_3dhp_subsample_one_keeps_all(tmp_path):
    """subsample=1 must keep every in-bounds frame (code-review r03:
    `counter % 1 != 1` dropped everything)."""
    from tuch_tpu.data.preprocess.mpi_inf_3dhp import train_data
    raw = sr.write_3dhp_raw(str(tmp_path / 'raw'), n_frames=5)
    out = train_data(raw['ds_dir'], str(tmp_path), subsample=1)
    db = joblib.load(out)
    assert len(db['imgname']) == 5


def test_pw3d_train_keypoints_coco18(tmp_path):
    """3DPW train export maps the official 18 OpenPose-COCO joints into
    BODY25 slots (code-review r03: the 17-entry MSCOCO map misassigned
    every joint after the nose)."""
    from tuch_tpu import constants
    raw = sr.write_pw3d_raw(str(tmp_path / 'raw'), split='train')
    out = pw3d_extract(dataset_path=raw['ds_dir'],
                       out_path=str(tmp_path), split='train')
    db = joblib.load(out)
    kp = db['openpose'][0]
    assert kp.shape == (25, 3)
    # every mapped BODY25 slot carries a confident joint; unmapped slots
    # (midhip 8, feet 19+) stay zero
    mapped = np.zeros(25, bool)
    mapped[constants.COCO18_TO_BODY25] = True
    assert (kp[mapped, 2] > 0).all()
    assert (kp[~mapped] == 0).all()
