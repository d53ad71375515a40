"""Real-asset runtime integration: build_runtime(synthetic=False) against
a crafted on-disk asset tree in the exact reference layout (docs/DATA.md).

Covers the loaders a switching user hits first: chumpy SMPL pkl, mean
params, GMM prior, geodesics, DSC classes/signature, segment PLYs (ascii
AND binary) + segm_utils exec, HD regressor compaction — plus the
inference-only mode (with_contact=False) that must not require the
contact assets on disk at all.
"""

import os
import pickle
import struct

import numpy as np
import pytest

from tuch_tpu import assets, config as cfg, runtime as rt


def _write_ply(path, verts, red_ids, binary=False):
    """Minimal colored PLY writer (red=255 marks segment vertices)."""
    n = len(verts)
    red = np.zeros(n, np.uint8)
    red[np.asarray(red_ids)] = 255
    fmt = ('binary_little_endian' if binary else 'ascii')
    header = (f'ply\nformat {fmt} 1.0\nelement vertex {n}\n'
              'property float x\nproperty float y\nproperty float z\n'
              'property uchar red\nproperty uchar green\n'
              'property uchar blue\nend_header\n')
    with open(path, 'wb') as f:
        f.write(header.encode())
        for i in range(n):
            x, y, z = (float(v) for v in verts[i])
            if binary:
                f.write(struct.pack('<fffBBB', x, y, z, red[i], 0, 0))
            else:
                f.write(f'{x} {y} {z} {int(red[i])} 0 0\n'.encode())


@pytest.fixture()
def asset_tree(tmp_path, monkeypatch):
    """Full fake data/ tree at the tiny-model scale; patches cfg paths."""
    model0, extras = assets.synthetic_smpl(num_verts=170, seed=0)
    V = model0.v_template.shape[0]
    J = model0.J_regressor.shape[0]

    smpl_dir = tmp_path / 'models' / 'smpl'
    smpl_dir.mkdir(parents=True)
    kintree = np.zeros((2, J), np.int64)
    kintree[0] = np.concatenate([[2 ** 32 - 1], model0.parents[1:]])
    with open(smpl_dir / 'SMPL_NEUTRAL.pkl', 'wb') as f:
        pickle.dump({'v_template': np.asarray(model0.v_template),
                     'shapedirs': np.asarray(model0.shapedirs),
                     'posedirs': np.asarray(model0.posedirs),
                     'J_regressor': np.asarray(model0.J_regressor),
                     'weights': np.asarray(model0.lbs_weights),
                     'kintree_table': kintree,
                     'f': np.asarray(model0.faces)}, f)

    spin = tmp_path / 'essentials' / 'spin'
    spin.mkdir(parents=True)
    np.save(spin / 'J_regressor_extra.npy',
            np.asarray(model0.J_regressor_extra))
    np.savez(spin / 'smpl_mean_params.npz',
             pose=extras.mean_pose6d[None], shape=extras.mean_shape[None],
             cam=extras.mean_cam)
    gmm = assets.synthetic_gmm_prior()
    with open(spin / 'gmm_08.pkl', 'wb') as f:
        pickle.dump({'means': gmm['means'], 'covars': gmm['covs'],
                     'weights': gmm['weights']}, f)

    geo_dir = tmp_path / 'essentials' / 'geodesics' / 'smpl'
    geo_dir.mkdir(parents=True)
    np.save(geo_dir / 'smpl_neutral_geodesic_dist.npy', extras.geodists)

    dsc_root = tmp_path / 'dsc_release'
    dsc_root.mkdir()
    with open(dsc_root / 'classes.pkl', 'wb') as f:
        pickle.dump(extras.contact_classes, f)
    with open(dsc_root / 'ContactSigSMPL.pkl', 'wb') as f:
        pickle.dump(extras.contact_csig, f)

    seg_dir = tmp_path / 'essentials' / 'segments' / 'smpl'
    seg_dir.mkdir(parents=True)
    seg_items = list(extras.segments.items())[:2]
    seg_py = 'segments = {\n'
    for i, (name, seg) in enumerate(seg_items):
        bands = {f'band{k}': list(map(int, b))
                 for k, b in enumerate(seg['bands_verts'])}
        seg_py += f'    {name!r}: {bands!r},\n'
        _write_ply(seg_dir / f'smpl_segment_{name}.ply',
                   np.asarray(model0.v_template), seg['vidx'],
                   binary=(i % 2 == 1))  # cover ascii AND binary readers
    seg_py += '}\n'
    (seg_dir / 'segm_utils.py').write_text(seg_py)

    hd_dir = tmp_path / 'essentials' / 'hd_model' / 'smpl'
    hd_dir.mkdir(parents=True)
    H = 64
    rng = np.random.RandomState(3)
    hd_reg = np.zeros((H, V), np.float32)
    for h in range(H):
        cols = rng.choice(V, 4, replace=False)
        hd_reg[h, cols] = rng.dirichlet(np.ones(4))
    np.save(hd_dir / 'smpl_neutral_hd_vert_regressor.npy', hd_reg)
    with open(hd_dir / 'smpl_neutral_hd_sample_from_mesh_out.pkl',
              'wb') as f:
        pickle.dump({'faces_vert_is_sampled_from':
                     rng.randint(0, model0.faces.shape[0], H)}, f)

    monkeypatch.setattr(cfg, 'SMPL_MODEL_DIR', str(smpl_dir))
    monkeypatch.setattr(cfg, 'JOINT_REGRESSOR_TRAIN_EXTRA',
                        str(spin / 'J_regressor_extra.npy'))
    monkeypatch.setattr(cfg, 'SMPL_MEAN_PARAMS',
                        str(spin / 'smpl_mean_params.npz'))
    monkeypatch.setattr(cfg, 'PRIOR_FOLDER', str(spin))
    monkeypatch.setattr(cfg, 'GEODESICS_SMPL',
                        str(geo_dir / 'smpl_neutral_geodesic_dist.npy'))
    monkeypatch.setattr(cfg, 'DSC_ROOT', str(dsc_root))
    monkeypatch.setattr(cfg, 'SEGMENT_DIR', str(seg_dir))
    monkeypatch.setattr(cfg, 'HD_MODEL_DIR', str(hd_dir))
    return model0, extras, seg_items, hd_reg


def test_build_runtime_real_assets_full(asset_tree):
    model0, extras, seg_items, hd_reg = asset_tree
    runtime = rt.build_runtime(synthetic=False, img_res=64)
    # model round-tripped through the pkl
    np.testing.assert_allclose(np.asarray(runtime.smpl.v_template),
                               np.asarray(model0.v_template))
    np.testing.assert_allclose(np.asarray(runtime.smpl.J_regressor_extra),
                               np.asarray(model0.J_regressor_extra))
    # contact machinery assembled from the on-disk assets
    assert runtime.assets.prior is not None
    assert runtime.assets.contact is not None
    assert runtime.contact_classes == extras.contact_classes
    np.testing.assert_array_equal(
        np.asarray(runtime.assets.contact.geomask),
        extras.geodists > cfg.geothres)
    # segments: PLY red channels (ascii + binary) recovered exactly
    tables = runtime.assets.contact.segment_tables
    assert tables is not None
    # HD compaction keeps the regressor's mass: rows of |bary| sum ~1
    hd = runtime.assets.hd
    assert hd is not None
    np.testing.assert_allclose(np.abs(np.asarray(hd.bary)).sum(-1), 1.0,
                               atol=1e-5)


def test_red_ply_reader_roundtrip(asset_tree, tmp_path):
    model0, extras, seg_items, _ = asset_tree
    for i, (name, seg) in enumerate(seg_items):
        path = os.path.join(cfg.SEGMENT_DIR, f'smpl_segment_{name}.ply')
        got = rt._red_vertices_from_ply(path)
        np.testing.assert_array_equal(np.sort(got), np.sort(seg['vidx']))


@pytest.mark.slow
def test_parity_ref_dump_gate(asset_tree, tmp_path):
    """End-to-end level-1 parity gate: a parity.npz in the schema of
    tools/parity_dump.py, produced here by the reference's functional
    torch graph (models/torch_ref.py) + the crafted on-disk SMPL, must
    pass `parity --checkpoint x.pt --ref_dump parity.npz` (rc 0)."""
    torch = pytest.importorskip('torch')
    import jax.numpy as jnp
    from tests.test_cli_viz import fake_torch_state_dict
    from tuch_tpu.models.smpl import smpl_forward
    from tuch_tpu.models.torch_ref import torch_hmr_forward
    from tuch_tpu.utils.rotations import rot6d_to_rotmat

    model0, extras, _, _ = asset_tree
    sd_np = fake_torch_state_dict()
    ckpt_path = str(tmp_path / 'ckpt.pt')
    torch.save({'model': {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd_np.items()}}, ckpt_path)

    # "reference side": the exact functional reference graph + shared SMPL
    rng = np.random.RandomState(7)
    x = (rng.randn(2, 224, 224, 3) * 0.5).astype(np.float32)
    pose6d, betas, cam = torch_hmr_forward(
        sd_np, x, extras.mean_pose6d, extras.mean_shape, extras.mean_cam)
    rotmat = np.asarray(rot6d_to_rotmat(jnp.asarray(pose6d))).reshape(
        -1, 24, 3, 3)
    verts = np.asarray(smpl_forward(
        model0, jnp.asarray(betas), jnp.asarray(rotmat[:, 1:]),
        jnp.asarray(rotmat[:, :1]), pose2rot=False).vertices)
    records = {'n': np.asarray(2)}
    for i in range(2):
        records[f'img{i}_norm'] = x[i]
        records[f'img{i}_rotmat'] = rotmat[i:i + 1]
        records[f'img{i}_betas'] = betas[i:i + 1]
        records[f'img{i}_cam'] = cam[i:i + 1]
        records[f'img{i}_vertices'] = verts[i:i + 1]
    dump_path = str(tmp_path / 'parity.npz')
    np.savez(dump_path, **records)

    from tuch_tpu.cli import parity
    assert parity.main(['--checkpoint', ckpt_path,
                        '--ref_dump', dump_path]) == 0


def test_build_runtime_inference_only_minimal_assets(asset_tree, tmp_path,
                                                     monkeypatch):
    """with_contact=False must not require contact assets on disk: point
    the contact/segment/HD paths at nonexistent locations and build."""
    gone = str(tmp_path / 'nonexistent')
    monkeypatch.setattr(cfg, 'PRIOR_FOLDER', gone)
    monkeypatch.setattr(cfg, 'GEODESICS_SMPL', gone + '/geo.npy')
    monkeypatch.setattr(cfg, 'DSC_ROOT', gone)
    monkeypatch.setattr(cfg, 'SEGMENT_DIR', gone)
    monkeypatch.setattr(cfg, 'HD_MODEL_DIR', gone)
    runtime = rt.build_runtime(synthetic=False, with_segments=False,
                               with_hd=False, with_contact=False,
                               img_res=64)
    assert runtime.assets.prior is None
    assert runtime.assets.contact is None
    assert runtime.assets.hd is None
    assert runtime.contact_classes == []
    # the inference path still works end to end
    import jax
    import jax.numpy as jnp
    out = runtime.hmr.apply(runtime.variables,
                            jnp.zeros((1, 64, 64, 3)), train=False)
    assert out[0].shape == (1, 24, 3, 3)
