"""Tests for the converter, renderer/native rasterizer, eval metrics, and
EFT machinery."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tuch_tpu import assets
from tuch_tpu.models import convert as cv
from tuch_tpu.models import hmr as hmr_mod
from tuch_tpu.viz import native
from tuch_tpu.viz.renderer import Renderer, save_obj


# ---------------------------------------------------------------------------
# Torch checkpoint conversion
# ---------------------------------------------------------------------------

def fake_torch_state_dict():
    """Reference-shaped HMR state dict (keys as in tuch/models/hmr.py)."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(cin, cout, k):
        return rng.randn(cout, cin, k, k).astype(np.float32) * 0.01

    def bn(c, prefix):
        sd[f'{prefix}.weight'] = np.ones(c, np.float32)
        sd[f'{prefix}.bias'] = np.zeros(c, np.float32)
        sd[f'{prefix}.running_mean'] = np.zeros(c, np.float32)
        sd[f'{prefix}.running_var'] = np.ones(c, np.float32)

    sd['conv1.weight'] = conv(3, 64, 7)
    bn(64, 'bn1')
    inplanes = 64
    for stage, (blocks, planes) in enumerate(
            zip([3, 4, 6, 3], [64, 128, 256, 512]), start=1):
        for b in range(blocks):
            pre = f'layer{stage}.{b}'
            sd[f'{pre}.conv1.weight'] = conv(inplanes if b == 0 else
                                             planes * 4, planes, 1)
            bn(planes, f'{pre}.bn1')
            sd[f'{pre}.conv2.weight'] = conv(planes, planes, 3)
            bn(planes, f'{pre}.bn2')
            sd[f'{pre}.conv3.weight'] = conv(planes, planes * 4, 1)
            bn(planes * 4, f'{pre}.bn3')
            if b == 0:
                sd[f'{pre}.downsample.0.weight'] = conv(inplanes,
                                                        planes * 4, 1)
                bn(planes * 4, f'{pre}.downsample.1')
        inplanes = planes * 4
    npose = 24 * 6
    sd['fc1.weight'] = rng.randn(1024, 2048 + npose + 13).astype(
        np.float32) * 0.01
    sd['fc1.bias'] = np.zeros(1024, np.float32)
    sd['fc2.weight'] = rng.randn(1024, 1024).astype(np.float32) * 0.01
    sd['fc2.bias'] = np.zeros(1024, np.float32)
    for name, n in (('decpose', npose), ('decshape', 10), ('deccam', 3)):
        sd[f'{name}.weight'] = rng.randn(n, 1024).astype(np.float32) * 0.01
        sd[f'{name}.bias'] = np.zeros(n, np.float32)
    return sd


def test_convert_state_dict_complete():
    sd = fake_torch_state_dict()
    variables = cv.convert_state_dict(sd)
    _, extras = assets.synthetic_smpl(num_verts=170)
    model = hmr_mod.create_hmr(extras.mean_pose6d, extras.mean_shape,
                               extras.mean_cam)
    missing, extra, bad = cv.verify_against_model(variables, model)
    assert not missing, f'missing params: {missing[:5]}'
    assert not extra, f'extra params: {extra[:5]}'
    assert not bad, f'bad shapes: {bad[:5]}'


def test_converted_model_runs():
    sd = fake_torch_state_dict()
    variables = cv.convert_state_dict(sd)
    _, extras = assets.synthetic_smpl(num_verts=170)
    model = hmr_mod.create_hmr(extras.mean_pose6d, extras.mean_shape,
                               extras.mean_cam)
    x = jnp.zeros((1, 64, 64, 3))
    rotmat, betas, cam = model.apply(variables, x, train=False)
    assert np.isfinite(np.asarray(rotmat)).all()


# ---------------------------------------------------------------------------
# Native rasterizer / renderer
# ---------------------------------------------------------------------------

def test_native_lib_builds():
    lib = native.get_lib()
    assert lib is not None, 'g++ build of native.cpp failed'


def test_rasterize_sphere_coverage(tiny_smpl):
    model, _ = tiny_smpl
    verts = np.asarray(model.v_template) + np.array([0, 0, 3.0],
                                                    np.float32)
    colors = np.tile([0.5, 0.6, 0.7], (verts.shape[0], 1)).astype(
        np.float32)
    rgb, mask = native.rasterize(verts, np.asarray(model.faces), colors,
                                 128, 128, 200.0, 64.0, 64.0)
    # sphere of radius ~0.35-0.9 at z=3 with f=200 covers a central blob
    assert 0.05 < mask.mean() < 0.9
    assert rgb[mask > 0].max() <= 1.0
    assert (rgb[mask > 0] > 0).any()
    # center pixel covered, corner not
    assert mask[64, 64] == 1.0
    assert mask[2, 2] == 0.0


def test_renderer_overlay_and_grid(tiny_smpl):
    model, extras = tiny_smpl
    r = Renderer(focal_length=200.0, img_res=96,
                 faces=np.asarray(model.faces),
                 contact_classes=extras.contact_classes,
                 contact_csig=extras.contact_csig)
    verts = np.asarray(model.v_template)
    img = np.zeros((96, 96, 3), np.float32)
    cv_vec = np.zeros(len(extras.contact_classes))
    cv_vec[0] = 1.0
    out = r.render_over(verts, np.array([0, 0, 3.0]), img,
                        contact_vec=cv_vec)
    assert out.shape == (96, 96, 3)
    assert out.max() > 0
    grid = r.visualize_tbm([verts, verts],
                           [np.array([0, 0, 3.0])] * 2, [img, img])
    assert grid.shape == (96, 192, 3)


def test_save_obj_roundtrip(tmp_path, tiny_smpl):
    model, _ = tiny_smpl
    path = str(tmp_path / 'm.obj')
    save_obj(path, np.asarray(model.v_template), np.asarray(model.faces))
    lines = open(path).read().splitlines()
    nv = sum(1 for l in lines if l.startswith('v '))
    nf = sum(1 for l in lines if l.startswith('f '))
    assert nv == model.v_template.shape[0]
    assert nf == model.faces.shape[0]


# ---------------------------------------------------------------------------
# Eval metrics
# ---------------------------------------------------------------------------

def test_report_contact_subsets():
    from tuch_tpu.eval.evaluate import report_with_contact_subsets
    mpjpe = np.array([0.1, 0.2, 0.3, 0.4])
    recon = np.array([0.05, 0.1, 0.15, 0.2])
    cnc = np.array([0.005, np.inf, 0.02, np.inf])
    out = report_with_contact_subsets(mpjpe, recon, cnc)
    assert out['n_contact'] == 1 and out['n_no_contact'] == 2
    np.testing.assert_allclose(out['mpjpe_contact'], 100.0)
    np.testing.assert_allclose(out['mpjpe_no_contact'], 300.0)
    np.testing.assert_allclose(out['mpjpe_unclear'], 300.0)


# ---------------------------------------------------------------------------
# EFT
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_eft_fit_one_early_stop(tiny_smpl):
    from tuch_tpu.fitting.eft import make_eft_fit_fn
    from tuch_tpu.losses.eft import EFTWeights
    from tests.test_losses import make_contact_assets
    model, extras = tiny_smpl
    hmr = hmr_mod.create_hmr(extras.mean_pose6d, extras.mean_shape,
                             extras.mean_cam)
    variables = hmr_mod.init_hmr(hmr, jax.random.PRNGKey(0), img_res=64)
    ca = make_contact_assets((model, extras))
    fit = make_eft_fit_fn(hmr, model, ca, EFTWeights(), max_steps=4,
                          min_steps=1, early_stop_loss=1e12, img_res=64)
    kp = np.concatenate([np.random.RandomState(0).uniform(-1, 1, (1, 49, 2)),
                         np.ones((1, 49, 1))], -1).astype(np.float32)
    P = len(extras.contact_classes)
    pose, betas, steps, loss = fit(
        variables['params'], variables['batch_stats'],
        jnp.zeros((1, 64, 64, 3)), jnp.asarray(kp), jnp.zeros((1, P)),
        jax.random.PRNGKey(1))
    # early_stop_loss huge -> earliest reference stop: iteration
    # min_steps + 1, i.e. min_steps + 2 completed updates
    assert int(steps) == 3
    assert pose.shape == (1, 72)


def test_eft_merge_shards(tmp_path):
    from tuch_tpu.fitting.eft import merge_shards
    base = {'imgname': np.array(['a', 'b', 'c'])}
    f1 = str(tmp_path / 's0.npz')
    np.savez(f1, pose=np.eye(3, 72, dtype=np.float32) * 5,
             betas=np.ones((3, 10)), indices=np.array([0, 2]))
    out = merge_shards([f1, str(tmp_path / 'missing.npz')], base,
                       str(tmp_path / 'merged.pt'))
    import joblib
    db = joblib.load(out)
    assert db['pose'][0, 0] == 5
    assert db['pose'][1].sum() == 0  # untouched (missing shard tolerated)


def test_torch_checkpoint_roundtrip(tmp_path):
    """flax -> reference-named torch .pt -> flax returns the exact tree
    (so checkpoints trained here load in the reference implementation)."""
    import numpy as np
    import jax
    from tuch_tpu.models import convert, hmr as hmr_mod

    model = hmr_mod.create_hmr(np.zeros(144, np.float32),
                               np.zeros(10, np.float32),
                               np.ones(3, np.float32))
    variables = hmr_mod.init_hmr(model, jax.random.PRNGKey(1), img_res=64)

    path = tmp_path / 'ours.pt'
    convert.save_torch_checkpoint(
        variables, str(path),
        mean_params=(np.zeros(144), np.zeros(10), np.ones(3)),
        epoch=3, total_step_count=7)

    import torch
    ckpt = torch.load(str(path), map_location='cpu', weights_only=False)
    assert ckpt['epoch'] == 3 and ckpt['total_step_count'] == 7
    sd = ckpt['model']
    # reference-style key spellings present
    assert 'conv1.weight' in sd and 'bn1.running_mean' in sd
    assert 'layer1.0.conv1.weight' in sd
    assert 'layer1.0.downsample.0.weight' in sd
    assert 'decpose.weight' in sd and 'init_pose' in sd
    assert sd['conv1.weight'].shape == (64, 3, 7, 7)  # OIHW

    back = convert.convert_state_dict(sd)
    flat_a = convert._flatten(variables['params'])
    flat_b = convert._flatten(back['params'])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)
    flat_sa = convert._flatten(variables['batch_stats'])
    flat_sb = convert._flatten(back['batch_stats'])
    assert set(flat_sa) == set(flat_sb)
    for k in flat_sa:
        np.testing.assert_array_equal(np.asarray(flat_sa[k]),
                                      np.asarray(flat_sb[k]), err_msg=k)


def test_export_torch_cli_from_orbax(tmp_path):
    """Orbax train checkpoint -> export_torch CLI -> reference-format .pt
    whose converted-back params equal the originals."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from tuch_tpu.models import convert, hmr as hmr_mod
    from tuch_tpu.train.checkpoint import CheckpointManager
    from tuch_tpu.train.module import TrainState
    from tuch_tpu.cli.export_torch import main as export_main

    model = hmr_mod.create_hmr(np.zeros(144, np.float32),
                               np.zeros(10, np.float32),
                               np.ones(3, np.float32))
    variables = hmr_mod.init_hmr(model, jax.random.PRNGKey(2), img_res=64)
    opt = optax.adam(1e-4)
    state = TrainState(params=variables['params'],
                       batch_stats=variables['batch_stats'],
                       opt_state=opt.init(variables['params']),
                       fits=jnp.zeros((2, 82)),
                       rng=jax.random.PRNGKey(0),
                       step=jnp.asarray(5, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / 'ckpts'))
    ckpt_path = mgr.save(state, loader_state={})

    out_pt = str(tmp_path / 'exported.pt')
    export_main(['--checkpoint', ckpt_path, '--out', out_pt])

    import torch
    ckpt = torch.load(out_pt, map_location='cpu', weights_only=False)
    assert ckpt['total_step_count'] == 5
    back = convert.convert_state_dict(ckpt['model'])
    flat_a = convert._flatten(jax.device_get(variables['params']))
    flat_b = convert._flatten(back['params'])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)


def test_render_over_matches_projection_convention(tiny_smpl):
    """The rasterized silhouette must land exactly where the training
    projection (py = f*Y/Z + cy) puts the body -- a historical y-flip
    rendered every overlay vertically mirrored."""
    from tuch_tpu.viz.renderer import Renderer
    from tuch_tpu.models.smpl import smpl_forward_pose72
    model, _ = tiny_smpl
    out = smpl_forward_pose72(model, jnp.zeros((1, 10)),
                              jnp.zeros((1, 72)))
    v = np.asarray(out.vertices[0])
    cam_t = np.array([0, 0.35, 50.0], np.float32)  # off-center body
    r = Renderer(img_res=224, faces=np.asarray(model.faces))
    rows = r.focal_length * (v[:, 1] + cam_t[1]) / cam_t[2] + 112
    rend = r.render_over(v, cam_t, np.zeros((224, 224, 3), np.float32))
    mask_rows = np.where((rend.sum(-1) > 0.01).any(axis=1))[0]
    assert abs(mask_rows.min() - max(rows.min(), 0)) < 4
    assert mask_rows.max() == 223  # extends past the bottom edge


@pytest.mark.slow
def test_fit_eft_cli_end_to_end_synthetic(tmp_path):
    """The whole fit_eft entry point at toy scale: parse -> runtime ->
    dataset -> per-exemplar fits -> shard dump."""
    from tuch_tpu.cli.fit_eft import main as eft_main
    eft_main(['--name', 'eftsmoke', '--ds_names', 'dsc_df',
              '--synthetic', '--synthetic_num_verts', '170',
              '--img_res', '64', '--cbs', '2', '--max_steps', '3',
              '--out_dir', str(tmp_path)])
    import glob as _glob
    outs = _glob.glob(str(tmp_path / '*.npz'))
    assert outs, 'no shard output written'
    d = np.load(outs[0])
    assert d['pose'].shape[1] == 72 and d['betas'].shape[1] == 10


@pytest.mark.slow
def test_eval_cli_end_to_end_synthetic(tmp_path, capsys):
    """The whole eval entry point at toy scale (synthetic 3dpw)."""
    from tuch_tpu.cli.eval import main as eval_main
    eval_main(['--synthetic', '--synthetic_num_verts', '170',
               '--dataset', '3dpw', '--batch_size', '4',
               '--synthetic_samples', '8', '--num_workers', '0'])
    out = capsys.readouterr().out
    assert 'mpjpe' in out.lower()


def test_crop_image_native_matches_numpy(monkeypatch):
    """The C++ affine warp and the numpy fallback must produce the same
    crop (both share the new bbox pre-slice), incl. rotation and
    partially-out-of-bounds boxes -- otherwise training inputs would
    silently differ between hosts with and without the native lib."""
    from tuch_tpu.data import transforms as T
    from tuch_tpu.viz import native as native_mod
    if native_mod.get_lib() is None:  # pragma: no cover
        import pytest as _pytest
        _pytest.skip('native lib unavailable')
    rng = np.random.RandomState(0)
    img = (rng.rand(180, 200, 3) * 255).astype(np.uint8)
    cases = [((100, 90), 0.5, 0.0),      # interior
             ((100, 90), 0.5, 25.0),     # rotated
             ((10, 10), 0.4, 0.0),       # partially outside (top-left)
             ((195, 175), 0.3, -40.0)]   # partially outside + rotated
    for center, scale, rot in cases:
        a = T.crop_image(img, center, scale, (64, 64), rot=rot)
        with monkeypatch.context() as m:
            m.setattr(native_mod, 'get_lib', lambda: None)
            b = T.crop_image(img, center, scale, (64, 64), rot=rot)
        np.testing.assert_allclose(a, b, atol=0.51,  # 1/2 LSB of uint8
                                   err_msg=f'{center} {scale} {rot}')


def test_exported_checkpoint_runs_in_torch_reference_graph():
    """Strongest interop check: our flax weights, exported with the
    reference key names, run through the functional-torch REFERENCE
    graph and reproduce our own forward to fp tolerance."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tuch_tpu.models import convert, hmr as hmr_mod, torch_ref

    mean_pose = np.tile(np.array([1, 0, 0, 1, 0, 0], np.float32), 24)
    mean_shape = np.zeros(10, np.float32)
    mean_cam = np.array([0.9, 0, 0], np.float32)
    model = hmr_mod.create_hmr(mean_pose, mean_shape, mean_cam)
    variables = hmr_mod.init_hmr(model, jax.random.PRNGKey(3), img_res=64)

    sd = convert.convert_to_torch_state_dict(
        jax.device_get(variables))
    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32) * 0.2

    pose_t, betas_t, cam_t = torch_ref.torch_hmr_forward(
        sd, imgs, mean_pose, mean_shape, mean_cam)

    rotmat_j, betas_j, cam_j = model.apply(variables, jnp.asarray(imgs),
                                           train=False)
    from tuch_tpu.utils.rotations import rot6d_to_rotmat
    rotmat_t = np.asarray(rot6d_to_rotmat(jnp.asarray(pose_t)))
    np.testing.assert_allclose(rotmat_t.reshape(2, 24, 3, 3),
                               np.asarray(rotmat_j), atol=5e-4)
    np.testing.assert_allclose(np.asarray(betas_t),
                               np.asarray(betas_j), atol=5e-4)
    np.testing.assert_allclose(np.asarray(cam_t),
                               np.asarray(cam_j), atol=5e-4)


def test_merged_eft_db_loads_as_training_dataset(tmp_path):
    """The EFT merge output must round-trip into TuchDataset as a
    dsc_*_eft training db (the reference trains on these files with
    '--ds_names dsc_eft ...')."""
    import tempfile
    from tuch_tpu.fitting.eft import merge_shards
    from tuch_tpu.data.dataset import TuchDataset, synthetic_db
    from tuch_tpu import config as cfgmod
    import joblib

    d = tempfile.mkdtemp()
    base = synthetic_db(6, img_dir=d, seed=0, num_contact_classes=3)
    shard = str(tmp_path / 's0.npz')
    rng = np.random.RandomState(0)
    np.savez(shard, pose=rng.randn(6, 72).astype(np.float32),
             betas=rng.randn(6, 10).astype(np.float32),
             indices=np.arange(6))
    out = merge_shards([shard], base,
                       str(tmp_path / 'dsc_df_eft_train.pt'))
    db = joblib.load(out)
    opts = cfgmod.TrainConfig(name='t', log_dir=str(tmp_path),
                              num_workers=0, img_res=64)
    opts.finalize()
    ds = TuchDataset(opts, 'dsc_df_eft', data=db, img_dir=d,
                     num_contact_classes=3)
    s = ds.get(0)
    assert s['pose'].shape == (72,) and s['has_pgt_smpl'] > 0
