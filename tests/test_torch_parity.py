"""Numerical parity harness: torch reference semantics vs the Flax HMR.

SURVEY.md section 4 calls for dumped (input, output) parity against the
PyTorch reference. The reference's backbone is the stock torchvision
ResNet-50 graph (tuch/models/hmr.py adapts it); here we execute the same
graph with functional torch ops directly from a state dict, convert that
state dict with models/convert.py, and require the Flax model to match to
fp32 tolerance -- covering conv padding/stride semantics, BatchNorm
eps/stats handling, pooling, the IEF head, and the 6d->rotmat conversion.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp

from tuch_tpu import assets
from tuch_tpu.models import convert as cv
from tuch_tpu.models import hmr as hmr_mod
from tuch_tpu.models.torch_ref import (torch_backbone_forward,
                                       torch_ief_head)
from tests.test_cli_viz import fake_torch_state_dict


@pytest.fixture(scope='module')
def parity_setup():
    sd_np = fake_torch_state_dict()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in sd_np.items()}
    variables = cv.convert_state_dict(sd_np)
    _, extras = assets.synthetic_smpl(num_verts=170)
    model = hmr_mod.create_hmr(extras.mean_pose6d, extras.mean_shape,
                               extras.mean_cam)
    return sd, variables, model, extras


def test_backbone_parity_224(parity_setup):
    sd, variables, model, extras = parity_setup
    rng = np.random.RandomState(0)
    x = rng.randn(1, 224, 224, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        xf_t = torch_backbone_forward(
            sd, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    backbone = hmr_mod.ResNet50(name='backbone')
    xf_j = np.asarray(backbone.apply(
        {'params': variables['params']['backbone'],
         'batch_stats': variables['batch_stats']['backbone']},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(xf_j, xf_t, atol=2e-4, rtol=1e-3)


def test_full_hmr_parity_224(parity_setup):
    sd, variables, model, extras = parity_setup
    rng = np.random.RandomState(1)
    x = rng.randn(1, 224, 224, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        xf = torch_backbone_forward(
            sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
        pose_t, shape_t, cam_t = torch_ief_head(
            sd, xf,
            torch.from_numpy(extras.mean_pose6d[None]),
            torch.from_numpy(extras.mean_shape[None]),
            torch.from_numpy(extras.mean_cam[None]))
    rotmat_j, shape_j, cam_j = model.apply(variables, jnp.asarray(x),
                                           train=False)
    np.testing.assert_allclose(np.asarray(shape_j), shape_t.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cam_j), cam_t.numpy(),
                               atol=2e-4, rtol=1e-3)
    # 6d -> rotmat on the torch pose output must match the flax rotmats
    from tuch_tpu.utils.rotations import rot6d_to_rotmat
    rot_from_torch = np.asarray(rot6d_to_rotmat(
        jnp.asarray(pose_t.numpy()))).reshape(1, 24, 3, 3)
    np.testing.assert_allclose(np.asarray(rotmat_j), rot_from_torch,
                               atol=5e-4)


@pytest.mark.slow
def test_parity_cli_network_mode(tmp_path):
    """python -m tuch_tpu.cli.parity --checkpoint x.pt: one-command gate."""
    sd = fake_torch_state_dict()
    _, extras = assets.synthetic_smpl(num_verts=170)
    sd['init_pose'] = extras.mean_pose6d[None]
    sd['init_shape'] = extras.mean_shape[None]
    sd['init_cam'] = extras.mean_cam[None]
    path = str(tmp_path / 'ckpt.pt')
    torch.save({'model': {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd.items()}}, path)
    from tuch_tpu.cli import parity
    assert parity.main(['--checkpoint', path]) == 0


def test_parity_cli_skips_cleanly(monkeypatch, tmp_path):
    from tuch_tpu import config as cfg
    from tuch_tpu.cli import parity
    # An explicitly-passed missing path must NOT silently degrade to SKIP
    # (cli/parity.py contract: typo'd paths error with rc 2).
    assert parity.main(['--checkpoint', '/nonexistent/ckpt.pt']) == 2
    # Same contract inside the --ref_dump branch: a missing dump or a
    # missing checkpoint both yield rc 2 (no crash, no degrade)
    assert parity.main(['--checkpoint', '/nonexistent/ckpt.pt',
                        '--ref_dump', '/nonexistent/parity.npz']) == 2
    dump = tmp_path / 'parity.npz'
    np.savez(str(dump), n=np.asarray(0))
    assert parity.main(['--checkpoint', '/nonexistent/ckpt.pt',
                        '--ref_dump', str(dump)]) == 2
    # Without --checkpoint and with no default asset present, skip cleanly.
    monkeypatch.setattr(cfg, 'SPIN_MODEL_CHECKPOINT', '/nonexistent/spin.pt')
    assert parity.main([]) == 0
