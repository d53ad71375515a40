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
from tests.test_cli_viz import fake_torch_state_dict


def torch_backbone_forward(sd, x):
    """ResNet-50 forward with functional ops, NCHW."""
    import torch.nn.functional as F

    def conv(x, w, stride=1, pad=0):
        return F.conv2d(x, w, stride=stride, padding=pad)

    def bn(x, p):
        return F.batch_norm(x, sd[p + '.running_mean'],
                            sd[p + '.running_var'], sd[p + '.weight'],
                            sd[p + '.bias'], training=False, eps=1e-5)

    x = F.relu(bn(conv(x, sd['conv1.weight'], 2, 3), 'bn1'))
    x = F.max_pool2d(x, 3, 2, 1)
    for li, blocks in enumerate([3, 4, 6, 3], start=1):
        for b in range(blocks):
            pre = f'layer{li}.{b}'
            identity = x
            stride = 2 if (li > 1 and b == 0) else 1
            out = F.relu(bn(conv(x, sd[pre + '.conv1.weight']),
                            pre + '.bn1'))
            out = F.relu(bn(conv(out, sd[pre + '.conv2.weight'], stride,
                                 1), pre + '.bn2'))
            out = bn(conv(out, sd[pre + '.conv3.weight']), pre + '.bn3')
            if pre + '.downsample.0.weight' in sd:
                identity = bn(conv(x, sd[pre + '.downsample.0.weight'],
                                   stride), pre + '.downsample.1')
            x = F.relu(out + identity)
    return x.mean(dim=(2, 3))  # == AvgPool2d(7) for 224 inputs


def torch_ief_head(sd, xf, mean_pose, mean_shape, mean_cam, n_iter=3):
    import torch.nn.functional as F
    B = xf.shape[0]
    pose = mean_pose.expand(B, -1)
    shape = mean_shape.expand(B, -1)
    cam = mean_cam.expand(B, -1)
    for _ in range(n_iter):
        xc = torch.cat([xf, pose, shape, cam], dim=1)
        xc = F.linear(xc, sd['fc1.weight'], sd['fc1.bias'])
        xc = F.linear(xc, sd['fc2.weight'], sd['fc2.bias'])
        pose = F.linear(xc, sd['decpose.weight'], sd['decpose.bias']) + pose
        shape = F.linear(xc, sd['decshape.weight'],
                         sd['decshape.bias']) + shape
        cam = F.linear(xc, sd['deccam.weight'], sd['deccam.bias']) + cam
    return pose, shape, cam


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
