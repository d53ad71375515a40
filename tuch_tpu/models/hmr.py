"""HMR: ResNet-50 backbone + iterative-error-feedback SMPL regressor (Flax).

TPU-native re-implementation of the reference network
(tuch/models/hmr.py:27-183). Differences by design:
  * NHWC layout (TPU-preferred); the torch-checkpoint converter transposes.
  * Global mean pooling instead of a fixed 7x7 AvgPool, numerically identical
    for 224x224 inputs and shape-polymorphic for others.
  * The 3 IEF refinement steps are a static unrolled loop under jit.
  * Optional bfloat16 compute with float32 params for the MXU path.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tuch_tpu.models import vit as vit_mod
from tuch_tpu.utils.rotations import rot6d_to_rotmat

NPOSE = 24 * 6


class Bottleneck(nn.Module):
    """ResNet v1 bottleneck block (1x1 -> 3x3 -> 1x1, expansion 4).

    ``bn_fold=True`` builds the inference-only folded form: biased convs
    and NO BatchNorm modules (use :func:`fold_batchnorm` to convert a
    trained variables tree). Eval-mode BN is an affine per channel, so
    folding it into the conv kernel/bias is exact up to fp reassociation.
    """
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_fold: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.bn_fold:
            norm = lambda name: (lambda y: y)
        else:
            norm = lambda name: nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name)
        bias = self.bn_fold
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=bias, dtype=self.dtype,
                    name='conv1')(x)
        y = norm('bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=bias,
                    dtype=self.dtype, name='conv2')(y)
        y = norm('bn2')(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=bias,
                    dtype=self.dtype, name='conv3')(y)
        y = norm('bn3')(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides,) * 2, use_bias=bias,
                               dtype=self.dtype, name='downsample_conv')(x)
            residual = norm('downsample_bn')(residual)
        return nn.relu(y + residual)


class StemS2D(nn.Module):
    """Space-to-depth form of the 7x7/stride-2 stem conv (exact math).

    The stock stem convolves (H, W, 3) with a 7x7 stride-2 kernel: with
    only 3 input channels the MXU contraction dimension is 3*7=21 of 128
    lanes, so the op is utilization-bound. The MLPerf-style rewrite: pad
    the kernel to 8x8 (zeros), space-to-depth the input 2x2 -> 12
    channels, and run the equivalent 4x4 stride-1 conv (contraction
    12*4=48). Mathematically identical by construction; floating-point
    reassociation differs, so outputs match nn.Conv to fp32 tolerance
    (2e-5 through the full backbone on CPU, tests/test_hmr.py), not
    bitwise.

    Owns the SAME param pytree as the nn.Conv it replaces
    (conv1/kernel, (7, 7, 3, 64) HWIO): checkpoints, the torch
    converter, and export_torch are unaffected.
    """
    dtype: Any = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = x.astype(self.dtype)  # promote like nn.Conv(dtype=...) does
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (7, 7, C, 64), jnp.float32)
        bias = (self.param('bias', nn.initializers.zeros, (64,),
                           jnp.float32).astype(self.dtype)
                if self.use_bias else None)
        if H % 2 or W % 2:  # odd input: the plain conv (same param path)
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (2, 2),
                ((3, 3), (3, 3)), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            return y if bias is None else y + bias
        # pad (3, 5) so windows stay 2-aligned and the array is even-sized;
        # the extra right/bottom zeros are never read by a kept output
        p = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
        hs, ws = (H + 8) // 2, (W + 8) // 2
        s = p.reshape(B, hs, 2, ws, 2, C).transpose(0, 1, 3, 2, 4, 5)
        s = s.reshape(B, hs, ws, 4 * C)
        k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k4 = k8.reshape(4, 2, 4, 2, C, 64).transpose(0, 2, 1, 3, 4, 5)
        k4 = k4.reshape(4, 4, 4 * C, 64)
        y = jax.lax.conv_general_dilated(
            s, k4.astype(self.dtype), (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y = y[:, :H // 2, :W // 2, :]
        return y if bias is None else y + bias


class ResNet50(nn.Module):
    """ResNet-50 feature extractor -> (B, 2048) pooled features."""
    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stem_s2d: bool = False
    bn_fold: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stem_s2d:
            x = StemS2D(dtype=self.dtype, use_bias=self.bn_fold,
                        name='conv1')(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=self.bn_fold,
                        dtype=self.dtype, name='conv1')(x)
        if not self.bn_fold:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (size, feat) in enumerate(
                zip(self.stage_sizes, (64, 128, 256, 512))):
            for j in range(size):
                strides = 2 if (i > 0 and j == 0) else 1
                x = Bottleneck(feat, strides=strides, downsample=(j == 0),
                               dtype=self.dtype, bn_fold=self.bn_fold,
                               name=f'layer{i + 1}_{j}')(x, train=train)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)


class HMR(nn.Module):
    """Iterative SMPL regressor.

    __call__(images (B, H, W, 3)) -> (rotmat (B, 24, 3, 3), betas (B, 10),
    cam (B, 3)). ``mean_params`` = (pose6d (144,), shape (10,), cam (3,))
    initializes the IEF loop (reference buffers: tuch/models/hmr.py:105-111).
    """
    mean_pose6d: np.ndarray
    mean_shape: np.ndarray
    mean_cam: np.ndarray
    n_iter: int = 3
    dtype: Any = jnp.float32
    stem_s2d: bool = False
    bn_fold: bool = False
    # 'resnet50' (the reference architecture) or a tuch_tpu.models.vit
    # config name ('vit_s16', ...) -- an opt-in MXU-oriented extension;
    # the IEF head infers the feature width, so both plug in unchanged.
    backbone: str = 'resnet50'

    @nn.compact
    def __call__(self, images, train: bool = False,
                 init_pose=None, init_shape=None, init_cam=None):
        if self.bn_fold and train:
            raise ValueError('bn_fold is an inference-only transform: '
                             'folded models have no BatchNorm statistics '
                             'to update')
        B = images.shape[0]
        if self.backbone == 'resnet50':
            xf = ResNet50(dtype=self.dtype, stem_s2d=self.stem_s2d,
                          bn_fold=self.bn_fold, name='backbone')(
                images.astype(self.dtype), train=train)
        elif self.backbone in vit_mod.VIT_CONFIGS:
            if self.stem_s2d or self.bn_fold:
                raise ValueError(
                    'stem_s2d / bn_fold are ResNet-specific transforms '
                    f'(backbone={self.backbone!r} has no 7x7 stem and no '
                    'BatchNorm)')
            w, d, h, p = vit_mod.VIT_CONFIGS[self.backbone]
            xf = vit_mod.ViT(width=w, depth=d, heads=h, patch=p,
                             dtype=self.dtype, name='backbone')(
                images.astype(self.dtype), train=train)
        else:
            raise ValueError(
                f'unknown backbone {self.backbone!r}; have resnet50, '
                f'{sorted(vit_mod.VIT_CONFIGS)}')
        xf = xf.astype(jnp.float32)

        pred_pose = (jnp.broadcast_to(jnp.asarray(self.mean_pose6d), (B, NPOSE))
                     if init_pose is None else init_pose)
        pred_shape = (jnp.broadcast_to(jnp.asarray(self.mean_shape), (B, 10))
                      if init_shape is None else init_shape)
        pred_cam = (jnp.broadcast_to(jnp.asarray(self.mean_cam), (B, 3))
                    if init_cam is None else init_cam)

        fc1 = nn.Dense(1024, name='fc1')
        fc2 = nn.Dense(1024, name='fc2')
        drop1 = nn.Dropout(0.5, deterministic=not train)
        drop2 = nn.Dropout(0.5, deterministic=not train)
        small_init = nn.initializers.variance_scaling(
            0.01 ** 2, 'fan_avg', 'uniform')  # xavier_uniform gain=0.01
        decpose = nn.Dense(NPOSE, kernel_init=small_init, name='decpose')
        decshape = nn.Dense(10, kernel_init=small_init, name='decshape')
        deccam = nn.Dense(3, kernel_init=small_init, name='deccam')

        for _ in range(self.n_iter):
            xc = jnp.concatenate([xf, pred_pose, pred_shape, pred_cam],
                                 axis=1)
            # Note: the head is linear->dropout->linear->dropout with no
            # activation, matching the reference regressor head.
            xc = drop1(fc1(xc))
            xc = drop2(fc2(xc))
            pred_pose = decpose(xc) + pred_pose
            pred_shape = decshape(xc) + pred_shape
            pred_cam = deccam(xc) + pred_cam

        rotmat = rot6d_to_rotmat(pred_pose).reshape(B, 24, 3, 3)
        return rotmat, pred_shape, pred_cam


def create_hmr(mean_pose6d, mean_shape, mean_cam, n_iter: int = 3,
               dtype=jnp.float32, stem_s2d: bool = False,
               bn_fold: bool = False, backbone: str = 'resnet50') -> HMR:
    return HMR(mean_pose6d=np.asarray(mean_pose6d, np.float32),
               mean_shape=np.asarray(mean_shape, np.float32),
               mean_cam=np.asarray(mean_cam, np.float32),
               n_iter=n_iter, dtype=dtype, stem_s2d=stem_s2d,
               bn_fold=bn_fold, backbone=backbone)


def fold_batchnorm(variables, eps: float = 1e-5):
    """Fold eval-mode BatchNorm into the preceding convolutions.

    Input: the variables tree of a stock HMR ({'params', 'batch_stats'}).
    Output: variables for ``create_hmr(..., bn_fold=True)`` -- every
    (conv, bn) pair becomes a biased conv with

        kernel' = kernel * g / sqrt(var + eps)
        bias'   = beta - mean * g / sqrt(var + eps)

    and no batch_stats collection remains. This removes ~53 per-channel
    affine ops from the serving graph (reference BN placement:
    /root/reference/tuch/models/hmr.py:27-130). Exact in real arithmetic;
    fp32 reassociation keeps outputs within ~1e-5
    (tests/test_hmr.py::test_bn_fold_equivalence). The IEF head has no
    normalization and passes through unchanged.
    """
    if 'batch_stats' not in variables:
        raise ValueError(
            'fold_batchnorm needs a batch_stats collection; this variables '
            'tree has none (BN-free backbone, e.g. vit_*). --bn_fold is a '
            'ResNet-specific serving transform.')
    params = jax.tree_util.tree_map(np.asarray, dict(variables['params']))
    stats = jax.tree_util.tree_map(np.asarray,
                                   dict(variables['batch_stats']))
    bb, bb_stats = params['backbone'], stats['backbone']

    def fold(conv, bn_p, bn_s):
        s = bn_p['scale'] / np.sqrt(bn_s['var'] + eps)
        return {'kernel': (conv['kernel'] * s).astype(np.float32),
                'bias': (bn_p['bias'] - bn_s['mean'] * s)
                .astype(np.float32)}

    folded_bb = {}
    for name, sub in bb.items():
        if name.startswith('bn'):
            continue  # absorbed into conv1 below
        if name == 'conv1':
            folded_bb[name] = fold(sub, bb['bn1'], bb_stats['bn1'])
        elif name.startswith('layer'):
            blk_s = bb_stats[name]
            folded_bb[name] = {
                cn: fold(sub[cn], sub[bn], blk_s[bn])
                for cn, bn in (('conv1', 'bn1'), ('conv2', 'bn2'),
                               ('conv3', 'bn3'),
                               ('downsample_conv', 'downsample_bn'))
                if cn in sub}
        else:  # pragma: no cover - backbone holds only conv/bn/layer*
            folded_bb[name] = sub
    new_params = {k: v for k, v in params.items() if k != 'backbone'}
    new_params['backbone'] = folded_bb
    return {'params': jax.tree_util.tree_map(jnp.asarray, new_params)}


def init_hmr(model: HMR, rng, img_res: int = 224):
    """Initialize parameters; returns the flax variables dict.

    Parameters are resolution-independent (global mean pooling), so init
    always traces at 64x64 to keep startup fast.
    """
    del img_res
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return model.init({'params': rng, 'dropout': rng}, dummy, train=False)
