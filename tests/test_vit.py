"""ViT backbone tests: posemb, shapes, HMR integration, TP sharding.

The ViT backbone is an opt-in capability EXTENSION beyond the reference's
single ResNet-50 (tuch/models/hmr.py:27-130); see models/vit.py for the
rationale (matmul-shaped MXU work vs the measured ~23% conv ceiling).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tuch_tpu import assets
from tuch_tpu.models import hmr as H
from tuch_tpu.models import vit as V
from tuch_tpu.parallel import mesh as pmesh


def make_vit_hmr(backbone='vit_t8'):
    _, extras = assets.synthetic_smpl(num_verts=170)
    return H.create_hmr(extras.mean_pose6d, extras.mean_shape,
                        extras.mean_cam, backbone=backbone)


def test_posemb_shape_and_range():
    pe = np.asarray(V.sincos_posemb_2d(4, 6, 64))
    assert pe.shape == (24, 64)
    assert pe.dtype == np.float32
    assert np.all(np.abs(pe) <= 1.0 + 1e-6)
    # row coordinate lives in the first half, column in the second:
    # tokens in the same grid row share the first half exactly
    row0 = pe[:6, :32]
    np.testing.assert_allclose(row0, np.tile(row0[:1], (6, 1)), atol=0)
    # distinct positions get distinct embeddings
    assert len({tuple(np.round(r, 6)) for r in pe}) == 24


def test_posemb_dim_divisibility():
    with pytest.raises(AssertionError):
        V.sincos_posemb_2d(2, 2, 30)


def test_vit_forward_shape_and_patch_check():
    vit = V.create_vit('vit_t8')
    x = jnp.ones((2, 32, 32, 3))
    params = vit.init(jax.random.PRNGKey(0), x)
    y = vit.apply(params, x)
    assert y.shape == (2, 64)
    assert y.dtype == jnp.float32
    with pytest.raises(ValueError, match='divisible'):
        vit.apply(params, jnp.ones((1, 33, 33, 3)))


def test_vit_resolution_polymorphic():
    """Same params serve any patch-divisible resolution (fixed sin-cos
    posemb, mean pooling) -- mirrors the ResNet path's init-at-64 trick."""
    vit = V.create_vit('vit_t8')
    params = vit.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    y = vit.apply(params, jnp.ones((1, 64, 64, 3)))
    assert y.shape == (1, 64)
    assert np.isfinite(np.asarray(y)).all()


def test_hmr_vit_backbone_end_to_end():
    model = make_vit_hmr()
    variables = H.init_hmr(model, jax.random.PRNGKey(0), img_res=64)
    assert 'batch_stats' not in variables  # BN-free backbone
    x = jnp.linspace(0, 1, 2 * 64 * 64 * 3).reshape(2, 64, 64, 3)
    rotmat, betas, cam = model.apply(variables, x, train=False)
    assert rotmat.shape == (2, 24, 3, 3)
    assert betas.shape == (2, 10)
    assert cam.shape == (2, 3)
    eye = np.einsum('bjik,bjlk->bjil', np.asarray(rotmat),
                    np.asarray(rotmat))
    np.testing.assert_allclose(
        eye, np.tile(np.eye(3), (2, 24, 1, 1)), atol=1e-4)
    # train-mode apply with the module-level batch_stats plumbing: no
    # batch_stats collection exists, mutable call must still work
    (r2, _, _), state = model.apply(
        {'params': variables['params'], 'batch_stats': {}}, x, train=True,
        mutable=['batch_stats'], rngs={'dropout': jax.random.PRNGKey(1)})
    assert r2.shape == (2, 24, 3, 3)
    assert dict(state).get('batch_stats', {}) == {}


def test_hmr_vit_gradients_finite():
    model = make_vit_hmr()
    variables = H.init_hmr(model, jax.random.PRNGKey(0), img_res=64)
    x = jnp.ones((1, 32, 32, 3)) * 0.3

    def loss(params):
        rotmat, betas, cam = model.apply({'params': params}, x, train=False)
        return (rotmat.sum() + betas.sum() + cam.sum())

    g = jax.grad(loss)(variables['params'])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the backbone actually receives gradient (not dead through the head)
    gb = jax.tree_util.tree_leaves(g['backbone'])
    assert max(float(jnp.max(jnp.abs(l))) for l in gb) > 0


def test_hmr_rejects_resnet_transforms_on_vit():
    _, extras = assets.synthetic_smpl(num_verts=170)
    x = jnp.ones((1, 32, 32, 3))
    for kw in ({'stem_s2d': True}, {'bn_fold': True}):
        model = H.create_hmr(extras.mean_pose6d, extras.mean_shape,
                             extras.mean_cam, backbone='vit_t8', **kw)
        with pytest.raises(ValueError, match='ResNet-specific'):
            model.init({'params': jax.random.PRNGKey(0),
                        'dropout': jax.random.PRNGKey(0)}, x)
    with pytest.raises(ValueError, match='unknown backbone'):
        H.create_hmr(extras.mean_pose6d, extras.mean_shape,
                     extras.mean_cam, backbone='vit_zz').init(
            {'params': jax.random.PRNGKey(0),
             'dropout': jax.random.PRNGKey(0)}, x)


def test_vit_tp_sharding_specs_and_run():
    """qkv/proj + mlp fc1/fc2 pick up the split-then-consume cp layout
    from shard_params_tp and the sharded forward matches the unsharded
    one (GSPMD resolves the layouts; semantics must not change)."""
    model = make_vit_hmr()
    variables = H.init_hmr(model, jax.random.PRNGKey(0), img_res=64)
    mesh = pmesh.make_mesh(dp=4, cp=2)
    sh = pmesh.shard_params_tp(variables['params'], mesh)
    b0 = sh['backbone']['block0']
    assert b0['attn']['qkv']['kernel'].spec == jax.sharding.PartitionSpec(
        None, 'cp')
    assert b0['attn']['proj']['kernel'].spec == jax.sharding.PartitionSpec(
        'cp', None)
    assert b0['fc1']['kernel'].spec == jax.sharding.PartitionSpec(
        None, 'cp')
    assert b0['fc2']['kernel'].spec == jax.sharding.PartitionSpec(
        'cp', None)
    assert b0['ln1']['scale'].spec == jax.sharding.PartitionSpec()

    x = jnp.linspace(-1, 1, 4 * 32 * 32 * 3).reshape(4, 32, 32, 3)
    ref = model.apply(variables, x, train=False)
    params_sh = pmesh.put_tree(variables['params'], sh)
    x_sh = jax.device_put(x, pmesh.batch_sharding(mesh))

    @jax.jit
    def fwd(p, img):
        return model.apply({'params': p}, img, train=False)

    got = fwd(params_sh, x_sh)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_vit_fwd_flops_sanity():
    # hand-check vit_t8 at 32x32: n=16 tokens, c=64, depth 2
    n, c = 16, 64
    per_block = 2 * n * c * (12 * c) + 4 * n * n * c
    embed = 2 * n * (8 * 8 * 3) * c
    assert V.vit_fwd_flops('vit_t8', img_res=32) == 2 * per_block + embed
    # S/16 at 224 is in the ballpark of the published ~9.2 GFLOPs
    assert 6e9 < V.vit_fwd_flops('vit_s16', img_res=224) < 12e9


def test_vit_checkpoint_roundtrip(tmp_path):
    """ViT + --checkpoint path (ADVICE r04 medium): load_variables must not
    touch init_variables['batch_stats'] eagerly -- ViT inits with no
    batch_stats collection, and checkpoints for BN-free backbones carry
    none either."""
    from flax import traverse_util
    from tuch_tpu.train.checkpoint import load_variables

    model = make_vit_hmr()
    variables = H.init_hmr(model, jax.random.PRNGKey(0), img_res=64)
    assert 'batch_stats' not in variables

    # save a params-only npz checkpoint (the .npz pytree format
    # load_pretrained_params reads)
    flat = traverse_util.flatten_dict({'params': variables['params']})
    path = str(tmp_path / 'vit_ckpt.npz')
    np.savez(path, **{'/'.join(k): np.asarray(v) for k, v in flat.items()})

    loaded = load_variables(path, variables)  # must not KeyError
    assert 'batch_stats' not in loaded
    x = jnp.linspace(0, 1, 64 * 64 * 3).reshape(1, 64, 64, 3)
    ref = model.apply(variables, x, train=False)
    got = model.apply(loaded, x, train=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fold_batchnorm_clear_error_without_bn():
    model = make_vit_hmr()
    variables = H.init_hmr(model, jax.random.PRNGKey(0), img_res=64)
    with pytest.raises(ValueError, match='ResNet-specific'):
        H.fold_batchnorm(variables)
