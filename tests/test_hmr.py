"""HMR regressor tests: shapes, IEF behavior, train/eval modes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tuch_tpu import assets
from tuch_tpu.models import hmr as H


def make_model():
    _, extras = assets.synthetic_smpl(num_verts=170)
    return H.create_hmr(extras.mean_pose6d, extras.mean_shape,
                        extras.mean_cam)


def test_hmr_output_shapes_and_validity():
    model = make_model()
    variables = H.init_hmr(model, jax.random.PRNGKey(0), img_res=64)
    x = jnp.zeros((2, 64, 64, 3))
    rotmat, betas, cam = model.apply(variables, x, train=False)
    assert rotmat.shape == (2, 24, 3, 3)
    assert betas.shape == (2, 10)
    assert cam.shape == (2, 3)
    # valid rotations
    eye = np.einsum('bjik,bjlk->bjil', np.asarray(rotmat),
                    np.asarray(rotmat))
    np.testing.assert_allclose(
        eye, np.tile(np.eye(3), (2, 24, 1, 1)), atol=1e-4)


def test_hmr_fresh_init_near_mean_params():
    """decpose/decshape/deccam use tiny init, so a fresh model's output
    stays near the mean parameters (reference init gain 0.01,
    tuch/models/hmr.py:93-95)."""
    model = make_model()
    variables = H.init_hmr(model, jax.random.PRNGKey(1), img_res=64)
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    rotmat, betas, cam = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(cam[0]),
                               np.asarray(model.mean_cam), atol=0.3)
    # identity-ish rotations from identity 6d mean
    np.testing.assert_allclose(
        np.asarray(rotmat[0, 0]), np.eye(3), atol=0.3)


def test_hmr_train_mode_updates_batch_stats():
    model = make_model()
    variables = H.init_hmr(model, jax.random.PRNGKey(0), img_res=64)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 64, 64, 3).astype(np.float32))
    (out, new_state) = model.apply(
        variables, x, train=True, mutable=['batch_stats'],
        rngs={'dropout': jax.random.PRNGKey(2)})
    before = jax.tree_util.tree_leaves(variables['batch_stats'])
    after = jax.tree_util.tree_leaves(new_state['batch_stats'])
    changed = any(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed


def test_hmr_ief_uses_init():
    """Passing a different init pose changes the output (IEF loop)."""
    model = make_model()
    variables = H.init_hmr(model, jax.random.PRNGKey(0), img_res=64)
    x = jnp.ones((1, 64, 64, 3))
    r1, _, _ = model.apply(variables, x, train=False)
    init = jnp.asarray(model.mean_pose6d)[None] + 0.5
    r2, _, _ = model.apply(variables, x, train=False, init_pose=init)
    assert not np.allclose(np.asarray(r1), np.asarray(r2), atol=1e-3)


def test_hmr_jit_grad():
    model = make_model()
    variables = H.init_hmr(model, jax.random.PRNGKey(0), img_res=64)

    @jax.jit
    def loss_fn(params, batch_stats, x):
        (rotmat, betas, cam), _ = model.apply(
            {'params': params, 'batch_stats': batch_stats}, x, train=True,
            mutable=['batch_stats'], rngs={'dropout': jax.random.PRNGKey(0)})
        return jnp.sum(rotmat ** 2) + jnp.sum(betas ** 2) + jnp.sum(cam ** 2)

    x = jnp.ones((2, 64, 64, 3))
    g = jax.grad(loss_fn)(variables['params'], variables['batch_stats'], x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


@pytest.mark.slow
def test_hmr_bfloat16_compute():
    """bf16 backbone path produces finite, fp32-typed outputs."""
    import jax.numpy as jnp
    from tuch_tpu import assets
    _, extras = assets.synthetic_smpl(num_verts=170)
    model = H.create_hmr(extras.mean_pose6d, extras.mean_shape,
                         extras.mean_cam, dtype=jnp.bfloat16)
    variables = H.init_hmr(model, jax.random.PRNGKey(0), img_res=64)
    rotmat, betas, cam = model.apply(variables, jnp.ones((2, 64, 64, 3)),
                                     train=False)
    assert rotmat.dtype == jnp.float32  # head runs fp32
    assert np.isfinite(np.asarray(rotmat)).all()
    assert np.isfinite(np.asarray(cam)).all()


@pytest.mark.slow
def test_stem_s2d_equivalence():
    """StemS2D (space-to-depth 7x7/s2 stem) matches nn.Conv: same param
    pytree, same outputs to fp32 reassociation tolerance, exact fallback
    on odd input sizes (models/hmr.py StemS2D)."""
    import jax.tree_util as tu
    rng = np.random.RandomState(0)
    for shape, tol in [((2, 64, 64, 3), 2e-5), ((1, 63, 65, 3), 0.0),
                       ((2, 224, 224, 3), 2e-5)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        m0 = H.ResNet50(stem_s2d=False)
        m1 = H.ResNet50(stem_s2d=True)
        v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
        v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
        assert tu.tree_structure(v1) == tu.tree_structure(v0)
        # S2D applies with the conv-path variables unchanged
        y0 = np.asarray(m0.apply(v0, x, train=False))
        y1 = np.asarray(m1.apply(v0, x, train=False))
        np.testing.assert_allclose(y1, y0, atol=max(tol, 0.0), rtol=0)


@pytest.mark.slow
def test_stem_s2d_gradients_finite():
    """The S2D stem trains: gradients flow and are finite."""
    from tuch_tpu import assets
    _, extras = assets.synthetic_smpl(num_verts=170)
    model = H.create_hmr(extras.mean_pose6d, extras.mean_shape,
                         extras.mean_cam, stem_s2d=True)
    variables = H.init_hmr(model, jax.random.PRNGKey(0), img_res=64)

    def loss_fn(params, batch_stats, x):
        (rotmat, betas, cam), _ = model.apply(
            {'params': params, 'batch_stats': batch_stats}, x, train=True,
            mutable=['batch_stats'], rngs={'dropout': jax.random.PRNGKey(0)})
        return jnp.sum(rotmat ** 2) + jnp.sum(betas ** 2) + jnp.sum(cam ** 2)

    x = jnp.ones((2, 64, 64, 3))
    g = jax.grad(loss_fn)(variables['params'], variables['batch_stats'], x)
    stem_g = np.asarray(g['backbone']['conv1']['kernel'])
    assert stem_g.shape == (7, 7, 3, 64)
    assert np.isfinite(stem_g).all() and np.abs(stem_g).sum() > 0


def test_stem_s2d_bf16_promotes_fp32_input():
    """bf16 S2D stem accepts an fp32 input like nn.Conv(dtype=bf16) does
    (StemS2D casts the input to its compute dtype)."""
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    m = H.ResNet50(dtype=jnp.bfloat16, stem_s2d=True)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert np.isfinite(np.asarray(y, np.float32)).all()


def _randomize_bn(variables, seed=0):
    """Give every BatchNorm non-trivial scale/bias/mean/var so the fold
    test cannot pass vacuously (fresh init has mean=0, var=1, scale=1)."""
    rng = np.random.RandomState(seed)

    def rand_like(path, leaf):
        names = [getattr(p, 'key', getattr(p, 'name', '')) for p in path]
        if not any(str(n).startswith(('bn', 'downsample_bn'))
                   for n in names):
            return leaf
        leaf = np.asarray(leaf)
        last = str(names[-1])
        if last == 'var':
            return jnp.asarray(rng.uniform(0.2, 2.0, leaf.shape)
                               .astype(np.float32))
        return jnp.asarray(rng.randn(*leaf.shape).astype(np.float32) * 0.3
                           + (1.0 if last == 'scale' else 0.0))

    return jax.tree_util.tree_map_with_path(rand_like, variables)


def test_bn_fold_equivalence():
    """fold_batchnorm + bn_fold model == stock eval-mode model, on
    non-trivial BN statistics, to fp32 reassociation tolerance."""
    _, extras = assets.synthetic_smpl(num_verts=170)
    stock = H.create_hmr(extras.mean_pose6d, extras.mean_shape,
                         extras.mean_cam)
    variables = _randomize_bn(
        H.init_hmr(stock, jax.random.PRNGKey(0), img_res=64))
    folded_model = H.create_hmr(extras.mean_pose6d, extras.mean_shape,
                                extras.mean_cam, bn_fold=True)
    folded_vars = H.fold_batchnorm(variables)
    # the folded tree matches the bn_fold model's own init structure
    ref_struct = jax.tree_util.tree_structure(
        H.init_hmr(folded_model, jax.random.PRNGKey(1), img_res=64))
    assert jax.tree_util.tree_structure(folded_vars) == ref_struct

    x = jnp.asarray(np.random.RandomState(3)
                    .randn(2, 64, 64, 3).astype(np.float32))
    r0, b0, c0 = stock.apply(variables, x, train=False)
    r1, b1, c1 = folded_model.apply(folded_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=2e-4)


def test_bn_fold_s2d_stem_compatible():
    """bn_fold composes with the space-to-depth stem (biased StemS2D)."""
    _, extras = assets.synthetic_smpl(num_verts=170)
    stock = H.create_hmr(extras.mean_pose6d, extras.mean_shape,
                         extras.mean_cam)
    variables = _randomize_bn(
        H.init_hmr(stock, jax.random.PRNGKey(0), img_res=64), seed=5)
    folded = H.create_hmr(extras.mean_pose6d, extras.mean_shape,
                          extras.mean_cam, bn_fold=True, stem_s2d=True)
    fv = H.fold_batchnorm(variables)
    x = jnp.asarray(np.random.RandomState(7)
                    .randn(1, 64, 64, 3).astype(np.float32))
    r0, _, _ = stock.apply(variables, x, train=False)
    r1, _, _ = folded.apply(fv, x, train=False)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=2e-4)


def test_bn_fold_rejects_train_mode():
    import pytest
    _, extras = assets.synthetic_smpl(num_verts=170)
    folded = H.create_hmr(extras.mean_pose6d, extras.mean_shape,
                          extras.mean_cam, bn_fold=True)
    with pytest.raises(ValueError, match='inference-only'):
        folded.init({'params': jax.random.PRNGKey(0),
                     'dropout': jax.random.PRNGKey(0)},
                    jnp.zeros((1, 64, 64, 3)), train=True)
