"""Integration tests: fits store round-trips, data pipeline, 1-step train
on a synthetic dataset (SURVEY.md section 4 integration-test plan)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tuch_tpu import config as cfgmod
from tuch_tpu import runtime as rt
from tuch_tpu.data.dataset import TuchDataset, synthetic_db
from tuch_tpu.data.loader import CheckpointLoader, LoaderState, \
    add_fits_indices
from tuch_tpu.data.mixed import MixedDataset, expand_meta_names
from tuch_tpu.train import fits_store
from tuch_tpu.utils.rotations import batch_rodrigues


# ---------------------------------------------------------------------------
# Fits store
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_fits_lookup_update_roundtrip(rng):
    """get/set round-trip under flip+rotation (fits_dict involution)."""
    N, B = 20, 6
    params = jnp.asarray(rng.randn(N, 82).astype(np.float32) * 0.3)
    gidx = jnp.asarray(np.arange(B, dtype=np.int32))
    rot = jnp.asarray(rng.uniform(-30, 30, B).astype(np.float32))
    flip = jnp.asarray(rng.rand(B) > 0.5)

    pose, betas = fits_store.lookup_fits(params, gidx, rot, flip)
    # write the same values back -> store unchanged
    new = fits_store.update_fits(params, gidx, pose, betas, rot, flip,
                                 jnp.ones(B, bool))
    # compare via rotation matrices (axis-angle has sign ambiguities)
    old_R = np.asarray(batch_rodrigues(
        params[:B, :72].reshape(-1, 3)))
    new_R = np.asarray(batch_rodrigues(
        new[:B, :72].reshape(-1, 3)))
    np.testing.assert_allclose(new_R, old_R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new[B:]), np.asarray(params[B:]))


def test_fits_update_masked(rng):
    N, B = 10, 4
    params = jnp.zeros((N, 82))
    gidx = jnp.asarray(np.arange(B, dtype=np.int32))
    pose = jnp.ones((B, 72))
    betas = jnp.ones((B, 10))
    mask = jnp.asarray([True, False, True, False])
    new = fits_store.update_fits(params, gidx, pose, betas,
                                 jnp.zeros(B), jnp.zeros(B, bool), mask)
    changed = np.abs(np.asarray(new[:B])).sum(axis=1) > 0
    np.testing.assert_array_equal(changed, np.asarray(mask))


def test_fits_store_create_and_save(tmp_path):
    store = fits_store.create_fits_store({'a': 5, 'b': 3})
    assert store.params.shape == (8, 82)
    assert store.offsets == {'a': 0, 'b': 5}
    fits_store.save_fits(store, str(tmp_path))
    assert os.path.exists(tmp_path / 'a_fits.npy')
    store2 = fits_store.create_fits_store(
        {'a': 5, 'b': 3}, checkpoint_dir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(store2.params),
                               np.asarray(store.params))


# ---------------------------------------------------------------------------
# Data pipeline
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def synth_data(tmp_path_factory):
    d = tmp_path_factory.mktemp('imgs')
    db = synthetic_db(12, img_dir=str(d), seed=3)
    return db, str(d)


def make_options(tmp_path, **kw):
    cfg = cfgmod.TrainConfig(name='t', log_dir=str(tmp_path), batch_size=2,
                             num_workers=0, img_res=64, **kw)
    cfg.finalize()
    return cfg


def test_dataset_sample_schema(synth_data, tmp_path):
    db, img_dir = synth_data
    opts = make_options(tmp_path)
    ds = TuchDataset(opts, 'dsc_lsp', data=db, img_dir=img_dir,
                     dataset_id=1)
    s = ds.get(0, epoch=0)
    assert s['img'].shape == (64, 64, 3)
    assert s['keypoints'].shape == (49, 3)
    assert s['pose'].shape == (72,)
    assert s['contact_vec'].shape == (12,)
    assert s['dataset_id'] == 1
    assert s['has_disc_contact'] == 1.0 and s['has_gt_kpts'] == 1.0


def test_dataset_deterministic_augmentation(synth_data, tmp_path):
    db, img_dir = synth_data
    opts = make_options(tmp_path)
    ds = TuchDataset(opts, 'dsc_lsp', data=db, img_dir=img_dir)
    a = ds.get(3, epoch=2)
    b = ds.get(3, epoch=2)
    np.testing.assert_allclose(a['img'], b['img'])
    assert a['rot_angle'] == b['rot_angle']
    # different epoch -> (almost surely) different augmentation somewhere
    c = [ds.get(i, epoch=5) for i in range(8)]
    d = [ds.get(i, epoch=2) for i in range(8)]
    assert any(x['is_flipped'] != y['is_flipped'] or
               x['rot_angle'] != y['rot_angle'] for x, y in zip(c, d))


def test_mixed_dataset_expansion():
    names, part = expand_meta_names(['dsc', 'mtp'], [0.5, 0.5])
    assert set(names) == {'dsc_lspet', 'dsc_lsp', 'dsc_df', 'mtp'}
    assert np.isclose(sum(part), 2.0)  # 0.5 + 3*0.5


def test_loader_batches_and_resume(synth_data, tmp_path):
    db, img_dir = synth_data
    opts = make_options(tmp_path)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=img_dir)
    loader = CheckpointLoader(ds, batch_size=4, shuffle=True,
                              num_workers=0, seed=1)
    full = list(loader.epoch_iter(LoaderState(0, 0, 1)))
    assert len(full) == 3
    assert full[0]['img'].shape == (4, 64, 64, 3)
    resumed = list(loader.epoch_iter(LoaderState(0, 1, 1)))
    np.testing.assert_allclose(resumed[0]['img'], full[1]['img'])


def test_loader_threaded_matches_sync(synth_data, tmp_path):
    db, img_dir = synth_data
    opts = make_options(tmp_path)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=img_dir)
    l0 = CheckpointLoader(ds, batch_size=4, shuffle=True, num_workers=0,
                          seed=1)
    l1 = CheckpointLoader(ds, batch_size=4, shuffle=True, num_workers=3,
                          seed=1)
    b0 = list(l0.epoch_iter(LoaderState(0, 0, 1)))
    b1 = list(l1.epoch_iter(LoaderState(0, 0, 1)))
    assert len(b0) == len(b1)
    for x, y in zip(b0, b1):
        np.testing.assert_allclose(x['img'], y['img'])


# ---------------------------------------------------------------------------
# Train step integration
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def tiny_runtime():
    return rt.build_runtime(synthetic=True, num_verts=170, img_res=64,
                            with_hd=True)


def make_batch(runtime, B=2, rng=None):
    rng = rng or np.random.RandomState(0)
    P = len(runtime.contact_classes)
    return {
        'img': rng.randn(B, 64, 64, 3).astype(np.float32) * 0.1,
        'keypoints': np.concatenate(
            [rng.uniform(-0.8, 0.8, (B, 49, 2)), np.ones((B, 49, 1))],
            -1).astype(np.float32),
        'pose': (rng.randn(B, 72) * 0.1).astype(np.float32),
        'betas': (rng.randn(B, 10) * 0.2).astype(np.float32),
        'contact_vec': (rng.rand(B, P) > 0.6).astype(np.float32),
        'pose_3d': np.concatenate(
            [rng.randn(B, 24, 3) * 0.2, np.ones((B, 24, 1))],
            -1).astype(np.float32),
        'has_smpl': np.array([1.0] + [0.0] * (B - 1), np.float32),
        'has_pgt_smpl': np.zeros(B, np.float32),
        'has_disc_contact': np.array([0.0] + [1.0] * (B - 1), np.float32),
        'has_gt_kpts': np.ones(B, np.float32),
        'has_pose_3d': np.zeros(B, np.float32),
        'is_flipped': (rng.rand(B) > 0.5).astype(np.float32),
        'rot_angle': rng.uniform(-20, 20, B).astype(np.float32),
        'sample_index': np.arange(B, dtype=np.int32),
        'dataset_id': np.zeros(B, np.int32),
        'fits_index': np.arange(B, dtype=np.int32),
    }


def run_steps(runtime, tmp_path, n=2, **opt_kw):
    import optax
    from tuch_tpu.train.module import TrainState, make_train_step
    opts = make_options(tmp_path, **opt_kw)
    optimizer = optax.adam(opts.lr)
    step = jax.jit(make_train_step(runtime.hmr, runtime.assets, opts,
                                   optimizer,
                                   len(runtime.contact_classes)))
    params = runtime.variables['params']
    state = TrainState(
        params=params, batch_stats=runtime.variables['batch_stats'],
        opt_state=optimizer.init(params),
        fits=jnp.zeros((8, 82)), rng=jax.random.PRNGKey(0),
        step=jnp.asarray(0, jnp.int32))
    batch = make_batch(runtime)
    out = []
    for _ in range(n):
        state, metrics, outputs = step(state, batch)
        out.append((metrics, outputs))
    return state, out


@pytest.mark.slow
def test_train_step_no_smplify(tiny_runtime, tmp_path):
    state, out = run_steps(tiny_runtime, tmp_path, n=2,
                           run_smplify=False, contact_loss_weight=0.0)
    m0, _ = out[0]
    m1, _ = out[1]
    assert np.isfinite(float(m0['loss']))
    assert int(np.asarray(state.step)) == 2
    # params actually changed
    # (loss landscape is nontrivial; adam step 1e-5 but nonzero)
    assert float(m0['loss']) != float(m1['loss'])


def test_train_step_contact_loss_active(tiny_runtime, tmp_path):
    state, out = run_steps(tiny_runtime, tmp_path, n=1,
                           run_smplify=False, contact_loss_weight=1e-3)
    m, _ = out[0]
    assert np.isfinite(float(m['loss_contact']))


def test_train_step_with_smplify_updates_fits(tiny_runtime, tmp_path):
    state, out = run_steps(tiny_runtime, tmp_path, n=1, run_smplify=True,
                           num_smplify_iters=2, contact_loss_weight=0.0,
                           smplify_threshold=1e9)
    m, outputs = out[0]
    assert np.isfinite(float(m['loss']))
    fits = np.asarray(state.fits)
    # sample 0 has GT smpl -> ignored for contact but fits may update;
    # at least one row should have been written (threshold is huge)
    assert np.abs(fits[:2]).sum() > 0


@pytest.mark.slow
def test_train_step_jit_cache(tiny_runtime, tmp_path):
    """Second call with fresh arrays must not retrace (static closure)."""
    import optax
    from tuch_tpu.train.module import TrainState, make_train_step
    opts = make_options(tmp_path, run_smplify=False,
                        contact_loss_weight=0.0)
    optimizer = optax.adam(1e-5)
    fn = make_train_step(tiny_runtime.hmr, tiny_runtime.assets, opts,
                         optimizer, len(tiny_runtime.contact_classes))
    step = jax.jit(fn)
    params = tiny_runtime.variables['params']
    state = TrainState(
        params=params, batch_stats=tiny_runtime.variables['batch_stats'],
        opt_state=optimizer.init(params), fits=jnp.zeros((8, 82)),
        rng=jax.random.PRNGKey(0), step=jnp.asarray(0, jnp.int32))
    b1 = make_batch(tiny_runtime, rng=np.random.RandomState(1))
    b2 = make_batch(tiny_runtime, rng=np.random.RandomState(2))
    state, _, _ = step(state, b1)
    state, _, _ = step(state, b2)
    assert step._cache_size() == 1


@pytest.mark.slow
def test_train_step_degenerate_batch_finite(tiny_runtime, tmp_path):
    """All capability flags zero + zero keypoint confidences: no loss term
    has valid data, yet loss and gradients must stay finite (the
    conf-weighted means and flag-masked averages must not produce 0/0)."""
    import optax
    from tuch_tpu.train.module import TrainState, make_train_step
    runtime = tiny_runtime
    opts = make_options(tmp_path, run_smplify=True, num_smplify_iters=1,
                        contact_loss_weight=1e-3)
    optimizer = optax.adam(opts.lr)
    step = jax.jit(make_train_step(runtime.hmr, runtime.assets, opts,
                                   optimizer,
                                   len(runtime.contact_classes)))
    params = runtime.variables['params']
    state = TrainState(
        params=params, batch_stats=runtime.variables['batch_stats'],
        opt_state=optimizer.init(params),
        fits=jnp.zeros((8, 82)), rng=jax.random.PRNGKey(0),
        step=jnp.asarray(0, jnp.int32))
    batch = make_batch(runtime)
    for k in ('has_smpl', 'has_pgt_smpl', 'has_disc_contact',
              'has_gt_kpts', 'has_pose_3d'):
        batch[k] = np.zeros_like(batch[k])
    batch['keypoints'][..., 2] = 0.0      # zero confidence everywhere
    batch['contact_vec'][:] = 0.0
    new_state, metrics, _ = step(state, batch)
    assert np.isfinite(float(np.asarray(metrics['loss'])))
    flat = jax.tree_util.tree_leaves(new_state.params)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)


@pytest.mark.slow
def test_accept_reject_rejects_nonfinite_fit(tiny_runtime, tmp_path):
    """A diverged (NaN) smplify result must never be written into the
    fits store: NaN loss compares False against the previous loss, so
    accept/reject keeps the old fit (reference train_module.py:259-271
    relies on the same comparison semantics)."""
    import optax
    from tuch_tpu.train.module import TrainState, make_train_step
    runtime = tiny_runtime
    opts = make_options(tmp_path, run_smplify=True, num_smplify_iters=1,
                        contact_loss_weight=1e-3)
    optimizer = optax.adam(opts.lr)
    step = jax.jit(make_train_step(runtime.hmr, runtime.assets, opts,
                                   optimizer,
                                   len(runtime.contact_classes)))
    params = runtime.variables['params']
    fits0 = jnp.asarray(
        np.tile(np.linspace(0.1, 0.9, 82, dtype=np.float32), (8, 1)))
    state = TrainState(
        params=params, batch_stats=runtime.variables['batch_stats'],
        opt_state=optimizer.init(params),
        fits=fits0, rng=jax.random.PRNGKey(0),
        step=jnp.asarray(0, jnp.int32))
    batch = make_batch(runtime)
    # poison the images so HMR init (and thus the fit) goes non-finite
    batch['img'] = np.full_like(batch['img'], np.nan)
    new_state, metrics, _ = step(state, batch)
    # stored fits are untouched (never NaN, never accepted)
    assert bool(jnp.all(jnp.isfinite(new_state.fits)))
    np.testing.assert_array_equal(np.asarray(new_state.fits),
                                  np.asarray(fits0))


def test_loader_resume_uses_checkpointed_perm_seed(synth_data, tmp_path):
    """Mid-epoch resume must regenerate the permutation from the
    checkpointed perm_seed, not the (possibly different) relaunch seed."""
    from tuch_tpu.data.loader import CheckpointLoader, LoaderState
    from tuch_tpu.data.dataset import TuchDataset
    db, img_dir = synth_data
    opts = make_options(tmp_path)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=img_dir)
    l_orig = CheckpointLoader(ds, batch_size=4, shuffle=True,
                              num_workers=0, seed=0)
    l_relaunch = CheckpointLoader(ds, batch_size=4, shuffle=True,
                                  num_workers=0, seed=999)  # different!
    state = LoaderState(epoch=0, batch_idx=1, perm_seed=0)
    b0 = list(l_orig.epoch_iter(state))
    b1 = list(l_relaunch.epoch_iter(state))
    assert len(b0) == len(b1) > 0
    for x, y in zip(b0, b1):
        np.testing.assert_array_equal(x['sample_index'], y['sample_index'])


def test_loader_abandoned_iterator_does_not_leak_thread(synth_data,
                                                        tmp_path):
    """Breaking out of epoch_iter mid-epoch must not leave the producer
    thread blocked on the full queue forever."""
    import gc
    import threading
    import time as _time
    from tuch_tpu.data.loader import CheckpointLoader, LoaderState
    from tuch_tpu.data.dataset import TuchDataset
    db, img_dir = synth_data
    opts = make_options(tmp_path)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=img_dir)
    before = threading.active_count()
    for _ in range(3):  # repeat: leaks accumulate, one pass can hide
        it = CheckpointLoader(ds, batch_size=2, shuffle=True,
                              num_workers=2, seed=0).epoch_iter(
            LoaderState(0, 0, 0))
        next(it)
        it.close()  # abandon mid-epoch
    gc.collect()
    deadline = _time.time() + 5.0
    while (threading.active_count() > before
           and _time.time() < deadline):
        _time.sleep(0.05)
    assert threading.active_count() <= before + 1


def test_loader_propagates_worker_errors(synth_data, tmp_path):
    """A failing sample read must raise in the consumer, not silently end
    the epoch early (which would deflate eval metrics)."""
    from tuch_tpu.data.loader import CheckpointLoader, LoaderState
    from tuch_tpu.data.dataset import TuchDataset
    db, img_dir = synth_data
    opts = make_options(tmp_path)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=img_dir)

    class Exploding:
        def __len__(self):
            return len(ds)

        def get(self, i, epoch=0):
            if i == 5:
                raise RuntimeError('corrupt sample')
            return ds.get(i, epoch)

    loader = CheckpointLoader(Exploding(), batch_size=2, shuffle=False,
                              num_workers=2, seed=0)
    with pytest.raises(RuntimeError, match='corrupt sample'):
        list(loader.epoch_iter(LoaderState(0, 0, 0)))


def test_mixed_dataset_shares_match_reference_weighting(monkeypatch):
    """Meta 'dsc' expansion + in-group size re-weighting: each DSC subset
    draws with share composition_share * len_i / group_len (reference
    mixed_dataset.py:33-71), and the empirical draw matches."""
    from types import SimpleNamespace
    from tuch_tpu.data import mixed as mixed_mod

    sizes = {'dsc_lspet': 60, 'dsc_lsp': 30, 'dsc_df': 10, 'mtp': 50}

    class DummyDS:
        def __init__(self, options, name, split='train', dataset_id=0,
                     **kw):
            self.name = name
            self._n = sizes[name]

        def __len__(self):
            return self._n

        def get(self, index, epoch=0):
            return {'dataset_name': self.name}

    monkeypatch.setattr(mixed_mod, 'TuchDataset', DummyDS)
    opts = SimpleNamespace(ds_names=['dsc', 'mtp'],
                           ds_composition=[0.6, 0.4], seed=0)
    md = mixed_mod.MixedDataset(opts, 'train')
    # partition: each subset 0.6 * len/100, then mtp 0.4
    shares = np.diff(np.concatenate([[0.0], md.partition]))
    expect = {'dsc_lspet': 0.6 * 0.6, 'dsc_lsp': 0.6 * 0.3,
              'dsc_df': 0.6 * 0.1, 'mtp': 0.4}
    for name, share in zip(md.dataset_list, shares):
        np.testing.assert_allclose(share, expect[name], atol=1e-9)
    # empirical draw over many indices approximates the shares
    N = 4000
    counts = {}
    for i in range(N):
        nm = md.get(i)['dataset_name']
        counts[nm] = counts.get(nm, 0) + 1
    for name, share in expect.items():
        assert abs(counts.get(name, 0) / N - share) < 0.03, (name, counts)


def test_augmentation_distribution_matches_reference(synth_data, tmp_path):
    """Statistical check of augm_params against the reference's documented
    distribution (base_dataset.py:163-190): flip p=1/2, rot zeroed
    w.p. 0.6 else clipped N(0, rf) within [-2rf, 2rf], scale clipped
    N(1, sf) within [1+-sf], channel noise uniform [1+-nf]."""
    from tuch_tpu.data.dataset import TuchDataset
    db, img_dir = synth_data
    opts = make_options(tmp_path)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=img_dir)
    N = 4000
    draws = [ds.augm_params(i, epoch=0) for i in range(N)]
    flips = np.array([d[0] for d in draws])
    pns = np.stack([d[1] for d in draws])
    rots = np.array([d[2] for d in draws])
    scs = np.array([d[3] for d in draws])
    o = opts
    assert abs(flips.mean() - 0.5) < 0.03
    assert abs((rots == 0).mean() - 0.6) < 0.03
    nz = rots[rots != 0]
    assert np.all(np.abs(nz) <= 2 * o.rot_factor + 1e-6)
    assert abs(nz.std() - o.rot_factor) / o.rot_factor < 0.15
    assert np.all((scs >= 1 - o.scale_factor - 1e-6)
                  & (scs <= 1 + o.scale_factor + 1e-6))
    assert abs(scs.mean() - 1.0) < 0.02
    assert np.all((pns >= 1 - o.noise_factor) & (pns <= 1 + o.noise_factor))
    assert abs(pns.mean() - 1.0) < 0.02


@pytest.mark.slow
def test_train_step_smplify_contact_capacity(tiny_runtime, tmp_path):
    """smplify_contact_capacity routes the in-loop contact terms through
    the fixed-capacity compaction and surfaces the truncation metric."""
    state, out = run_steps(tiny_runtime, tmp_path, n=1, run_smplify=True,
                           num_smplify_iters=2, contact_loss_weight=0.0,
                           smplify_threshold=1e9,
                           smplify_contact_capacity=1)
    m, _ = out[0]
    assert np.isfinite(float(m['loss']))
    # batch has 1 GT-SMPL (ignored) + 1 active contact sample, capacity 1
    # -> nothing truncated
    assert float(m['smplify_contact_truncated_frac']) == 0.0


def test_loader_pads_when_batch_exceeds_dataset(synth_data, tmp_path):
    """batch_size > dataset length must still yield full fixed-shape
    batches (code-review r03: single-pass padding left them short)."""
    db, img_dir = synth_data
    opts = make_options(tmp_path)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=img_dir)
    n = len(ds)
    loader = CheckpointLoader(ds, batch_size=3 * n - 1, shuffle=False,
                              num_workers=0, drop_last=False)
    batches = list(loader.epoch_iter(LoaderState(0, 0, 0)))
    assert len(batches) >= 1
    assert batches[0]['img'].shape[0] == 3 * n - 1


@pytest.mark.slow
def test_project_db_keypoints_consistent(tiny_runtime):
    """Projected synthetic keypoints must be explained by their own GT
    pose: the GT body + lstsq camera reprojects tightly, a perturbed pose
    does not. (This consistency is what makes the smplify accept/reject
    gate discriminative in tools/ab_fast_knobs.py --seed_mode strong.)"""
    from tuch_tpu.data.dataset import project_db_keypoints
    from tuch_tpu.models.smpl import smpl_forward_pose72
    from tuch_tpu.utils.projection import estimate_translation, \
        perspective_projection

    db = synthetic_db(6, seed=3)
    db = project_db_keypoints(db, tiny_runtime.assets.smpl, seed=3)
    kp = np.concatenate([db['openpose'], db['part']], axis=1)  # (n, 49, 3)

    def mean_residual(pose, betas):
        out = smpl_forward_pose72(tiny_runtime.assets.smpl,
                                  jnp.asarray(betas), jnp.asarray(pose))
        cam_t = estimate_translation(out.joints, jnp.asarray(kp),
                                     5000.0, 256.0)
        B = kp.shape[0]
        px = perspective_projection(
            out.joints, jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), cam_t,
            5000.0, jnp.full((B, 2), 128.0))
        err = np.linalg.norm(np.asarray(px) - kp[..., :2], axis=-1)
        w = kp[..., 2]
        return float((err * w).sum() / w.sum())

    r_gt = mean_residual(db['pose'], db['betas'])
    rng = np.random.RandomState(0)
    r_bad = mean_residual(
        db['pose'] + rng.randn(*db['pose'].shape).astype(np.float32) * 0.3,
        db['betas'])
    assert r_gt < 15.0, r_gt          # ~2px injected noise + lstsq slack
    assert r_bad > 3.0 * r_gt, (r_gt, r_bad)
