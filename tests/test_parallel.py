"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md section 4:
pjit sharding / psum reductions without a cluster)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tuch_tpu.parallel import mesh as pmesh
from tuch_tpu.parallel.contact_parallel import winding_numbers_cp
from tuch_tpu.ops.contact import winding_numbers_same_tris

from tests.test_contact import unit_cube


@pytest.fixture(scope='module')
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    return pmesh.make_mesh(dp=4, cp=2)


def test_winding_cp_matches_single_device(mesh8):
    v, f = unit_cube()
    B = 4
    verts = jnp.asarray(np.tile(v[None], (B, 1, 1)))
    pts = jnp.asarray(np.array([[[0, 0, 0], [2, 0, 0], [0.2, 0.1, -0.3],
                                 [0, 1.2, 0]]], np.float32).repeat(B, 0))
    wn_cp = winding_numbers_cp(pts, verts, f, mesh8, block_f=4)
    wn_ref = winding_numbers_same_tris(pts, verts, jnp.asarray(f),
                                       block_f=4)
    np.testing.assert_allclose(np.asarray(wn_cp), np.asarray(wn_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(wn_cp)[0, :2], [1.0, 0.0],
                               atol=1e-4)


def test_batch_sharding_roundtrip(mesh8):
    batch = {'x': np.arange(8 * 3, dtype=np.float32).reshape(8, 3)}
    sharded = pmesh.shard_batch(batch, mesh8)
    assert sharded['x'].sharding.spec == jax.sharding.PartitionSpec('dp')
    np.testing.assert_allclose(np.asarray(sharded['x']), batch['x'])


def test_shard_params_tp_specs(mesh8):
    params = {'fc1': {'kernel': np.zeros((100, 64)),
                      'bias': np.zeros(64)},
              'fc2': {'kernel': np.zeros((64, 64))},
              'conv': {'kernel': np.zeros((3, 3, 4, 8))}}
    sh = pmesh.shard_params_tp(params, mesh8)
    P = jax.sharding.PartitionSpec
    assert sh['fc1']['kernel'].spec == P(None, 'cp')
    assert sh['fc2']['kernel'].spec == P('cp', None)
    assert sh['fc1']['bias'].spec == P()
    assert sh['conv']['kernel'].spec == P()


def _tiny_contact_problem(B=4, num_verts=110, seed=0):
    from tuch_tpu import assets
    from tuch_tpu.losses.smplify import ContactAssets
    from tuch_tpu.ops import contact as contact_ops

    model, extras = assets.synthetic_smpl(num_verts=num_verts, seed=seed)
    ia, ib, ma, mb = contact_ops.build_region_pairs(
        extras.contact_classes, extras.contact_csig)
    ca = ContactAssets(
        geomask=jnp.asarray(extras.geodists > 0.3),
        faces=jnp.asarray(model.faces),
        region_idx_a=jnp.asarray(ia), region_idx_b=jnp.asarray(ib),
        region_mask_a=jnp.asarray(ma), region_mask_b=jnp.asarray(mb))
    rng = np.random.RandomState(3)
    V = model.v_template.shape[0]
    verts = jnp.asarray(
        np.asarray(model.v_template)[None]
        + 0.02 * rng.randn(B, V, 3).astype(np.float32))
    return model, extras, ca, verts


@pytest.mark.slow
def test_contact_neighbors_cp_matches_single_device(mesh8):
    from tuch_tpu.losses.smplify import contact_neighbors
    from tuch_tpu.parallel.contact_parallel import TRACE_STATS

    model, extras, ca, verts = _tiny_contact_problem()
    ext_ref, arg_ref = contact_neighbors(verts, ca)
    n0 = TRACE_STATS['cp_contact_traces']
    ext_cp, arg_cp = contact_neighbors(verts, ca, mesh=mesh8)
    assert TRACE_STATS['cp_contact_traces'] == n0 + 1
    np.testing.assert_array_equal(np.asarray(ext_cp), np.asarray(ext_ref))
    np.testing.assert_array_equal(np.asarray(arg_cp), np.asarray(arg_ref))


@pytest.mark.slow
def test_contact_fitting_loss_cp_matches_single_device(mesh8):
    """Full in-loop contact loss, cp-sharded vs single-device."""
    from tuch_tpu import assets as assets_mod
    from tuch_tpu.losses import smplify as SL
    from tuch_tpu.losses.prior import create_gmm_prior
    from tuch_tpu.models.smpl import smpl_forward_pose72

    model, extras, ca, verts = _tiny_contact_problem()
    prior = create_gmm_prior(assets_mod.synthetic_gmm_prior())
    B = verts.shape[0]
    rng = np.random.RandomState(5)
    pose = jnp.asarray((rng.randn(B, 72) * 0.1).astype(np.float32))
    out = smpl_forward_pose72(model, jnp.zeros((B, 10)), pose)
    kp2d = rng.uniform(0, 224, (B, 49, 2)).astype(np.float32)
    conf = np.ones((B, 49), np.float32)
    cam_t = jnp.asarray(np.tile([[0, 0, 20.0]], (B, 1)).astype(np.float32))
    cc = jnp.full((B, 2), 112.0)
    P = ca.region_idx_a.shape[0]
    gt_contact = jnp.asarray((rng.rand(B, P) > 0.5).astype(np.float32))

    def loss(mesh):
        return SL.contact_fitting_loss(
            pose[:, 3:], pose[:, :3], jnp.zeros((B, 10)), out.joints,
            out.vertices, cam_t, cc, jnp.asarray(kp2d), jnp.asarray(conf),
            prior, ca, gt_contact, jnp.zeros(B, bool), jnp.ones(B, bool),
            euclthres=0.02, mesh=mesh)

    ref = float(loss(None))
    got = float(loss(mesh8))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_process_shard_single_host():
    from tuch_tpu.parallel.multihost import process_shard
    lo, hi = process_shard(100)
    assert (lo, hi) == (0, 100)


def test_maybe_initialize_distributed_noop(monkeypatch):
    from tuch_tpu.parallel.multihost import maybe_initialize_distributed
    monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
    assert maybe_initialize_distributed() is False


@pytest.mark.slow
def test_contact_neighbors_cp_candidate_k(mesh8):
    """candidate_k on a cp>1 mesh: flags/argmin match the single-device
    candidate path (the knob must not be silently ignored when sharded)."""
    from tuch_tpu.losses.smplify import contact_neighbors

    model, extras, ca, verts = _tiny_contact_problem()
    K = 32
    ext_ref, arg_ref = contact_neighbors(verts, ca, candidate_k=K)
    ext_cp, arg_cp = contact_neighbors(verts, ca, mesh=mesh8, candidate_k=K)
    np.testing.assert_array_equal(np.asarray(ext_cp), np.asarray(ext_ref))
    np.testing.assert_array_equal(np.asarray(arg_cp), np.asarray(arg_ref))


@pytest.mark.slow
def test_eval_step_dp_sharded_matches_single_device():
    """dp-sharded eval step == single-device eval step (SURVEY 2.8: the
    TPU-native multi-device eval the reference lacks)."""
    from tuch_tpu import runtime as rt
    from tuch_tpu.eval.evaluate import make_eval_step

    runtime = rt.build_runtime(synthetic=True, num_verts=110, img_res=64,
                               with_segments=False, with_hd=False,
                               with_contact=False)
    j_reg = np.asarray(runtime.smpl.J_regressor)[:17]
    step = make_eval_step(runtime.hmr, runtime.smpl, None, None, j_reg,
                          'mpi-inf-3dhp')
    rng = np.random.RandomState(0)
    B = 8
    batch_np = {
        'img': rng.randn(B, 64, 64, 3).astype(np.float32) * 0.1,
        'pose_3d': np.concatenate(
            [rng.randn(B, 24, 3) * 0.2, np.ones((B, 24, 1))],
            -1).astype(np.float32),
    }
    m_ref, pa_ref, *_ = step(runtime.variables, batch_np)

    mesh = pmesh.make_mesh(dp=8, cp=1)
    variables = jax.device_put(runtime.variables, pmesh.replicated(mesh))
    batch = pmesh.shard_batch(batch_np, mesh)
    m_dp, pa_dp, *_ = step(variables, batch)
    # the batch axis is sharded over 8 devices; results must agree with
    # the single-device program bit-for-bit up to reduction reassociation
    np.testing.assert_allclose(np.asarray(m_dp), np.asarray(m_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pa_dp), np.asarray(pa_ref),
                               atol=1e-5)


@pytest.mark.slow
def test_run_evaluation_dp_sharded(tmp_path):
    """run_evaluation(mesh=...) end-to-end on a synthetic dataset,
    including a ragged tail batch that falls back to single-device."""
    from tuch_tpu import runtime as rt
    from tuch_tpu.data.dataset import TuchDataset, synthetic_db
    from tuch_tpu.eval.evaluate import run_evaluation

    runtime = rt.build_runtime(synthetic=True, num_verts=110, img_res=64,
                               with_segments=False, with_hd=False,
                               with_contact=False)
    d = str(tmp_path)
    n = 12   # batch 8 -> one full dp batch + one ragged batch of 4
    db = synthetic_db(n, img_dir=d, seed=0, with_pose_3d=True,
                      img_size=96)
    from tuch_tpu import config as cfgmod
    opts = cfgmod.TrainConfig(img_res=64)  # not finalized: no dirs made
    ds = TuchDataset(opts, 'mpi-inf-3dhp', data=db, img_dir=d,
                     use_augmentation=False, split='test')
    j_reg = np.asarray(runtime.smpl.J_regressor)[:17]
    mesh = pmesh.make_mesh(dp=8, cp=1)
    res_dp = run_evaluation(runtime.hmr, runtime.variables, ds,
                            'mpi-inf-3dhp', runtime.smpl, None, None,
                            j_reg, batch_size=8, mesh=mesh)
    res_ref = run_evaluation(runtime.hmr, runtime.variables, ds,
                             'mpi-inf-3dhp', runtime.smpl, None, None,
                             j_reg, batch_size=8)
    assert abs(res_dp['mpjpe'] - res_ref['mpjpe']) < 1e-3
    assert abs(res_dp['pa_mpjpe'] - res_ref['pa_mpjpe']) < 1e-3


@pytest.mark.slow
def test_contact_fitting_loss_compacted_cp_matches_full(mesh8):
    """Compaction composes with the cp-sharded kernels: gathering the
    contact-active sub-batch, running the sharded quadratics on (C, V),
    and scattering back must equal the full cp-sharded loss when the
    capacity covers every active sample. The compacted batch axis must
    be a multiple of mesh dp (train.module._round_capacity guarantees
    this in production)."""
    from tuch_tpu import assets as assets_mod
    from tuch_tpu.losses import smplify as SL
    from tuch_tpu.losses.prior import create_gmm_prior
    from tuch_tpu.models.smpl import smpl_forward_pose72

    model, extras, ca, verts = _tiny_contact_problem(B=8)
    prior = create_gmm_prior(assets_mod.synthetic_gmm_prior())
    B = verts.shape[0]
    rng = np.random.RandomState(7)
    pose = jnp.asarray((rng.randn(B, 72) * 0.1).astype(np.float32))
    out = smpl_forward_pose72(model, jnp.zeros((B, 10)), pose)
    kp2d = jnp.asarray(rng.uniform(0, 224, (B, 49, 2)).astype(np.float32))
    conf = jnp.ones((B, 49))
    cam_t = jnp.asarray(np.tile([[0, 0, 20.0]], (B, 1)).astype(np.float32))
    cc = jnp.full((B, 2), 112.0)
    P = ca.region_idx_a.shape[0]
    gt_contact = jnp.asarray((rng.rand(B, P) > 0.5).astype(np.float32))
    ignore = jnp.asarray([False, True] * 4)

    def loss(compact_idx):
        return SL.contact_fitting_loss(
            pose[:, 3:], pose[:, :3], jnp.zeros((B, 10)), out.joints,
            out.vertices, cam_t, cc, kp2d, conf, prior, ca, gt_contact,
            ignore, jnp.ones(B, bool), euclthres=0.02, mesh=mesh8,
            compact_idx=compact_idx)

    full = float(loss(None))
    compact = float(loss(SL.compact_take(~ignore, 4)))  # 4 = dp multiple
    np.testing.assert_allclose(compact, full, rtol=1e-6)
