"""SMPLify-DC convergence tests on crafted poses (SURVEY.md section 4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tuch_tpu import assets
from tuch_tpu.fitting import smplify_dc as S
from tuch_tpu.losses.prior import create_gmm_prior
from tuch_tpu.models.smpl import smpl_forward_pose72
from tuch_tpu.utils.projection import perspective_projection

from tests.test_losses import make_contact_assets


def setup_problem(tiny_smpl, rng, B=2):
    model, extras = tiny_smpl
    prior = create_gmm_prior(assets.synthetic_gmm_prior(dim=69))
    ca = make_contact_assets(tiny_smpl)

    # Ground truth: prior-mean-ish pose, project to 2D.
    gt_pose = np.zeros((B, 72), np.float32)
    gt_pose[:, 3:] = np.asarray(prior.means)[0] * 0.5
    gt_betas = np.zeros((B, 10), np.float32)
    out = smpl_forward_pose72(model, jnp.asarray(gt_betas),
                              jnp.asarray(gt_pose))
    t_gt = np.tile(np.array([[0.0, 0.0, 20.0]], np.float32), (B, 1))
    cc = np.full((B, 2), 112.0, np.float32)
    proj = perspective_projection(
        out.joints, jnp.tile(jnp.eye(3)[None], (B, 1, 1)),
        jnp.asarray(t_gt), 5000.0, jnp.asarray(cc))
    kp2d = np.concatenate([np.asarray(proj), np.ones((B, 49, 1))],
                          axis=-1).astype(np.float32)
    return model, prior, ca, extras, gt_pose, gt_betas, t_gt, cc, kp2d


def test_smplify_nocontact_reduces_reprojection(tiny_smpl, rng):
    model, prior, ca, extras, gt_pose, gt_betas, t_gt, cc, kp2d = \
        setup_problem(tiny_smpl, rng)
    B = gt_pose.shape[0]
    # Perturbed init.
    init_pose = gt_pose + rng.randn(*gt_pose.shape).astype(np.float32) * 0.2
    init_cam = t_gt + np.array([[0.05, -0.05, 1.0]], np.float32)

    cfg = S.SMPLifyConfig(num_iters=30, use_contact=False, euclthres=0.02)
    P = len(extras.contact_classes)
    res = jax.jit(
        lambda *a: S.smplify_dc(model, prior, ca, *a, config=cfg))(
        jnp.asarray(init_pose), jnp.asarray(gt_betas), jnp.asarray(init_cam),
        jnp.asarray(cc), jnp.asarray(kp2d), jnp.zeros((B, P)),
        jnp.zeros(B, bool), jnp.zeros(B, bool), jnp.zeros(B, bool))

    init_reproj = S.get_fitting_loss(
        model, prior, jnp.asarray(init_pose), jnp.asarray(gt_betas),
        jnp.asarray(init_cam), jnp.asarray(cc), jnp.asarray(kp2d))
    assert float(res.reprojection_loss.sum()) < float(init_reproj.sum())
    assert res.pose.shape == (B, 72)
    assert np.isfinite(np.asarray(res.vertices)).all()


def test_smplify_contact_runs_and_improves(tiny_smpl, rng):
    model, prior, ca, extras, gt_pose, gt_betas, t_gt, cc, kp2d = \
        setup_problem(tiny_smpl, rng)
    B = gt_pose.shape[0]
    P = len(extras.contact_classes)
    init_pose = gt_pose + rng.randn(*gt_pose.shape).astype(np.float32) * 0.1
    gt_contact = np.zeros((B, P), np.float32)
    gt_contact[:, 0] = 1.0

    cfg = S.SMPLifyConfig(num_iters=10, use_contact=True, euclthres=0.02,
                          contact_loss_weight=1.0)
    res = S.smplify_dc(
        model, prior, ca,
        jnp.asarray(init_pose), jnp.asarray(gt_betas), jnp.asarray(t_gt),
        jnp.asarray(cc), jnp.asarray(kp2d), jnp.asarray(gt_contact),
        jnp.zeros(B, bool), jnp.ones(B, bool), jnp.zeros(B, bool),
        config=cfg)
    assert np.isfinite(np.asarray(res.vertices)).all()
    assert np.isfinite(np.asarray(res.reprojection_loss)).all()
    # betas were optimized in the camera stage (use_contact branch)
    assert res.betas.shape == (B, 10)


def test_smplify_trajectory_collection(tiny_smpl, rng):
    model, prior, ca, extras, gt_pose, gt_betas, t_gt, cc, kp2d = \
        setup_problem(tiny_smpl, rng)
    B = gt_pose.shape[0]
    P = len(extras.contact_classes)
    cfg = S.SMPLifyConfig(num_iters=3, use_contact=False,
                          collect_trajectory=True)
    res = S.smplify_dc(
        model, prior, ca, jnp.asarray(gt_pose), jnp.asarray(gt_betas),
        jnp.asarray(t_gt), jnp.asarray(cc), jnp.asarray(kp2d),
        jnp.zeros((B, P)), jnp.zeros(B, bool), jnp.zeros(B, bool),
        jnp.zeros(B, bool), config=cfg)
    V = model.v_template.shape[0]
    assert res.trajectory.shape == (3, B, V, 3)


def test_smplify_exterior_refresh_gt1_converges(tiny_smpl, rng):
    """exterior_refresh_every > 1: iteration 0 must compute real neighbors
    (the scan carry is initialized with a zeros placeholder that is only
    safe while `it % K == 0` recomputes at it=0); the fit must stay finite
    and improve, and must be close to the K=1 fit."""
    model, prior, ca, extras, gt_pose, gt_betas, t_gt, cc, kp2d = \
        setup_problem(tiny_smpl, rng)
    B = gt_pose.shape[0]
    init_pose = gt_pose + rng.randn(*gt_pose.shape).astype(np.float32) * 0.2
    P = len(extras.contact_classes)
    gt_contact = np.zeros((B, P), np.float32)
    gt_contact[:, 0] = 1
    args = (jnp.asarray(init_pose), jnp.asarray(gt_betas), jnp.asarray(t_gt),
            jnp.asarray(cc), jnp.asarray(kp2d), jnp.asarray(gt_contact),
            jnp.zeros(B, bool), jnp.ones(B, bool), jnp.zeros(B, bool))

    def fit(refresh):
        cfg = S.SMPLifyConfig(num_iters=9, use_contact=True, euclthres=0.02,
                              exterior_refresh_every=refresh)
        return jax.jit(lambda *a: S.smplify_dc(model, prior, ca, *a,
                                               config=cfg))(*args)

    res1 = fit(1)
    res3 = fit(3)
    assert np.isfinite(np.asarray(res3.vertices)).all()
    init_reproj = S.get_fitting_loss(
        model, prior, jnp.asarray(init_pose), jnp.asarray(gt_betas),
        jnp.asarray(t_gt), jnp.asarray(cc), jnp.asarray(kp2d))
    assert float(res3.reprojection_loss.sum()) < float(init_reproj.sum())
    # a poisoned first K-1 iterations (all-interior placeholder) would
    # push the pose far from the K=1 trajectory; with correct refresh the
    # two fits stay close after 9 small Adam steps
    d = float(jnp.abs(res3.pose - res1.pose).max())
    assert d < 0.05, f'refresh-K fit diverged from K=1 fit: {d}'


@pytest.mark.slow
def test_smplify_contact_compaction_matches_full(tiny_smpl, rng):
    """capacity >= #active must reproduce the full-batch fit: the contact
    terms are computed on the gathered sub-batch and scattered back, so
    the Adam trajectory is numerically the same program restricted to
    active rows (reference gather semantics, tuch/smplify/losses.py:73)."""
    model, prior, ca, extras, gt_pose, gt_betas, t_gt, cc, kp2d = \
        setup_problem(tiny_smpl, rng, B=4)
    B = 4
    init_pose = gt_pose + rng.randn(*gt_pose.shape).astype(np.float32) * 0.1
    P = len(extras.contact_classes)
    gt_contact = np.zeros((B, P), np.float32)
    gt_contact[:, 0] = 1
    ignore = jnp.asarray([False, True, False, True])
    args = (jnp.asarray(init_pose), jnp.asarray(gt_betas), jnp.asarray(t_gt),
            jnp.asarray(cc), jnp.asarray(kp2d), jnp.asarray(gt_contact),
            ignore, jnp.ones(B, bool), jnp.zeros(B, bool))

    def fit(cap):
        cfg = S.SMPLifyConfig(num_iters=6, use_contact=True, euclthres=0.02,
                              contact_capacity=cap)
        return jax.jit(lambda *a: S.smplify_dc(model, prior, ca, *a,
                                               config=cfg))(*args)

    full = fit(0)
    compact = fit(2)
    np.testing.assert_allclose(np.asarray(compact.pose),
                               np.asarray(full.pose), atol=1e-5)
    np.testing.assert_allclose(np.asarray(compact.vertices),
                               np.asarray(full.vertices), atol=1e-5)
    assert float(compact.contact_truncated_frac) == 0.0
    assert full.contact_truncated_frac is None


def test_smplify_contact_compaction_overflow_reported(tiny_smpl, rng):
    """capacity < #active: overflow samples lose their contact term (never
    silently -- contact_truncated_frac reports the dropped fraction) but
    are still reprojection-optimized."""
    model, prior, ca, extras, gt_pose, gt_betas, t_gt, cc, kp2d = \
        setup_problem(tiny_smpl, rng, B=4)
    B = 4
    init_pose = gt_pose + rng.randn(*gt_pose.shape).astype(np.float32) * 0.2
    P = len(extras.contact_classes)
    gt_contact = np.zeros((B, P), np.float32)
    gt_contact[:, 0] = 1
    args = (jnp.asarray(init_pose), jnp.asarray(gt_betas), jnp.asarray(t_gt),
            jnp.asarray(cc), jnp.asarray(kp2d), jnp.asarray(gt_contact),
            jnp.asarray([False, False, False, True]), jnp.ones(B, bool),
            jnp.zeros(B, bool))
    cfg = S.SMPLifyConfig(num_iters=6, use_contact=True, euclthres=0.02,
                          contact_capacity=1)
    res = jax.jit(lambda *a: S.smplify_dc(model, prior, ca, *a,
                                          config=cfg))(*args)
    assert np.isfinite(np.asarray(res.vertices)).all()
    # 3 active, capacity 1 -> 2/3 dropped
    np.testing.assert_allclose(float(res.contact_truncated_frac), 2.0 / 3.0,
                               atol=1e-6)
    init_reproj = S.get_fitting_loss(
        model, prior, jnp.asarray(init_pose), jnp.asarray(gt_betas),
        jnp.asarray(t_gt), jnp.asarray(cc), jnp.asarray(kp2d))
    assert float(res.reprojection_loss.sum()) < float(init_reproj.sum())


def test_smplify_compaction_with_candidate_k(tiny_smpl, rng):
    """Compaction composes with candidate_k: the exact seed + sticky
    refresh run on the compacted sub-batch; result stays close to the
    uncompacted candidate_k fit."""
    model, prior, ca, extras, gt_pose, gt_betas, t_gt, cc, kp2d = \
        setup_problem(tiny_smpl, rng, B=4)
    B = 4
    init_pose = gt_pose + rng.randn(*gt_pose.shape).astype(np.float32) * 0.1
    P = len(extras.contact_classes)
    gt_contact = np.zeros((B, P), np.float32)
    gt_contact[:, 0] = 1
    ignore = jnp.asarray([False, True, False, True])
    args = (jnp.asarray(init_pose), jnp.asarray(gt_betas), jnp.asarray(t_gt),
            jnp.asarray(cc), jnp.asarray(kp2d), jnp.asarray(gt_contact),
            ignore, jnp.ones(B, bool), jnp.zeros(B, bool))
    V = model.v_template.shape[0]

    def fit(cap):
        cfg = S.SMPLifyConfig(num_iters=6, use_contact=True, euclthres=0.02,
                              contact_candidate_k=max(8, V // 4),
                              exterior_refresh_every=2,
                              contact_capacity=cap)
        return jax.jit(lambda *a: S.smplify_dc(model, prior, ca, *a,
                                               config=cfg))(*args)

    full = fit(0)
    compact = fit(2)
    np.testing.assert_allclose(np.asarray(compact.pose),
                               np.asarray(full.pose), atol=1e-5)


@pytest.mark.slow
def test_candidate_k_fold_blind_spot_and_sticky_recovery(tiny_smpl):
    """Pins the documented candidate_k limitation (losses/smplify.py
    contact_neighbors docstring) adversarially: a crumpled pose creates
    geodesically-local fold interiors whose masked nearest-vertex distance
    is large, so distance-ranked candidate selection alone misses them.
    The exact-seed + sticky prev_exterior machinery must (a) expose the
    blind spot without a seed, (b) keep every seeded interior tracked
    through candidate refreshes, and (c) clear stale flags once the fold
    resolves."""
    from tuch_tpu.losses.smplify import contact_neighbors
    from tuch_tpu.models.smpl import smpl_forward_pose72

    model, extras = tiny_smpl
    ca = make_contact_assets(tiny_smpl)
    V = model.v_template.shape[0]
    K = max(8, V // 8)

    # Crumpled pose (seed 4, amplitude 0.45): folds -> interior vertices.
    prng = np.random.RandomState(4)
    pose_fold = np.zeros((1, 72), np.float32)
    pose_fold[:, 3:] = prng.randn(69).astype(np.float32) * 0.45
    verts_fold = smpl_forward_pose72(
        model, jnp.zeros((1, 10)), jnp.asarray(pose_fold)).vertices
    ext_exact, _ = contact_neighbors(verts_fold, ca, candidate_k=0)
    interior = ~np.asarray(ext_exact)[0]
    assert interior.sum() >= 5, 'fixture regressed: pose no longer folds'

    # (a) Blind spot: plain candidate selection misses fold interiors.
    ext_plain, _ = contact_neighbors(verts_fold, ca, candidate_k=K)
    missed = np.asarray(ext_plain)[0] & interior
    assert missed.sum() > 0, (
        'candidate heuristic now sees fold interiors -- the documented '
        'limitation (and this test) no longer apply; update the docstring')

    # (b) Sticky recovery: with the exact seed threaded as prev_exterior,
    # every interior is retested first and stays correctly flagged.
    ext_sticky, _ = contact_neighbors(verts_fold, ca, candidate_k=K,
                                      prev_exterior=ext_exact)
    np.testing.assert_array_equal(np.asarray(ext_sticky)[0][interior],
                                  np.zeros(int(interior.sum()), bool))

    # (c) No over-stick: once the fold resolves (rest pose), a candidate
    # refresh carrying the stale interior flags must clear them (known
    # interiors are always retested; rest pose has no interiors).
    verts_rest = smpl_forward_pose72(
        model, jnp.zeros((1, 10)),
        jnp.zeros((1, 72))).vertices
    ext_rest_exact, _ = contact_neighbors(verts_rest, ca, candidate_k=0)
    n_stale = int(interior.sum())
    if bool(np.asarray(ext_rest_exact)[0][interior].all()):
        ext_recover, _ = contact_neighbors(verts_rest, ca, candidate_k=K,
                                           prev_exterior=ext_exact)
        assert np.asarray(ext_recover)[0][interior].all(), (
            f'{n_stale} stale interior flags survived a candidate refresh '
            'after the fold resolved')
