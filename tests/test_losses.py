"""Tests for prior, smplify losses, and the regressor loss."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tuch_tpu import assets, constants
from tuch_tpu.losses import prior as prior_mod
from tuch_tpu.losses import smplify as SL
from tuch_tpu.losses import regressor as RL
from tuch_tpu.ops import contact as contact_ops
from tuch_tpu.ops.segments import build_segment_tables


def make_prior():
    return prior_mod.create_gmm_prior(assets.synthetic_gmm_prior())


def make_contact_assets(tiny, with_segments=False):
    model, extras = tiny
    ia, ib, ma, mb = contact_ops.build_region_pairs(
        extras.contact_classes, extras.contact_csig)
    seg = None
    if with_segments:
        seg = build_segment_tables(extras.segments, np.asarray(model.faces),
                                   model.v_template.shape[0])
    return SL.ContactAssets(
        geomask=jnp.asarray(extras.geodists > 0.3),
        faces=jnp.asarray(model.faces),
        region_idx_a=jnp.asarray(ia), region_idx_b=jnp.asarray(ib),
        region_mask_a=jnp.asarray(ma), region_mask_b=jnp.asarray(mb),
        segment_tables=seg)


def test_gmof():
    x = jnp.array([0.0, 1.0, 100.0, 1e6])
    out = np.asarray(SL.gmof(x, 100.0))
    assert out[0] == 0.0
    # saturates at sigma^2
    np.testing.assert_allclose(out[3], 100.0 ** 2, rtol=1e-3)
    np.testing.assert_allclose(out[2], 100.0 ** 2 / 2, rtol=1e-5)


def test_gmm_prior_lowest_at_mean():
    p = make_prior()
    at_mean = np.asarray(prior_mod.gmm_prior_nll(p, p.means[:1]))
    away = np.asarray(prior_mod.gmm_prior_nll(p, p.means[:1] + 3.0))
    assert at_mean[0] < away[0]


def test_gmm_prior_matches_manual(rng):
    gmm = assets.synthetic_gmm_prior()
    p = prior_mod.create_gmm_prior(gmm)
    pose = rng.randn(3, 69).astype(np.float32)
    out = np.asarray(prior_mod.gmm_prior_nll(p, jnp.asarray(pose)))
    # manual
    precisions = np.stack([np.linalg.inv(c) for c in gmm['covs']])
    sqrdets = np.sqrt([np.linalg.det(c) for c in gmm['covs']])
    const = (2 * np.pi) ** (69 / 2)
    nw = gmm['weights'] / (const * (sqrdets / sqrdets.min()))
    vals = []
    for b in range(3):
        comp = []
        for m in range(len(nw)):
            d = pose[b] - gmm['means'][m]
            comp.append(0.5 * d @ precisions[m] @ d - np.log(nw[m]))
        vals.append(min(comp))
    np.testing.assert_allclose(out, vals, rtol=1e-3)


def test_angle_prior_sign():
    pose = np.zeros((2, 69), np.float32)
    base = np.asarray(SL.angle_prior(jnp.asarray(pose))).sum()
    # bending a knee the "wrong" way increases the prior
    pose[0, 52] = 1.0
    out = np.asarray(SL.angle_prior(jnp.asarray(pose)))
    assert out[0].sum() > base / 2 + out[1].sum() / 2


def test_camera_fitting_loss_decreases_with_truth(rng, tiny_smpl):
    model, _ = tiny_smpl
    from tuch_tpu.models.smpl import smpl_forward_pose72
    from tuch_tpu.utils.projection import perspective_projection
    out = smpl_forward_pose72(model, jnp.zeros((1, 10)), jnp.zeros((1, 72)))
    t_gt = jnp.array([[0.0, 0.0, 20.0]])
    cc = jnp.full((1, 2), 112.0)
    proj = perspective_projection(out.joints, jnp.eye(3)[None], t_gt,
                                  5000.0, cc)
    j2d = jnp.asarray(proj)
    conf = jnp.ones((1, 49))
    good = SL.camera_fitting_loss(out.joints, jnp.zeros((1, 10)), t_gt,
                                  t_gt, cc, j2d, conf)
    bad = SL.camera_fitting_loss(out.joints, jnp.zeros((1, 10)),
                                 t_gt + jnp.array([[0.3, 0.0, 1.0]]),
                                 t_gt, cc, j2d, conf)
    assert float(good) < float(bad)


def test_self_contact_terms_shapes(tiny_smpl, rng):
    ca = make_contact_assets(tiny_smpl, with_segments=True)
    model, _ = tiny_smpl
    V = model.v_template.shape[0]
    verts = jnp.asarray(np.tile(np.asarray(model.v_template)[None],
                                (2, 1, 1)))
    ext, v2v, inc = SL.self_contact_terms(verts, ca, euclthres=0.02)
    assert ext.shape == (2, V) and v2v.shape == (2, V)
    # rest sphere: everything exterior, nothing interior
    assert np.asarray(ext).mean() > 0.95


def test_contact_fitting_loss_masking(tiny_smpl, rng):
    """ignored samples contribute no contact/r2r terms."""
    ca = make_contact_assets(tiny_smpl)
    model, extras = tiny_smpl
    p = make_prior()
    V = model.v_template.shape[0]
    verts = jnp.asarray(rng.randn(2, V, 3).astype(np.float32) * 0.3)
    joints = jnp.asarray(rng.randn(2, 49, 3).astype(np.float32))
    P = len(extras.contact_classes)
    args = dict(
        body_pose=jnp.zeros((2, 69)), global_orient=jnp.zeros((2, 3)),
        betas=jnp.zeros((2, 10)), model_joints=joints, verts=verts,
        camera_t=jnp.array([[0., 0., 20.]] * 2),
        camera_center=jnp.full((2, 2), 112.0),
        joints_2d=jnp.zeros((2, 49, 2)), joints_conf=jnp.zeros((2, 49)),
        prior=p, assets=ca, gt_contact=jnp.ones((2, P)),
        euclthres=0.02, contact_loss_weight=1000.0)
    all_ignored = SL.contact_fitting_loss(
        ignore_idxs=jnp.array([True, True]),
        has_discrete_contact=jnp.array([True, True]), **args)
    none_ignored = SL.contact_fitting_loss(
        ignore_idxs=jnp.array([False, False]),
        has_discrete_contact=jnp.array([True, True]), **args)
    # with zero kp conf, remaining diff is purely contact terms
    assert float(none_ignored) != float(all_ignored)


def test_regressor_loss_components(tiny_smpl, rng):
    model, _ = tiny_smpl
    V = model.v_template.shape[0]
    B = 4
    w = RL.LossWeights(contact=0.0)
    pred_rotmat = jnp.tile(jnp.eye(3)[None, None], (B, 24, 1, 1))
    total, d = RL.regressor_loss(
        w, pred_rotmat, jnp.zeros((B, 10)), jnp.zeros((B, 72)),
        jnp.zeros((B, 10)), jnp.zeros((B, 49, 2)),
        jnp.concatenate([jnp.zeros((B, 49, 2)), jnp.ones((B, 49, 1))], -1),
        jnp.zeros((B, 49, 3)), jnp.zeros((B, 24, 4)),
        jnp.zeros(B, bool), jnp.zeros((B, V, 3)), jnp.zeros((B, V, 3)),
        jnp.ones((B, 3)), jnp.ones(B, bool), jnp.ones(B, bool))
    # identity rotmat == zero-pose rodrigues -> zero pose loss
    np.testing.assert_allclose(float(d['loss_regr_pose']), 0.0, atol=1e-8)
    np.testing.assert_allclose(float(d['loss_regr_betas']), 0.0, atol=1e-8)
    assert np.isfinite(float(total))


def test_regressor_loss_empty_masks(tiny_smpl):
    """All-invalid masks must give 0 (reference returns 0 on empty)."""
    model, _ = tiny_smpl
    V = model.v_template.shape[0]
    B = 2
    w = RL.LossWeights(contact=0.0)
    pred_rotmat = jnp.tile(jnp.eye(3)[None, None], (B, 24, 1, 1))
    _, d = RL.regressor_loss(
        w, pred_rotmat, jnp.zeros((B, 10)), jnp.zeros((B, 72)),
        jnp.zeros((B, 10)), jnp.zeros((B, 49, 2)),
        jnp.ones((B, 49, 3)), jnp.zeros((B, 49, 3)), jnp.zeros((B, 24, 4)),
        jnp.zeros(B, bool), jnp.zeros((B, V, 3)), jnp.zeros((B, V, 3)),
        jnp.ones((B, 3)), jnp.zeros(B, bool), jnp.zeros(B, bool))
    assert float(d['loss_keypoints']) == 0.0
    assert float(d['loss_regr_pose']) == 0.0
    assert float(d['loss_keypoints_3d']) == 0.0


def test_contact_loss_pull_tightens(tiny_smpl):
    """Pull energy decreases as geodesically-distant surfaces come into
    contact: squashing the body so opposite walls nearly touch must lower
    the (saturated) pull term -- the gradient pulls contact tight."""
    model, extras = tiny_smpl
    ca = make_contact_assets(tiny_smpl)
    v = np.asarray(model.v_template).copy()
    v2 = v.copy()
    v2[:, 1] *= 0.02  # walls ~0.007 apart, geodesically far
    loss_rest, _ = RL.contact_loss(jnp.asarray(v)[None], ca,
                                   jnp.array([True]), euclthres=0.02)
    loss_squashed, _ = RL.contact_loss(jnp.asarray(v2)[None], ca,
                                       jnp.array([True]), euclthres=0.02)
    assert float(loss_squashed) < float(loss_rest)


def test_push_pull_terms_formula(rng):
    """Golden-value check of the push/pull energies."""
    B, V = 2, 7
    d = jnp.asarray(rng.rand(B, V).astype(np.float32) * 0.1)
    ext = jnp.asarray(rng.rand(B, V) > 0.5)
    inc = jnp.asarray(rng.rand(B, V) > 0.5)
    out = np.asarray(SL.push_pull_terms(ext, d, inc))
    d_np, ext_np, inc_np = map(np.asarray, (d, ext, inc))
    pull = 0.005 * np.tanh(d_np / 0.005) ** 2
    push = 1.0 * np.tanh(d_np / 0.04) ** 2
    expect = (pull * (ext_np & inc_np)).sum(-1) + (push * ~ext_np).sum(-1)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_contact_loss_grad(tiny_smpl):
    model, _ = tiny_smpl
    ca = make_contact_assets(tiny_smpl)

    def f(v):
        return RL.contact_loss(v, ca, jnp.array([True]), euclthres=0.02)[0]

    g = jax.grad(f)(jnp.asarray(np.asarray(model.v_template))[None] * 0.9)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_hd_selection_any_face_vertex(tiny_smpl):
    """HD candidates are selected when ANY of the source face's 3 vertices
    is in contact/interior (reference loss.py:278-281) -- a representative-
    first-vertex rule would miss faces whose v0 is inactive."""
    model, _ = tiny_smpl
    ca = make_contact_assets(tiny_smpl)
    v = np.asarray(model.v_template).copy()
    v[:, 1] *= 0.02  # opposite walls ~0.007 apart -> in contact
    verts = jnp.asarray(v)[None]

    ext, v2v_min, in_c = SL.self_contact_terms(verts, ca, euclthres=0.02)
    active = np.asarray(in_c[0] | ~ext[0])
    faces = np.asarray(model.faces)
    geomask = np.asarray(ca.geomask)
    # face A: FIRST vertex inactive but another vertex active -- exactly
    # the case where any-vertex and first-vertex selection disagree.
    cand_a = np.where(~active[faces[:, 0]]
                      & (active[faces[:, 1]] | active[faces[:, 2]]))[0]
    assert cand_a.size > 0, 'crafted mesh must exercise the divergence'
    # face B: all verts active, geodesically far from A (opposite wall) so
    # the pair passes the HD geomask.
    all_active = np.where(active[faces].all(axis=1))[0]
    fa, fb = -1, -1
    for a in cand_a:
        far = all_active[geomask[faces[a, 0], faces[all_active, 0]]]
        if far.size:
            fa, fb = int(a), int(far[0])
            break
    assert fa >= 0, 'need a geodesically-far all-active partner face'

    # two HD points: barycenters of faces A and B
    hd = RL.make_hd_assets_compact(
        vert_ids=faces[[fa, fb]], bary=np.full((2, 3), 1 / 3, np.float32),
        geovec=np.array([fa, fb]), faces=faces)
    loss, aux = RL.contact_loss(verts, ca, jnp.array([True]),
                                euclthres=0.02, hd=hd, hd_k=2)
    # any-vertex rule selects BOTH points -> they are each other's
    # neighbor -> nonzero push/pull energy. First-vertex-only selection
    # would drop point A, leaving B neighborless -> exactly 0.
    assert float(loss) > 0.0
    assert float(aux['hd_truncated_frac']) == 0.0


@pytest.mark.slow
def test_hd_truncation_metric(tiny_smpl):
    """hd_k smaller than the active candidate count must be reported."""
    model, extras = tiny_smpl
    ca = make_contact_assets(tiny_smpl)
    v = np.asarray(model.v_template).copy()
    v[:, 1] *= 0.02
    verts = jnp.asarray(v)[None]
    hd = RL.make_hd_assets_compact(extras.hd_vert_ids, extras.hd_bary,
                                   extras.hd_geovec,
                                   np.asarray(model.faces))
    _, aux_small = RL.contact_loss(verts, ca, jnp.array([True]),
                                   euclthres=0.02, hd=hd, hd_k=2)
    _, aux_big = RL.contact_loss(verts, ca, jnp.array([True]),
                                 euclthres=0.02, hd=hd,
                                 hd_k=int(hd.geovec.shape[0]))
    assert float(aux_small['hd_truncated_frac']) > 0.0
    assert float(aux_big['hd_truncated_frac']) == 0.0


@pytest.mark.slow
def test_contact_neighbors_candidate_k(tiny_smpl):
    """Opt-in candidate-set winding (candidate_k > 0).

    Craft a body with a patch pushed inside the opposite wall. The exact
    path (candidate_k=0) must flag interiors; a candidate set big enough
    to cover every near-neighbor vertex must reproduce the exact flags,
    and ANY candidate set can only mark extra vertices exterior, never
    extra interiors (one-sided approximation).
    """
    model, extras = tiny_smpl
    ca = make_contact_assets(tiny_smpl)
    v = np.asarray(model.v_template).copy()
    V = v.shape[0]
    # Pull the +x cap deep inside: enclosed by the rest of the sphere.
    cap = v[:, 0] > 0.6 * np.abs(v[:, 0]).max()
    v2 = v.copy()
    v2[cap] *= -0.5
    verts = jnp.asarray(v2)[None]

    ext_exact, arg_exact = SL.contact_neighbors(verts, ca)
    n_interior = int((~np.asarray(ext_exact)).sum())
    assert n_interior > 0, 'crafted body must have interior vertices'

    # near-covering candidate set THROUGH the candidate machinery
    # (K = V-1 passes the K < V guard, unlike K = V which would be the
    # exact path again); the one uncovered vertex is the farthest from
    # any allowed neighbor, which is exterior on this body.
    ext_full, _ = SL.contact_neighbors(verts, ca, candidate_k=V - 1)
    np.testing.assert_array_equal(np.asarray(ext_full),
                                  np.asarray(ext_exact))

    # covering candidate set: compute the exact rank needed so every
    # interior vertex is among the K nearest-pair candidates, then the
    # candidate flags must match the exact flags exactly
    min_d2, _ = contact_ops.masked_min_dist(verts, ca.geomask)
    order = np.argsort(np.asarray(min_d2)[0])          # ascending distance
    rank = np.empty(V, np.int64)
    rank[order] = np.arange(V)
    k_cover = int(rank[~np.asarray(ext_exact)[0]].max()) + 1
    assert k_cover < V  # the crafted body must make this non-trivial
    ext_k, _ = SL.contact_neighbors(verts, ca, candidate_k=k_cover)
    np.testing.assert_array_equal(np.asarray(ext_k), np.asarray(ext_exact))

    # one-sided: a tiny candidate set may miss interiors (mark them
    # exterior) but never invents interiors the exact path doesn't have
    ext_1, _ = SL.contact_neighbors(verts, ca, candidate_k=4)
    assert (~np.asarray(ext_1) <= ~np.asarray(ext_exact)).all()


def test_smplify_contact_candidate_k_converges(tiny_smpl, rng):
    """smplify_dc with contact_candidate_k produces a finite, improving
    fit (the opt-in fast path composes with the scan loop)."""
    from tests.test_smplify import setup_problem
    from tuch_tpu.fitting import smplify_dc as S

    model, prior, ca, extras, gt_pose, gt_betas, t_gt, cc, kp2d = \
        setup_problem(tiny_smpl, rng)
    B = gt_pose.shape[0]
    init_pose = gt_pose + rng.randn(*gt_pose.shape).astype(np.float32) * 0.2
    P = len(extras.contact_classes)
    gt_contact = np.zeros((B, P), np.float32)
    gt_contact[:, 0] = 1

    cfg = S.SMPLifyConfig(num_iters=10, use_contact=True, euclthres=0.02,
                          contact_candidate_k=32)
    res = jax.jit(
        lambda *a: S.smplify_dc(model, prior, ca, *a, config=cfg))(
        jnp.asarray(init_pose), jnp.asarray(gt_betas), jnp.asarray(t_gt),
        jnp.asarray(cc), jnp.asarray(kp2d), jnp.asarray(gt_contact),
        jnp.zeros(B, bool), jnp.ones(B, bool), jnp.zeros(B, bool))
    assert np.isfinite(np.asarray(res.vertices)).all()
    init_reproj = S.get_fitting_loss(
        model, prior, jnp.asarray(init_pose), jnp.asarray(gt_betas),
        jnp.asarray(t_gt), jnp.asarray(cc), jnp.asarray(kp2d))
    assert float(res.reprojection_loss.sum()) < float(init_reproj.sum())


def test_regressor_contact_loss_candidate_k(tiny_smpl):
    """contact_loss with a covering candidate set equals the exact path."""
    model, extras = tiny_smpl
    ca = make_contact_assets(tiny_smpl)
    v = np.asarray(model.v_template).copy()
    cap = v[:, 0] > 0.6 * np.abs(v[:, 0]).max()
    v[cap] *= -0.5
    verts = jnp.asarray(v)[None]
    V = v.shape[0]
    exact, _ = RL.contact_loss(verts, ca, jnp.array([True]), euclthres=0.02)
    full, _ = RL.contact_loss(verts, ca, jnp.array([True]), euclthres=0.02,
                              candidate_k=V)
    np.testing.assert_allclose(float(full), float(exact), rtol=1e-6)


def test_candidate_prev_exterior_sticky_and_priority(tiny_smpl):
    """prev_exterior semantics: known interiors are retested first; with
    too few candidate slots, untested vertices KEEP their previous flag
    instead of being forced exterior."""
    model, extras = tiny_smpl
    ca = make_contact_assets(tiny_smpl)
    v = np.asarray(model.v_template).copy()
    V = v.shape[0]
    cap = v[:, 0] > 0.6 * np.abs(v[:, 0]).max()
    v2 = v.copy()
    v2[cap] *= -0.5
    verts = jnp.asarray(v2)[None]

    ext_exact, _ = SL.contact_neighbors(verts, ca)
    n_int = int((~np.asarray(ext_exact)).sum())
    assert n_int >= 2

    # priority: with prev = exact flags and K = n_int slots, the candidate
    # set is exactly the known interiors -> retested -> flags stay exact
    # (everything untested keeps its exact prev flag)
    ext_p, _ = SL.contact_neighbors(verts, ca, candidate_k=n_int,
                                    prev_exterior=ext_exact)
    np.testing.assert_array_equal(np.asarray(ext_p), np.asarray(ext_exact))

    # stickiness: artificially mark two exterior-in-truth vertices as
    # previously interior; with K=1 only one gets retested (and cleared),
    # the other stays interior by stickiness
    ext_np = np.asarray(ext_exact)
    fake = np.where(ext_np[0])[0][:2]
    prev = ext_np.copy()
    prev[0, fake] = False
    ext_s, _ = SL.contact_neighbors(verts, ca, candidate_k=1,
                                    prev_exterior=jnp.asarray(prev))
    ext_s = np.asarray(ext_s)
    # exactly one of the two fakes was retested and cleared
    assert int(ext_s[0, fake].sum()) == 1
    # no prev-None behavior leak: nothing else became interior
    assert (~ext_s[0]).sum() <= (~prev[0]).sum()


@pytest.mark.slow
def test_regressor_contact_capacity_matches_full(tiny_smpl):
    """capacity >= #valid reproduces the full loss exactly (the loss is a
    mean over valid samples; reference loss.py:247 skips invalid ones),
    with and without the HD path."""
    model, extras = tiny_smpl
    ca = make_contact_assets(tiny_smpl)
    rng = np.random.RandomState(0)
    V = model.v_template.shape[0]
    verts = jnp.asarray(
        np.asarray(model.v_template)[None]
        + 0.02 * rng.randn(4, V, 3).astype(np.float32))
    valid = jnp.asarray([True, False, True, False])
    hd = RL.make_hd_assets_compact(extras.hd_vert_ids, extras.hd_bary,
                                   extras.hd_geovec,
                                   np.asarray(model.faces))
    for hd_arg in (None, hd):
        full, aux_f = RL.contact_loss(verts, ca, valid, euclthres=0.02,
                                      hd=hd_arg, hd_k=8)
        comp, aux_c = RL.contact_loss(verts, ca, valid, euclthres=0.02,
                                      hd=hd_arg, hd_k=8, capacity=2)
        np.testing.assert_allclose(float(comp), float(full), rtol=1e-6)
        assert float(aux_c['contact_valid_truncated_frac']) == 0.0
        assert 'contact_valid_truncated_frac' not in aux_f

    # gradients must agree too (invalid samples contribute zero grad)
    g_full = jax.grad(lambda v: RL.contact_loss(
        v, ca, valid, euclthres=0.02)[0])(verts)
    g_comp = jax.grad(lambda v: RL.contact_loss(
        v, ca, valid, euclthres=0.02, capacity=2)[0])(verts)
    np.testing.assert_allclose(np.asarray(g_comp), np.asarray(g_full),
                               atol=1e-7)


def test_regressor_contact_capacity_overflow_reported(tiny_smpl):
    """capacity < #valid drops overflow-valid samples from the mean and
    reports the dropped fraction."""
    model, _ = tiny_smpl
    ca = make_contact_assets(tiny_smpl)
    rng = np.random.RandomState(1)
    V = model.v_template.shape[0]
    verts = jnp.asarray(
        np.asarray(model.v_template)[None]
        + 0.02 * rng.randn(4, V, 3).astype(np.float32))
    valid = jnp.asarray([True, True, True, False])
    loss, aux = RL.contact_loss(verts, ca, valid, euclthres=0.02,
                                capacity=1)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(
        float(aux['contact_valid_truncated_frac']), 2.0 / 3.0, atol=1e-6)
    # the compacted loss equals the mean over the FIRST valid sample only
    solo, _ = RL.contact_loss(verts[:1], ca, jnp.array([True]),
                              euclthres=0.02)
    np.testing.assert_allclose(float(loss), float(solo), rtol=1e-6)
