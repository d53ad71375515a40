"""END-TO-END parity: the reference's SMPLifyDC.__call__ vs our smplify_dc.

Executes the ACTUAL optimizer from /root/reference/tuch/smplify/smplifydc.py
(both stages, Adam defaults, ignored-joint handling, final reprojection
evaluation) on the tiny synthetic body and compares full fit outputs and the
stage-2 vertex trajectory against fitting/smplify_dc.smplify_dc. This closes
the largest previously-untested semantic surface: stage WIRING, not just the
individual loss terms (those are covered in test_reference_parity.py).

Shims (the reference imports smplx + external assets we don't have):
  * tuch.models.smpl   -> a torch transcription of our synthetic-SMPL LBS
    (axis-angle in, ModelOutput(vertices, joints, betas) out). LBS parity
    itself is covered elsewhere (test_smpl.py brute force,
    test_reference_parity.py winding on posed bodies); what this file tests
    is everything AROUND the body model.
  * data.essentials.constants -> JOINT_IDS from tuch_tpu.constants.
  * configs.config.PRIOR_FOLDER -> tmp dir with our synthetic GMM pkl.

Skips cleanly if /root/reference or torch is unavailable.
"""

import importlib
import os
import pickle
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

REF_ROOT = '/root/reference'

torch = pytest.importorskip('torch')
if not os.path.isdir(REF_ROOT):  # pragma: no cover
    pytest.skip('reference repo not mounted', allow_module_level=True)


def _make_torch_smpl(model):
    """Torch nn.Module transcribing models/smpl.py smpl_forward for the
    given SMPLModel arrays, with the reference SMPL's call signature
    (tuch/models/smpl.py:44-56: axis-angle kwargs, 49-joint output)."""
    from collections import namedtuple

    Out = namedtuple('ModelOutput', ['vertices', 'joints', 'betas'])
    t = lambda a: torch.tensor(np.asarray(a), dtype=torch.float32)
    vt, shapedirs = t(model.v_template), t(model.shapedirs)
    posedirs, Jreg = t(model.posedirs), t(model.J_regressor)
    lbs_w, Jx = t(model.lbs_weights), t(model.J_regressor_extra)
    parents = np.asarray(model.parents)
    vjid = np.asarray(model.vertex_joint_ids)
    jmap = np.asarray(model.joint_map)
    faces_np = np.asarray(model.faces)

    def rodrigues(aa):  # (N, 3) -> (N, 3, 3), same quat path as reference
        angle = torch.norm(aa + 1e-8, dim=1, keepdim=True)
        axis = aa / angle
        half = angle * 0.5
        w, xyz = torch.cos(half), torch.sin(half) * axis
        x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        w = w[:, 0]
        return torch.stack([
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ], dim=1).reshape(-1, 3, 3)

    class RefSMPL(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()
            self.faces = faces_np

        def forward(self, global_orient=None, body_pose=None, betas=None,
                    return_full_pose=False):
            B, J = betas.shape[0], Jreg.shape[0]
            aa = torch.cat([global_orient.reshape(B, 1, 3),
                            body_pose.reshape(B, J - 1, 3)], dim=1)
            rot = rodrigues(aa.reshape(-1, 3)).reshape(B, J, 3, 3)
            v_shaped = vt[None] + torch.einsum('vds,bs->bvd', shapedirs,
                                               betas)
            joints_rest = torch.einsum('jv,bvd->bjd', Jreg, v_shaped)
            eye = torch.eye(3)
            pose_feat = (rot[:, 1:] - eye).reshape(B, -1)
            v_posed = v_shaped + torch.einsum('vdp,bp->bvd', posedirs,
                                              pose_feat)
            rel = joints_rest.clone()
            rel[:, 1:] = rel[:, 1:] - joints_rest[:, parents[1:]]
            top = torch.cat([rot, rel[..., None]], dim=-1)
            bottom = torch.zeros(B, J, 1, 4)
            bottom[..., 3] = 1.0
            mats = torch.cat([top, bottom], dim=-2)
            chains = [mats[:, 0]]
            for j in range(1, J):
                chains.append(chains[parents[j]] @ mats[:, j])
            A = torch.stack(chains, dim=1)
            posed_joints = A[:, :, :3, 3]
            jh = torch.cat([joints_rest, torch.zeros(B, J, 1)], dim=-1)
            corr = torch.einsum('bjik,bjk->bji', A, jh)
            A_rel = A.clone()
            A_rel[:, :, :3, 3] = A_rel[:, :, :3, 3] - corr[..., :3]
            T = torch.einsum('vj,bjik->bvik', lbs_w, A_rel)
            verts = (torch.einsum('bvik,bvk->bvi', T[..., :3, :3], v_posed)
                     + T[..., :3, 3])
            vertex_joints = verts[:, vjid, :]
            extra = torch.einsum('jv,bvd->bjd', Jx, verts)
            j54 = torch.cat([posed_joints, vertex_joints, extra], dim=1)
            return Out(vertices=verts, joints=j54[:, jmap, :], betas=betas)

    return RefSMPL


@pytest.fixture(scope='module')
def ref_setup(tmp_path_factory):
    """Import the reference SMPLifyDC with shimmed deps; build the shared
    synthetic problem. Returns a dict of everything both sides need."""
    from tuch_tpu import assets as assets_mod
    from tuch_tpu import constants as C
    from tuch_tpu.models.smpl import smpl_forward_pose72
    from tuch_tpu.utils.projection import perspective_projection

    tmp_path = tmp_path_factory.mktemp('smplify_e2e')
    model, extras = assets_mod.synthetic_smpl(num_verts=170, seed=0)
    gmm = assets_mod.synthetic_gmm_prior(dim=69)
    prior_dir = tmp_path / 'prior'
    prior_dir.mkdir()
    with open(prior_dir / 'gmm_08.pkl', 'wb') as f:
        pickle.dump({'means': gmm['means'], 'covars': gmm['covs'],
                     'weights': gmm['weights']}, f)

    # --- shim modules, then import the real smplifydc -------------------
    fake_const = types.ModuleType('data.essentials.constants')
    fake_const.JOINT_IDS = dict(C.JOINT_IDS)
    fake_ess = types.ModuleType('data.essentials')
    fake_ess.constants = fake_const
    fake_data = types.ModuleType('data')
    fake_data.essentials = fake_ess
    fake_smpl_mod = types.ModuleType('tuch.models.smpl')
    fake_smpl_mod.SMPL = _make_torch_smpl(model)

    saved = {k: sys.modules.get(k) for k in
             ('data', 'data.essentials', 'data.essentials.constants',
              'tuch.models.smpl')}
    sys.modules.update({'data': fake_data, 'data.essentials': fake_ess,
                        'data.essentials.constants': fake_const,
                        'tuch.models.smpl': fake_smpl_mod})
    sys.path.insert(0, REF_ROOT)
    try:
        ref_cfg = importlib.import_module('configs.config')
        sdc_mod = importlib.import_module('tuch.smplify.smplifydc')
        ref_losses = importlib.import_module('tuch.smplify.losses')
        ref_contact = importlib.import_module('tuch.utils.contact')
    finally:
        sys.path.remove(REF_ROOT)
        for k, v in saved.items():  # don't leak fakes to other tests
            if v is None:
                sys.modules.pop(k, None)
            else:  # pragma: no cover
                sys.modules[k] = v
    # the reference hard-defaults to CUDA inside the loss (use_cuda=True in
    # batch_pairwise_dist, device='cuda' in contact_fitting_loss, and
    # smplifydc calls the latter without a device kwarg)
    import functools
    ref_losses.batch_pairwise_dist = functools.partial(
        ref_contact.batch_pairwise_dist, use_cuda=False)
    sdc_mod.contact_fitting_loss = functools.partial(
        ref_losses.contact_fitting_loss, device='cpu')
    ref_cfg.PRIOR_FOLDER = str(prior_dir)

    # --- shared synthetic problem ---------------------------------------
    rng = np.random.RandomState(11)
    B = 3
    gt_pose = np.zeros((B, 72), np.float32)
    gt_pose[:, 3:] = np.asarray(gmm['means'])[0] * 0.3
    out = smpl_forward_pose72(model, jnp.zeros((B, 10)),
                              jnp.asarray(gt_pose))
    cam_t = np.tile(np.array([[0, 0, 20.0]], np.float32), (B, 1))
    cc = np.full((B, 2), 112.0, np.float32)
    proj = perspective_projection(
        out.joints, jnp.tile(jnp.eye(3)[None], (B, 1, 1)),
        jnp.asarray(cam_t), 5000.0, jnp.asarray(cc))
    j2d = np.asarray(proj) + rng.randn(B, 49, 2).astype(np.float32) * 2.0
    conf = rng.uniform(0.3, 1.0, (B, 49)).astype(np.float32)
    kp = np.concatenate([j2d, conf[..., None]], -1).astype(np.float32)

    P = len(extras.contact_classes)
    gt_contact = np.zeros((B, P), np.float32)
    gt_contact[0, 0] = 1
    gt_contact[2, :2] = 1
    init_pose = (gt_pose + rng.randn(B, 72).astype(np.float32) * 0.15)
    init_betas = (rng.randn(B, 10) * 0.1).astype(np.float32)
    ignore = np.array([False, True, False])
    has_dc = np.array([True, False, True])
    has_gtkp = np.array([True, False, True])

    return dict(model=model, extras=extras, gmm=gmm, sdc_mod=sdc_mod,
                init_pose=init_pose, init_betas=init_betas, cam_t=cam_t,
                cc=cc, kp=kp, gt_contact=gt_contact, ignore=ignore,
                has_dc=has_dc, has_gtkp=has_gtkp, B=B)


def _run_reference(s, use_contact, num_iters):
    tt = lambda a: torch.tensor(np.asarray(a))
    extras = s['extras']
    sdc = s['sdc_mod'].SMPLifyDC(
        step_size=1e-2, batch_size=s['B'], num_iters=num_iters,
        geodistssmpl=tt(extras.geodists.astype(np.float32)), geothres=0.3,
        euclthres=0.02, device=torch.device('cpu'))
    cdict = {'classes': extras.contact_classes,
             'csig': {k: torch.tensor(np.asarray(v), dtype=torch.long)
                      for k, v in extras.contact_csig.items()}}
    (verts, joints, pose, betas, cam_t, reproj, optiverts) = sdc(
        tt(s['init_pose']), tt(s['init_betas']), tt(s['cam_t']),
        tt(s['cc']), tt(s['kp']), use_contact=use_contact,
        contactlist=cdict, gt_contact=[tt(s['gt_contact'])],
        ignore_idxs=tt(s['ignore']), has_discrete_contact=tt(s['has_dc']),
        has_gt_keypoints=tt(s['has_gtkp']),
        contact_loss_weight=2000.0)
    traj = (torch.stack(optiverts).detach().numpy()
            if optiverts else None)
    return dict(vertices=verts.numpy(), joints=joints.numpy(),
                pose=pose.numpy(), betas=betas.numpy(),
                cam_t=cam_t.detach().numpy(), reproj=reproj.numpy(),
                traj=traj)


def _run_ours(s, use_contact, num_iters):
    import jax
    from tuch_tpu.fitting import smplify_dc as S
    from tuch_tpu.losses.prior import create_gmm_prior
    from tuch_tpu.losses.smplify import ContactAssets
    from tuch_tpu.ops import contact as contact_ops

    extras = s['extras']
    ia, ib, ma, mb = contact_ops.build_region_pairs(
        extras.contact_classes, extras.contact_csig)
    ca = ContactAssets(
        geomask=jnp.asarray(extras.geodists > 0.3),
        faces=jnp.asarray(s['model'].faces),
        region_idx_a=jnp.asarray(ia), region_idx_b=jnp.asarray(ib),
        region_mask_a=jnp.asarray(ma), region_mask_b=jnp.asarray(mb))
    cfg = S.SMPLifyConfig(num_iters=num_iters, use_contact=use_contact,
                          euclthres=0.02, contact_loss_weight=2000.0,
                          collect_trajectory=True)
    res = jax.jit(lambda *a: S.smplify_dc(
        s['model'], create_gmm_prior(s['gmm']), ca, *a, config=cfg))(
        jnp.asarray(s['init_pose']), jnp.asarray(s['init_betas']),
        jnp.asarray(s['cam_t']), jnp.asarray(s['cc']), jnp.asarray(s['kp']),
        jnp.asarray(s['gt_contact']), jnp.asarray(s['ignore']),
        jnp.asarray(s['has_dc']), jnp.asarray(s['has_gtkp']))
    return dict(vertices=np.asarray(res.vertices),
                joints=np.asarray(res.joints),
                pose=np.asarray(res.pose), betas=np.asarray(res.betas),
                cam_t=np.asarray(res.camera_translation),
                reproj=np.asarray(res.reprojection_loss),
                traj=np.asarray(res.trajectory))


@pytest.mark.parametrize('use_contact', [True, False],
                         ids=['contact', 'spin'])
def test_smplify_dc_end_to_end_matches_reference(ref_setup, use_contact):
    """Full two-stage fit: final pose/betas/cam_t/vertices, the per-joint
    reprojection evaluation, and the stage-2 vertex trajectory all match
    the executed reference after 10+10 Adam iterations.

    Tolerances are fp32-accumulation bounds: both sides run identical math
    in different association orders through 20 Adam steps; divergence
    compounds roughly linearly in steps (measured ~1e-5 after 1 step).
    """
    N = 10
    ref = _run_reference(ref_setup, use_contact, N)
    ours = _run_ours(ref_setup, use_contact, N)

    np.testing.assert_allclose(ours['cam_t'], ref['cam_t'], atol=2e-4)
    np.testing.assert_allclose(ours['betas'], ref['betas'], atol=2e-4)
    np.testing.assert_allclose(ours['pose'], ref['pose'], atol=5e-4)
    np.testing.assert_allclose(ours['vertices'], ref['vertices'],
                               atol=5e-4)
    np.testing.assert_allclose(ours['joints'], ref['joints'], atol=5e-4)
    # per-joint reprojection terms are O(100s); compare relatively
    np.testing.assert_allclose(ours['reproj'], ref['reproj'],
                               rtol=2e-3, atol=1e-2)
    # stage-2 trajectory: frame 0 is the pre-optimization body (tight);
    # later frames accumulate fp drift
    assert ours['traj'].shape == ref['traj'].shape
    np.testing.assert_allclose(ours['traj'][0], ref['traj'][0], atol=1e-5)
    np.testing.assert_allclose(ours['traj'], ref['traj'], atol=5e-4)
