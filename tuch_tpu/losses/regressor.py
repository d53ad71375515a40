"""Training losses for the HMR regressor: SPIN terms + self-contact.

TPU-native redesign of tuch/train/loss.py. Structural changes:
  * The per-sample Python loop over the batch (loss.py:246-247, "iterate
    batch because of memory") is replaced by batched streamed kernels --
    winding numbers and masked min-dists never materialize their quadratic
    intermediates, so the whole batch runs in one XLA program.
  * Boolean-mask indexing (dynamic shapes) becomes fixed-shape masking with
    `jnp.where`; "empty selection -> 0 loss" falls out of the same masks.
  * The HD (dense surface) path selects a *fixed* K of upsampled points by
    contact score instead of a data-dependent boolean gather
    (loss.py:274-301), keeping shapes static under jit.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tuch_tpu.ops import contact as contact_ops
from tuch_tpu.losses.smplify import ContactAssets, self_contact_terms
from tuch_tpu.utils.rotations import batch_rodrigues


class LossWeights(NamedTuple):
    """Mirrors the reference flags (configs/train_options.py:53-59)."""
    shape: float = 0.0
    keypoint: float = 5.0
    pose: float = 1.0
    beta: float = 0.01
    contact: float = 1e-5
    openpose_train_weight: float = 1.0
    gt_train_weight: float = 1.0


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of values[mask], 0 when mask is empty (fixed-shape)."""
    m = mask.astype(values.dtype)
    denom = m.sum()
    return jnp.where(denom > 0, (values * m).sum() / jnp.maximum(denom, 1.0),
                     0.0)


def keypoint_loss(pred_kp2d, gt_kp2d, openpose_weight, gt_weight, valid_fit):
    """Confidence-weighted 2D reprojection MSE (tuch/train/loss.py:172-184).

    pred_kp2d: (B, 49, 2); gt_kp2d: (B, 49, 3) with confidence channel.
    Per-sample mean over joints/coords, then mean over valid_fit samples.
    """
    conf = gt_kp2d[..., 2:3]
    w = jnp.concatenate([
        jnp.full((25,), openpose_weight), jnp.full((24,), gt_weight)])
    conf = conf * w[None, :, None]
    per_sample = (conf * (pred_kp2d - gt_kp2d[..., :2]) ** 2).mean(axis=(1, 2))
    return _masked_mean(per_sample, valid_fit)


def keypoint_3d_loss(pred_joints, gt_joints, has_pose_3d):
    """Pelvis-aligned 3D keypoint MSE over samples with 3D annotations.

    pred_joints: (B, 49, 3) -- only the 24 GT-convention joints (25:) are
    compared; gt_joints: (B, 24, 4) with confidence
    (tuch/train/loss.py:186-205).
    """
    pred = pred_joints[:, 25:, :]
    conf = gt_joints[..., 3:4]
    gt = gt_joints[..., :3]
    gt_pelvis = (gt[:, 2, :] + gt[:, 3, :]) / 2
    gt = gt - gt_pelvis[:, None, :]
    pred_pelvis = (pred[:, 2, :] + pred[:, 3, :]) / 2
    pred = pred - pred_pelvis[:, None, :]
    per_sample = (conf * (pred - gt) ** 2).mean(axis=(1, 2))
    return _masked_mean(per_sample, has_pose_3d)


def shape_loss(pred_vertices, gt_vertices, has_smpl):
    """Per-vertex L1 over samples with SMPL annotations (loss.py:207-216)."""
    per_sample = jnp.abs(pred_vertices - gt_vertices).mean(axis=(1, 2))
    return _masked_mean(per_sample, has_smpl)


def smpl_param_loss(pred_rotmat, pred_betas, opt_pose, opt_betas,
                    valid_pose, valid_shape):
    """Rotation-matrix MSE + betas MSE over valid fits (loss.py:218-238)."""
    gt_rotmat = batch_rodrigues(opt_pose.reshape(-1, 24, 3))
    pose_per_sample = ((pred_rotmat - gt_rotmat) ** 2).mean(axis=(1, 2, 3))
    betas_per_sample = ((pred_betas - opt_betas) ** 2).mean(axis=1)
    return (_masked_mean(pose_per_sample, valid_pose),
            _masked_mean(betas_per_sample, valid_shape))


def camera_depth_loss(pred_camera):
    """Penalize negative/small weak-perspective scale (loss.py:147)."""
    return jnp.mean(jnp.exp(-pred_camera[:, 0] * 10) ** 2)


class HDAssets(NamedTuple):
    """Dense-surface upsampling tables (reference loss.py:81-91), stored in
    compact barycentric form: each HD point is a weighted combination of a
    handful of SMPL vertices (the reference keeps an (H, V) regressor and
    einsums it per sample, loss.py:285 -- dense that is ~0.4 GB; compacted
    it is a gather)."""
    vert_ids: jnp.ndarray        # (H, K) SMPL vertex ids per HD point
    bary: jnp.ndarray            # (H, K) combination weights
    geovec: jnp.ndarray          # (H,) face id each HD point samples from
    geovec_verts: jnp.ndarray    # (H,) representative SMPL vert per HD point
    face_verts: jnp.ndarray      # (H, 3) ALL verts of the source face --
                                 # candidate selection is any-vertex
                                 # (reference loss.py:279-281)


def compact_hd_regressor(vert_regressor: np.ndarray, k: int = 4):
    """(H, V) upsampling matrix -> (vert_ids (H, k), bary (H, k))."""
    vr = np.asarray(vert_regressor)
    order = np.argpartition(-np.abs(vr), k - 1, axis=1)[:, :k]
    rows = np.arange(vr.shape[0])[:, None]
    return order, vr[rows, order]


def make_hd_assets(vert_regressor: np.ndarray, geovec: np.ndarray,
                   faces: np.ndarray, k: int = 4) -> HDAssets:
    """Compact an (H, V) upsampling matrix to top-k barycentric form."""
    order, weights = compact_hd_regressor(vert_regressor, k)
    return make_hd_assets_compact(order, weights, geovec, faces)


def make_hd_assets_compact(vert_ids: np.ndarray, bary: np.ndarray,
                           geovec: np.ndarray, faces: np.ndarray
                           ) -> HDAssets:
    """Build HDAssets directly from barycentric tables."""
    geovec = np.asarray(geovec)
    face_verts = np.asarray(faces)[geovec]          # (H, 3)
    geovec_verts = face_verts[:, 0]
    return HDAssets(vert_ids=jnp.asarray(np.asarray(vert_ids, np.int32)),
                    bary=jnp.asarray(np.asarray(bary, np.float32)),
                    geovec=jnp.asarray(geovec.astype(np.int32)),
                    geovec_verts=jnp.asarray(geovec_verts.astype(np.int32)),
                    face_verts=jnp.asarray(face_verts.astype(np.int32)))


def contact_loss(verts: jnp.ndarray, assets: ContactAssets,
                 valid_fit: jnp.ndarray, euclthres: float,
                 hd: Optional[HDAssets] = None, hd_k: int = 1024,
                 mesh=None, candidate_k: int = 0, capacity: int = 0):
    """TUCH self-contact push/pull loss, batched (tuch/train/loss.py:240-317).

    Returns (loss, aux) where loss is the mean over valid_fit samples of
        sum_pull 0.005*tanh(d/0.005)^2  (exterior verts)
      + sum_push 1.0*tanh(d/0.04)^2     (interior verts)
    with d the geodesic-masked nearest-vertex distance, and aux carries
    'hd_truncated_frac'. With `hd`, the distances are evaluated on a dense
    resampled surface: a fixed top-K of HD points closest to contact
    replaces the reference's data-dependent gather of "HD points sampled
    from faces with any vertex in contact" (loss.py:278-281); candidates
    beyond K are dropped, and hd_truncated_frac reports the mean dropped
    fraction so the truncation is never silent.

    capacity: fixed-capacity compaction of the reference's
    `for bidx in torch.where(valid_fit)[0]` skip (loss.py:247): the
    quadratic machinery runs only for (up to) `capacity` valid samples.
    Identical loss whenever capacity >= #valid (the loss is a mean over
    valid samples and invalid ones contribute nothing either way);
    overflow-valid samples are dropped from the mean and counted in
    aux['contact_valid_truncated_frac']. 0 = off (all B computed).
    """
    B = verts.shape[0]
    aux_extra = {}
    if 0 < capacity < B:
        from tuch_tpu.losses.smplify import (compact_overflow_frac,
                                             compact_take)
        vmask = valid_fit.astype(bool)
        idx = compact_take(vmask, capacity)
        aux_extra['contact_valid_truncated_frac'] = \
            compact_overflow_frac(vmask, capacity)
        verts = verts[idx]
        valid_fit = vmask[idx]

    exterior, v2v_min, in_contact = self_contact_terms(
        verts, assets, euclthres, mesh=mesh, candidate_k=candidate_k)
    if hd is not None:
        hd_k = min(hd_k, int(hd.geovec.shape[0]))

    if hd is None:
        pull = 0.005 * jnp.tanh(v2v_min / 0.005) ** 2
        push = 1.0 * jnp.tanh(v2v_min / 0.04) ** 2
        per_sample = (pull * exterior).sum(-1) + (push * (~exterior)).sum(-1)
        return (_masked_mean(per_sample, valid_fit),
                {'hd_truncated_frac': jnp.asarray(0.0), **aux_extra})

    def select(v, ext, d_min, in_c):
        # Candidate HD points: sampled from a face ANY of whose 3 vertices
        # is in contact or interior (loss.py:278-281).
        vert_active = in_c | (~ext)  # (V,)
        hd_active = vert_active[hd.face_verts].any(axis=1)  # (H,)
        d_rep = d_min[hd.face_verts].min(axis=1)
        # Top-K most-contacting HD points (masked-out points get +inf key).
        key = jnp.where(hd_active, d_rep, jnp.inf)
        _, top_idx = jax.lax.top_k(-key, hd_k)
        sel_valid = jnp.take(hd_active, top_idx)
        n_active = hd_active.sum()
        trunc = jnp.maximum(n_active - hd_k, 0) / jnp.maximum(n_active, 1)

        ids = hd.vert_ids[top_idx]                    # (K, k)
        w_b = hd.bary[top_idx]                        # (K, k)
        hd_pts = jnp.einsum('kj,kjd->kd', w_b, v[ids])  # (K, 3)
        return hd_pts, top_idx, sel_valid, trunc

    hd_pts, top_idx, sel_valid, trunc = jax.vmap(select)(
        verts, exterior, v2v_min, in_contact)
    hd_stop = jax.lax.stop_gradient(hd_pts)           # (B, K, 3)
    verts_stop = jax.lax.stop_gradient(verts)

    # In/ex test for all samples' HD points in ONE winding evaluation,
    # offset slightly along source-face normals (loss.py:294-297). On TPU
    # this is the same Pallas kernel as the global test.
    normals = contact_ops.batch_face_normals(verts_stop[:, assets.faces])
    offset_pts = hd_stop + 0.001 * jnp.take_along_axis(
        normals, hd.geovec[top_idx][..., None], axis=1)
    from tuch_tpu.ops import contact_pallas as cpk
    if cpk.pallas_available():
        wn = cpk.winding_numbers_pallas(offset_pts, verts_stop,
                                        assets.faces)
    else:
        wn = contact_ops.winding_numbers_same_tris(offset_pts, verts_stop,
                                                   assets.faces)
    hd_ext = wn <= 0.99                               # (B, K)

    def energy(pts, pts_stop, t_idx, sel, ext_k):
        # Masked nearest HD point (geodesic mask via representative verts).
        rep = hd.geovec_verts[t_idx]                  # (K,)
        geo = assets.geomask[rep][:, rep]             # (K, K)
        geo = geo & sel[None, :] & sel[:, None]
        d2 = contact_ops.masked_sq_dists_highest(pts_stop, pts_stop, geo)
        argmin = jnp.argmin(d2, axis=1)
        has_neighbor = jnp.isfinite(jnp.min(d2, axis=1))
        # zero-safe: coincident HD points (tight contact) must give a 0
        # gradient, not NaN (see losses/smplify.zero_safe_norm)
        from tuch_tpu.losses.smplify import zero_safe_norm
        d_hd = zero_safe_norm(pts - pts[argmin])

        w_valid = (sel & has_neighbor).astype(pts.dtype)
        pull = 0.005 * jnp.tanh(d_hd / 0.005) ** 2
        push = 1.0 * jnp.tanh(d_hd / 0.04) ** 2
        return ((pull * ext_k * w_valid).sum()
                + (push * (~ext_k) * w_valid).sum())

    per_sample = jax.vmap(energy)(hd_pts, hd_stop, top_idx, sel_valid,
                                  hd_ext)
    return (_masked_mean(per_sample, valid_fit),
            {'hd_truncated_frac': _masked_mean(trunc, valid_fit),
             **aux_extra})


def regressor_loss(weights: LossWeights,
                   pred_rotmat, pred_betas, opt_pose, opt_betas,
                   pred_keypoints_2d, gt_keypoints_2d,
                   pred_joints, gt_joints, has_pose_3d,
                   pred_vertices, opt_vertices, pred_camera,
                   valid_fit, valid_fit_shape,
                   contact_assets: Optional[ContactAssets] = None,
                   euclthres: float = 0.02,
                   hd: Optional[HDAssets] = None, hd_k: int = 1024,
                   mesh=None, candidate_k: int = 0,
                   contact_capacity: int = 0):
    """Full training loss (tuch/train/loss.py:94-168). Returns (total, dict)."""
    loss_contact = jnp.asarray(0.0)
    contact_aux = {}
    if weights.contact > 0 and contact_assets is not None:
        loss_contact, contact_aux = contact_loss(
            pred_vertices, contact_assets, valid_fit, euclthres, hd=hd,
            hd_k=hd_k, mesh=mesh, candidate_k=candidate_k,
            capacity=contact_capacity)

    l_pose, l_betas = smpl_param_loss(pred_rotmat, pred_betas, opt_pose,
                                      opt_betas, valid_fit, valid_fit_shape)
    l_kp2d = keypoint_loss(pred_keypoints_2d, gt_keypoints_2d,
                           weights.openpose_train_weight,
                           weights.gt_train_weight, valid_fit)
    l_kp3d = keypoint_3d_loss(pred_joints, gt_joints, has_pose_3d)
    l_shape = shape_loss(pred_vertices, opt_vertices, valid_fit)
    l_cam = camera_depth_loss(pred_camera)

    total = (weights.shape * l_shape
             + weights.keypoint * l_kp2d
             + weights.keypoint * l_kp3d
             + weights.pose * l_pose
             + weights.beta * l_betas
             + l_cam
             + weights.contact * loss_contact)
    return total, {
        'loss_shape': l_shape,
        'loss_keypoints': l_kp2d,
        'loss_keypoints_3d': l_kp3d,
        'loss_regr_pose': l_pose,
        'loss_regr_betas': l_betas,
        'loss_cam': l_cam,
        'loss_contact': loss_contact,
        **contact_aux,
    }
