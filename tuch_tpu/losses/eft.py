"""EFT (exemplar fine-tuning) loss.

TPU-native redesign of tuch/eft/loss.py: the per-sample python loop of the
contact term (eft/loss.py:140-177) becomes the shared batched machinery in
losses/smplify.py; the r2r term reuses the padded region-pair tables.
"""

from typing import NamedTuple

import jax.numpy as jnp

from tuch_tpu.losses.smplify import ContactAssets, self_contact_terms
from tuch_tpu.ops import contact as contact_ops
from tuch_tpu.utils.projection import perspective_projection


class EFTWeights(NamedTuple):
    """Reference defaults (configs/eft_fitting_options.py:35-37:
    keypoint_loss_weight=1.0, beta_loss_weight=1.0,
    contact_loss_weight=10.0; wiring fit_eft.py:69-71)."""
    keypoints: float = 1.0
    shape: float = 1.0
    contact: float = 10.0


def eft_loss(joints: jnp.ndarray, betas: jnp.ndarray,
             vertices: jnp.ndarray, camera_t: jnp.ndarray,
             gt_keypoints: jnp.ndarray, gt_contact: jnp.ndarray,
             assets: ContactAssets, weights: EFTWeights,
             focal_length: float = 5000.0, img_res: int = 224,
             euclthres: float = 0.02, candidate_k: int = 0):
    """Per-exemplar loss (eft/loss.py:73-118). Returns (total, dict).

    gt_keypoints: (B, 49, 3) normalized [-1, 1] + conf; de-normalized to
    pixel space internally like the reference (:88-95).
    """
    B = joints.shape[0]
    cam_center = jnp.full((B, 2), img_res / 2.0)
    rot = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    pred_px = perspective_projection(joints, rot, camera_t, focal_length,
                                     cam_center)
    gt_px = 0.5 * img_res * (gt_keypoints[..., :2] + 1.0)
    conf = gt_keypoints[..., 2:3]
    loss_kp = (conf * (pred_px - gt_px) ** 2).mean() * weights.keypoints

    loss_shape = jnp.mean(betas ** 2) * weights.shape

    loss_contact = jnp.asarray(0.0)
    if weights.contact > 0:
        # candidate_k > 0 is the opt-in winding approximation (no
        # prev_exterior threading here: each EFT step is single-shot, so
        # this is the plain distance heuristic -- see contact_neighbors)
        exterior, v2v_min, _ = self_contact_terms(vertices, assets,
                                                  euclthres,
                                                  candidate_k=candidate_k)
        # mean (not sum) over in/out sets per sample (eft/loss.py:162-166)
        extf = exterior.astype(v2v_min.dtype)
        n_ext = jnp.maximum(extf.sum(-1), 1.0)
        n_int = jnp.maximum((1 - extf).sum(-1), 1.0)
        pull = (0.005 * jnp.tanh(v2v_min / 0.005) ** 2 * extf
                ).sum(-1) / n_ext
        push = (1.0 * jnp.tanh(v2v_min / 0.04) ** 2 * (1 - extf)
                ).sum(-1) / n_int
        # geodesically masked like the reference (eft/loss.py:155 masks
        # the pairwise matrix before the :175 region slice)
        pair_min = contact_ops.region_pair_min_dists(
            vertices, assets.region_idx_a, assets.region_idx_b,
            assets.region_mask_a, assets.region_mask_b,
            geomask=assets.geomask)
        r2r = (pair_min * gt_contact).sum(-1)
        loss_contact = (100.0 * (pull + push + 0.5 * r2r)).sum() \
            * weights.contact

    total = 60.0 * (loss_kp + loss_shape + loss_contact)
    return total, {'loss_keypoints': loss_kp, 'loss_shape': loss_shape,
                   'loss_contact': loss_contact}
