"""Benchmark evaluation: MPJPE / PA-MPJPE with contact-subset breakdown.

Replaces /root/reference/eval.py. The per-batch pipeline (gendered GT SMPL
forward, H36M-regressor joints, pelvis alignment, MPJPE) is one jitted
function; PA-MPJPE runs as a batched device SVD
(tuch_tpu/utils/procrustes.py) instead of the reference's per-sample numpy
loop (eval.py:194, pose_utils.py:78-84).
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tuch_tpu import constants
from tuch_tpu.models.smpl import SMPLModel, smpl_forward, smpl_forward_pose72
from tuch_tpu.utils.procrustes import mpjpe as mpjpe_fn, \
    reconstruction_error
from tuch_tpu.utils.rotations import rotmat_to_aa


def make_eval_step(hmr_model, smpl_neutral: SMPLModel,
                   smpl_male: Optional[SMPLModel],
                   smpl_female: Optional[SMPLModel],
                   j_regressor_h36m: np.ndarray, dataset_name: str):
    """Build the jitted per-batch eval function (eval.py:142-195)."""
    joint_mapper = np.asarray(
        constants.H36M_TO_J17 if dataset_name == 'mpi-inf-3dhp'
        else constants.H36M_TO_J14)
    joint_mapper_gt = np.asarray(
        constants.J24_TO_J17 if dataset_name == 'mpi-inf-3dhp'
        else constants.J24_TO_J14)
    J = jnp.asarray(j_regressor_h36m)

    def step(variables, batch):
        images = batch['img']
        rotmat, betas, camera = hmr_model.apply(variables, images,
                                                train=False)
        pred = smpl_forward(smpl_neutral, betas, rotmat[:, 1:],
                            rotmat[:, :1], pose2rot=False)
        pred_j = jnp.einsum('jv,bvd->bjd', J, pred.vertices)
        pred_pelvis = pred_j[:, :1]
        pred_j14 = pred_j[:, joint_mapper] - pred_pelvis

        if dataset_name == 'mpi-inf-3dhp':
            gt_j14 = batch['pose_3d'][:, joint_mapper_gt, :3]
        else:
            # gendered GT vertices (eval.py:173-175)
            gt_m = smpl_forward_pose72(smpl_male or smpl_neutral,
                                       batch['betas'], batch['pose'])
            gt_f = smpl_forward_pose72(smpl_female or smpl_neutral,
                                       batch['betas'], batch['pose'])
            female = (batch['gender'] == 1)[:, None, None]
            gt_verts = jnp.where(female, gt_f.vertices, gt_m.vertices)
            gt_j = jnp.einsum('jv,bvd->bjd', J, gt_verts)
            gt_pelvis = gt_j[:, :1]
            gt_j14 = gt_j[:, joint_mapper] - gt_pelvis

        err = mpjpe_fn(pred_j14, gt_j14)
        pa = reconstruction_error(pred_j14, gt_j14, reduction=None)
        return err, pa, rotmat, betas, camera, pred_j

    return jax.jit(step)


def report_with_contact_subsets(mpjpe: np.ndarray, recon: np.ndarray,
                                cnc_arr: Optional[np.ndarray],
                                euclthres_lower: float = 0.01
                                ) -> Dict[str, float]:
    """Final metric report incl. contact/no-contact/unclear subsets.

    cnc_arr: per-sample min contact distance from the precomputed 3DPW
    contact signature (inf = no contact; reference eval.py:63-88,134-137).
    """
    out = {'mpjpe': 1000 * float(mpjpe.mean()),
           'pa_mpjpe': 1000 * float(recon.mean())}
    if cnc_arr is not None:
        n = len(mpjpe)
        cnc = cnc_arr[:n]
        contact = cnc < euclthres_lower
        no_contact = np.isinf(cnc)
        unclear = ~(contact | no_contact)
        for name, mask in (('contact', contact), ('no_contact', no_contact),
                           ('unclear', unclear)):
            if mask.any():
                out[f'mpjpe_{name}'] = 1000 * float(mpjpe[mask].mean())
                out[f'pa_mpjpe_{name}'] = 1000 * float(recon[mask].mean())
            out[f'n_{name}'] = int(mask.sum())
    return out


def run_evaluation(hmr_model, variables, dataset, dataset_name: str,
                   smpl_neutral, smpl_male, smpl_female,
                   j_regressor_h36m, batch_size: int = 32,
                   cnc_arr: Optional[np.ndarray] = None,
                   result_file: Optional[str] = None,
                   log_freq: int = 50, mesh=None, num_workers: int = 2,
                   shuffle: bool = False) -> Dict[str, float]:
    """Full-dataset evaluation loop (eval.py:90-215).

    mesh: optional ('dp', 'cp') jax.sharding.Mesh -- batches whose size
    divides dp are sharded over the data-parallel axis (params
    replicated); ragged tail batches fall back to single-device. The
    reference has no multi-device eval (SURVEY.md section 2.8); this is
    the TPU-native equivalent.
    """
    from tuch_tpu.data.loader import CheckpointLoader, LoaderState

    step = make_eval_step(hmr_model, smpl_neutral, smpl_male, smpl_female,
                          j_regressor_h36m, dataset_name)
    shard_batch = None
    if mesh is not None and mesh.shape.get('dp', 1) > 1:
        from tuch_tpu.parallel import mesh as pmesh
        variables = jax.device_put(variables, pmesh.replicated(mesh))
        dp = mesh.shape['dp']

        def shard_batch(b):
            if b['img'].shape[0] % dp == 0:
                return pmesh.shard_batch(b, mesh)
            return b
    # reference forwards both to its DataLoader (eval.py:118), forcing
    # shuffle off only when dumping results (result order must align)
    loader = CheckpointLoader(dataset, batch_size=batch_size,
                              shuffle=shuffle and result_file is None,
                              num_workers=num_workers,
                              drop_last=False)
    n = len(dataset)
    mpjpe = np.zeros(n)
    recon = np.zeros(n)
    save = result_file is not None
    if save:
        # reference npz schema: pose is (N, 72) axis-angle
        # (eval.py:157-160 converts via rotation_matrix_to_angle_axis)
        poses = np.zeros((n, 72))
        betas_all = np.zeros((n, 10))
        cams = np.zeros((n, 3))
        joints = np.zeros((n, j_regressor_h36m.shape[0], 3))

    seen = 0
    for bi, batch in enumerate(loader.epoch_iter(LoaderState(0, 0, 0))):
        if shard_batch is not None:
            batch = shard_batch(batch)
        m, p, rotmat, betas, cam, pred_j = step(variables, batch)
        bsz = min(batch['img'].shape[0], n - seen)
        mpjpe[seen:seen + bsz] = np.asarray(m)[:bsz]
        recon[seen:seen + bsz] = np.asarray(p)[:bsz]
        if save:
            aa = np.asarray(jnp.nan_to_num(
                rotmat_to_aa(rotmat))).reshape(-1, 72)
            poses[seen:seen + bsz] = aa[:bsz]
            betas_all[seen:seen + bsz] = np.asarray(betas)[:bsz]
            cams[seen:seen + bsz] = np.asarray(cam)[:bsz]
            joints[seen:seen + bsz] = np.asarray(pred_j)[:bsz]
        seen += bsz
        if bi % log_freq == log_freq - 1:
            interim = report_with_contact_subsets(
                mpjpe[:seen], recon[:seen],
                cnc_arr[:seen] if cnc_arr is not None else None)
            print(f'[{seen}/{n}] ' + ' '.join(
                f'{k}={v:.2f}' for k, v in interim.items()
                if isinstance(v, float)), flush=True)

    result = report_with_contact_subsets(mpjpe[:seen], recon[:seen],
                                         cnc_arr)
    if save:
        import os
        os.makedirs('out', exist_ok=True)
        np.savez(f'out/{result_file}', pred_joints=joints, pose=poses,
                 betas=betas_all, camera=cams, mpjpe=mpjpe,
                 recon_err=recon)
    return result
