"""EFT: exemplar fine-tuning of the whole HMR network, one image at a time.

TPU-native redesign of tuch/eft/fitter.py. Per image, the reference resets
the network to backup weights and runs <=50 python-side optimizer steps
with an early stop (fitter.py:122-149). Here the entire per-image fit is
ONE jitted `lax.while_loop` (steps + early-stop condition are on-device),
and the outer loop only swaps in the next image. Cluster sharding keeps the
reference's index-range semantics (--sidx/--cbs, fitter.py:52-55); shards
merge offline (merge_shards).
"""

import os
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tuch_tpu import constants
from tuch_tpu.losses.eft import EFTWeights, eft_loss
from tuch_tpu.losses.smplify import ContactAssets
from tuch_tpu.models.smpl import SMPLModel, smpl_forward
from tuch_tpu.utils.projection import weak_perspective_to_translation
from tuch_tpu.utils.rotations import rotmat_to_aa


class EFTFitResult(NamedTuple):
    pose: np.ndarray    # (72,) axis-angle
    betas: np.ndarray   # (10,)
    steps: int
    loss: float


def make_eft_fit_fn(hmr_model, smpl: SMPLModel, assets: ContactAssets,
                    weights: EFTWeights, max_steps: int = 50,
                    early_stop_loss: float = 200.0,
                    min_steps: int = 20, lr: float = 1e-5,
                    img_res: int = 224, candidate_k: int = 0):
    """Build the jitted single-image fit function."""
    opt = optax.adam(lr)

    def loss_fn(params, batch_stats, img, kp, contact, rng):
        (rotmat, betas, cam), new_state = hmr_model.apply(
            {'params': params, 'batch_stats': batch_stats}, img,
            train=True, mutable=['batch_stats'], rngs={'dropout': rng})
        out = smpl_forward(smpl, betas, rotmat[:, 1:], rotmat[:, :1],
                           pose2rot=False)
        cam_t = weak_perspective_to_translation(
            cam, constants.FOCAL_LENGTH, img_res)
        total, _ = eft_loss(out.joints, betas, out.vertices, cam_t, kp,
                            contact, assets, weights, img_res=img_res,
                            candidate_k=candidate_k)
        return total, (new_state['batch_stats'], rotmat, betas)

    @jax.jit
    def fit_one(params0, batch_stats0, img, kp, contact, rng):
        opt_state0 = opt.init(params0)

        def cond(carry):
            step, loss, *_ = carry
            # reference break: `loss < 200 and eft_step > 20` tested at
            # the END of iteration eft_step (fitter.py:148-149) -- the
            # earliest stop is eft_step = min_steps + 1, i.e.
            # min_steps + 2 completed updates, decided on the PRE-update
            # loss of the last iteration (our carried loss lags one
            # step, hence the + 1 here).
            return (step < max_steps) & ((loss >= early_stop_loss)
                                         | (step <= min_steps + 1))

        def body(carry):
            step, _, params, bstats, opt_state, rng, _, _ = carry
            rng, sub = jax.random.split(rng)
            (loss, (bstats, rotmat, betas)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bstats, img, kp, contact,
                                       sub)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (step + 1, loss, params, bstats, opt_state, rng,
                    rotmat, betas)

        rotmat0 = jnp.tile(jnp.eye(3)[None, None], (1, 24, 1, 1))
        init = (jnp.asarray(0), jnp.asarray(jnp.inf), params0,
                batch_stats0, opt_state0, rng, rotmat0, jnp.zeros((1, 10)))
        step, loss, params, bstats, _, _, rotmat, betas = \
            jax.lax.while_loop(cond, body, init)
        pose = jnp.nan_to_num(rotmat_to_aa(rotmat)).reshape(1, 72)
        return pose, betas, step, loss

    return fit_one


class EFTFitter:
    """Drives per-image fits over a dataset shard and dumps results.

    Output schema mirrors the reference (fitter.py:57-71, 152-166): the
    original dataset dict with 'pose'/'betas' replaced by the fitted
    parameters.
    """

    def __init__(self, options, dsname: str, dataset, hmr_model,
                 variables, smpl: SMPLModel, assets: ContactAssets,
                 out_dir: str = 'out/eft'):
        self.options = options
        self.dsname = dsname
        self.dataset = dataset
        self.variables = variables
        weights = EFTWeights(
            keypoints=getattr(options, 'keypoint_loss_weight',
                              getattr(options, 'kp_loss_weight', 1.0)),
            shape=getattr(options, 'beta_loss_weight',
                          getattr(options, 'shape_prior_weight', 1.0)),
            contact=getattr(options, 'contact_loss_weight', 10.0))
        self.fit_one = make_eft_fit_fn(
            hmr_model, smpl, assets, weights,
            max_steps=getattr(options, 'max_steps', 50),
            lr=getattr(options, 'lr', 1e-5),
            img_res=getattr(options, 'img_res', 224),
            candidate_k=getattr(options, 'contact_candidate_k', 0))

        sidx = getattr(options, 'sidx', 0)
        cbs = getattr(options, 'cbs', None) or len(dataset)
        lo = sidx * cbs
        self.process_idx = [i for i in range(lo, lo + cbs)
                            if i < len(dataset)]
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        shard_tag = f'_{sidx}' if getattr(options, 'cbs', None) else ''
        self.outputfn = os.path.join(
            out_dir, f'{dsname}_eft_train{shard_tag}.npz')

    def fit(self) -> str:
        n = len(self.dataset)
        poses = np.zeros((n, 72), np.float32)
        betas = np.zeros((n, 10), np.float32)
        rng = jax.random.PRNGKey(getattr(self.options, 'seed', 0))
        for step_i, idx in enumerate(self.process_idx):
            s = self.dataset.get(idx)
            rng, sub = jax.random.split(rng)
            pose, b, steps, loss = self.fit_one(
                self.variables['params'],
                self.variables.get('batch_stats', {}),
                jnp.asarray(s['img'])[None],
                jnp.asarray(s['keypoints'])[None],
                jnp.asarray(s['contact_vec'])[None], sub)
            poses[idx] = np.asarray(pose)[0]
            betas[idx] = np.asarray(b)[0]
            print(f'[eft {self.dsname}] {idx}: steps={int(steps)} '
                  f'loss={float(loss):.2f}', flush=True)
        np.savez(self.outputfn, pose=poses, betas=betas,
                 indices=np.asarray(self.process_idx, np.int64))
        print('dumped', self.outputfn)
        return self.outputfn


def merge_shards(shard_files, base_db: dict, out_path: str):
    """Merge per-shard EFT outputs into one training db
    (tuch/eft/merge_temp_files.py:17-54). Missing shards tolerated."""
    import joblib
    db = dict(base_db)
    n = len(db['imgname'])
    pose = np.zeros((n, 72), np.float32)
    betas = np.zeros((n, 10), np.float32)
    for path in shard_files:
        if not os.path.exists(path):
            print('missing shard (skipped):', path)
            continue
        with np.load(path) as d:
            idx = d['indices']
            pose[idx] = d['pose'][idx]
            betas[idx] = d['betas'][idx]
    db['pose'] = pose
    db['betas'] = betas
    joblib.dump(db, out_path)
    return out_path
