"""Training engine: epoch loop, validation, summaries, checkpoint/resume.

Replaces tuch/train/trainer.py. The loop's only host work is feeding numpy
batches and logging -- the train step (including in-the-loop SMPLify and the
fits store) is one jitted device program built by
tuch_tpu.train.module.make_train_step. Validation (MPJPE + v2v on the val
set, reference trainer.py:172-267) runs as a second jitted function.
"""

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tuch_tpu import constants
from tuch_tpu.data.loader import CheckpointLoader, LoaderState, \
    add_fits_indices
from tuch_tpu.models.smpl import smpl_forward, smpl_forward_pose72
from tuch_tpu.train import fits_store
from tuch_tpu.train.checkpoint import CheckpointManager
from tuch_tpu.train.module import TrainState, TuchAssets, make_train_step
from tuch_tpu.utils.projection import weak_perspective_to_translation


def freq_to_step(freq: float, total_steps: int) -> int:
    """Fraction-of-epoch frequency -> step interval (saver.py:34-40)."""
    if freq <= 0:
        return max(1, total_steps + 1)
    return max(1, int(total_steps * freq))


class MetricsLogger:
    """JSONL metrics + optional TensorBoard (via torch, if available)."""

    def __init__(self, summary_dir: str):
        os.makedirs(summary_dir, exist_ok=True)
        self.jsonl = open(os.path.join(summary_dir, 'metrics.jsonl'), 'a')
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.tb = SummaryWriter(summary_dir)
        except Exception:
            pass

    def scalars(self, tag_prefix: str, metrics: Dict[str, Any], step: int):
        rec = {'step': step,
               **{f'{tag_prefix}/{k}': float(np.asarray(v))
                  for k, v in metrics.items()}}
        self.jsonl.write(json.dumps(rec) + '\n')
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f'{tag_prefix}/{k}',
                                   float(np.asarray(v)), step)

    def image(self, tag: str, img_hwc: np.ndarray, step: int):
        if self.tb is not None:
            self.tb.add_image(tag, img_hwc, step, dataformats='HWC')


class Trainer:
    def __init__(self, options, hmr_model, init_variables,
                 assets: TuchAssets, train_ds, val_ds,
                 j_regressor_h36m: Optional[np.ndarray] = None,
                 renderer=None):
        self.options = options
        self.model = hmr_model
        self.assets = assets
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.renderer = renderer
        self.joint_mapper_h36m = np.asarray(constants.H36M_TO_J14)
        self.j_regressor_h36m = j_regressor_h36m
        self.logger = MetricsLogger(options.summary_dir)
        self.ckpt = CheckpointManager(options.checkpoint_dir)
        self.endtime = time.time() + options.time_to_run

        if getattr(options, 'grad_clip', 0.0) > 0:
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(options.grad_clip),
                optax.adam(options.lr))
        else:
            self.optimizer = optax.adam(options.lr)
        sizes = train_ds.dataset_sizes()
        # Seed priority: checkpoint fits > static fits > zeros (reference
        # tuch/train/fits_dict.py:38-51). '' = default static dir when
        # present; 'none' = disabled.
        static_dir = getattr(options, 'static_fits_dir', '')
        if static_dir == '':
            from tuch_tpu import config as cfg
            static_dir = cfg.STATIC_FITS_DIR \
                if os.path.isdir(cfg.STATIC_FITS_DIR) else None
        elif str(static_dir).lower() == 'none':
            static_dir = None
        store = fits_store.create_fits_store(
            sizes, static_fits_dir=static_dir,
            checkpoint_dir=options.checkpoint_dir)
        self.fits_layout = store
        self.offsets_table = np.asarray(
            [store.offsets[n] for n in train_ds.dataset_list], np.int32)

        # Opt-in ('dp', 'cp') device mesh: dp shards the batch, cp > 1
        # additionally shards the contact quadratics' triangle/column axes
        # inside the step (parallel/contact_parallel.py).
        self.mesh = None
        if getattr(options, 'mesh_cp', 1) > 1 \
                or getattr(options, 'mesh_dp', 0) > 1:
            from tuch_tpu.parallel import mesh as pmesh
            self.mesh = pmesh.make_mesh(dp=options.mesh_dp,
                                        cp=options.mesh_cp)
            assert options.batch_size % self.mesh.shape['dp'] == 0, (
                'batch_size must divide over the dp mesh axis',
                options.batch_size, self.mesh.shape)

        num_pairs = int(assets.contact.region_idx_a.shape[0])
        # donate the carried state: params/opt-state/fits buffers are
        # updated in place on device (the trainer never reuses the old
        # state object), saving one full copy of the training state.
        # CPU ignores donation with a warning, so only donate on TPU.
        donate = (0,) if jax.default_backend() == 'tpu' else ()
        self.step_fn = jax.jit(make_train_step(
            hmr_model, assets, options, self.optimizer, num_pairs,
            mesh=self.mesh), donate_argnums=donate)

        params = init_variables['params']
        batch_stats = init_variables.get('batch_stats', {})
        self.state = TrainState(
            params=params, batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
            fits=store.params,
            rng=jax.random.PRNGKey(options.seed),
            step=jnp.asarray(0, jnp.int32))

        self.loader = CheckpointLoader(
            train_ds, batch_size=options.batch_size,
            shuffle=options.shuffle_train,
            num_workers=options.num_workers, seed=options.seed)
        self.loader_state = LoaderState(epoch=0, batch_idx=0,
                                        perm_seed=options.seed)

        if options.resume and self.ckpt.exists():
            self.state, meta = self.ckpt.restore(self.state,
                                                 options.checkpoint)
            ls = meta or {}
            self.loader_state = LoaderState(
                epoch=int(ls.get('epoch', 0)),
                batch_idx=int(ls.get('batch_idx', 0)),
                perm_seed=int(ls.get('perm_seed', options.seed)))
            print(f'Resumed at step {int(np.asarray(self.state.step))}, '
                  f'epoch {self.loader_state.epoch}, '
                  f'batch {self.loader_state.batch_idx}')

        # steps already persisted (fresh: 0; resume: the restored step) --
        # lets fit()'s final save skip when nothing ran since the last save
        self._last_saved_step = int(np.asarray(self.state.step))

        self._val_fn = jax.jit(self._make_val_fn())

    # ------------------------------------------------------------------
    def fit(self):
        # Graceful preemption: SIGTERM (what TPU preemption/maintenance
        # sends) collapses the time budget to "now", so the current step
        # finishes, the exact position is checkpointed, and the process
        # exits cleanly -- same path as --time_to_run expiry. Installed
        # only while fit() runs, and only from the main thread (signal
        # module restriction); tests drive it via os.kill.
        import signal

        def _on_term(signum, frame):
            print('SIGTERM: finishing current step, checkpointing, '
                  'exiting', flush=True)
            self.endtime = 0.0

        prev_handler = None
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:   # not the main thread
            pass
        try:
            for epoch in range(self.loader_state.epoch,
                               self.options.num_epochs):
                completed = self.train_one_epoch(epoch)
                if not completed:
                    # mid-epoch preemption/time-budget exit:
                    # train_one_epoch already checkpointed the exact
                    # position and set loader_state to it -- do NOT
                    # advance to the next epoch
                    break
                self.loader_state = LoaderState(
                    epoch=epoch + 1, batch_idx=0,
                    perm_seed=self.loader_state.perm_seed)
                print(f'================ EPOCH {epoch} DONE '
                      f'================')
                if time.time() > self.endtime:
                    print('time budget reached; stopping')
                    break
            # Final save so a completed run's last steps are never lost
            # to the periodic save cadence.
            step = int(np.asarray(self.state.step))
            if step != self._last_saved_step:
                self._save_checkpoint(self.loader_state.epoch,
                                      self.loader_state.batch_idx, None)
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def train_one_epoch(self, epoch: int):
        nb = self.loader.num_batches()
        summary_steps = freq_to_step(self.options.summary_freq, nb)
        checkpoint_steps = freq_to_step(
            self.options.val_and_checkpoint_freq, nb)

        start = self.loader_state.batch_idx \
            if self.loader_state.epoch == epoch else 0
        state_iter = LoaderState(epoch=epoch, batch_idx=start,
                                 perm_seed=self.loader_state.perm_seed)
        # Profiling hook (SURVEY.md section 5: the reference has none):
        # TUCH_PROFILE_STEPS=lo:hi captures a jax.profiler trace of those
        # steps into <summary_dir>/profile.
        prof_range = os.environ.get('TUCH_PROFILE_STEPS')
        prof_lo, prof_hi = (-1, -1)
        if prof_range:
            prof_lo, prof_hi = (int(x) for x in prof_range.split(':'))
        t_last = time.time()
        # Metrics logging is pipelined one step behind: converting device
        # metrics to floats blocks on the step, so logging step N only
        # AFTER step N+1 is dispatched keeps the device busy while the
        # host reads results / prepares the next batch. The step counter
        # is tracked host-side for the same reason.
        step = int(np.asarray(self.state.step))
        pending = None  # (metrics dict of device arrays, step, epoch, bi)
        for bi, batch in enumerate(self.loader.epoch_iter(state_iter),
                                   start=start):
            if bi == prof_lo:
                jax.profiler.start_trace(
                    os.path.join(self.options.summary_dir, 'profile'))
            if bi == prof_hi:
                jax.profiler.stop_trace()
            batch = add_fits_indices(batch, self.offsets_table)
            if self.mesh is not None:
                from tuch_tpu.parallel import mesh as pmesh
                batch = pmesh.shard_batch(batch, self.mesh)
            self.state, metrics, outputs = self.step_fn(self.state, batch)
            step += 1

            if pending is not None:
                self._log_train_metrics(*pending)
            now = time.time()
            metrics = dict(metrics)
            metrics['steps_per_sec'] = 1.0 / max(now - t_last, 1e-9)
            t_last = now
            pending = (metrics, step, epoch, bi)

            if self.renderer is not None and step % summary_steps == 0:
                self._image_summaries(batch, outputs, step)

            saved_this_step = step % checkpoint_steps == 0
            if saved_this_step:
                val_error = self.validate(step)
                self._save_checkpoint(epoch, bi + 1, val_error)
            if time.time() > self.endtime:
                # Time budget reached mid-epoch (the reference's
                # --time_to_run was a dead flag, trainer.py:47): persist
                # the exact position so --resume continues from the next
                # batch -- a preemption-safe exit. The in-memory
                # loader_state tracks it too, so an in-process re-fit()
                # (endtime extended) continues from the same place
                # instead of skipping the rest of this epoch.
                if not saved_this_step:
                    self._save_checkpoint(epoch, bi + 1, None)
                self.loader_state = LoaderState(
                    epoch=epoch, batch_idx=bi + 1,
                    perm_seed=self.loader_state.perm_seed)
                if pending is not None:
                    self._log_train_metrics(*pending)
                return False
        if pending is not None:
            self._log_train_metrics(*pending)
        return True

    def _save_checkpoint(self, epoch: int, next_batch_idx: int, val_error):
        """Persist state + fits + the NEXT loader position (epoch,
        next_batch_idx) -- the position a resume should continue from."""
        self.ckpt.save(
            self.state,
            {'epoch': epoch, 'batch_idx': next_batch_idx,
             # the loader's permutation seed, NOT options.seed: a resume
             # under a different --seed must keep re-saving the original
             # permutation stream or a second mid-epoch resume would
             # repeat/skip samples (loader.py's exact-permutation
             # contract)
             'perm_seed': self.loader_state.perm_seed},
            val_error)
        fits_store.save_fits(
            self.fits_layout._replace(params=self.state.fits),
            self.options.checkpoint_dir)
        self._last_saved_step = int(np.asarray(self.state.step))

    def _log_train_metrics(self, metrics, step, epoch, bi):
        nb = self.loader.num_batches()
        self.logger.scalars('train', metrics, step)
        if step % 25 == 0:
            msg = ', '.join(f'{k}: {float(np.asarray(v)):.4f}'
                            for k, v in metrics.items())
            print(f'[{epoch}:{bi}/{nb}] {msg}', flush=True)

    # ------------------------------------------------------------------
    def _make_val_fn(self):
        model, assets = self.model, self.assets

        def val_fn(params, batch_stats, batch):
            rotmat, betas, cam = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                batch['img'], train=False)
            pred = smpl_forward(assets.smpl, betas, rotmat[:, 1:],
                                rotmat[:, :1], pose2rot=False)
            gt = smpl_forward_pose72(assets.smpl, batch['betas'],
                                     batch['pose'])
            return pred.vertices, gt.vertices, cam

        return val_fn

    def validate(self, step: int) -> float:
        """MPJPE + v2v on the validation set (trainer.py:172-267)."""
        if self.val_ds is None:
            return float('nan')
        loader = CheckpointLoader(self.val_ds,
                                  batch_size=self.options.batch_size,
                                  shuffle=False, num_workers=2)
        # Without the H36M joint regressor the "joint" error is a vertex
        # subsample -- a v2v proxy, NOT MPJPE; label it as such.
        have_regressor = self.j_regressor_h36m is not None
        joint_metric = 'mpjpe' if have_regressor else 'mpjpe_v2v_proxy'
        mpjpe_all, v2v_all = [], []
        first_outputs = None
        for bi, batch in enumerate(loader.epoch_iter(
                LoaderState(epoch=0, batch_idx=0, perm_seed=0))):
            pred_v, gt_v, cam = self._val_fn(self.state.params,
                                             self.state.batch_stats, batch)
            pred_v, gt_v = np.asarray(pred_v), np.asarray(gt_v)
            if self.j_regressor_h36m is not None:
                J = self.j_regressor_h36m
                pred_j = np.einsum('jv,bvd->bjd', J, pred_v)
                gt_j = np.einsum('jv,bvd->bjd', J, gt_v)
                pred_j = pred_j - pred_j[:, :1]
                gt_j = gt_j - gt_j[:, :1]
                pred_j = pred_j[:, self.joint_mapper_h36m]
                gt_j = gt_j[:, self.joint_mapper_h36m]
            else:
                pred_j, gt_j = pred_v[:, ::97], gt_v[:, ::97]
            mpjpe_all.append(np.sqrt(((pred_j - gt_j) ** 2).sum(-1))
                             .mean(-1))
            v2v_all.append(np.sqrt(((pred_v - gt_v) ** 2).sum(-1)).mean(-1))
            if bi == 0:
                first_outputs = (batch, pred_v, np.asarray(cam))
        if not mpjpe_all:
            return float('nan')
        mpjpe = float(np.concatenate(mpjpe_all).mean() * 1000)
        v2v = float(np.concatenate(v2v_all).mean() * 1000)
        self.logger.scalars('val', {joint_metric: mpjpe, 'v2v': v2v}, step)
        print(f'[val] {joint_metric} {mpjpe:.2f}mm v2v {v2v:.2f}mm',
              flush=True)
        if self.renderer is not None and first_outputs is not None:
            batch, pred_v, cam = first_outputs
            cam_t = np.asarray(weak_perspective_to_translation(
                jnp.asarray(cam), constants.FOCAL_LENGTH,
                self.options.img_res))
            img = self._denorm(batch['img'][0])
            over = self.renderer.render_over(pred_v[0], cam_t[0], img)
            self.logger.image('val/pred_shape', over, step)
        return mpjpe

    # ------------------------------------------------------------------
    @staticmethod
    def _denorm(img: np.ndarray) -> np.ndarray:
        mean = np.asarray(constants.IMG_NORM_MEAN, np.float32)
        std = np.asarray(constants.IMG_NORM_STD, np.float32)
        return np.clip(img * std + mean, 0, 1)

    def _image_summaries(self, batch, outputs, step: int):
        """Pred vs opt overlays with contact-region coloring
        (reference trainer.py:269-315)."""
        img = self._denorm(batch['img'][0])
        pv = np.asarray(outputs['pred_vertices'][0])
        ov = np.asarray(outputs['opt_vertices'][0])
        pc = np.asarray(outputs['pred_cam_t'][0])
        oc = np.asarray(outputs['opt_cam_t'][0])
        cv = np.asarray(outputs['gt_contact_l3'][0]) \
            if bool(np.asarray(outputs['has_contact'][0])) else None
        self.logger.image('train/pred_shape',
                          self.renderer.render_over(pv, pc, img,
                                                    contact_vec=cv), step)
        self.logger.image('train/opt_shape',
                          self.renderer.render_over(ov, oc, img,
                                                    contact_vec=cv), step)
