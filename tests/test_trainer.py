"""Trainer engine test: short synthetic run with checkpoint + resume."""

import os

import numpy as np
import pytest

from tuch_tpu import config as cfgmod
from tuch_tpu import runtime as rt
from tuch_tpu.data.dataset import TuchDataset, synthetic_db
from tuch_tpu.data.mixed import MixedDataset
from tuch_tpu.train.trainer import Trainer, freq_to_step


def test_freq_to_step():
    assert freq_to_step(0.5, 100) == 50
    assert freq_to_step(1.0, 100) == 100
    assert freq_to_step(0.0, 100) == 101  # never fires


@pytest.mark.slow
def test_trainer_fit_checkpoint_resume(tmp_path):
    imgdir = str(tmp_path / 'imgs')
    db = synthetic_db(8, img_dir=imgdir, seed=0)
    opts = cfgmod.TrainConfig(
        name='t', log_dir=str(tmp_path / 'logs'), batch_size=2,
        num_workers=0, img_res=64, num_epochs=1, lr=1e-4,
        run_smplify=False, contact_loss_weight=0.0,
        val_and_checkpoint_freq=0.5, summary_freq=0.0, synthetic=True)
    opts.finalize()
    runtime = rt.build_runtime(opts, synthetic=True, num_verts=170,
                               img_res=64)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=imgdir)
    val = TuchDataset(opts, 'mtp', data=db, img_dir=imgdir,
                      use_augmentation=False, split='val')
    mixed = MixedDataset(opts, 'train', datasets=[ds])

    tr = Trainer(opts, runtime.hmr, runtime.variables, runtime.assets,
                 mixed, val)
    tr.fit()
    steps = int(np.asarray(tr.state.step))
    assert steps == 4
    assert len(tr.ckpt.list_checkpoints()) >= 1
    metrics_file = os.path.join(opts.summary_dir, 'metrics.jsonl')
    assert sum(1 for _ in open(metrics_file)) >= steps

    # resume continues from the same step count
    opts2 = cfgmod.TrainConfig(**{**opts.__dict__, 'resume': True})
    opts2.finalize()
    tr2 = Trainer(opts2, runtime.hmr, runtime.variables, runtime.assets,
                  mixed, val)
    assert int(np.asarray(tr2.state.step)) == steps


@pytest.mark.slow
def test_static_fits_seeding(tmp_path):
    """{ds}_fits.npy in static_fits_dir lands in TrainState.fits; checkpoint
    fits take priority over static (reference fits_dict.py:38-51)."""
    imgdir = str(tmp_path / 'imgs')
    db = synthetic_db(8, img_dir=imgdir, seed=0)

    static_dir = tmp_path / 'static_fits'
    static_dir.mkdir()
    static = np.full((8, 82), 0.25, np.float32)
    np.save(static_dir / 'mtp_fits.npy', static)

    opts = cfgmod.TrainConfig(
        name='sf', log_dir=str(tmp_path / 'logs'), batch_size=2,
        num_workers=0, img_res=64, num_epochs=1, run_smplify=False,
        contact_loss_weight=0.0, synthetic=True,
        static_fits_dir=str(static_dir))
    opts.finalize()
    runtime = rt.build_runtime(opts, synthetic=True, num_verts=170,
                               img_res=64)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=imgdir)
    mixed = MixedDataset(opts, 'train', datasets=[ds])

    tr = Trainer(opts, runtime.hmr, runtime.variables, runtime.assets,
                 mixed, None)
    np.testing.assert_allclose(np.asarray(tr.state.fits), static)

    # checkpoint-dir fits override static fits
    ckpt = np.full((8, 82), -0.5, np.float32)
    np.save(os.path.join(opts.checkpoint_dir, 'mtp_fits.npy'), ckpt)
    tr2 = Trainer(opts, runtime.hmr, runtime.variables, runtime.assets,
                  mixed, None)
    np.testing.assert_allclose(np.asarray(tr2.state.fits), ckpt)

    # static_fits_dir='none' disables seeding -> zeros
    opts3 = cfgmod.TrainConfig(**{**opts.__dict__,
                                  'static_fits_dir': 'none',
                                  'name': 'sf3',
                                  'log_dir': str(tmp_path / 'logs3')})
    opts3._finalized = False
    opts3.finalize()
    tr3 = Trainer(opts3, runtime.hmr, runtime.variables, runtime.assets,
                  mixed, None)
    assert float(np.abs(np.asarray(tr3.state.fits)).max()) == 0.0


@pytest.mark.slow
def test_train_cli_end_to_end_synthetic(tmp_path):
    """The whole `python -m tuch_tpu.cli.train` wiring at toy scale:
    config parse -> runtime -> datasets -> trainer.fit -> checkpoint."""
    from tuch_tpu.cli.train import main as train_main
    train_main(['--name', 'clismoke', '--log_dir', str(tmp_path),
                '--synthetic', '--synthetic_num_verts', '170',
                '--img_res', '64', '--batch_size', '2',
                '--num_epochs', '1', '--num_workers', '0',
                '--run_smplify', '--num_smplify_iters', '1',
                '--contact_loss_weight', '1e-4',
                '--val_and_checkpoint_freq', '1.0'])
    import glob as _glob
    ckpts = _glob.glob(str(tmp_path / 'clismoke' / 'checkpoints' / '*'))
    assert any(not c.endswith('.meta.json') for c in ckpts)


@pytest.mark.slow
def test_trainer_with_device_mesh(tmp_path):
    """Trainer end-to-end with a ('dp', 'cp') mesh: batches sharded via
    shard_batch, contact routed cp-sharded, pipelined logging intact."""
    import jax
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip('needs 8 virtual devices')
    imgdir = str(tmp_path / 'imgs')
    db = synthetic_db(8, img_dir=imgdir, seed=0)
    opts = cfgmod.TrainConfig(
        name='tm', log_dir=str(tmp_path / 'logs'), batch_size=4,
        num_workers=0, img_res=64, num_epochs=1, lr=1e-4,
        run_smplify=True, num_smplify_iters=1,
        smplify_contact_capacity=2,
        val_and_checkpoint_freq=0.0, summary_freq=0.0, synthetic=True,
        mesh_dp=2, mesh_cp=2)
    opts.finalize()
    runtime = rt.build_runtime(opts, synthetic=True, num_verts=110,
                               img_res=64, with_segments=False,
                               with_hd=False)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=imgdir)
    mixed = MixedDataset(opts, 'train', datasets=[ds])
    tr = Trainer(opts, runtime.hmr, runtime.variables, runtime.assets,
                 mixed, None)
    tr.fit()
    assert int(np.asarray(tr.state.step)) == 2
    metrics_file = os.path.join(opts.summary_dir, 'metrics.jsonl')
    recs = [l for l in open(metrics_file)]
    assert len(recs) >= 2  # pipelined logging flushed every step
    import json as _json
    last = _json.loads(recs[-1])
    assert np.isfinite(last['train/loss'])
    assert last['train/smplify_contact_truncated_frac'] == 0.0


def test_checkpoint_ordering_same_second(tmp_path):
    """Two checkpoints saved within the same timestamp second must order
    by STEP, not lexicographically ('step12' < 'step8' by name)."""
    import os
    from tuch_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path))
    stamp = '2026_08_17-12_00_00'
    for step in (8, 12):
        d = tmp_path / f'{stamp}_step{step}_1.00'
        d.mkdir()
        (tmp_path / f'{stamp}_step{step}_1.00.meta.json').write_text('{}')
    ckpts = mgr.list_checkpoints()
    assert [os.path.basename(c) for c in ckpts] == \
        [f'{stamp}_step8_1.00', f'{stamp}_step12_1.00']
    assert mgr.latest().endswith('_step12_1.00')


@pytest.mark.slow
def test_time_budget_exit_checkpoints_midepoch(tmp_path):
    """A --time_to_run exit mid-epoch persists the exact loader position
    (the reference's flag was dead code, trainer.py:47), so --resume
    continues from the next batch instead of the last periodic save."""
    imgdir = str(tmp_path / 'imgs')
    db = synthetic_db(8, img_dir=imgdir, seed=0)
    opts = cfgmod.TrainConfig(
        name='t', log_dir=str(tmp_path / 'logs'), batch_size=2,
        num_workers=0, img_res=64, num_epochs=1, lr=1e-4,
        run_smplify=False, contact_loss_weight=0.0,
        val_and_checkpoint_freq=0.0, summary_freq=0.0, synthetic=True,
        time_to_run=0.0)  # budget exhausted after the first step
    opts.finalize()
    runtime = rt.build_runtime(opts, synthetic=True, num_verts=170,
                               img_res=64)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=imgdir)
    mixed = MixedDataset(opts, 'train', datasets=[ds])

    tr = Trainer(opts, runtime.hmr, runtime.variables, runtime.assets,
                 mixed, None)
    tr.fit()
    assert int(np.asarray(tr.state.step)) == 1  # stopped after one step
    # the exit checkpointed the mid-epoch position (periodic saves were
    # off: val_and_checkpoint_freq=0)
    assert len(tr.ckpt.list_checkpoints()) == 1

    opts2 = cfgmod.TrainConfig(**{**opts.__dict__, 'resume': True,
                                  'time_to_run': float('inf')})
    opts2.finalize()
    tr2 = Trainer(opts2, runtime.hmr, runtime.variables, runtime.assets,
                  mixed, None)
    assert int(np.asarray(tr2.state.step)) == 1
    assert tr2.loader_state.epoch == 0 and tr2.loader_state.batch_idx == 1
    tr2.fit()  # finishes the remaining 3 batches of the epoch
    assert int(np.asarray(tr2.state.step)) == 4


@pytest.mark.slow
def test_sigterm_graceful_preemption(tmp_path):
    """SIGTERM during fit() finishes the in-flight step, checkpoints the
    exact position, and returns -- the preemption-safe exit path."""
    import os as os_mod
    import signal

    imgdir = str(tmp_path / 'imgs')
    db = synthetic_db(16, img_dir=imgdir, seed=0)
    opts = cfgmod.TrainConfig(
        name='t', log_dir=str(tmp_path / 'logs'), batch_size=2,
        num_workers=0, img_res=64, num_epochs=3, lr=1e-4,
        run_smplify=False, contact_loss_weight=0.0,
        val_and_checkpoint_freq=0.0, summary_freq=0.0, synthetic=True)
    opts.finalize()
    runtime = rt.build_runtime(opts, synthetic=True, num_verts=170,
                               img_res=64)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=imgdir)
    mixed = MixedDataset(opts, 'train', datasets=[ds])
    tr = Trainer(opts, runtime.hmr, runtime.variables, runtime.assets,
                 mixed, None)

    # deliver the signal deterministically DURING the 2nd step (a fixed
    # wall-clock timer would race fast machines that finish the whole
    # run first); the handler fit() installed runs immediately in the
    # main thread, the step completes, and the loop exits after it
    orig_step_fn = tr.step_fn
    calls = {'n': 0}

    def step_with_sigterm(state, batch):
        calls['n'] += 1
        if calls['n'] == 2:
            os_mod.kill(os_mod.getpid(), signal.SIGTERM)
        return orig_step_fn(state, batch)

    tr.step_fn = step_with_sigterm

    # benign fallback for the sub-ms window before fit() installs its own
    # handler (the default action would kill the test process)
    prev = signal.signal(signal.SIGTERM, lambda *a: None)
    try:
        tr.fit()
    finally:
        signal.signal(signal.SIGTERM, prev)

    steps = int(np.asarray(tr.state.step))
    assert steps == 2, steps   # the in-flight step finished, then exit
    # the exit checkpointed exactly the stopped-at state and position
    ckpts = tr.ckpt.list_checkpoints()
    assert ckpts, 'no checkpoint written on SIGTERM exit'
    import json
    with open(ckpts[-1] + '.meta.json') as f:
        meta = json.load(f)
    assert meta['step'] == steps
    assert meta['loader_state'] == {'epoch': 0, 'batch_idx': 2,
                                    'perm_seed': opts.seed}
    # in-memory position matches the checkpoint (an in-process re-fit
    # must not skip the rest of the epoch)
    assert tr.loader_state.epoch == 0 and tr.loader_state.batch_idx == 2


@pytest.mark.slow
def test_resume_under_different_seed_keeps_perm_seed(tmp_path):
    """Checkpoints must re-save the LOADER's permutation seed, not the
    current --seed: a second mid-epoch resume would otherwise regenerate
    the epoch permutation from the new seed and repeat/skip samples."""
    import json

    imgdir = str(tmp_path / 'imgs')
    db = synthetic_db(8, img_dir=imgdir, seed=0)
    base = dict(
        name='t', log_dir=str(tmp_path / 'logs'), batch_size=2,
        num_workers=0, img_res=64, num_epochs=1, lr=1e-4,
        run_smplify=False, contact_loss_weight=0.0,
        val_and_checkpoint_freq=0.0, summary_freq=0.0, synthetic=True,
        time_to_run=0.0)
    opts = cfgmod.TrainConfig(seed=1, **base)
    opts.finalize()
    runtime = rt.build_runtime(opts, synthetic=True, num_verts=170,
                               img_res=64)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=imgdir)
    mixed = MixedDataset(opts, 'train', datasets=[ds])
    Trainer(opts, runtime.hmr, runtime.variables, runtime.assets,
            mixed, None).fit()   # 1 step, then budget exit + checkpoint

    # resume with a DIFFERENT --seed; run one more step and stop again
    opts2 = cfgmod.TrainConfig(seed=2, resume=True, **base)
    opts2.finalize()
    tr2 = Trainer(opts2, runtime.hmr, runtime.variables, runtime.assets,
                  mixed, None)
    assert tr2.loader_state.perm_seed == 1   # original stream restored
    tr2.fit()

    ckpts = tr2.ckpt.list_checkpoints()
    with open(ckpts[-1] + '.meta.json') as f:
        meta = json.load(f)
    assert meta['loader_state']['perm_seed'] == 1, meta
    assert meta['loader_state'] == {'epoch': 0, 'batch_idx': 2,
                                    'perm_seed': 1}


@pytest.mark.slow
def test_restore_falls_back_past_corrupt_checkpoint(tmp_path):
    """A checkpoint truncated by a crash mid-save must not brick resume:
    restore() walks back to the newest intact one."""
    imgdir = str(tmp_path / 'imgs')
    db = synthetic_db(8, img_dir=imgdir, seed=0)
    opts = cfgmod.TrainConfig(
        name='t', log_dir=str(tmp_path / 'logs'), batch_size=2,
        num_workers=0, img_res=64, num_epochs=1, lr=1e-4,
        run_smplify=False, contact_loss_weight=0.0,
        val_and_checkpoint_freq=0.5, summary_freq=0.0, synthetic=True)
    opts.finalize()
    runtime = rt.build_runtime(opts, synthetic=True, num_verts=170,
                               img_res=64)
    ds = TuchDataset(opts, 'mtp', data=db, img_dir=imgdir)
    mixed = MixedDataset(opts, 'train', datasets=[ds])
    tr = Trainer(opts, runtime.hmr, runtime.variables, runtime.assets,
                 mixed, None)
    tr.fit()   # periodic saves at steps 2 and 4
    ckpts = tr.ckpt.list_checkpoints()
    assert len(ckpts) >= 2

    # simulate a crash mid-save of the NEWEST checkpoint: valid meta,
    # truncated payload
    import shutil
    shutil.rmtree(ckpts[-1])
    os.makedirs(ckpts[-1])

    opts2 = cfgmod.TrainConfig(**{**opts.__dict__, 'resume': True})
    opts2.finalize()
    tr2 = Trainer(opts2, runtime.hmr, runtime.variables, runtime.assets,
                  mixed, None)
    # fell back to the intact step-2 checkpoint
    assert int(np.asarray(tr2.state.step)) == 2
    assert tr2.loader_state.batch_idx == 2


def test_checkpoint_gc_keeps_best_val(tmp_path):
    """GC keeps the newest max_to_keep checkpoints AND the best-val one
    (the reference never prunes; with pruning, best must survive)."""
    import json
    from tuch_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    names = []
    for i, err in enumerate([50.0, 10.0, 90.0, 80.0, 70.0]):
        name = f'2026_08_17-12_00_{i:02d}_step{i + 1}_{err:.2f}'
        (tmp_path / name).mkdir()
        (tmp_path / (name + '.meta.json')).write_text(
            json.dumps({'step': i + 1, 'val_error': err,
                        'loader_state': {}}))
        names.append(str(tmp_path / name))
    mgr._gc()
    kept = mgr.list_checkpoints()
    # newest two (steps 4, 5) plus the best-val (step 2, err 10.0)
    assert kept == [names[1], names[3], names[4]]
