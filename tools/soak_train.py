"""TPU soak: long synthetic training run to flush latent device faults.

VERDICT r03 #6: run ~1 hour of cli.train --synthetic at B=128 with
--fast_profile + periodic checkpoints on the real chip; record steps/s
stability and any device errors in a committed artifact.

VERDICT r04 #6 adds --kill_at_steps N: phase 1 is SIGKILLed mid-run
(a hard crash, not a graceful exit), phase 2 relaunches with --resume,
and the artifact asserts loss-trajectory continuity -- the steps phase 2
replays from the last checkpoint must reproduce phase 1's logged
train/loss values (checkpoint restores params/opt/fits/loader
position/rng, so the replay is deterministic; reference resume
semantics: /root/reference/tuch/utils/saver.py:58-105,
/root/reference/tuch/utils/data_loader.py:25-57).

Launches the real training CLI in a subprocess (one TPU client at a time;
this tool itself never touches jax), then summarizes the run's
metrics.jsonl into a JSON artifact: step count, steps/s median and
p10/p90, slowest step, checkpoint count, kill/resume continuity, and any
UNAVAILABLE / device errors seen in stderr.

Usage:
  python tools/soak_train.py [--seconds 3600] [--batch 128] \
      [--out docs/SOAK_r05.json] [--kill_at_steps 40]
"""

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_metrics(log_dir):
    """All metrics.jsonl records under log_dir, in file order."""
    recs = []
    for root, _dirs, files in os.walk(log_dir):
        if 'metrics.jsonl' not in files:
            continue
        with open(os.path.join(root, 'metrics.jsonl')) as f:
            for line in f:
                try:
                    recs.append(json.loads(line))
                except Exception:
                    continue
    return recs


def checkpoint_steps(log_dir):
    """Step numbers of written checkpoints ('{stamp}_step{N}_{err}')."""
    steps = []
    for root, dirs, _files in os.walk(log_dir):
        for d in dirs:
            m = re.search(r'_step(\d+)(_|$)', d)
            if m:
                steps.append(int(m.group(1)))
    return sorted(set(steps))


def launch(cmd, kill_at_steps=None, log_dir=None, timeout=None,
           baseline_lines=0):
    """Run the training subprocess; optionally SIGKILL it mid-run.

    kill_at_steps: poll metrics.jsonl until >= that many NEW
    'train/steps_per_sec' records appear (beyond baseline_lines), then
    hard-kill the process by its exact pid. Returns (rc, stderr,
    killed: bool).
    """
    # stdout/stderr go to files, not PIPEs: the trainer prints one line
    # per step, and an undrained 64KB pipe buffer would BLOCK the child
    # long before kill_at_steps
    out_f = tempfile.NamedTemporaryFile('w+', suffix='.out', delete=False)
    err_f = tempfile.NamedTemporaryFile('w+', suffix='.err', delete=False)
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=out_f, stderr=err_f,
                            text=True)

    def stderr_text():
        err_f.flush()
        with open(err_f.name) as f:
            return f.read()

    if kill_at_steps is None:
        try:
            proc.wait(timeout=timeout)
            return proc.returncode, stderr_text(), False
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            return -9, stderr_text(), True
    deadline = time.time() + (timeout or 3600)
    while time.time() < deadline and proc.poll() is None:
        recs = read_metrics(log_dir)[baseline_lines:]
        n = sum(1 for r in recs if 'train/steps_per_sec' in r)
        if n >= kill_at_steps:
            os.kill(proc.pid, signal.SIGKILL)  # hard crash, no cleanup
            proc.wait()
            return -9, stderr_text(), True
        time.sleep(2)
    proc.kill()
    proc.wait()
    return proc.returncode, stderr_text(), False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=3600)
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--out', default='docs/SOAK_r05.json')
    ap.add_argument('--log_dir', default=None)
    ap.add_argument('--nv', type=int, default=0,
                    help='synthetic body size override (plumbing smoke '
                         'on CPU; 0 = full 6890-vert topology)')
    ap.add_argument('--kill_at_steps', type=int, default=0,
                    help='SIGKILL the run after this many logged steps, '
                         'then relaunch with --resume and assert loss-'
                         'trajectory continuity (0 = plain soak)')
    ap.add_argument('--ckpt_freq', type=float, default=25.0,
                    help='val_and_checkpoint_freq passed to cli.train '
                         '(fraction-of-epoch interval; synthetic db at '
                         'B=128 runs 4 steps/epoch, so 25.0 -> every '
                         '~100 steps, 2.5 -> every ~10)')
    args = ap.parse_args()

    log_dir = args.log_dir or tempfile.mkdtemp(prefix='soak_')
    cmd = [sys.executable, '-m', 'tuch_tpu.cli.train',
           '--name', 'soak', '--synthetic', '--fast_profile',
           '--batch_size', str(args.batch),
           '--num_epochs', '1000000',
           '--time_to_run', str(args.seconds),
           '--val_and_checkpoint_freq', str(args.ckpt_freq),
           '--summary_freq', '0',
           '--num_workers', '2',
           '--log_dir', log_dir]
    if args.nv:
        cmd += ['--synthetic_num_verts', str(args.nv), '--img_res', '64']

    t0 = time.time()
    kill_resume = None
    if args.kill_at_steps:
        # phase 1: run until kill_at_steps logged steps, then SIGKILL
        rc1, err1, killed = launch(cmd, kill_at_steps=args.kill_at_steps,
                                   log_dir=log_dir,
                                   timeout=args.seconds + 1800)
        phase1 = read_metrics(log_dir)
        n_phase1 = len(phase1)
        ckpts1 = checkpoint_steps(log_dir)
        # phase 2: hard-crash recovery -- relaunch with --resume for the
        # remaining budget
        remaining = max(60.0, args.seconds - (time.time() - t0))
        cmd2 = [c if c != str(args.seconds) else str(remaining)
                for c in cmd] + ['--resume']
        rc, err, _ = launch(cmd2, timeout=remaining + 1800)
        recs = read_metrics(log_dir)
        phase2 = recs[n_phase1:]

        # continuity: phase 2 must restart from the last phase-1
        # checkpoint and reproduce the replayed steps' train/loss
        last_ckpt = ckpts1[-1] if ckpts1 else None
        p1_loss = {r['step']: r['train/loss'] for r in phase1
                   if 'train/loss' in r}
        p2_loss = {r['step']: r['train/loss'] for r in phase2
                   if 'train/loss' in r}
        p2_first = min(p2_loss) if p2_loss else None
        overlap = sorted(set(p1_loss) & set(p2_loss))
        deltas = [abs(p1_loss[s] - p2_loss[s])
                  / max(1e-9, abs(p1_loss[s])) for s in overlap]
        kill_resume = {
            'killed_with_sigkill': killed,
            'phase1_rc': rc1,
            'phase1_steps_logged': len(p1_loss),
            'phase1_checkpoints': ckpts1,
            'resume_first_logged_step': p2_first,
            'resumed_from_checkpoint_step': last_ckpt,
            'replayed_overlap_steps': len(overlap),
            'replayed_loss_max_rel_delta':
                round(max(deltas), 8) if deltas else None,
            'continuity_ok': bool(
                killed and last_ckpt is not None and p2_first is not None
                # resume continues from the position AFTER the last
                # checkpoint (saver persists the next batch index)
                and last_ckpt < p2_first <= last_ckpt + 2
                and (not deltas or max(deltas) < 1e-3)),
        }
    else:
        rc, err, _ = launch(cmd, timeout=args.seconds + 1800)
        recs = read_metrics(log_dir)

    elapsed = time.time() - t0
    rates = [float(r['train/steps_per_sec']) for r in recs
             if 'train/steps_per_sec' in r]
    steps = len(rates)
    ckpts = len(checkpoint_steps(log_dir))

    import numpy as np
    rates_np = np.asarray(sorted(rates)) if rates else np.zeros(0)
    # first steps include compile; report the steady-state distribution
    steady = rates_np[2:] if len(rates_np) > 4 else rates_np
    fault_lines = [ln for ln in err.splitlines()
                   if 'UNAVAILABLE' in ln or 'device error' in ln
                   or 'kernel fault' in ln]
    result = {
        'cmd': ' '.join(cmd[2:]),
        'rc': rc,
        'elapsed_s': round(elapsed, 1),
        'steps_logged': steps,
        'steps_per_sec_median': round(float(np.median(steady)), 4)
        if len(steady) else None,
        'steps_per_sec_p10_p90': [round(float(np.percentile(steady, 10)), 4),
                                  round(float(np.percentile(steady, 90)), 4)]
        if len(steady) else None,
        'slowest_step_s': round(1.0 / float(steady[0]), 2)
        if len(steady) else None,
        'imgs_per_sec_median': round(
            args.batch * float(np.median(steady)), 2)
        if len(steady) else None,
        'checkpoints_written': ckpts,
        'device_faults': len(fault_lines),
        'fault_lines': fault_lines[:5],
        'stderr_tail': err[-500:].strip() if rc else '',
        'batch': args.batch,
    }
    if kill_resume is not None:
        result['kill_resume'] = kill_resume
    result['ok'] = (rc == 0 and not fault_lines and steps > 0
                    and (kill_resume is None
                         or kill_resume['continuity_ok']))
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    sys.exit(0 if result['ok'] else 1)


if __name__ == '__main__':
    main()
