"""TPU soak: long synthetic training run to flush latent device faults.

VERDICT r03 #6: run ~1 hour of cli.train --synthetic at B=128 with
--fast_profile + periodic checkpoints on the real chip; record steps/s
stability and any device errors in a committed artifact.

Launches the real training CLI in a subprocess (one TPU client at a time;
this tool itself never touches jax), then summarizes the run's
metrics.jsonl into a JSON artifact: step count, steps/s median and
p10/p90, slowest step, checkpoint count, and any UNAVAILABLE / device
errors seen in stderr.

Usage:
  python tools/soak_train.py [--seconds 3600] [--batch 128] \
      [--out docs/SOAK_r04.json]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=3600)
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--out', default='docs/SOAK_r04.json')
    ap.add_argument('--log_dir', default=None)
    ap.add_argument('--nv', type=int, default=0,
                    help='synthetic body size override (plumbing smoke '
                         'on CPU; 0 = full 6890-vert topology)')
    args = ap.parse_args()

    log_dir = args.log_dir or tempfile.mkdtemp(prefix='soak_')
    # synthetic db has max(4*batch, 8) samples -> 4 steps/epoch at B=128;
    # val_and_checkpoint_freq is a fraction-of-epoch interval
    # (trainer.py:freq_to_step), so 25.0 checkpoints every ~100 steps and
    # summaries stay off the hot path
    cmd = [sys.executable, '-m', 'tuch_tpu.cli.train',
           '--name', 'soak', '--synthetic', '--fast_profile',
           '--batch_size', str(args.batch),
           '--num_epochs', '1000000',
           '--time_to_run', str(args.seconds),
           '--val_and_checkpoint_freq', '25.0',
           '--summary_freq', '0',
           '--num_workers', '2',
           '--log_dir', log_dir]
    if args.nv:
        cmd += ['--synthetic_num_verts', str(args.nv), '--img_res', '64']
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=args.seconds + 1800,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    elapsed = time.time() - t0

    # find the run's metrics.jsonl (log_dir/<name>/.../metrics.jsonl)
    rates, steps = [], 0
    for root, _dirs, files in os.walk(log_dir):
        if 'metrics.jsonl' not in files:
            continue
        with open(os.path.join(root, 'metrics.jsonl')) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except Exception:
                    continue
                # records are flat {'step': N, 'train/steps_per_sec': v}
                # (trainer.py MetricsLogger.scalars)
                if 'train/steps_per_sec' in rec:
                    steps += 1
                    rates.append(float(rec['train/steps_per_sec']))
    ckpts = 0  # checkpoint dirs are '{stamp}_step{N}_{err}' (checkpoint.py:34)
    for root, dirs, _files in os.walk(log_dir):
        ckpts += sum(1 for d in dirs if '_step' in d)

    import numpy as np
    rates_np = np.asarray(sorted(rates)) if rates else np.zeros(0)
    # first steps include compile; report the steady-state distribution
    steady = rates_np[2:] if len(rates_np) > 4 else rates_np
    err = proc.stderr or ''
    fault_lines = [ln for ln in err.splitlines()
                   if 'UNAVAILABLE' in ln or 'device error' in ln
                   or 'kernel fault' in ln]
    result = {
        'cmd': ' '.join(cmd[2:]),
        'rc': proc.returncode,
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
        'stderr_tail': err[-500:].strip() if proc.returncode else '',
        'batch': args.batch,
    }
    result['ok'] = (proc.returncode == 0 and not fault_lines
                    and steps > 0)
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    sys.exit(0 if result['ok'] else 1)


if __name__ == '__main__':
    main()
