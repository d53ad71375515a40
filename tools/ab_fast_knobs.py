"""A/B the SMPLify speed knobs on TRAINING outcomes, not just single fits.

The opt-in knobs (exterior_refresh_every=4, contact_candidate_k=984) were
labeled in r02 only by final single-fit quality. In-the-loop training is a
different regime: 10-iter fits, accept/reject gating, a fits store evolving
over epochs. This tool runs two identical synthetic training runs (same
seed, same data, full 6890-vert topology) -- exact reference semantics vs
the fast profile -- and compares:
  * smplify accept rate per step (does the gate behave the same?)
  * opt_joint_loss_mean trajectory (does the fits store improve equally?)
  * final val mpjpe proxy / v2v (does the regressor land in the same place?)

Writes docs/ab_fast_knobs_r{N}.json and prints a verdict line. Run on the
TPU chip (default backend); CPU works at --num_verts 170 toy scale.

Usage:
  python tools/ab_fast_knobs.py [--epochs 8] [--batch 32] [--round 3]
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import tempfile

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def run_arm(tag, extra, args, epochs=None, iters=None):
    log_root = tempfile.mkdtemp(prefix=f'ab_{tag}_')
    cmd = [
        sys.executable, '-m', 'tuch_tpu.cli.train',
        '--synthetic', '--name', tag, '--log_dir', log_root,
        '--batch_size', str(args.batch),
        '--num_epochs', str(epochs or args.epochs),
        '--run_smplify', '--num_smplify_iters', str(iters or args.iters),
        '--seed', '0', '--num_workers', '0',
        '--summary_freq', '0', '--val_and_checkpoint_freq', '1.0',
    ]
    if args.num_verts:
        cmd += ['--synthetic_num_verts', str(args.num_verts),
                '--img_res', '64']
    cmd += extra
    print(f'[{tag}]', ' '.join(cmd), flush=True)
    res = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if res.returncode != 0:
        print(res.stdout[-4000:])
        print(res.stderr[-4000:])
        raise RuntimeError(f'{tag} training run failed')
    jsonl = osp.join(log_root, tag, 'tensorboard', 'metrics.jsonl')
    train, val = [], []
    with open(jsonl) as f:
        for line in f:
            rec = json.loads(line)
            if any(k.startswith('train/') for k in rec):
                train.append(rec)
            if any(k.startswith('val/') for k in rec):
                val.append(rec)
    return train, val, osp.join(log_root, tag)


def make_strong_static_fits(args):
    """Warm up a fits store so the accept gate is discriminative.

    With a zero-seeded store every fresh 10-iter fit beats the stored
    zero pose, so the accept gate saturates at 1.0 and the A/B never
    stresses REJECTION (the r03 artifact's stated caveat). This runs a
    short warmup training (same seed => identical synthetic data and row
    order) whose checkpoints write {ds}_fits.npy stores full of
    longer-optimized (--warmup_iters) accepted fits, then returns a
    static-fits dir seeding BOTH arms: fresh 10-iter fits from the
    arms' random-init regressor now genuinely lose to some stored fits
    and beat others, so accept/reject decisions carry signal.
    """
    _, _, warm_dir = run_arm('warm', [
        '--synthetic_projected_kpts',
        '--smplify_exterior_refresh', str(args.refresh),
        '--contact_candidate_k', str(args.candidate_k)],
        args, epochs=args.warmup_epochs, iters=args.warmup_iters)
    ckpt_dir = osp.join(warm_dir, 'checkpoints')
    static_dir = tempfile.mkdtemp(prefix='ab_static_fits_')
    fits = [f for f in os.listdir(ckpt_dir) if f.endswith('_fits.npy')]
    if not fits:
        raise RuntimeError(f'warmup wrote no fits stores in {ckpt_dir}')
    for f in fits:
        np.save(osp.join(static_dir, f), np.load(osp.join(ckpt_dir, f)))
    print(f'[warm] seeded static fits: {fits} -> {static_dir}', flush=True)
    return static_dir


def series(recs, key):
    return np.asarray([r[key] for r in recs if key in r], np.float64)


def summarize(tag, train, val):
    accept = series(train, 'train/smplify_accept_rate')
    jloss = series(train, 'train/opt_joint_loss_mean')
    out = {
        'steps': len(train),
        'accept_rate_mean': round(float(accept.mean()), 4),
        'accept_rate_per_step': [round(float(x), 4) for x in accept],
        'accept_rate_last_quarter': round(
            float(accept[-max(1, len(accept) // 4):].mean()), 4),
        'opt_joint_loss_first': round(float(jloss[0]), 2),
        'opt_joint_loss_last': round(float(jloss[-1]), 2),
        'opt_joint_loss_trajectory': [round(float(x), 2) for x in jloss],
        'final_val_mpjpe_proxy': round(
            float(series(val, 'val/mpjpe_v2v_proxy')[-1]), 2)
        if series(val, 'val/mpjpe_v2v_proxy').size else None,
        'final_val_v2v': round(float(series(val, 'val/v2v')[-1]), 2)
        if series(val, 'val/v2v').size else None,
    }
    tf = series(train, 'train/smplify_contact_truncated_frac')
    if tf.size:
        out['contact_truncated_frac_mean'] = round(float(tf.mean()), 4)
    print(f'[{tag}] {json.dumps(out)[:400]}', flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=8)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--num_verts', type=int, default=0,
                    help='toy body size (0 = full 6890; CPU smoke: 170)')
    ap.add_argument('--refresh', type=int, default=4)
    ap.add_argument('--candidate_k', type=int, default=984)
    ap.add_argument('--round', type=int, default=3)
    ap.add_argument('--seed_mode', choices=('zeros', 'strong'),
                    default='zeros',
                    help='strong: warm up a fits store first so the '
                         'accept gate actually rejects some fits')
    ap.add_argument('--warmup_epochs', type=int, default=2)
    ap.add_argument('--warmup_iters', type=int, default=30)
    args = ap.parse_args()

    common = []
    if args.seed_mode == 'strong':
        # projected keypoints give poses a consistent 3D explanation --
        # without them every fresh fit overfits the current augmented
        # view and beats any transferred stored fit (accept saturates)
        common = ['--synthetic_projected_kpts',
                  '--static_fits_dir', make_strong_static_fits(args)]

    # the fast arm is the FULL fast profile -- every knob config.py's
    # fast_profile turns on, so the artifact labels exactly what users get
    cap = (5 * args.batch) // 8
    exact = run_arm('exact', list(common), args)[:2]
    fast = run_arm('fast', common + [
        '--smplify_exterior_refresh', str(args.refresh),
        '--contact_candidate_k', str(args.candidate_k),
        '--smplify_contact_capacity', str(cap),
        '--regressor_contact_capacity', str(cap)], args)[:2]

    s_exact = summarize('exact', *exact)
    s_fast = summarize('fast', *fast)

    d_accept = abs(s_exact['accept_rate_mean'] - s_fast['accept_rate_mean'])
    acc_e = np.asarray(s_exact['accept_rate_per_step'])
    acc_f = np.asarray(s_fast['accept_rate_per_step'])
    n = min(len(acc_e), len(acc_f))
    d_accept_step_max = float(np.abs(acc_e[:n] - acc_f[:n]).max()) if n else 0.0
    jl_e, jl_f = s_exact['opt_joint_loss_last'], s_fast['opt_joint_loss_last']
    d_jloss_rel = abs(jl_e - jl_f) / max(abs(jl_e), 1e-9)
    d_val = None
    if s_exact['final_val_v2v'] is not None \
            and s_fast['final_val_v2v'] is not None:
        d_val = abs(s_exact['final_val_v2v'] - s_fast['final_val_v2v'])

    # in strong mode the exact arm's gate must actually be discriminative
    # (some accepts AND some rejects), else this run proves nothing new
    gate_discriminative = 0.02 < s_exact['accept_rate_mean'] < 0.98
    equivalent = d_accept < 0.1 and d_jloss_rel < 0.1 \
        and (d_val is None or d_val < 5.0)
    if args.seed_mode == 'strong':
        equivalent = equivalent and gate_discriminative
    report = {
        'config': vars(args),
        'exact': s_exact,
        'fast': s_fast,
        'deltas': {
            'accept_rate': round(d_accept, 4),
            'accept_rate_per_step_max': round(d_accept_step_max, 4),
            'opt_joint_loss_rel': round(d_jloss_rel, 4),
            'final_val_v2v_mm': None if d_val is None else round(d_val, 3),
        },
        'gate_discriminative': bool(gate_discriminative),
        'equivalent': bool(equivalent),
        'criteria': 'accept-rate delta < 0.1, fits joint-loss rel delta '
                    '< 10%, final val v2v delta < 5mm'
                    + ('; strong seed: exact accept rate in (0.02, 0.98)'
                       if args.seed_mode == 'strong' else ''),
    }
    suffix = '_gate' if args.seed_mode == 'strong' else ''
    out_path = osp.join(REPO, 'docs',
                        f'ab_fast_knobs_r{args.round:02d}{suffix}.json')
    with open(out_path, 'w') as f:
        json.dump(report, f, indent=2)
    print(json.dumps({'equivalent': equivalent,
                      'gate_discriminative': gate_discriminative,
                      'deltas': report['deltas'], 'out': out_path}))


if __name__ == '__main__':
    main()
