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


def run_arm(tag, extra, args):
    log_root = tempfile.mkdtemp(prefix=f'ab_{tag}_')
    cmd = [
        sys.executable, '-m', 'tuch_tpu.cli.train',
        '--synthetic', '--name', tag, '--log_dir', log_root,
        '--batch_size', str(args.batch), '--num_epochs', str(args.epochs),
        '--run_smplify', '--num_smplify_iters', str(args.iters),
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
    return train, val


def series(recs, key):
    return np.asarray([r[key] for r in recs if key in r], np.float64)


def summarize(tag, train, val):
    accept = series(train, 'train/smplify_accept_rate')
    jloss = series(train, 'train/opt_joint_loss_mean')
    out = {
        'steps': len(train),
        'accept_rate_mean': round(float(accept.mean()), 4),
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
    args = ap.parse_args()

    # the fast arm is the FULL fast profile -- every knob config.py's
    # fast_profile turns on, so the artifact labels exactly what users get
    cap = (5 * args.batch) // 8
    exact = run_arm('exact', [], args)
    fast = run_arm('fast', [
        '--smplify_exterior_refresh', str(args.refresh),
        '--contact_candidate_k', str(args.candidate_k),
        '--smplify_contact_capacity', str(cap),
        '--regressor_contact_capacity', str(cap)], args)

    s_exact = summarize('exact', *exact)
    s_fast = summarize('fast', *fast)

    d_accept = abs(s_exact['accept_rate_mean'] - s_fast['accept_rate_mean'])
    jl_e, jl_f = s_exact['opt_joint_loss_last'], s_fast['opt_joint_loss_last']
    d_jloss_rel = abs(jl_e - jl_f) / max(abs(jl_e), 1e-9)
    d_val = None
    if s_exact['final_val_v2v'] is not None \
            and s_fast['final_val_v2v'] is not None:
        d_val = abs(s_exact['final_val_v2v'] - s_fast['final_val_v2v'])

    equivalent = d_accept < 0.1 and d_jloss_rel < 0.1 \
        and (d_val is None or d_val < 5.0)
    report = {
        'config': vars(args),
        'exact': s_exact,
        'fast': s_fast,
        'deltas': {
            'accept_rate': round(d_accept, 4),
            'opt_joint_loss_rel': round(d_jloss_rel, 4),
            'final_val_v2v_mm': None if d_val is None else round(d_val, 3),
        },
        'equivalent': bool(equivalent),
        'criteria': 'accept-rate delta < 0.1, fits joint-loss rel delta '
                    '< 10%, final val v2v delta < 5mm',
    }
    out_path = osp.join(REPO, 'docs', f'ab_fast_knobs_r{args.round:02d}.json')
    with open(out_path, 'w') as f:
        json.dump(report, f, indent=2)
    print(json.dumps({'equivalent': equivalent, 'deltas': report['deltas'],
                      'out': out_path}))


if __name__ == '__main__':
    main()
