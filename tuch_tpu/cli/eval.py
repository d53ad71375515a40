"""eval: batched benchmark inference (MPJPE / PA-MPJPE).

Reference-compatible port of /root/reference/eval.py:
  python -m tuch_tpu.cli.eval --checkpoint ckpt.pt --dataset 3dpw
With --synthetic it evaluates a random-weight model on a synthetic dataset
(pipeline smoke test without downloads).
"""

import argparse

import numpy as np

# Paper accuracy context, (MPJPE, PA-MPJPE) in mm. PROVENANCE: model-memory
# (BASELINE.md:32-47) -- recorded from memory of the SPIN/TUCH papers in a
# zero-egress container and NEVER verified against arXiv 2104.03176 /
# 1909.12828. Advisory display only; MUST NOT be used as a pass/fail gate
# (the binding bar is +-1mm vs the reference implementation run with the
# same checkpoint, /root/reference/eval.py:189-195).
PAPER_TARGETS_MODEL_MEMORY = {
    '3dpw': {'SPIN': (96.9, 59.2), 'TUCH': (85.0, 55.5)},
    'mpi-inf-3dhp': {'SPIN': (105.2, 67.5), 'TUCH': (100.0, 65.0)},
}


def _print_paper_context(dataset: str, result: dict) -> None:
    targets = PAPER_TARGETS_MODEL_MEMORY.get(dataset)
    if not targets or 'mpjpe' not in result:
        return
    print('--- paper context [provenance: model-memory — UNVERIFIED, '
          'advisory only, never a gate] ---')
    for method, (mpjpe, pa) in targets.items():
        print(f'  {method} ({dataset}): MPJPE ~{mpjpe:.1f}mm, '
              f'PA-MPJPE ~{pa:.1f}mm (from model memory of the paper; '
              're-check against arXiv before relying on it)')
    print('  binding accuracy bar: ±1mm vs the reference implementation '
          'with the same checkpoint (BASELINE.md)')


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--dataset', default='mpi-inf-3dhp',
                   choices=['3dpw', 'mpi-inf-3dhp'])
    p.add_argument('--log_freq', default=50, type=int)
    p.add_argument('--batch_size', default=32, type=int)
    p.add_argument('--shuffle', default=False, action='store_true')
    p.add_argument('--num_workers', default=8, type=int)
    p.add_argument('--result_file', default=None)
    p.add_argument('--idx', default=None,
                   help='accepted for reference compatibility; unused by '
                        'the reference too (eval.py:56)')
    p.add_argument('--mesh_dp', type=int, default=1,
                   help='shard eval batches over this many devices '
                        '(data-parallel; 1 = single device)')
    p.add_argument('--synthetic', action='store_true')
    p.add_argument('--synthetic_num_verts', type=int, default=0,
                   help='--synthetic body size override (0 = full)')
    p.add_argument('--synthetic_samples', type=int, default=16)
    p.add_argument('--bn_fold', action='store_true',
                   help='fold eval-mode BatchNorm into conv weights at '
                        'model build (exact up to fp reassociation)')
    p.add_argument('--backbone', default='resnet50',
                   help='regressor backbone: resnet50 (reference) or a '
                        'models/vit.py config name (vit_s16, ...)')
    p.add_argument('--paper_context', action='store_true',
                   help='print UNVERIFIED model-memory paper numbers as '
                        'context (advisory only, never a gate)')
    args = p.parse_args(argv)

    from tuch_tpu import config as cfg
    from tuch_tpu import runtime as rt
    from tuch_tpu.data.dataset import TuchDataset, synthetic_db
    from tuch_tpu.eval.evaluate import run_evaluation

    from types import SimpleNamespace
    runtime = rt.build_runtime(
        options=SimpleNamespace(backbone=args.backbone),
        synthetic=args.synthetic or None,
        num_verts=args.synthetic_num_verts or None,
        with_segments=False, with_hd=False, with_contact=False)
    variables = runtime.variables
    if args.checkpoint:
        from tuch_tpu.train.checkpoint import load_variables
        variables = load_variables(args.checkpoint, variables)
    hmr = runtime.hmr
    if args.bn_fold:
        # eval is inference-only: fold BatchNorm into the conv weights
        # (exact up to fp reassociation, models/hmr.py:fold_batchnorm)
        from tuch_tpu.models.hmr import fold_batchnorm
        hmr = hmr.clone(bn_fold=True)
        variables = fold_batchnorm(variables)

    if args.synthetic:
        import tempfile
        d = tempfile.mkdtemp()
        db = synthetic_db(args.synthetic_samples, img_dir=d, seed=0,
                          with_pose_3d=(args.dataset == 'mpi-inf-3dhp'))
        ns = len(db['imgname'])
        db['gender'] = np.array(['m', 'f'] * ((ns + 1) // 2))[:ns]
        dataset = TuchDataset(None, args.dataset, data=db, img_dir=d,
                              use_augmentation=False, split='test')
        cnc = None
        # both mappers (H36M_TO_J17 and J14) index rows up to 16, so the
        # synthetic stand-in regressor must keep 17 rows for either
        # dataset (a 14-row slice makes jit clamp the gather silently)
        j_reg = np.asarray(runtime.smpl.J_regressor)[:17]
        smpl_m = smpl_f = None
    else:
        dataset = TuchDataset(None, args.dataset, split='test',
                              use_augmentation=False)
        j_reg = np.load(cfg.JOINT_REGRESSOR_H36M)
        cnc = None
        if args.dataset == '3dpw':
            csigs = np.load(cfg.THREEDPW_CIG)
            cnc = csigs.min(1).min(1)
        from tuch_tpu import assets as assets_mod
        import os
        smpl_m = smpl_f = None
        for gender, var in (('MALE', 'smpl_m'), ('FEMALE', 'smpl_f')):
            path = os.path.join(cfg.SMPL_MODEL_DIR, f'SMPL_{gender}.pkl')
            if os.path.isfile(path):
                m = assets_mod.load_smpl_pkl(path)
                m = m._replace(
                    J_regressor_extra=runtime.smpl.J_regressor_extra)
                if gender == 'MALE':
                    smpl_m = m
                else:
                    smpl_f = m

    mesh = None
    if args.mesh_dp > 1:
        from tuch_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh(dp=args.mesh_dp, cp=1)

    result = run_evaluation(
        hmr, variables, dataset, args.dataset, runtime.smpl,
        smpl_m, smpl_f, j_reg, batch_size=args.batch_size, cnc_arr=cnc,
        result_file=args.result_file, log_freq=args.log_freq, mesh=mesh,
        num_workers=args.num_workers, shuffle=args.shuffle)
    print('*** Final Results ***')
    for k, v in result.items():
        print(f'  {k}: {v:.3f}' if isinstance(v, float) else f'  {k}: {v}')
    if args.paper_context and not args.synthetic:
        # opt-in only (ADVICE r04): unverified model-memory numbers must
        # never print by default where they could be copied as fact
        _print_paper_context(args.dataset, result)


if __name__ == '__main__':
    main()
