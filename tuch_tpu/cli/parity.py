"""parity: one-command numerical parity gate against the PyTorch reference.

BASELINE.md north star: demo_tuch output vertices within 1e-3 of the
reference (/root/reference/demo_tuch.py:132-218). Three check levels,
picked automatically from what exists on this machine:

  1. --ref_dump parity.npz  (made by tools/parity_dump.py dump in an env
     where the reference runs): full-pipeline diff -- rotmats, betas,
     camera, and SMPL VERTICES of the converted checkpoint vs the dumped
     reference outputs. The authoritative <=1e-3 vertex gate.
  2. --checkpoint x.pt with torch-cpu available (this container): the
     checkpoint's own state dict is executed with the reference's exact
     functional graph (models/torch_ref.py == tuch/models/hmr.py:27-160)
     and diffed against the Flax conversion on the same inputs; when real
     SMPL assets exist, both parameter sets also run through SMPL for a
     vertex delta (shared-LBS, so it isolates the network conversion).
  3. Neither available: prints the exact commands to run when assets
     exist and exits 0 (recorded skip).

Usage:
  python -m tuch_tpu.cli.parity --checkpoint data/spin_model_checkpoint.pt \
      [--img img1.jpg ...] [--ref_dump parity.npz]
"""

import argparse
import os
import sys

import numpy as np

VERT_TOL = 1e-3
PARAM_TOL = 5e-4


def _load_images(img_paths, img_res=224):
    from tuch_tpu.cli.demo_tuch import process_image
    norms = [process_image(p, None, None, input_res=img_res)[1]
             for p in img_paths]
    return np.concatenate(norms, axis=0)


def check_against_dump(args) -> int:
    import jax.numpy as jnp
    from tuch_tpu import runtime as rt
    from tuch_tpu.models.smpl import smpl_forward
    from tuch_tpu.train.checkpoint import load_pretrained_params

    runtime = rt.build_runtime(synthetic=False, with_segments=False,
                               with_hd=False, with_contact=False)
    loaded = load_pretrained_params(args.checkpoint)
    variables = {'params': loaded['params'],
                 'batch_stats': loaded.get(
                     'batch_stats', runtime.variables['batch_stats'])}
    data = np.load(args.ref_dump)
    n = int(data['n'])
    worst = {}
    for i in range(n):
        norm = data[f'img{i}_norm'][None]
        rotmat, betas, cam = runtime.hmr.apply(
            variables, jnp.asarray(norm), train=False)
        out = smpl_forward(runtime.smpl, betas, rotmat[:, 1:],
                           rotmat[:, :1], pose2rot=False)
        for name, ours, ref in (
                ('rotmat', rotmat, data[f'img{i}_rotmat']),
                ('betas', betas, data[f'img{i}_betas']),
                ('cam', cam, data[f'img{i}_cam']),
                ('vertices', out.vertices, data[f'img{i}_vertices'])):
            err = float(np.abs(np.asarray(ours) - ref).max())
            worst[name] = max(worst.get(name, 0.0), err)
    ok = True
    for name, err in worst.items():
        tol = VERT_TOL if name == 'vertices' else 1e-2
        status = 'OK' if err < tol else 'FAIL'
        ok &= err < tol
        print(f'[full-pipeline] {name}: max |delta| = {err:.2e}  [{status}]')
    return 0 if ok else 1


def check_network_vs_torch(args) -> int:
    import jax.numpy as jnp
    from tuch_tpu import config as cfg
    from tuch_tpu.models import hmr as hmr_mod
    from tuch_tpu.models.convert import convert_torch_checkpoint, _to_numpy
    from tuch_tpu.models.torch_ref import torch_hmr_forward
    from tuch_tpu.utils.rotations import rot6d_to_rotmat
    import torch

    ckpt = torch.load(args.checkpoint, map_location='cpu',
                      weights_only=False)
    sd = ckpt.get('model', ckpt) if isinstance(ckpt, dict) else ckpt
    sd_np = {k: _to_numpy(v) for k, v in sd.items()}

    # mean params: from checkpoint buffers, else the asset file
    if 'init_pose' in sd_np:
        mean_pose = sd_np['init_pose'].reshape(-1)
        mean_shape = sd_np['init_shape'].reshape(-1)
        mean_cam = sd_np['init_cam'].reshape(-1)
    elif os.path.isfile(cfg.SMPL_MEAN_PARAMS):
        from tuch_tpu.assets import load_mean_params
        mean_pose, mean_shape, mean_cam = load_mean_params(
            cfg.SMPL_MEAN_PARAMS)
    else:
        print('SKIP network check: checkpoint has no init_pose buffers and '
              f'{cfg.SMPL_MEAN_PARAMS} is absent')
        return 0

    variables = convert_torch_checkpoint(args.checkpoint)
    model = hmr_mod.create_hmr(mean_pose, mean_shape, mean_cam)

    if args.img:
        x = _load_images(args.img)
    else:
        rng = np.random.RandomState(0)
        x = (rng.randn(2, 224, 224, 3) * 0.5).astype(np.float32)
        print('(no --img given: using fixed random inputs)')

    pose6d_t, betas_t, cam_t = torch_hmr_forward(sd_np, x, mean_pose,
                                                 mean_shape, mean_cam)
    rotmat_j, betas_j, cam_j = model.apply(
        {'params': variables['params'],
         'batch_stats': variables['batch_stats']},
        jnp.asarray(x), train=False)
    rotmat_t = np.asarray(rot6d_to_rotmat(jnp.asarray(pose6d_t))).reshape(
        -1, 24, 3, 3)

    worst = {
        'rotmat': float(np.abs(np.asarray(rotmat_j) - rotmat_t).max()),
        'betas': float(np.abs(np.asarray(betas_j) - betas_t).max()),
        'cam': float(np.abs(np.asarray(cam_j) - cam_t).max()),
    }

    # vertex delta through a shared SMPL (isolates the network conversion)
    smpl_pkl = os.path.join(cfg.SMPL_MODEL_DIR, 'SMPL_NEUTRAL.pkl')
    if os.path.isfile(smpl_pkl):
        from tuch_tpu.assets import load_smpl_pkl
        from tuch_tpu.models.smpl import smpl_forward
        smpl = load_smpl_pkl(smpl_pkl)
        v_j = smpl_forward(smpl, betas_j, rotmat_j[:, 1:], rotmat_j[:, :1],
                           pose2rot=False).vertices
        v_t = smpl_forward(smpl, jnp.asarray(betas_t),
                           jnp.asarray(rotmat_t[:, 1:]),
                           jnp.asarray(rotmat_t[:, :1]),
                           pose2rot=False).vertices
        worst['vertices(shared-SMPL)'] = float(
            np.abs(np.asarray(v_j) - np.asarray(v_t)).max())
    else:
        print(f'(SMPL assets absent at {smpl_pkl}: vertex delta skipped; '
              'network-output parity only)')

    ok = True
    for name, err in worst.items():
        tol = VERT_TOL if name.startswith('vertices') else PARAM_TOL
        status = 'OK' if err < tol else 'FAIL'
        ok &= err < tol
        print(f'[network-vs-torch] {name}: max |delta| = {err:.2e}  '
              f'[{status}]')
    return 0 if ok else 1


def _pin_parity_precision():
    """Parity comparisons measure CONVERSION error, not backend math.

    The TPU default decomposes fp32 matmuls/convs through bf16 passes;
    measured on the synthetic gate (tools/parity_synth.py): vertices
    differ ~1.0e-3 from torch-CPU under the TPU default vs 2.4e-7 at
    HIGHEST precision on CPU. Pin HIGHEST so a real-checkpoint run on
    the TPU backend is judged against the 1e-3 bar on conversion
    fidelity alone.
    """
    import jax
    jax.config.update('jax_default_matmul_precision', 'highest')


def main(argv=None) -> int:
    _pin_parity_precision()
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', default=None,
                   help='reference .pt checkpoint (or converted .npz)')
    p.add_argument('--img', nargs='*', default=None)
    p.add_argument('--ref_dump', default=None,
                   help='parity.npz from tools/parity_dump.py dump')
    args = p.parse_args(argv)

    from tuch_tpu import config as cfg

    if args.ref_dump and not os.path.isfile(args.ref_dump):
        # an explicitly-requested gate must not silently degrade to the
        # weaker checks on a typo'd path
        print(f'ERROR: --ref_dump {args.ref_dump} does not exist')
        return 2
    if args.ref_dump:
        if not args.checkpoint:
            print('--ref_dump needs --checkpoint'); return 2
        if not os.path.isfile(args.checkpoint):
            # same explicit-path contract as below: never degrade a
            # typo'd path to a crash or a silent skip
            print(f'ERROR: --checkpoint {args.checkpoint} does not exist')
            return 2
        return check_against_dump(args)

    if args.checkpoint and not os.path.isfile(args.checkpoint):
        # an explicitly-requested gate must not silently degrade to SKIP
        # on a typo'd path (same contract as --ref_dump above)
        print(f'ERROR: --checkpoint {args.checkpoint} does not exist')
        return 2
    ckpt = args.checkpoint or cfg.SPIN_MODEL_CHECKPOINT
    if ckpt and os.path.isfile(ckpt):
        try:
            import torch  # noqa: F401
        except ImportError:
            print('SKIP: torch unavailable; to run the full gate, dump '
                  'reference outputs where torch works:\n'
                  f'  python tools/parity_dump.py dump --checkpoint {ckpt} '
                  '--images <imgs> --out parity.npz\n'
                  'then here:\n'
                  f'  python -m tuch_tpu.cli.parity --checkpoint {ckpt} '
                  '--ref_dump parity.npz')
            return 0
        args.checkpoint = ckpt
        return check_network_vs_torch(args)

    print('SKIP: no reference checkpoint found '
          f'(looked for {ckpt or cfg.SPIN_MODEL_CHECKPOINT}).\n'
          'When the reference assets exist (scripts/fetch_data.sh of the '
          'reference), run:\n'
          '  python -m tuch_tpu.cli.parity '
          '--checkpoint data/spin_model_checkpoint.pt --img <imgs>\n'
          'or the authoritative full-pipeline gate:\n'
          '  python tools/parity_dump.py dump --checkpoint '
          'data/tuch_model_checkpoint.pt --images <imgs> --out parity.npz\n'
          '  python -m tuch_tpu.cli.parity --checkpoint '
          'data/tuch_model_checkpoint.pt --ref_dump parity.npz')
    return 0


if __name__ == '__main__':
    sys.exit(main())
