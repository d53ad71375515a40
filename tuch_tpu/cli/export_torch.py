"""export_torch: write a trained checkpoint as a reference-loadable .pt.

The inverse of the torch->flax converter: takes an orbax checkpoint dir
(as written by train/checkpoint.py) or an .npz pytree, and saves a
`{'model': state_dict}` torch pickle with the reference's exact key
names (tuch/utils/saver.py:58-94), so models trained here drop into the
reference implementation's demo/eval/train --resume unchanged.

Usage:
  python -m tuch_tpu.cli.export_torch --checkpoint out/tuch/checkpoints/<dir> \
      --out tuch_tpu_model.pt [--mean_params data/essentials/spin/smpl_mean_params.npz]
"""

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True,
                   help='orbax checkpoint dir (train output) or .npz '
                        'pytree')
    p.add_argument('--out', required=True, help='output .pt path')
    p.add_argument('--mean_params', default=None,
                   help='smpl_mean_params.npz to embed as the '
                        'init_pose/shape/cam buffers (default: '
                        'config.SMPL_MEAN_PARAMS if present)')
    args = p.parse_args(argv)

    from tuch_tpu import config as cfg
    from tuch_tpu.models.convert import save_torch_checkpoint

    step = 0
    if os.path.isdir(args.checkpoint):
        import orbax.checkpoint as ocp
        restored = ocp.PyTreeCheckpointer().restore(args.checkpoint)
        variables = {'params': restored['params'],
                     'batch_stats': restored.get('batch_stats', {})}
        step = int(restored.get('step', 0))
    else:
        from tuch_tpu.train.checkpoint import load_pretrained_params
        variables = load_pretrained_params(args.checkpoint)

    mean_path = args.mean_params or (
        cfg.SMPL_MEAN_PARAMS if os.path.isfile(cfg.SMPL_MEAN_PARAMS)
        else None)
    means = None
    if mean_path:
        from tuch_tpu.assets import load_mean_params
        means = load_mean_params(mean_path)
    else:
        print('WARNING: no smpl_mean_params.npz found/given -- the '
              'init_pose/init_shape/init_cam buffers are absent, so the '
              "reference's STRICT state-dict load (train --resume, "
              'saver.py:86) will fail; demo/eval (strict=False) still '
              'work. Pass --mean_params to embed them.')

    # the reference's load_checkpoint unconditionally reads these keys
    # (tuch/utils/saver.py:91-95) -- include them all for train --resume
    save_torch_checkpoint(variables, args.out, mean_params=means,
                          epoch=0, batch_idx=0, batch_size=None,
                          dataset_perm=None, total_step_count=step)
    print(f'wrote reference-format checkpoint: {args.out} '
          f'(step {step}, mean params: '
          f'{"embedded" if means else "absent"})')


if __name__ == '__main__':
    main()
