"""Numerical parity harness against the PyTorch reference.

BASELINE.md's north star includes "demo_tuch output vertices within 1e-3 of
the PyTorch reference". This tool has two halves:

  dump   -- run in an environment where the *reference* works (torch +
            smplx + the real assets): saves (input image tensor, SMPL
            params, vertices) for a set of images into an .npz.
  check  -- run here: feeds the same inputs through tuch_tpu (converted
            checkpoint + real SMPL assets) and reports max |delta| on
            rotmats, betas, camera, and vertices.

Usage:
  # reference side (their repo, their env):
  python tools/parity_dump.py dump --checkpoint data/tuch_model_checkpoint.pt \
      --images img1.jpg img2.jpg --out parity.npz
  # tuch_tpu side:
  python tools/parity_dump.py check --dump parity.npz \
      --checkpoint data/tuch_model_checkpoint.pt
"""

import argparse
import sys

import numpy as np


def dump(args):
    """Reference-side dump. Requires the reference's own environment; this
    function only standardizes the file format."""
    import torch  # noqa
    sys.path.insert(0, args.reference_root)
    from tuch.models.hmr import hmr  # type: ignore
    from tuch.models.smpl import SMPL  # type: ignore
    from configs import config  # type: ignore
    from tuch.utils.imutils import crop  # type: ignore
    import cv2

    model = hmr(config.SMPL_MEAN_PARAMS)
    ckpt = torch.load(args.checkpoint, map_location='cpu')
    model.load_state_dict(ckpt.get('model', ckpt), strict=False)
    model.eval()
    smpl = SMPL(config.SMPL_MODEL_DIR, batch_size=1, create_transl=False)

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    records = {}
    for i, img_path in enumerate(args.images):
        img = cv2.imread(img_path)[:, :, ::-1].copy()
        h, w = img.shape[:2]
        c = np.array([w // 2, h // 2])
        s = max(h, w) / 200.0
        cropped = crop(img, c, s, (224, 224)) / 255.0
        norm = ((cropped - mean) / std).astype(np.float32)
        with torch.no_grad():
            t = torch.from_numpy(norm.transpose(2, 0, 1))[None]
            rotmat, betas, cam = model(t)
            out = smpl(betas=betas, body_pose=rotmat[:, 1:],
                       global_orient=rotmat[:, 0].unsqueeze(1),
                       pose2rot=False)
        records[f'img{i}_norm'] = norm
        records[f'img{i}_rotmat'] = rotmat.numpy()
        records[f'img{i}_betas'] = betas.numpy()
        records[f'img{i}_cam'] = cam.numpy()
        records[f'img{i}_vertices'] = out.vertices.numpy()
    records['n'] = np.asarray(len(args.images))
    np.savez(args.out, **records)
    print('dumped', args.out)


def check(args):
    import jax.numpy as jnp
    from tuch_tpu import runtime as rt
    from tuch_tpu.models.smpl import smpl_forward
    from tuch_tpu.train.checkpoint import load_pretrained_params

    runtime = rt.build_runtime(synthetic=False, with_segments=False,
                               with_hd=False, with_contact=False)
    loaded = load_pretrained_params(args.checkpoint)
    variables = {'params': loaded['params'],
                 'batch_stats': loaded.get('batch_stats',
                                           runtime.variables['batch_stats'])}
    data = np.load(args.dump)
    n = int(data['n'])
    worst = {}
    for i in range(n):
        norm = data[f'img{i}_norm'][None]  # (1, 224, 224, 3) HWC
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
    for name, err in worst.items():
        status = 'OK' if err < (1e-3 if name == 'vertices' else 1e-2) \
            else 'FAIL'
        print(f'{name}: max |delta| = {err:.2e}  [{status}]')


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='cmd', required=True)
    d = sub.add_parser('dump')
    d.add_argument('--checkpoint', required=True)
    d.add_argument('--images', nargs='+', required=True)
    d.add_argument('--out', default='parity.npz')
    d.add_argument('--reference_root', default='.')
    c = sub.add_parser('check')
    c.add_argument('--dump', required=True)
    c.add_argument('--checkpoint', required=True)
    args = p.parse_args()
    if args.cmd == 'dump':
        dump(args)
    else:
        check(args)


if __name__ == '__main__':
    main()
