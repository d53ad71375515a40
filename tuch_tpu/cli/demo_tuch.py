"""demo_tuch: single-image (or directory) TUCH inference.

Reference-compatible port of /root/reference/demo_tuch.py: bbox from an
OpenPose json or bbox json -> crop -> HMR -> SMPL -> export .obj meshes
(front/+-60 deg), camera pkl, and a rendered front+side png. The forward is
one jitted program; with --synthetic it runs hermetically on the synthetic
body/weights (no downloads needed).

Usage:
  python -m tuch_tpu.cli.demo_tuch --checkpoint ckpt.pt --img in.jpg \
      --openpose in_keypoints.json --outdir out/
"""

import argparse
import glob
import json
import os
import os.path as osp

import numpy as np

from tuch_tpu import constants
from tuch_tpu.data import transforms as T
from tuch_tpu.viz.renderer import (Renderer, rotation_about, save_camera_pkl,
                                   save_obj, save_png)


def bbox_from_openpose(openpose_file, rescale=1.2, detection_thresh=0.2):
    """Center+scale from OpenPose detections (demo_tuch.py:51-65)."""
    with open(openpose_file) as f:
        keypoints = json.load(f)['people'][0]['pose_keypoints_2d']
    keypoints = np.reshape(np.array(keypoints), (-1, 3))
    valid = keypoints[:, -1] > detection_thresh
    valid_keypoints = keypoints[valid][:, :-1]
    center = valid_keypoints.mean(axis=0)
    bbox_size = (valid_keypoints.max(axis=0)
                 - valid_keypoints.min(axis=0)).max()
    return center, bbox_size / 200.0 * rescale


def bbox_from_json(bbox_file):
    """Center+scale from [x, y, w, h] bbox json (demo_tuch.py:67-78)."""
    with open(bbox_file) as f:
        bbox = np.array(json.load(f)['bbox'], np.float32)
    return T.bbox_center_scale(bbox)


def process_image(img_file, bbox_file, openpose_file, input_res=224):
    """Read + crop + normalize one image -> (img01, norm_img[1, H, W, 3])."""
    from tuch_tpu.data.dataset import _read_image
    img = _read_image(img_file)
    if bbox_file is None and openpose_file is None:
        center, scale = T.full_image_center_scale(*img.shape[:2])
    elif bbox_file is not None:
        center, scale = bbox_from_json(bbox_file)
    else:
        center, scale = bbox_from_openpose(openpose_file)
    crop = T.crop_image(img, center, scale, (input_res, input_res)) / 255.0
    norm = T.normalize_image(crop)[None]
    return crop.astype(np.float32), norm


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', default=None,
                   help='HMR checkpoint (.pt torch or .npz pytree)')
    p.add_argument('--img', type=str, default=None,
                   help='input image or directory (optional with '
                        '--synthetic: a deterministic test image is used)')
    p.add_argument('--bbox', type=str, default=None)
    p.add_argument('--openpose', type=str, default=None)
    p.add_argument('--outfile', type=str, default=None)
    p.add_argument('--outdir', type=str, default='out')
    p.add_argument('--spin_img_dir', type=str,
                   default='data/images_spin_fit',
                   help='with --stack: dir of rendered SPIN fits')
    p.add_argument('--eft_img_dir', type=str,
                   default='data/images_eft_fit',
                   help='with --stack: dir of rendered EFT fits')
    p.add_argument('--stack', type=lambda x: x in ('true', 'True'),
                   default=False,
                   help='append the SPIN/EFT fit renders of the same '
                        'image to the output strip (demo_tuch.py:212-216)')
    p.add_argument('--synthetic', action='store_true',
                   help='synthetic body/weights (no assets required)')
    args = p.parse_args(argv)
    if args.img is None:
        if not args.synthetic:
            p.error('--img is required unless --synthetic is set')
        # Hermetic mode: write a deterministic 224x224 test image so the
        # full read->crop->normalize->render path still runs end to end.
        from PIL import Image
        rng = np.random.RandomState(0)
        yy, xx = np.mgrid[0:224, 0:224].astype(np.float32) / 223.0
        img = np.stack([yy, xx, 0.5 * (yy + xx)], axis=-1)
        img = (255 * np.clip(img + 0.05 * rng.randn(224, 224, 3), 0, 1)
               ).astype(np.uint8)
        os.makedirs(args.outdir, exist_ok=True)
        args.img = osp.join(args.outdir, 'synthetic_input.png')
        Image.fromarray(img).save(args.img)

    import jax
    import jax.numpy as jnp
    from tuch_tpu import runtime as rt
    from tuch_tpu.models.smpl import smpl_forward
    from tuch_tpu.utils.projection import weak_perspective_to_translation

    runtime = rt.build_runtime(synthetic=args.synthetic or None,
                               with_segments=False, with_hd=False,
                               with_contact=False)
    variables = runtime.variables
    if args.checkpoint:
        from tuch_tpu.train.checkpoint import load_variables
        variables = load_variables(args.checkpoint, variables)

    hmr, smpl = runtime.hmr, runtime.smpl

    @jax.jit
    def forward(norm_img):
        rotmat, betas, cam = hmr.apply(variables, norm_img, train=False)
        out = smpl_forward(smpl, betas, rotmat[:, 1:], rotmat[:, :1],
                           pose2rot=False)
        cam_t = weak_perspective_to_translation(
            cam, constants.FOCAL_LENGTH, constants.IMG_RES)
        return out.vertices, cam, cam_t

    renderer = Renderer(faces=np.asarray(smpl.faces))

    imgs = sorted(glob.glob(osp.join(args.img, '*'))
                  if osp.isdir(args.img) else [args.img])
    if args.openpose and osp.isdir(args.openpose):
        # pair by image stem, not by independent sort order: a missing
        # json or a stray file must fail loudly, not shift the pairing
        ops = []
        for img_path in imgs:
            stem = osp.splitext(osp.basename(img_path))[0]
            cands = (osp.join(args.openpose, stem + '_keypoints.json'),
                     osp.join(args.openpose, stem + '.json'))
            found = next((c for c in cands if osp.isfile(c)), None)
            if found is None:
                raise FileNotFoundError(
                    f'no openpose json for {img_path} (looked for '
                    f'{cands[0]} and {cands[1]})')
            ops.append(found)
    else:
        ops = [args.openpose] * len(imgs)

    os.makedirs(args.outdir, exist_ok=True)
    for idx, (img_path, op_path) in enumerate(zip(imgs, ops)):
        print('processing', img_path, op_path or '')
        img01, norm = process_image(img_path, args.bbox, op_path)
        verts, cam, cam_t = forward(jnp.asarray(norm))
        verts = np.asarray(verts[0])
        cam_t0 = np.asarray(cam_t[0])

        if args.outfile is None:
            stem = osp.splitext(osp.basename(img_path))[0]
        elif len(imgs) > 1:
            # --outfile with a directory input: suffix per image so the
            # outputs don't silently overwrite each other
            stem = f'{args.outfile}_{idx:03d}'
        else:
            stem = args.outfile
        out = osp.join(args.outdir, stem)

        # OBJ exports: front and +-60 deg about y, x-flipped 180 like the
        # reference (demo_tuch.py:148-163).
        rot_x = rotation_about([1, 0, 0], 180)
        save_obj(out + '.obj', verts @ rot_x.T, smpl.faces)
        for deg, suffix in ((60, '_r60'), (300, '_r300')):
            rot_y = rotation_about([0, 1, 0], deg)
            save_obj(out + suffix + '.obj', (verts @ rot_x.T) @ rot_y.T,
                     smpl.faces)

        save_camera_pkl(out + '_camera.pkl', np.asarray(cam), cam_t0)

        front = renderer.render_over(verts, cam_t0, img01)
        side = renderer.render_rotated(verts, cam_t0, 90.0,
                                       image=np.ones_like(img01))
        save_png(out + '_img_in.png', img01)
        strip = np.concatenate([img01, front, side], axis=1)
        if not args.stack:
            save_png(out + '.png', strip)
        else:
            # comparison strip with prior SPIN/EFT renders of the same
            # image (demo_tuch.py:212-216); skip cleanly when absent
            from PIL import Image
            tiles = [strip]
            for d in (args.eft_img_dir, args.spin_img_dir):
                fp = osp.join(d, stem + '.png')
                if osp.isfile(fp):
                    with Image.open(fp) as im:
                        t = np.asarray(im.convert('RGB'),
                                       np.float32) / 255.0
                    if t.shape[0] != strip.shape[0]:
                        ratio = strip.shape[0] / t.shape[0]
                        im2 = Image.fromarray(
                            (t * 255).astype(np.uint8)).resize(
                            (int(t.shape[1] * ratio), strip.shape[0]))
                        t = np.asarray(im2, np.float32) / 255.0
                    tiles.append(t)
                else:
                    print('stack: missing', fp)
            # the reference overwrites <stem>.png with the stacked
            # strip (demo_tuch.py:215-216)
            save_png(out + '.png', np.concatenate(tiles, axis=1))
        print('saved results to', out)


if __name__ == '__main__':
    main()
