"""demo_smplify_dc: standalone SMPLify-DC fitting demo.

Reference-compatible port of /root/reference/demo_smplify_dc.py: a SPIN
forward initializes, SMPLify-DC refines with discrete-contact losses, and
init vs optimized fits are rendered front + rotated per image. The whole
batch of images is fitted in ONE jitted two-stage scan instead of a
per-image python loop.

  python -m tuch_tpu.cli.demo_smplify_dc --synthetic --num_images 2 \
      --num_smplify_iters 20
"""

import os

import numpy as np


def main(argv=None):
    # full reference flag set (smplify_dc_options.py) via the dataclass
    # parser: --name/--log_dir/--batch_size/--num_workers/augmentation
    # factors/--use_contact_in_the_loop/... all accepted; the demo's own
    # extras (--num_images/--out_dir/--synthetic) live on the dataclass.
    from tuch_tpu import config as cfgmod
    args = cfgmod.parse_config(cfgmod.SMPLifyDemoConfig, argv)

    import jax
    import jax.numpy as jnp
    from tuch_tpu import constants
    from tuch_tpu import runtime as rt
    from tuch_tpu.data.dataset import TuchDataset, synthetic_db
    from tuch_tpu.fitting import smplify_dc as S
    from tuch_tpu.models.smpl import smpl_forward
    from tuch_tpu.utils.projection import weak_perspective_to_translation
    from tuch_tpu.utils.rotations import rotmat_to_aa
    from tuch_tpu.viz.renderer import Renderer, save_png

    runtime = rt.build_runtime(
        synthetic=args.synthetic or None,
        num_verts=args.synthetic_num_verts or None)
    variables = runtime.variables
    if args.checkpoint:
        from tuch_tpu.train.checkpoint import load_variables
        variables = load_variables(args.checkpoint, variables)

    P = len(runtime.contact_classes)
    if args.synthetic:
        import tempfile
        d = tempfile.mkdtemp()
        db = synthetic_db(args.num_images, img_dir=d, seed=0,
                          num_contact_classes=P)
        # pass the config so --img_res reaches the crop pipeline (the
        # renderer below uses the same resolution; options=None silently
        # pinned the dataset at 224 while the tiles were img_res)
        ds = TuchDataset(args, args.ds_names[0], data=db, img_dir=d,
                         use_augmentation=False)
    else:
        ds = TuchDataset(args, args.ds_names[0], use_augmentation=False)

    B = min(args.num_images, len(ds))
    samples = [ds.get(i) for i in range(B)]
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    hmr, smpl = runtime.hmr, runtime.smpl

    @jax.jit
    def spin_init(imgs):
        rotmat, betas, cam = hmr.apply(variables, imgs, train=False)
        cam_t = weak_perspective_to_translation(
            cam, constants.FOCAL_LENGTH, args.img_res)
        pose_aa = jnp.nan_to_num(rotmat_to_aa(rotmat)).reshape(-1, 72)
        return pose_aa, betas, cam_t

    imgs = jnp.asarray(batch['img'])
    init_pose, init_betas, init_cam_t = spin_init(imgs)

    kp_px = batch['keypoints'].copy()
    kp_px[..., :2] = 0.5 * args.img_res * (kp_px[..., :2] + 1.0)
    cam_center = np.full((B, 2), args.img_res / 2.0, np.float32)

    cfg = S.SMPLifyConfig(
        num_iters=args.num_smplify_iters,
        use_contact=args.use_contact_in_the_loop,
        # the reference demo constructs SMPLifyDC WITHOUT euclthres, so
        # it runs at the class default 0.0 (smplifydc.py:37); training
        # is what passes config.euclthres=0.02 (train.py:76)
        euclthres=0.0,
        contact_loss_weight=args.contact_in_the_loop_loss_weight,
        collect_trajectory=True)
    res = jax.jit(lambda *a: S.smplify_dc(
        smpl, runtime.assets.prior, runtime.assets.contact, *a,
        config=cfg))(
        init_pose, init_betas, init_cam_t, jnp.asarray(cam_center),
        jnp.asarray(kp_px), jnp.asarray(batch['contact_vec']),
        jnp.zeros(B, bool),
        jnp.asarray(batch['has_disc_contact']).astype(bool),
        jnp.asarray(batch['has_gt_kpts']).astype(bool))

    # Render init vs optimized, front + 90 deg (demo_smplify_dc.py:154-177)
    renderer = Renderer(img_res=args.img_res, faces=np.asarray(smpl.faces),
                        contact_classes=runtime.contact_classes,
                        contact_csig=runtime.extras.contact_csig)
    # reference behavior: demo images land in the resolved log dir
    # (log_dir/name, demo_smplify_dc.py:176); --out_dir overrides
    out_dir = args.out_dir or args.log_dir
    os.makedirs(out_dir, exist_ok=True)
    mean = np.asarray(constants.IMG_NORM_MEAN, np.float32)
    std = np.asarray(constants.IMG_NORM_STD, np.float32)
    init_out = smpl_forward(smpl, init_betas, init_pose[:, 3:],
                            init_pose[:, :3])
    # hoist the big device->host transfers out of the per-image loop
    # (trajectory alone is (T, B, V, 3))
    traj_np = np.asarray(res.trajectory)
    cam_t_np = np.asarray(res.camera_translation)
    for i in range(B):
        img01 = np.clip(batch['img'][i] * std + mean, 0, 1)
        cv = batch['contact_vec'][i]
        tiles = [
            renderer.render_over(np.asarray(init_out.vertices[i]),
                                 np.asarray(init_cam_t[i]), img01),
            renderer.render_over(np.asarray(res.vertices[i]),
                                 cam_t_np[i], img01, contact_vec=cv),
            renderer.render_rotated(np.asarray(res.vertices[i]),
                                    cam_t_np[i], 90.0, contact_vec=cv),
        ]
        save_png(os.path.join(out_dir, f'{i:04d}_fit.png'),
                 np.concatenate(tiles, axis=1))
        traj_img = renderer.visu_smplifycontactopti(
            traj_np, cam_t_np, [img01] * B, sample=i)
        save_png(os.path.join(out_dir, f'{i:04d}_opti.png'), traj_img)
    print('reprojection loss:',
          np.asarray(res.reprojection_loss.mean(axis=-1)))
    print('saved fits to', out_dir)


if __name__ == '__main__':
    main()
