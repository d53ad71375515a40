"""fit_eft: per-image exemplar fine-tuning driver.

Reference-compatible port of /root/reference/fit_eft.py:
  python -m tuch_tpu.cli.fit_eft --name eftrun --ds_names dsc_df \
      --sidx 0 --cbs 1000
Cluster sharding (--sidx/--cbs) + offline merge keep the reference
semantics (tuch/eft/fitter.py:52-55, merge_temp_files.py).
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--name', default='eft')
    # --dsname is the reference's spelling (eft_fitting_options.py:14)
    p.add_argument('--ds_names', '--dsname', nargs='+',
                   default=['dsc_df'])
    p.add_argument('--pretrained_checkpoint', default=None)
    p.add_argument('--sidx', type=int, default=0)
    p.add_argument('--cbs', type=int, default=None)
    p.add_argument('--max_steps', type=int, default=50)
    # reference defaults (eft_fitting_options.py:30-37); --kp_loss_weight /
    # --shape_prior_weight kept as aliases of the reference spellings
    p.add_argument('--lr', type=float, default=1e-5)
    p.add_argument('--keypoint_loss_weight', '--kp_loss_weight',
                   type=float, default=1.0)
    p.add_argument('--beta_loss_weight', '--shape_prior_weight',
                   type=float, default=1.0)
    p.add_argument('--contact_loss_weight', type=float, default=10.0)
    p.add_argument('--batch_size', type=int, default=1)
    p.add_argument('--num_workers', type=int, default=8)
    p.add_argument('--pin_memory', dest='pin_memory',
                   action='store_true', default=True)
    p.add_argument('--no_pin_memory', dest='pin_memory',
                   action='store_false')
    p.add_argument('--img_res', type=int, default=224)
    p.add_argument('--out_dir', default='out/eft')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--synthetic', action='store_true')
    p.add_argument('--synthetic_num_verts', type=int, default=0,
                   help='--synthetic body size override (0 = full)')
    p.add_argument('--merge', nargs='*', default=None,
                   help='merge shard files instead of fitting')
    p.add_argument('--auto_shard', action='store_true',
                   help='derive --sidx/--cbs from jax.process_index()/'
                        'process_count() -- the multi-host replacement '
                        'for hand-assigned cluster shards (reference '
                        'tuch/eft/fitter.py:52-55). Call '
                        'parallel.multihost.maybe_initialize_distributed '
                        'first (env JAX_COORDINATOR_ADDRESS etc.)')
    args = p.parse_args(argv)

    from tuch_tpu import runtime as rt
    from tuch_tpu.data.dataset import TuchDataset, synthetic_db
    from tuch_tpu.fitting.eft import EFTFitter, merge_shards
    from tuch_tpu.parallel.multihost import maybe_initialize_distributed

    if args.auto_shard:
        maybe_initialize_distributed()

    runtime = rt.build_runtime(
        args, synthetic=args.synthetic or None,
        num_verts=args.synthetic_num_verts or None,
        img_res=args.img_res)
    variables = runtime.variables
    if args.pretrained_checkpoint:
        from tuch_tpu.train.checkpoint import load_variables
        variables = load_variables(args.pretrained_checkpoint, variables)

    for dsname in args.ds_names:
        P = len(runtime.contact_classes)
        if args.synthetic:
            import tempfile
            d = tempfile.mkdtemp()
            db = synthetic_db(4, img_dir=d, seed=args.seed,
                              num_contact_classes=P)
            ds = TuchDataset(args, dsname, data=db, img_dir=d,
                             use_augmentation=False,
                             num_contact_classes=P)
        else:
            ds = TuchDataset(args, dsname, use_augmentation=False,
                             num_contact_classes=P)

        if args.merge is not None:
            import os
            os.makedirs(args.out_dir, exist_ok=True)
            merge_shards(args.merge, ds.data,
                         f'{args.out_dir}/{dsname}_eft_train.pt')
            continue

        if args.auto_shard:
            import jax
            args.sidx = jax.process_index()
            # same ceil split as parallel.multihost.process_shard, spelled
            # as the reference's (sidx, cbs) contract
            args.cbs = -(-len(ds) // jax.process_count())

        fitter = EFTFitter(args, dsname, ds, runtime.hmr, variables,
                           runtime.smpl, runtime.assets.contact,
                           out_dir=args.out_dir)
        fitter.fit()


if __name__ == '__main__':
    main()
