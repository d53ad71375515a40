"""train: TUCH training entry point.

Reference-compatible port of /root/reference/train.py: wires datasets, the
(frozen-init) HMR regressor, SMPL, SMPLify-DC, the regressor loss, and the
trainer. Flags match configs/train_options.py; extra TPU-native flags:
--synthetic (hermetic run), --mesh_dp/--mesh_cp (device mesh),
--compute_dtype bfloat16.

  python -m tuch_tpu.cli.train --name tuch_run --ds_names dsc mtp \
      --ds_composition 0.5 0.5 --run_smplify
  python -m tuch_tpu.cli.train --name sanity --synthetic \
      --num_epochs 1 --batch_size 4
"""

import numpy as np


def main(argv=None):
    from tuch_tpu import config as cfgmod
    from tuch_tpu import runtime as rt
    from tuch_tpu.data.dataset import TuchDataset, synthetic_db
    from tuch_tpu.data.mixed import MixedDataset
    from tuch_tpu.train.trainer import Trainer
    from tuch_tpu.viz.renderer import Renderer

    options = cfgmod.parse_config(cfgmod.TrainConfig, argv)
    runtime = rt.build_runtime(
        options, synthetic=options.synthetic or None,
        num_verts=options.synthetic_num_verts or None,
        img_res=options.img_res)

    variables = runtime.variables
    if options.pretrained_checkpoint:
        from tuch_tpu.train.checkpoint import load_variables
        variables = load_variables(options.pretrained_checkpoint, variables)

    P = len(runtime.contact_classes)
    if options.synthetic:
        import tempfile
        d = tempfile.mkdtemp()
        n = max(4 * options.batch_size, 8)
        db = synthetic_db(n, img_dir=d, seed=options.seed,
                          num_contact_classes=P)
        if options.synthetic_projected_kpts:
            from tuch_tpu.data.dataset import project_db_keypoints
            db = project_db_keypoints(db, runtime.assets.smpl,
                                      seed=options.seed)
        names = ['dsc_lsp', 'mtp']
        datasets = [TuchDataset(options, nm, data=db, img_dir=d,
                                dataset_id=i, num_contact_classes=P)
                    for i, nm in enumerate(names)]
        train_ds = MixedDataset(options, 'train', datasets=datasets)
        train_ds.dataset_list = names
        val_ds = TuchDataset(options, 'mtp', data=db, img_dir=d,
                             use_augmentation=False, split='val',
                             num_contact_classes=P)
    else:
        train_ds = MixedDataset(options, 'train', num_contact_classes=P)
        val_ds = MixedDataset(options, 'val',
                              num_contact_classes=P).datasets[0]

    j_reg = None
    try:
        from tuch_tpu import config as cfg
        j_reg = np.load(cfg.JOINT_REGRESSOR_H36M)
    except Exception:
        pass

    renderer = Renderer(img_res=options.img_res,
                        faces=np.asarray(runtime.smpl.faces),
                        contact_classes=runtime.contact_classes,
                        contact_csig=runtime.extras.contact_csig)

    trainer = Trainer(options, runtime.hmr, variables, runtime.assets,
                      train_ds, val_ds, j_regressor_h36m=j_reg,
                      renderer=renderer)
    trainer.fit()


if __name__ == '__main__':
    main()
