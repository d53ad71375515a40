"""preprocess: offline dataset extraction CLI.

Reference-compatible port of /root/reference/preprocess_datasets.py:
  python -m tuch_tpu.cli.preprocess --train_files_tuch   # dsc + mtp train
  python -m tuch_tpu.cli.preprocess --val_files_tuch     # mtp val
  python -m tuch_tpu.cli.preprocess --test_files_tuch    # 3dpw + 3dhp test
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--train_files_tuch', action='store_true',
                   help='extract DSC (df/lsp/lspet) + MTP train sets')
    p.add_argument('--val_files_tuch', action='store_true',
                   help='extract MTP val set')
    p.add_argument('--test_files_tuch', action='store_true',
                   help='extract 3DPW + MPI-INF-3DHP test sets')
    p.add_argument('--datasets', nargs='+', default=None,
                   help='explicit subset: dsc_df dsc_lsp dsc_lspet mtp '
                        '3dpw mpi-inf-3dhp')
    p.add_argument('--extract_img', action='store_true',
                   help='also extract 3DHP video frames (needs cv2)')
    args = p.parse_args(argv)

    from tuch_tpu.data.preprocess.dsc import dsc_extract
    from tuch_tpu.data.preprocess.mtp import mtp_extract
    from tuch_tpu.data.preprocess.pw3d import pw3d_extract
    from tuch_tpu.data.preprocess.mpi_inf_3dhp import mpi_inf_3dhp_extract

    todo = set(args.datasets or [])
    if args.train_files_tuch:
        todo |= {'dsc_df', 'dsc_lsp', 'dsc_lspet', 'mtp'}
    if args.val_files_tuch:
        todo |= {'mtp_val'}
    if args.test_files_tuch:
        todo |= {'3dpw_test', 'mpi-inf-3dhp_test'}

    for name in sorted(todo):
        print(f'=== extracting {name} ===')
        if name.startswith('dsc_'):
            dsc_extract(name.split('_', 1)[1])
        elif name == 'mtp':
            mtp_extract(mode='train')
        elif name == 'mtp_val':
            mtp_extract(mode='val')
        elif name.startswith('3dpw'):
            pw3d_extract(split=name.split('_')[-1]
                         if '_' in name else 'test')
        elif name.startswith('mpi-inf-3dhp'):
            mode = 'test' if name.endswith('test') else 'train'
            mpi_inf_3dhp_extract(mode=mode, extract_img=args.extract_img)
        else:
            print('unknown dataset', name)


if __name__ == '__main__':
    main()
