"""Process-level smokes for the demo CLIs at toy scale.

The demo entry points (demo_tuch, demo_smplify_dc) were previously only
driven manually; these tests pin their artifact sets and the
reference-compatible output locations (demo images land in the resolved
log dir like /root/reference/demo_smplify_dc.py:176 unless --out_dir
overrides).
"""

import glob
import os

import pytest


@pytest.mark.slow
def test_demo_tuch_cli_synthetic(tmp_path):
    # demo_tuch keeps the reference's own flag surface (fixed 224 input,
    # full topology) -- no toy-scale escape hatches, so this runs the
    # real demo path end to end
    from tuch_tpu.cli.demo_tuch import main as demo_main
    out = str(tmp_path / 'demo')
    demo_main(['--synthetic', '--outdir', out])
    produced = {os.path.basename(p)
                for p in glob.glob(os.path.join(out, '*'))}
    # reference artifact set per image: obj front/+-60deg, camera pkl,
    # rendered png (demo_tuch.py:148-218)
    assert {'synthetic_input.obj', 'synthetic_input_r60.obj',
            'synthetic_input_r300.obj', 'synthetic_input_camera.pkl',
            'synthetic_input.png'} <= produced


@pytest.mark.slow
def test_demo_smplify_dc_cli_synthetic(tmp_path):
    from tuch_tpu.cli.demo_smplify_dc import main as demo_main
    demo_main(['--name', 'dcsmoke', '--log_dir', str(tmp_path),
               '--synthetic', '--synthetic_num_verts', '170',
               '--img_res', '64', '--num_images', '2',
               '--num_smplify_iters', '2'])
    # renders land in the RESOLVED log dir (log_dir/name), reference
    # demo_smplify_dc.py:176 semantics
    out = tmp_path / 'dcsmoke'
    for i in range(2):
        assert (out / f'{i:04d}_fit.png').exists()
        assert (out / f'{i:04d}_opti.png').exists()


def test_demo_smplify_dc_out_dir_override(tmp_path):
    from tuch_tpu.cli.demo_smplify_dc import main as demo_main
    override = tmp_path / 'renders'
    demo_main(['--name', 'dcsmoke2', '--log_dir', str(tmp_path / 'logs'),
               '--synthetic', '--synthetic_num_verts', '170',
               '--img_res', '64', '--num_images', '1',
               '--num_smplify_iters', '1', '--out_dir', str(override)])
    assert (override / '0000_fit.png').exists()
