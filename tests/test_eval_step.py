"""Eval pipeline: the jitted per-batch step (eval/evaluate.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tuch_tpu import runtime as rt
from tuch_tpu.eval.evaluate import make_eval_step, report_with_contact_subsets


@pytest.fixture(scope='module')
def eval_runtime():
    return rt.build_runtime(synthetic=True, num_verts=170, img_res=64)


def _j_reg(runtime):
    # 17-joint H36M-style regressor stand-in from the model's own table
    return np.asarray(runtime.smpl.J_regressor)[:17]


def test_eval_step_3dpw_gendered(eval_runtime):
    runtime = eval_runtime
    B = 4
    rng = np.random.RandomState(0)
    batch = {
        'img': jnp.asarray(rng.randn(B, 64, 64, 3).astype(np.float32)
                           * 0.1),
        'betas': jnp.asarray(rng.randn(B, 10).astype(np.float32) * 0.2),
        'pose': jnp.asarray((rng.randn(B, 72) * 0.1).astype(np.float32)),
        'gender': jnp.asarray(np.array([0, 1, 0, 1], np.int32)),
    }
    step = make_eval_step(runtime.hmr, runtime.smpl, None, None,
                          _j_reg(runtime), '3dpw')
    mpjpe, pa, rotmat, betas, cam, pred_j = step(runtime.variables, batch)
    mpjpe, pa = np.asarray(mpjpe), np.asarray(pa)
    assert mpjpe.shape == (B,) and np.all(np.isfinite(mpjpe))
    # Procrustes alignment minimizes L2, so PA-MPJPE <= MPJPE + noise
    assert np.all(pa <= mpjpe + 1e-5)
    assert rotmat.shape == (B, 24, 3, 3)


def test_eval_step_3dhp_uses_gt_joints(eval_runtime):
    runtime = eval_runtime
    B = 2
    rng = np.random.RandomState(1)
    batch = {
        'img': jnp.asarray(rng.randn(B, 64, 64, 3).astype(np.float32)
                           * 0.1),
        'pose_3d': jnp.asarray(np.concatenate(
            [rng.randn(B, 24, 3) * 0.2, np.ones((B, 24, 1))],
            -1).astype(np.float32)),
    }
    step = make_eval_step(runtime.hmr, runtime.smpl, None, None,
                          _j_reg(runtime), 'mpi-inf-3dhp')
    mpjpe, pa, *_ = step(runtime.variables, batch)
    assert np.all(np.isfinite(np.asarray(mpjpe)))
    assert np.all(np.asarray(pa) <= np.asarray(mpjpe) + 1e-5)


def test_report_contact_subsets_partition():
    mp = np.array([0.05, 0.06, 0.07, 0.08])
    pa = mp * 0.5
    cnc = np.array([0.001, np.inf, 0.5, 0.002])  # contact/none/unclear/contact
    out = report_with_contact_subsets(mp, pa, cnc)
    assert out['n_contact'] == 2 and out['n_no_contact'] == 1
    assert out['n_unclear'] == 1
    np.testing.assert_allclose(out['mpjpe_contact'],
                               1000 * (0.05 + 0.08) / 2)
    np.testing.assert_allclose(out['mpjpe'], 1000 * mp.mean())


def test_eval_cli_result_file_dump(tmp_path, monkeypatch):
    """--result_file writes the predictions npz (reference eval.py:206-215
    dumps to out/<file>)."""
    monkeypatch.chdir(tmp_path)
    from tuch_tpu.cli.eval import main as eval_main
    eval_main(['--synthetic', '--synthetic_num_verts', '170',
               '--dataset', '3dpw', '--batch_size', '4',
               '--synthetic_samples', '8', '--num_workers', '0',
               '--result_file', 'res.npz'])
    d = np.load(tmp_path / 'out' / 'res.npz')
    # reference npz schema: (N, 72) axis-angle (eval.py:157-160, 213)
    assert d['pose'].shape[1:] == (72,)
    assert d['mpjpe'].shape == (8,)
