"""Execute the full parity gate with a synthetic checkpoint, end to end.

The real-checkpoint north star (BASELINE.md: demo vertices <=1e-3 of the
PyTorch reference) cannot run in this container -- the checkpoint hosts are
unreachable (docs/fetch_attempt_r03.log). This tool executes the SAME
pipeline with the only substitution being the weights themselves:

  flax variables -> cli/export_torch exporter -> reference-format .pt ->
  reference HMR graph re-executed with functional torch
  (models/torch_ref.py, mirroring tuch/models/hmr.py:132-171) ->
  compare against our Flax forward, through a shared SMPL to vertices.

Every conversion step a real checkpoint would traverse is traversed; what
is NOT covered is only whether the published .pt files contain surprises
(dtype quirks, key aliases) beyond the reference saver's documented format.

Writes docs/parity_synth_r{N}.json. Exit code 0 iff all deltas in-tol.

Usage: python tools/parity_synth.py [--round 3] [--batch 2]
"""

import argparse
import json
import os
import os.path as osp
import sys
import tempfile

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

VERT_TOL = 1e-3     # BASELINE.md north star
PARAM_TOL = 2e-4    # network outputs (fp32 conv/BN accumulation noise)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--round', type=int, default=3)
    ap.add_argument('--batch', type=int, default=2)
    args = ap.parse_args()

    import torch  # noqa: F401  (required: the gate executes real torch)
    import jax
    # the container sitecustomize force-registers the axon TPU backend;
    # parity must compare like-for-like fp32 (torch runs on CPU), and on
    # any backend the matmul/conv precision must be HIGHEST -- the TPU
    # default decomposes fp32 convs through bf16 passes, which is backend
    # truncation, not conversion error (measured: vertices 1.0e-3 on TPU
    # default vs 1e-5-level on CPU)
    os.environ['JAX_PLATFORMS'] = 'cpu'
    try:
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass
    jax.config.update('jax_default_matmul_precision', 'highest')
    import jax.numpy as jnp
    from tuch_tpu import runtime as rt
    from tuch_tpu.models import convert as cv
    from tuch_tpu.models import hmr as hmr_mod
    from tuch_tpu.models.smpl import smpl_forward
    from tuch_tpu.models.torch_ref import torch_hmr_forward
    from tuch_tpu.utils.rotations import rot6d_to_rotmat

    runtime = rt.build_runtime(synthetic=True, img_res=224,
                               with_segments=False, with_hd=False,
                               with_contact=False)
    means = (runtime.extras.mean_pose6d, runtime.extras.mean_shape,
             runtime.extras.mean_cam)

    # 1. round-trip through the reference checkpoint format
    pt_path = osp.join(tempfile.mkdtemp(prefix='parity_synth_'), 'synth.pt')
    cv.save_torch_checkpoint(runtime.variables, pt_path, mean_params=means,
                             epoch=0, batch_idx=0, batch_size=None,
                             dataset_perm=None, total_step_count=0)

    # 2. reload the .pt exactly like cli/parity does
    ckpt = torch.load(pt_path, map_location='cpu', weights_only=False)
    sd_np = {k: cv._to_numpy(v) for k, v in ckpt['model'].items()}
    variables = cv.convert_torch_checkpoint(pt_path)

    rng = np.random.RandomState(0)
    x = (rng.randn(args.batch, 224, 224, 3) * 0.5).astype(np.float32)

    # 3. reference graph (functional torch) vs our Flax model
    pose6d_t, betas_t, cam_t = torch_hmr_forward(
        sd_np, x, sd_np['init_pose'].reshape(-1),
        sd_np['init_shape'].reshape(-1), sd_np['init_cam'].reshape(-1))
    model = hmr_mod.create_hmr(*means)
    rotmat_j, betas_j, cam_j = model.apply(
        {'params': variables['params'],
         'batch_stats': variables['batch_stats']},
        jnp.asarray(x), train=False)
    rotmat_t = np.asarray(rot6d_to_rotmat(jnp.asarray(pose6d_t))).reshape(
        -1, 24, 3, 3)

    # 4. to vertices through the shared SMPL (full 6890-vert topology)
    v_j = smpl_forward(runtime.smpl, betas_j, rotmat_j[:, 1:],
                       rotmat_j[:, :1], pose2rot=False).vertices
    v_t = smpl_forward(runtime.smpl, jnp.asarray(betas_t),
                       jnp.asarray(rotmat_t[:, 1:]),
                       jnp.asarray(rotmat_t[:, :1]),
                       pose2rot=False).vertices

    deltas = {
        'rotmat': float(np.abs(np.asarray(rotmat_j) - rotmat_t).max()),
        'betas': float(np.abs(np.asarray(betas_j) - betas_t).max()),
        'cam': float(np.abs(np.asarray(cam_j) - cam_t).max()),
        'vertices': float(np.abs(np.asarray(v_j) - np.asarray(v_t)).max()),
    }
    tols = {'rotmat': PARAM_TOL, 'betas': PARAM_TOL, 'cam': PARAM_TOL,
            'vertices': VERT_TOL}
    ok = all(deltas[k] < tols[k] for k in deltas)
    report = {
        'pipeline': 'flax -> export_torch .pt -> functional-torch reference '
                    'graph -> shared SMPL vertices',
        'weights': 'synthetic (real checkpoints unreachable: '
                   'docs/fetch_attempt_r03.log)',
        'batch': args.batch, 'img_res': 224, 'smpl_verts': 6890,
        'max_abs_deltas': {k: float(f'{v:.3e}') for k, v in deltas.items()},
        'tolerances': tols,
        'pass': bool(ok),
    }
    out = osp.join(REPO, 'docs', f'parity_synth_r{args.round:02d}.json')
    with open(out, 'w') as f:
        json.dump(report, f, indent=2)
    for k, v in deltas.items():
        print(f'[parity-synth] {k}: max |delta| = {v:.2e} '
              f'[{"OK" if v < tols[k] else "FAIL"}]')
    print(json.dumps({'pass': ok, 'out': out}))
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
