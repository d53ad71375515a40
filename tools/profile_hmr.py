"""Split HMR inference time: backbone vs IEF head vs SMPL forward.

bench.py reports one end-to-end imgs/s (backbone MFU derived from it);
this tool times the three stages separately with the same chained-scan
dispatch-amortized method (see docs/PERFORMANCE.md "The baseline,
pinned") so the MFU conversation points at the right stage.

Usage: python tools/profile_hmr.py [--batch 64] [--dtype bfloat16]
Prints one JSON object.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, '.')


def timed(runj, args, chain, reps=3):
    from tuch_tpu.utils.timing import fetch_sync
    fetch_sync(runj(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch_sync(runj(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--chain', type=int, default=20)
    ap.add_argument('--dtype', default='bfloat16',
                    choices=['float32', 'bfloat16'])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tuch_tpu import runtime as rt
    from tuch_tpu.models import hmr as hmr_mod
    from tuch_tpu.models.smpl import smpl_forward

    B, N = args.batch, args.chain
    runtime = rt.build_runtime(synthetic=True, img_res=224,
                               with_segments=False, with_hd=False,
                               with_contact=False)
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    hmr = hmr_mod.create_hmr(runtime.extras.mean_pose6d,
                             runtime.extras.mean_shape,
                             runtime.extras.mean_cam, dtype=dtype)
    variables = runtime.variables
    smpl = runtime.smpl
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(B, 224, 224, 3).astype(np.float32))

    backbone = hmr_mod.ResNet50(dtype=dtype, name='backbone')
    bb_vars = {'params': variables['params']['backbone'],
               'batch_stats': variables['batch_stats']['backbone']}

    def scan_over(fn, out0):
        @jax.jit
        def run(x):
            def body(carry, _):
                out = fn(x + carry[0])
                return (1e-12 * out.mean().astype(jnp.float32), out), None
            (eps, out), _ = jax.lax.scan(
                body, (jnp.float32(0.0), out0), None, length=N)
            return eps, out
        return run

    res = {'batch': B, 'dtype': args.dtype}

    # (a) backbone alone -> (B, 2048)
    fn_a = lambda x: backbone.apply(
        bb_vars, x, train=False).astype(jnp.float32)
    res['backbone_ms'] = 1e3 * timed(
        scan_over(fn_a, jnp.zeros((B, 2048))), (imgs,), N)

    # (b) full HMR (backbone + 3-iter IEF head) -> rotmat flattened
    def fn_b(x):
        rotmat, betas, cam = hmr.apply(variables, x, train=False)
        return rotmat.reshape(B, -1).astype(jnp.float32)
    res['hmr_ms'] = 1e3 * timed(
        scan_over(fn_b, jnp.zeros((B, 216))), (imgs,), N)

    # (c) HMR + SMPL forward -> vertices (the serving/eval program)
    def fn_c(x):
        rotmat, betas, cam = hmr.apply(variables, x, train=False)
        out = smpl_forward(smpl, betas, rotmat[:, 1:], rotmat[:, :1],
                           pose2rot=False)
        return out.vertices.astype(jnp.float32)
    nv = smpl.v_template.shape[0]
    res['hmr_smpl_ms'] = 1e3 * timed(
        scan_over(fn_c, jnp.zeros((B, nv, 3))), (imgs,), N)

    res['ief_head_ms'] = round(res['hmr_ms'] - res['backbone_ms'], 3)
    res['smpl_ms'] = round(res['hmr_smpl_ms'] - res['hmr_ms'], 3)
    for k in ('backbone_ms', 'hmr_ms', 'hmr_smpl_ms'):
        res[k] = round(res[k], 3)
    res['backbone_imgs_per_sec'] = round(1e3 * B / res['backbone_ms'], 1)
    res['e2e_imgs_per_sec'] = round(1e3 * B / res['hmr_smpl_ms'], 1)
    print(json.dumps(res))


if __name__ == '__main__':
    main()
