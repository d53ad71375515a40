"""One-off MFU headroom experiments for the serving path (r4).

Questions this answers on the real chip, in one single-client process:
  1. Where does the B=256 bf16 e2e time go (backbone / IEF head / SMPL)?
     bench.py's `hmr_backbone_mfu_*` divides backbone FLOPs by E2E time,
     so head+SMPL overhead reads as "backbone inefficiency".
  2. Does XLA:TPU lower int8 convolutions to the MXU int8 path, and at
     what speed vs bf16?  (v5e int8 peak is 2x bf16.)  Measured on the
     three conv shapes that dominate ResNet-50 time.
  3. Does a bigger batch (512) move e2e MFU?
  4. (r4, arm `vit`) What MFU does the opt-in ViT backbone
     (models/vit.py) reach?  Transformer blocks are matmul-shaped, so
     this is the measured answer to "can serving pass the ~23% conv
     ceiling" (docs/PERFORMANCE.md "MFU headroom probes").

Usage: python tools/mfu_experiments.py [--skip int8] > out.json
Prints one JSON object. Methodology: chained lax.scan with carry
perturbation + fetch_sync (docs/PERFORMANCE.md "Timing sync rule").
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, '.')


def timed_scan(fn, x, out0, n=20, reps=3):
    """Median per-step seconds of fn chained n times under one jit."""
    import jax
    import jax.numpy as jnp
    from tuch_tpu.utils.timing import fetch_sync

    @jax.jit
    def run(x):
        def body(carry, _):
            eps, out = carry
            out = fn(x + eps)
            return (1e-12 * out.astype(jnp.float32).mean(), out), None
        (eps, out), _ = jax.lax.scan(
            body, (jnp.float32(0.0), out0), None, length=n)
        return eps, out

    fetch_sync(run(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch_sync(run(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / n


def int8_conv_ratio(res, B):
    """bf16-vs-int8 time for the dominant ResNet-50 conv shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.RandomState(0)
    # (H, W, Cin, Cout, kh, kw, stride): the three shape classes that
    # carry most of the FLOPs (stage-2/3 bottleneck 3x3s and 1x1s).
    shapes = [
        ('l2_3x3', 28, 28, 128, 128, 3, 3, 1),
        ('l3_3x3', 14, 14, 256, 256, 3, 3, 1),
        ('l3_1x1', 14, 14, 1024, 256, 1, 1, 1),
    ]
    for name, H, W, Ci, Co, kh, kw, s in shapes:
        xf = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
        wf = jnp.asarray(rng.randn(kh, kw, Ci, Co).astype(np.float32))
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))

        def conv_bf16(x, w=wf.astype(jnp.bfloat16)):
            return lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w, (s, s), pad,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)

        xi = jnp.clip(jnp.round(xf * 16), -127, 127).astype(jnp.int8)
        wi = jnp.clip(jnp.round(wf * 16), -127, 127).astype(jnp.int8)

        def conv_int8(x, w=wi):
            return lax.conv_general_dilated(
                x, w, (s, s), pad,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.int32)

        out = {}
        t16 = timed_scan(conv_bf16, xf,
                         jnp.zeros((B, H // s, W // s, Co), jnp.float32))
        out[f'{name}_bf16_ms'] = round(1e3 * t16, 4)
        try:
            # int8 carry-perturbation must stay int8: re-quantize inside.
            def conv_int8_q(x):
                return conv_int8(jnp.clip(x, -127, 127).astype(jnp.int8))
            ti8 = timed_scan(
                lambda x: conv_int8_q(x),
                xi.astype(jnp.float32),
                jnp.zeros((B, H // s, W // s, Co), jnp.int32))
            out[f'{name}_int8_ms'] = round(1e3 * ti8, 4)
            out[f'{name}_int8_speedup'] = round(t16 / ti8, 3)
        except Exception as e:  # lowering not supported -> record why
            out[f'{name}_int8_error'] = f'{type(e).__name__}: {e}'[:200]
        res.update(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--skip', nargs='*', default=[])
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--vit_configs', nargs='*',
                    default=['vit_s16', 'vit_b16'],
                    help='ViT variants for the vit arm (vit_b16 cold-'
                         'compiles for >20 min through the tunnel; pass '
                         'vit_s16 alone for a bounded run)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tuch_tpu import runtime as rt
    from tuch_tpu.models import hmr as hmr_mod
    from tuch_tpu.models.smpl import smpl_forward

    res = {'device': str(jax.devices()[0]), 'batch': args.batch}
    B = args.batch

    runtime = rt.build_runtime(synthetic=True, img_res=224,
                               with_segments=False, with_hd=False,
                               with_contact=False)
    variables = runtime.variables
    smpl = runtime.smpl
    hmr = hmr_mod.create_hmr(runtime.extras.mean_pose6d,
                             runtime.extras.mean_shape,
                             runtime.extras.mean_cam, dtype=jnp.bfloat16)
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(B, 224, 224, 3).astype(np.float32)
        * 0.5)

    if 'split' not in args.skip:
        backbone = hmr_mod.ResNet50(dtype=jnp.bfloat16, name='backbone')
        bb_vars = {'params': variables['params']['backbone'],
                   'batch_stats': variables['batch_stats']['backbone']}
        t_bb = timed_scan(
            lambda x: backbone.apply(bb_vars, x, train=False)
            .astype(jnp.float32), imgs, jnp.zeros((B, 2048)))
        t_hmr = timed_scan(
            lambda x: hmr.apply(variables, x, train=False)[0]
            .reshape(B, -1).astype(jnp.float32),
            imgs, jnp.zeros((B, 216)))

        def e2e(x):
            rotmat, betas, cam = hmr.apply(variables, x, train=False)
            out = smpl_forward(smpl, betas, rotmat[:, 1:], rotmat[:, :1],
                               pose2rot=False)
            return out.vertices.astype(jnp.float32)
        nv = smpl.v_template.shape[0]
        t_e2e = timed_scan(e2e, imgs, jnp.zeros((B, nv, 3)))
        res.update({
            'backbone_ms': round(1e3 * t_bb, 3),
            'hmr_ms': round(1e3 * t_hmr, 3),
            'e2e_ms': round(1e3 * t_e2e, 3),
            'ief_head_ms': round(1e3 * (t_hmr - t_bb), 3),
            'smpl_ms': round(1e3 * (t_e2e - t_hmr), 3),
            'backbone_only_mfu': round(
                B * 4.09e9 / t_bb / 1.97e14, 4),
            'e2e_mfu_bench_defn': round(
                B * 4.09e9 / t_e2e / 1.97e14, 4),
        })
        print(json.dumps(res), file=sys.stderr, flush=True)

    if 'b512' not in args.skip:
        imgs512 = jnp.asarray(
            np.random.RandomState(1).randn(512, 224, 224, 3)
            .astype(np.float32) * 0.5)
        backbone = hmr_mod.ResNet50(dtype=jnp.bfloat16, name='backbone')
        bb_vars = {'params': variables['params']['backbone'],
                   'batch_stats': variables['batch_stats']['backbone']}
        t = timed_scan(
            lambda x: backbone.apply(bb_vars, x, train=False)
            .astype(jnp.float32), imgs512, jnp.zeros((512, 2048)), n=10)
        res['backbone_b512_ms'] = round(1e3 * t, 3)
        res['backbone_b512_mfu'] = round(512 * 4.09e9 / t / 1.97e14, 4)
        print(json.dumps(res), file=sys.stderr, flush=True)

    if 'vit' not in args.skip:
        from tuch_tpu.models import vit as vit_mod
        for name in args.vit_configs:
            vit = vit_mod.create_vit(name, dtype=jnp.bfloat16)
            vparams = vit.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 224, 224, 3)))
            width = vit_mod.VIT_CONFIGS[name][0]
            t = timed_scan(
                lambda x, v=vit, p=vparams: v.apply(p, x, train=False),
                imgs, jnp.zeros((B, width)), n=10)
            flops = vit_mod.vit_fwd_flops(name, img_res=224)
            res[f'{name}_backbone_ms'] = round(1e3 * t, 3)
            res[f'{name}_backbone_mfu'] = round(
                B * flops / t / 1.97e14, 4)
            # fused-vs-unfused attention A/B (VERDICT r04 #2): same
            # model, the env switch forces the jnp reference attention
            # (HBM logits tensor) at trace time
            os.environ['TUCH_DISABLE_FUSED_MHA'] = '1'
            try:
                t_unf = timed_scan(
                    lambda x, v=vit, p=vparams: v.apply(p, x,
                                                        train=False),
                    imgs, jnp.zeros((B, width)), n=10)
            finally:
                os.environ.pop('TUCH_DISABLE_FUSED_MHA', None)
            res[f'{name}_backbone_ms_unfused_attn'] = round(1e3 * t_unf,
                                                            3)
            res[f'{name}_backbone_mfu_unfused_attn'] = round(
                B * flops / t_unf / 1.97e14, 4)
            res[f'{name}_fused_attention_speedup'] = round(t_unf / t, 3)
            # e2e: full HMR (ViT backbone + IEF head) + SMPL, the same
            # boundary as `e2e_mfu_bench_defn` above.
            vhmr = hmr_mod.create_hmr(
                runtime.extras.mean_pose6d, runtime.extras.mean_shape,
                runtime.extras.mean_cam, dtype=jnp.bfloat16,
                backbone=name)
            vvars = hmr_mod.init_hmr(vhmr, jax.random.PRNGKey(0),
                                     img_res=64)

            def e2e_vit(x, m=vhmr, v=vvars):
                rotmat, betas, cam = m.apply(v, x, train=False)
                out = smpl_forward(smpl, betas, rotmat[:, 1:],
                                   rotmat[:, :1], pose2rot=False)
                return out.vertices.astype(jnp.float32)
            nv = smpl.v_template.shape[0]
            t_e2e = timed_scan(e2e_vit, imgs, jnp.zeros((B, nv, 3)), n=10)
            res[f'{name}_e2e_ms'] = round(1e3 * t_e2e, 3)
            res[f'{name}_e2e_mfu'] = round(
                B * flops / t_e2e / 1.97e14, 4)
            print(json.dumps(res), file=sys.stderr, flush=True)

    if 'int8' not in args.skip:
        int8_conv_ratio(res, min(B, 256))

    print(json.dumps(res))


if __name__ == '__main__':
    main()
