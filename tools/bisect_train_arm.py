"""Run ONE bench train-step arm in a fresh process (device faults poison
the client, so arms must be isolated to bisect). Usage:
    python tools/bisect_train_arm.py <arm>
arms: exact | no_smplify | bare | fast | mixed | mixed_compact | mixed_fast
      | mixed_compact_smplify | mixed_compact_reg
"""

import sys
import tempfile

sys.path.insert(0, '.')


def main():
    arm = sys.argv[1]
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from tuch_tpu import config as cfgmod, runtime as rt
    from tuch_tpu.train.module import TrainState, make_train_step

    B = 64
    runtime = rt.build_runtime(synthetic=True, img_res=224)

    spec = {
        'exact': dict(run_smplify=True, w=1e-5),
        'no_smplify': dict(run_smplify=False, w=1e-5),
        'bare': dict(run_smplify=False, w=0.0),
        'fast': dict(run_smplify=True, w=1e-5, refresh=4, cand_k=1024),
        'mixed': dict(run_smplify=True, w=1e-5, mixed=True),
        'mixed_compact': dict(run_smplify=True, w=1e-5, capacity=B // 2,
                              mixed=True),
        'mixed_fast': dict(run_smplify=True, w=1e-5, refresh=4,
                           cand_k=1024, capacity=B // 2, mixed=True),
        'mixed_compact_smplify': dict(run_smplify=True, w=1e-5,
                                      s_capacity=B // 2, mixed=True),
        'mixed_compact_reg': dict(run_smplify=True, w=1e-5,
                                  r_capacity=B // 2, mixed=True),
    }[arm]

    options = cfgmod.TrainConfig(
        name='bisect', log_dir=tempfile.mkdtemp(), batch_size=B,
        img_res=224, run_smplify=spec['run_smplify'],
        num_smplify_iters=10,
        use_contact_in_the_loop=spec['run_smplify'],
        smplify_exterior_refresh=spec.get('refresh', 1),
        contact_candidate_k=spec.get('cand_k', 0),
        smplify_contact_capacity=spec.get('s_capacity',
                                          spec.get('capacity', 0)),
        regressor_contact_capacity=spec.get('r_capacity',
                                            spec.get('capacity', 0)),
        contact_loss_weight=spec['w'], num_workers=0)
    options.finalize()
    optimizer = optax.adam(options.lr)
    step = make_train_step(runtime.hmr, runtime.assets, options, optimizer,
                           len(runtime.contact_classes))
    params = runtime.variables['params']
    state = TrainState(params=params,
                       batch_stats=runtime.variables['batch_stats'],
                       opt_state=optimizer.init(params),
                       fits=jnp.zeros((B, 82)), rng=jax.random.PRNGKey(0),
                       step=jnp.asarray(0, jnp.int32))
    rng = np.random.RandomState(0)
    P = len(runtime.contact_classes)
    batch = {
        'img': jnp.asarray(rng.randn(B, 224, 224, 3).astype(np.float32)
                           * 0.1),
        'keypoints': jnp.asarray(np.concatenate(
            [rng.uniform(-0.8, 0.8, (B, 49, 2)), np.ones((B, 49, 1))],
            -1).astype(np.float32)),
        'pose': jnp.asarray((rng.randn(B, 72) * 0.1).astype(np.float32)),
        'betas': jnp.asarray((rng.randn(B, 10) * 0.2).astype(np.float32)),
        'contact_vec': jnp.asarray(
            (rng.rand(B, P) > 0.6).astype(np.float32)),
        'pose_3d': jnp.asarray(np.concatenate(
            [rng.randn(B, 24, 3) * 0.2, np.ones((B, 24, 1))],
            -1).astype(np.float32)),
        'has_smpl': jnp.zeros(B), 'has_pgt_smpl': jnp.zeros(B),
        'has_disc_contact': jnp.ones(B), 'has_gt_kpts': jnp.ones(B),
        'has_pose_3d': jnp.zeros(B), 'is_flipped': jnp.zeros(B),
        'rot_angle': jnp.zeros(B),
        'sample_index': jnp.arange(B, dtype=jnp.int32),
        'dataset_id': jnp.zeros(B, jnp.int32),
        'fits_index': jnp.arange(B, dtype=jnp.int32),
    }
    if spec.get('mixed'):
        half = (np.arange(B) % 2 == 0).astype(np.float32)
        batch['has_pgt_smpl'] = jnp.asarray(half)
        batch['has_disc_contact'] = jnp.asarray(1.0 - half)

    import time
    t0 = time.time()
    compiled = jax.jit(step).lower(state, batch).compile()
    print(f'ARM {arm}: compiled in {time.time() - t0:.1f}s', flush=True)
    if '--compile-only' in sys.argv:
        return
    t0 = time.time()
    out = compiled(state, batch)
    jax.block_until_ready(out)
    print(f'ARM {arm}: OK (executed in {time.time() - t0:.1f}s)')


if __name__ == '__main__':
    main()
