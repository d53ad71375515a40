"""Bisect the TPU device fault in the compacted contact path.

The mixed_compact / mixed_fast train arms fault with UNAVAILABLE on the
real chip (bisect_train_arm, 2026-08-18) while exact / fast pass. A fault
poisons the whole client, so each candidate op runs in its OWN process:
    python tools/bisect_compact_op.py <op> [--c 32]
ops: winding | masked_min | segments | neighbors | gather_bwd | r2r |
     compact_loss | compact_loss_nocache | reg_contact | reg_contact_nohd |
     neighbors_cand | reg_contact_cand | fit_fast
"""

import argparse
import sys

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('op')
    ap.add_argument('--c', type=int, default=32,
                    help='compacted sub-batch size')
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from tuch_tpu import runtime as rt
    from tuch_tpu.losses import smplify as L
    from tuch_tpu.losses.prior import create_gmm_prior
    from tuch_tpu import assets as assets_mod
    from tuch_tpu.models.smpl import smpl_forward_pose72

    C = args.c
    runtime = rt.build_runtime(synthetic=True, img_res=224)
    ca = runtime.assets.contact
    model = runtime.smpl
    prior = create_gmm_prior(assets_mod.synthetic_gmm_prior())

    rng = np.random.RandomState(0)
    pose = jnp.asarray((rng.randn(C, 72) * 0.2).astype(np.float32))
    betas = jnp.zeros((C, 10))
    out = smpl_forward_pose72(model, betas, pose)
    verts = out.vertices
    V = verts.shape[1]
    print(f'op={args.op} C={C} V={V}', flush=True)

    if args.op == 'winding':
        from tuch_tpu.ops import contact_pallas as cpk
        w = cpk.winding_numbers_pallas(verts, verts,
                                       jnp.asarray(model.faces))
        print('winding ok', float(w.sum()))
    elif args.op == 'masked_min':
        from tuch_tpu.ops import contact_pallas as cpk
        d2, am = cpk.masked_min_dist_pallas(verts,
                                            ca.geomask.astype(jnp.uint8))
        print('masked_min ok', float(d2.sum()), int(am.sum()))
    elif args.op == 'segments':
        ext = jnp.zeros((C, V), bool)
        ext2 = L.forgive_segment_interiors(ca.segment_tables, verts, ext)
        print('segments ok', int(ext2.sum()))
    elif args.op == 'neighbors':
        ext, am = L.contact_neighbors(verts, ca)
        print('neighbors ok', int(ext.sum()), int(am.sum()))
    elif args.op == 'gather_bwd':
        from tuch_tpu.ops.gather_pallas import gather_rows
        am = jnp.asarray(rng.randint(0, V, (C, V)), jnp.int32)

        def f(v):
            return L.zero_safe_norm(v - gather_rows(v, am)).sum()
        g = jax.grad(f)(verts)
        print('gather_bwd ok', float(g.sum()))
    elif args.op == 'r2r':
        from tuch_tpu.ops import contact as contact_ops

        def f(v):
            pm = contact_ops.region_pair_min_dists(
                v, ca.region_idx_a, ca.region_idx_b,
                ca.region_mask_a, ca.region_mask_b, geomask=ca.geomask)
            return pm.sum()
        g = jax.grad(f)(verts)
        print('r2r ok', float(g.sum()))
    elif args.op in ('compact_loss', 'compact_loss_nocache'):
        B = 2 * C
        poseB = jnp.asarray((rng.randn(B, 72) * 0.2).astype(np.float32))
        outB = smpl_forward_pose72(model, jnp.zeros((B, 10)), poseB)
        P = ca.region_idx_a.shape[0]
        gt_contact = jnp.asarray((rng.rand(B, P) > 0.6).astype(np.float32))
        ignore = jnp.asarray(np.arange(B) % 2 == 0)
        cidx = L.compact_take(~ignore, C)
        cached = None
        if args.op == 'compact_loss':
            cverts = outB.vertices[cidx]
            cached = jax.tree_util.tree_map(
                jax.lax.stop_gradient, L.contact_neighbors(cverts, ca))

        def f(p):
            o = smpl_forward_pose72(model, jnp.zeros((B, 10)), p)
            return L.contact_fitting_loss(
                p[:, 3:], p[:, :3], jnp.zeros((B, 10)), o.joints,
                o.vertices, jnp.tile(jnp.asarray([[0, 0, 20.0]]), (B, 1)),
                jnp.full((B, 2), 112.0),
                jnp.zeros((B, 49, 2)), jnp.ones((B, 49)), prior, ca,
                gt_contact, ignore, jnp.ones(B, bool), 0.02,
                contact_loss_weight=2000.0, cached_neighbors=cached,
                compact_idx=cidx)
        g = jax.grad(f)(poseB)
        print(args.op, 'ok', float(g.sum()))
    elif args.op == 'neighbors_cand':
        ext0 = jnp.asarray(rng.rand(C, V) > 0.1)
        ext, am = L.contact_neighbors(verts, ca, candidate_k=984,
                                      prev_exterior=ext0)
        print('neighbors_cand ok', int(ext.sum()), int(am.sum()))
    elif args.op == 'reg_contact_cand':
        from tuch_tpu.losses import regressor as R
        B = 2 * C
        poseB = jnp.asarray((rng.randn(B, 72) * 0.2).astype(np.float32))
        valid = jnp.asarray(np.arange(B) % 2 == 1, jnp.float32)

        def f(p):
            o = smpl_forward_pose72(model, jnp.zeros((B, 10)), p)
            loss, aux = R.contact_loss(o.vertices, ca, valid, 0.02,
                                       hd=runtime.assets.hd, hd_k=1024,
                                       candidate_k=1024, capacity=C)
            return loss
        g = jax.grad(f)(poseB)
        print('reg_contact_cand ok', float(g.sum()))
    elif args.op == 'fit_fast':
        from tuch_tpu.fitting.smplify_dc import SMPLifyConfig, smplify_dc
        B = 2 * C
        poseB = jnp.asarray((rng.randn(B, 72) * 0.2).astype(np.float32))
        P = ca.region_idx_a.shape[0]
        gt_contact = jnp.asarray((rng.rand(B, P) > 0.6).astype(np.float32))
        ignore = jnp.asarray(np.arange(B) % 2 == 0)
        cfg = SMPLifyConfig(num_iters=10, euclthres=0.02,
                            contact_loss_weight=2000.0,
                            exterior_refresh_every=4,
                            contact_candidate_k=1024,
                            contact_capacity=C)
        res = jax.jit(lambda p: smplify_dc(
            model, prior, ca, p, jnp.zeros((B, 10)),
            jnp.tile(jnp.asarray([[0, 0, 20.0]]), (B, 1)),
            jnp.full((B, 2), 112.0),
            jnp.concatenate([rng.uniform(0, 224, (B, 49, 2)),
                             np.ones((B, 49, 1))], -1).astype(np.float32),
            gt_contact, ignore, jnp.ones(B, bool), jnp.ones(B, bool),
            cfg))(poseB)
        print('fit_fast ok', float(res.pose.sum()))
    elif args.op in ('reg_contact', 'reg_contact_nohd'):
        from tuch_tpu.losses import regressor as R
        B = 2 * C
        poseB = jnp.asarray((rng.randn(B, 72) * 0.2).astype(np.float32))
        valid = jnp.asarray(np.arange(B) % 2 == 1, jnp.float32)
        hd = runtime.assets.hd if args.op == 'reg_contact' else None

        def f(p):
            o = smpl_forward_pose72(model, jnp.zeros((B, 10)), p)
            loss, aux = R.contact_loss(o.vertices, ca, valid, 0.02,
                                       hd=hd, hd_k=1024, capacity=C)
            return loss
        g = jax.grad(f)(poseB)
        print(args.op, 'ok', float(g.sum()))
    else:
        raise SystemExit(f'unknown op {args.op}')


if __name__ == '__main__':
    main()
