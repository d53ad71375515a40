"""Per-component device timing of the SMPLify-DC body-stage iteration.

The bench's step table (docs/PERFORMANCE.md) attributes ~30 ms/iter to
"SMPL forward + loss grad + Adam (fused)" without splitting it further.
At --fast_profile that residual is ~40% of the train step, so this tool
times each piece in isolation on the live chip: N dependent calls chained
inside one jitted lax.scan (carry perturbation defeats CSE; one sync at
the end) so the ~35 ms tunnel RTT is amortized per docs/PERFORMANCE.md
"The baseline, pinned".

Usage: python tools/profile_step.py [--batch 64] [--chain 10]
Writes one JSON object to stdout.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, '.')


def timed_scan(fn, args, chain, perturb, reps=3):
    """Median seconds per call of fn(*args), chained `chain` times.

    perturb(carry, out) -> new leading arg; the first element of args is
    the carry seed. fn must return something whose leaves depend on all
    the compute of interest.
    """
    import jax
    from tuch_tpu.utils.timing import fetch_sync

    def run(first, rest):
        def body(carry, _):
            out = fn(carry, *rest)
            return perturb(carry, out), out
        _, outs = jax.lax.scan(body, first, None, length=chain)
        return outs

    runj = jax.jit(run)
    first, rest = args[0], args[1:]
    fetch_sync(runj(first, rest))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch_sync(runj(first, rest))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--chain', type=int, default=10)
    ap.add_argument('--candidate_k', type=int, default=984)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from tuch_tpu.losses import smplify as L
    from tuch_tpu.losses.prior import gmm_prior_nll
    from tuch_tpu.models.smpl import smpl_forward
    from tuch_tpu.ops import contact as contact_ops

    B = args.batch
    problem = bench.build_problem(B, 6890, 10)
    model, prior, ca = problem['model'], problem['prior'], problem['ca']
    pose = jnp.asarray(problem['init_pose'])
    betas = jnp.zeros((B, 10))
    cam_t = jnp.asarray(problem['cam_t'])
    cc = jnp.asarray(problem['cc'])
    kp = jnp.asarray(problem['kp'])
    gt_contact = jnp.asarray(problem['gt_contact'])
    ignore = jnp.zeros(B, bool)
    has_dc = jnp.ones(B, bool)
    j2d, conf = kp[..., :2], kp[..., 2]

    out0 = smpl_forward(model, betas, pose[:, 3:], pose[:, :3])
    verts0 = out0.vertices
    neighbors = L.contact_neighbors(verts0, ca)
    ext0, argmin0 = jax.block_until_ready(neighbors)

    res = {}

    # --- SMPL forward alone (fwd only) ---------------------------------
    def f_smpl(p):
        o = smpl_forward(model, betas, p[:, 3:], p[:, :3])
        return o.vertices
    res['smpl_forward_ms'] = 1e3 * timed_scan(
        lambda p: f_smpl(p), (pose,), args.chain,
        lambda p, v: p + 1e-6 * v[:, 0, :1].mean())

    # --- full body-stage loss grad, neighbors cached (the non-refresh
    # iteration minus Adam bookkeeping) ----------------------------------
    def body_loss(p):
        o = smpl_forward(model, betas, p[:, 3:], p[:, :3])
        return L.contact_fitting_loss(
            p[:, 3:], p[:, :3], betas, o.joints, o.vertices, cam_t, cc,
            j2d, conf, prior, ca, gt_contact, ignore, has_dc, 0.02,
            contact_loss_weight=2000.0, cached_neighbors=(ext0, argmin0))
    res['body_iter_grad_ms'] = 1e3 * timed_scan(
        lambda p: jax.grad(body_loss)(p), (pose,), args.chain,
        lambda p, g: p + 1e-6 * g)

    # --- the same WITHOUT the r2r region term (isolate its cost) --------
    def body_loss_nor2r(p):
        o = smpl_forward(model, betas, p[:, 3:], p[:, :3])
        reproj = L.reprojection_term(o.joints, cam_t, cc, j2d,
                                     conf).sum(-1)
        pp = gmm_prior_nll(prior, p[:, 3:])
        v2v = L.contact_distances(o.vertices, argmin0)
        inc = jax.lax.stop_gradient(v2v) < 0.02
        cb = L.push_pull_terms(ext0, v2v, inc)
        return (reproj + pp + 10.0 * cb).sum()
    res['body_iter_grad_no_r2r_ms'] = 1e3 * timed_scan(
        lambda p: jax.grad(body_loss_nor2r)(p), (pose,), args.chain,
        lambda p, g: p + 1e-6 * g)

    # --- r2r region term alone (value+grad wrt verts) -------------------
    def r2r(v):
        pm = contact_ops.region_pair_min_dists(
            v, ca.region_idx_a, ca.region_idx_b,
            ca.region_mask_a, ca.region_mask_b, geomask=ca.geomask)
        return (pm * gt_contact).sum()
    res['r2r_grad_ms'] = 1e3 * timed_scan(
        lambda v: jax.grad(r2r)(v), (verts0,), args.chain,
        lambda v, g: v + 1e-6 * g)

    # --- refresh costs ---------------------------------------------------
    def refresh_exact(v):
        e, a = L.contact_neighbors(v, ca)
        return e.astype(jnp.float32).sum() + a.astype(jnp.float32).sum()
    res['refresh_exact_ms'] = 1e3 * timed_scan(
        lambda v: (refresh_exact(v), v), (verts0,), 3,
        lambda v, o: v + 1e-9 * o[0])

    K = args.candidate_k
    def refresh_cand(v):
        e, a = L.contact_neighbors(v, ca, candidate_k=K,
                                   prev_exterior=ext0)
        return e.astype(jnp.float32).sum() + a.astype(jnp.float32).sum()
    res['refresh_candidate_k_ms'] = 1e3 * timed_scan(
        lambda v: (refresh_cand(v), v), (verts0,), args.chain,
        lambda v, o: v + 1e-9 * o[0])

    # --- masked nearest-vertex alone (runs every refresh) ---------------
    from tuch_tpu.ops import contact_pallas as cpk
    if cpk.pallas_available():
        def mmd(v):
            d2, am = cpk.masked_min_dist_pallas(
                v, ca.geomask.astype(jnp.uint8))
            return d2.sum() + am.astype(jnp.float32).sum()
        res['masked_min_ms'] = 1e3 * timed_scan(
            lambda v: (mmd(v), v), (verts0,), args.chain,
            lambda v, o: v + 1e-9 * o[0])

    for k in sorted(res):
        res[k] = round(res[k], 3)
    res['batch'] = B
    print(json.dumps(res))


if __name__ == '__main__':
    main()
