"""Pallas kernel tests in interpreter mode (run on CPU in CI; the compiled
path is exercised on real TPU hardware by bench.py and the loss stack)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tuch_tpu.ops import contact, contact_pallas as cpk

from tests.test_contact import unit_cube


@pytest.mark.skipif(not cpk._HAS_PALLAS, reason='pallas unavailable')
def test_winding_kernel_interpret_matches_jnp():
    v, f = unit_cube()
    B = 2
    verts = jnp.asarray(np.tile(v[None], (B, 1, 1)))
    pts = jnp.asarray(np.array(
        [[[0, 0, 0], [2, 0, 0], [0.2, 0.1, -0.3], [0, 1.2, 0],
          [0.49, 0.49, 0.49], [-0.7, 0, 0]]], np.float32).repeat(B, 0))
    wn_k = cpk.winding_numbers_pallas(pts, verts, jnp.asarray(f),
                                      tq=128, tf=256, interpret=True)
    wn_j = contact.winding_numbers_same_tris(pts, verts, jnp.asarray(f),
                                             block_f=8)
    np.testing.assert_allclose(np.asarray(wn_k), np.asarray(wn_j),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(wn_k)[0, :2], [1.0, 0.0],
                               atol=1e-4)


@pytest.mark.skipif(not cpk._HAS_PALLAS, reason='pallas unavailable')
def test_masked_min_kernel_interpret_matches_bruteforce(rng):
    B, V = 2, 192
    verts = rng.randn(B, V, 3).astype(np.float32)
    geo = rng.rand(V, V) > 0.3
    np.fill_diagonal(geo, False)
    d2, arg = cpk.masked_min_dist_pallas(
        jnp.asarray(verts), jnp.asarray(geo.astype(np.uint8)),
        tn=128, tm=128, interpret=True)
    d2, arg = np.asarray(d2), np.asarray(arg)
    full = ((verts[:, :, None] - verts[:, None]) ** 2).sum(-1)
    full[:, ~geo] = np.inf
    # The packed-key kernel orders distances with 10 mantissa bits (see
    # _masked_min_kernel): near-exact ties may pick a neighbor within
    # 2^-10 relative of the true minimum; the reported d2 is the exact
    # distance to the picked neighbor.
    np.testing.assert_allclose(d2, full.min(2), rtol=2 ** -10, atol=1e-7)
    got = np.take_along_axis(full, arg[..., None], 2)[..., 0]
    np.testing.assert_allclose(got, d2, rtol=1e-6)
    np.testing.assert_allclose(got, full.min(2), rtol=2 ** -10, atol=1e-7)
    # argmin must never point at a geodesically-banned vertex
    assert geo[np.arange(V)[None].repeat(B, 0), arg].all()


def test_atan2_polynomial_accuracy(rng):
    y = rng.randn(1000).astype(np.float32) * 3
    x = rng.randn(1000).astype(np.float32) * 3
    approx = np.asarray(cpk._atan2(jnp.asarray(y), jnp.asarray(x)))
    exact = np.arctan2(y, x)
    np.testing.assert_allclose(approx, exact, atol=3e-6)
    # axis cases
    cases_y = np.array([0.0, 0.0, 1.0, -1.0, 0.0], np.float32)
    cases_x = np.array([1.0, -1.0, 0.0, 0.0, 0.0], np.float32)
    out = np.asarray(cpk._atan2(jnp.asarray(cases_y), jnp.asarray(cases_x)))
    np.testing.assert_allclose(out[:4],
                               np.arctan2(cases_y, cases_x)[:4], atol=1e-6)


@pytest.mark.skipif(not cpk._HAS_PALLAS, reason='pallas unavailable')
def test_winding_hier_interpret_decisions(tiny_smpl):
    """Experimental hierarchical winding: in/out decisions must match the
    exact path on a posed body (values are approximate by design)."""
    from tuch_tpu.ops import winding_hier as wh
    model, _ = tiny_smpl
    v0 = np.asarray(model.v_template)
    rng = np.random.RandomState(0)
    verts = jnp.asarray(v0[None] * np.array([1.0, 0.6, 1.0],
                                            np.float32)
                        + 0.02 * rng.randn(2, *v0.shape).astype(np.float32))
    clusters = wh.build_winding_clusters(v0, np.asarray(model.faces),
                                         cluster_size=128, tile_q=128)
    wn_h = wh.winding_numbers_hier(verts, clusters, num_near=4,
                                   interpret=True)
    wn_e = contact.winding_numbers_same_tris(
        verts, verts, jnp.asarray(model.faces), block_f=64)
    flips = np.mean((np.asarray(wn_h) <= 0.99)
                    != (np.asarray(wn_e) <= 0.99))
    assert flips < 0.02


@pytest.mark.skipif(not cpk._HAS_PALLAS, reason='pallas unavailable')
def test_winding_affine_kernel_matches_jnp():
    """MXU-offloaded affine-form kernel: winding + in/out decisions must
    match the subtraction-form reference on the hard self-winding case
    (every point is a corner of its incident faces)."""
    from tuch_tpu import assets
    model, _ = assets.synthetic_smpl(num_verts=170, seed=0)
    V = model.v_template.shape[0]
    rng = np.random.RandomState(0)
    posed = np.asarray(model.v_template)[None] \
        + 0.02 * rng.randn(2, V, 3).astype(np.float32)
    squashed = (np.asarray(model.v_template)
                * np.array([1, 0.02, 1], np.float32))[None]
    for verts in (posed, squashed):
        bv = jnp.asarray(verts)
        wn_a = cpk.winding_numbers_pallas_affine(
            bv, bv, jnp.asarray(model.faces), tq=128, tf=256,
            interpret=True)
        wn_j = contact.winding_numbers_same_tris(
            bv, bv, jnp.asarray(model.faces), block_f=64)
        # winding values agree well inside the 0.99-threshold margin...
        np.testing.assert_allclose(np.asarray(wn_a), np.asarray(wn_j),
                                   atol=0.02)
        # ...and every in/out decision is identical
        np.testing.assert_array_equal(np.asarray(wn_a) <= 0.99,
                                      np.asarray(wn_j) <= 0.99)


@pytest.mark.skipif(not cpk._HAS_PALLAS, reason='pallas unavailable')
def test_winding_rigid_motion_invariance():
    """Winding numbers are a topological quantity: rigid motions of the
    (points, mesh) pair must not change them (guards against any
    origin-dependent term sneaking into the kernel math)."""
    v, f = unit_cube()
    rng = np.random.RandomState(3)
    pts = np.array([[0, 0, 0], [0.3, -0.2, 0.4], [2, 0, 0],
                    [0.49, 0.49, 0.49], [-3, 1, 2]], np.float32)
    wn0 = cpk.winding_numbers_pallas(jnp.asarray(pts[None]),
                                     jnp.asarray(v[None]),
                                     jnp.asarray(f), tq=128, tf=256,
                                     interpret=True)
    for trial in range(3):
        aa = rng.randn(3) * 2.0
        angle = np.linalg.norm(aa)
        axis = aa / angle
        K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R = (np.eye(3) + np.sin(angle) * K
             + (1 - np.cos(angle)) * K @ K).astype(np.float32)
        t = rng.randn(3).astype(np.float32) * 5.0
        wn = cpk.winding_numbers_pallas(
            jnp.asarray((pts @ R.T + t)[None]),
            jnp.asarray((v @ R.T + t)[None]),
            jnp.asarray(f), tq=128, tf=256, interpret=True)
        np.testing.assert_allclose(np.asarray(wn), np.asarray(wn0),
                                   atol=5e-4, err_msg=f'trial {trial}')


@pytest.mark.skipif(not cpk._HAS_PALLAS, reason='pallas unavailable')
def test_masked_min_quantization_contract(rng):
    """The packed-key kernel's documented contract: the SELECTED
    neighbor's true distance is within 2^-10 relative of the true
    minimum, even with adversarial near-ties."""
    B, V = 1, 256
    verts = rng.randn(B, V, 3).astype(np.float32)
    # adversarial: rows 0..7 get two allowed neighbors at nearly
    # identical distances (relative gap ~1e-4, inside the tie window)
    for i in range(8):
        d = 0.05 * (i + 1)
        verts[0, 100 + i] = verts[0, i] + [d, 0, 0]
        verts[0, 120 + i] = verts[0, i] + [d * (1 + 1e-4), 0, 0]
    geomask = np.ones((V, V), bool)
    np.fill_diagonal(geomask, False)
    d2_k, arg_k = cpk.masked_min_dist_pallas(
        jnp.asarray(verts), jnp.asarray(geomask.astype(np.uint8)),
        tn=128, tm=128, interpret=True)
    # brute force truth
    diff = verts[0][:, None] - verts[0][None]
    d2_true = (diff ** 2).sum(-1)
    d2_true[~geomask] = np.inf
    true_min = d2_true.min(axis=1)
    # the kernel returns the exact distance of its SELECTED index
    sel = np.asarray(arg_k[0])
    sel_d2 = d2_true[np.arange(V), sel]
    rel = (np.sqrt(sel_d2) - np.sqrt(true_min)) / np.sqrt(true_min)
    assert rel.max() <= 2 ** -10, rel.max()


# ---------------------------------------------------------------------------
# One-hot MXU gather / scatter-add kernels (ops/gather_pallas.py)
# ---------------------------------------------------------------------------

from tuch_tpu.ops import gather_pallas as gpk


@pytest.mark.skipif(not gpk._HAS_PALLAS, reason='pallas unavailable')
def test_gather_kernel_interpret_bitwise(rng):
    B, V, Q = 3, 300, 200
    vals = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, V, (B, Q)).astype(np.int32))
    got = gpk.gather_rows_pallas(vals, idx, tq=128, tm=128, interpret=True)
    ref = gpk.gather_rows_ref(vals, idx)
    # the bf16 hi/mid/lo split reconstructs fp32 exactly: bitwise equal
    assert (np.asarray(got) == np.asarray(ref)).all()


@pytest.mark.skipif(not gpk._HAS_PALLAS, reason='pallas unavailable')
def test_gather_kernel_padding_index_drops(rng):
    B, V, Q = 2, 130, 70   # forces both q and v padding at 128 tiles
    vals = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    idx_np = rng.randint(0, V, (B, Q)).astype(np.int32)
    idx_np[0, 5] = -1      # explicit "none" index -> zero row
    got = gpk.gather_rows_pallas(vals, jnp.asarray(idx_np),
                                 tq=128, tm=128, interpret=True)
    assert np.asarray(got)[0, 5].tolist() == [0.0, 0.0, 0.0]
    ref = np.asarray(gpk.gather_rows_ref(vals, jnp.asarray(
        np.maximum(idx_np, 0))))
    got = np.asarray(got)
    mask = idx_np >= 0
    assert (got[mask] == ref[mask]).all()


@pytest.mark.skipif(not gpk._HAS_PALLAS, reason='pallas unavailable')
def test_scatter_kernel_interpret_matches_at_add(rng):
    B, V, Q = 3, 300, 260
    contrib = jnp.asarray(rng.randn(B, Q, 3).astype(np.float32))
    # heavy collisions: only 40 distinct destinations
    idx = jnp.asarray(rng.randint(0, 40, (B, Q)).astype(np.int32))
    got = gpk.scatter_add_rows_pallas(contrib, idx, V,
                                      tn=128, tm=128, interpret=True)
    ref = gpk.scatter_add_rows_ref(contrib, idx, V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # untouched rows are exactly zero
    assert (np.asarray(got)[:, 40:] == 0).all()


def test_gather_rows_vjp_matches_take_along_axis(rng):
    """gather_rows' custom vjp == autodiff through take_along_axis (the
    jnp path runs here; the Pallas scatter path is equivalence-tested
    above and exercised on hardware)."""
    B, V, Q = 2, 50, 30
    vals = jnp.asarray(rng.randn(B, V, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, V, (B, Q)).astype(np.int32))
    w = jnp.asarray(rng.randn(B, Q, 3).astype(np.float32))

    def f(fn):
        return lambda v: (w * fn(v, idx)).sum()

    g_ours = jax.grad(f(gpk.gather_rows))(vals)
    g_ref = jax.grad(f(gpk.gather_rows_ref))(vals)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-6)
