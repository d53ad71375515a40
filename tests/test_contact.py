"""Tests for the contact geometry stack: winding numbers on analytic meshes,
pairwise distances vs brute force, masked min, region signatures."""

import numpy as np
import jax
import jax.numpy as jnp

from tuch_tpu import assets
from tuch_tpu.ops import contact


def unit_cube():
    """Closed unit cube centered at origin, outward-oriented, 12 triangles."""
    v = np.array([[x, y, z] for x in (-.5, .5) for y in (-.5, .5)
                  for z in (-.5, .5)], dtype=np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2],        # x = -0.5 face
        [4, 6, 7], [4, 7, 5],        # x = +0.5
        [0, 4, 5], [0, 5, 1],        # y = -0.5
        [2, 3, 7], [2, 7, 6],        # y = +0.5
        [0, 2, 6], [0, 6, 4],        # z = -0.5
        [1, 5, 7], [1, 7, 3],        # z = +0.5
    ], dtype=np.int32)
    return v, f


def test_winding_cube_inside_outside():
    v, f = unit_cube()
    tris = v[f][None]  # (1, 12, 3, 3)
    pts = np.array([[[0, 0, 0], [0.2, 0.1, -0.3], [2, 0, 0],
                     [0, -1.2, 0.4], [0.49, 0.49, 0.49]]], np.float32)
    wn = np.asarray(contact.winding_numbers(jnp.asarray(pts),
                                            jnp.asarray(tris), block_f=8))
    np.testing.assert_allclose(wn[0, :2], 1.0, atol=1e-4)
    np.testing.assert_allclose(wn[0, 2:4], 0.0, atol=1e-4)
    np.testing.assert_allclose(wn[0, 4], 1.0, atol=1e-3)


def test_winding_matches_direct_solid_angles():
    v, f = unit_cube()
    tris = jnp.asarray(v[f][None])
    pts = jnp.asarray(np.random.RandomState(0).randn(1, 7, 3)
                      .astype(np.float32))
    direct = np.asarray(contact.solid_angles(pts, tris)).sum(-1) / (4 * np.pi)
    blocked = np.asarray(contact.winding_numbers(pts, tris, block_f=5))
    np.testing.assert_allclose(blocked, direct, atol=1e-5)


def test_winding_sphere(tiny_smpl):
    model, _ = tiny_smpl
    v = np.asarray(model.v_template)[None]
    f = np.asarray(model.faces)
    inner = jnp.asarray(v * 0.5)
    outer = jnp.asarray(v * 1.7)
    wn_in = np.asarray(contact.winding_numbers_same_tris(
        inner, jnp.asarray(v), jnp.asarray(f), block_f=128))
    wn_out = np.asarray(contact.winding_numbers_same_tris(
        outer, jnp.asarray(v), jnp.asarray(f), block_f=128))
    np.testing.assert_allclose(wn_in, 1.0, atol=1e-3)
    np.testing.assert_allclose(wn_out, 0.0, atol=1e-3)


def test_pairwise_dist2_bruteforce(rng):
    x = rng.randn(2, 17, 3).astype(np.float32)
    y = rng.randn(2, 23, 3).astype(np.float32)
    out = np.asarray(contact.pairwise_dist2(jnp.asarray(x), jnp.asarray(y)))
    expect = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_masked_min_dist_bruteforce(rng):
    B, V = 2, 50
    v = rng.randn(B, V, 3).astype(np.float32)
    geomask = rng.rand(V, V) > 0.3
    np.fill_diagonal(geomask, False)
    d2, arg = contact.masked_min_dist(jnp.asarray(v), jnp.asarray(geomask),
                                      block_m=16)
    d2, arg = np.asarray(d2), np.asarray(arg)
    full = ((v[:, :, None] - v[:, None]) ** 2).sum(-1)
    full[:, ~geomask] = np.inf
    np.testing.assert_allclose(d2, full.min(axis=2), atol=1e-4)
    # argmin achieves the min (may differ in ties)
    got = np.take_along_axis(full, arg[..., None], axis=2)[..., 0]
    np.testing.assert_allclose(got, full.min(axis=2), atol=1e-4)


def test_masked_min_dist_all_masked_row(rng):
    B, V = 1, 20
    v = rng.randn(B, V, 3).astype(np.float32)
    geomask = np.ones((V, V), bool)
    geomask[3, :] = False  # row with nothing allowed
    d2, _ = contact.masked_min_dist(jnp.asarray(v), jnp.asarray(geomask),
                                    block_m=8)
    assert np.isinf(np.asarray(d2)[0, 3])


def test_region_pair_min_dists(rng, tiny_smpl):
    model, extras = tiny_smpl
    V = model.v_template.shape[0]
    verts = rng.randn(2, V, 3).astype(np.float32)
    idx_a, idx_b, mask_a, mask_b = contact.build_region_pairs(
        extras.contact_classes, extras.contact_csig)
    out = np.asarray(contact.region_pair_min_dists(
        jnp.asarray(verts), jnp.asarray(idx_a), jnp.asarray(idx_b),
        jnp.asarray(mask_a), jnp.asarray(mask_b)))
    # brute force
    for p, (na, nb) in enumerate(extras.contact_classes):
        va = verts[:, extras.contact_csig[na]]
        vb = verts[:, extras.contact_csig[nb]]
        d2 = ((va[:, :, None] - vb[:, None]) ** 2).sum(-1)
        expect = d2.reshape(2, -1).min(-1)
        np.testing.assert_allclose(out[:, p], expect, rtol=1e-3, atol=1e-4)


def test_region_pair_grad_flows(tiny_smpl):
    model, extras = tiny_smpl
    V = model.v_template.shape[0]
    idx_a, idx_b, mask_a, mask_b = contact.build_region_pairs(
        extras.contact_classes, extras.contact_csig)

    def loss(v):
        return contact.region_pair_min_dists(
            v, jnp.asarray(idx_a), jnp.asarray(idx_b),
            jnp.asarray(mask_a), jnp.asarray(mask_b)).sum()

    g = jax.grad(loss)(jnp.asarray(
        np.random.RandomState(0).randn(1, V, 3).astype(np.float32)))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_face_normals_sphere(tiny_smpl):
    model, _ = tiny_smpl
    tris = jnp.asarray(np.asarray(model.v_template)[np.asarray(model.faces)])
    n = np.asarray(contact.batch_face_normals(tris))
    centers = np.asarray(model.v_template)[np.asarray(model.faces)].mean(1)
    # outward orientation: normal . center > 0 (sphere squashed to ellipsoid
    # stays star-shaped so this still holds)
    dots = (n * centers / np.linalg.norm(centers, axis=-1, keepdims=True))
    assert (dots.sum(-1) > 0).mean() > 0.99


def test_region_pair_min_dists_geomask(rng, tiny_smpl):
    """geomask excludes geodesically-near pairs from the region-pair min,
    matching the reference's mask-before-slice order
    (tuch/smplify/losses.py:92 -> :115). Built so the unmasked minimum IS
    a banned pair: the masked result must strictly increase."""
    model, extras = tiny_smpl
    idx_a, idx_b, mask_a, mask_b = contact.build_region_pairs(
        extras.contact_classes, extras.contact_csig)
    v = jnp.asarray(np.asarray(model.v_template))[None]
    V = v.shape[1]

    base = np.asarray(contact.region_pair_min_dists(
        v, idx_a, idx_b, mask_a, mask_b))
    # ban exactly the argmin pair of region-pair 0
    ia0 = np.asarray(idx_a[0])[np.asarray(mask_a[0])]
    ib0 = np.asarray(idx_b[0])[np.asarray(mask_b[0])]
    va, vb = np.asarray(v[0])[ia0], np.asarray(v[0])[ib0]
    d2 = ((va[:, None] - vb[None, :]) ** 2).sum(-1)
    # ban EVERY pair achieving (a tie with) the unmasked minimum
    near = d2 <= d2.min() * (1 + 1e-5)
    geo = np.ones((V, V), bool)
    geo[ia0[np.where(near)[0]], ib0[np.where(near)[1]]] = False

    masked = np.asarray(contact.region_pair_min_dists(
        v, idx_a, idx_b, mask_a, mask_b, geomask=jnp.asarray(geo)))
    assert masked[0, 0] > base[0, 0]
    # an all-allowed mask reproduces the unmasked result exactly
    allow = np.asarray(contact.region_pair_min_dists(
        v, idx_a, idx_b, mask_a, mask_b,
        geomask=jnp.ones((V, V), bool)))
    np.testing.assert_allclose(allow, base, rtol=1e-7)


def test_region_pair_two_phase_gradient_at_argmin(rng, tiny_smpl):
    """The two-phase r2r form routes the WHOLE gradient to the argmin
    pair (torch.min subgradient, tuch/smplify/losses.py:115-117): grad
    is +-2*(va*-vb*) at exactly the two selected vertices, 0 elsewhere."""
    model, extras = tiny_smpl
    V = model.v_template.shape[0]
    verts = rng.randn(1, V, 3).astype(np.float32)
    idx_a, idx_b, mask_a, mask_b = contact.build_region_pairs(
        extras.contact_classes, extras.contact_csig)

    def loss(v):
        return contact.region_pair_min_dists(
            v, jnp.asarray(idx_a), jnp.asarray(idx_b),
            jnp.asarray(mask_a), jnp.asarray(mask_b))[0, 0]

    g = np.asarray(jax.grad(loss)(jnp.asarray(verts)))[0]

    ia0 = np.asarray(idx_a[0])[np.asarray(mask_a[0])]
    ib0 = np.asarray(idx_b[0])[np.asarray(mask_b[0])]
    va, vb = verts[0][ia0], verts[0][ib0]
    d2 = ((va[:, None] - vb[None, :]) ** 2).sum(-1)
    r, c = np.unravel_index(d2.argmin(), d2.shape)
    i_star, j_star = ia0[r], ib0[c]
    assert i_star != j_star
    diff = verts[0, i_star] - verts[0, j_star]
    np.testing.assert_allclose(g[i_star], 2 * diff, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(g[j_star], -2 * diff, rtol=1e-4, atol=1e-6)
    touched = np.zeros(V, bool)
    touched[[i_star, j_star]] = True
    assert (g[~touched] == 0).all()


def test_region_pair_all_banned_inf_and_zero_grad(tiny_smpl):
    """A region pair whose every vertex pair is geodesically banned
    reports +inf with NO gradient (matching the old min-over-inf form)."""
    model, extras = tiny_smpl
    V = model.v_template.shape[0]
    idx_a, idx_b, mask_a, mask_b = contact.build_region_pairs(
        extras.contact_classes, extras.contact_csig)
    geo = np.ones((V, V), bool)
    ia0 = np.asarray(idx_a[0])[np.asarray(mask_a[0])]
    ib0 = np.asarray(idx_b[0])[np.asarray(mask_b[0])]
    geo[np.repeat(ia0, len(ib0)), np.tile(ib0, len(ia0))] = False
    v = jnp.asarray(np.asarray(model.v_template))[None]

    out = np.asarray(contact.region_pair_min_dists(
        v, idx_a, idx_b, mask_a, mask_b, geomask=jnp.asarray(geo)))
    assert np.isinf(out[0, 0])
    assert np.isfinite(out[0, 1:]).any() or out.shape[1] == 1

    # the banned pair's +inf must not poison finite pairs' gradients
    g = np.asarray(jax.grad(lambda vv: contact.region_pair_min_dists(
        vv, idx_a, idx_b, mask_a, mask_b,
        geomask=jnp.asarray(geo))[0, 1])(v))
    assert np.isfinite(g).all()
