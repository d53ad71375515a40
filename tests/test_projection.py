"""Tests for perspective projection and batched translation estimation."""

import numpy as np
import jax.numpy as jnp

from tuch_tpu.utils.projection import (estimate_translation,
                                       perspective_projection,
                                       weak_perspective_to_translation)


def test_perspective_projection_center_point():
    # A point on the optical axis projects to the camera center.
    pts = jnp.array([[[0.0, 0.0, 5.0]]])
    rot = jnp.eye(3)[None]
    t = jnp.zeros((1, 3))
    cc = jnp.array([[112.0, 112.0]])
    out = np.asarray(perspective_projection(pts, rot, t, 5000.0, cc))
    np.testing.assert_allclose(out[0, 0], [112.0, 112.0], atol=1e-4)


def test_perspective_projection_scaling():
    # Halving depth doubles the offset from center.
    pts = jnp.array([[[0.1, 0.2, 4.0], [0.1, 0.2, 2.0]]])
    rot = jnp.eye(3)[None]
    t = jnp.zeros((1, 3))
    cc = jnp.zeros((1, 2))
    out = np.asarray(perspective_projection(pts, rot, t, 1000.0, cc))
    np.testing.assert_allclose(out[0, 1], 2 * out[0, 0], rtol=1e-5)


def test_estimate_translation_recovers_gt(rng):
    """Project joints with a known translation, then recover it."""
    B, J = 4, 49
    f, res = 5000.0, 224.0
    S = rng.randn(B, J, 3).astype(np.float32) * 0.3
    t_gt = np.stack([rng.uniform(-0.3, 0.3, B),
                     rng.uniform(-0.3, 0.3, B),
                     rng.uniform(15, 25, B)], axis=-1).astype(np.float32)
    cc = np.full((B, 2), res / 2, np.float32)
    proj = np.asarray(perspective_projection(
        jnp.asarray(S), jnp.tile(jnp.eye(3)[None], (B, 1, 1)),
        jnp.asarray(t_gt), f, jnp.asarray(cc)))
    conf = np.ones((B, J, 1), np.float32)
    joints2d = np.concatenate([proj, conf], axis=-1)
    has_gt = np.array([True, False, True, False])
    t = np.asarray(estimate_translation(
        jnp.asarray(S), jnp.asarray(joints2d), focal_length=f, img_size=res,
        has_2d_kp_anno=jnp.asarray(has_gt)))
    np.testing.assert_allclose(t, t_gt, atol=1e-2)


def test_estimate_translation_subset_equivalence(rng):
    """Masked-confidence batched solve == per-sample subset solve."""
    B, J = 2, 49
    S = rng.randn(B, J, 3).astype(np.float32)
    S[..., 2] += 10
    joints2d = np.concatenate(
        [rng.rand(B, J, 2).astype(np.float32) * 224,
         rng.rand(B, J, 1).astype(np.float32)], axis=-1)
    has_gt = np.array([True, False])
    full = np.asarray(estimate_translation(
        jnp.asarray(S), jnp.asarray(joints2d),
        has_2d_kp_anno=jnp.asarray(has_gt)))

    # per-sample subset solve (same formulation, numpy lstsq)
    for i, use_gt in enumerate(has_gt):
        sl = slice(25, None) if use_gt else slice(0, 25)
        Si, ji = S[i, sl], joints2d[i, sl]
        conf = ji[:, 2]
        n = Si.shape[0]
        f, c = 5000.0, 112.0
        rows, rhs, ws = [], [], []
        for j in range(n):
            rows.append([f, 0, c - ji[j, 0]])
            rows.append([0, f, c - ji[j, 1]])
            rhs.append((ji[j, 0] - c) * Si[j, 2] - f * Si[j, 0])
            rhs.append((ji[j, 1] - c) * Si[j, 2] - f * Si[j, 1])
            ws.extend([np.sqrt(conf[j])] * 2)
        Q = np.asarray(rows) * np.asarray(ws)[:, None]
        r = np.asarray(rhs) * np.asarray(ws)
        expect = np.linalg.solve(Q.T @ Q + 1e-6 * np.eye(3), Q.T @ r)
        np.testing.assert_allclose(full[i], expect, rtol=1e-3, atol=1e-3)


def test_estimate_translation_zero_conf():
    S = jnp.ones((1, 49, 3))
    j2d = jnp.zeros((1, 49, 3))  # zero confidence everywhere
    t = np.asarray(estimate_translation(S, j2d,
                                        has_2d_kp_anno=jnp.array([True])))
    np.testing.assert_allclose(t, 0.0)


def test_weak_perspective_translation():
    cam = jnp.array([[1.0, 0.1, -0.2]])
    t = np.asarray(weak_perspective_to_translation(cam, 5000.0, 224))
    np.testing.assert_allclose(t[0, :2], [0.1, -0.2], atol=1e-6)
    np.testing.assert_allclose(t[0, 2], 2 * 5000.0 / (224 * 1.0 + 1e-9),
                               rtol=1e-5)
