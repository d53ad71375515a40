"""Camera projection and translation estimation, batched and jittable.

Replaces tuch/utils/geometry.py:83-205. The reference estimates the camera
translation with a per-sample numpy least-squares loop on the host
(geometry.py:188-204) -- here it is one batched linear solve on device.
"""

import jax
import jax.numpy as jnp


def perspective_projection(points: jnp.ndarray,
                           rotation: jnp.ndarray,
                           translation: jnp.ndarray,
                           focal_length,
                           camera_center: jnp.ndarray) -> jnp.ndarray:
    """Project 3D points to the image plane.

    points: (B, N, 3); rotation: (B, 3, 3); translation: (B, 3);
    focal_length: scalar or (B,); camera_center: (B, 2). Returns (B, N, 2).
    Mirrors tuch/utils/geometry.py:83-111.
    """
    pts = jnp.einsum('bij,bkj->bki', rotation, points) + translation[:, None, :]
    # Perspective divide.
    xy = pts[..., :2] / pts[..., 2:3]
    f = jnp.asarray(focal_length)
    f = f.reshape((-1, 1, 1)) if f.ndim else f
    return f * xy + camera_center[:, None, :]


def weak_perspective_to_translation(pred_camera: jnp.ndarray,
                                    focal_length: float,
                                    img_res: int) -> jnp.ndarray:
    """Convert an (s, tx, ty) weak-perspective camera to a 3D translation.

    t = [tx, ty, 2f / (img_res * s + 1e-9)]; see the identical expression at
    tuch/train/train_module.py:213-216.
    """
    return jnp.stack([
        pred_camera[:, 1],
        pred_camera[:, 2],
        2.0 * focal_length / (img_res * pred_camera[:, 0] + 1e-9),
    ], axis=-1)


def estimate_translation(S: jnp.ndarray,
                         joints_2d: jnp.ndarray,
                         focal_length: float = 5000.0,
                         img_size: float = 224.0,
                         has_2d_kp_anno: jnp.ndarray | None = None
                         ) -> jnp.ndarray:
    """Weighted least-squares camera translation, fully batched.

    S: (B, J, 3) 3D joints. joints_2d: (B, J, 3) 2D joints + confidence.
    has_2d_kp_anno: (B,) bool -- samples with GT 2D annotations use the
    GT joints (25:), others use the OpenPose joints (:25); implemented by
    zeroing the confidences of the unused slice, which makes the weighted
    normal equations identical to solving on the subset alone
    (reference per-sample logic: tuch/utils/geometry.py:188-204).

    Solves, per sample, for t = (tx, ty, tz) minimizing
        sum_j w_j * || f*(X_j + t_xy) - (p_j - c)*(Z_j + t_z) ||^2
    which is linear in t: rows [f, 0, c_x - p_x; 0, f, c_y - p_y] and
    rhs (p - c)*Z - f*XY, each row weighted by sqrt(conf).
    """
    B, J, _ = S.shape
    conf = joints_2d[..., 2]
    if has_2d_kp_anno is not None:
        op_mask = jnp.arange(J) < 25
        use_gt = has_2d_kp_anno[:, None]
        keep = jnp.where(use_gt, ~op_mask[None, :], op_mask[None, :])
        conf = conf * keep.astype(conf.dtype)
    p = joints_2d[..., :2]

    f = focal_length
    c = img_size / 2.0
    Z = S[..., 2]
    XY = S[..., :2]

    # Rows: for each joint, two equations (x and y). Q has shape (B, 2J, 3).
    zeros = jnp.zeros((B, J))
    f_arr = jnp.full((B, J), f)
    row_x = jnp.stack([f_arr, zeros, c - p[..., 0]], axis=-1)  # (B, J, 3)
    row_y = jnp.stack([zeros, f_arr, c - p[..., 1]], axis=-1)
    Q = jnp.concatenate([row_x[:, :, None, :], row_y[:, :, None, :]],
                        axis=2).reshape(B, 2 * J, 3)
    rhs = jnp.stack([(p[..., 0] - c) * Z - f * XY[..., 0],
                     (p[..., 1] - c) * Z - f * XY[..., 1]],
                    axis=-1).reshape(B, 2 * J)

    w = jnp.sqrt(jnp.maximum(conf, 0.0))
    w2 = jnp.repeat(w, 2, axis=-1)  # weight each joint's two rows (B, 2J)

    Qw = Q * w2[..., None]
    rw = rhs * w2
    A = jnp.einsum('bij,bik->bjk', Qw, Qw)
    b = jnp.einsum('bij,bi->bj', Qw, rw)
    # Regularize the (rare) all-zero-confidence sample so solve is defined;
    # the reference leaves t = 0 in that case (geometry.py:201-203).
    valid = jnp.sum(conf, axis=-1) > 0
    A = A + (1e-6 + (~valid).astype(A.dtype))[:, None, None] * jnp.eye(3)[None]
    t = jnp.linalg.solve(A, b[..., None])[..., 0]
    return jnp.where(valid[:, None], t, 0.0)
