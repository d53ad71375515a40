"""Procrustes alignment and reconstruction-error metrics, batched on device.

Replaces the per-sample numpy SVD loop of the reference
(tuch/utils/pose_utils.py:28-93) with one batched jnp.linalg.svd.
"""

import jax.numpy as jnp
import numpy as np


def compute_similarity_transform(S1: jnp.ndarray,
                                 S2: jnp.ndarray) -> jnp.ndarray:
    """Batched orthogonal Procrustes: aligns S1 to S2.

    S1, S2: (B, N, 3). Returns S1_hat = s*R@S1 + t, shape (B, N, 3).
    Same math as tuch/utils/pose_utils.py:28-76 (which operates on 3xN).
    """
    mu1 = S1.mean(axis=1, keepdims=True)
    mu2 = S2.mean(axis=1, keepdims=True)
    X1 = S1 - mu1  # (B, N, 3)
    X2 = S2 - mu2

    var1 = jnp.sum(X1 ** 2, axis=(1, 2))  # (B,)

    # K = X1^T(3xN convention) @ X2^T... with row-point layout: K = X1^T X2
    K = jnp.einsum('bni,bnj->bij', X1, X2)  # (B, 3, 3)

    U, s, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)
    det = jnp.linalg.det(jnp.einsum('bij,bkj->bik', U, V))  # det(U V^T)
    # Z = diag(1, 1, sign(det)) fixes the orientation so det(R) = 1.
    Z = jnp.tile(jnp.eye(3)[None], (K.shape[0], 1, 1))
    Z = Z.at[:, -1, -1].set(jnp.sign(det))

    R = jnp.einsum('bij,bjk,blk->bil', V, Z, U)  # V @ Z @ U^T

    # trace(R @ K) -- NOT the Frobenius product trace(R^T K): the two
    # differ for non-symmetric R (pose_utils.py:64 uses np.trace(R.dot(K)))
    scale = jnp.einsum('bij,bji->b', R, K) / jnp.maximum(var1, 1e-12)
    t = mu2 - scale[:, None, None] * jnp.einsum('bij,bkj->bki', R, mu1)
    S1_hat = scale[:, None, None] * jnp.einsum('bij,bnj->bni', R, S1) + t
    return S1_hat


def reconstruction_error(S1, S2, reduction='mean'):
    """Procrustes-aligned reconstruction error (PA-MPJPE core).

    S1, S2: (B, N, 3). Mirrors tuch/utils/pose_utils.py:85-93.
    """
    S1 = jnp.asarray(S1)
    S2 = jnp.asarray(S2)
    S1_hat = compute_similarity_transform(S1, S2)
    re = jnp.sqrt(((S1_hat - S2) ** 2).sum(axis=-1)).mean(axis=-1)
    if reduction == 'mean':
        return re.mean()
    if reduction == 'sum':
        return re.sum()
    return re


def mpjpe(pred_joints, gt_joints):
    """Mean per-joint position error, (B, N, 3) -> (B,)."""
    return jnp.sqrt(((pred_joints - gt_joints) ** 2).sum(axis=-1)).mean(axis=-1)
