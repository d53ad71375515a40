"""SMPL-X -> SMPL parameter conversion by vertex fitting.

Replaces tuch/utils/smplxtosmpl_mtp.py: the reference runs a 5000-step Adam
per sample on the host. Here the fit is a batched `lax.scan` of Adam steps
minimizing the vertex L2 between the SMPL forward and target vertices
(mapped through a correspondence matrix when topologies differ), so a whole
shard converts in one jitted program. The shard-and-merge pattern
(smplxtosmpl_mtp.py:45-50) is preserved by the caller slicing indices.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from tuch_tpu.models.smpl import SMPLModel, smpl_forward_pose72


class VertexFitResult(NamedTuple):
    pose: jnp.ndarray     # (B, 72)
    betas: jnp.ndarray    # (B, 10)
    loss: jnp.ndarray     # (B,) final per-sample vertex MSE


def fit_smpl_to_vertices(model: SMPLModel,
                         target_vertices: jnp.ndarray,
                         init_pose: Optional[jnp.ndarray] = None,
                         init_betas: Optional[jnp.ndarray] = None,
                         correspondence: Optional[jnp.ndarray] = None,
                         num_steps: int = 5000,
                         lr: float = 1e-2,
                         fit_translation: bool = False) -> VertexFitResult:
    """Fit SMPL pose+betas to target vertices.

    target_vertices: (B, T, 3). correspondence: optional (T, V) matrix
    mapping SMPL vertices to the target topology (identity when T == V,
    e.g. the smplx_to_smpl.pkl asset's matrix).

    fit_translation: the reference jointly optimizes a translation
    (smplxtosmpl_mtp.py:71-85) that its OUTPUT then discards (only
    pose/betas are saved, :117-119). The optimal translation for an L2
    vertex loss is the centroid difference, so instead of carrying a
    translation parameter through Adam the loss compares centered vertex
    sets -- analytically identical at every step.
    """
    B, T, _ = target_vertices.shape
    pose0 = jnp.zeros((B, 72)) if init_pose is None else init_pose
    betas0 = jnp.zeros((B, 10)) if init_betas is None else init_betas
    if fit_translation:
        target_vertices = (target_vertices
                           - target_vertices.mean(axis=1, keepdims=True))

    def loss_fn(p):
        out = smpl_forward_pose72(model, p['betas'], p['pose'])
        v = out.vertices
        if correspondence is not None:
            v = jnp.einsum('tv,bvd->btd', correspondence, v)
        if fit_translation:
            v = v - v.mean(axis=1, keepdims=True)
        return ((v - target_vertices) ** 2).mean(), v

    opt = optax.adam(lr)

    @jax.jit
    def run(params):
        state = opt.init(params)

        def step(carry, _):
            p, s = carry
            (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            u, s = opt.update(g, s)
            return (optax.apply_updates(p, u), s), loss

        (params, _), losses = jax.lax.scan(step, (params, state), None,
                                           length=num_steps)
        out = smpl_forward_pose72(model, params['betas'], params['pose'])
        v = out.vertices
        if correspondence is not None:
            v = jnp.einsum('tv,bvd->btd', correspondence, v)
        if fit_translation:
            v = v - v.mean(axis=1, keepdims=True)
        per_sample = ((v - target_vertices) ** 2).mean(axis=(1, 2))
        return params, per_sample

    params, per_sample = run({'pose': pose0, 'betas': betas0})
    return VertexFitResult(pose=params['pose'], betas=params['betas'],
                           loss=per_sample)
