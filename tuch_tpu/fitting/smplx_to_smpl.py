"""SMPL-X -> SMPL parameter conversion by vertex fitting.

Replaces tuch/utils/smplxtosmpl_mtp.py: the reference runs a 5000-step Adam
per sample on the host. Here the fit is a batched `lax.scan` of Adam steps
over the whole shard in one jitted program. Reference semantics by default
(CLAUDE.md invariant): the loss is the MEAN PER-VERTEX L2 NORM
(smplxtosmpl_mtp.py:100-101, `torch.norm(diff, dim=2).mean()`), the global
orientation is held FIXED (only body_pose/betas/transl are optimized,
:84-85), and the translation is an explicitly-optimized parameter
initialized at the centroid difference (:71-75). The shard-and-merge
pattern (smplxtosmpl_mtp.py:45-50) is preserved by the caller slicing
indices. Deviations (MSE loss, free global orient) are opt-in arguments.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from tuch_tpu.models.smpl import SMPLModel, smpl_forward_pose72


class VertexFitResult(NamedTuple):
    pose: jnp.ndarray     # (B, 72)
    betas: jnp.ndarray    # (B, 10)
    loss: jnp.ndarray     # (B,) final per-sample loss (see `loss` arg)


def fit_smpl_to_vertices(model: SMPLModel,
                         target_vertices: jnp.ndarray,
                         init_pose: Optional[jnp.ndarray] = None,
                         init_betas: Optional[jnp.ndarray] = None,
                         correspondence: Optional[jnp.ndarray] = None,
                         num_steps: int = 5000,
                         lr: float = 1e-2,
                         fit_translation: bool = False,
                         optimize_global_orient: bool = False,
                         loss: str = 'norm') -> VertexFitResult:
    """Fit SMPL parameters to target vertices.

    target_vertices: (B, T, 3). correspondence: optional (T, V) matrix
    mapping SMPL vertices to the target topology (identity when T == V,
    e.g. the smplx_to_smpl.pkl asset's matrix).

    Reference defaults: loss='norm' is the reference's mean per-vertex
    L2 norm; optimize_global_orient=False holds pose[:3] at its init
    (the reference re-passes global_orient fixed every forward,
    smplxtosmpl_mtp.py:96-99); fit_translation adds an optimized
    translation parameter initialized at the centroid difference
    (:71-75) -- a real parameter, NOT analytic centering, because the
    centroid is only optimal for squared-L2, not for the norm loss.
    loss='mse' (opt-in deviation) uses mean squared error instead.
    """
    B, T, _ = target_vertices.shape
    pose0 = jnp.zeros((B, 72)) if init_pose is None else init_pose
    betas0 = jnp.zeros((B, 10)) if init_betas is None else init_betas

    def vertices(pose, betas, transl):
        out = smpl_forward_pose72(model, betas, pose)
        v = out.vertices
        if correspondence is not None:
            v = jnp.einsum('tv,bvd->btd', correspondence, v)
        return v + transl[:, None, :]

    def loss_fn(p):
        pose = (p['pose'] if optimize_global_orient else
                jnp.concatenate([pose0[:, :3], p['pose'][:, 3:]], axis=1))
        v = vertices(pose, p['betas'], p['transl'])
        d = v - target_vertices
        if loss == 'mse':
            per = (d ** 2).mean(axis=(1, 2))
        else:
            # zero-safe norm: at a perfect vertex fit the distance is 0
            # and jnp.linalg.norm's gradient there is NaN
            from tuch_tpu.losses.smplify import zero_safe_norm
            per = zero_safe_norm(d).mean(axis=1)
        return per.mean(), per

    transl0 = jnp.zeros((B, 3))
    if fit_translation:
        v0 = vertices(pose0, betas0, transl0)
        transl0 = (target_vertices.mean(axis=1) - v0.mean(axis=1))

    params0 = {'pose': pose0, 'betas': betas0, 'transl': transl0}
    # the reference freezes parameters by excluding them from the Adam
    # param list; here the equivalent optax mask zeroes their updates
    frozen = {'pose': False, 'betas': False,
              'transl': not fit_translation}
    opt = optax.chain(
        optax.masked(optax.set_to_zero(),
                     {k: v for k, v in frozen.items()}),
        optax.adam(lr))

    @jax.jit
    def run(params):
        state = opt.init(params)

        def step(carry, _):
            p, s = carry
            (_, per), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            u, s = opt.update(g, s)
            return (optax.apply_updates(p, u), s), per

        (params, _), _ = jax.lax.scan(step, (params, state), None,
                                      length=num_steps)
        _, per_sample = loss_fn(params)
        pose = (params['pose'] if optimize_global_orient else
                jnp.concatenate([pose0[:, :3], params['pose'][:, 3:]],
                                axis=1))
        return pose, params['betas'], per_sample

    pose, betas, per_sample = run(params0)
    return VertexFitResult(pose=pose, betas=betas, loss=per_sample)
