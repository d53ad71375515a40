"""Triangle-axis ("contact") parallel winding numbers over a device mesh.

The 6890x13776 point-triangle solid-angle sum is this workload's big-axis
problem (SURVEY.md section 5: the ring-attention analog). Sharding: each
'cp' device reduces its shard of the triangle axis locally (streamed in
VMEM-sized blocks), then one psum over 'cp' combines the partial
solid-angle sums -- an all-reduce of a (B, Q) array, tiny compared to the
compute it parallelizes.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from tuch_tpu.ops.contact import INV_4PI, _solid_angle_block_masked


def _local_winding_sum(points, verts, faces_shard, valid_shard,
                       block_f: int):
    """Partial solid-angle sums over one device's triangle shard.

    points: (B, Q, 3); verts: (B, V, 3); faces_shard: (Fs, 3);
    valid_shard: (Fs,) -> (B, Q) partial sums (not yet / 4pi).
    """
    Fs = faces_shard.shape[0]
    pad = (-Fs) % block_f
    if pad:
        faces_shard = jnp.concatenate(
            [faces_shard, jnp.zeros((pad, 3), faces_shard.dtype)], axis=0)
        valid_shard = jnp.concatenate(
            [valid_shard, jnp.zeros((pad,), bool)], axis=0)
    fblocks = faces_shard.reshape(-1, block_f, 3)
    vblocks = valid_shard.reshape(-1, block_f)

    def single(pts1, verts1):
        def body(acc, xs):
            fb, vb = xs
            tri = verts1[fb]
            return acc + _solid_angle_block_masked(pts1, tri, vb), None

        # The carry must be varying over BOTH mesh axes (the body mixes
        # dp-varying points with cp-varying faces); pcast the init.
        acc0 = jax.lax.pcast(pts1[:, 0] * 0.0, ('cp',), to='varying')
        acc, _ = jax.lax.scan(body, acc0, (fblocks, vblocks))
        return acc

    return jax.vmap(single)(points, verts)


def winding_numbers_cp(points: jnp.ndarray, verts: jnp.ndarray,
                       faces: np.ndarray, mesh: Mesh,
                       block_f: int = 1024) -> jnp.ndarray:
    """Winding numbers with the triangle axis sharded over mesh axis 'cp'.

    points: (B, Q, 3); verts: (B, V, 3); faces: static (F, 3).
    Returns (B, Q). 2D-sharded: the batch axis is split over 'dp', the
    triangle axis over 'cp'; each device reduces its (batch shard x
    triangle shard) tile, then psum('cp') merges partial sums. B must be
    divisible by mesh.shape['dp'].
    """
    ncp = mesh.shape['cp']
    F = faces.shape[0]
    pad = (-F) % ncp
    faces_p = np.concatenate(
        [np.asarray(faces), np.zeros((pad, 3), faces.dtype)], axis=0)
    valid = np.arange(F + pad) < F

    @partial(shard_map, mesh=mesh,
             in_specs=(P('dp'), P('dp'), P('cp'), P('cp')),
             out_specs=P('dp'))
    def run(pts, vts, f_shard, v_shard):
        partial_sum = _local_winding_sum(pts, vts, f_shard, v_shard,
                                         block_f)
        return jax.lax.psum(partial_sum, 'cp') * INV_4PI

    return run(points, verts, jnp.asarray(faces_p), jnp.asarray(valid))
