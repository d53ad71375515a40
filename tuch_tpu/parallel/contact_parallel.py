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
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tuch_tpu.ops.contact import INV_4PI, _solid_angle_block_masked

# Trace-time counters: incremented when the cp-sharded code paths are
# STAGED into a jitted program. The multichip dry run asserts on these to
# prove the production train step actually routes contact through the
# cp-parallel kernels (not just the unit tests).
TRACE_STATS = {'cp_contact_traces': 0}


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


def _local_masked_min(rows, cols, mask, col_ids, block_m: int):
    """Masked nearest-column search over one device's column shard.

    rows: (B, V, 3); cols: (B, Vc, 3); mask: (V, Vc) bool; col_ids: (Vc,)
    global column indices (>= V on padding). Returns
    (min_d2 (B, V), argmin (B, V) global int32). Streams column blocks so
    nothing (V, Vc) is materialized; same update rule (strictly-less) as
    ops.contact.masked_min_dist so the first/lowest index wins ties.
    """
    Vc = cols.shape[1]
    pad = (-Vc) % block_m
    if pad:
        cols = jnp.pad(cols, ((0, 0), (0, pad), (0, 0)),
                       constant_values=1e8)
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        col_ids = jnp.pad(col_ids, (0, pad),
                          constant_values=np.int32(2 ** 30))
    nb = cols.shape[1] // block_m
    mask_blocks = mask.reshape(mask.shape[0], nb, block_m)
    id_blocks = col_ids.reshape(nb, block_m)

    def single(r, c):  # r: (V, 3); c: (Vc', 3)
        c_blocks = c.reshape(nb, block_m, 3)

        def body(carry, xs):
            best_d2, best_idx = carry
            cb, mb, ib = xs
            # direct differences, NOT the Gram form xx + yy - 2xy: the
            # matmul truncates to bf16 on TPU and the subtraction cancels
            # at near-contact distances (see ops/contact.masked_min_dist)
            d2 = jnp.sum((r[:, None, :] - cb[None, :, :]) ** 2, axis=-1)
            d2 = jnp.where(mb, d2, jnp.inf)
            blk_min = jnp.min(d2, axis=1)
            blk_arg = ib[jnp.argmin(d2, axis=1)]
            upd = blk_min < best_d2
            return (jnp.where(upd, blk_min, best_d2),
                    jnp.where(upd, blk_arg, best_idx)), None

        # carry varies over both mesh axes (dp rows x cp columns); derive
        # init from r (dp-varying), pcast in the cp axis.
        init_d2 = jax.lax.pcast(r[:, 0] * 0.0 + jnp.inf, ('cp',),
                                to='varying')
        # index 0 when nothing is allowed anywhere -- matches the
        # single-device streamed argmin's zero init.
        init_ix = jax.lax.pcast((r[:, 0] * 0.0).astype(jnp.int32), ('cp',),
                                to='varying')
        (min_d2, argmin), _ = jax.lax.scan(
            body, (init_d2, init_ix),
            (c_blocks, jnp.moveaxis(mask_blocks, 1, 0), id_blocks))
        return min_d2, argmin

    return jax.vmap(single)(rows, cols)


def _col_shard_inputs(V: int, ncp: int, geomask: jnp.ndarray):
    """Pad the column axis to a multiple of cp; padded columns are banned
    by the mask and carry out-of-range ids (2**30 sentinel)."""
    cpad = (-V) % ncp
    col_ids = np.arange(V + cpad, dtype=np.int32)
    col_ids[V:] = 2 ** 30
    geo_p = jnp.pad(geomask.astype(bool), ((0, 0), (0, cpad)))
    return cpad, jnp.asarray(col_ids), geo_p


def _rank_masked_min(vts, geo_shard, id_shard, V, cpad, ncp, block_m):
    """Inside shard_map: search this rank's column shard, merge over 'cp'.

    Index tie-break across ranks: only positions achieving the global
    pmin distance keep their id, everything else becomes the 2**30
    sentinel, and a second pmin picks the smallest id -- matching the
    single-device streamed argmin's first-minimum semantics.
    """
    i_cp = jax.lax.axis_index('cp')
    vc = (V + cpad) // ncp
    vts_pad = jnp.pad(vts, ((0, 0), (0, cpad), (0, 0)),
                      constant_values=1e8)
    cols = jax.lax.dynamic_slice_in_dim(vts_pad, i_cp * vc, vc, axis=1)
    loc_d2, loc_arg = _local_masked_min(vts, cols, geo_shard, id_shard,
                                        block_m)
    best_d2 = jax.lax.pmin(loc_d2, 'cp')
    cand = jnp.where(loc_d2 == best_d2, loc_arg, 2 ** 30)
    best_arg = jax.lax.pmin(cand, 'cp')
    return best_d2, best_arg


def masked_min_cp(verts: jnp.ndarray, geomask: jnp.ndarray, mesh: Mesh,
                  block_m: int = 1024):
    """Geodesic-masked nearest-vertex search, column axis sharded over 'cp'.

    verts: (B, V, 3), B divisible by mesh dp. Returns (min_d2 (B, V),
    argmin (B, V) int32) == ops.contact.masked_min_dist, with each device
    searching its column shard and pmin('cp') merging.
    """
    ncp = mesh.shape['cp']
    V = verts.shape[1]
    cpad, col_ids, geo_p = _col_shard_inputs(V, ncp, geomask)

    @partial(shard_map, mesh=mesh,
             in_specs=(P('dp'), P(None, 'cp'), P('cp')),
             out_specs=(P('dp'), P('dp')))
    def run(vts, geo_shard, id_shard):
        return _rank_masked_min(vts, geo_shard, id_shard, V, cpad, ncp,
                                block_m)

    min_d2, argmin = run(verts, geo_p, col_ids)
    return min_d2, jnp.minimum(argmin, V - 1).astype(jnp.int32)


def contact_neighbors_cp(verts: jnp.ndarray, faces: np.ndarray,
                         geomask: jnp.ndarray, mesh: Mesh,
                         block_f: int = 1024, block_m: int = 1024):
    """The contact stop-gradient half, 2D-sharded over the (dp, cp) mesh.

    verts: (B, V, 3) with B divisible by mesh dp. Returns
    (winding (B, V), argmin (B, V) int32) == the single-device
    (winding_numbers_same_tris, masked_min_dist[1]) pair, but with the
    quadratic axes sharded over 'cp': each device reduces its (batch shard
    x triangle shard) winding tile and its (row x column shard) nearest-
    vertex tile; psum / pmin over 'cp' merge the partials (tiny (B, V)
    collectives vs the O(V^2) compute they parallelize).
    """
    TRACE_STATS['cp_contact_traces'] += 1
    ncp = mesh.shape['cp']
    V = verts.shape[1]
    F = faces.shape[0]

    fpad = (-F) % ncp
    faces_p = np.concatenate(
        [np.asarray(faces), np.zeros((fpad, 3), faces.dtype)], axis=0)
    fvalid = np.arange(F + fpad) < F

    cpad, col_ids, geo_p = _col_shard_inputs(V, ncp, geomask)

    @partial(shard_map, mesh=mesh,
             in_specs=(P('dp'), P('cp'), P('cp'), P(None, 'cp'), P('cp')),
             out_specs=(P('dp'), P('dp'), P('dp')))
    def run(vts, f_shard, fv_shard, geo_shard, id_shard):
        wn_part = _local_winding_sum(vts, vts, f_shard, fv_shard, block_f)
        wn = jax.lax.psum(wn_part, 'cp') * INV_4PI
        best_d2, best_arg = _rank_masked_min(vts, geo_shard, id_shard, V,
                                             cpad, ncp, block_m)
        return wn, best_d2, best_arg

    wn, min_d2, argmin = run(verts, jnp.asarray(faces_p),
                             jnp.asarray(fvalid), geo_p, col_ids)
    return wn, jnp.minimum(argmin, V - 1).astype(jnp.int32)
