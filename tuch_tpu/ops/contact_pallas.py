"""Pallas TPU kernels for the contact hot loops.

The quadratic point-triangle solid-angle sum is the framework's hottest op
(SURVEY.md section 3: ~6e9 point-triangle pairs per training step at B=64).
The jnp fallback streams triangle blocks but XLA still materializes the
(B, Q, f, 3) centered-triangle temporaries in HBM (~10 GB at B=64,
block=2048) because they feed several consumers. This kernel keeps the
entire per-tile computation in VMEM:

  grid (B, Q/TQ, F/TF); each program loads a (3, TQ) point tile and a
  (9, TF) triangle tile (struct-of-arrays layout), forms all (TQ, TF)
  intermediates in VMEM/registers, reduces over the triangle axis and
  accumulates into the (1, TQ) output block across the F grid dimension.

Total HBM traffic: read B*(3Q + 9F) floats + write B*Q floats -- about
5 MB per sample instead of gigabytes. Compute is VPU-bound (the atan2).

No backward pass is needed: every caller uses winding numbers inside a
stop-gradient region (the in/out test; reference does the same under
torch.no_grad, tuch/train/loss.py:251, tuch/smplify/losses.py:79).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tuch_tpu.ops.contact import INV_4PI

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_FAR = 1e7  # padding triangles live here; their solid angle is exactly 0

_HALF_PI = np.float32(np.pi / 2)
_PI = np.float32(np.pi)


def _atan2(y, x):
    """atan2 built from VPU primitives (Pallas TPU has no atan2 lowering).

    Range-reduce to t = min/max in [0, 1], evaluate a degree-11 odd minimax
    polynomial for atan(t) (max error ~2e-7), then undo the octant folding.
    Accurate enough for winding-number sums: the 0.99 in/out threshold
    tolerates far larger perturbations.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(ax, ay)
    t = num / jnp.maximum(den, 1e-30)
    s = t * t
    # minimax coefficients for atan on [0, 1]
    r = jnp.float32(-0.0117212)
    r = r * s + jnp.float32(0.05265332)
    r = r * s + jnp.float32(-0.11643287)
    r = r * s + jnp.float32(0.19354346)
    r = r * s + jnp.float32(-0.33262348)
    r = r * s + jnp.float32(0.99997726)
    r = r * t
    r = jnp.where(ay > ax, _HALF_PI - r, r)
    r = jnp.where(x < 0, _PI - r, r)
    r = jnp.where(y < 0, -r, r)
    # y == 0: atan2 = 0 (x >= 0) or pi (x < 0)
    return jnp.where(y == 0, jnp.where(x < 0, _PI, 0.0), r)


def _winding_kernel(pts_ref, tri_ref, out_ref):
    """One (TQ, TF) tile of solid angles, accumulated over the F grid dim.

    pts_ref: (1, 3, TQ); tri_ref: (1, 9, TF) as rows
    [ax ay az bx by bz cx cy cz]; out_ref: (1, 1, TQ).
    """
    fi = pl.program_id(2)

    q = pts_ref[0]          # (3, TQ)
    t = tri_ref[0]          # (9, TF)

    qx = q[0, :][:, None]   # (TQ, 1)
    qy = q[1, :][:, None]
    qz = q[2, :][:, None]

    ax = t[0, :][None, :] - qx   # (TQ, TF)
    ay = t[1, :][None, :] - qy
    az = t[2, :][None, :] - qz
    bx = t[3, :][None, :] - qx
    by = t[4, :][None, :] - qy
    bz = t[5, :][None, :] - qz
    cx = t[6, :][None, :] - qx
    cy = t[7, :][None, :] - qy
    cz = t[8, :][None, :] - qz

    la = jnp.sqrt(ax * ax + ay * ay + az * az)
    lb = jnp.sqrt(bx * bx + by * by + bz * bz)
    lc = jnp.sqrt(cx * cx + cy * cy + cz * cz)

    # numer = a . (b x c)
    numer = (ax * (by * cz - bz * cy)
             + ay * (bz * cx - bx * cz)
             + az * (bx * cy - by * cx))
    dab = ax * bx + ay * by + az * bz
    dbc = bx * cx + by * cy + bz * cz
    dac = ax * cx + ay * cy + az * cz
    denom = la * lb * lc + dab * lc + dac * lb + dbc * la

    ang = 2.0 * _atan2(numer, denom)
    partial = jnp.sum(ang, axis=1)[None, None, :]   # (1, 1, TQ)

    @pl.when(fi == 0)
    def _():
        out_ref[...] = partial

    @pl.when(fi > 0)
    def _():
        out_ref[...] = out_ref[...] + partial


@functools.partial(jax.jit, static_argnames=('tq', 'tf', 'interpret'))
def winding_numbers_pallas(points: jnp.ndarray, verts: jnp.ndarray,
                           faces: jnp.ndarray, tq: int = 512,
                           tf: int = 2048,
                           interpret: bool = False) -> jnp.ndarray:
    """Generalized winding numbers on TPU via the tiled VMEM kernel.

    points: (B, Q, 3); verts: (B, V, 3); faces: (F, 3) int32. -> (B, Q).
    """
    tris = verts[:, faces, :]                      # (B, F, 3, 3)
    return winding_numbers_pallas_tris(points, tris, tq=tq, tf=tf,
                                       interpret=interpret)


@functools.partial(jax.jit, static_argnames=('tq', 'tf', 'interpret'))
def winding_numbers_pallas_tris(points: jnp.ndarray, tris: jnp.ndarray,
                                tq: int = 512, tf: int = 2048,
                                interpret: bool = False) -> jnp.ndarray:
    """Winding numbers from per-batch explicit triangles.

    points: (B, Q, 3); tris: (B, F, 3, 3). -> (B, Q). Used when each batch
    row has its *own* triangle set (e.g. all body segments of all samples
    flattened into one launch, ops/segments.py); padding triangles whose
    corners sit at the _FAR point contribute exactly zero solid angle.
    """
    B, Q, _ = points.shape
    F = tris.shape[1]
    qpad = (-Q) % tq
    fpad = (-F) % tf

    # Struct-of-arrays: (B, 3, Q') points, (B, 9, F') triangle corners.
    pts = jnp.swapaxes(points, 1, 2)
    if qpad:
        pts = jnp.pad(pts, ((0, 0), (0, 0), (0, qpad)))
    tris = tris.reshape(B, F, 9).swapaxes(1, 2)    # (B, 9, F)
    if fpad:
        tris = jnp.pad(tris, ((0, 0), (0, 0), (0, fpad)),
                       constant_values=_FAR)

    Qp, Fp = Q + qpad, F + fpad
    grid = (B, Qp // tq, Fp // tf)

    out = pl.pallas_call(
        _winding_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tq), lambda b, qi, fi: (b, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, tf), lambda b, qi, fi: (b, 0, fi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tq), lambda b, qi, fi: (b, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, Qp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=75 * B * Qp * Fp,
            bytes_accessed=4 * B * (3 * Qp + 9 * Fp + Qp),
            transcendentals=4 * B * Qp * Fp),
        interpret=interpret,
    )(pts, tris)
    return out[:, 0, :Q] * INV_4PI


def _masked_min_kernel(x_ref, y_ref, mask_ref, best_ref, arg_ref):
    """One (TN, TM) tile of the geodesic-masked nearest-vertex search.

    x_ref: (1, 3, TN) row points; y_ref: (1, 3, TM) column points (same
    vertex set); mask_ref: (TN, TM) uint8 allowed-pairs tile; outputs
    (1, 1, TN) fp32 best squared distance and (1, 1, TN) int32 argmin,
    accumulated over the column grid dimension.

    Distances are direct coordinate differences on the VPU: exact in fp32,
    unlike an MXU Gram-matrix pass (which truncates operands to bf16) or
    the reference's xx + yy - 2xy form (catastrophic cancellation for
    near-contact pairs, tuch/utils/contact.py:36-42).
    """
    mi = pl.program_id(2)
    tm = y_ref.shape[2]

    x = x_ref[0]          # (3, TN)
    y = y_ref[0]          # (3, TM)
    dx = x[0, :][:, None] - y[0, :][None, :]
    dy = x[1, :][:, None] - y[1, :][None, :]
    dz = x[2, :][:, None] - y[2, :][None, :]
    d2 = dx * dx + dy * dy + dz * dz
    # int8 vector compares don't lower on TPU; widen to int32 first
    allowed = mask_ref[...].astype(jnp.int32) > 0
    d2 = jnp.where(allowed, d2, jnp.inf)

    blk_min = jnp.min(d2, axis=1)                      # (TN,)
    local_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
    blk_arg = local_arg + mi * tm

    @pl.when(mi == 0)
    def _():
        best_ref[...] = blk_min[None, None, :]
        arg_ref[...] = blk_arg[None, None, :]

    @pl.when(mi > 0)
    def _():
        prev = best_ref[...]
        prev_arg = arg_ref[...]
        upd = blk_min[None, None, :] < prev
        best_ref[...] = jnp.where(upd, blk_min[None, None, :], prev)
        arg_ref[...] = jnp.where(upd, blk_arg[None, None, :], prev_arg)


@functools.partial(jax.jit, static_argnames=('tn', 'tm', 'interpret'))
def masked_min_dist_pallas(verts: jnp.ndarray, geomask_u8: jnp.ndarray,
                           tn: int = 1024, tm: int = 1024,
                           interpret: bool = False):
    """Geodesic-masked nearest-vertex distances without the (V, V) matrix.

    verts: (B, V, 3); geomask_u8: (V, V) uint8 (1 = allowed).
    Returns (min_d2 (B, V) fp32 [inf where no allowed pair], argmin int32).
    """
    B, V, _ = verts.shape
    pad = (-V) % int(np.lcm(tn, tm))
    vp = jnp.pad(verts, ((0, 0), (0, pad), (0, 0)),
                 constant_values=_FAR) if pad else verts
    Vp = V + pad
    coords = jnp.swapaxes(vp, 1, 2)                    # (B, 3, Vp)
    mask = geomask_u8
    if pad:
        mask = jnp.pad(mask, ((0, pad), (0, pad)))     # padded cols banned

    grid = (B, Vp // tn, Vp // tm)
    best, arg = pl.pallas_call(
        _masked_min_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tn), lambda b, ni, mi: (b, 0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, ni, mi: (b, 0, mi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tm), lambda b, ni, mi: (ni, mi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tn), lambda b, ni, mi: (b, 0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda b, ni, mi: (b, 0, ni),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, 1, Vp), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, Vp), jnp.int32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * Vp * Vp,
            bytes_accessed=B * Vp * Vp + 4 * B * Vp * 3 * 2,
            transcendentals=0),
        interpret=interpret,
    )(coords, coords, mask)
    arg = jnp.minimum(arg[:, 0], V - 1)
    return best[:, 0, :V], arg[:, :V]


def pallas_available() -> bool:
    """True when running on a TPU backend where these kernels compile."""
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform in ('tpu', 'axon')
    except Exception:  # pragma: no cover
        return False
