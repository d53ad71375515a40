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
_CORNER_EPS2 = 1e-6  # (1mm)^2: affine-kernel corner mask, see below

_HALF_PI = np.float32(np.pi / 2)
_PI = np.float32(np.pi)


def _atan2(y, x, approx_recip: bool = False):
    """atan2 built from VPU primitives (Pallas TPU has no atan2 lowering).

    Range-reduce to t = min/max in [0, 1], evaluate a degree-11 odd minimax
    polynomial for atan(t) (max error ~2e-7), then undo the octant folding.
    Accurate enough for winding-number sums: the 0.99 in/out threshold
    tolerates far larger perturbations.

    approx_recip=True replaces the range-reduction divide with the VPU's
    approximate reciprocal (pl.reciprocal, ~2^-14 relative): measured
    26.4 -> 28.2 Gpairs/s on the winding kernel with ZERO in/out decision
    flips and max winding-number delta 1.4e-5 across posed bodies at three
    pose scales. (A degree-7 polynomial was also tried: it flips decisions
    -- rejected.) Only valid inside a Pallas kernel; the default keeps the
    exact divide so the function is also callable as plain jnp.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    if approx_recip:
        t = num * pl.reciprocal(den, approx=True)
    else:
        t = num / den
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


def _winding_kernel(pts_ref, tri_ref, out_ref, *, approx_recip=True):
    """One (TQ, TF) tile of solid angles, accumulated over the F grid dim.

    pts_ref: (1, 3, TQ); tri_ref: (1, 9, TF) as rows
    [ax ay az bx by bz cx cy cz]; out_ref: (1, 1, TQ).

    approx_recip: hardware runs the atan2 range reduction on the VPU's
    approximate reciprocal (validated flip-free, see _atan2); interpret
    mode emulates that reciprocal much more coarsely (~1e-3), so the
    wrappers pass False there to keep CI pinning strict.
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

    ang = 2.0 * _atan2(numer, denom, approx_recip=approx_recip)
    partial = jnp.sum(ang, axis=1)[None, None, :]   # (1, 1, TQ)

    @pl.when(fi == 0)
    def _():
        out_ref[...] = partial

    @pl.when(fi > 0)
    def _():
        out_ref[...] = out_ref[...] + partial


@functools.partial(jax.jit, static_argnames=('tq', 'tf', 'interpret'))
def winding_numbers_pallas(points: jnp.ndarray, verts: jnp.ndarray,
                           faces: jnp.ndarray, tq: int = 1024,
                           tf: int = 1024,
                           interpret: bool = False) -> jnp.ndarray:
    """Generalized winding numbers on TPU via the tiled VMEM kernel.

    points: (B, Q, 3); verts: (B, V, 3); faces: (F, 3) int32. -> (B, Q).
    """
    tris = verts[:, faces, :]                      # (B, F, 3, 3)
    return winding_numbers_pallas_tris(points, tris, tq=tq, tf=tf,
                                       interpret=interpret)


@functools.partial(jax.jit, static_argnames=('tq', 'tf', 'interpret'))
def winding_numbers_pallas_tris(points: jnp.ndarray, tris: jnp.ndarray,
                                tq: int = 1024, tf: int = 1024,
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
        functools.partial(_winding_kernel, approx_recip=not interpret),
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


def _winding_affine_kernel(pts_ref, tc_ref, out_ref, *,
                           approx_recip=True):
    """MXU-offloaded winding tile: per-pair dots via rank-4 matmuls.

    Every per-pair quantity of the Van Oosterom-Strackee formula is affine
    in the query point q:

      (A-q).(B-q) = A.B - q.(A+B) + q.q
      |A-q|^2     = A.A - 2 q.A   + q.q
      (A-q).((B-q)x(C-q)) = det(A,B,C) - q.(BxC + CxA + AxB)
                            (the q-quadratic/cubic terms cancel exactly)

    so one (TQ, 4) x (4, TF) matmul per quantity (7 total) computes all
    pairwise dots on the MXU; the VPU keeps only 3 sqrt, 3 fused adds of
    q.q, ~10 mul/add for the denominator, and the atan2 -- about 1/3 of
    the pure-VPU kernel's vector ops. fp32 matmuls stay exact enough for
    the 0.99 in/out threshold (validated bitwise-decision-equal on posed
    bodies in bench.py; the tile sums match the reference kernel to ~1e-4
    relative).

    pts_ref: (1, 4, TQ) rows [qx qy qz q.q]; tc_ref: (1, 28, TF) triangle
    constants (see winding_numbers_pallas_affine); out_ref: (1, 1, TQ).
    """
    fi = pl.program_id(2)

    q4 = pts_ref[0]           # (4, TQ): [qx, qy, qz, qq]
    tc = tc_ref[0]            # (28, TF)
    qt = q4[:3].T             # (TQ, 3)
    qq = q4[3][:, None]       # (TQ, 1)
    one = jnp.ones_like(qq)
    qh = jnp.concatenate([qt, one], axis=1)  # (TQ, 4): [q, 1]

    def dot4(rows):
        # (TQ, 4) @ (4, TF) -> (TQ, TF) on the MXU
        return jax.lax.dot_general(
            qh, tc[rows],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # rows layout in tc (see wrapper): each group is [vec(3), const(1)]
    numer = dot4(slice(0, 4))            # det(A,B,C) - q.n
    dab = dot4(slice(4, 8)) + qq        # A.B - q.(A+B) + q.q
    dbc = dot4(slice(8, 12)) + qq
    dac = dot4(slice(12, 16)) + qq
    la2 = dot4(slice(16, 20)) + qq      # |A-q|^2
    lb2 = dot4(slice(20, 24)) + qq
    lc2 = dot4(slice(24, 28)) + qq

    la = jnp.sqrt(jnp.maximum(la2, 0.0))
    lb = jnp.sqrt(jnp.maximum(lb2, 0.0))
    lc = jnp.sqrt(jnp.maximum(lc2, 0.0))
    denom = la * lb * lc + dab * lc + dac * lb + dbc * la

    ang = 2.0 * _atan2(numer, denom, approx_recip=approx_recip)
    # The affine form cancels catastrophically when q sits (numerically)
    # on a triangle corner -- exactly the self-winding case, where every
    # vertex is a corner of its ~6 incident faces and the true
    # contribution is 0 (the subtraction-form kernel returns atan2(0,0)=0
    # there). Zero any pair within 1mm of a corner. KNOWN LIMITATION (why
    # this kernel stays experimental, see module STATUS note): at global
    # coordinates ~1m the affine products carry ~1e-7 absolute noise, so
    # angles are garbage for corner distances below ~0.3mm regardless of
    # the mask radius -- and in TIGHT self-contact a query can sit <1mm
    # from a geodesically-distant vertex whose incident triangles carry
    # REAL solid angle. There the mask zeroes up to ~2pi sr and can
    # misclassify a barely-interpenetrated vertex as exterior. The
    # production subtraction-form kernel has no such floor (differences
    # are computed before products).
    near_corner = jnp.minimum(jnp.minimum(la2, lb2), lc2) < _CORNER_EPS2
    ang = jnp.where(near_corner, 0.0, ang)
    partial = jnp.sum(ang, axis=1)[None, None, :]

    @pl.when(fi == 0)
    def _():
        out_ref[...] = partial

    @pl.when(fi > 0)
    def _():
        out_ref[...] = out_ref[...] + partial


def _affine_triangle_constants(tris: jnp.ndarray) -> jnp.ndarray:
    """(B, F, 3, 3) corners -> (B, 28, F) constants for the affine kernel.

    Group layout (7 groups x 4 rows, each [-vec, const] so the kernel's
    [q, 1] dot directly yields const - q.vec):
      0: numer   n = BxC + CxA + AxB,           det(A,B,C)
      1: dab     A+B,                           A.B
      2: dbc     B+C,                           B.C
      3: dac     A+C,                           A.C
      4: la2     2A,                            A.A
      5: lb2     2B,                            B.B
      6: lc2     2C,                            C.C
    """
    A, Bc, C = tris[..., 0, :], tris[..., 1, :], tris[..., 2, :]
    n = (jnp.cross(Bc, C) + jnp.cross(C, A) + jnp.cross(A, Bc))
    det = jnp.sum(A * jnp.cross(Bc, C), axis=-1)

    def group(vec, const):
        return jnp.concatenate([-vec, const[..., None]], axis=-1)

    groups = jnp.concatenate([
        group(n, det),
        group(A + Bc, jnp.sum(A * Bc, -1)),
        group(Bc + C, jnp.sum(Bc * C, -1)),
        group(A + C, jnp.sum(A * C, -1)),
        group(2 * A, jnp.sum(A * A, -1)),
        group(2 * Bc, jnp.sum(Bc * Bc, -1)),
        group(2 * C, jnp.sum(C * C, -1)),
    ], axis=-1)                                   # (B, F, 28)
    return jnp.swapaxes(groups, 1, 2)             # (B, 28, F)


@functools.partial(jax.jit, static_argnames=('tq', 'tf', 'interpret'))
def winding_numbers_pallas_affine(points: jnp.ndarray, verts: jnp.ndarray,
                                  faces: jnp.ndarray, tq: int = 256,
                                  tf: int = 1024,
                                  interpret: bool = False) -> jnp.ndarray:
    """Winding numbers via the MXU-offloaded affine-form kernel.

    STATUS: experimental, NOT used by any production path (kept as a
    measured negative result; covered by interpret-mode tests). Two
    reasons it lost to the subtraction-form kernel: (1) measured
    throughput is neutral (the VPU still owns sqrt/denominator/atan2);
    (2) the affine form's ~1e-7 cancellation noise floor forces a 1mm
    corner mask that zeroes REAL solid angle for queries in tight
    self-contact, flipping barely-interpenetrated vertices to exterior
    (see _winding_affine_kernel mask comment). Decision-safe only for
    geometry without sub-millimeter contact.

    Same contract as winding_numbers_pallas. Padding triangles have all
    constants 0 -> numer 0, denom 0; atan2(0, 0) = 0 in the kernel's
    polynomial (y == 0 branch with x >= 0), so they contribute nothing.
    """
    B, Q, _ = points.shape
    F = faces.shape[0]
    qpad = (-Q) % tq
    fpad = (-F) % tf

    qq = jnp.sum(points * points, axis=-1, keepdims=True)
    pts = jnp.swapaxes(jnp.concatenate([points, qq], axis=-1), 1, 2)
    if qpad:
        pts = jnp.pad(pts, ((0, 0), (0, 0), (0, qpad)))
    tc = _affine_triangle_constants(verts[:, faces, :])
    if fpad:
        tc = jnp.pad(tc, ((0, 0), (0, 0), (0, fpad)))

    Qp, Fp = Q + qpad, F + fpad
    grid = (B, Qp // tq, Fp // tf)

    out = pl.pallas_call(
        functools.partial(_winding_affine_kernel,
                          approx_recip=not interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, tq), lambda b, qi, fi: (b, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 28, tf), lambda b, qi, fi: (b, 0, fi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tq), lambda b, qi, fi: (b, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, Qp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=(7 * 8 + 30) * B * Qp * Fp,
            bytes_accessed=4 * B * (4 * Qp + 28 * Fp + Qp),
            transcendentals=4 * B * Qp * Fp),
        interpret=interpret,
    )(pts, tc)
    return out[:, 0, :Q] * INV_4PI


# The masked-min kernel packs (distance, index) into ONE int32 key so the
# whole search is a single min-reduction pass (no separate argmin pass, no
# two-output select accumulation). Low IDX_BITS mantissa bits of the fp32
# squared distance are replaced by the column index: bitcasting a
# non-negative fp32 to int32 preserves order, so min over keys = min over
# (quantized d2, index). Quantization keeps 23-IDX_BITS = 10 mantissa bits
# (2^-10 relative) -- only near-exact ties can pick a different argmin, and
# the returned squared distance is recomputed EXACTLY from the argmin
# gather afterwards. Measured 65.5 -> ~50 ms at B=64, V=6890 on v5e.
#
# Why the tie window is not a semantics divergence: at contact distances
# (d2 ~ 4e-4, the euclthres=0.02 regime the losses act in) the window is
# 2^-10 * 4e-4 ~ 4e-7 ABSOLUTE on d2 -- smaller than the reference
# implementation's own argmin noise: it selects through Gram-form fp32
# distances (xx + yy - 2xy, tuch/utils/contact.py:36-42) whose
# cancellation error is ~1e-6 absolute. Any neighbor this kernel can
# mis-tie, the reference's argmin can too. Validated against fp64 brute
# force on posed bodies: worst selected-distance delta 7.3e-4 relative.
_IDX_BITS = 13            # supports vertex sets up to 8192 points
_IDX_MASK = (1 << _IDX_BITS) - 1
_BANNED = np.float32(3e38)  # masked-pair sentinel (finite: inf bitcast
                            # patterns would also be order-correct, but a
                            # finite value keeps the key arithmetic clear)


def _masked_min_kernel(x_ref, y_ref, maskt_ref, key_ref):
    """One (TM, TN) tile of the packed-key masked nearest-vertex search.

    The tile is TRANSPOSED relative to the output: queries run along lanes
    (axis 1), the searched vertex set along sublanes (axis 0), so the
    min-reduction is over sublanes -- measured ~1.1x faster than reducing
    across lanes on v5e (41.5 vs 46.7 ms at B=64, V=6890).

    x_ref: (1, 3, TN) query points; y_ref: (1, 3, TM) searched points
    (same vertex set); maskt_ref: (TM, TN) uint8 tile of the TRANSPOSED
    allowed-pairs mask (allowed[searched, query]); output (1, 1, TN) int32
    packed keys, min-accumulated over the searched grid dim.

    Distances are direct coordinate differences on the VPU: exact in fp32,
    unlike an MXU Gram-matrix pass (which truncates operands to bf16) or
    the reference's xx + yy - 2xy form (catastrophic cancellation for
    near-contact pairs, tuch/utils/contact.py:36-42).
    """
    mi = pl.program_id(2)
    tm = y_ref.shape[2]

    x = x_ref[0]          # (3, TN) queries -> lanes
    y = y_ref[0]          # (3, TM) searched -> sublanes
    dx = y[0, :][:, None] - x[0, :][None, :]
    dy = y[1, :][:, None] - x[1, :][None, :]
    dz = y[2, :][:, None] - x[2, :][None, :]
    d2 = dx * dx + dy * dy + dz * dz                   # (TM, TN)
    # int8 vector compares don't lower on TPU; widen to int32 first
    allowed = maskt_ref[...].astype(jnp.int32) > 0
    d2 = jnp.where(allowed, d2, _BANNED)
    bits = pltpu.bitcast(d2, jnp.int32)
    row = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + mi * tm
    key = jax.lax.bitwise_or(
        jax.lax.bitwise_and(bits, jnp.int32(~_IDX_MASK)), row)
    blk = jnp.min(key, axis=0)[None, None, :]

    @pl.when(mi == 0)
    def _():
        key_ref[...] = blk

    @pl.when(mi > 0)
    def _():
        key_ref[...] = jnp.minimum(key_ref[...], blk)


@functools.partial(jax.jit, static_argnames=('tn', 'tm', 'interpret'))
def masked_min_dist_pallas(verts: jnp.ndarray, geomask_u8: jnp.ndarray,
                           tn: int = 2048, tm: int = 512,
                           interpret: bool = False):
    """Geodesic-masked nearest-vertex distances without the (V, V) matrix.

    verts: (B, V, 3); geomask_u8: (V, V) uint8 (1 = allowed).
    Returns (min_d2 (B, V) fp32 [inf where no allowed pair], argmin int32).
    min_d2 is recomputed exactly from the argmin gather (the kernel's
    internal distance ordering is quantized to 10 mantissa bits, see
    _masked_min_kernel; ties within 2^-10 relative may pick either index).
    """
    B, V, _ = verts.shape
    pad = (-V) % int(np.lcm(tn, tm))
    Vp = V + pad
    if Vp > (1 << _IDX_BITS):
        # Key packing runs out of index bits (e.g. SMPL-X at 10475 verts):
        # fall back to the streamed direct-difference search, which is
        # exact and jit-compatible on any backend.
        from tuch_tpu.ops.contact import masked_min_dist
        return masked_min_dist(verts, geomask_u8.astype(bool))
    vp = jnp.pad(verts, ((0, 0), (0, pad), (0, 0)),
                 constant_values=_FAR) if pad else verts
    coords = jnp.swapaxes(vp, 1, 2)                    # (B, 3, Vp)
    # The kernel wants allowed[searched, query]; transpose here so callers
    # keep the natural allowed[query, searched] convention (the geodesic
    # mask is symmetric, so this is a no-op in value for the SMPL mask).
    mask = jnp.swapaxes(geomask_u8, 0, 1)
    if pad:
        mask = jnp.pad(mask, ((0, pad), (0, pad)))     # padded rows banned

    grid = (B, Vp // tn, Vp // tm)
    key = pl.pallas_call(
        _masked_min_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tn), lambda b, ni, mi: (b, 0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tm), lambda b, ni, mi: (b, 0, mi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda b, ni, mi: (mi, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tn), lambda b, ni, mi: (b, 0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, Vp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=12 * B * Vp * Vp,
            bytes_accessed=B * Vp * Vp + 4 * B * Vp * 3 * 2,
            transcendentals=0),
        interpret=interpret,
    )(coords, coords, mask)
    key = key[:, 0, :V]
    arg = jnp.minimum(jax.lax.bitwise_and(key, _IDX_MASK), V - 1)
    # Exact distances via gather; banned-everything rows (keys at the
    # _BANNED sentinel) report inf like the streamed fallback.
    from tuch_tpu.ops.gather_pallas import gather_rows
    nearest = gather_rows(verts, arg)
    d2 = jnp.sum((verts - nearest) ** 2, axis=-1)
    banned_key = jnp.int32(
        np.float32(_BANNED).view(np.int32) & ~_IDX_MASK)
    d2 = jnp.where(key >= banned_key, jnp.inf, d2)
    return d2, arg


def pallas_available() -> bool:
    """True when running on a TPU backend where these kernels compile.

    TUCH_PALLAS=0 forces the streamed jnp fallbacks even on TPU — an
    escape hatch for debugging device faults (isolates Pallas kernels
    from the rest of a program) or working around a Mosaic regression.
    """
    import os
    if os.environ.get('TUCH_PALLAS', '1') == '0':
        return False
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform in ('tpu', 'axon')
    except Exception:  # pragma: no cover
        return False
