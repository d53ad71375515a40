"""Hierarchical winding numbers: exact near-field + dipole far-field.

TPU-native adaptation of "Fast Winding Numbers for Soups and Clouds"
(Barill et al., SIGGRAPH 2018 -- the paper the reference cites at
tuch/utils/contact.py:124 but does not implement). Instead of a tree, the
structure is flat and tile-granular so it maps onto the Pallas grid:

  * faces are permuted once (host, from the template) into K spatially
    compact clusters of C triangles (Morton order of face centroids);
  * per call, cluster centroids / area vectors / radii come from the posed
    vertices in one cheap XLA pass;
  * each 512-point tile selects its M nearest clusters (top-k on tile ->
    cluster distances); those get the exact Van Oosterom-Strackee sum in a
    Pallas kernel whose triangle block is chosen by scalar-prefetch
    indexing; all other clusters contribute their dipole term
    a_k . (c_k - p) / |c_k - p|^3, evaluated densely in XLA.

STATUS: experimental, NOT wired into the default loss path. Measured on
v5e-1 at SMPL size the end-to-end win is only ~1.1-1.7x: the exact Pallas
kernel already sits at the VPU roofline and the small near-field programs
pay proportionally more grid/DMA overhead, while the XLA far-field pass
adds ~100 ms at B=64. The in/out *decisions* match the exact kernel
(0 flips at M>=8 on posed-body tests) but pointwise winding values near
unselected cluster boundaries are approximate. Revisit when a fused
far-field (matmul-form dipole) or larger-mesh workloads change the
trade-off; until then `exterior_refresh_every` and `contact_candidate_k`
(losses/smplify.py contact_neighbors -- restricts the QUERY axis instead
of approximating the triangle axis, ~2.5x measured with near-identical
fit quality) are the better speed knobs.
"""

from typing import NamedTuple

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


class WindingClusters(NamedTuple):
    """Static clustering tables (host-precomputed from the template)."""
    face_perm: jnp.ndarray    # (K*C,) permutation of face indices
    faces_sorted: jnp.ndarray  # (K*C, 3) faces in cluster order (padded)
    vert_perm: jnp.ndarray    # (Qp,) spatial permutation of vertices
    vert_inv: jnp.ndarray     # (Qp,) inverse permutation
    num_clusters: int         # K
    cluster_size: int         # C
    tile_q: int               # TQ
    num_real_verts: int       # V (before padding)
    num_real_faces: int       # F


def _morton_code(x: np.ndarray, bits: int = 10) -> np.ndarray:
    """Interleave 3D quantized coords into a Morton code."""
    mn = x.min(axis=0)
    span = (x.max(axis=0) - mn).max() + 1e-9
    q = np.clip(((x - mn) / span * (2 ** bits - 1)).astype(np.int64), 0,
                2 ** bits - 1)

    def spread(v):
        out = np.zeros_like(v)
        for b in range(bits):
            out |= ((v >> b) & 1) << (3 * b)
        return out

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def build_winding_clusters(template_verts: np.ndarray, faces: np.ndarray,
                           cluster_size: int = 256, tile_q: int = 512
                           ) -> WindingClusters:
    template_verts = np.asarray(template_verts)
    faces = np.asarray(faces)
    F = faces.shape[0]
    V = template_verts.shape[0]

    centroids = template_verts[faces].mean(axis=1)
    face_order = np.argsort(_morton_code(centroids))
    pad_f = (-F) % cluster_size
    # pad with repeats of the last face; contributions are compensated by
    # a validity weight baked into the cluster tables? Simpler: pad with a
    # degenerate face (all three corners the same vertex) -> exact solid
    # angle 0 and zero area vector, so both near and far paths ignore it.
    degen = np.full((pad_f,), faces[face_order[-1]][0])
    faces_sorted = np.concatenate(
        [faces[face_order],
         np.stack([degen, degen, degen], axis=-1)], axis=0) \
        if pad_f else faces[face_order]
    face_perm = np.concatenate(
        [face_order, np.full(pad_f, face_order[-1])]) if pad_f \
        else face_order

    vert_order = np.argsort(_morton_code(template_verts))
    pad_q = (-V) % tile_q
    vert_perm = np.concatenate(
        [vert_order, np.full(pad_q, vert_order[-1])]) if pad_q \
        else vert_order
    vert_inv = np.zeros(V, np.int64)
    vert_inv[vert_order] = np.arange(V)

    return WindingClusters(
        face_perm=jnp.asarray(face_perm.astype(np.int32)),
        faces_sorted=jnp.asarray(faces_sorted.astype(np.int32)),
        vert_perm=jnp.asarray(vert_perm.astype(np.int32)),
        vert_inv=jnp.asarray(vert_inv.astype(np.int32)),
        num_clusters=(F + pad_f) // cluster_size,
        cluster_size=cluster_size,
        tile_q=tile_q,
        num_real_verts=V,
        num_real_faces=F)


def _near_kernel(sel_ref, pts_ref, tris_ref, out_ref):
    """Exact solid angles of one selected cluster vs one point tile.

    pts_ref: (1, 3, TQ); tris_ref: (1, 1, 9, C); out_ref: (1, 1, TQ).
    Accumulates over the m grid dimension (innermost).
    """
    from tuch_tpu.ops.contact_pallas import _atan2

    m = pl.program_id(2)

    q = pts_ref[0]
    t = tris_ref[0, 0]      # (9, C)
    qx = q[0, :][:, None]
    qy = q[1, :][:, None]
    qz = q[2, :][:, None]
    ax = t[0, :][None, :] - qx
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
    numer = (ax * (by * cz - bz * cy) + ay * (bz * cx - bx * cz)
             + az * (bx * cy - by * cx))
    dab = ax * bx + ay * by + az * bz
    dbc = bx * cx + by * cy + bz * cz
    dac = ax * cx + ay * cy + az * cz
    denom = la * lb * lc + dab * lc + dac * lb + dbc * la
    ang = 2.0 * _atan2(numer, denom)
    # NOTE: this tile body intentionally mirrors (not shares)
    # contact_pallas._winding_kernel and stays on the EXACT-divide path;
    # the production kernel's approx_recip tuning does not apply to this
    # documented negative result.
    part_sum = jnp.sum(ang, axis=1)[None, None, :]

    @pl.when(m == 0)
    def _():
        out_ref[...] = part_sum

    @pl.when(m > 0)
    def _():
        out_ref[...] = out_ref[...] + part_sum


def winding_numbers_hier(verts: jnp.ndarray,
                         clusters: WindingClusters,
                         num_near: int = 16,
                         interpret: bool = False) -> jnp.ndarray:
    """Winding numbers of a mesh's own vertices w.r.t. itself.

    verts: (B, V, 3) -> (B, V) generalized winding numbers. Restriction to
    query==vertices covers the framework's hot paths (the HD offset path
    keeps the exact kernel).
    """
    B = verts.shape[0]
    V = clusters.num_real_verts
    TQ = clusters.tile_q
    C = clusters.cluster_size
    K = clusters.num_clusters
    M = min(num_near, K)

    pts = verts[:, clusters.vert_perm, :]           # (B, Qp, 3)
    Qp = pts.shape[1]
    T = Qp // TQ

    tris = verts[:, clusters.faces_sorted, :]       # (B, K*C, 3, 3)
    tris_k = tris.reshape(B, K, C, 3, 3)

    # Cluster summaries from posed geometry.
    c_cent = tris_k.mean(axis=(2, 3))               # (B, K, 3)
    e1 = tris_k[..., 1, :] - tris_k[..., 0, :]
    e2 = tris_k[..., 2, :] - tris_k[..., 0, :]
    a_vec = 0.5 * jnp.cross(e1, e2).sum(axis=2)     # (B, K, 3)
    c_rad = jnp.linalg.norm(
        tris_k.reshape(B, K, C * 3, 3) - c_cent[:, :, None, :], axis=-1
    ).max(axis=2)                                   # (B, K)

    # Tile summaries.
    pts_t = pts.reshape(B, T, TQ, 3)
    t_cent = pts_t.mean(axis=2)                     # (B, T, 3)

    # Near selection: M clusters with smallest surface-to-tile distance.
    d_tc = jnp.linalg.norm(t_cent[:, :, None, :] - c_cent[:, None, :, :],
                           axis=-1) - c_rad[:, None, :]
    _, sel = jax.lax.top_k(-d_tc, M)                # (B, T, M) int32
    sel = sel.astype(jnp.int32)

    # Far field: dipole of every cluster at every point, minus the ones
    # that are handled exactly. The denominator is clamped to the cluster
    # radius: the dipole is only valid outside the cluster, and a point
    # inside an *unselected* cluster (possible at tile boundaries) must
    # not blow up the sum.
    diff = c_cent[:, None, :, :] - pts[:, :, None, :]   # (B, Qp, K, 3)
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.maximum(d2, (c_rad[:, None, :] ** 2))
    inv_d3 = d2 ** -1.5
    dip = jnp.einsum('bkd,bqkd->bqk', a_vec, diff) * inv_d3  # (B, Qp, K)
    far_all = dip.sum(axis=-1)                      # (B, Qp)
    sel_per_point = jnp.repeat(sel, TQ, axis=1)     # (B, Qp, M)
    far_sel = jnp.take_along_axis(dip, sel_per_point, axis=2).sum(-1)
    far = far_all - far_sel

    # Near field: exact Pallas sum over the selected clusters.
    pts_soa = jnp.swapaxes(pts, 1, 2)               # (B, 3, Qp)
    tris_soa = tris_k.reshape(B, K, C, 9).transpose(0, 1, 3, 2)
    # (B, K, 9, C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T, M),
        in_specs=[
            pl.BlockSpec((1, 3, TQ), lambda b, t, m, sel_ref: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, C),
                         lambda b, t, m, sel_ref:
                         (b, sel_ref[b, t, m], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TQ),
                               lambda b, t, m, sel_ref: (b, 0, t),
                               memory_space=pltpu.VMEM),
    )
    near = pl.pallas_call(
        _near_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, Qp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=75 * B * Qp * M * C,
            bytes_accessed=4 * B * (3 * Qp + 9 * K * C + Qp),
            transcendentals=4 * B * Qp * M * C),
        interpret=interpret,
    )(sel, pts_soa, tris_soa)[:, 0, :]

    wn_sorted = (near + far) * INV_4PI
    return wn_sorted[:, clusters.vert_inv]
