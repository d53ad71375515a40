"""Body segments: allowed-self-intersection filtering.

TPU-native redesign of tuch/utils/segmentation.py. Each body segment (crook
of elbow/knee, armpit, ...) is a sub-mesh closed by synthetic "band" faces
over its boundary rings; a vertex of the full body counted as *interior* by
the global winding test is forgiven if it is interior only within its own
segment (reference: tuch/train/loss.py:264-266).

Design differences from the reference:
  * All segment tables are precomputed into padded numpy index arrays at
    construction (host side); the runtime test is pure jnp with static
    shapes, batched via vmap -- no trimesh, no per-segment python in the
    hot path beyond a static unrolled loop over ~9 segments.
  * The "forgiveness" update (reference does in-place numpy indexing on the
    exterior array) becomes a scatter of ones through a precomputed index.
"""

from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tuch_tpu.ops.contact import winding_numbers


class SegmentTables(NamedTuple):
    """Static per-segment data, padded to fixed shapes.

    The `fused_*` arrays pack all S segments into one rectangular problem
    so the runtime test is a SINGLE kernel launch (grid batch axis B*S)
    instead of S launches: vertex ids padded to Ns_max, faces padded to
    Fs_max and remapped into one extended vertex list
    [body verts | all band centroids | one far vertex]; padding faces point
    at the far vertex (zero solid angle), padding points are masked out.
    """
    names: tuple                 # segment names
    vidx: tuple                  # per segment: (Ns,) vertex ids (np)
    band_verts: tuple            # per segment: list of (ring_len,) np arrays
    faces: tuple                 # per segment: (Fs, 3) np int faces into the
                                 # [V + appended band centroids] vertex list
    fused_vidx: np.ndarray       # (S, Ns_max) int32 (pad: 0)
    fused_vmask: np.ndarray      # (S, Ns_max) bool
    fused_faces: np.ndarray      # (S, Fs_max, 3) int32 into extended verts
    ring_idx: np.ndarray         # (C, L_max) int32 band-ring vertex ids
    ring_w: np.ndarray           # (C, L_max) f32 mean weights (0 on padding)
    num_verts: int               # V (static)


def build_segment_tables(segments: Dict[str, dict], faces: np.ndarray,
                         num_verts: int) -> SegmentTables:
    """Precompute closed sub-meshes for each segment.

    segments: name -> {'vidx': (Ns,) vertex ids, 'bands_verts': [rings]}.
    faces: (F, 3) full-body faces. For each segment, faces fully inside the
    segment are kept and each boundary ring is closed with a fan to an
    appended centroid vertex (reference: segmentation.py:56-66).
    """
    names, vidxs, bands, segfaces = [], [], [], []
    for name, seg in segments.items():
        vidx = np.asarray(seg['vidx'], dtype=np.int64)
        inseg = np.zeros(num_verts, dtype=bool)
        inseg[vidx] = True
        keep = inseg[faces].all(axis=1)
        f_seg = faces[keep].astype(np.int64)
        band_faces = []
        for bi, ring in enumerate(seg['bands_verts']):
            ring = np.asarray(ring, dtype=np.int64)
            new_vert = num_verts + bi  # appended centroid index
            for i in range(len(ring) - 1):
                band_faces.append([ring[i + 1], ring[i], new_vert])
            # close the ring loop
            band_faces.append([ring[0], ring[-1], new_vert])
        all_faces = np.concatenate(
            [f_seg, np.asarray(band_faces, dtype=np.int64).reshape(-1, 3)],
            axis=0) if band_faces else f_seg
        names.append(name)
        vidxs.append(vidx)
        bands.append([np.asarray(r, dtype=np.int64)
                      for r in seg['bands_verts']])
        segfaces.append(all_faces)

    # ---- fused rectangular layout (one launch for all segments) ----------
    S = len(names)
    rings_flat = [r for seg_bands in bands for r in seg_bands]
    C = len(rings_flat)
    L_max = max((len(r) for r in rings_flat), default=1)
    ring_idx = np.zeros((C, L_max), np.int32)
    ring_w = np.zeros((C, L_max), np.float32)
    for ci, r in enumerate(rings_flat):
        ring_idx[ci, :len(r)] = r
        ring_w[ci, :len(r)] = 1.0 / len(r)

    far_idx = num_verts + C
    Ns_max = max((len(v) for v in vidxs), default=1)
    Fs_max = max((f.shape[0] for f in segfaces), default=1)
    fused_vidx = np.zeros((S, Ns_max), np.int32)
    fused_vmask = np.zeros((S, Ns_max), bool)
    fused_faces = np.full((S, Fs_max, 3), far_idx, np.int32)
    ring_off = 0
    for si in range(S):
        v = vidxs[si]
        fused_vidx[si, :len(v)] = v
        fused_vmask[si, :len(v)] = True
        f = segfaces[si].copy()
        # per-segment centroid ids (num_verts + bi) -> global centroid rows
        # at num_verts + ring_off + bi
        band = f >= num_verts
        f[band] += ring_off
        fused_faces[si, :f.shape[0]] = f
        ring_off += len(bands[si])

    return SegmentTables(names=tuple(names), vidx=tuple(vidxs),
                         band_verts=tuple(bands), faces=tuple(segfaces),
                         fused_vidx=fused_vidx, fused_vmask=fused_vmask,
                         fused_faces=fused_faces, ring_idx=ring_idx,
                         ring_w=ring_w, num_verts=num_verts)


def segment_exterior_per_segment(tables: SegmentTables,
                                 vertices: jnp.ndarray) -> List[jnp.ndarray]:
    """Per-segment exterior test for the segment's own vertices.

    vertices: (B, V, 3). Returns a list over segments of (B, Ns) bool arrays:
    True where the segment vertex is exterior *of its own closed segment
    mesh* (reference: segmentation.py:81-99).
    """
    from tuch_tpu.ops import contact_pallas as cpk

    use_pallas = cpk.pallas_available()
    out = []
    for vidx, bands, faces in zip(tables.vidx, tables.band_verts,
                                  tables.faces):
        extra = [jnp.mean(vertices[:, jnp.asarray(ring), :], axis=1,
                          keepdims=True) for ring in bands]
        verts_ext = jnp.concatenate([vertices] + extra, axis=1)
        pts = vertices[:, jnp.asarray(vidx), :]     # (B, Ns, 3)
        if use_pallas:
            wn = cpk.winding_numbers_pallas(pts, verts_ext,
                                            jnp.asarray(faces))
        else:
            tris = verts_ext[:, jnp.asarray(faces), :]  # (B, Fs, 3, 3)
            wn = winding_numbers(pts, tris,
                                 block_f=min(1024, faces.shape[0]))
        out.append(wn <= 0.99)
    return out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def segment_exterior_fused(tables: SegmentTables, vertices: jnp.ndarray,
                           interpret: bool = False):
    """All segments' exterior tests in ONE winding evaluation.

    vertices: (B, V, 3). Returns (B, S, Ns_max) bool; padded slots are
    True (exterior == "nothing to forgive"). Equivalent to
    segment_exterior_per_segment but the S sub-problems are flattened into
    the kernel's batch axis (grid B*S) -- one Pallas launch instead of S
    (reference semantics: tuch/utils/segmentation.py:81-99).
    """
    from tuch_tpu.ops import contact_pallas as cpk

    B, V, _ = vertices.shape
    S, Ns = tables.fused_vidx.shape
    Fs = tables.fused_faces.shape[1]

    # Band-ring centroids for every segment at once: (B, C, 3).
    ring_idx = jnp.asarray(tables.ring_idx)
    ring_w = jnp.asarray(tables.ring_w)
    cent = jnp.einsum('cl,bcld->bcd', ring_w, vertices[:, ring_idx, :])
    far = jnp.full((B, 1, 3), 1e7, vertices.dtype)
    verts_ext = jnp.concatenate([vertices, cent, far], axis=1)

    fv = jnp.asarray(tables.fused_vidx)
    pts = vertices[:, fv.reshape(-1), :].reshape(B * S, Ns, 3)
    ff = jnp.asarray(tables.fused_faces)
    tris = verts_ext[:, ff.reshape(-1), :].reshape(B * S, Fs, 3, 3)

    if cpk.pallas_available() or interpret:
        tq = min(512, _round_up(Ns, 128))
        tf = min(2048, _round_up(Fs, 128))
        wn = cpk.winding_numbers_pallas_tris(pts, tris, tq=tq, tf=tf,
                                             interpret=interpret)
    else:
        wn = winding_numbers(pts, tris, block_f=min(1024, Fs))
    ext = (wn <= 0.99).reshape(B, S, Ns)
    return ext | ~jnp.asarray(tables.fused_vmask)[None]


def forgive_segment_interiors(tables: SegmentTables,
                              vertices: jnp.ndarray,
                              exterior: jnp.ndarray) -> jnp.ndarray:
    """Mark vertices interior only within their own segment as exterior.

    exterior: (B, V) bool from the global winding test. A segment vertex
    whose segment-local test says "interior" is an *allowed* self
    intersection; the reference then flips the global flag to exterior
    (tuch/train/loss.py:264-266 -- note it flips where segm_ext == 0).
    Pure scatter-based equivalent: exterior[v] |= ~segment_exterior[v],
    done as one scatter-max over the fused (S, Ns_max) layout.
    """
    seg_ext = segment_exterior_fused(tables, vertices)  # (B, S, Ns)
    B = vertices.shape[0]
    upd = (~seg_ext & jnp.asarray(tables.fused_vmask)[None]).reshape(B, -1)
    idx = jnp.asarray(tables.fused_vidx).reshape(-1)
    forgiven = jnp.zeros(exterior.shape, jnp.int32).at[:, idx].max(
        upd.astype(jnp.int32))
    return exterior | (forgiven > 0)
