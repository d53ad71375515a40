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
    """Static per-segment data, padded to fixed shapes."""
    names: tuple                 # segment names
    vidx: tuple                  # per segment: (Ns,) vertex ids (np)
    band_verts: tuple            # per segment: list of (ring_len,) np arrays
    faces: tuple                 # per segment: (Fs, 3) np int faces into the
                                 # [V + appended band centroids] vertex list


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
    return SegmentTables(names=tuple(names), vidx=tuple(vidxs),
                         band_verts=tuple(bands), faces=tuple(segfaces))


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


def forgive_segment_interiors(tables: SegmentTables,
                              vertices: jnp.ndarray,
                              exterior: jnp.ndarray) -> jnp.ndarray:
    """Mark vertices interior only within their own segment as exterior.

    exterior: (B, V) bool from the global winding test. A segment vertex
    whose segment-local test says "interior" is an *allowed* self
    intersection; the reference then flips the global flag to exterior
    (tuch/train/loss.py:264-266 -- note it flips where segm_ext == 0).
    Pure scatter-based equivalent: exterior[v] |= ~segment_exterior[v].
    """
    seg_ext = segment_exterior_per_segment(tables, vertices)
    for vidx, ext_s in zip(tables.vidx, seg_ext):
        upd = jnp.logical_not(ext_s)  # interior within own segment
        idx = jnp.asarray(vidx)
        cur = exterior[:, idx]
        exterior = exterior.at[:, idx].set(cur | upd)
    return exterior
