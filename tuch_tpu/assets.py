"""Asset loading and synthetic stand-ins.

The reference depends on a set of gitignored downloads (SMPL model pkls,
smpl_mean_params.npz, GMM prior, geodesic matrix, HD regressor, body
segments, DSC region classes; see configs/config.py:74-91 and SURVEY.md
section 2.10). This module provides:

  * loaders for the real assets when present (including chumpy-pickled SMPL
    model files, loaded without chumpy via an unpickling shim), and
  * deterministic synthetic stand-ins with the exact same schema and -- for
    the "full" size -- the exact SMPL topology sizes (6890 vertices, 13776
    faces), so tests run hermetically and benchmarks have true FLOP parity.

The synthetic body is a closed UV-sphere (segments=82, rings=86 gives
exactly 6890 vertices / 13776 triangles), which matters for the contact
machinery: generalized winding numbers are only meaningful on closed meshes.
"""

import io
import os
import pickle
import sys
import types
from typing import Dict, List, NamedTuple, Tuple

import numpy as np

from tuch_tpu import constants
from tuch_tpu.models.smpl import SMPLModel

# SMPL kinematic tree (public model topology).
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
     18, 19, 20, 21], dtype=np.int32)


# ---------------------------------------------------------------------------
# Synthetic meshes
# ---------------------------------------------------------------------------

def uv_sphere(segments: int, rings: int, radius: float = 1.0
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Closed triangulated UV sphere.

    V = segments*(rings-2) + 2 vertices, F = 2*segments*(rings-2) triangles,
    outward-oriented. rings counts latitude lines including both poles.
    """
    assert rings >= 3
    n_lat = rings - 2  # interior latitude rings
    theta = np.pi * np.arange(1, n_lat + 1) / (n_lat + 1)
    phi = 2 * np.pi * np.arange(segments) / segments
    z = radius * np.cos(theta)[:, None]
    r = radius * np.sin(theta)[:, None]
    ring_verts = np.stack(
        [np.broadcast_to(r * np.cos(phi)[None], (n_lat, segments)),
         np.broadcast_to(r * np.sin(phi)[None], (n_lat, segments)),
         np.broadcast_to(z, (n_lat, segments))],
        axis=-1).reshape(-1, 3)
    verts = np.concatenate([
        np.array([[0.0, 0.0, radius]]), ring_verts,
        np.array([[0.0, 0.0, -radius]])], axis=0).astype(np.float32)
    south = verts.shape[0] - 1

    j = np.arange(segments)
    jn = (j + 1) % segments
    ring0 = 1 + j
    top = np.stack([np.zeros_like(j), ring0, 1 + jn], axis=-1)
    i = np.arange(n_lat - 1)[:, None]
    a = 1 + i * segments + j[None]
    b = 1 + i * segments + jn[None]
    c = 1 + (i + 1) * segments + j[None]
    d = 1 + (i + 1) * segments + jn[None]
    quads = np.concatenate(
        [np.stack([a, c, d], -1).reshape(-1, 3),
         np.stack([a, d, b], -1).reshape(-1, 3)], axis=0)
    last = 1 + (n_lat - 1) * segments
    bottom = np.stack([last + j, np.full_like(j, south), last + jn],
                      axis=-1)
    faces = np.concatenate([top, quads, bottom], axis=0)
    return verts, faces.astype(np.int32)


class SyntheticExtras(NamedTuple):
    """Everything beyond the core body model that the TUCH stack needs."""
    geodists: np.ndarray          # (V, V) float32 geodesic distances
    segments: dict                # name -> dict(vidx, bands_verts)
    contact_classes: list         # list of (region_a, region_b) name pairs
    contact_csig: dict            # region name -> vertex id array
    mean_pose6d: np.ndarray       # (144,) 6d pose init for HMR
    mean_shape: np.ndarray        # (10,)
    mean_cam: np.ndarray          # (3,)
    hd_vert_ids: np.ndarray       # (H, k) SMPL vert ids per HD point
    hd_bary: np.ndarray           # (H, k) barycentric weights
    hd_geovec: np.ndarray         # (H,) face index each HD vert samples from


def _sphere_params(num_verts: int) -> Tuple[int, int]:
    """segments, rings for a UV sphere with ~num_verts vertices."""
    if num_verts >= constants.SMPL_NUM_VERTS:
        return 82, 86  # exactly 6890 verts / 13776 faces
    # small test model
    segs = max(8, int(np.sqrt(num_verts)))
    n_lat = max(3, (num_verts - 2) // segs)
    return segs, n_lat + 2


def synthetic_smpl(num_verts: int = constants.SMPL_NUM_VERTS,
                   seed: int = 0, with_contact: bool = True
                   ) -> Tuple[SMPLModel, SyntheticExtras]:
    """Deterministic synthetic SMPL-schema body model on a closed sphere.

    with_contact=False skips the (V, V) geodesic matrix (~190 MB + an
    arccos pass at full size) -- inference-only runtimes neither need nor
    should pay for it; extras.geodists is then None.
    """
    rng = np.random.RandomState(seed)
    segs, rings = _sphere_params(num_verts)
    sphere, faces = uv_sphere(segs, rings)
    V = sphere.shape[0]
    J = constants.SMPL_NUM_JOINTS
    S = constants.SMPL_NUM_BETAS

    # Body-ish template: squash the sphere into an ellipsoid and rotate the
    # poles onto +y (SMPL's up axis) with a proper rotation (x, z, -y) so
    # face orientation stays outward.
    ell = sphere * np.array([0.35, 0.18, 0.9], dtype=np.float32)
    v_template = np.stack([ell[:, 0], ell[:, 2], -ell[:, 1]],
                          axis=-1).astype(np.float32)

    # 24 joints along/around the vertical (y) axis, inside the body.
    ys = np.linspace(-0.75, 0.75, J)
    joint_pos = np.stack([0.08 * np.sin(np.arange(J)), ys,
                          0.04 * np.cos(np.arange(J))], axis=-1)
    joint_pos = joint_pos.astype(np.float32)

    # J_regressor: softmax of negative distance to each joint (rows sum to 1).
    d = np.linalg.norm(v_template[None, :, :] - joint_pos[:, None, :], axis=-1)
    J_regressor = np.exp(-d ** 2 / 0.01)
    J_regressor /= J_regressor.sum(axis=1, keepdims=True)

    # Skinning weights: smooth softmax over joints, at most 4 significant.
    w = np.exp(-d.T ** 2 / 0.05)  # (V, J)
    lbs_weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)

    # Low-frequency shape directions: random linear+quadratic fields.
    A1 = rng.randn(S, 3, 3).astype(np.float32) * 0.02
    shapedirs = np.einsum('sde,ve->vds', A1, v_template)
    shapedirs += rng.randn(1, 3, S).astype(np.float32) * 0.002

    P = 9 * (J - 1)
    posedirs = (rng.randn(V, 3, P).astype(np.float32) * 1e-3)

    vj = np.array([constants.VERTEX_JOINT_IDS[n] % V
                   for n in constants.VERTEX_JOINT_ORDER], dtype=np.int32)

    Jx = np.zeros((9, V), dtype=np.float32)
    for r in range(9):
        cols = rng.choice(V, size=8, replace=False)
        Jx[r, cols] = 1.0 / 8

    model = SMPLModel(
        v_template=v_template,
        shapedirs=shapedirs.astype(np.float32),
        posedirs=posedirs,
        J_regressor=J_regressor.astype(np.float32),
        lbs_weights=lbs_weights,
        parents=SMPL_PARENTS,
        faces=faces,
        vertex_joint_ids=vj,
        J_regressor_extra=Jx,
        joint_map=constants.JOINT_MAP_49.copy(),
    )

    # Geodesic distances: great-circle distance on the template sphere
    # (float32 throughout; the V^2 matrix is ~190 MB at full size).
    geodists = None
    if with_contact:
        unit = (sphere / np.linalg.norm(sphere, axis=-1, keepdims=True)
                ).astype(np.float32)
        cos = unit @ unit.T
        np.clip(cos, -1.0, 1.0, out=cos)
        geodists = np.arccos(cos, out=cos)

    # Segments: narrow latitude-band patches (closed by boundary rings).
    # The reference's segments are small local patches -- crooks of elbows/
    # knees, armpits (tuch/utils/segmentation.py:40, TUCH paper sec. 3) of a
    # few hundred vertices each, NOT whole-body regions. Size the synthetic
    # stand-ins to that scale (9 patches x ~3 rings ~ 250 verts) so synthetic
    # benchmarks pay a realistic segment-test cost; whole-body bands would
    # inflate the fused winding problem ~25x over the real assets.
    n_lat = rings - 2
    ring_ids = lambda i: np.arange(1 + i * segs, 1 + (i + 1) * segs)
    n_seg = min(9, max(1, n_lat // 4))
    spacing = n_lat // n_seg
    width = max(1, min(3, spacing - 2))
    segments = {}
    for si in range(n_seg):
        lo = si * spacing + (spacing - width) // 2
        hi = lo + width
        lo, hi = max(lo, 1), min(hi, n_lat - 1)  # keep boundary rings valid
        vidx = np.concatenate([ring_ids(i) for i in range(lo, hi)])
        bands = [ring_ids(lo - 1).tolist(), ring_ids(hi).tolist()]
        segments[f'patch{si}'] = {'vidx': vidx.astype(np.int64),
                                  'bands_verts': bands}

    # Contact regions: longitude sectors (geometrically contiguous patches).
    n_regions = 8
    phi = np.arctan2(sphere[:, 1], sphere[:, 0])
    sector = ((phi + np.pi) / (2 * np.pi) * n_regions).astype(int) % n_regions
    csig = {f'reg{r}': np.where(sector == r)[0].astype(np.int64)
            for r in range(n_regions)}
    classes = [(f'reg{a}', f'reg{b}')
               for a in range(n_regions) for b in range(a + 1, n_regions)][:12]

    # HMR mean params: identity 6d rotations (row-interleaved layout
    # [r11, r12, r21, r22, r31, r32]), zero shape, typical camera.
    ident6d = np.tile(np.array([1, 0, 0, 1, 0, 0], dtype=np.float32), (J,))
    mean_cam = np.array([0.9, 0.0, 0.0], dtype=np.float32)

    # Synthetic HD surface: one sample point per face (its barycenter),
    # H = F, stored directly in compact barycentric form.
    F = faces.shape[0]
    hd_vert_ids = faces.astype(np.int32)
    hd_bary = np.full((F, 3), 1.0 / 3, dtype=np.float32)
    hd_geovec = np.arange(F, dtype=np.int32)

    extras = SyntheticExtras(
        geodists=geodists,
        segments=segments,
        contact_classes=classes,
        contact_csig=csig,
        mean_pose6d=ident6d,
        mean_shape=np.zeros(S, dtype=np.float32),
        mean_cam=mean_cam,
        hd_vert_ids=hd_vert_ids,
        hd_bary=hd_bary,
        hd_geovec=hd_geovec,
    )
    return model, extras


# ---------------------------------------------------------------------------
# Real asset loaders
# ---------------------------------------------------------------------------

class _Ch:
    """Stand-in for chumpy.ch.Ch: holds the wrapped array in .x.

    Module-level (not function-local) so instances round-trip through
    pickle by global reference; __module__/__qualname__ are rebound to
    'chumpy.ch'/'Ch' by _install_chumpy_stub.
    """

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})

    def __array__(self, dtype=None):
        arr = np.asarray(self.__dict__.get('x'))
        return arr.astype(dtype) if dtype is not None else arr


def _install_chumpy_stub():
    """Allow unpickling chumpy-saved SMPL pkls without chumpy installed."""
    if 'chumpy' in sys.modules:
        return

    _Ch.__module__ = 'chumpy.ch'
    _Ch.__qualname__ = 'Ch'
    chumpy = types.ModuleType('chumpy')
    chumpy.Ch = _Ch
    ch_mod = types.ModuleType('chumpy.ch')
    ch_mod.Ch = _Ch
    reordering = types.ModuleType('chumpy.reordering')
    for name in ('Select', 'transpose', 'reshape'):
        setattr(reordering, name, _Ch)
    chumpy.ch = ch_mod
    sys.modules['chumpy'] = chumpy
    sys.modules['chumpy.ch'] = ch_mod
    sys.modules['chumpy.reordering'] = reordering


def _to_np(x) -> np.ndarray:
    if hasattr(x, 'toarray'):  # scipy sparse
        return np.asarray(x.toarray())
    return np.asarray(x)


def load_smpl_pkl(path: str) -> SMPLModel:
    """Load a real SMPL model .pkl (chumpy format) into an SMPLModel.

    Mirrors what the smplx package extracts from the same file (which the
    reference uses through smplx.SMPL; tuch/models/smpl.py:34-42), plus the
    SPIN extra-joint machinery when the side assets are available.
    """
    _install_chumpy_stub()
    with open(path, 'rb') as f:
        data = pickle.load(f, encoding='latin1')

    v_template = _to_np(data['v_template']).astype(np.float32)
    V = v_template.shape[0]
    shapedirs = _to_np(data['shapedirs']).astype(np.float32)[:, :, :10]
    posedirs = _to_np(data['posedirs']).astype(np.float32)
    # smplx stores posedirs as (V, 3, P); some dumps are (P, V*3).
    if posedirs.ndim == 2:
        posedirs = posedirs.reshape(-1, V, 3).transpose(1, 2, 0)
    J_regressor = _to_np(data['J_regressor']).astype(np.float32)
    lbs_weights = _to_np(data['weights']).astype(np.float32)
    parents = _to_np(data['kintree_table'])[0].astype(np.int64)
    parents[0] = -1
    faces = _to_np(data['f']).astype(np.int32)

    vj = np.array([constants.VERTEX_JOINT_IDS[n]
                   for n in constants.VERTEX_JOINT_ORDER], dtype=np.int32)
    return SMPLModel(
        v_template=v_template, shapedirs=shapedirs, posedirs=posedirs,
        J_regressor=J_regressor, lbs_weights=lbs_weights,
        parents=parents.astype(np.int32), faces=faces,
        vertex_joint_ids=vj,
        J_regressor_extra=np.zeros((9, V), dtype=np.float32),
        joint_map=constants.JOINT_MAP_49.copy())


def load_extra_joint_regressor(model: SMPLModel, path: str) -> SMPLModel:
    """Attach J_regressor_extra.npy (reference: configs/config.py:77)."""
    Jx = np.load(path).astype(np.float32)
    return model._replace(J_regressor_extra=Jx)


def load_mean_params(path: str):
    """smpl_mean_params.npz -> (pose6d(144,), shape(10,), cam(3,))."""
    d = np.load(path)
    return (np.asarray(d['pose'], dtype=np.float32).reshape(-1),
            np.asarray(d['shape'], dtype=np.float32).reshape(-1),
            np.asarray(d['cam'], dtype=np.float32).reshape(-1))


def load_gmm_prior(path: str):
    """gmm_08.pkl -> dict(means, covs, weights) as float32 numpy arrays.

    Same file the reference loads at tuch/smplify/prior.py:55-76.
    """
    with open(path, 'rb') as f:
        gmm = pickle.load(f, encoding='latin1')
    if isinstance(gmm, dict):
        means, covs, weights = gmm['means'], gmm['covars'], gmm['weights']
    else:  # sklearn GMM object
        means, covs, weights = gmm.means_, gmm.covars_, gmm.weights_
    return {'means': np.asarray(means, np.float32),
            'covs': np.asarray(covs, np.float32),
            'weights': np.asarray(weights, np.float32)}


def synthetic_gmm_prior(num_gaussians: int = 8, dim: int = 69, seed: int = 0):
    """Synthetic GMM prior with the gmm_08.pkl schema."""
    rng = np.random.RandomState(seed)
    means = rng.randn(num_gaussians, dim).astype(np.float32) * 0.1
    covs = []
    for _ in range(num_gaussians):
        a = rng.randn(dim, dim).astype(np.float32) * 0.05
        covs.append(a @ a.T + np.eye(dim, dtype=np.float32) * 0.5)
    weights = rng.dirichlet(np.ones(num_gaussians)).astype(np.float32)
    return {'means': means, 'covs': np.stack(covs), 'weights': weights}
