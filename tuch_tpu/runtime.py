"""Runtime assembly: build models + static assets for CLIs, tests, benches.

This is the analog of the wiring in the reference's entry points
(train.py:37-113, eval.py:90-120): load (or synthesize) the body model,
priors, contact tables, segments, HD surface, and the HMR network, and pack
them into the static structures the jitted step functions close over.
"""

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tuch_tpu import assets as assets_mod
from tuch_tpu import config as cfg
from tuch_tpu import constants
from tuch_tpu.losses.prior import create_gmm_prior
from tuch_tpu.losses.regressor import HDAssets, compact_hd_regressor
from tuch_tpu.losses.smplify import ContactAssets
from tuch_tpu.models import hmr as hmr_mod
from tuch_tpu.models.smpl import SMPLModel
from tuch_tpu.ops import contact as contact_ops
from tuch_tpu.ops.segments import build_segment_tables
from tuch_tpu.train.module import TuchAssets


class Runtime(NamedTuple):
    smpl: SMPLModel
    assets: TuchAssets
    extras: assets_mod.SyntheticExtras
    hmr: hmr_mod.HMR
    variables: dict
    contact_classes: list
    geodists: np.ndarray


def build_runtime(options=None, synthetic: Optional[bool] = None,
                  num_verts: Optional[int] = None, seed: int = 0,
                  with_segments: bool = True, with_hd: bool = True,
                  with_contact: bool = True,
                  img_res: int = 224, init_rng: int = 0) -> Runtime:
    """Build all models/assets. synthetic=None auto-detects: real assets are
    used when the SMPL model dir exists, else synthetic stand-ins.

    with_contact=False skips the contact machinery (geodesics, DSC region
    classes, GMM prior): in real-asset mode those files are then not even
    required on disk, so inference-only entry points (demo_tuch, eval,
    parity) run with just the SMPL pkl + mean params — the same minimal
    asset set the reference demo needs. Runtime.assets.contact / .prior /
    .contact_classes / .geodists are None/empty in that mode."""
    if synthetic is None:
        # detect by the actual load-bearing file, not the directory (an
        # empty models/smpl dir must not flip into real mode and crash)
        neutral = os.path.join(cfg.SMPL_MODEL_DIR, 'SMPL_NEUTRAL.pkl')
        synthetic = not os.path.isfile(neutral)
        # auto-selection must never be silent: a real-data run that
        # quietly swapped in the synthetic sphere body would produce
        # garbage metrics/meshes with no indication
        print(f'[tuch_tpu.runtime] auto-selected '
              f'{"SYNTHETIC stand-in" if synthetic else "real"} assets '
              f'({neutral} {"missing" if synthetic else "found"})',
              flush=True)
    if options is not None and getattr(options, 'synthetic', False):
        synthetic = True

    if synthetic:
        nv = num_verts or constants.SMPL_NUM_VERTS
        smpl, extras = assets_mod.synthetic_smpl(num_verts=nv, seed=seed,
                                                 with_contact=with_contact)
        gmm = assets_mod.synthetic_gmm_prior(seed=seed)
        geodists = extras.geodists
        segments = extras.segments
        classes, csig = extras.contact_classes, extras.contact_csig
        mean_pose6d = extras.mean_pose6d
        mean_shape, mean_cam = extras.mean_shape, extras.mean_cam
        hd_compact = (extras.hd_vert_ids, extras.hd_bary, extras.hd_geovec)
    else:
        smpl = assets_mod.load_smpl_pkl(os.path.join(
            cfg.SMPL_MODEL_DIR, 'SMPL_NEUTRAL.pkl'))
        if os.path.isfile(cfg.JOINT_REGRESSOR_TRAIN_EXTRA):
            smpl = assets_mod.load_extra_joint_regressor(
                smpl, cfg.JOINT_REGRESSOR_TRAIN_EXTRA)
        mean_pose6d, mean_shape, mean_cam = assets_mod.load_mean_params(
            cfg.SMPL_MEAN_PARAMS)
        import pickle
        gmm = geodists = classes = csig = None
        if with_contact:
            gmm = assets_mod.load_gmm_prior(os.path.join(
                cfg.PRIOR_FOLDER, 'gmm_08.pkl'))
            geodists = np.load(cfg.GEODESICS_SMPL)
            with open(os.path.join(cfg.DSC_ROOT, 'classes.pkl'),
                      'rb') as f:
                classes = pickle.load(f)
            with open(os.path.join(cfg.DSC_ROOT, 'ContactSigSMPL.pkl'),
                      'rb') as f:
                csig = pickle.load(f)
        segments = _load_real_segments() if with_segments else None
        hd_compact = None
        if with_hd:
            hd_reg = np.load(os.path.join(
                cfg.HD_MODEL_DIR, 'smpl_neutral_hd_vert_regressor.npy'))
            with open(os.path.join(
                    cfg.HD_MODEL_DIR,
                    'smpl_neutral_hd_sample_from_mesh_out.pkl'),
                    'rb') as f:
                hd_geovec = np.asarray(
                    pickle.load(f)['faces_vert_is_sampled_from'])
            order, bary = compact_hd_regressor(hd_reg, k=4)
            hd_compact = (order, bary, hd_geovec)
        # pack extras mirror for downstream consumers
        extras = assets_mod.SyntheticExtras(
            geodists=geodists, segments=segments or {},
            contact_classes=classes or [], contact_csig=csig or {},
            mean_pose6d=mean_pose6d, mean_shape=mean_shape,
            mean_cam=mean_cam,
            hd_vert_ids=hd_compact[0] if hd_compact else None,
            hd_bary=hd_compact[1] if hd_compact else None,
            hd_geovec=hd_compact[2] if hd_compact else None)

    if not with_contact:
        # keep synthetic mode consistent with the documented contract:
        # no prior/contact/classes/geodists when contact is disabled
        gmm, geodists, classes, csig = None, None, None, None

    prior = create_gmm_prior(gmm) if gmm is not None else None
    contact_assets = None
    if with_contact and geodists is not None:
        ia, ib, ma, mb = contact_ops.build_region_pairs(classes, csig)
        seg_tables = None
        if with_segments and segments:
            seg_tables = build_segment_tables(segments,
                                              np.asarray(smpl.faces),
                                              smpl.v_template.shape[0])
        contact_assets = ContactAssets(
            geomask=jnp.asarray(geodists > cfg.geothres),
            faces=jnp.asarray(smpl.faces),
            region_idx_a=jnp.asarray(ia), region_idx_b=jnp.asarray(ib),
            region_mask_a=jnp.asarray(ma), region_mask_b=jnp.asarray(mb),
            segment_tables=seg_tables)
    hd = None
    if with_hd and hd_compact is not None:
        from tuch_tpu.losses.regressor import make_hd_assets_compact
        hd = make_hd_assets_compact(*hd_compact, np.asarray(smpl.faces))

    dtype = jnp.bfloat16 if (options is not None and getattr(
        options, 'compute_dtype', 'float32') == 'bfloat16') else jnp.float32
    stem_s2d = bool(options is not None
                    and getattr(options, 'stem_s2d', False))
    backbone = (getattr(options, 'backbone', 'resnet50')
                if options is not None else 'resnet50')
    hmr = hmr_mod.create_hmr(mean_pose6d, mean_shape, mean_cam, dtype=dtype,
                             stem_s2d=stem_s2d, backbone=backbone)
    variables = hmr_mod.init_hmr(hmr, jax.random.PRNGKey(init_rng),
                                 img_res=img_res)
    tuch_assets = TuchAssets(smpl=smpl, prior=prior, contact=contact_assets,
                             hd=hd)
    return Runtime(smpl=smpl, assets=tuch_assets, extras=extras, hmr=hmr,
                   variables=variables, contact_classes=classes or [],
                   geodists=geodists)


def _load_real_segments():
    """Load real segment .ply files + boundary tables if present.

    The reference reads smpl_segment_{name}.ply vertex colors and a
    segm_utils.py table (tuch/utils/segmentation.py:40-47); if the assets
    are absent we skip segments (the filter is an optional refinement).
    """
    seg_dir = cfg.SEGMENT_DIR
    utils_py = os.path.join(seg_dir, 'segm_utils.py')
    if not os.path.isfile(utils_py):
        return None
    namespace = {}
    with open(utils_py) as f:
        exec(f.read(), namespace)  # trusted local asset, same as reference
    segments_def = namespace.get('segments', {})
    out = {}
    for name, bands in segments_def.items():
        ply = os.path.join(seg_dir, f'smpl_segment_{name}.ply')
        if not os.path.isfile(ply):
            continue
        vidx = _red_vertices_from_ply(ply)
        out[name] = {'vidx': vidx,
                     'bands_verts': [np.asarray(v) for v in bands.values()]}
    return out or None


def _red_vertices_from_ply(path: str) -> np.ndarray:
    """Vertex ids whose red channel == 255 in an ascii/binary PLY.

    Minimal PLY reader (replaces trimesh at segmentation.py:41-42).
    """
    with open(path, 'rb') as f:
        header = []
        while True:
            line = f.readline().decode('ascii', errors='replace').strip()
            header.append(line)
            if line == 'end_header':
                break
        n_verts = 0
        props = []
        fmt = 'ascii'
        in_vertex = False
        for line in header:
            if line.startswith('format'):
                fmt = line.split()[1]
            elif line.startswith('element vertex'):
                n_verts = int(line.split()[-1])
                in_vertex = True
            elif line.startswith('element'):
                in_vertex = False
            elif line.startswith('property') and in_vertex:
                props.append(line.split()[1:])
        red_idx = [i for i, p in enumerate(props) if p[-1] == 'red']
        if not red_idx:
            return np.array([], np.int64)
        ri = red_idx[0]
        if fmt == 'ascii':
            reds = []
            for _ in range(n_verts):
                vals = f.readline().split()
                reds.append(float(vals[ri]))
            reds = np.asarray(reds)
        else:
            np_types = {'float': 'f4', 'float32': 'f4', 'double': 'f8',
                        'uchar': 'u1', 'uint8': 'u1', 'int': 'i4',
                        'uint': 'u4', 'short': 'i2', 'ushort': 'u2',
                        'char': 'i1'}
            endian = '<' if 'little' in fmt else '>'
            dtype = np.dtype([(f'f{i}', endian + np_types[p[0]])
                              for i, p in enumerate(props)])
            data = np.frombuffer(f.read(dtype.itemsize * n_verts),
                                 dtype=dtype, count=n_verts)
            reds = data[f'f{ri}'].astype(np.float64)
        return np.where(reds == 255)[0].astype(np.int64)
