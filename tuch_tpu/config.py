"""Configuration: one dataclass tree with JSON/flag round-trip.

Replaces the reference's per-entry-point argparse classes
(configs/train_options.py, configs/smplify_dc_options.py,
configs/eft_fitting_options.py) and the module-constant path registry
(configs/config.py). Flag names are preserved so reference command lines
keep working; `--from_json` overrides everything and every run dumps its
resolved config.json (reference behavior: configs/train_options.py:70-99).
"""

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional

# ---------------------------------------------------------------------------
# Path registry (reference: configs/config.py). Overridable via env.
# ---------------------------------------------------------------------------

DS_DIR = os.environ.get('TUCH_DS_DIR', '')
DATA_DIR = os.environ.get('TUCH_DATA_DIR', 'data')

DBS_PATH = os.path.join(DATA_DIR, 'dbs')
DATASET_FILES = {
    'train': {
        'mpi-inf-3dhp': os.path.join(DBS_PATH, 'mpi_inf_3dhp_train.pt'),
        'dsc_df': os.path.join(DBS_PATH, 'dsc_df_train.pt'),
        'dsc_lspet': os.path.join(DBS_PATH, 'dsc_lspet_train.pt'),
        'dsc_lsp': os.path.join(DBS_PATH, 'dsc_lsp_train.pt'),
        'mtp': os.path.join(DBS_PATH, 'mtp_train.pt'),
        '3dpw': os.path.join(DBS_PATH, '3dpw_train.pt'),
        'dsc_df_eft': os.path.join(DBS_PATH, 'dsc_df_eft_train.pt'),
        'dsc_lspet_eft': os.path.join(DBS_PATH, 'dsc_lspet_eft_train.pt'),
        'dsc_lsp_eft': os.path.join(DBS_PATH, 'dsc_lsp_eft_train.pt'),
    },
    'val': {'mtp': os.path.join(DBS_PATH, 'mtp_val.pt')},
    'test': {
        'mpi-inf-3dhp': os.path.join(DBS_PATH, 'mpi_inf_3dhp_test.pt'),
        '3dpw': os.path.join(DBS_PATH, '3dpw_test.pt'),
    },
}

IMAGE_FOLDERS = {
    'mpi-inf-3dhp': os.path.join(DS_DIR, 'mpi_inf_3dhp'),
    '3dpw': os.path.join(DS_DIR, '3DPW'),
    'mtp': os.path.join(DS_DIR, 'mtp/images'),
    'dsc_df': os.path.join(DS_DIR, 'dsc/images/df/images'),
    'dsc_lspet': os.path.join(DS_DIR, 'dsc/images/lspet/images'),
    'dsc_lsp': os.path.join(DS_DIR, 'dsc/images/lsp/images'),
    'dsc_df_eft': os.path.join(DS_DIR, 'dsc/images/df/images'),
    'dsc_lspet_eft': os.path.join(DS_DIR, 'dsc/images/lspet/images'),
    'dsc_lsp_eft': os.path.join(DS_DIR, 'dsc/images/lsp/images'),
}

# Asset paths (reference: configs/config.py:74-87)
SMPL_MODEL_DIR = os.path.join(DATA_DIR, 'models/smpl')
JOINT_REGRESSOR_TRAIN_EXTRA = os.path.join(
    DATA_DIR, 'essentials/spin/J_regressor_extra.npy')
JOINT_REGRESSOR_H36M = os.path.join(
    DATA_DIR, 'essentials/spin/J_regressor_h36m.npy')
STATIC_FITS_DIR = os.path.join(DATA_DIR, 'static_fits')
SMPL_MEAN_PARAMS = os.path.join(
    DATA_DIR, 'essentials/spin/smpl_mean_params.npz')
PRIOR_FOLDER = os.path.join(DATA_DIR, 'essentials/spin')
THREEDPW_CIG = os.path.join(DATA_DIR, 'essentials/3dpw_test_csig_pc.npy')
SPIN_MODEL_CHECKPOINT = os.path.join(DATA_DIR, 'spin_model_checkpoint.pt')
GEODESICS_SMPL = os.path.join(
    DATA_DIR, 'essentials/geodesics/smpl/smpl_neutral_geodesic_dist.npy')
HD_MODEL_DIR = os.path.join(DATA_DIR, 'essentials/hd_model/smpl')
SEGMENT_DIR = os.path.join(DATA_DIR, 'essentials/segments/smpl')
DSC_ROOT = os.path.join(DS_DIR, 'dsc/release')

# Contact thresholds (reference: configs/config.py:90-91)
geothres = 0.3
euclthres = 0.02


# ---------------------------------------------------------------------------
# Run configuration
# ---------------------------------------------------------------------------

@dataclass
class TrainConfig:
    """Flag-compatible with the reference TrainOptions
    (configs/train_options.py:7-68)."""
    name: str = 'tuch'
    time_to_run: float = float('inf')
    resume: bool = False
    num_workers: int = 8
    pin_memory: bool = True
    log_dir: str = 'logs'
    checkpoint: Optional[str] = None
    from_json: Optional[str] = None
    pretrained_checkpoint: Optional[str] = None

    num_epochs: int = 6
    lr: float = 1e-5
    batch_size: int = 64
    summary_freq: float = 0.5
    val_and_checkpoint_freq: float = 0.5
    img_res: int = 224

    ds_names: List[str] = field(default_factory=lambda: ['dsc', 'mtp'])
    ds_composition: List[float] = field(default_factory=lambda: [0.5, 0.5])
    shuffle_train: bool = True

    rot_factor: float = 30.0
    noise_factor: float = 0.4
    scale_factor: float = 0.25
    ignore_3d: bool = False

    shape_loss_weight: float = 0.0
    keypoint_loss_weight: float = 5.0
    pose_loss_weight: float = 1.0
    beta_loss_weight: float = 0.01
    contact_loss_weight: float = 1e-5
    openpose_train_weight: float = 1.0
    gt_train_weight: float = 1.0

    run_smplify: bool = False
    # Directory with {ds}_fits.npy warm-start fits (reference
    # tuch/train/fits_dict.py:44-51 seeds from config.STATIC_FITS_DIR;
    # checkpoint fits take priority). Empty string = config.STATIC_FITS_DIR
    # when it exists; 'none' disables seeding.
    static_fits_dir: str = ''
    smplify_threshold: float = 100.0
    num_smplify_iters: int = 10
    use_contact_in_the_loop: bool = True
    contact_in_the_loop_loss_weight: float = 2000.0
    # refresh the in-loop winding test every K smplify iterations
    # (1 = reference semantics; >1 trades neighbor staleness for speed)
    smplify_exterior_refresh: int = 1
    # winding test only at the K vertices nearest an allowed neighbor,
    # applied to BOTH the in-loop smplify and the regressor contact loss
    # (0 = reference semantics: test all V; see losses/smplify.py)
    contact_candidate_k: int = 0
    # run the in-loop contact quadratics only for (up to) this many
    # contact-active samples per batch, like the reference's opti_bidxs
    # gather (tuch/smplify/losses.py:73-74). 0 = full batch. EXACT
    # whenever capacity >= #active samples (e.g. batch_size//2 + margin in
    # the dsc+mtp 0.5/0.5 config); overflow is dropped from the contact
    # terms and reported as train metric smplify_contact_truncated_frac
    smplify_contact_capacity: int = 0
    # same fixed-capacity compaction for the REGRESSOR contact loss,
    # which the reference computes only for valid_fit samples
    # (tuch/train/loss.py:247 `for bidx in torch.where(valid_fit)[0]`).
    # valid_fit is dynamic (threshold-passing fits + GT SMPL), so unlike
    # the smplify capacity this can truncate in well-trained regimes --
    # overflow is reported as train metric contact_valid_truncated_frac.
    # 0 = off (exact: all B computed, invalid masked after)
    regressor_contact_capacity: int = 0

    # Convenience: turn on the measured-equivalent speed configuration in
    # one flag -- exterior refresh 4, candidate_k 984, smplify + regressor
    # contact capacity 5/8 of the batch. Training-outcome A/B of this FULL
    # profile vs exact semantics: docs/ab_fast_knobs_r03.json (accept-rate
    # delta 0.0, fits joint-loss rel delta 0.48%, final val v2v delta
    # 0.83mm over 8 synthetic epochs at full topology). Explicitly-set
    # individual knobs win (CLI/--from_json explicitness is tracked).
    fast_profile: bool = False

    # TPU-native additions
    # Opt-in fix of the reference's dead j3d rotation branch
    # (base_dataset.py:224-233 builds the matrix but never applies it):
    # False keeps reference semantics (3D keypoints NOT rotated under
    # image-rotation augmentation)
    rotate_pose_3d: bool = False
    # --synthetic body size override (0 = full 6890-vert topology);
    # lets CI smoke the whole train CLI at toy scale
    synthetic_num_verts: int = 0
    grad_clip: float = 0.0           # global-norm gradient clip (0 = off)
    synthetic: bool = False          # run on synthetic assets/data
    # --synthetic only: replace the random 2D keypoints with projections
    # of the db's own GT SMPL joints (+2px noise), so poses have a
    # consistent 3D explanation and the smplify accept/reject gate is
    # discriminative (data/dataset.py project_db_keypoints)
    synthetic_projected_kpts: bool = False
    use_hd: bool = True              # dense-surface contact in regressor loss
    # Fixed candidate count for the HD contact path: the reference gathers
    # a data-dependent number of HD points on contacting faces
    # (tuch/train/loss.py:278-281); under jit this becomes a top-K with
    # static K. Truncation is reported as train metric hd_truncated_frac.
    hd_k: int = 1024
    mesh_dp: int = 0                 # data-parallel devices (0 = all)
    mesh_cp: int = 1                 # contact/triangle-parallel devices
    compute_dtype: str = 'float32'   # or 'bfloat16' for the backbone
    # Space-to-depth form of the 7x7/s2 stem conv (models/hmr.py StemS2D):
    # exact math, same checkpoint layout; a throughput knob for the MXU
    stem_s2d: bool = False
    # Regressor backbone: 'resnet50' (the reference architecture,
    # tuch/models/hmr.py:27-130) or a models/vit.py config ('vit_s16',
    # 'vit_b16', 'vit_t8') -- an opt-in matmul-shaped MXU extension;
    # random-weights only (no reference checkpoint exists to convert)
    backbone: str = 'resnet50'
    seed: int = 0

    # Derived (filled by finalize()):
    summary_dir: str = ''
    checkpoint_dir: str = ''
    _finalized: bool = False
    # flag names the user set explicitly (CLI tokens / --from_json keys);
    # populated by parse_config so fast_profile can honor an explicit
    # exact-semantics value (e.g. --fast_profile --contact_candidate_k 0)
    _explicit: tuple = ()

    def _untouched(self, name, default):
        """fast_profile may fill `name` only if the user did not set it.

        With parse_config the _explicit record is authoritative; for
        programmatic construction it is empty and default-comparison is
        the best available signal.
        """
        if self._explicit:
            return name not in self._explicit
        return getattr(self, name) == default

    def finalize(self):
        if self.fast_profile:
            # fill only knobs the user left untouched
            if self._untouched('smplify_exterior_refresh', 1):
                self.smplify_exterior_refresh = 4
            if self._untouched('contact_candidate_k', 0):
                self.contact_candidate_k = 984
            if self._untouched('smplify_contact_capacity', 0):
                # 5/8 of the batch: covers the dsc+mtp 0.5/0.5 flagship
                # mix with margin; overflow stays visible in the
                # smplify_contact_truncated_frac metric
                self.smplify_contact_capacity = (5 * self.batch_size) // 8
            if self._untouched('regressor_contact_capacity', 0):
                # valid_fit is dynamic, so this one can truncate in
                # well-trained regimes -- contact_valid_truncated_frac
                # stays visible per step
                self.regressor_contact_capacity = (5 * self.batch_size) // 8
        if not self._finalized:
            self.log_dir = os.path.join(os.path.abspath(self.log_dir),
                                        self.name)
        self._finalized = True
        self.summary_dir = os.path.join(self.log_dir, 'tensorboard')
        self.checkpoint_dir = os.path.join(self.log_dir, 'checkpoints')
        os.makedirs(self.summary_dir, exist_ok=True)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        with open(os.path.join(self.log_dir, 'config.json'), 'w') as f:
            json.dump(dataclasses.asdict(self), f, indent=4, default=str)
        return self


def _add_dataclass_args(parser: argparse.ArgumentParser, cls):
    for f in dataclasses.fields(cls):
        if f.name in ('summary_dir', 'checkpoint_dir') \
                or f.name.startswith('_'):
            continue
        default = f.default if f.default is not dataclasses.MISSING else (
            f.default_factory() if f.default_factory is not dataclasses.MISSING
            else None)
        arg = '--' + f.name
        if f.type in ('bool', bool) or isinstance(default, bool):
            parser.add_argument(arg, type=lambda x: str(x).lower() in
                                ('true', '1', 'yes'), nargs='?', const=True,
                                default=default)
            # reference-style negative companion (train_options.py uses
            # --no_shuffle_train / --no_pin_memory store_false pairs)
            parser.add_argument('--no_' + f.name, dest=f.name,
                                action='store_false')
        elif isinstance(default, list):
            elem_t = float if default and isinstance(default[0], float) else str
            parser.add_argument(arg, nargs='+', type=elem_t, default=default)
        elif isinstance(default, float):
            parser.add_argument(arg, type=float, default=default)
        elif isinstance(default, int):
            parser.add_argument(arg, type=int, default=default)
        else:
            parser.add_argument(arg, type=str, default=default)


def parse_config(cls=TrainConfig, argv=None, finalize=True):
    """Build a config from CLI flags, honoring --from_json overrides."""
    import sys
    parser = argparse.ArgumentParser()
    _add_dataclass_args(parser, cls)
    args = parser.parse_args(argv)
    cfg = cls(**{k: v for k, v in vars(args).items()
                 if k in {f.name for f in dataclasses.fields(cls)}})
    known = {f.name for f in dataclasses.fields(cls)}
    # record which flags the user actually typed, so fast_profile never
    # overrides an explicitly-passed exact-semantics value
    tokens = list(sys.argv[1:] if argv is None else argv)
    explicit = {n for n in known
                if any(t == f'--{n}' or t.startswith(f'--{n}=')
                       or t == f'--no_{n}' for t in tokens)}
    if cfg.from_json:
        with open(cfg.from_json) as f:
            overrides = json.load(f)
        for k, v in overrides.items():
            if k in known and not k.startswith('_'):
                setattr(cfg, k, v)
                explicit.add(k)
    cfg._explicit = tuple(sorted(explicit))
    if finalize:
        cfg.finalize()
    return cfg


@dataclass
class SMPLifyDemoConfig(TrainConfig):
    """Flags of demo_smplify_dc.py (configs/smplify_dc_options.py).

    Reference defaults: batch_size=1 (:22), num_smplify_iters=10 (:35);
    the README demo command passes --num_smplify_iters 100 explicitly.
    """
    ds_names: List[str] = field(
        default_factory=lambda: ['dsc_df', 'dsc_lspet', 'dsc_lsp'])
    batch_size: int = 1
    num_smplify_iters: int = 10
    # render output dir; '' = the resolved log dir (the reference writes
    # demo images into log_dir/name, demo_smplify_dc.py:176)
    out_dir: str = ''
    num_images: int = 4


@dataclass
class EFTConfig(TrainConfig):
    """Flags of fit_eft.py (configs/eft_fitting_options.py)."""
    sidx: int = 0                    # cluster shard index
    cbs: Optional[int] = None        # shard size (None = whole dataset)
    max_steps: int = 50
    batch_size: int = 1
    # reference defaults (eft_fitting_options.py:35-37); note these
    # override TrainConfig's training-time weights for the EFT CLI
    keypoint_loss_weight: float = 1.0
    beta_loss_weight: float = 1.0
    contact_loss_weight: float = 10.0
    out_dir: str = 'out/eft'
