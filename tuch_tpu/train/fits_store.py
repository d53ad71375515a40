"""FitsStore: the best-fit-per-training-image dictionary as device state.

TPU-native redesign of tuch/train/fits_dict.py. The reference keeps one
host tensor per dataset and round-trips every batch through CPU (with a
per-sample cv2.Rodrigues loop for the rotation adjustment,
fits_dict.py:97-119). Here all datasets are concatenated into a single
(N_total, 82) device array carried in the training state:

  * lookup  = gather + pure-JAX rotate/flip of the pose (rotations.rot_aa)
  * update  = masked scatter (un-rotating/un-flipping first)

so the whole get -> optimize -> accept/reject -> writeback cycle stays
inside one jit-compiled train step.
"""

import os
from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tuch_tpu import constants
from tuch_tpu.utils import rotations as rot

_FLIP_PERM = np.array(constants.SMPL_POSE_FLIP_PERM)


class FitsStore(NamedTuple):
    """Static layout + dynamic array. `params` is the jit-carried leaf."""
    params: jnp.ndarray          # (N_total, 82): pose 72 + betas 10
    offsets: Dict[str, int]      # dataset name -> row offset (static)
    sizes: Dict[str, int]        # dataset name -> row count (static)


def create_fits_store(dataset_sizes: Dict[str, int],
                      static_fits_dir: str | None = None,
                      checkpoint_dir: str | None = None) -> FitsStore:
    """Seed from checkpoint fits, else static fits, else zeros (mean pose).

    Mirrors the seeding priority of FitsDict.__init__
    (tuch/train/fits_dict.py:38-51).
    """
    blocks: List[np.ndarray] = []
    offsets, sizes = {}, {}
    off = 0
    for name, n in dataset_sizes.items():
        arr = None
        for d in (checkpoint_dir, static_fits_dir):
            if d is None:
                continue
            path = os.path.join(d, f'{name}_fits.npy')
            if os.path.isfile(path):
                arr = np.load(path).astype(np.float32)
                break
        if arr is None:
            arr = np.zeros((n, 82), np.float32)
        assert arr.shape == (n, 82), (name, arr.shape)
        blocks.append(arr)
        offsets[name] = off
        sizes[name] = n
        off += n
    params = np.concatenate(blocks, axis=0) if blocks else \
        np.zeros((0, 82), np.float32)
    return FitsStore(params=jnp.asarray(params), offsets=offsets,
                     sizes=sizes)


def save_fits(store: FitsStore, checkpoint_dir: str):
    """Write per-dataset {ds}_fits.npy (reference fits_dict.py:53-57)."""
    params = np.asarray(store.params)
    os.makedirs(checkpoint_dir, exist_ok=True)
    for name, off in store.offsets.items():
        n = store.sizes[name]
        np.save(os.path.join(checkpoint_dir, f'{name}_fits.npy'),
                params[off:off + n])


def global_indices(store: FitsStore, dataset_idx: jnp.ndarray,
                   sample_idx: jnp.ndarray,
                   dataset_order: List[str]) -> jnp.ndarray:
    """Map (dataset id, in-dataset index) -> row in the packed array.

    dataset_order fixes the integer encoding of dataset names used by the
    data pipeline. Static python list -> jnp offset table.
    """
    table = jnp.asarray([store.offsets[name] for name in dataset_order],
                        dtype=jnp.int32)
    return table[dataset_idx] + sample_idx.astype(jnp.int32)


def _flip_poses(pose: jnp.ndarray, is_flipped: jnp.ndarray) -> jnp.ndarray:
    flipped = rot.flip_pose(pose, jnp.asarray(_FLIP_PERM))
    return jnp.where(is_flipped[:, None], flipped, pose)


def _rotate_poses(pose: jnp.ndarray, rot_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate the global orientation by the augmentation angle.

    Matches FitsDict.rotate_pose (fits_dict.py:97-119): stored poses are in
    un-augmented space; retrieval applies R_z(-rot) to the global orient.
    """
    go = rot.rot_aa(pose[:, :3], rot_deg)
    return jnp.concatenate([go, pose[:, 3:]], axis=-1)


def lookup_fits(params: jnp.ndarray, gidx: jnp.ndarray,
                rot_deg: jnp.ndarray, is_flipped: jnp.ndarray):
    """Batch retrieval with augmentation applied (fits_dict.py:59-73).

    params: (N, 82); gidx: (B,). Returns (pose (B, 72), betas (B, 10)).
    """
    rows = params[gidx]
    pose = rows[:, :72]
    betas = rows[:, 72:]
    pose = _flip_poses(_rotate_poses(pose, rot_deg), is_flipped)
    return pose, betas


def update_fits(params: jnp.ndarray, gidx: jnp.ndarray,
                pose: jnp.ndarray, betas: jnp.ndarray,
                rot_deg: jnp.ndarray, is_flipped: jnp.ndarray,
                update_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked writeback with augmentation *removed* (fits_dict.py:75-85).

    The inverse of lookup: un-flip first, then un-rotate (the reference
    applies rotate_pose(flip_pose(pose), -rot)).
    """
    pose = _rotate_poses(_flip_poses(pose, is_flipped), -rot_deg)
    rows = jnp.concatenate([pose, betas], axis=-1)
    old = params[gidx]
    new = jnp.where(update_mask[:, None], rows, old)
    return params.at[gidx].set(new)
