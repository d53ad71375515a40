"""Checkpointing: training state + fits + loader position, via Orbax.

Replaces tuch/utils/saver.py (CheckpointSaver). The checkpoint is a single
pytree (params, batch_stats, opt state, fits array, rng, step) plus loader
state and metadata -- so resume restores the exact mid-epoch position and
the best-fit store in one call (the reference saves model/optimizer dicts
plus separate {ds}_fits.npy files and a pickled dataset permutation,
saver.py:58-94).
"""

import json
import os
import re
import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from tuch_tpu.train.module import TrainState


class CheckpointManager:
    def __init__(self, save_dir: str, max_to_keep: int = 5):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self.checkpointer = ocp.PyTreeCheckpointer()
        self.max_to_keep = max_to_keep

    def _path(self, step: int, val_error: Optional[float]) -> str:
        stamp = time.strftime('%Y_%m_%d-%H_%M_%S')
        err = 'nan' if val_error is None else f'{val_error:.2f}'
        return os.path.join(self.save_dir, f'{stamp}_step{step}_{err}')

    def save(self, state: TrainState, loader_state: Dict[str, Any],
             val_error: Optional[float] = None) -> str:
        step = int(np.asarray(state.step))
        path = self._path(step, val_error)
        self.checkpointer.save(path, jax.device_get(state._asdict()))
        # The meta write is the commit point (list_checkpoints only counts
        # dirs WITH a .meta.json): write-then-rename so a crash mid-write
        # leaves no half-written meta that would brick the next resume.
        tmp = path + '.meta.json.tmp'
        with open(tmp, 'w') as f:
            json.dump({'step': step, 'val_error': val_error,
                       'loader_state': loader_state}, f)
        os.replace(tmp, path + '.meta.json')
        self._gc()
        return path

    def _gc(self):
        """Keep the newest max_to_keep checkpoints PLUS the best-val one.

        (The reference initializes best_performance but never uses it,
        trainer.py:78, and never deletes checkpoints at all; with pruning
        on, the checkpoint that gated best must survive it.)
        """
        ckpts = self.list_checkpoints()
        keep = set(ckpts[-self.max_to_keep:])
        best, best_err = None, float('inf')
        for path in ckpts:
            try:
                with open(path + '.meta.json') as f:
                    ve = json.load(f).get('val_error')
            except (OSError, ValueError):
                continue
            if ve is not None and float(ve) < best_err:
                best, best_err = path, float(ve)
        if best is not None:
            keep.add(best)
        for path in ckpts:
            if path in keep:
                continue
            try:
                import shutil
                shutil.rmtree(path, ignore_errors=True)
                os.remove(path + '.meta.json')
            except OSError:
                pass

    def list_checkpoints(self):
        """Checkpoint dirs ordered oldest -> newest.

        Ordered by (timestamp, step): the timestamp prefix alone has
        1-second resolution, and a pure name sort ranks 'step12' before
        'step8' -- two saves within the same second (toy-scale epochs)
        would make latest()/GC pick the older one.
        """
        out = []
        if not os.path.isdir(self.save_dir):
            return out
        for name in os.listdir(self.save_dir):
            full = os.path.join(self.save_dir, name)
            if os.path.isdir(full) and os.path.exists(full + '.meta.json'):
                m = re.search(r'_step(\d+)_', name)
                step = int(m.group(1)) if m else -1
                out.append((name.split('_step')[0], step, full))
        return [full for _, _, full in sorted(out)]

    def latest(self) -> Optional[str]:
        ckpts = self.list_checkpoints()
        return ckpts[-1] if ckpts else None

    def restore(self, template: TrainState, path: Optional[str] = None
                ) -> Tuple[TrainState, Dict[str, Any]]:
        """Restore into the structure of `template` (shapes must match).

        With no explicit path, tries newest -> oldest: a checkpoint
        truncated by a crash/preemption mid-save must not brick resume
        when an older intact one exists (an explicit path still fails
        loudly).
        """
        if path is not None:
            return self._restore_one(template, path)
        candidates = self.list_checkpoints()
        if not candidates:
            raise FileNotFoundError('no checkpoint found in '
                                    + self.save_dir)
        last_err = None
        for cand in reversed(candidates):
            try:
                return self._restore_one(template, cand)
            except Exception as e:  # corrupt/truncated save
                print(f'checkpoint {cand} unreadable ({e!r}); '
                      'falling back to the previous one', flush=True)
                last_err = e
        raise RuntimeError(
            f'all {len(candidates)} checkpoints in {self.save_dir} '
            f'failed to restore') from last_err

    def _restore_one(self, template: TrainState, path: str
                     ) -> Tuple[TrainState, Dict[str, Any]]:
        restored = self.checkpointer.restore(
            path, item=jax.device_get(template._asdict()))
        with open(path + '.meta.json') as f:
            meta = json.load(f)
        return TrainState(**restored), meta.get('loader_state', {})

    def exists(self) -> bool:
        return self.latest() is not None


def load_pretrained_params(path: str):
    """Load a converted pretrained checkpoint (.npz pytree or torch .pt via
    the converter). Returns dict with 'params' and optionally 'batch_stats'.
    """
    if path.endswith('.npz') or path.endswith('.npy'):
        from flax import traverse_util
        with np.load(path, allow_pickle=False) as d:
            flat = {tuple(k.split('/')): d[k] for k in d.files}
        tree = traverse_util.unflatten_dict(flat)
        return tree
    from tuch_tpu.models.convert import convert_torch_checkpoint
    return convert_torch_checkpoint(path)


def load_variables(path: str, init_variables):
    """Checkpoint params + batch_stats over initialized variables.

    The shared load-into-variables step every CLI performs: checkpoints
    may omit batch_stats (e.g. converted reference .pt files keep them in
    the state dict, ours always do) -- fall back to the freshly
    initialized ones. BN-free backbones (ViT) init with NO batch_stats
    collection at all (tests/test_vit.py), so both lookups must be lazy
    and an empty collection is omitted entirely (ADVICE r04: the eager
    init_variables['batch_stats'] default crashed eval/serve --backbone
    vit_* --checkpoint).
    """
    loaded = load_pretrained_params(path)
    stats = loaded.get('batch_stats', init_variables.get('batch_stats', {}))
    out = {'params': loaded['params']}
    if stats:
        out['batch_stats'] = stats
    return out
