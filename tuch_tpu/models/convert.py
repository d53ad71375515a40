"""PyTorch HMR checkpoint -> Flax variables converter.

Maps SPIN/TUCH checkpoints (the reference's `{'model': state_dict}` files,
saved at tuch/utils/saver.py:58-94; pretrained files from
scripts/fetch_data.sh) onto the NHWC Flax HMR in tuch_tpu/models/hmr.py.
Conv kernels transpose OIHW -> HWIO; Linear kernels transpose; BatchNorm
splits into params (scale/bias) and batch_stats (mean/var).
"""

import re
from typing import Dict, Tuple

import numpy as np


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _put(tree, path, value):
    """Insert value at a nested dict path, creating intermediate nodes."""
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_state_dict(sd: Dict[str, np.ndarray]):
    """torch state-dict -> {'params': ..., 'batch_stats': ...} pytrees."""
    params: Dict = {}
    stats: Dict = {}
    put = _put

    def conv_kernel(w):
        return np.transpose(_to_numpy(w), (2, 3, 1, 0))  # OIHW -> HWIO

    def dense_kernel(w):
        return np.transpose(_to_numpy(w), (1, 0))

    for key, val in sd.items():
        v = _to_numpy(val)
        m = re.match(r'layer(\d)\.(\d+)\.(.*)', key)
        if key.startswith('conv1.'):
            put(params, ('backbone', 'conv1', 'kernel'), conv_kernel(v))
        elif key.startswith('bn1.'):
            _bn(params, stats, ('backbone', 'bn1'), key.split('.')[-1], v)
        elif m:
            stage, block, rest = int(m.group(1)), int(m.group(2)), \
                m.group(3)
            base = ('backbone', f'layer{stage}_{block}')
            if rest.startswith('conv'):
                put(params, base + (rest.split('.')[0], 'kernel'),
                    conv_kernel(v))
            elif rest.startswith('bn'):
                _bn(params, stats, base + (rest.split('.')[0],),
                    rest.split('.')[-1], v)
            elif rest.startswith('downsample.0'):
                put(params, base + ('downsample_conv', 'kernel'),
                    conv_kernel(v))
            elif rest.startswith('downsample.1'):
                _bn(params, stats, base + ('downsample_bn',),
                    rest.split('.')[-1], v)
        elif key.split('.')[0] in ('fc1', 'fc2', 'decpose', 'decshape',
                                   'deccam'):
            mod, leaf = key.split('.')
            if leaf == 'weight':
                put(params, (mod, 'kernel'), dense_kernel(v))
            else:
                put(params, (mod, 'bias'), v)
        # init_pose/init_shape/init_cam buffers handled by mean-params arg.

    return {'params': params, 'batch_stats': stats}


def _bn(params, stats, base, leaf, v):
    put = _put
    if leaf == 'weight':
        put(params, base + ('scale',), v)
    elif leaf == 'bias':
        put(params, base + ('bias',), v)
    elif leaf == 'running_mean':
        put(stats, base + ('mean',), v)
    elif leaf == 'running_var':
        put(stats, base + ('var',), v)
    # num_batches_tracked dropped


def convert_torch_checkpoint(path: str):
    """Load a .pt checkpoint (torch pickle) and convert.

    Accepts both raw state dicts and the reference's {'model': sd} wrapper.
    Also returns mean params when the checkpoint carries the HMR init
    buffers (init_pose/init_shape/init_cam).
    """
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('model', ckpt) if isinstance(ckpt, dict) else ckpt
    variables = convert_state_dict(sd)
    means = {}
    for name in ('init_pose', 'init_shape', 'init_cam'):
        if name in sd:
            means[name] = _to_numpy(sd[name]).reshape(-1)
    if means:
        variables['mean_params'] = means
    return variables


def convert_to_torch_state_dict(variables, mean_params=None):
    """Flax variables -> torch state dict with the reference's key names.

    Inverse of convert_state_dict, so checkpoints trained here can be
    loaded by the reference implementation (torch.load of the
    {'model': sd} wrapper, tuch/utils/saver.py:96-105 / train.py). Conv
    kernels transpose HWIO -> OIHW, Linear kernels transpose back, BN
    recombines params + batch_stats (num_batches_tracked restored as 0).

    mean_params: optional (pose6d(144,), shape(10,), cam(3,)) tuple for
    the init_pose/init_shape/init_cam buffers the reference HMR registers
    (tuch/models/hmr.py:105-111).
    """
    params = _flatten(variables['params'])
    stats = _flatten(variables.get('batch_stats', {}))
    sd = {}

    def torch_key(path):
        # backbone/layerS_B/rest -> layerS.B.rest ; backbone/x -> x
        parts = path.split('/')
        if parts[0] == 'backbone':
            parts = parts[1:]
            m = re.match(r'layer(\d)_(\d+)$', parts[0])
            if m:
                parts = [f'layer{m.group(1)}', m.group(2)] + parts[1:]
        return parts

    for path, v in params.items():
        parts = torch_key(path)
        leaf = parts[-1]
        mod = parts[:-1]
        if mod and mod[-1] == 'downsample_conv':
            mod = mod[:-1] + ['downsample', '0']
        elif mod and mod[-1] == 'downsample_bn':
            mod = mod[:-1] + ['downsample', '1']
        v = np.asarray(v)
        if leaf == 'kernel':
            if v.ndim == 4:
                sd['.'.join(mod) + '.weight'] = np.transpose(
                    v, (3, 2, 0, 1))  # HWIO -> OIHW
            else:
                sd['.'.join(mod) + '.weight'] = np.transpose(v, (1, 0))
        elif leaf == 'scale':
            sd['.'.join(mod) + '.weight'] = v
        elif leaf == 'bias':
            sd['.'.join(mod) + '.bias'] = v
        else:  # pragma: no cover - no other leaves exist in HMR
            sd['.'.join(mod + [leaf])] = v

    for path, v in stats.items():
        parts = torch_key(path)
        leaf = parts[-1]
        mod = parts[:-1]
        if mod and mod[-1] == 'downsample_bn':
            mod = mod[:-1] + ['downsample', '1']
        name = {'mean': 'running_mean', 'var': 'running_var'}[leaf]
        sd['.'.join(mod) + '.' + name] = np.asarray(v)
        nb = '.'.join(mod) + '.num_batches_tracked'
        sd[nb] = np.asarray(0, np.int64)

    if mean_params is not None:
        pose6d, shape, cam = mean_params
        sd['init_pose'] = np.asarray(pose6d, np.float32).reshape(1, -1)
        sd['init_shape'] = np.asarray(shape, np.float32).reshape(1, -1)
        sd['init_cam'] = np.asarray(cam, np.float32).reshape(1, -1)
    return sd


def save_torch_checkpoint(variables, path, mean_params=None, **extra):
    """Write a reference-loadable .pt checkpoint ({'model': sd} wrapper +
    any extra scalar entries, mirroring tuch/utils/saver.py:58-94)."""
    import torch
    # copy: jax returns read-only numpy views, torch wants writable
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          if np.ndim(v) else torch.tensor(v)
          for k, v in convert_to_torch_state_dict(
              variables, mean_params).items()}
    torch.save(dict(extra, model=sd), path)


def verify_against_model(variables, model, img_res: int = 64):
    """Shape-check converted params against a freshly-initialized model."""
    import jax
    from tuch_tpu.models.hmr import init_hmr
    ref = init_hmr(model, jax.random.PRNGKey(0), img_res=img_res)

    flat_ref = _flatten(ref['params'])
    flat_new = _flatten(variables['params'])
    missing = sorted(set(flat_ref) - set(flat_new))
    extra = sorted(set(flat_new) - set(flat_ref))
    bad_shapes = [k for k in set(flat_ref) & set(flat_new)
                  if np.shape(flat_ref[k]) != np.shape(flat_new[k])]
    return missing, extra, bad_shapes


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out['/'.join(prefix + (k,))] = v
    return out
