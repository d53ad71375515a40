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


def convert_state_dict(sd: Dict[str, np.ndarray]):
    """torch state-dict -> {'params': ..., 'batch_stats': ...} pytrees."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

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
    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

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
