"""Device mesh + sharding utilities.

The reference has no multi-device execution at all (SURVEY.md section 2.8:
single CUDA device, "multi-node" = offline index-sharded jobs). Here
parallelism is first-class and XLA-native:

  * axis 'dp' -- data parallel over the batch (the primary axis);
  * axis 'cp' -- "contact parallel": shards the triangle axis of the
    quadratic winding-number computation (the structural analog of sequence
    parallelism for this workload, SURVEY.md section 5) and the columns of
    the regressor-head matmuls (tensor-parallel style).

Gradients/metrics reduce over 'dp' via the collectives XLA inserts for the
sharded-batch jit; the cp winding reduction is an explicit psum in
shard_map.
"""



import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 0, cp: int = 1, devices=None) -> Mesh:
    """Create a (dp, cp) mesh. dp=0 means "all remaining devices"."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == 0:
        assert n % cp == 0, (n, cp)
        dp = n // cp
    assert dp * cp <= n, f'mesh {dp}x{cp} needs {dp*cp} devices, have {n}'
    grid = np.asarray(devices[:dp * cp]).reshape(dp, cp)
    return Mesh(grid, ('dp', 'cp'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate over cp."""
    return NamedSharding(mesh, P('dp'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(jnp.asarray(v), sh) for k, v in batch.items()}


def shard_params_tp(params, mesh: Mesh):
    """Tensor-parallel-style sharding spec for HMR parameters.

    The IEF head Dense kernels (1024-wide fc1/fc2) are sharded over 'cp'
    on their output/input dims; everything else (convs, batchnorm, tiny
    decoders) is replicated -- the backbone is activation-dominated, so dp
    is its natural axis (SURVEY.md section 2.8: model is ~27M params; TP is
    exposure, not necessity).

    The ViT backbone (models/vit.py) reuses the same column rules by
    name: per block, the fused qkv kernel gets P(None, 'cp') and the
    attention output projection gets P('cp', None). NOTE (ADVICE r04):
    because qkv is fused as (in, 3C), a contiguous 'cp' split does NOT
    align to q/k/v thirds or head groups -- this is a GSPMD
    memory-sharding layout (weights distributed, results exact), not
    Megatron-style head-aligned attention TP; GSPMD inserts the
    collectives it needs at the fused_mha consumer.
    """

    def spec_for(path, leaf):
        keys = [getattr(p, 'key', getattr(p, 'name', '')) for p in path]
        path_s = '/'.join(str(k) for k in keys)
        if leaf.ndim == 2:
            if 'fc1/kernel' in path_s or 'qkv/kernel' in path_s:
                return P(None, 'cp')     # split hidden dim / heads
            if 'fc2/kernel' in path_s or 'proj/kernel' in path_s:
                return P('cp', None)     # consume split hidden dim
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)),
        params)


def put_tree(tree, shardings):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), tree, shardings)
