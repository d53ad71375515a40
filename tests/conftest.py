"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip semantics (pjit sharding, psum reductions) are validated without
a TPU pod by forcing the host platform to expose 8 virtual devices -- the
JAX-native analog of the reference's only "multi-node" mechanism (offline
index-sharded jobs, reference tuch/eft/fitter.py:52-55).
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np
import pytest

import jax

# The container's sitecustomize force-registers the TPU tunnel backend and
# overrides jax_platforms; undo that so tests run on the virtual CPU mesh.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)


@pytest.fixture(scope='session')
def tiny_smpl():
    """Small synthetic SMPL-schema model (closed sphere, ~170 verts)."""
    from tuch_tpu import assets
    return assets.synthetic_smpl(num_verts=170, seed=0)


@pytest.fixture(scope='session')
def rng():
    return np.random.RandomState(1234)
