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
    flags = (flags + ' --xla_force_host_platform_device_count=8').strip()
if 'xla_cpu_collective' not in flags:
    # 8 virtual devices time-share one core; cold-compile runs can take
    # minutes to bring every rank to a rendezvous -- keep the CPU
    # collectives watchdog from SIGABRTing the suite.
    flags += (' --xla_cpu_collective_timeout_seconds=1800'
              ' --xla_cpu_collective_call_warn_stuck_timeout_seconds=600'
              ' --xla_cpu_collective_call_terminate_timeout_seconds=1800')
os.environ['XLA_FLAGS'] = flags

import numpy as np
import pytest

import jax

# The container's sitecustomize force-registers the TPU tunnel backend and
# overrides jax_platforms; undo that so tests run on the virtual CPU mesh.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
# Tests re-jit many small programs; persist even sub-second compiles so
# repeat suite runs (the builder's inner loop) skip them entirely.
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.1)


def pytest_addoption(parser):
    parser.addoption(
        '--runslow', action='store_true', default=False,
        help='also run tests marked @pytest.mark.slow (full tier)')


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: `pytest -q` runs the fast tier (<5 min target);
    `pytest --runslow` (or `-m slow`, or TUCH_SLOW=1) adds the slow
    integration tier (multi-device train/e2e/CLI runs, ~30 min on this
    1-core host)."""
    if (config.getoption('--runslow')
            or os.environ.get('TUCH_SLOW') == '1'
            or 'slow' in (config.getoption('-m') or '')):
        return
    skip = pytest.mark.skip(
        reason='slow tier: pass --runslow (or TUCH_SLOW=1) to run')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope='session')
def tiny_smpl():
    """Small synthetic SMPL-schema model (closed sphere, ~170 verts)."""
    from tuch_tpu import assets
    return assets.synthetic_smpl(num_verts=170, seed=0)


@pytest.fixture(scope='session')
def rng():
    return np.random.RandomState(1234)
