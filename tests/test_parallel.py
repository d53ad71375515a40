"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md section 4:
pjit sharding / psum reductions without a cluster)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tuch_tpu.parallel import mesh as pmesh
from tuch_tpu.parallel.contact_parallel import winding_numbers_cp
from tuch_tpu.ops.contact import winding_numbers_same_tris

from tests.test_contact import unit_cube


@pytest.fixture(scope='module')
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    return pmesh.make_mesh(dp=4, cp=2)


def test_winding_cp_matches_single_device(mesh8):
    v, f = unit_cube()
    B = 4
    verts = jnp.asarray(np.tile(v[None], (B, 1, 1)))
    pts = jnp.asarray(np.array([[[0, 0, 0], [2, 0, 0], [0.2, 0.1, -0.3],
                                 [0, 1.2, 0]]], np.float32).repeat(B, 0))
    wn_cp = winding_numbers_cp(pts, verts, f, mesh8, block_f=4)
    wn_ref = winding_numbers_same_tris(pts, verts, jnp.asarray(f),
                                       block_f=4)
    np.testing.assert_allclose(np.asarray(wn_cp), np.asarray(wn_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(wn_cp)[0, :2], [1.0, 0.0],
                               atol=1e-4)


def test_batch_sharding_roundtrip(mesh8):
    batch = {'x': np.arange(8 * 3, dtype=np.float32).reshape(8, 3)}
    sharded = pmesh.shard_batch(batch, mesh8)
    assert sharded['x'].sharding.spec == jax.sharding.PartitionSpec('dp')
    np.testing.assert_allclose(np.asarray(sharded['x']), batch['x'])


def test_shard_params_tp_specs(mesh8):
    params = {'fc1': {'kernel': np.zeros((100, 64)),
                      'bias': np.zeros(64)},
              'fc2': {'kernel': np.zeros((64, 64))},
              'conv': {'kernel': np.zeros((3, 3, 4, 8))}}
    sh = pmesh.shard_params_tp(params, mesh8)
    P = jax.sharding.PartitionSpec
    assert sh['fc1']['kernel'].spec == P(None, 'cp')
    assert sh['fc2']['kernel'].spec == P('cp', None)
    assert sh['fc1']['bias'].spec == P()
    assert sh['conv']['kernel'].spec == P()


def test_process_shard_single_host():
    from tuch_tpu.parallel.multihost import process_shard
    lo, hi = process_shard(100)
    assert (lo, hi) == (0, 100)


def test_maybe_initialize_distributed_noop(monkeypatch):
    from tuch_tpu.parallel.multihost import maybe_initialize_distributed
    monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
    assert maybe_initialize_distributed() is False
