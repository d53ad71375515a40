"""Real-asset loader tests on crafted files with the reference schemas.

The loaders are the first thing a real user hits (SMPL pkl in chumpy
format, smpl_mean_params.npz, gmm_08.pkl); exercise them hermetically by
writing files in the exact on-disk schemas and round-tripping.
"""

import pickle

import numpy as np
import jax.numpy as jnp

from tuch_tpu import assets
from tuch_tpu.models.smpl import smpl_forward_pose72


def _chumpy_wrap(arr):
    """Build an object that pickles as chumpy.ch.Ch (like real SMPL pkls)."""
    assets._install_chumpy_stub()
    import chumpy  # the stub

    obj = chumpy.ch.Ch()
    obj.__dict__['x'] = arr
    return obj


def test_load_smpl_pkl_roundtrip(tmp_path):
    model0, _ = assets.synthetic_smpl(num_verts=170, seed=0)
    V = model0.v_template.shape[0]
    J = model0.J_regressor.shape[0]
    P = model0.posedirs.shape[2]

    kintree = np.zeros((2, J), np.int64)
    kintree[0] = np.concatenate([[2 ** 32 - 1], model0.parents[1:]])
    data = {
        # chumpy-wrapped array: the loader must unpickle without chumpy
        'v_template': _chumpy_wrap(np.asarray(model0.v_template)),
        'shapedirs': np.asarray(model0.shapedirs),
        # alternate on-disk posedirs layout (P, V*3)
        'posedirs': np.asarray(model0.posedirs).transpose(2, 0, 1
                                                          ).reshape(P, V * 3),
        'J_regressor': np.asarray(model0.J_regressor),
        'weights': np.asarray(model0.lbs_weights),
        'kintree_table': kintree,
        'f': np.asarray(model0.faces),
    }
    path = tmp_path / 'SMPL_NEUTRAL.pkl'
    with open(path, 'wb') as f:
        pickle.dump(data, f)

    model = assets.load_smpl_pkl(str(path))
    # The loader keeps the real-SMPL vertex-joint id table (valid for
    # V=6890); remap it for the tiny test mesh so forward passes compare.
    model = model._replace(vertex_joint_ids=model0.vertex_joint_ids)
    np.testing.assert_allclose(np.asarray(model.v_template),
                               np.asarray(model0.v_template))
    np.testing.assert_allclose(np.asarray(model.posedirs),
                               np.asarray(model0.posedirs))
    assert int(model.parents[0]) == -1
    np.testing.assert_array_equal(np.asarray(model.parents[1:]),
                                  np.asarray(model0.parents[1:]))

    # attach an extra-joint regressor and run a forward pass
    jx = tmp_path / 'J_regressor_extra.npy'
    np.save(jx, np.asarray(model0.J_regressor_extra))
    model = assets.load_extra_joint_regressor(model, str(jx))
    out = smpl_forward_pose72(model, jnp.zeros((2, 10)),
                              jnp.zeros((2, 72)))
    ref = smpl_forward_pose72(model0, jnp.zeros((2, 10)),
                              jnp.zeros((2, 72)))
    np.testing.assert_allclose(np.asarray(out.vertices),
                               np.asarray(ref.vertices), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.joints),
                               np.asarray(ref.joints), atol=1e-6)


def test_to_np_scipy_sparse_like():
    class FakeSparse:
        def __init__(self, a):
            self._a = a

        def toarray(self):
            return self._a

    a = np.arange(6.0).reshape(2, 3)
    np.testing.assert_array_equal(assets._to_np(FakeSparse(a)), a)


def test_load_mean_params(tmp_path):
    path = tmp_path / 'smpl_mean_params.npz'
    pose = np.random.RandomState(0).randn(1, 144).astype(np.float64)
    np.savez(path, pose=pose, shape=np.zeros((1, 10)), cam=np.ones((3,)))
    p, s, c = assets.load_mean_params(str(path))
    assert p.shape == (144,) and p.dtype == np.float32
    assert s.shape == (10,) and c.shape == (3,)


def test_load_gmm_prior_dict_schema(tmp_path):
    gmm = assets.synthetic_gmm_prior()
    path = tmp_path / 'gmm_08.pkl'
    with open(path, 'wb') as f:
        pickle.dump({'means': gmm['means'], 'covars': gmm['covs'],
                     'weights': gmm['weights']}, f)
    out = assets.load_gmm_prior(str(path))
    np.testing.assert_allclose(out['covs'], gmm['covs'])
    np.testing.assert_allclose(out['means'], gmm['means'])
