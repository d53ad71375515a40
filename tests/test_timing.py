"""fetch_sync: the reliable timing barrier (utils/timing.py).

On CPU these are behavioral checks (returns the tree unchanged, tolerates
non-device leaves); the property it exists for -- that byte fetches are a
true execution barrier where the axon tunnel's small-buffer readiness is
not -- is hardware behavior documented in the module docstring and can
only be observed through the tunnel.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tuch_tpu.utils.timing import fetch_sync


def test_fetch_sync_returns_tree_unchanged():
    tree = {'a': jnp.arange(5.0), 'b': (jnp.zeros((3, 4)),
                                        jnp.asarray(2, jnp.int32))}
    out = fetch_sync(tree)
    assert out is tree
    np.testing.assert_array_equal(np.asarray(out['a']), np.arange(5.0))


def test_fetch_sync_tolerates_non_device_and_empty_trees():
    assert fetch_sync({}) == {}
    assert fetch_sync(None) is None
    mixed = {'np': np.ones(3), 'py': 7, 'dev': jnp.ones(3)}
    assert fetch_sync(mixed) is mixed


def test_fetch_sync_on_jitted_output():
    f = jax.jit(lambda x: (x * 2, x.sum()))
    out = fetch_sync(f(jnp.arange(4.0)))
    np.testing.assert_allclose(np.asarray(out[0]), [0, 2, 4, 6])
    assert float(out[1]) == 6.0


def test_fetch_sync_large_leaf_sliced_not_pulled():
    # smallest-leaf selection: the scalar is fetched, the big leaf only
    # sliced -- we can at least assert no exception and identity
    big = jnp.zeros((512, 512))
    out = fetch_sync((big, jnp.float32(1.0)))
    assert out[0] is big
