"""Reliable device synchronization for timing loops.

Through the axon remote-dispatch tunnel, ``jax.block_until_ready`` is NOT
a reliable execution barrier: readiness of SMALL output buffers can be
reported before the computation actually finishes. Measured 2026-08-18 on
the v5e tunnel: a jitted 100-matmul (4096x4096) chain takes ~115 ms, but
with its output sliced to shape (69,), ``block_until_ready`` returned in
0.03 ms while the device was still working; syncing the same program by
FETCHING the output bytes took the true ~115 ms. Scalar outputs showed the
same early-ready behavior intermittently in other runs. Large outputs
(>= a few KB) measured reliable, and a one-element fetch issued after a
real completion costs only ~1-3 ms (not a full ~25 ms dispatch RTT), so
fetching bytes is both correct and cheap.

Rule for every timing loop in this repo: sync with :func:`fetch_sync`,
never bare ``block_until_ready``. (Non-timing uses of block_until_ready
are fine -- a too-early return there only weakens pipelining, it cannot
corrupt results, because value fetches always see completed bytes.)
"""

import numpy as np


def fetch_sync(out):
    """Block on ``out`` AND fetch one element of it to the host.

    The fetch is the actual barrier (see module docstring); the
    block_until_ready first is belt-and-braces and lets large trees
    settle without transferring them. Returns ``out`` unchanged.
    """
    import jax

    jax.block_until_ready(out)
    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if isinstance(l, jax.Array)]
    if leaves:
        # smallest leaf: cheapest honest fetch. If even that is big,
        # slice one element on device first so we never pull megabytes
        # into a timing loop.
        leaf = min(leaves, key=lambda l: l.size)
        np.asarray(leaf if leaf.size <= 64 else leaf.ravel()[:1])
    return out
