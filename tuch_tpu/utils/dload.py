"""Batch-to-device helper (mirror of tuch/utils/dload.py)."""

import jax
import jax.numpy as jnp
import numpy as np


def dict_to_device(batch: dict, sharding=None) -> dict:
    """Move every array value of a batch dict onto the default device (or
    the given sharding); non-arrays pass through."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jnp.ndarray)):
            out[k] = jax.device_put(jnp.asarray(v), sharding)
        else:
            out[k] = v
    return out
