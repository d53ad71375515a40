"""Measure host->device batch upload through the tunnel.

Real training uploads a fresh ~38 MB image batch every step (B=64 fp32
224^2 NHWC). bench.py times steps with DEVICE-RESIDENT batches, so if the
upload is synchronous and slow it taxes real runs invisibly. This prints:
  - device_put call time (does it block?)
  - time until the transferred bytes are actually usable on device
  - effective H2D bandwidth

Usage: python tools/measure_h2d.py [--batch 64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tuch_tpu.utils.timing import fetch_sync

    B = args.batch
    mb = B * 224 * 224 * 3 * 4 / 1e6
    rng = np.random.RandomState(0)

    # consume = a trivial jitted reduction so "usable on device" is
    # observable (fetch_sync alone would also transfer D2H)
    consume = jax.jit(lambda x: x.sum())
    x0 = rng.randn(B, 224, 224, 3).astype(np.float32)
    fetch_sync(consume(jax.device_put(x0)))  # warm compile + path

    res = {'batch': B, 'mb_per_batch': round(mb, 1)}
    put_call, usable = [], []
    for i in range(5):
        x = rng.randn(B, 224, 224, 3).astype(np.float32)
        t0 = time.perf_counter()
        d = jax.device_put(x)
        t1 = time.perf_counter()
        fetch_sync(consume(d))
        t2 = time.perf_counter()
        put_call.append(t1 - t0)
        usable.append(t2 - t0)
    res['device_put_call_ms'] = round(1e3 * float(np.median(put_call)), 2)
    res['usable_on_device_ms'] = round(1e3 * float(np.median(usable)), 2)
    res['h2d_mb_per_s'] = round(mb / float(np.median(usable)) * 1e3 / 1e3, 1)
    # overlap check: start TWO puts back to back, then consume both --
    # if the second upload overlaps the first, total << 2x single
    xa = rng.randn(B, 224, 224, 3).astype(np.float32)
    xb = rng.randn(B, 224, 224, 3).astype(np.float32)
    t0 = time.perf_counter()
    da, db = jax.device_put(xa), jax.device_put(xb)
    fetch_sync((consume(da), consume(db)))
    res['two_puts_ms'] = round(1e3 * (time.perf_counter() - t0), 2)
    print(json.dumps(res))


if __name__ == '__main__':
    main()
