"""Root-cause experiment for the r03 TPU device faults (VERDICT item #2).

Hypothesis: the r03 bench faults were NOT a bad Pallas kernel but the
documented axon-tunnel limitation (CLAUDE.md: "Run TPU jobs strictly ONE
at a time: two concurrent clients through the tunnel can deadlock each
other"). r03's bench.py held a LIVE client in the main process (it had
just run the headline + baseline measurements) while each train-step arm
spawned a SECOND client in a subprocess. After the arms finished, every
main-process dispatch failed with
`UNAVAILABLE: TPU device error -- often a kernel fault`
(bench_full_r03.stderr, 6 consecutive failures) -- i.e. the parent's
client had been poisoned, exactly what this experiment reproduces.

Protocol (each phase bounded; prints one JSON line at the end):
  A. parent creates a client, runs a tiny jit, KEEPS the client alive.
  B. subprocess creates its own client and runs a tiny jit (sequential
     w.r.t. parent DISPATCH, but the parent client stays registered).
  C. parent dispatches again on its original client.
If C fails with UNAVAILABLE while A and B succeeded, the two-client
overlap is the fault mechanism and the bench orchestrator must never
hold a client of its own (bench.py r04 design).

Usage: python tools/repro_concurrent_clients.py [--child-heavy]
  --child-heavy makes the subprocess run a multi-second matmul chain,
  matching the r03 arm workload shape more closely.
"""

import json
import subprocess
import sys
import time

sys.path.insert(0, '.')

CHILD_LIGHT = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((256, 256));"
    "y = jax.jit(lambda a: a @ a)(x);"
    "print(float(y[0, 0]))"
)
CHILD_HEAVY = (
    "import jax, jax.numpy as jnp;"
    "f = jax.jit(lambda a: jax.lax.fori_loop("
    "    0, 200, lambda i, c: c @ c * 1e-3 + 1.0, a));"
    "x = jnp.ones((2048, 2048), jnp.bfloat16);"
    "print(float(f(x)[0, 0]))"
)


def main():
    heavy = '--child-heavy' in sys.argv
    out = {'child_heavy': heavy}

    import jax
    import jax.numpy as jnp

    # Phase A: parent client up + one dispatch
    t0 = time.time()
    x = jnp.ones((512, 512))
    f = jax.jit(lambda a: (a @ a).sum())
    va = float(f(x))
    out['parent_first_dispatch'] = {'ok': True, 's': round(time.time() - t0, 2),
                                    'value': va}
    print(f'A: parent dispatch OK ({va})', file=sys.stderr)

    # Phase B: subprocess client while parent client stays alive
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, '-c',
                            CHILD_HEAVY if heavy else CHILD_LIGHT],
                           capture_output=True, text=True, timeout=600)
        out['child'] = {'rc': p.returncode, 's': round(time.time() - t0, 2),
                        'stderr_tail': (p.stderr or '')[-300:].strip()
                        if p.returncode else ''}
    except subprocess.TimeoutExpired:
        out['child'] = {'rc': None, 's': round(time.time() - t0, 2),
                        'error': 'timeout (possible two-client deadlock)'}
    print(f'B: child rc={out["child"].get("rc")}', file=sys.stderr)

    # Phase C: parent dispatches again on its ORIGINAL client
    t0 = time.time()
    try:
        vc = float(f(x + 1.0))
        out['parent_redispatch'] = {'ok': True,
                                    's': round(time.time() - t0, 2),
                                    'value': vc}
    except Exception as e:
        out['parent_redispatch'] = {'ok': False,
                                    's': round(time.time() - t0, 2),
                                    'error': repr(e)[:400]}
    print(f'C: parent redispatch ok={out["parent_redispatch"]["ok"]}',
          file=sys.stderr)

    out['verdict'] = (
        'two-client overlap poisons the parent client'
        if (out['parent_first_dispatch']['ok']
            and out['child'].get('rc') == 0
            and not out['parent_redispatch']['ok'])
        else 'no poisoning observed in this run')
    print(json.dumps(out))


if __name__ == '__main__':
    main()
