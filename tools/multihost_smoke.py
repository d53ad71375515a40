"""Multi-host execution smoke: 2 REAL processes through jax.distributed.

VERDICT r03 #4: parallel/multihost.py had only single-host no-op coverage.
This tool launches two local worker processes that rendezvous at a
localhost coordinator (CPU backend, 2 virtual devices each -> a 4-device
global mesh across processes) and proves, with real cross-process
execution:

  1. maybe_initialize_distributed() brings up a 2-process cluster
     (parallel/multihost.py:20-41);
  2. process_shard() splits a work list by jax.process_index()
     (multihost.py:44-56) -- the reference's --sidx/--cbs contract
     (tuch/eft/fitter.py:52-55), derived automatically;
  3. a psum across BOTH processes' devices returns the correct global
     reduction (shard_map over the global mesh);
  4. the fit_eft shard-and-merge flow runs end-to-end under
     jax.process_index() (cli/fit_eft.py --auto_shard), each worker
     fitting its shard and the parent merging the .npz shards into one
     training db (merge semantics: tuch/eft/merge_temp_files.py:17-54).

Usage: python tools/multihost_smoke.py [--out docs/MULTIHOST_SMOKE.json]
Writes a JSON artifact and exits nonzero on any failed check. CPU-only:
never touches the TPU tunnel.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_PROC = 2
DEV_PER_PROC = 2


def worker(pid: int, shared_dir: str):
    import numpy as np

    import tuch_tpu  # noqa: F401  (re-asserts JAX_PLATFORMS from env)
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from tuch_tpu.parallel.multihost import (maybe_initialize_distributed,
                                             process_shard)

    out = {'pid': pid}
    assert maybe_initialize_distributed(), 'env vars missing'
    out['process_count'] = jax.process_count()
    out['process_index'] = jax.process_index()
    out['global_devices'] = jax.device_count()
    out['local_devices'] = jax.local_device_count()
    assert out['process_count'] == N_PROC
    assert out['process_index'] == pid
    assert out['global_devices'] == N_PROC * DEV_PER_PROC

    # ---- 2. process_shard splits by process_index -----------------------
    lo, hi = process_shard(10)
    out['shard_of_10'] = [lo, hi]
    assert (lo, hi) == ((0, 5) if pid == 0 else (5, 10))

    # ---- 3. psum across processes ---------------------------------------
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ('dp',))
    nd = jax.device_count()
    # each device carries (owner_process + 1): global psum == 2*1 + 2*2
    local = np.full((jax.local_device_count(), 1), pid + 1, np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('dp')), local, (nd, 1))
    f = jax.jit(shard_map(lambda x: jax.lax.psum(x, 'dp'), mesh=mesh,
                          in_specs=P('dp'), out_specs=P()))
    out['psum_across_processes'] = float(np.asarray(f(garr))[0, 0])
    assert out['psum_across_processes'] == float(
        DEV_PER_PROC * 1 + DEV_PER_PROC * 2), out['psum_across_processes']

    # ---- 4. fit_eft under jax.process_index() ---------------------------
    from tuch_tpu.cli import fit_eft
    fit_eft.main(['--synthetic', '--synthetic_num_verts', '170',
                  '--img_res', '64', '--max_steps', '3',
                  '--num_workers', '0', '--auto_shard',
                  '--out_dir', os.path.join(shared_dir, 'eft')])
    shard_file = os.path.join(shared_dir, 'eft',
                              f'dsc_df_eft_train_{pid}.npz')
    assert os.path.exists(shard_file), shard_file
    with np.load(shard_file) as d:
        out['eft_shard_indices'] = d['indices'].tolist()
    # 4 synthetic samples, ceil split -> [0, 1] / [2, 3]
    assert out['eft_shard_indices'] == ([0, 1] if pid == 0 else [2, 3])

    with open(os.path.join(shared_dir, f'worker_{pid}.json'), 'w') as f:
        json.dump(out, f)
    print(json.dumps(out))


def parent(out_path: str):
    import numpy as np

    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]

    shared = tempfile.mkdtemp(prefix='multihost_smoke_')
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        env.update({
            'JAX_PLATFORMS': 'cpu',
            'XLA_FLAGS': (env.get('XLA_FLAGS', '') +
                          f' --xla_force_host_platform_device_count='
                          f'{DEV_PER_PROC}').strip(),
            'JAX_COORDINATOR_ADDRESS': f'127.0.0.1:{port}',
            'JAX_NUM_PROCESSES': str(N_PROC),
            'JAX_PROCESS_ID': str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), '--pid', str(pid),
             '--shared', shared],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    rcs = []
    for pid, p in enumerate(procs):
        try:
            o, e = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            p.kill()
            o, e = p.communicate()
        rcs.append(p.returncode)
        if p.returncode != 0:
            print(f'worker {pid} rc={p.returncode}\n{e[-2000:]}',
                  file=sys.stderr)

    result = {'worker_rcs': rcs, 'n_processes': N_PROC,
              'devices_per_process': DEV_PER_PROC}
    ok = all(rc == 0 for rc in rcs)
    for pid in range(N_PROC):
        wf = os.path.join(shared, f'worker_{pid}.json')
        if os.path.exists(wf):
            with open(wf) as f:
                result[f'worker_{pid}'] = json.load(f)

    if ok:
        # ---- merge the two shards (merge_temp_files semantics) ----------
        shard_files = [os.path.join(shared, 'eft',
                                    f'dsc_df_eft_train_{p}.npz')
                       for p in range(N_PROC)]
        from tuch_tpu.cli import fit_eft
        merged_dir = os.path.join(shared, 'merged')
        fit_eft.main(['--synthetic', '--synthetic_num_verts', '170',
                      '--img_res', '64', '--num_workers', '0',
                      '--out_dir', merged_dir, '--merge'] + shard_files)
        import joblib
        db = joblib.load(os.path.join(merged_dir, 'dsc_df_eft_train.pt'))
        checks = []
        for p, sf in enumerate(shard_files):
            with np.load(sf) as d:
                idx = d['indices']
                checks.append(bool(np.array_equal(db['pose'][idx],
                                                  d['pose'][idx])))
        result['merge_rows_match_shards'] = checks
        result['merged_n'] = int(len(db['pose']))
        ok = all(checks) and result['merged_n'] == 4

    result['ok'] = ok
    with open(out_path, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    sys.exit(0 if ok else 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pid', type=int, default=None)
    ap.add_argument('--shared', default=None)
    ap.add_argument('--out', default='docs/MULTIHOST_SMOKE.json')
    args = ap.parse_args()
    if args.pid is not None:
        worker(args.pid, args.shared)
    else:
        parent(args.out)


if __name__ == '__main__':
    main()
