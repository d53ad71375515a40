"""Multi-host utilities: distributed init + process-sharded work split.

The reference's only multi-machine mechanism is embarrassingly-parallel
index-sharded cluster jobs merged offline (fit_eft --sidx/--cbs,
tuch/eft/fitter.py:52-55, merge_temp_files.py). The TPU-native analog:

  * within a slice, data parallelism over ICI via the mesh in
    parallel/mesh.py (jit inserts the collectives);
  * across hosts, jax.distributed.initialize + per-process index ranges --
    the same shard-and-merge semantics driven by jax.process_index()
    instead of a --sidx flag.
"""

import os
from typing import Optional, Tuple

import jax


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when multi-host env vars are present.

    Safe no-op on single-host (returns False). Honors the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    environment or explicit args.
    """
    coordinator = coordinator or os.environ.get('JAX_COORDINATOR_ADDRESS')
    if coordinator is None:
        return False
    # Idempotent: library entry points (e.g. cli/fit_eft --auto_shard) call
    # this defensively; a second jax.distributed.initialize would raise
    # once the backend is live.
    try:
        if jax.distributed.is_initialized():
            return True
    except AttributeError:  # pragma: no cover - older jax
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, 'client', None) is not None:
            return True
    kwargs = {'coordinator_address': coordinator}
    num_processes = num_processes or os.environ.get('JAX_NUM_PROCESSES')
    process_id = process_id if process_id is not None \
        else os.environ.get('JAX_PROCESS_ID')
    if num_processes is not None:
        kwargs['num_processes'] = int(num_processes)
    if process_id is not None:
        kwargs['process_id'] = int(process_id)
    jax.distributed.initialize(**kwargs)
    return True


def process_shard(n_items: int) -> Tuple[int, int]:
    """This process's [lo, hi) range of a length-n work list.

    Single-host: the whole range. Multi-host: contiguous split by
    jax.process_index() (the reference's --sidx/--cbs, derived
    automatically).
    """
    p = jax.process_index()
    np_ = jax.process_count()
    per = -(-n_items // np_)  # ceil
    lo = min(p * per, n_items)
    hi = min(lo + per, n_items)
    return lo, hi
