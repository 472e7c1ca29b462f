"""Multi-host (multi-process) input sharding.

On a TPU pod slice each JAX process addresses only its local chips;
``jax.device_put`` of host numpy onto a mesh that spans other hosts' devices
is not available there.  This module is the process-aware placement layer:

- ``put_global(sharding, arr)`` builds a global jax.Array from host data by
  materializing only the *addressable* shards on each process
  (``jax.make_array_from_callback``).  Every process must hold the same
  global numpy array (cheap here: TrajNet++ scene stores are a few MB) and
  the same placement call — which the trainers guarantee by seeding the
  epoch-plan RNG identically on every process.  On a single process this is
  exactly ``jax.device_put``.
- ``process_slice(n)`` partitions ``n`` work items (scenes, datasets) across
  processes for host-side fan-out — the TPU-pod replacement for the
  reference evaluator's 12-process joblib pool
  (/root/reference/trajnetbaselines/lstm/trajnet_evaluator.py:61).
- ``all_processes_agree(x)`` is a collective sanity check for plan
  divergence (seed drift between hosts produces silently-wrong gathers; this
  turns it into a loud failure).

The trainers call ``put_global`` unconditionally: with one process it
devolves to ``device_put``, so the single-chip path pays nothing.
"""

from typing import Optional, Sequence, Tuple

import numpy as np


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) of this JAX process."""
    import jax

    return jax.process_index(), jax.process_count()


def put_global(sharding, arr):
    """Place a host array onto a (possibly multi-host) sharding.

    ``arr`` is the *global* value; only the shards addressable from this
    process are materialized.  Single-process: identical to
    ``jax.device_put(arr, sharding)``.
    """
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda index: jnp.asarray(arr[index])
    )


def put_global_tree(sharding_fn, tree):
    """``put_global`` over a pytree; sharding_fn(leaf) -> Sharding."""
    import jax

    return jax.tree.map(lambda leaf: put_global(sharding_fn(leaf), leaf), tree)


def process_slice(n: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> slice:
    """This process's contiguous share of ``n`` items (balanced, deterministic).

    The first ``n % p`` processes take one extra item, so sizes differ by at
    most one and every item is covered exactly once.
    """
    if process_index is None or process_count is None:
        pi, pc = process_info()
        process_index = pi if process_index is None else process_index
        process_count = pc if process_count is None else process_count
    base, extra = divmod(n, process_count)
    start = process_index * base + min(process_index, extra)
    stop = start + base + (1 if process_index < extra else 0)
    return slice(start, stop)


def shard_items(items: Sequence, process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> Sequence:
    """The subsequence of ``items`` this process owns (see process_slice)."""
    return items[process_slice(len(items), process_index, process_count)]


def all_processes_agree(x) -> bool:
    """True iff every process passed an identical array/scalar.

    All-gathers the value (``multihost_utils.process_allgather``) and
    compares every row to process 0's; single-process returns True without
    touching the device.  The trainers call this on a digest of each epoch
    plan so cross-host seed drift fails loudly instead of producing
    silently-wrong gathers.
    """
    import jax

    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(x))
    return bool(np.all(gathered == gathered[0]))


def broadcast_from_zero(value):
    """Process 0's host value to every process (single-process: identity).

    For filesystem-derived control-flow decisions (e.g. the evaluator's
    skip-if-exists check) that must be uniform across hosts: NFS attribute
    caching can make directory visibility diverge right after process 0
    publishes a rename, and divergent branches would desynchronize the
    collective barriers that follow.
    """
    import jax

    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(np.asarray(value))
