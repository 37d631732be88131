"""Per-host sharded input feeding for multi-host (DCN) meshes.

Single-host feeding (`sharding.shard_batch`) builds the FULL global batch
in one process and lets `device_put` scatter it.  On a multi-host slice
that is wrong twice: every host would decode every sample, and each
host can only address its own local devices.  The JAX-native contract is:

- every process runs the SAME program over the SAME global mesh;
- each process loads ONLY the samples that land on its local devices
  (a contiguous slice of the data axis, since mesh device order groups
  by process);
- `jax.make_array_from_process_local_data` assembles the global jax.Array
  from the per-process shards — no cross-host data movement at feed time,
  and the jitted step sees one logical array regardless of process count.

All functions degenerate to the single-host behavior when
`jax.process_count() == 1`, so trainers can call them unconditionally
(tests do exactly that on the 8-virtual-device CPU mesh).  The reference
has no distributed input path at all (SURVEY §2.3, §5.8).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from vad_tpu.parallel.sharding import DATA_AXIS, batch_sharding


def local_sample_range(
    global_batch_size: int,
    process_count: Optional[int] = None,
    process_index: Optional[int] = None,
) -> Tuple[int, int]:
    """(start, count) of this host's contiguous slice of a global batch.

    The data axis is laid out in mesh-device order, which JAX guarantees
    groups local devices per process, so host p owns samples
    [p*B/P, (p+1)*B/P).  ``global_batch_size`` must divide evenly by the
    process count (pad via `sharding.padded_batch_size` upstream).
    """
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    if global_batch_size % pc != 0:
        raise ValueError(f"global batch {global_batch_size} not divisible by {pc} hosts")
    per = global_batch_size // pc
    return pi * per, per


def host_batch_indices(
    order: np.ndarray,
    step: int,
    global_batch_size: int,
    process_count: Optional[int] = None,
    process_index: Optional[int] = None,
) -> np.ndarray:
    """Dataset indices THIS host loads for global step ``step``.

    ``order``: the epoch's global sample permutation — every host must
    hold the same one (seed the shuffle identically; the permutation is
    metadata, not data).  Hosts take disjoint contiguous slices of each
    global batch; the union across hosts is exactly the global batch.
    """
    start, count = local_sample_range(global_batch_size, process_count, process_index)
    lo = step * global_batch_size + start
    return order[lo : lo + count]


def to_host(x) -> np.ndarray:
    """Full GLOBAL array as host numpy, on every process.

    Single-process (all shards addressable): a plain copy.  Multi-host:
    `process_allgather` — each host holds only its shard of a
    batch-sharded eval output, but the metric code (AUROC, separation)
    needs the global view everywhere.  Metric arrays are tiny (one scalar
    per sample), so the DCN gather is noise next to the eval step.
    """
    if isinstance(x, np.ndarray):
        return x
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def put_global_batch(
    mesh,
    arrays: Dict[str, np.ndarray],
    global_batch_size: Optional[int] = None,
) -> Dict:
    """Assemble batch-sharded global jax.Arrays from process-LOCAL data.

    Each host passes only its own samples (shape [B/P, ...]); the result
    is the global [B, ...] array sharded over the 'data' axis.  With one
    process this is equivalent to `sharding.shard_batch` (the local data
    IS the global batch).  Non-array values pass through untouched.
    """
    sh = batch_sharding(mesh)
    pc = jax.process_count()
    out = {}
    for k, v in arrays.items():
        if not isinstance(v, np.ndarray):
            out[k] = v
            continue
        gb = global_batch_size or v.shape[0] * pc
        global_shape = (gb, *v.shape[1:])
        out[k] = jax.make_array_from_process_local_data(sh, v, global_shape)
    return out
