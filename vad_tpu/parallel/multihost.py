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


def owned_batch_positions(
    mesh,
    global_batch_size: int,
    process_count: Optional[int] = None,
    process_index: Optional[int] = None,
) -> np.ndarray:
    """Positions within a global batch THIS host must load, mesh-aware.

    The contiguous-slice contract (`local_sample_range`) holds only when
    the mesh groups each process's devices along the 'data' axis — true
    for the production layout (tp over ICI within a host, dp over DCN
    across hosts) but not for a mesh whose 'model' groups span processes
    (e.g. `multiprocess_check --model-parallel 2`, where the gate-conv
    collectives are deliberately pushed across the process boundary).
    There a data-axis shard is replicated over a cross-process model
    group, so EVERY process in that group must hold those samples.

    This computes ownership from the mesh itself: host p loads the
    concatenation of the data-axis row blocks whose model group contains
    one of its devices.  For a process-contiguous mesh this reduces
    exactly to the contiguous slice; spoofed topologies (tests passing
    process_count/process_index against a single-process mesh) keep the
    contiguous contract, since the virtual devices carry no real
    process_index.
    """
    spoofed = process_count is not None or process_index is not None
    real_pc = len({d.process_index for d in mesh.devices.flat}) if mesh is not None else 1
    if spoofed or real_pc == 1:
        start, count = local_sample_range(
            global_batch_size, process_count, process_index
        )
        return np.arange(start, start + count)
    grid = mesh.devices.reshape(mesh.devices.shape[0], -1)
    nrows = grid.shape[0]
    if global_batch_size % nrows != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by data axis {nrows}"
        )
    per = global_batch_size // nrows
    pid = jax.process_index()
    rows = [i for i in range(nrows)
            if any(d.process_index == pid for d in grid[i].flat)]
    return np.concatenate([np.arange(r * per, (r + 1) * per) for r in rows])


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
    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", False):
        # fully addressable also covers cross-process-tp meshes, where
        # every data shard is replicated onto some local device
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def put_global_batch(
    mesh,
    arrays: Dict[str, np.ndarray],
    global_batch_size: Optional[int] = None,
) -> Dict:
    """Assemble batch-sharded global jax.Arrays from process-LOCAL data.

    Each host passes only the samples it owns (`owned_batch_positions`:
    shape [B/P, ...] on a process-contiguous mesh; possibly the full
    batch on a cross-process-tp mesh); the result is the global [B, ...]
    array sharded over the 'data' axis.  With one process this is
    equivalent to `sharding.shard_batch` (the local data IS the global
    batch).  Non-array values pass through untouched.
    """
    sh = batch_sharding(mesh)
    pc = jax.process_count()
    out = {}
    pos = None
    for k, v in arrays.items():
        if not isinstance(v, np.ndarray):
            out[k] = v
            continue
        if pc == 1:
            gb = global_batch_size or v.shape[0]
            out[k] = jax.make_array_from_process_local_data(
                sh, v, (gb, *v.shape[1:])
            )
            continue
        gb = global_batch_size or v.shape[0] * pc
        global_shape = (gb, *v.shape[1:])
        if pos is None:
            pos = owned_batch_positions(mesh, gb)
        pos_to_local = {int(g): i for i, g in enumerate(pos)}

        def cb(index, v=v, p2l=pos_to_local, gb=gb):
            rows = [p2l[r] for r in range(*index[0].indices(gb))]
            return v[rows][tuple(index[1:])]

        out[k] = jax.make_array_from_callback(global_shape, sh, cb)
    return out
