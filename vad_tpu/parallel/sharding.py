"""Device mesh + sharding layout for single-chip through multi-host runs.

The reference is strictly single-device (SURVEY §2.3: no torch.distributed
anywhere).  Here parallelism is a first-class axis of the design:

- a `Mesh` over all visible devices with axes ``('data', 'model')``;
- batches sharded over 'data' (pure data parallelism is the honest scaling
  axis for these conv autoencoders — gradient psum rides ICI, inserted by
  the SPMD partitioner under `jit`);
- the 'model' axis shards the widest channel dimensions (the ConvLSTM
  gate convolutions hold 2.36M of the video model's 2.7M params) for
  tensor parallelism when a single step must span chips;
- everything runs under plain `jax.jit` with NamedSharding-annotated
  inputs — XLA inserts all collectives; there is no hand-written
  communication on the training path.

The same code path covers 1 device (trivial mesh) to a multi-host slice
(extend the mesh over DCN) — tests exercise it on 8 virtual CPU devices.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def get_mesh(
    devices: Optional[Sequence] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Mesh over the given (default: all) devices.

    ``model_parallel`` splits off a trailing 'model' axis; the remainder is
    'data'.  On one device both axes are size 1 and everything below is a
    no-op, so callers never special-case chip counts.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over 'data', rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_frame_sharding(mesh: Mesh) -> NamedSharding:
    """[S, T, H, W, C] frames: slots over 'data', image rows over 'model'.

    Spatial partitioning for the fully-convolutional serving path: the
    'model' axis splits the H dimension, and XLA's SPMD partitioner
    inserts the halo exchanges each 3x3 conv / 2x2 pool / ConvTranspose
    needs at shard edges automatically — there is no hand-written
    communication.  This is how a single high-resolution (e.g. native
    720p) stream spans chips when one chip's latency or HBM binds,
    complementing the embarrassingly-parallel 'data' slot axis.
    """
    return NamedSharding(mesh, P(DATA_AXIS, None, MODEL_AXIS))


def spatial_state_sharding(mesh: Mesh) -> NamedSharding:
    """Carried ConvLSTM (h, c) [S, h, w, C]: slots over 'data', latent
    rows over 'model' — resident exactly where the sharded activations
    that update them live, so the recurrence inserts no resharding."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def convlstm_param_shardings(params, mesh: Mesh):
    """NamedSharding tree for video-model params: ConvLSTM gate kernels
    sharded over 'model' on their output-channel dim, rest replicated.

    The gate conv kernel is [k, k, cin+ch, 4*ch]; splitting the last dim
    keeps each device's share of the 4 gates contiguous per gate group
    only when 4*ch % model_axis == 0 — asserted at setup.
    """
    model_n = mesh.shape[MODEL_AXIS]

    def spec_for(path, leaf) -> NamedSharding:
        names = [getattr(p, "key", str(p)) for p in path]
        in_gate_layer = any("ConvLSTMLayer" in n for n in names)
        if model_n > 1 and in_gate_layer and leaf.shape[-1] % model_n == 0:
            if names[-1] == "kernel" and leaf.ndim == 4:
                return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
            if names[-1] == "bias" and leaf.ndim == 1:
                return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def opt_state_shardings(opt_state, params, mesh: Mesh):
    """NamedSharding tree for the optimizer state, mirroring the params.

    Adam's mu/nu moments (the same size as the params) get
    `convlstm_param_shardings`; scalars and hyperparameters are
    replicated.  Under tensor parallelism this keeps each device's moment
    shards aligned with its param shards instead of holding full-size
    replicated moments (which would undercut the memory rationale of the
    tp axis).

    Moments are identified primarily by TYPE — `optax.ScaleByAdamState`
    (covers adam/adamw/scale_by_adam however they are chained or wrapped
    in `inject_hyperparams`) — with a structure-AND-leaf-shape match as
    the fallback for other optax transforms that carry params-sized
    accumulators (e.g. `optax.trace` momentum).  Bare structure equality
    alone is NOT enough: a params-structured tree of scalars (per-param
    schedules, loss-scale trees) would match the treedef while its leaves
    cannot take per-channel shardings.
    """
    import optax

    param_sh = convlstm_param_shardings(params, mesh)
    pdef = jax.tree.structure(params)
    pshapes = [jnp_shape(leaf) for leaf in jax.tree.leaves(params)]
    repl = replicate_sharding(mesh)

    def params_like(node) -> bool:
        try:
            if jax.tree.structure(node) != pdef:
                return False
            return [jnp_shape(leaf) for leaf in jax.tree.leaves(node)] == pshapes
        except Exception:
            return False

    def stop(node) -> bool:
        return isinstance(node, optax.ScaleByAdamState) or params_like(node)

    def fix(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=repl, mu=param_sh, nu=param_sh)
        return param_sh if params_like(node) else repl

    return jax.tree.map(fix, opt_state, is_leaf=stop)


def jnp_shape(leaf) -> tuple:
    """Shape of an array-ish leaf; () for python scalars."""
    return tuple(getattr(leaf, "shape", ()))


def train_state_shardings(state, mesh: Mesh):
    """Sharding pytree for a full TrainState under the ('data','model') mesh:
    params via `convlstm_param_shardings`, Adam moments mirroring them
    (`opt_state_shardings`), step counter / batch stats replicated.

    Pass this as the train step's in/out sharding so the compiled step's
    output placement is pinned to the declared layout — without it GSPMD
    propagation is free to shard extra leaves, and the state's placement
    would drift from what the host device_put established.
    """
    repl = replicate_sharding(mesh)
    return state.replace(
        step=repl,
        params=convlstm_param_shardings(state.params, mesh),
        opt_state=opt_state_shardings(state.opt_state, state.params, mesh),
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
    )


def data_parallel_jit(fn, mesh: Optional[Mesh]):
    """jit ``fn(variables, batch)`` data-parallel over the mesh: variables
    replicated, every batch-leading input/output split over 'data'.

    Implemented with `jax.shard_map` rather than GSPMD sharding
    annotations: the eval/scoring computations are batch-elementwise, so
    each chip runs the UNMODIFIED per-shard computation on its batch
    slice with zero collectives — and, unlike the GSPMD route, a Pallas
    kernel inside ``fn`` stays a per-chip kernel instead of hitting the
    SPMD partitioner (which cannot split a custom call).  Results are
    bitwise identical to the unsharded computation because convolutions
    and per-sample reductions never mix batch elements.

    The out_spec is a pytree prefix, so any output structure whose every
    leaf is batch-leading (per-sample scalars, per-frame scores, error
    maps) is covered.  ``mesh=None`` degrades to plain jit — callers
    never special-case device counts.
    """
    if mesh is None:
        return jax.jit(fn)
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict:
    """device_put array fields with batch sharding; pass metadata through."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        out[k] = jax.device_put(v, sh) if isinstance(v, np.ndarray) else v
    return out


def padded_batch_size(batch_size: int, mesh: Mesh, accum_steps: int = 1) -> int:
    """Smallest multiple of the data-axis size >= batch_size (static jit
    shape that every device can take an equal slice of).

    With ``accum_steps`` > 1 the multiple is data_axis * accum_steps, so
    every gradient-accumulation microbatch itself divides evenly over the
    'data' axis (train.steps.make_train_step reshapes the global batch to
    [accum, B/accum, ...])."""
    n = mesh.shape[DATA_AXIS] * max(1, accum_steps)
    return ((batch_size + n - 1) // n) * n


def pad_batch_for_devices(arrays: Dict, batch_size: int) -> tuple[Dict, int]:
    """Pad every array's leading dim up to ``batch_size`` by repeating the
    final sample.  Returns (padded, n_real).

    Keeps jit shapes static across the tail batch and keeps the batch
    divisible by the data axis; callers mask the padded tail on host.
    """
    first = next(v for v in arrays.values() if isinstance(v, np.ndarray))
    n_real = first.shape[0]
    if n_real == batch_size:
        return arrays, n_real
    if n_real > batch_size:
        raise ValueError(f"batch of {n_real} exceeds configured size {batch_size}")
    out = {}
    for k, v in arrays.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == n_real:
            pad = np.repeat(v[-1:], batch_size - n_real, axis=0)
            out[k] = np.concatenate([v, pad], axis=0)
        else:
            out[k] = v
    return out, n_real
