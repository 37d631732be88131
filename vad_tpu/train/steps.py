"""Jitted train / eval steps, SPMD over the device mesh.

One compiled train step does: forward (train-mode BN), loss, backward,
Adam update, BN running-stat update — with the input batch donated and
sharded over the mesh 'data' axis.  XLA's SPMD partitioner inserts the
gradient all-reduce; there is no hand-written collective here
(SURVEY §5.8: the reference has no distributed path at all).

Eval steps return per-sample losses and anomaly scores so the host can
mask padded tail batches exactly (vad_tpu.parallel.pad_batch_for_devices).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from vad_tpu.parallel.sharding import batch_sharding, replicate_sharding


def u8_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Device-side uint8 -> float32 [-1, 1] (framework normalization
    contract).  Trainers feed raw uint8 batches — a quarter of the
    host->device bytes of pre-normalized f32 — and pay this on the VPU."""
    return x.astype(jnp.float32) / 127.5 - 1.0


def make_train_step(
    per_sample_loss_fn: Callable, mesh=None, preprocess=None, state_shardings=None
):
    """Compiled (state, images, n_real) -> (state, loss) step.

    The loss is a masked mean over the first ``n_real`` samples, so padded
    tail entries (static jit shapes) contribute nothing to the loss or its
    gradients.  Caveat: padded duplicates DO enter train-mode BatchNorm
    batch statistics — trainers therefore drop tail batches whenever the
    dataset allows and only pad when unavoidable (dataset smaller than a
    batch, or a mesh data axis that doesn't divide the batch).
    ``preprocess`` (e.g. u8_normalize) runs inside the compiled step.

    ``state_shardings`` (a TrainState-shaped pytree of NamedShardings, see
    vad_tpu.parallel.train_state_shardings) pins the state's in/out
    placement — required under tensor parallelism where the state is not
    uniformly replicated; defaults to fully replicated when only ``mesh``
    is given.
    """

    def step(state, images, n_real):
        if preprocess is not None:
            images = preprocess(images)
        mask = jnp.arange(images.shape[0]) < n_real
        denom = jnp.maximum(n_real, 1).astype(jnp.float32)

        def objective(params):
            recon, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            losses = per_sample_loss_fn(recon, images)
            loss = jnp.sum(jnp.where(mask, losses, 0.0)) / denom
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, loss

    kwargs = {}
    if mesh is not None:
        state_sh = (
            state_shardings if state_shardings is not None else replicate_sharding(mesh)
        )
        kwargs["in_shardings"] = (
            state_sh,
            batch_sharding(mesh),
            replicate_sharding(mesh),
        )
        kwargs["out_shardings"] = (state_sh, replicate_sharding(mesh))
    # donate only the state: params/opt buffers are reused in place; the
    # image batch has no same-shape output to alias.
    return jax.jit(step, donate_argnums=(0,), **kwargs)


def make_eval_step(
    per_sample_loss_fn: Callable, score_method, mesh=None, preprocess=None,
    state_shardings=None,
):
    """Compiled (state, images) -> (per-sample loss [B], score [B]) step.

    score_method: model method computing reconstruction error (bound via
    apply_fn's ``method=``); runs inference-mode BN (running stats), like
    the reference's model.eval() during validation (train.py:63).  Padded
    tail entries are sliced off by the caller on host.

    ``state_shardings``: pass the SAME layout as the train step's so an
    interleaved train/eval epoch never reshards the params (under tp a
    replicated eval in_sharding would all-gather the gate kernels every
    validation batch).
    """

    def step(state, images):
        if preprocess is not None:
            images = preprocess(images)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        recon = state.apply_fn(variables, images, train=False)
        losses = per_sample_loss_fn(recon, images)
        scores = state.apply_fn(variables, images, method=score_method)
        return losses, scores

    kwargs = {}
    if mesh is not None:
        state_sh = (
            state_shardings if state_shardings is not None else replicate_sharding(mesh)
        )
        kwargs["in_shardings"] = (state_sh, batch_sharding(mesh))
        kwargs["out_shardings"] = (batch_sharding(mesh), batch_sharding(mesh))
    return jax.jit(step, **kwargs)


