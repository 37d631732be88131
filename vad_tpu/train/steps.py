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
from vad_tpu.utils.precision import cast_floating


def u8_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Device-side uint8 -> float32 [-1, 1] (framework normalization
    contract).  Trainers feed raw uint8 batches — a quarter of the
    host->device bytes of pre-normalized f32 — and pay this on the VPU."""
    return x.astype(jnp.float32) / 127.5 - 1.0


def make_train_step(
    per_sample_loss_fn: Callable, mesh=None, preprocess=None, state_shardings=None,
    compute_dtype=None, accum_steps=1,
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

    ``compute_dtype`` (e.g. jnp.bfloat16) enables mixed-precision
    training: params and activations are cast to it INSIDE the
    differentiated objective, so forward+backward convs run at the MXU's
    bf16 rate while the master params, Adam moments, gradients (autodiff
    accumulates them through the cast in the params' own f32), loss, and
    BatchNorm running statistics all stay float32.  No loss scaling: bf16
    shares float32's exponent range, so reconstruction-loss gradients
    cannot underflow the way fp16's would (TPU-native practice; the torch
    reference has no AMP path).  None = full f32 (reference-parity
    default).

    ``accum_steps`` > 1 enables gradient accumulation: the batch is split
    into that many equal microbatches and a single ``lax.scan`` runs
    forward+backward per microbatch, accumulating gradient SUMS in the
    master f32 params' dtype, then applies ONE Adam update — so a batch
    that doesn't fit in HBM trains with identical optimizer semantics to
    the large batch (gradients are linear: sum-then-divide equals the
    full-batch masked mean).  The one intentional difference, as in every
    framework's accumulation: train-mode BatchNorm normalizes each
    microbatch by its own statistics and the running stats advance once
    per microbatch.  Activation memory is that of ONE microbatch (the
    scan re-runs the forward per slice); `--remat` composes on top for
    the video model's time axis.  The batch size must be divisible by
    ``accum_steps``.
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    def accum_step(state, images, n_real):
        batch = images.shape[0]
        if batch % accum_steps:
            raise ValueError(
                f"batch size {batch} not divisible by accum_steps {accum_steps}"
            )
        micro = batch // accum_steps
        mask = jnp.arange(batch) < n_real
        denom = jnp.maximum(n_real, 1).astype(jnp.float32)

        def sum_objective(params, stats, mb_images, mb_mask):
            """Masked SUM of per-sample losses over one microbatch (division
            by n_real happens once, after accumulation)."""
            if preprocess is not None:
                mb_images = preprocess(mb_images)
            if compute_dtype is not None:
                p = cast_floating(params, compute_dtype)
                x = mb_images.astype(compute_dtype)
            else:
                p, x = params, mb_images
            # running stats stay f32 uncast: train-mode BN never normalizes
            # with them (only the EMA update reads them), and a bf16 round
            # trip would inject ~4e-3 relative noise into the checkpointed
            # inference statistics every step
            s = stats
            recon, mutated = state.apply_fn(
                {"params": p, "batch_stats": s}, x, train=True,
                mutable=["batch_stats"],
            )
            losses = per_sample_loss_fn(
                recon.astype(jnp.float32), mb_images.astype(jnp.float32)
            )
            loss_sum = jnp.sum(jnp.where(mb_mask, losses, 0.0))
            # scan-carry dtype stability: stats return in their master dtype
            new_stats = jax.tree.map(
                lambda new, old: new.astype(old.dtype), mutated["batch_stats"], stats
            )
            return loss_sum, new_stats

        xs = (
            images.reshape(accum_steps, micro, *images.shape[1:]),
            mask.reshape(accum_steps, micro),
        )
        grad_fn = jax.value_and_grad(sum_objective, has_aux=True)

        def body(carry, x):
            g_acc, stats, l_acc = carry
            mb_images, mb_mask = x
            (loss_sum, new_stats), g = grad_fn(state.params, stats, mb_images, mb_mask)
            return (
                jax.tree.map(jnp.add, g_acc, g),
                new_stats,
                l_acc + loss_sum,
            ), None

        g0 = jax.tree.map(jnp.zeros_like, state.params)
        (g_sum, new_stats, loss_sum), _ = jax.lax.scan(
            body, (g0, state.batch_stats, jnp.float32(0.0)), xs
        )
        grads = jax.tree.map(lambda g: g / denom, g_sum)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, loss_sum / denom

    def step(state, images, n_real):
        if preprocess is not None:
            images = preprocess(images)
        mask = jnp.arange(images.shape[0]) < n_real
        denom = jnp.maximum(n_real, 1).astype(jnp.float32)
        images_c = images if compute_dtype is None else images.astype(compute_dtype)

        def objective(params):
            if compute_dtype is not None:
                params = cast_floating(params, compute_dtype)
            # running stats stay f32 uncast (see sum_objective above)
            stats = state.batch_stats
            recon, mutated = state.apply_fn(
                {"params": params, "batch_stats": stats},
                images_c,
                train=True,
                mutable=["batch_stats"],
            )
            # loss in f32 regardless of compute dtype: per-sample SSIM /
            # MSE reductions over 256x256 maps lose precision in bf16
            losses = per_sample_loss_fn(
                recon.astype(jnp.float32), images.astype(jnp.float32)
            )
            loss = jnp.sum(jnp.where(mask, losses, 0.0)) / denom
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        if compute_dtype is not None:
            new_stats = jax.tree.map(
                lambda new, old: new.astype(old.dtype), new_stats, state.batch_stats
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
    return jax.jit(accum_step if accum_steps > 1 else step,
                   donate_argnums=(0,), **kwargs)


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


