"""Image-model training loop.

Behavior parity with reference train.py:94-233: selectable mse/ssim/
combined loss, Adam(lr, wd=1e-5), ReduceLROnPlateau(min, x0.5, patience 5)
on val loss, per-epoch validation that splits test-set errors into
normal/anomaly means and prints the separation ratio, best checkpoint by
lowest val loss, final checkpoint at the end, results under
``<results_dir>/<category>_<timestamp>/``.

TPU-native differences: one jitted SPMD train step (donated buffers,
batch sharded over the mesh data axis), masked padding for static
shapes, and true resume support (--resume, new capability; the reference
saves optimizer state but never restores it — SURVEY §5.4).

Distribution is wired through the CLI, not just the library
(replacing the reference's single `.to(device)` ceiling, train.py:146):
``--model-parallel N`` splits the mesh into ('data', 'model') and pins
the train state's tp layout end to end (params, Adam moments, both
compiled steps), and ALL batch feeding goes through `DistributedLoader`
— each host decodes only its slice of every global batch and the global
sharded array is assembled via `put_global_batch` (degenerates exactly
to single-host behavior at process_count == 1).
"""

from __future__ import annotations

import time
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vad_tpu.data.image_dataset import MVTecDataset
from vad_tpu.data.loader import DistributedLoader
from vad_tpu.models.autoencoder import ConvAutoencoder
from vad_tpu.ops.losses import make_per_sample_loss_fn
from vad_tpu.parallel.multihost import to_host
from vad_tpu.parallel.sharding import (
    get_mesh, padded_batch_size, train_state_shardings,
)
from vad_tpu.train.state import (
    ReduceLROnPlateau,
    create_train_state,
    current_learning_rate,
    set_learning_rate,
)
from vad_tpu.train.steps import make_eval_step, make_train_step
from vad_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _describe_devices() -> None:
    devs = jax.devices()
    kind = devs[0].platform.upper()
    print(f"Using {kind}: {len(devs)} device(s) — {devs[0].device_kind}")


def run_epoch_train(train_step, state, loader):
    total, n_batches = 0.0, 0
    pending = None  # one-step delayed loss read: keeps host/device pipelined
    for batch, n_real in iter(loader):
        state, loss = train_step(state, batch["image"], jnp.asarray(n_real))
        if pending is not None:
            total += float(pending)
        pending = loss
        n_batches += 1
    if pending is not None:
        total += float(pending)
    return state, total / max(n_batches, 1)


def run_epoch_validate(eval_step, state, loader):
    """Returns (avg_loss, normal_err_mean, anomaly_err_mean, labels, scores)."""
    losses_sum, n_batches = 0.0, 0
    all_scores, all_labels = [], []
    for batch, n_real in iter(loader):
        losses, scores = eval_step(state, batch["image"])
        losses = to_host(losses)[:n_real]
        scores = to_host(scores)[:n_real]
        losses_sum += float(losses.mean())
        n_batches += 1
        all_scores.append(scores)
        all_labels.append(to_host(batch["label"])[:n_real])
    scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
    labels = np.concatenate(all_labels) if all_labels else np.zeros(0, np.int64)
    normal = scores[labels == 0]
    anomaly = scores[labels == 1]
    return (
        losses_sum / max(n_batches, 1),
        float(normal.mean()) if len(normal) else 0.0,
        float(anomaly.mean()) if len(anomaly) else 0.0,
        labels,
        scores,
    )


def train(args: Any) -> Dict[str, Any]:
    """Train the image model; args mirrors the reference CLI namespace."""
    _describe_devices()
    model_parallel = int(getattr(args, "model_parallel", 1) or 1)
    mesh = get_mesh(model_parallel=model_parallel)
    if model_parallel > 1:
        print(f"Mesh: {dict(mesh.shape)} (tensor parallelism over 'model')")
    if getattr(args, "debug_nans", False):
        from vad_tpu.utils.profiling import enable_nan_debugging

        enable_nan_debugging(True)

    print(f"\nLoading dataset: {args.category}")
    train_ds = MVTecDataset(
        args.data_dir, args.category, "train", args.image_size, normalize=False
    )
    test_ds = MVTecDataset(
        args.data_dir, args.category, "test", args.image_size, normalize=False
    )
    print(f"Training samples: {len(train_ds)} (all normal)")
    print(f"Test samples: {len(test_ds)}")

    # train THROUGH the padded tail batch: the reference's DataLoader
    # yields the short last batch (torch train.py:128-134), so dropping
    # it here would take fewer optimizer steps per epoch (150 vs 200 on
    # the 50-image fixtures).  The loader pads by cycling real indices,
    # which makes the tail's train-mode BN statistics equal the unpadded
    # batch's when pad_to % n_real == 0; the loss mask handles the rest.
    # The shuffle seed follows --seed so independent draws differ in
    # data order as well as init (the reference's unseeded draws do).
    accum_steps = max(1, int(getattr(args, "accum_steps", 1) or 1))
    train_loader = DistributedLoader(
        train_ds, args.batch_size, mesh, shuffle=True,
        num_workers=args.num_workers, seed=getattr(args, "seed", 0) or 0,
        pad_to=padded_batch_size(args.batch_size, mesh, accum_steps),
    )
    test_loader = DistributedLoader(
        test_ds, args.batch_size, mesh, num_workers=args.num_workers
    )

    model = ConvAutoencoder(
        in_channels=3, latent_dim=args.latent_dim,
        norm=getattr(args, "norm", "batch"),
        stem=getattr(args, "stem", "pool"),
    )
    variables = model.init(
        jax.random.key(getattr(args, "seed", 0)),
        jnp.zeros((1, args.image_size, args.image_size, 3)),
        train=False,
    )
    state = create_train_state(model, variables, args.lr, weight_decay=1e-5)

    loss_name = getattr(args, "loss", "mse")
    ssim_weight = getattr(args, "ssim_weight", 0.5)
    per_sample_loss = make_per_sample_loss_fn(loss_name, ssim_weight)
    if loss_name == "mse":
        print("Using MSE loss")
    elif loss_name == "ssim":
        print("Using SSIM loss")
    else:
        print(f"Using Combined loss (MSE + SSIM, alpha={ssim_weight})")

    from vad_tpu.train.steps import u8_normalize

    state_sh = train_state_shardings(state, mesh)
    precision = getattr(args, "precision", "f32") or "f32"
    compute_dtype = jnp.bfloat16 if precision == "bf16" else None
    if compute_dtype is not None:
        print("Precision: bf16 mixed (f32 master weights)")
    if accum_steps > 1:
        print(f"Gradient accumulation: {accum_steps} microbatches/step")
    train_step = make_train_step(
        per_sample_loss, mesh, preprocess=u8_normalize, state_shardings=state_sh,
        compute_dtype=compute_dtype, accum_steps=accum_steps,
    )
    eval_step = make_eval_step(
        per_sample_loss, ConvAutoencoder.reconstruction_error, mesh,
        preprocess=u8_normalize, state_shardings=state_sh,
    )
    scheduler = ReduceLROnPlateau(mode="min", factor=0.5, patience=5)

    start_epoch = 1
    history: Dict[str, list] = {
        "train_loss": [], "val_loss": [], "normal_err": [], "anomaly_err": []
    }
    resume_path: Optional[str] = getattr(args, "resume", None)
    if resume_path:
        ckpt = load_checkpoint(resume_path)
        state = state.replace(
            params=ckpt["params"],
            batch_stats=ckpt.get("batch_stats") or {},
            opt_state=jax.tree.map(jnp.asarray, ckpt["opt_state"])
            if ckpt.get("opt_state") is not None
            else state.opt_state,
        )
        start_epoch = int(ckpt.get("epoch", 0)) + 1
        history = ckpt.get("history", history)
        print(f"Resumed from {resume_path} at epoch {start_epoch}")
        results_dir = Path(resume_path).parent
    else:
        timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        results_dir = Path(args.results_dir) / f"{args.category}_{timestamp}"
        results_dir.mkdir(parents=True, exist_ok=True)

    # pin the state to its declared mesh layout up front (params
    # tp-sharded, Adam moments mirroring them, rest replicated) so the
    # first compiled step starts from the right placement — this also
    # re-pins resumed host arrays
    state = jax.tree.map(jax.device_put, state, state_sh)

    args_dict = dict(vars(args))
    from vad_tpu.utils.profiling import MetricsLogger

    metrics = MetricsLogger(
        results_dir, tensorboard=getattr(args, "tensorboard", False)
    )

    print(f"\nStarting training for {args.epochs} epochs...")
    print("-" * 60)
    best_loss = min(history["val_loss"], default=float("inf"))
    payload = None

    profile_dir = getattr(args, "profile_dir", None)
    for epoch in range(start_epoch, args.epochs + 1):
        t0 = time.time()
        if profile_dir and epoch == start_epoch + 1:
            # trace the first post-compile epoch (view in Perfetto/XProf)
            from vad_tpu.utils.profiling import trace

            with trace(profile_dir):
                state, train_loss = run_epoch_train(train_step, state, train_loader)
            print(f"  (profiler trace written to {profile_dir})")
        else:
            state, train_loss = run_epoch_train(train_step, state, train_loader)
        val_loss, normal_err, anomaly_err, v_labels, v_scores = run_epoch_validate(
            eval_step, state, test_loader
        )

        new_lr = scheduler.step(val_loss, current_learning_rate(state))
        if new_lr != current_learning_rate(state):
            state = set_learning_rate(state, new_lr)

        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        history["normal_err"].append(normal_err)
        history["anomaly_err"].append(anomaly_err)
        separation = anomaly_err / normal_err if normal_err > 0 else 0.0

        print(
            f"Epoch {epoch:3d}/{args.epochs} | "
            f"Train Loss: {train_loss:.6f} | "
            f"Val Loss: {val_loss:.6f} | "
            f"Normal Err: {normal_err:.6f} | "
            f"Anomaly Err: {anomaly_err:.6f} | "
            f"Separation: {separation:.2f}x "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )
        if epoch == start_epoch:
            # once per run (see video_trainer): the operator's does-it-fit
            # number for batch/resolution headroom on this chip
            from vad_tpu.utils.profiling import (
                device_memory_report,
                format_memory_report,
            )

            mem = device_memory_report()
            line = format_memory_report(mem)
            if line is not None:
                print(f"  {line}", flush=True)
                metrics.log(epoch, **{f"hbm_{k}": v for k, v in mem.items()})
        metrics.log(
            epoch,
            train_loss=train_loss,
            val_loss=val_loss,
            normal_err=normal_err,
            anomaly_err=anomaly_err,
            separation=separation,
            lr=current_learning_rate(state),
            epoch_seconds=time.time() - t0,
        )

        from vad_tpu.eval.drift import score_baseline
        from vad_tpu.eval.metrics import calibrate_threshold

        payload = {
            "epoch": epoch,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "train_loss": train_loss,
            "val_loss": val_loss,
            "history": history,
            "args": args_dict,
            "model_type": "image",
            # calibrated anomaly threshold: p99 of this epoch's held-out
            # NORMAL scores (~1% FPR operating point); consumed by the
            # serving daemon and the UI in place of the reference's
            # hardcoded 0.004 (main.py:283)
            "score_threshold": calibrate_threshold(v_scores[v_labels == 0]),
            # training-time normal-score distribution: the serving
            # daemon's drift monitor compares live traffic against this
            # (eval/drift.py)
            "score_baseline": score_baseline(v_scores[v_labels == 0]),
            "threshold_method": "p99 of validation normal scores",
        }
        if val_loss < best_loss:
            best_loss = val_loss
            save_checkpoint(results_dir / "best_model.ckpt", payload)
            print(f"  → Saved best model (loss: {val_loss:.6f})", flush=True)

    if payload is not None:
        save_checkpoint(results_dir / "final_model.ckpt", {**payload, "epoch": args.epochs})

    if history["train_loss"]:
        from vad_tpu.eval.plots import plot_training_history

        plot_training_history(history, results_dir / "training_history.png")

    print("-" * 60)
    print("Training complete!")
    print(f"Best validation loss: {best_loss:.6f}")
    if history["normal_err"] and history["normal_err"][-1] > 0:
        print(
            f"Final separation ratio: "
            f"{history['anomaly_err'][-1] / history['normal_err'][-1]:.2f}x"
        )
    print(f"Models saved to: {results_dir}")
    return {"state": state, "history": history, "results_dir": results_dir}
