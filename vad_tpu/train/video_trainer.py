"""Video-model training loop.

Behavior parity with reference train_video.py:101-293: dataset-format
autodetect (IPAD vs generic), MSE loss, Adam(1e-4, wd=1e-5),
ReduceLROnPlateau('max') on the separation ratio, best checkpoint selected
by HIGHEST separation (not loss), a per-epoch checkpoint every epoch, and
the two early-stop rules (no improvement for 5 epochs while separation <
1.0; immediate stop if separation < 0.8 after epoch 3).

Results land in ``<results_dir>/video_<category>_<timestamp>/`` — the
``video_`` prefix is what the UI uses to classify checkpoints
(reference main.py:57-75).

Distribution is wired through the CLI (replacing the reference's single
`.to(device)` ceiling, train_video.py:167): ``--model-parallel N``
splits the mesh into ('data', 'model') — the ConvLSTM gate convolutions
(2.36M of 2.7M params) shard over 'model' with the Adam moments
mirroring them — and all batch feeding goes through `DistributedLoader`
(per-host slices + `put_global_batch`; degenerates to single-host
behavior at process_count == 1).
"""

from __future__ import annotations

import time
from datetime import datetime
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vad_tpu.data.loader import DistributedLoader
from vad_tpu.data.video_dataset import detect_video_dataset_class
from vad_tpu.models.video_autoencoder import VideoAutoencoder
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
from vad_tpu.utils.checkpoint import save_checkpoint


def train(args: Any) -> Dict[str, Any]:
    devs = jax.devices()
    print(f"Using {devs[0].platform.upper()}: {len(devs)} device(s) — {devs[0].device_kind}")
    model_parallel = int(getattr(args, "model_parallel", 1) or 1)
    mesh = get_mesh(model_parallel=model_parallel)
    if model_parallel > 1:
        print(f"Mesh: {dict(mesh.shape)} (tensor parallelism over 'model')")
    if getattr(args, "debug_nans", False):
        from vad_tpu.utils.profiling import enable_nan_debugging

        enable_nan_debugging(True)

    print(f"\nLoading video dataset: {args.category}")
    DatasetClass = detect_video_dataset_class(args.data_dir, args.category)
    print(f"Using dataset loader: {DatasetClass.__name__}")

    common = dict(
        sequence_length=args.sequence_length,
        stride=args.stride,
        image_size=args.image_size,
        normalize=False,  # uint8 to device; normalization inside the step
    )
    train_ds = DatasetClass(args.data_dir, args.category, "train", **common)
    test_ds = DatasetClass(args.data_dir, args.category, "test", **common)
    print(f"Training sequences: {len(train_ds)} (all normal)")
    print(f"Test sequences: {len(test_ds)}")

    # train THROUGH the padded tail batch: the reference's DataLoader
    # yields the short last batch (torch train_video.py:141-150), so
    # dropping it here would take fewer optimizer steps per epoch.  The
    # loader pads by cycling real indices, which makes the tail's
    # train-mode BN statistics equal the unpadded batch's when
    # pad_to % n_real == 0; the loss mask handles the rest.  The shuffle
    # seed follows --seed so independent draws differ in data order as
    # well as init (the reference's unseeded draws do).
    accum_steps = max(1, int(getattr(args, "accum_steps", 1) or 1))
    train_loader = DistributedLoader(
        train_ds, args.batch_size, mesh, shuffle=True,
        num_workers=args.num_workers, seed=getattr(args, "seed", 0) or 0,
        pad_to=padded_batch_size(args.batch_size, mesh, accum_steps),
    )
    test_loader = DistributedLoader(
        test_ds, args.batch_size, mesh, num_workers=args.num_workers
    )

    from vad_tpu.ops.convlstm_pallas import preferred_backend

    lat = args.image_size // 16
    backend = preferred_backend(lat, lat, args.lstm_hidden_dim, context="training")
    if backend == "pallas":
        print("ConvLSTM backend: fused Pallas kernel")
    model = VideoAutoencoder(
        in_channels=3,
        latent_dim=args.latent_dim,
        lstm_hidden_dim=args.lstm_hidden_dim,
        lstm_layers=args.lstm_layers,
        backend=backend,
        remat=bool(getattr(args, "remat", False)),
        norm=getattr(args, "norm", "batch"),
        stem=getattr(args, "stem", "pool"),
    )
    variables = model.init(
        jax.random.key(getattr(args, "seed", 0)),
        jnp.zeros((1, 2, args.image_size, args.image_size, 3)),
        train=False,
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    print(f"Model parameters: {n_params:,}")

    from vad_tpu.ops.losses import make_per_sample_loss_fn
    from vad_tpu.train.steps import u8_normalize

    # the reference trains video with MSE only (train_video.py:174);
    # ssim/combined losses and the predictive objective are beyond-parity
    loss_name = getattr(args, "loss", "mse") or "mse"
    per_sample_loss = make_per_sample_loss_fn(loss_name, getattr(args, "ssim_weight", 0.5))
    if loss_name != "mse":
        print(f"Using {loss_name} loss")

    objective = getattr(args, "objective", "reconstruct") or "reconstruct"
    if objective == "predict":
        # output t is causal in frames <= t; train it to match frame t+1
        print("Objective: future-frame prediction")
        base_loss = per_sample_loss
        per_sample_loss = lambda recon, x: base_loss(recon[:, :-1], x[:, 1:])  # noqa: E731
        score_method = VideoAutoencoder.prediction_error
    else:
        score_method = VideoAutoencoder.reconstruction_error

    state = create_train_state(model, variables, args.lr, weight_decay=1e-5)
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
    # score per FRAME on device; the sequence score is the mean over
    # frames (identical reduction to score_method's default — see
    # reconstruction_error/prediction_error), and the frame granularity
    # is what serving flags against, so the calibrated frame threshold
    # must come from the same distribution
    def score_frames(m, x):
        return score_method(m, x, per_frame=True)

    eval_step = make_eval_step(
        per_sample_loss, score_frames, mesh,
        preprocess=u8_normalize, state_shardings=state_sh,
    )
    scheduler = ReduceLROnPlateau(mode="max", factor=0.5, patience=5)

    start_epoch = 1
    resumed_history = None
    resumed_best = 0.0
    resumed_best_epoch = 0
    resume_path = getattr(args, "resume", None)
    if resume_path:
        from vad_tpu.utils.checkpoint import load_checkpoint

        ckpt = load_checkpoint(resume_path)
        state = state.replace(
            params=ckpt["params"],
            batch_stats=ckpt.get("batch_stats") or {},
            opt_state=jax.tree.map(jnp.asarray, ckpt["opt_state"])
            if ckpt.get("opt_state") is not None
            else state.opt_state,
        )
        start_epoch = int(ckpt.get("epoch", 0)) + 1
        results_dir = Path(resume_path).parent
        # carry the selection state forward so a worse post-resume epoch
        # cannot clobber the saved best checkpoint
        resumed_history = ckpt.get("history")
        if resumed_history and resumed_history.get("separation"):
            resumed_best = max(resumed_history["separation"])
            resumed_best_epoch = (
                resumed_history["separation"].index(resumed_best) + 1
            )
        else:
            resumed_best = float(ckpt.get("best_separation", ckpt.get("separation", 0.0)) or 0.0)
            resumed_best_epoch = int(ckpt.get("best_epoch", ckpt.get("epoch", 0)) or 0)
        print(
            f"Resumed from {resume_path} at epoch {start_epoch} "
            f"(best separation so far: {resumed_best:.2f}x)"
        )
    else:
        timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        results_dir = Path(args.results_dir) / f"video_{args.category}_{timestamp}"
        results_dir.mkdir(parents=True, exist_ok=True)
    # pin the state to its declared mesh layout up front (gate kernels +
    # Adam moments tp-sharded, rest replicated); also re-pins resumed
    # host arrays
    state = jax.tree.map(jax.device_put, state, state_sh)

    args_dict = dict(vars(args))
    from vad_tpu.utils.profiling import MetricsLogger

    metrics = MetricsLogger(
        results_dir, tensorboard=getattr(args, "tensorboard", False)
    )

    print(f"\nStarting training for {args.epochs} epochs...")
    print(f"Sequence length: {args.sequence_length} frames")
    print("\n*** SAVING BASED ON SEPARATION RATIO (not loss) ***")
    print("-" * 60)

    best_separation = resumed_best
    best_epoch = resumed_best_epoch
    no_improve = 0
    patience = 5
    history: Dict[str, list] = resumed_history or {
        "train_loss": [], "val_loss": [], "normal_err": [], "anomaly_err": [],
        "separation": [],
    }

    def run_train_epoch(state):
        total, n_batches = 0.0, 0
        pending = None  # delayed loss read keeps host decode and device compute overlapped
        for batch, n_real in iter(train_loader):
            state, loss = train_step(state, batch["frames"], jnp.asarray(n_real))
            if pending is not None:
                total += float(pending)
            pending = loss
            n_batches += 1
        if pending is not None:
            total += float(pending)
        return state, total / max(n_batches, 1)

    profile_dir = getattr(args, "profile_dir", None)
    epoch = start_epoch - 1  # stable if the loop body never runs (resume at end)
    score_threshold = None  # set each epoch from held-out normal scores
    frame_score_threshold = None
    frame_score_baseline = None
    for epoch in range(start_epoch, args.epochs + 1):
        t0 = time.time()
        if profile_dir and epoch == start_epoch + 1:
            from vad_tpu.utils.profiling import trace

            with trace(profile_dir):
                state, train_loss = run_train_epoch(state)
            print(f"  (profiler trace written to {profile_dir})")
        else:
            state, train_loss = run_train_epoch(state)

        loss_sum, n_eval = 0.0, 0
        normal_err, anomaly_err = [], []
        normal_frame_scores = []
        for batch, n_real in iter(test_loader):
            losses, frame_scores = eval_step(state, batch["frames"])
            losses = to_host(losses)[:n_real]
            frame_scores = to_host(frame_scores)[:n_real]  # [B, T']
            scores = frame_scores.mean(axis=1)
            loss_sum += float(losses.mean())
            n_eval += 1
            labels = to_host(batch["label"])[:n_real]
            normal_err.extend(scores[labels == 0].tolist())
            anomaly_err.extend(scores[labels == 1].tolist())
            # every frame of a NORMAL window is normal (window label is
            # any-frame-anomalous), so these calibrate frame granularity
            normal_frame_scores.extend(frame_scores[labels == 0].ravel().tolist())
        val_loss = loss_sum / max(n_eval, 1)
        nmean = float(np.mean(normal_err)) if normal_err else 0.0
        amean = float(np.mean(anomaly_err)) if anomaly_err else 0.0
        separation = amean / nmean if nmean > 0 else 0.0
        from vad_tpu.eval.metrics import calibrate_threshold

        # calibrated anomaly thresholds (p99 of held-out NORMAL scores,
        # ~1% FPR), at BOTH granularities: sequence scores for eval-style
        # window decisions, frame scores for the serving daemon and UI
        # (which flag per frame — a sequence-mean threshold applied to
        # frames would flag far more than 1% of normal frames)
        score_threshold = calibrate_threshold(normal_err)
        frame_score_threshold = calibrate_threshold(normal_frame_scores)
        # training-time frame-score distribution summary: the serving
        # daemon's drift monitor compares live traffic against this
        # (eval/drift.py — frame granularity, matching what it serves)
        from vad_tpu.eval.drift import score_baseline as _score_baseline

        frame_score_baseline = _score_baseline(normal_frame_scores)

        new_lr = scheduler.step(separation, current_learning_rate(state))
        if new_lr != current_learning_rate(state):
            state = set_learning_rate(state, new_lr)

        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        history["normal_err"].append(nmean)
        history["anomaly_err"].append(amean)
        history["separation"].append(separation)

        status = ""
        if separation > best_separation:
            status = " <- BEST"
        elif separation < 1.0:
            status = " (inverted!)"
        print(
            f"Epoch {epoch:3d}/{args.epochs} | "
            f"Train Loss: {train_loss:.6f} | "
            f"Val Loss: {val_loss:.6f} | "
            f"Normal: {nmean:.6f} | "
            f"Anomaly: {amean:.6f} | "
            f"Separation: {separation:.2f}x{status} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )
        if epoch == start_epoch:
            # once per run, after the first full train+eval epoch (the
            # HBM peak is established by then): the number that tells an
            # operator whether a bigger batch/sequence/resolution fits
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
            normal_err=nmean,
            anomaly_err=amean,
            separation=separation,
            lr=current_learning_rate(state),
            epoch_seconds=time.time() - t0,
        )

        if separation > best_separation:
            best_separation = separation
            best_epoch = epoch
            no_improve = 0
            save_checkpoint(
                results_dir / "best_model.ckpt",
                {
                    "epoch": epoch,
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "train_loss": train_loss,
                    "val_loss": val_loss,
                    "separation": separation,
                    "normal_err": nmean,
                    "anomaly_err": amean,
                    "args": args_dict,
                    "model_type": "video",
                    "score_threshold": score_threshold,
                    "frame_score_threshold": frame_score_threshold,
                    "score_baseline": frame_score_baseline,
                    "threshold_method": "p99 of validation normal scores",
                },
            )
            print(f"  -> Saved best model (separation: {separation:.2f}x)", flush=True)
        else:
            no_improve += 1

        save_checkpoint(
            results_dir / f"checkpoint_epoch_{epoch}.ckpt",
            {
                "epoch": epoch,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "separation": separation,
                "args": args_dict,
                "model_type": "video",
                "score_threshold": score_threshold,
                "frame_score_threshold": frame_score_threshold,
                "score_baseline": frame_score_baseline,
                "threshold_method": "p99 of validation normal scores",
            },
        )
        keep = int(getattr(args, "keep_checkpoints", 0) or 0)
        if keep > 0:
            from vad_tpu.utils.checkpoint import rotate_epoch_checkpoints

            rotate_epoch_checkpoints(results_dir, keep)

        if no_improve >= patience and separation < 1.0:
            print(f"\n*** Early stopping: Separation below 1.0 for {patience} epochs ***")
            print(f"*** Best model was at epoch {best_epoch} with {best_separation:.2f}x separation ***")
            break
        if separation < 0.8 and epoch > 3:
            print(f"\n*** Stopping: Separation inverted to {separation:.2f}x "
                  f"(anomalies reconstructed better than normal) ***")
            print(f"*** Best model saved at epoch {best_epoch} with {best_separation:.2f}x separation ***")
            break

    if best_epoch == 0:
        # no epoch ever improved separation (e.g. single-class test split):
        # still leave a usable best checkpoint (robustness addition; the
        # reference would leave best_model missing in this case)
        save_checkpoint(
            results_dir / "best_model.ckpt",
            {
                "epoch": epoch,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "train_loss": history["train_loss"][-1] if history["train_loss"] else 0.0,
                "val_loss": history["val_loss"][-1] if history["val_loss"] else 0.0,
                "separation": history["separation"][-1] if history["separation"] else 0.0,
                "args": args_dict,
                "model_type": "video",
                "score_threshold": score_threshold,
                "frame_score_threshold": frame_score_threshold,
                "score_baseline": frame_score_baseline,
                "threshold_method": "p99 of validation normal scores",
            },
        )
        print("  (no separation improvement seen; saved final weights as best_model)")

    save_checkpoint(
        results_dir / "final_model.ckpt",
        {
            "epoch": args.epochs,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "history": history,
            "best_epoch": best_epoch,
            "best_separation": best_separation,
            "args": args_dict,
            "model_type": "video",
            "score_threshold": score_threshold,
            "frame_score_threshold": frame_score_threshold,
            "score_baseline": frame_score_baseline,
            "threshold_method": "p99 of validation normal scores",
        },
    )

    if history["train_loss"]:
        from vad_tpu.eval.plots import plot_training_history

        plot_training_history(history, results_dir / "training_history.png")

    print("-" * 60)
    print("Training complete!")
    print(f"Best separation ratio: {best_separation:.2f}x at epoch {best_epoch}")
    print(f"Models saved to: {results_dir}")
    print(f"\nUse: python evaluate_video.py --checkpoint {results_dir}/best_model.ckpt "
          f"--data-dir {args.data_dir}")
    return {"state": state, "history": history, "results_dir": results_dir,
            "best_separation": best_separation, "best_epoch": best_epoch}
