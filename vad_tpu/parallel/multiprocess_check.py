"""Real multi-PROCESS execution check for the distributed input path.

Everything in `vad_tpu.parallel.multihost` degenerates gracefully at
``jax.process_count() == 1``, which is also how the unit tests exercise
it — so until this module existed the ``process_count > 1`` branches
(`put_global_batch`'s `make_array_from_process_local_data` assembly,
`to_host`'s `process_allgather`) had never actually run.  This check
runs them for real: it spawns N local Python processes, each with its
own set of virtual CPU devices, joined through
``jax.distributed.initialize`` + cross-process Gloo collectives, and
drives the REAL training stack over the resulting global mesh:

- every process builds the same deterministic dataset and a
  `DistributedLoader`, so each host decodes ONLY its contiguous slice
  of every global batch (the multi-host feeding contract);
- `make_train_step` (the trainers' compiled step: masked loss, Adam,
  BN stat update) runs over the global ('data', 'model') mesh, with the
  gradient all-reduce crossing the process boundary;
- process 0 saves a checkpoint (`utils.checkpoint.save_checkpoint`);
  after a global barrier every other process loads and verifies it;
- each process records its loss trajectory, and the launcher asserts
  all processes agree AND that the trajectory matches a single-process
  run over the same number of global devices — multi-process execution
  is a pure implementation detail of the same numerical program.

This is the framework's replacement for the reference's single
``.to(device)`` ceiling (reference train.py:146) at the DCN scale
SURVEY §5.8 reserves, proven with 2 local processes.

``--model-parallel 2`` switches to the cross-process TENSOR-parallel
check: the video model's ConvLSTM gate convolutions are sharded over a
'model' mesh axis whose groups are interleaved across the two processes
(column j of every data row belongs to process j), so the tp psum in
backward and the checkpoint all-gather cross the Gloo boundary — the
round-4 review's residual §5.8 caveat ("tp has never crossed a process
boundary").  The production layout keeps tp inside a host (over ICI);
this layout exists to prove the collectives are correct wherever the
mesh puts them.

Usage (launcher, spawns workers and compares):
    python -m vad_tpu.parallel.multiprocess_check [--processes 2]
        [--local-devices 4] [--steps 2] [--model-parallel 1]

CI: tests/test_multiprocess.py runs exactly this with 2 processes,
in both dp-only and cross-process-tp forms.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

IMAGE_SIZE = 16
LATENT_DIM = 32
DATASET_SIZE = 64
BATCH_SIZE = 16


class DeterministicImages:
    """Seeded in-memory uint8 dataset — identical in every process, so
    the loader's per-host slices of it are slices of the same global
    sample set (the permutation/metadata contract of multihost.py)."""

    def __init__(self, n: int = DATASET_SIZE, size: int = IMAGE_SIZE) -> None:
        rng = np.random.default_rng(0)
        self.images = rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, i: int) -> dict:
        return {"image": self.images[i]}


class DeterministicVideos:
    """Seeded in-memory uint8 video clips [T, H, W, 3] — the tp check
    trains the VIDEO model, whose ConvLSTM gate convs are what
    `convlstm_param_shardings` actually splits over 'model'."""

    def __init__(self, n: int = DATASET_SIZE, size: int = IMAGE_SIZE,
                 t: int = 2) -> None:
        rng = np.random.default_rng(0)
        self.clips = rng.integers(
            0, 256, size=(n, t, size, size, 3), dtype=np.uint8
        )

    def __len__(self) -> int:
        return len(self.clips)

    def __getitem__(self, i: int) -> dict:
        return {"image": self.clips[i]}


def run_worker(args) -> None:
    """One process of the distributed program (or the single-process
    control run when --num-processes 1)."""
    import jax

    if args.num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.coordinator_port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        assert jax.process_count() == args.num_processes
        assert len(jax.local_devices()) == args.local_devices

    import jax.numpy as jnp

    from vad_tpu.data.loader import DistributedLoader
    from vad_tpu.models.autoencoder import ConvAutoencoder
    from vad_tpu.ops.losses import mse_per_sample
    from vad_tpu.parallel.multihost import to_host
    from vad_tpu.parallel.sharding import (
        get_mesh,
        replicate_sharding,
        train_state_shardings,
    )
    from vad_tpu.train.state import create_train_state
    from vad_tpu.train.steps import make_train_step, u8_normalize
    from vad_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    mp = max(1, args.model_parallel)
    if mp > 1 and jax.process_count() > 1:
        # Interleave the device grid so every 'model' group spans BOTH
        # processes: column j of each data row comes from process j.
        # This deliberately pushes the gate-conv psum/all-gather across
        # the Gloo boundary (the production layout would keep tp inside
        # a host; this check proves the collectives are layout-honest).
        if mp != jax.process_count():
            raise ValueError("cross-process tp check needs model_parallel == processes")
        per_proc = [
            [d for d in jax.devices() if d.process_index == p]
            for p in range(jax.process_count())
        ]
        devices = [d for group in zip(*per_proc) for d in group]
        mesh = get_mesh(devices, model_parallel=mp)
    else:
        mesh = get_mesh(model_parallel=mp)

    if mp > 1:
        # tp shards the ConvLSTM gate convolutions — train the video model
        from vad_tpu.models.video_autoencoder import VideoAutoencoder

        model = VideoAutoencoder(
            in_channels=3, latent_dim=8, lstm_hidden_dim=8, lstm_layers=1,
        )
        dataset = DeterministicVideos()
        example = jnp.zeros((1, 2, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
    else:
        model = ConvAutoencoder(latent_dim=LATENT_DIM)
        dataset = DeterministicImages()
        example = jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    state = create_train_state(model, variables, learning_rate=1e-3)
    state_sh = train_state_shardings(state, mesh)
    state = jax.device_put(state, state_sh)
    if mp > 1 and jax.process_count() > 1:
        # prove the check is real: some gate-conv shard must live on the
        # OTHER process (otherwise no tp collective would cross Gloo)
        assert any(
            not leaf.is_fully_addressable
            for leaf in jax.tree.leaves(state.params)
        ), "no param sharded across the process boundary"

    train_step = make_train_step(
        mse_per_sample, mesh=mesh, preprocess=u8_normalize,
        state_shardings=state_sh,
    )
    loader = DistributedLoader(
        dataset,
        batch_size=BATCH_SIZE,
        mesh=mesh,
        shuffle=True,
        seed=0,
        num_workers=0,
    )

    losses = []
    it = iter(loader)
    for _ in range(args.steps):
        batch, n_real = next(it)
        state, loss = train_step(state, batch["image"], n_real)
        losses.append(float(loss))

    # `to_host`'s multi-process branch (process_allgather) on a sharded
    # batch array: every process must see the identical global batch.
    batch, _ = next(iter(loader))
    global_batch = to_host(batch["image"])
    assert global_batch.shape[0] == loader.pad_to

    out = Path(args.out)
    ckpt = out / "ckpt" / "proc0_model.ckpt"
    # Under tp the gate-conv params are sharded over 'model' (columns of
    # which live on the OTHER process in the interleaved layout), so an
    # explicit all-gather to replicated must precede host fetch — this
    # collective itself crosses Gloo in the tp check.
    gather = jax.jit(lambda p: p, out_shardings=replicate_sharding(mesh))
    params_host = to_host_tree(gather(state.params))
    if jax.process_index() == 0:
        save_checkpoint(
            ckpt,
            {"params": params_host, "losses": losses},
        )
    if args.num_processes > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ckpt_saved")
    # every process (0 included) verifies the restricted loader round-trip
    restored = load_checkpoint(ckpt)
    assert restored["losses"] == losses

    record = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": jax.device_count(),
        "losses": losses,
        "global_batch_sha": int(np.asarray(global_batch, dtype=np.uint64).sum()),
    }
    (out / f"proc{args.process_id}.json").write_text(json.dumps(record))
    print(f"[proc {args.process_id}] {record}", flush=True)


def to_host_tree(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(local_devices: int) -> dict:
    """CPU-only env for spawned workers: drop the axon TPU plugin (its
    sitecustomize registers a PJRT backend at interpreter start, before
    distributed init could run) and force N virtual CPU devices."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    repo = str(Path(__file__).resolve().parents[2])
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    return env


def launch(processes: int = 2, local_devices: int = 4, steps: int = 2,
           out_dir: str | None = None, timeout: float = 600.0,
           model_parallel: int = 1) -> dict:
    """Spawn the multi-process run plus a single-process control run and
    assert their loss trajectories match.  Returns the comparison record.

    ``model_parallel > 1`` switches to the cross-process tensor-parallel
    check: the video model's gate convs shard over a 'model' axis whose
    groups are interleaved across the two processes, so the tp
    collectives (psum in backward, all-gather at checkpoint) cross Gloo.
    """
    out = Path(out_dir or tempfile.mkdtemp(prefix="vad_mp_"))
    out.mkdir(parents=True, exist_ok=True)
    (out / "ckpt").mkdir(exist_ok=True)
    port = _free_port()

    def cmd(process_id: int, num_processes: int, sub: Path) -> list:
        return [
            sys.executable, "-m", "vad_tpu.parallel.multiprocess_check",
            "--worker", "--process-id", str(process_id),
            "--num-processes", str(num_processes),
            "--local-devices", str(local_devices),
            "--coordinator-port", str(port),
            "--model-parallel", str(model_parallel),
            "--steps", str(steps), "--out", str(sub),
        ]

    mp_dir = out / "multiproc"
    (mp_dir / "ckpt").mkdir(parents=True, exist_ok=True)
    env = _worker_env(local_devices)
    workers = []
    for p in range(processes):
        log = open(mp_dir / f"proc{p}.log", "w")
        workers.append(
            subprocess.Popen(cmd(p, processes, mp_dir), env=env,
                             stdout=log, stderr=subprocess.STDOUT)
        )
    rcs = [w.wait(timeout=timeout) for w in workers]
    if any(rcs):
        logs = "\n".join(
            (mp_dir / f"proc{p}.log").read_text()[-2000:] for p in range(processes)
        )
        raise RuntimeError(f"worker exit codes {rcs}:\n{logs}")

    # single-process control over the SAME number of global devices
    sp_dir = out / "singleproc"
    (sp_dir / "ckpt").mkdir(parents=True, exist_ok=True)
    env1 = _worker_env(processes * local_devices)
    log = open(sp_dir / "proc0.log", "w")
    rc = subprocess.Popen(cmd(0, 1, sp_dir), env=env1,
                          stdout=log, stderr=subprocess.STDOUT).wait(timeout=timeout)
    if rc:
        raise RuntimeError(
            f"single-process control failed rc={rc}:\n"
            + (sp_dir / "proc0.log").read_text()[-2000:]
        )

    records = [
        json.loads((mp_dir / f"proc{p}.json").read_text()) for p in range(processes)
    ]
    control = json.loads((sp_dir / "proc0.json").read_text())

    for r in records:
        assert r["process_count"] == processes, r
        assert r["global_devices"] == processes * local_devices, r
        # the loss is a replicated global value: identical on every process
        assert r["losses"] == records[0]["losses"], (r, records[0])
        assert r["global_batch_sha"] == records[0]["global_batch_sha"]
    # multi-process vs single-process: same program, same global devices,
    # same data order -> the trajectory must agree to float tolerance
    # (the cross-process all-reduce may re-associate the sum)
    np.testing.assert_allclose(
        records[0]["losses"], control["losses"], rtol=1e-5, atol=1e-7
    )
    assert records[0]["global_batch_sha"] == control["global_batch_sha"]
    result = {
        "processes": processes,
        "local_devices": local_devices,
        "model_parallel": model_parallel,
        "steps": steps,
        "multiproc_losses": records[0]["losses"],
        "singleproc_losses": control["losses"],
        "ok": True,
    }
    print(json.dumps(result))
    return result


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--coordinator-port", type=int, default=0)
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.worker:
        run_worker(args)
    else:
        launch(args.processes, args.local_devices, args.steps, args.out,
               model_parallel=args.model_parallel)


if __name__ == "__main__":
    main()
