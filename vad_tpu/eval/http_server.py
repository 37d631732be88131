"""Multi-stream anomaly-scoring HTTP daemon (production serving front).

A stdlib-only (http.server) REST front over `MultiStreamScorer`: clients
attach a stream slot, POST raw uint8 frame chunks, and receive per-frame
anomaly scores.  Requests from different streams are COALESCED into one
batched TPU step — the device always sees the full [num_slots, chunk,
H, W, 3] batch, so per-chip throughput matches bench.py's multi-stream
configuration instead of degrading to one-stream-at-a-time latency.

The reference has no serving story at all (its closest analogue is the
Gradio UI's one-shot analyze callbacks, main.py:262-403); this daemon is
a beyond-reference component built around the framework's state-carrying
scoring path.

Protocol (JSON unless noted):
    POST   /v1/streams                 -> {"slot": N}            (video)
    DELETE /v1/streams/<slot>          -> {"detached": N}        (video)
    POST   /v1/streams/<slot>/frames   body = raw u8 bytes, header
           X-Frames-Shape: "T,H,W,3"   -> {"scores": [T floats]} (video)
    POST   /v1/images                  body = raw u8 bytes, header
           X-Frames-Shape: "N,H,W,3"   -> {"scores": [N floats]} (image)
    POST   /v1/reload                  body = {"checkpoint": "<path>"}
           -> hot-swaps the served weights in place (both kinds): same
           architecture reuses the compiled step, video streams keep
           their slots and carried state
    GET    /v1/health                  -> config + live slot map
    GET    /v1/metrics                 -> counters + device-step latency
                                          histogram (ServiceMetrics)

Image checkpoints are served statelessly through /v1/images (requests
padded to a fixed device batch); video checkpoints through the
slot-stateful /v1/streams API.

Frames POSTs block until the coalescing scorer thread has run their
chunk (bounded micro-batch latency: the tick runs as soon as any request
is pending and the device is free).
"""

from __future__ import annotations

import json
import pickle
import threading
from pathlib import Path
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FutureTimeoutError
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

from vad_tpu.eval.drift import ScoreWindow


class ServiceMetrics:
    """Thread-safe serving counters + device-step latency distribution.

    Production observability the reference has no equivalent of (its
    inference is batch CLI runs).  Latencies land in fixed log-spaced
    ms buckets so the histogram is O(1) memory at any request volume;
    the snapshot is what `GET /v1/metrics` returns.
    """

    BUCKETS_MS = (1, 2, 5, 10, 20, 50, 100, 200, 500, 1000, 5000)

    def __init__(self) -> None:
        import time

        self._lock = threading.Lock()
        self._t0 = time.time()
        self.requests = 0
        self.frames = 0
        self.device_steps = 0
        self.errors = 0
        self._lat_count = 0
        self._lat_sum = 0.0
        self._lat_min = float("inf")
        self._lat_max = 0.0
        self._hist = [0] * (len(self.BUCKETS_MS) + 1)

    def record_request(self, frames: int) -> None:
        with self._lock:
            self.requests += 1
            self.frames += frames

    def record_error(self) -> None:
        with self._lock:
            self.errors += 1

    def record_step(self, seconds: float) -> None:
        ms = seconds * 1e3
        with self._lock:
            self.device_steps += 1
            self._lat_count += 1
            self._lat_sum += ms
            self._lat_min = min(self._lat_min, ms)
            self._lat_max = max(self._lat_max, ms)
            for i, edge in enumerate(self.BUCKETS_MS):
                if ms <= edge:
                    self._hist[i] += 1
                    break
            else:
                self._hist[-1] += 1

    def snapshot(self) -> dict:
        import time

        with self._lock:
            lat = None
            if self._lat_count:
                lat = {
                    "count": self._lat_count,
                    "sum_ms": round(self._lat_sum, 3),
                    "mean_ms": round(self._lat_sum / self._lat_count, 3),
                    "min_ms": round(self._lat_min, 3),
                    "max_ms": round(self._lat_max, 3),
                    "hist_bucket_edges_ms": list(self.BUCKETS_MS),
                    "hist_counts": list(self._hist),
                }
            return {
                "uptime_s": round(time.time() - self._t0, 1),
                "requests": self.requests,
                "frames_scored": self.frames,
                "device_steps": self.device_steps,
                "errors": self.errors,
                "device_step_latency": lat,
            }


def prometheus_text(snapshots: Dict[str, dict]) -> str:
    """Render metric snapshots ({model_kind: ServiceMetrics.snapshot()+})
    in the Prometheus text exposition format
    (GET /v1/metrics?format=prometheus) so a standard scrape target works
    against the daemon without an adapter.  Counters become *_total
    series labeled by model kind; the device-step latency histogram
    becomes a Prometheus histogram (cumulative le buckets)."""
    lines = []

    def counter(name: str, help_: str, key: str) -> None:
        lines.append(f"# HELP {name} {help_}")
        lines.append(f"# TYPE {name} counter")
        for kind, snap in snapshots.items():
            lines.append(f'{name}{{model="{kind}"}} {snap[key]}')

    counter("vad_requests_total", "Scoring requests received.", "requests")
    counter("vad_frames_scored_total", "Frames scored.", "frames_scored")
    counter("vad_device_steps_total", "Compiled device steps executed.",
            "device_steps")
    counter("vad_errors_total", "Requests rejected with an error.", "errors")
    lines.append("# HELP vad_device_step_latency_ms Device step latency.")
    lines.append("# TYPE vad_device_step_latency_ms histogram")
    for kind, snap in snapshots.items():
        lat = snap.get("device_step_latency")
        if not lat:
            continue
        cum = 0
        for edge, count in zip(lat["hist_bucket_edges_ms"], lat["hist_counts"]):
            cum += count
            lines.append(
                f'vad_device_step_latency_ms_bucket{{model="{kind}",le="{edge}"}} {cum}'
            )
        lines.append(
            f'vad_device_step_latency_ms_bucket{{model="{kind}",le="+Inf"}} {lat["count"]}'
        )
        lines.append(f'vad_device_step_latency_ms_sum{{model="{kind}"}} {lat["sum_ms"]}')
        lines.append(f'vad_device_step_latency_ms_count{{model="{kind}"}} {lat["count"]}')
    scored = {k: s["scores"] for k, s in snapshots.items()
              if s.get("scores", {}).get("count")}
    if scored:
        for name, help_, key in (
            ("vad_score_window_mean", "Mean anomaly score over the recent window.", "mean"),
            ("vad_score_window_p50", "Median anomaly score over the recent window.", "p50"),
            ("vad_score_window_p99", "p99 anomaly score over the recent window.", "p99"),
            ("vad_score_exceed_rate", "Fraction of recent scores above the calibrated threshold (contract: expected_exceed_rate).", "exceed_rate"),
            ("vad_score_drifting", "1 when the exceedance contract is broken (see eval/drift.py).", "drifting"),
        ):
            rows = [(k, sc[key]) for k, sc in scored.items() if key in sc]
            if not rows:
                continue
            lines.append(f"# HELP {name} {help_}")
            lines.append(f"# TYPE {name} gauge")
            for kind, val in rows:
                lines.append(f'{name}{{model="{kind}"}} {int(val) if isinstance(val, bool) else val}')
    alerted = {k: s["alerts"] for k, s in snapshots.items() if "alerts" in s}
    if alerted:
        for name, help_, key in (
            ("vad_alerts_delivered_total", "Webhook alerts delivered.", "delivered"),
            ("vad_alerts_failed_total", "Webhook alert deliveries failed.", "failed"),
        ):
            lines.append(f"# HELP {name} {help_}")
            lines.append(f"# TYPE {name} counter")
            for kind, alerts in alerted.items():
                lines.append(f'{name}{{model="{kind}"}} {alerts[key]}')
    return "\n".join(lines) + "\n"


class ImageScoringService:
    """Stateless image-model scoring (no stream slots to manage).

    Requests are padded to a fixed device batch and serialized through
    one lock — the jitted step keeps a single static shape.

    ``mesh``: score data-parallel over the 'data' axis (each chip takes
    batch/data_n images; shard_map, zero collectives, bitwise identical
    to single-chip — see parallel.sharding.data_parallel_jit).  The
    batch is rounded up to a multiple of the data-axis size.

    ``spatial``: additionally split image ROWS over the 'model' axis —
    the conv autoencoder is fully convolutional, so XLA's SPMD
    partitioner inserts exact halo exchanges at every conv/pool shard
    edge (same design as MultiStreamScorer's spatial mode; for the
    stateless image model there is no recurrence, so GSPMD handles the
    whole step).  Requires H and H/16 divisible by the 'model' size.

    ``latent_stats``: path to a fitted ``latent_stats.npz`` (written by
    ``evaluate.py --scorer latent``, eval/latent_score.py) or a loaded
    `LatentStats`.  When given, /v1/images scores through the
    Mahalanobis latent-distance path instead of reconstruction error:
    the image score is the MEAN of the per-position distance map (the
    same reduction the eval CLI's default score_mode applies).  The
    fitted statistics are threaded through the jitted step as a runtime
    argument (latent_score.stats_state explains why), and they belong
    to the specific weights they were fitted on — so a hot reload must
    supply matching new statistics (see `reload`).  ``--dtype float32``
    reproduces the eval CLI's scores exactly; bfloat16 serves the same
    detector with small feature-precision shifts.
    """

    kind = "image"

    def __init__(self, model, variables, image_size: int, batch: int = 32,
                 dtype=None, mesh=None, spatial: bool = False,
                 drift_window: int = 4096, drift_factor: float = 5.0,
                 latent_stats=None) -> None:
        import jax
        import jax.numpy as jnp

        from vad_tpu.models.autoencoder import ConvAutoencoder
        from vad_tpu.utils.precision import cast_floating

        dtype = dtype or jnp.bfloat16
        self.image_size = image_size
        self.dtype = dtype
        self.mesh = mesh
        self.spatial = spatial
        self.stem = getattr(model, "stem", "pool")
        variables = cast_floating(variables, dtype) if dtype != jnp.float32 else variables
        if spatial and mesh is None:
            raise ValueError("spatial=True requires a mesh")
        if latent_stats is not None and spatial:
            # the distance map lives on the fit's G x G grid, not image
            # rows; row-partitioning the pyramid_embed reshape would make
            # GSPMD gather the full embedding anyway
            raise ValueError("the latent scorer does not support spatial "
                             "partitioning; use --data-parallel")
        self._latent = None
        if latent_stats is not None:
            from vad_tpu.eval.latent_score import LatentStats, load_stats

            stats = (latent_stats if isinstance(latent_stats, LatentStats)
                     else load_stats(latent_stats))
            self._latent = {
                "grid": stats.grid, "dim": stats.dim,
                "layers": tuple(stats.layers), "n_fit": stats.n_fit,
                "path": (None if isinstance(latent_stats, LatentStats)
                         else str(latent_stats)),
            }
        if mesh is not None:
            from vad_tpu.parallel.sharding import (
                MODEL_AXIS,
                padded_batch_size,
                replicate_sharding,
            )

            batch = padded_batch_size(batch, mesh)
            if spatial:
                model_n = mesh.shape[MODEL_AXIS]
                if image_size % (16 * model_n):
                    raise ValueError(
                        f"H={image_size} and H/16 must divide by the "
                        f"'{MODEL_AXIS}' axis of size {model_n}"
                    )
            variables = jax.device_put(variables, replicate_sharding(mesh))
        self.batch = batch

        if self._latent is not None:
            from vad_tpu.eval.latent_score import make_distance_fn, stats_state

            def pyramid_fn(v, x):
                return model.apply(v, x, method=ConvAutoencoder.feature_pyramid)

            dfn = make_distance_fn(pyramid_fn, stats.layers, stats.grid)
            self._state = stats_state(stats)

            def score(vs, u8):
                v, state = vs
                x = u8.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
                maps = dfn(v, state, x)  # [B, G, G] f32
                return jnp.mean(maps.reshape(maps.shape[0], -1), axis=1)
        else:
            self._state = None

            def score(vs, u8):
                v, _ = vs
                x = u8.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
                return model.apply(
                    v, x, method=ConvAutoencoder.reconstruction_error
                ).astype(jnp.float32)

        if spatial:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from vad_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS, replicate_sharding

            self._score = jax.jit(
                score,
                in_shardings=(
                    replicate_sharding(mesh),
                    NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS)),  # [B, H, W, 3]
                ),
                out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
            )
        else:
            from vad_tpu.parallel.sharding import data_parallel_jit

            self._score = data_parallel_jit(score, mesh)
        if mesh is not None and self._state is not None:
            from vad_tpu.parallel.sharding import replicate_sharding

            self._state = jax.device_put(self._state, replicate_sharding(mesh))
        self._variables = variables
        self._lock = threading.Lock()
        self.metrics = ServiceMetrics()
        # live score-distribution monitor (eval/drift.py); calibrated
        # from the checkpoint by the caller / reload()
        self.drift = (
            ScoreWindow(window=drift_window, factor=drift_factor)
            if drift_window else None
        )
        # warm-up compile
        self._score((variables, self._state),
                    np.zeros((batch, image_size, image_size, 3), np.uint8))

    # chunking cap: one request may hold the device lock for at most this
    # many compiled steps; larger requests get a 4xx and should be split
    # client-side (otherwise a single huge POST could starve every other
    # stream for minutes and buffer an unbounded body in RAM)
    MAX_STEPS_PER_REQUEST = 64

    # calibrated anomaly threshold from the checkpoint (p99 of validation
    # normal scores); None = serve raw scores only
    score_threshold: Optional[float] = None
    # optional AlertNotifier (serve.py --alert-url): image serving is
    # stateless so there are no per-stream streak alerts, but sustained
    # score-distribution drift still pages (eval/drift.py)
    notifier = None

    def score_images(self, frames: np.ndarray) -> np.ndarray:
        """Score ``n`` frames; requests larger than the device batch are
        chunked into ceil(n / batch) padded device steps server-side (up
        to MAX_STEPS_PER_REQUEST steps), so a client never has to know
        the server's compiled batch size."""
        n = frames.shape[0]
        expect = (self.image_size, self.image_size, 3)
        if frames.ndim != 4 or frames.shape[1:] != expect or frames.dtype != np.uint8:
            raise ValueError(f"expected uint8 [n, {expect}], got {frames.dtype} {frames.shape}")
        if n == 0:
            raise ValueError("empty batch")
        limit = self.batch * self.MAX_STEPS_PER_REQUEST
        if n > limit:
            raise ValueError(
                f"request of {n} frames exceeds the per-request limit of "
                f"{limit} (batch {self.batch} x {self.MAX_STEPS_PER_REQUEST} "
                f"steps); split the request client-side"
            )
        import time

        out = np.empty(n, np.float64)
        self.metrics.record_request(n)
        with self._lock:
            for lo in range(0, n, self.batch):
                part = frames[lo : lo + self.batch]
                if part.shape[0] == self.batch:
                    padded = part  # full chunk: no copy needed
                else:
                    padded = np.zeros((self.batch, *expect), np.uint8)
                    padded[: part.shape[0]] = part
                t0 = time.time()
                scores = self._score((self._variables, self._state), padded)
                out[lo : lo + part.shape[0]] = np.asarray(
                    scores[: part.shape[0]], np.float64
                )
                self.metrics.record_step(time.time() - t0)
        if self.drift is not None:
            self.drift.observe(out)
            if self.notifier is not None and self.drift.drifting():
                # lazy payload: built only when the cooldown is open
                self.notifier.notify(
                    lambda: {"type": "score_drift", "model": "image",
                             **self.drift.snapshot()},
                    source="__score_drift_image__",
                )
        return out

    def metrics_snapshot(self) -> dict:
        snap = self.metrics.snapshot()
        if self.drift is not None:
            snap["scores"] = self.drift.snapshot()
        if self.notifier is not None:
            snap["alerts"] = {
                "delivered": self.notifier.delivered,
                "failed": self.notifier.failed,
            }
        return snap

    def reload(self, checkpoint: str, ckpt: Optional[dict] = None,
               latent_stats: Optional[str] = None) -> None:
        """Hot-swap the served weights from a checkpoint on disk
        (POST /v1/reload).  Same architecture AND resolution -> the
        compiled step is reused (structural + image_size checks);
        in-flight requests finish on the old weights, the next device
        step sees the new ones.  ``ckpt``: pass the already-loaded dict
        to skip a second deserialize (dual-server routing peeks it).

        When the latent scorer is active the fitted statistics belong to
        the OLD encoder weights, so the reload must carry a
        ``latent_stats`` npz fitted against the new checkpoint (the eval
        CLI writes one next to its artifacts); its grid/dim/layers must
        match the serving fit so the compiled step's shapes hold.
        Refused otherwise — silently serving stale statistics over new
        weights would score garbage while looking healthy."""
        import jax

        from vad_tpu.utils.checkpoint import load_checkpoint
        from vad_tpu.utils.precision import (
            check_served_image_size,
            check_served_stem,
            checked_cast_like,
        )

        if ckpt is None:
            ckpt = load_checkpoint(checkpoint)
        if ckpt.get("model_type") != "image":
            raise ValueError(
                "not an image checkpoint; this server serves the image model"
            )
        check_served_image_size(ckpt.get("args") or {}, self.image_size)
        check_served_stem(ckpt.get("args") or {}, self.stem)
        new_state = self._state
        if self._latent is not None:
            if latent_stats is None:
                raise ValueError(
                    "latent scorer active: the fitted statistics belong to "
                    "the currently served weights, so /v1/reload must "
                    'include {"latent_stats": "<npz fitted on the new '
                    'checkpoint>"} (evaluate.py --scorer latent writes one)'
                )
            from vad_tpu.eval.latent_score import load_stats, stats_state

            stats = load_stats(latent_stats)
            want = (self._latent["grid"], self._latent["dim"],
                    self._latent["layers"])
            got = (stats.grid, stats.dim, tuple(stats.layers))
            if got != want:
                raise ValueError(
                    f"latent_stats (grid, dim, layers) {got} does not match "
                    f"the serving fit {want}; restart the server to change "
                    "the scorer geometry"
                )
            new_state = stats_state(stats)
        elif latent_stats is not None:
            raise ValueError(
                "this server scores by reconstruction; start it with "
                "--latent-stats to serve the latent scorer"
            )
        variables = {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats") or {}}
        new = checked_cast_like(variables, self._variables, self.dtype)
        if self.mesh is not None:
            from vad_tpu.parallel.sharding import replicate_sharding

            new = jax.device_put(new, replicate_sharding(self.mesh))
            if self._latent is not None:
                new_state = jax.device_put(new_state, replicate_sharding(self.mesh))
        with self._lock:
            self._variables = new
            self._state = new_state
            self.checkpoint = str(checkpoint)
            # the checkpoint's calibrated threshold is a reconstruction-
            # score quantile; it does not apply to latent distances
            self.score_threshold = (
                None if self._latent is not None else ckpt.get("score_threshold")
            )
            if self._latent is not None and latent_stats is not None:
                self._latent.update(
                    {"path": str(latent_stats), "n_fit": stats.n_fit}
                )
        if self.drift is not None:
            # new weights = new score scale; re-anchor the monitor's
            # contract (the window itself is kept — it ages out quickly)
            self.drift.recalibrate(
                self.score_threshold,
                None if self._latent is not None else _serving_score_baseline(ckpt),
            )

    def close(self) -> None:
        pass

    def health(self) -> dict:
        from vad_tpu.utils.profiling import device_memory_report

        h = {
            "model_type": "image",
            "batch": self.batch,
            "image_size": self.image_size,
            "dtype": str(self.dtype),
            "checkpoint": getattr(self, "checkpoint", None),
            "score_threshold": self.score_threshold,
            "scorer": "latent" if self._latent is not None else "recon",
            "hbm": device_memory_report(),
        }
        if self._latent is not None:
            h["latent"] = dict(self._latent)
        return h


def _serving_score_baseline(ckpt: dict) -> Optional[dict]:
    """Objective-gated like the frame threshold — see
    vad_tpu.eval.metrics.serving_score_baseline."""
    from vad_tpu.eval.metrics import serving_score_baseline

    return serving_score_baseline(ckpt)


def _serving_frame_threshold(ckpt: dict) -> Optional[float]:
    """Shared with batch video scoring — see
    vad_tpu.eval.metrics.serving_frame_threshold for the rationale."""
    from vad_tpu.eval.metrics import serving_frame_threshold

    return serving_frame_threshold(ckpt)


class ScoringService:
    """Thread-safe coalescing wrapper around MultiStreamScorer."""

    kind = "video"
    # calibrated anomaly threshold from the checkpoint (p99 of validation
    # normal sequence scores); None = serve raw scores only
    score_threshold: Optional[float] = None
    # optional AlertNotifier (serve.py --alert-url): fed each attached
    # stream's chunk scores so sustained anomalies fire webhooks
    notifier = None

    def __init__(self, scorer, slot_ttl: Optional[float] = None,
                 drift_window: int = 4096, drift_factor: float = 5.0) -> None:
        """``slot_ttl``: seconds of inactivity after which an attached
        slot may be reclaimed when capacity runs out (serve.py
        --slot-ttl).  A client that dies without DELETE would otherwise
        leak its slot until a server restart; with a TTL, attach() under
        full occupancy reaps expired slots (never ones with a chunk in
        flight) instead of failing.  None (default) = slots are only
        ever freed by an explicit detach — reference-free clients must
        opt in."""
        import time as _time

        self.scorer = scorer
        self.slot_ttl = slot_ttl
        self._now = _time.time
        self._last_activity: Dict[int, float] = {}
        self._lock = threading.Lock()  # guards _pending / _stop
        # serializes every mutation of the scorer's carried state: the
        # batched device step vs. attach/detach slot resets.  Without it
        # an attach()'s state zeroing can be overwritten by an in-flight
        # score_chunk whose new_states derive from the pre-reset states.
        self._scorer_lock = threading.Lock()
        self._pending: Dict[int, tuple[np.ndarray, Future]] = {}
        self._wake = threading.Event()
        self._stop = False
        self.metrics = ServiceMetrics()
        # live frame-score distribution over ALL streams (eval/drift.py);
        # calibrated from the checkpoint by the caller / reload()
        self.drift = (
            ScoreWindow(window=drift_window, factor=drift_factor)
            if drift_window else None
        )
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- slots

    def _check_slot(self, slot: int) -> int:
        if not 0 <= slot < self.scorer.num_slots:
            raise ValueError(
                f"slot {slot} out of range [0, {self.scorer.num_slots})"
            )
        return slot

    def attach(self, slot: Optional[int] = None) -> int:
        if slot is not None:
            self._check_slot(slot)
        with self._scorer_lock:
            try:
                got = self.scorer.attach(slot)
            except RuntimeError:
                if slot is not None or not self._reap_expired_locked():
                    raise
                got = self.scorer.attach(slot)
        self._last_activity[got] = self._now()
        return got

    def _reap_expired_locked(self) -> int:
        """Detach slots idle past slot_ttl (caller holds _scorer_lock);
        returns how many were reclaimed.  Slots with a pending chunk are
        active by definition and never reaped."""
        if self.slot_ttl is None:
            return 0
        now = self._now()
        reaped = 0
        with self._lock:
            pending = set(self._pending)
        for s in list(self.scorer.active_slots):
            s = int(s)
            if s in pending:
                continue
            if now - self._last_activity.get(s, now) > self.slot_ttl:
                self.scorer.detach(s)
                self._last_activity.pop(s, None)
                if self.notifier is not None:
                    self.notifier.reset(s)
                print(f"serve: reaped idle slot {s} (ttl {self.slot_ttl}s)",
                      flush=True)
                reaped += 1
        return reaped

    def detach(self, slot: int) -> None:
        self._check_slot(slot)
        with self._scorer_lock:
            self.scorer.detach(slot)
        self._last_activity.pop(slot, None)
        with self._lock:
            pend = self._pending.pop(slot, None)
        if pend is not None:
            pend[1].set_exception(RuntimeError(f"slot {slot} detached"))
        if self.notifier is not None:
            self.notifier.reset(slot)

    # ------------------------------------------------------------- score

    def submit(self, slot: int, frames: np.ndarray) -> Future:
        """Queue one chunk for ``slot``; resolves to its [chunk] scores."""
        s = self.scorer
        self._check_slot(slot)
        expect = (s.chunk,) + s.image_hw + (3,)
        if frames.shape != expect or frames.dtype != np.uint8:
            raise ValueError(f"expected uint8 {expect}, got {frames.dtype} {frames.shape}")
        fut: Future = Future()
        with self._lock:
            if self._stop:
                raise RuntimeError("server shutting down")
            if not s._active[slot]:
                raise KeyError(f"slot {slot} not attached")
            if slot in self._pending:
                raise RuntimeError(f"slot {slot} already has a chunk in flight")
            self._pending[slot] = (frames, fut)
        self._last_activity[slot] = self._now()
        self.metrics.record_request(s.chunk)
        self._wake.set()
        return fut

    def _loop(self) -> None:
        s = self.scorer
        while True:
            self._wake.wait()
            with self._lock:
                if self._stop:
                    self._fail_pending(RuntimeError("server shutting down"))
                    return
                batch_items = dict(self._pending)
                self._pending.clear()
                self._wake.clear()
            if not batch_items:
                continue
            batch = np.zeros((s.num_slots, s.chunk) + s.image_hw + (3,), np.uint8)
            for slot, (frames, _) in batch_items.items():
                batch[slot] = frames
            try:
                import time

                # only submitting slots advance their carried (h, c): the
                # scorer keeps everyone else's state inside the jitted
                # step (their batch rows are zero padding, not frames)
                submitted = np.zeros(s.num_slots, bool)
                submitted[list(batch_items)] = True
                t0 = time.time()
                with self._scorer_lock:
                    out = s.score_chunk(batch, submitted=submitted)
                    still_active = s._active.copy()
                scores = out[0] if isinstance(out, tuple) else out
                np.asarray(scores)  # real device fetch = honest step time
                self.metrics.record_step(time.time() - t0)
                for slot, (_, fut) in batch_items.items():
                    if still_active[slot]:
                        slot_scores = np.asarray(scores[slot], np.float64)
                        if self.drift is not None:
                            self.drift.observe(slot_scores)
                        if self.notifier is not None:
                            # counter update + queue put only; delivery is
                            # on the notifier's own thread
                            self.notifier.observe(
                                slot, slot_scores, self.score_threshold
                            )
                        fut.set_result(slot_scores)
                    else:
                        # detached while the chunk was on the device: its
                        # scores are NaN-masked, don't hand those out
                        fut.set_exception(
                            RuntimeError(f"slot {slot} detached during scoring")
                        )
                if (self.notifier is not None and self.drift is not None
                        and self.drift.drifting()):
                    # fleet-level distribution drift (not a per-stream
                    # anomaly): ride the same webhook, its own cooldown.
                    # Payload is LAZY — the O(window) quantile summary is
                    # only built when the cooldown lets an alert through,
                    # never per scoring tick during sustained drift.
                    self.notifier.notify(
                        lambda: {"type": "score_drift", "model": "video",
                                 **self.drift.snapshot()},
                        source="__score_drift__",
                    )
            except Exception as exc:  # pragma: no cover - device failure path
                for _, fut in batch_items.values():
                    if not fut.done():
                        fut.set_exception(exc)

    def reload(self, checkpoint: str, ckpt: Optional[dict] = None) -> None:
        """Hot-swap the served weights from a checkpoint on disk
        (POST /v1/reload).  Attached streams keep their slots and carried
        (h, c); the swap waits only for any in-flight device step (the
        scorer lock), so a weight refresh from a nightly retrain needs no
        server restart and drops no streams.  ``ckpt``: pass the
        already-loaded dict to skip a second deserialize."""
        from vad_tpu.utils.checkpoint import load_checkpoint
        from vad_tpu.utils.precision import check_served_image_size, check_served_stem

        if ckpt is None:
            ckpt = load_checkpoint(checkpoint)
        if ckpt.get("model_type") == "image":
            raise ValueError(
                "image checkpoint cannot reload a video server; this "
                "server serves the video model"
            )
        check_served_image_size(ckpt.get("args") or {}, self.scorer.image_size)
        check_served_stem(ckpt.get("args") or {},
                          getattr(self.scorer.model, "stem", "pool"))
        variables = {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats") or {}}
        # metadata swaps under the same lock as the weights so a scoring
        # tick never pairs new weights with the old threshold (or vice
        # versa), and concurrent reloads stay internally consistent
        with self._scorer_lock:
            self.scorer.reload_variables(variables)
            self.checkpoint = str(checkpoint)
            self.score_threshold = _serving_frame_threshold(ckpt)
        if self.drift is not None:
            # new weights = new score scale; re-anchor the monitor
            self.drift.recalibrate(self.score_threshold,
                                   _serving_score_baseline(ckpt))

    def metrics_snapshot(self) -> dict:
        snap = self.metrics.snapshot()
        if self.drift is not None:
            snap["scores"] = self.drift.snapshot()
        if self.notifier is not None:
            snap["alerts"] = {
                "delivered": self.notifier.delivered,
                "failed": self.notifier.failed,
            }
        return snap

    def _fail_pending(self, exc: Exception) -> None:
        """Caller must hold self._lock."""
        for _, fut in self._pending.values():
            fut.set_exception(exc)
        self._pending.clear()

    def close(self) -> None:
        with self._lock:
            self._stop = True
            self._fail_pending(RuntimeError("server shutting down"))
        self._wake.set()
        self._thread.join(timeout=5)

    def health(self) -> dict:
        from vad_tpu.utils.profiling import device_memory_report

        s = self.scorer
        return {
            "model_type": "video",
            "num_slots": s.num_slots,
            "chunk": s.chunk,
            "image_size": s.image_size,
            "dtype": str(s.dtype),
            "fused_input": bool(getattr(s, "fused_input", False)),
            "active_slots": [int(i) for i in s.active_slots],
            "slot_ttl": self.slot_ttl,
            "checkpoint": getattr(self, "checkpoint", None),
            "score_threshold": self.score_threshold,
            "hbm": device_memory_report(),
        }


def _reload_path_allowed(path: str, roots) -> Optional[str]:
    """None when ``path`` resolves under one of ``roots``, else the 403
    message.  /v1/reload names a file on the daemon's disk; without this
    fence any client that can reach the port gets the daemon to open an
    arbitrary attacker-influenced path (and, before the restricted
    unpickler, to execute it).  Roots are resolved, so symlinks cannot
    escape them."""
    if not roots:
        return ("reload is disabled: this server was started without "
                "reload roots (serve.py derives them from --checkpoint/"
                "--watch; pass --reload-root to add more)")
    try:
        # non-strict: normalizes '..' and resolves existing symlinks; a
        # missing file inside a root still passes here and then 400s in
        # load_checkpoint (same contract as before the fence)
        p = Path(path).resolve(strict=False)
    except OSError:
        return f"unresolvable checkpoint path: {path}"
    for root in roots:
        if p == root or root in p.parents:
            return None
    return (f"checkpoint path {path} is outside the allowed reload roots "
            f"{[str(r) for r in roots]}")


def _make_handler(services: Dict[str, object], reload_roots=()):
    """Handler over a ``kind -> service`` map: a server holds an image
    service, a video service, or BOTH (serve.py --image-checkpoint);
    each endpoint routes to its kind and 400s when that model is absent.
    ``reload_roots``: resolved directories POST /v1/reload may read from."""
    primary = next(iter(services.values()))

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *args) -> None:  # quiet
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path == "/v1/health":
                if len(services) == 1:
                    self._json(200, primary.health())
                else:
                    self._json(200, {
                        "model_type": "image+video",
                        **{k: s.health() for k, s in services.items()},
                    })
            elif url.path == "/v1/metrics":
                def snap(s):
                    fn = getattr(s, "metrics_snapshot", None)
                    return fn() if fn is not None else s.metrics.snapshot()

                fmt = parse_qs(url.query).get("format", ["json"])[0]
                if fmt == "prometheus":
                    body = prometheus_text(
                        {k: snap(s) for k, s in services.items()}
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; version=0.0.4; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif len(services) == 1:
                    self._json(200, snap(primary))
                else:
                    self._json(200, {k: snap(s) for k, s in services.items()})
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self) -> None:
            svc = primary  # for the error-metrics fallback
            try:
                if self.path == "/v1/reload":
                    n = int(self.headers.get("Content-Length", 0))
                    try:
                        req = json.loads(self.rfile.read(n) or b"{}")
                    except json.JSONDecodeError as exc:
                        self._json(400, {"error": f"invalid JSON body: {exc}"})
                        return
                    path = req.get("checkpoint") if isinstance(req, dict) else None
                    if not path or not isinstance(path, str):
                        self._json(400, {"error": 'body must be {"checkpoint": "<path>"}'})
                        return
                    denied = _reload_path_allowed(path, reload_roots)
                    if denied is not None:
                        self._json(403, {"error": denied})
                        return
                    # optional new fitted statistics for a latent-scoring
                    # image service; a disk path too, so same fence
                    stats_path = req.get("latent_stats")
                    if stats_path is not None:
                        if not isinstance(stats_path, str):
                            self._json(400, {"error": "latent_stats must be a path string"})
                            return
                        denied = _reload_path_allowed(stats_path, reload_roots)
                        if denied is not None:
                            self._json(403, {"error": denied})
                            return
                    if len(services) == 1:
                        svc = primary  # its own kind check gives the clearer error
                        if svc.kind == "image":
                            svc.reload(path, latent_stats=stats_path)
                        elif stats_path is not None:
                            self._json(400, {"error": "latent_stats applies to the image model only"})
                            return
                        else:
                            svc.reload(path)
                    else:
                        from vad_tpu.utils.checkpoint import load_checkpoint

                        ckpt = load_checkpoint(path)  # loaded once, passed through
                        kind = "image" if ckpt.get("model_type") == "image" else "video"
                        svc = services[kind]
                        if kind == "image":
                            svc.reload(path, ckpt=ckpt, latent_stats=stats_path)
                        elif stats_path is not None:
                            self._json(400, {"error": "latent_stats applies to the image model only"})
                            return
                        else:
                            svc.reload(path, ckpt=ckpt)
                    self._json(200, {"reloaded": path, "model_type": svc.kind})
                    return
                if self.path == "/v1/images":
                    svc = services.get("image")
                    if svc is None:
                        svc = primary
                        self._json(400, {"error": "video model is being served; use /v1/streams"})
                        return
                    shape = tuple(
                        int(v) for v in self.headers.get("X-Frames-Shape", "").split(",")
                    )
                    # reject oversize requests BEFORE buffering the body:
                    # the declared shape bounds both the RAM this request
                    # may pin and the device steps it may serialize
                    limit = svc.batch * svc.MAX_STEPS_PER_REQUEST
                    if not shape or shape[0] > limit:
                        self._json(413, {
                            "error": f"request exceeds per-request frame "
                                     f"limit {limit}; split client-side"
                        })
                        return
                    n = int(self.headers.get("Content-Length", 0))
                    if n != int(np.prod(shape)):
                        self._json(400, {
                            "error": f"Content-Length {n} does not match "
                                     f"X-Frames-Shape {shape}"
                        })
                        return
                    frames = np.frombuffer(self.rfile.read(n), np.uint8).reshape(shape)
                    scores = svc.score_images(frames)
                    payload = {"scores": list(scores)}
                    thr = svc.score_threshold
                    if thr is not None:
                        payload["threshold"] = thr
                        payload["anomalous"] = [bool(s > thr) for s in scores]
                    self._json(200, payload)
                    return
                svc = services.get("video")
                if svc is None:
                    svc = primary
                    self._json(400, {"error": "image model is being served; use /v1/images"})
                    return
                if self.path == "/v1/streams":
                    self._json(200, {"slot": svc.attach()})
                    return
                parts = self.path.strip("/").split("/")
                if len(parts) == 4 and parts[:2] == ["v1", "streams"] and parts[3] == "frames":
                    slot = int(parts[2])
                    shape = tuple(
                        int(v) for v in self.headers.get("X-Frames-Shape", "").split(",")
                    )
                    # validate the DECLARED shape before buffering the
                    # body (like /v1/images): a bogus or hostile
                    # Content-Length can otherwise pin arbitrary RAM
                    expect = (svc.scorer.chunk,) + svc.scorer.image_hw + (3,)
                    if shape != expect:
                        svc.metrics.record_error()
                        self._json(400, {
                            "error": f"expected X-Frames-Shape {expect}, got {shape}"
                        })
                        return
                    n = int(self.headers.get("Content-Length", 0))
                    if n != int(np.prod(shape)):
                        svc.metrics.record_error()
                        self._json(400, {
                            "error": f"Content-Length {n} does not match "
                                     f"X-Frames-Shape {shape}"
                        })
                        return
                    raw = self.rfile.read(n)
                    frames = np.frombuffer(raw, np.uint8).reshape(shape)
                    # generous bound: the first-ever chunk pays the jit
                    # compile (minutes on a cold cache); steady state is ms
                    scores = svc.submit(slot, frames).result(timeout=600)
                    payload = {"slot": slot, "scores": list(scores)}
                    thr = svc.score_threshold
                    if thr is not None:
                        payload["threshold"] = thr
                        payload["anomalous"] = [bool(s > thr) for s in scores]
                    self._json(200, payload)
                    return
                self._json(404, {"error": f"unknown path {self.path}"})
            except (KeyError, ValueError, RuntimeError, OSError,
                    pickle.UnpicklingError) as exc:
                svc.metrics.record_error()
                self._json(400, {"error": str(exc)})
            except (TimeoutError, FutureTimeoutError):
                # FutureTimeoutError is a distinct class on Python 3.10
                svc.metrics.record_error()
                self._json(504, {"error": "scoring timed out"})

        def do_DELETE(self) -> None:
            try:
                svc = services.get("video")
                if svc is None:
                    self._json(400, {"error": "image model is being served; use /v1/images"})
                    return
                parts = self.path.strip("/").split("/")
                if len(parts) == 3 and parts[:2] == ["v1", "streams"]:
                    slot = int(parts[2])
                    svc.detach(slot)
                    self._json(200, {"detached": slot})
                else:
                    self._json(404, {"error": f"unknown path {self.path}"})
            except (KeyError, ValueError, RuntimeError) as exc:
                self._json(400, {"error": str(exc)})

    return Handler


class CheckpointWatcher:
    """Auto-deploy loop: polls a checkpoint file or results directory and
    hot-reloads the service when a checkpoint appears or changes
    (``serve.py --watch``).  A directory is scanned recursively for
    ``best_model.ckpt`` files — pointed at a ``results/`` tree this
    auto-deploys every retrain's best model with zero downtime
    (checkpoint writes are atomic renames, so a poll never sees a
    half-written file).

    Every changed candidate is attempted, newest-first — NOT just the
    globally newest: on a dual-model daemon (``--image-checkpoint``) the
    image and video retrains both deploy regardless of which finished
    last, and an undeployable newest file (wrong kind, incompatible
    architecture) cannot starve an older-but-deployable one.  A file
    that fails to reload is remembered at its current mtime so it is not
    retried every poll; a NEW write of it (new mtime) is tried again.
    Serving continues on the current weights through any failure.
    """

    def __init__(self, service, path, interval: float = 30.0,
                 initial: Optional[str] = None) -> None:
        self.service = service  # anything with .reload(path): a scoring
        # service, or ScoringServer (routes by checkpoint kind)
        self.path = Path(path)
        self.interval = interval
        self._stop = threading.Event()
        self._seen: Dict[str, float] = {}
        if initial is not None:
            try:
                p = Path(initial)
                self._seen[str(p.resolve())] = p.stat().st_mtime
            except OSError:
                pass
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def start(self) -> None:
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)

    def _candidates(self):
        from vad_tpu.utils.checkpoint import CHECKPOINT_SUFFIX

        if self.path.is_file():
            return [self.path]
        if not self.path.is_dir():
            return []
        cands = list(self.path.rglob(f"best_model{CHECKPOINT_SUFFIX}"))
        cands.sort(key=lambda p: p.stat().st_mtime, reverse=True)
        return cands

    def _reload(self, path: str, ckpt: dict) -> None:
        """Deploy one loaded checkpoint into the right service (the target
        is a single service or a ScoringServer; either way the dict is
        passed through so the weights deserialize exactly once)."""
        services = getattr(self.service, "services", None)
        if services is None:
            self.service.reload(path, ckpt=ckpt)
            return
        kind = "image" if ckpt.get("model_type") == "image" else "video"
        svc = services.get(kind)
        if svc is None:
            raise ValueError(f"no {kind} model is being served")
        svc.reload(path, ckpt=ckpt)

    def poll_once(self) -> bool:
        """One poll step; True iff at least one reload happened (tests
        call this directly so no timing is involved)."""
        from vad_tpu.utils.checkpoint import load_checkpoint

        # collect the newest CHANGED candidate per model kind (candidates
        # come newest-first); older changed files of the same kind are
        # superseded and only marked seen — deploying them after the
        # newer one would roll the weights backwards
        newest_changed: Dict[str, tuple] = {}
        for p in self._candidates():
            try:
                resolved, mtime = str(p.resolve()), p.stat().st_mtime
            except OSError:
                continue  # deleted between scan and stat
            if self._seen.get(resolved) == mtime:
                continue
            try:
                ckpt = load_checkpoint(resolved)
            except Exception as exc:
                print(f"watch: cannot read {p}: {exc}", flush=True)
                self._seen[resolved] = mtime
                continue
            kind = "image" if ckpt.get("model_type") == "image" else "video"
            if kind in newest_changed:
                self._seen[resolved] = mtime  # superseded
                continue
            newest_changed[kind] = (resolved, mtime, ckpt)

        deployed = False
        for resolved, mtime, ckpt in newest_changed.values():
            try:
                self._reload(resolved, ckpt)
                print(f"watch: hot-reloaded {resolved}", flush=True)
                deployed = True
            except Exception as exc:  # keep serving on the current weights
                print(f"watch: reload of {resolved} failed: {exc}", flush=True)
            # seen either way: a failed file is retried only when it is
            # written again (atomic writes make partial reads impossible,
            # so a failure here is a real incompatibility, not a race)
            self._seen[resolved] = mtime
        return deployed

    def _loop(self) -> None:
        while not self._stop.wait(self.interval):
            self.poll_once()


class ScoringServer:
    """HTTP server wrapper; ``port=0`` binds an ephemeral port (tests).

    Holds one service per model kind: a single image or video service
    (the common case), or both at once (``serve.py --image-checkpoint``)
    so one daemon serves /v1/images AND /v1/streams — the daemon
    equivalent of the UI's dual-model AppState (reference main.py:33-50).
    """

    def __init__(self, scorer=None, host: str = "0.0.0.0", port: int = 8600,
                 service=None, services: Optional[Dict[str, object]] = None,
                 reload_roots=None) -> None:
        if services is not None:
            self.services = dict(services)
        else:
            svc = service if service is not None else ScoringService(scorer)
            self.services = {svc.kind: svc}
        # primary accessor (video first): what serve.py prints and what
        # single-service callers have always used
        self.service = self.services.get("video") or next(iter(self.services.values()))
        # POST /v1/reload may only read files under these resolved roots:
        # the run dirs of the checkpoints being served, plus whatever the
        # operator passed (serve.py adds --watch and --reload-root).  A
        # server built programmatically with no checkpoint paths and no
        # explicit roots has reload DISABLED (403 with instructions).
        roots = {
            Path(r).resolve() for r in (reload_roots or ())
        } | {
            Path(cp).resolve().parent
            for svc in self.services.values()
            if (cp := getattr(svc, "checkpoint", None))
        }
        self.reload_roots = sorted(roots)
        self.httpd = ThreadingHTTPServer(
            (host, port), _make_handler(self.services, self.reload_roots)
        )
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def reload(self, checkpoint: str, latent_stats: Optional[str] = None) -> str:
        """Route a checkpoint to the service of its kind (CheckpointWatcher
        target on dual-model servers); returns the kind reloaded.
        ``latent_stats``: new fitted statistics for an image service
        running the latent scorer (required by it — see
        ImageScoringService.reload)."""
        from vad_tpu.utils.checkpoint import load_checkpoint

        ckpt = load_checkpoint(checkpoint)  # loaded once, passed through
        kind = "image" if ckpt.get("model_type") == "image" else "video"
        svc = self.services.get(kind)
        if svc is None:
            raise ValueError(f"no {kind} model is being served")
        if kind == "image":
            svc.reload(checkpoint, ckpt=ckpt, latent_stats=latent_stats)
        elif latent_stats is not None:
            raise ValueError("latent_stats applies to the image model only")
        else:
            svc.reload(checkpoint, ckpt=ckpt)
        return kind

    def start_background(self) -> None:
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def close(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        for svc in self.services.values():
            svc.close()
        if self._thread:
            self._thread.join(timeout=5)


def _image_service_from_ckpt(ckpt, checkpoint, batch, dtype,
                             data_parallel, spatial_parallel,
                             drift_window=4096, drift_factor=5.0,
                             latent_stats=None):
    """Build an ImageScoringService from a loaded image checkpoint."""
    import jax.numpy as jnp

    from vad_tpu.core.config import ImageAEConfig
    from vad_tpu.models.autoencoder import ConvAutoencoder

    spatial = int(spatial_parallel or 1) > 1
    icfg = ImageAEConfig.from_args(ckpt.get("args", {}))
    imodel = ConvAutoencoder(
        in_channels=icfg.in_channels, latent_dim=icfg.latent_dim, norm=icfg.norm,
        stem=icfg.stem,
    )
    ivars = {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats") or {}}
    imesh = None
    if data_parallel or spatial:
        from vad_tpu.parallel.sharding import get_mesh

        imesh = get_mesh(model_parallel=int(spatial_parallel or 1))
    service = ImageScoringService(
        imodel, ivars, icfg.image_size, batch=batch, dtype=getattr(jnp, dtype),
        mesh=imesh, spatial=spatial,
        drift_window=drift_window, drift_factor=drift_factor,
        latent_stats=latent_stats,
    )
    service.checkpoint = str(checkpoint)
    # the calibrated threshold is a reconstruction-score quantile; latent
    # distances live on a different scale
    service.score_threshold = (
        None if latent_stats is not None else ckpt.get("score_threshold")
    )
    if service.drift is not None:
        service.drift.recalibrate(
            service.score_threshold,
            None if latent_stats is not None else _serving_score_baseline(ckpt),
        )
    return service


def serve_from_checkpoint(
    checkpoint: str,
    host: str = "0.0.0.0",
    port: int = 8600,
    num_slots: int = 16,
    chunk: int = 16,
    dtype: str = "bfloat16",
    fused_input: Optional[bool] = None,
    data_parallel: bool = False,
    spatial_parallel: int = 1,
    image_checkpoint: Optional[str] = None,
    slot_ttl: Optional[float] = None,
    drift_window: int = 4096,
    drift_factor: float = 5.0,
    reload_roots=None,
    latent_stats: Optional[str] = None,
) -> ScoringServer:
    """Build a ScoringServer from a checkpoint (ours or torch-imported).

    ``latent_stats``: serve /v1/images through the latent-distance
    (Mahalanobis) scorer using this fitted npz (see ImageScoringService);
    applies to whichever image model the daemon serves.

    Video checkpoints get the coalescing multi-stream service; image
    checkpoints get the stateless batched image service (``num_slots``
    doubles as the image batch capacity).

    ``image_checkpoint``: serve an image model ALONGSIDE the video model
    from the same daemon (``checkpoint`` must then be a video one) —
    /v1/streams and /v1/images both live, per-kind /v1/health and
    /v1/metrics sections, /v1/reload routed by the checkpoint's kind.

    ``data_parallel``: shard the scoring batch over all visible chips via
    a 'data'-axis mesh.  Video: stream slots + carried state split over
    chips, each chip serving num_slots / n_chips independent streams with
    no collectives in the step (see MultiStreamScorer's mesh docs);
    ``num_slots`` is rounded up to a multiple of the chip count.  Image:
    each chip scores batch / n_chips images per step
    (ImageScoringService's mesh docs).

    ``spatial_parallel``: additionally split image rows over a 'model'
    mesh axis of this size (spatial partitioning for high-resolution
    inputs; see the ``spatial`` docs on both services).  Implies a mesh
    even without ``data_parallel``; for video it forces the XLA
    recurrence backend (the Pallas kernel is opaque to the SPMD
    partitioner).

    ``slot_ttl``: reclaim video stream slots idle longer than this many
    seconds when attach() finds no free slot (see ScoringService).

    ``drift_window`` / ``drift_factor``: online score-distribution
    monitoring (eval/drift.py) — the last ``drift_window`` scores per
    model kind are summarized at GET /v1/metrics, with a ``drifting``
    verdict when threshold exceedances run ``drift_factor`` x the
    calibrated ~1% contract.  window 0 disables."""
    import jax.numpy as jnp

    from vad_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(checkpoint)
    print("warming up (first compile)...", flush=True)

    spatial = int(spatial_parallel or 1) > 1

    if ckpt.get("model_type") == "image":
        if image_checkpoint:
            raise ValueError(
                "--checkpoint must be the VIDEO model when --image-checkpoint "
                "is given (got two image checkpoints)"
            )
        service = _image_service_from_ckpt(
            ckpt, checkpoint, num_slots, dtype, data_parallel, spatial_parallel,
            drift_window=drift_window, drift_factor=drift_factor,
            latent_stats=latent_stats,
        )
        return ScoringServer(host=host, port=port, service=service,
                             reload_roots=reload_roots)

    from vad_tpu.core.config import VideoAEConfig
    from vad_tpu.eval.serving import MultiStreamScorer
    from vad_tpu.models.video_autoencoder import VideoAutoencoder
    from vad_tpu.ops.convlstm_pallas import preferred_backend

    cfg = VideoAEConfig.from_args(ckpt.get("args", {}))
    lat = cfg.image_size // 16

    mesh = None
    if data_parallel or spatial:
        import jax

        from vad_tpu.parallel.sharding import get_mesh

        mesh = get_mesh(model_parallel=int(spatial_parallel or 1))
        data_n = mesh.shape["data"]
        num_slots = ((num_slots + data_n - 1) // data_n) * data_n

    backend = preferred_backend(lat, lat, cfg.lstm_hidden_dim)
    if spatial:
        backend = "xla"  # Pallas recurrence is opaque to the SPMD partitioner
    if fused_input and cfg.stem != "pool":
        raise ValueError(
            "--fused-input folds conv1+max-pool into one Pallas kernel; "
            f"this checkpoint uses the '{cfg.stem}' stem which has no pool "
            "(and no full-res intermediate to fuse away — serve it plain)"
        )
    model = VideoAutoencoder(
        in_channels=cfg.in_channels,
        latent_dim=cfg.latent_dim,
        lstm_hidden_dim=cfg.lstm_hidden_dim,
        lstm_layers=cfg.lstm_layers,
        backend=backend,
        norm=cfg.norm,
        stem=cfg.stem,
    )
    variables = {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats") or {}}
    scorer = MultiStreamScorer(
        model, variables, num_slots=num_slots, chunk=chunk,
        image_size=cfg.image_size, dtype=getattr(jnp, dtype), fused_input=fused_input,
        mesh=mesh, spatial=spatial,
    )
    # pay the jit compile before accepting traffic
    warm = np.zeros((num_slots, chunk) + scorer.image_hw + (3,), np.uint8)
    scorer.score_chunk(warm)
    vsvc = ScoringService(scorer, slot_ttl=slot_ttl,
                          drift_window=drift_window, drift_factor=drift_factor)
    vsvc.checkpoint = str(checkpoint)
    vsvc.score_threshold = _serving_frame_threshold(ckpt)
    if vsvc.drift is not None:
        vsvc.drift.recalibrate(vsvc.score_threshold,
                               _serving_score_baseline(ckpt))
    services: Dict[str, object] = {"video": vsvc}
    if image_checkpoint:
        ickpt = load_checkpoint(image_checkpoint)
        if ickpt.get("model_type") != "image":
            raise ValueError("--image-checkpoint must be an image checkpoint")
        services["image"] = _image_service_from_ckpt(
            ickpt, image_checkpoint, num_slots, dtype, data_parallel,
            spatial_parallel, drift_window=drift_window,
            drift_factor=drift_factor, latent_stats=latent_stats,
        )
    elif latent_stats is not None:
        raise ValueError(
            "--latent-stats applies to the image model; this daemon serves "
            "only a video checkpoint (add --image-checkpoint)"
        )
    return ScoringServer(host=host, port=port, services=services,
                         reload_roots=reload_roots)
