"""Multi-stream video scoring service (production serving path).

Batches S independent camera/video streams through one compiled
state-carrying scoring step: uint8 frames in, per-frame anomaly scores
out, ConvLSTM (h, c) tracked per stream slot.  Streams can attach/detach
at any time (their slot's state resets to zeros) without recompilation —
slot count and chunk length are the only static shapes.

This is the component behind bench.py's headline number and has no
equivalent in the reference (single-video, window-by-window inference,
evaluate_video.py:309-404).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vad_tpu.models.video_autoencoder import ConvLSTM, VideoAutoencoder


class MultiStreamScorer:
    """Fixed-slot batched scorer over independent video streams.

    Args:
        model: VideoAutoencoder (any backend).
        variables: trained variables for the model.
        num_slots: parallel stream capacity (static batch dim).
        chunk: frames consumed per step per stream (static time dim).
        image_size: model input resolution.
        return_maps: also return per-pixel error maps (costs bandwidth).
        mesh: optional `jax.sharding.Mesh` (axes from
            vad_tpu.parallel.sharding).  Slots, the carried (h, c) state
            and the per-slot score outputs are sharded over the 'data'
            axis; variables are replicated; the jitted step is pinned
            with in/out shardings exactly like the training step.
            Scaling story: per-chip throughput times the data-axis size —
            each chip owns num_slots / data_axis stream slots, streams
            never communicate (the batch dim is embarrassingly parallel),
            so XLA inserts NO collectives in the scoring step and a
            d-chip slice serves d x the streams at single-chip latency.
            `num_slots` must divide evenly by the data-axis size.
        spatial: additionally shard the image H dimension over the mesh's
            'model' axis (spatial partitioning).  The models are fully
            convolutional, so XLA's SPMD partitioner inserts the halo
            exchanges every 3x3 conv / pool / ConvTranspose needs at
            shard edges — no hand-written communication.  This is the
            scaling axis for few HIGH-RESOLUTION streams (e.g. native
            720p/1080p scoring, where one chip's HBM or latency binds),
            orthogonal to the 'data' slot axis for MANY streams.
            Requires the plain XLA backend (a Pallas kernel is a black
            box to the partitioner) and H, H/16 divisible by the
            'model' axis size.

    ``image_size`` may be an int (square, the reference's contract) or an
    ``(H, W)`` tuple for native-resolution scoring — both models are fully
    convolutional, so any H, W divisible by 16 runs without retraining
    (reference behavior is fixed 256x256 after resize,
    evaluate_video.py:322-326; this generalizes it).
    """

    def __init__(
        self,
        model: VideoAutoencoder,
        variables,
        num_slots: int = 8,
        chunk: int = 16,
        image_size=256,
        return_maps: bool = False,
        dtype=jnp.float32,
        fused_input: Optional[bool] = None,
        mesh=None,
        spatial: bool = False,
    ) -> None:
        """``fused_input``: run normalize+conv1+BN+LeakyReLU+pool as the
        fused Pallas kernel on raw bytes (ops/encoder_pallas.py).
        Measured ~11-12%% SLOWER end-to-end on v5e (XLA relayouts the
        conv2 handoff — see that module's docstring), so the default is
        OFF; kept only so the regression is tracked run-over-run and for
        TPU generations where the layout-handoff tradeoff differs.
        Requires TPU, W*3 %% 96 == 0 and even H."""
        from vad_tpu.utils.precision import cast_floating

        self.model = model
        self.variables = cast_floating(variables, dtype) if dtype != jnp.float32 else variables
        self.num_slots = num_slots
        self.chunk = chunk
        self.image_size = image_size
        hw = tuple(image_size) if isinstance(image_size, (tuple, list)) else (image_size, image_size)
        if hw[0] % 16 or hw[1] % 16:
            raise ValueError(f"image size {hw} must be divisible by 16 (4 pool stages)")
        self.image_hw = hw
        self.return_maps = return_maps
        self.dtype = dtype
        self.mesh = mesh
        self.spatial = spatial
        self._slot_sh = self._repl_sh = None
        self._frame_sh = self._state_sh = self._map_sh = None
        if spatial and mesh is None:
            raise ValueError("spatial=True requires a mesh")
        if mesh is not None:
            from vad_tpu.parallel.sharding import (
                DATA_AXIS,
                MODEL_AXIS,
                batch_sharding,
                replicate_sharding,
                spatial_frame_sharding,
                spatial_state_sharding,
            )

            data_n = mesh.shape[DATA_AXIS]
            if num_slots % data_n != 0:
                raise ValueError(
                    f"num_slots={num_slots} must divide evenly over the "
                    f"'{DATA_AXIS}' mesh axis of size {data_n}"
                )
            self._slot_sh = batch_sharding(mesh)
            self._repl_sh = replicate_sharding(mesh)
            self._frame_sh = self._state_sh = self._slot_sh
            self._map_sh = self._slot_sh
            if spatial:
                model_n = mesh.shape[MODEL_AXIS]
                if model.backend != "xla":
                    raise ValueError(
                        "spatial partitioning requires backend='xla' (a "
                        "Pallas kernel is opaque to the SPMD partitioner)"
                    )
                if fused_input:
                    raise ValueError("spatial=True is incompatible with fused_input")
                if hw[0] % (16 * model_n):
                    raise ValueError(
                        f"H={hw[0]} and H/16 must divide by the "
                        f"'{MODEL_AXIS}' axis of size {model_n}"
                    )
                self._frame_sh = spatial_frame_sharding(mesh)   # [S,T,H,W,3]
                self._state_sh = spatial_state_sharding(mesh)   # [S,h,w,C]
                # error maps [S, T, H, W] share the frames' row split
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._map_sh = NamedSharding(mesh, P(DATA_AXIS, None, MODEL_AXIS))
            self.variables = jax.device_put(self.variables, self._repl_sh)
        if fused_input is None:
            fused_input = False
        self.fused_input = fused_input
        if fused_input:
            from vad_tpu.ops.encoder_pallas import fold_from_variables

            w_band, bias_folded = fold_from_variables(variables)
            self._w_band = jnp.asarray(w_band, jnp.float32).astype(dtype)
            self._bias_folded = jnp.asarray(bias_folded, jnp.float32)
            if mesh is not None:
                self._w_band = jax.device_put(self._w_band, self._repl_sh)
                self._bias_folded = jax.device_put(self._bias_folded, self._repl_sh)
        lat_h, lat_w = hw[0] // 16, hw[1] // 16
        # the carried ConvLSTM state stays f32 even under a bf16 policy —
        # it integrates across the whole stream (utils/precision.py); the
        # scan path casts only the MXU conv inputs down to `dtype`.
        self._zero_state = ConvLSTM.zero_state(
            model.lstm_layers, num_slots, lat_h, lat_w, model.lstm_hidden_dim, dtype=jnp.float32
        )
        if mesh is not None:
            # carried state lives sharded over 'data' (and, under spatial
            # partitioning, latent rows over 'model') for the whole stream
            # lifetime — each chip keeps only its own shard of (h, c) in HBM
            self._zero_state = jax.tree.map(
                lambda a: jax.device_put(a, self._state_sh), self._zero_state
            )
        self.states = self._zero_state
        self._active = np.zeros(num_slots, dtype=bool)

        if fused_input:

            def forward(v, u8, states):
                s, t, h, w, _ = u8.shape
                _, err, scores, new_states = model.apply(
                    v, u8.reshape(s, t, h, w * 3), states, self._w_band,
                    self._bias_folded, return_maps,
                    method=VideoAutoencoder.stream_step_u8,
                )
                return scores, err, new_states

        else:

            def forward(v, u8, states):
                x = u8.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
                recon, err, scores, new_states = model.apply(
                    v, x, states, method=VideoAutoencoder.stream_step
                )
                return scores, err, new_states

        def step(v, u8, states, submitted):
            scores, err, new_states = forward(v, u8, states)
            # only slots that actually submitted frames advance their
            # carried (h, c); everyone else keeps their state (their rows
            # of the batch are padding, not real frames)
            keep = submitted.reshape(-1, 1, 1, 1)
            out_states = tuple(
                (jnp.where(keep, h_new, h_old), jnp.where(keep, c_new, c_old))
                for (h_new, c_new), (h_old, c_old) in zip(new_states, states)
            )
            if return_maps:
                return scores.astype(jnp.float32), err.astype(jnp.float32), out_states
            return scores.astype(jnp.float32), None, out_states

        kwargs = {}
        if mesh is not None:
            state_sh = jax.tree.map(lambda _: self._state_sh, self._zero_state)
            kwargs["in_shardings"] = (
                self._repl_sh,   # variables
                self._frame_sh,  # frames [S, T, H, W, 3]
                state_sh,        # carried (h, c) per layer [S, h, w, C]
                self._slot_sh,   # submitted mask [S]
            )
            kwargs["out_shardings"] = (
                self._slot_sh,                               # scores [S, T]
                self._map_sh if return_maps else None,       # error maps
                state_sh,
            )
            if not spatial:
                # Slot-parallel mode runs the step through shard_map: the
                # scoring computation never mixes slots, so each chip runs
                # the UNMODIFIED per-shard step on its own slots — zero
                # collectives, and the fused Pallas recurrence / u8 input
                # kernel stays a per-chip kernel (GSPMD cannot split a
                # custom call, so the sharding-annotation route would
                # break the Pallas backends on a real multi-chip host).
                # Spatial mode needs the partitioner (halo exchanges at
                # row-shard edges) and therefore keeps GSPMD + XLA backend.
                from jax.sharding import PartitionSpec as P

                from vad_tpu.parallel.sharding import DATA_AXIS

                state_specs = jax.tree.map(lambda _: P(DATA_AXIS), self._zero_state)
                step = jax.shard_map(
                    step,
                    mesh=mesh,
                    in_specs=(P(), P(DATA_AXIS), state_specs, P(DATA_AXIS)),
                    out_specs=(
                        P(DATA_AXIS),
                        P(DATA_AXIS) if return_maps else None,
                        state_specs,
                    ),
                    check_vma=False,
                )
        self._step = jax.jit(step, **kwargs)

    # ------------------------------------------------------------ reload

    def reload_variables(self, variables) -> None:
        """Hot-swap the model weights in place (serving-daemon /v1/reload).

        The new variables must match the served architecture exactly
        (same pytree structure, shapes and param dtypes) so the already-
        compiled step is reused — the swap costs one host->device
        transfer, no recompile, no dropped streams.  Attached slots keep
        their carried (h, c): the ConvLSTM state is a function of the
        observed frames, and scoring continuity across a weight refresh
        (e.g. a nightly retrain on newer normal data) is the point of
        hot reload.  Raises ValueError on any structural mismatch —
        an architecture change needs a new scorer/server.
        """
        from vad_tpu.utils.precision import checked_cast_like

        if self.fused_input:
            # the folded input-block weights (_w_band/_bias_folded) are
            # closed over by the jitted step — baked in as compile-time
            # constants — so a swap would silently not apply to them
            raise ValueError(
                "hot reload is not supported with fused_input=True; "
                "restart the server"
            )
        new = checked_cast_like(variables, self.variables, self.dtype)
        if self.mesh is not None:
            new = jax.device_put(new, self._repl_sh)
        self.variables = new

    # ------------------------------------------------------------- slots

    def attach(self, slot: Optional[int] = None) -> int:
        """Claim a stream slot (state zeroed); returns the slot id."""
        if slot is None:
            free = np.flatnonzero(~self._active)
            if len(free) == 0:
                raise RuntimeError(f"all {self.num_slots} stream slots busy")
            slot = int(free[0])
        if self._active[slot]:
            raise RuntimeError(f"slot {slot} already attached")
        self._reset_slot(slot)
        self._active[slot] = True
        return slot

    def detach(self, slot: int) -> None:
        self._active[slot] = False

    def _reset_slot(self, slot: int) -> None:
        new_states = []
        for (h, c), (zh, zc) in zip(self.states, self._zero_state):
            h2, c2 = h.at[slot].set(zh[slot]), c.at[slot].set(zc[slot])
            if self._state_sh is not None:
                # re-pin: the out-of-jit update must not drift the carried
                # state off its declared layout between steps
                h2 = jax.device_put(h2, self._state_sh)
                c2 = jax.device_put(c2, self._state_sh)
            new_states.append((h2, c2))
        self.states = tuple(new_states)

    @property
    def active_slots(self) -> np.ndarray:
        return np.flatnonzero(self._active)

    # ------------------------------------------------------------- score

    def score_chunk(self, frames_u8: np.ndarray, submitted: Optional[np.ndarray] = None):
        """Score one chunk across all slots.

        Args:
            frames_u8: [num_slots, chunk, H, W, 3] uint8 (RGB).  Inactive
                slots may carry arbitrary data; their scores are NaN.
            submitted: optional [num_slots] bool mask of slots whose rows
                are REAL frames this tick — only those slots' carried
                (h, c) advance; everyone else's state is preserved inside
                the jitted step (their rows are batch padding).  Defaults
                to the active-slot mask.

        Returns:
            scores [num_slots, chunk] float (NaN for inactive slots), and
            error maps [num_slots, chunk, H, W] when return_maps is set.
        """
        expected = (self.num_slots, self.chunk) + self.image_hw + (3,)
        if frames_u8.shape != expected:
            raise ValueError(f"expected {expected}, got {frames_u8.shape}")
        if submitted is None:
            submitted = self._active
        scores, maps, self.states = self._step(
            self.variables, jnp.asarray(frames_u8), self.states,
            jnp.asarray(submitted, bool),
        )
        scores = np.array(scores)  # owned copy (np.asarray of a jax array is read-only)
        scores[~self._active] = np.nan
        if self.return_maps:
            return scores, np.asarray(maps)
        return scores

    def score_streams(self, streams: Dict[int, Sequence[np.ndarray]]) -> Dict[int, np.ndarray]:
        """Convenience: feed per-slot frame lists (each a chunk of frames).

        Only the submitting slots' carried state advances — attached
        streams absent from ``streams`` keep their (h, c) untouched.
        """
        batch = np.zeros((self.num_slots, self.chunk) + self.image_hw + (3,), np.uint8)
        submitted = np.zeros(self.num_slots, bool)
        for slot, frames in streams.items():
            if not self._active[slot]:
                raise RuntimeError(f"slot {slot} is not attached")
            arr = np.stack(list(frames))
            if arr.shape[0] != self.chunk:
                raise ValueError(f"slot {slot}: expected {self.chunk} frames, got {arr.shape[0]}")
            batch[slot] = arr
            submitted[slot] = True
        scores = self.score_chunk(batch, submitted=submitted)
        return {slot: scores[slot] for slot in streams}
