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
    """

    def __init__(
        self,
        model: VideoAutoencoder,
        variables,
        num_slots: int = 8,
        chunk: int = 16,
        image_size: int = 256,
        return_maps: bool = False,
        dtype=jnp.float32,
        fused_input: Optional[bool] = None,
        mesh=None,
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
        self.return_maps = return_maps
        self.dtype = dtype
        self.mesh = mesh
        self._slot_sh = self._repl_sh = None
        if mesh is not None:
            from vad_tpu.parallel.sharding import (
                DATA_AXIS,
                batch_sharding,
                replicate_sharding,
            )

            data_n = mesh.shape[DATA_AXIS]
            if num_slots % data_n != 0:
                raise ValueError(
                    f"num_slots={num_slots} must divide evenly over the "
                    f"'{DATA_AXIS}' mesh axis of size {data_n}"
                )
            self._slot_sh = batch_sharding(mesh)
            self._repl_sh = replicate_sharding(mesh)
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
        lat = image_size // 16
        # the carried ConvLSTM state stays f32 even under a bf16 policy —
        # it integrates across the whole stream (utils/precision.py); the
        # scan path casts only the MXU conv inputs down to `dtype`.
        self._zero_state = ConvLSTM.zero_state(
            model.lstm_layers, num_slots, lat, lat, model.lstm_hidden_dim, dtype=jnp.float32
        )
        if mesh is not None:
            # carried state lives sharded over 'data' for the whole stream
            # lifetime — each chip keeps only its own slots' (h, c) in HBM
            self._zero_state = jax.tree.map(
                lambda a: jax.device_put(a, self._slot_sh), self._zero_state
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
            state_sh = jax.tree.map(lambda _: self._slot_sh, self._zero_state)
            kwargs["in_shardings"] = (
                self._repl_sh,   # variables
                self._slot_sh,   # frames [S, T, H, W, 3]
                state_sh,        # carried (h, c) per layer [S, h, w, C]
                self._slot_sh,   # submitted mask [S]
            )
            kwargs["out_shardings"] = (
                self._slot_sh,                               # scores [S, T]
                self._slot_sh if return_maps else None,      # error maps
                state_sh,
            )
        self._step = jax.jit(step, **kwargs)

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
            if self._slot_sh is not None:
                # re-pin: the out-of-jit update must not drift the carried
                # state off its 'data'-axis layout between steps
                h2 = jax.device_put(h2, self._slot_sh)
                c2 = jax.device_put(c2, self._slot_sh)
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
        if frames_u8.shape != (self.num_slots, self.chunk, self.image_size, self.image_size, 3):
            raise ValueError(
                f"expected {(self.num_slots, self.chunk, self.image_size, self.image_size, 3)}, "
                f"got {frames_u8.shape}"
            )
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
        batch = np.zeros(
            (self.num_slots, self.chunk, self.image_size, self.image_size, 3), np.uint8
        )
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
