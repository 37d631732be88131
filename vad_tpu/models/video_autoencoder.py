"""ConvLSTM video autoencoder for temporal anomaly detection (Flax / NHWC).

Capability parity with reference models/video_autoencoder.py (2,709,411
params at defaults), re-designed for TPU:

- The reference iterates Python loops over layers AND timesteps, invoking a
  fresh concat+conv per step (video_autoencoder.py:153-167).  Here the time
  loop is `lax.scan`, and the gate convolution is algebraically split into
  conv(x, Wx) + conv(h, Wh): the input half is precomputed for ALL frames
  as one large batched convolution (pure MXU work, parallel over B*T)
  before the scan, so the sequential recurrence only carries the small
  hidden-state convolution.
- The recurrence itself has two interchangeable backends over the *same*
  parameters: an XLA `lax.scan` (used for training / autodiff) and a fused
  Pallas TPU kernel that keeps (h, c) resident in VMEM across timesteps
  (used on the scoring path; see vad_tpu/ops/convlstm_pallas.py).
- Frames flow through the 2D encoder/decoder as one [B*T, H, W, C] batch —
  the reference's reshape trick (video_autoencoder.py:222-229), which is
  already the right shape for the MXU.

Gate math parity (video_autoencoder.py:67-83): gates split in (i, f, g, o)
order; c' = sigmoid(f)*c + sigmoid(i)*tanh(g); h' = sigmoid(o)*tanh(c').
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vad_tpu.models.norms import make_norm

conv_init = nn.initializers.xavier_normal()


def convlstm_step(
    gates_x_t: jnp.ndarray,
    h: jnp.ndarray,
    c: jnp.ndarray,
    w_h: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One ConvLSTM update given the precomputed input contribution.

    Args:
        gates_x_t: conv(x_t, Wx) + bias, [B, H, W, 4*hidden].
        h, c: previous hidden / cell state, [B, H, W, hidden].
        w_h: hidden-to-gates conv kernel, [k, k, hidden, 4*hidden].

    Returns:
        (h_next, c_next).  Matches reference video_autoencoder.py:67-83.

    Precision: the convolution runs in the kernel's dtype (bf16 on the MXU
    under the serving policy), but the gate math and state update run in
    the carry's dtype — callers keep (h, c) in f32 so the cell state never
    accumulates bf16 rounding across long streams (utils/precision.py).
    """
    gates = gates_x_t + jax.lax.conv_general_dilated(
        h.astype(w_h.dtype), w_h, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    i, f, g, o = jnp.split(gates.astype(c.dtype), 4, axis=-1)
    c_next = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_next = jax.nn.sigmoid(o) * jnp.tanh(c_next)
    return h_next, c_next


class ConvLSTMCell(nn.Module):
    """Single ConvLSTM cell (step-at-a-time API, for streaming inference).

    Holds one fused gate convolution over concat([x, h]) producing
    4*hidden channels, like reference video_autoencoder.py:24-91 — but the
    kernel is stored once and shared with the scan/Pallas layer paths.
    """

    input_dim: int
    hidden_dim: int
    kernel_size: int = 3

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k = self.kernel_size
        kernel = self.param(
            "kernel", conv_init, (k, k, self.input_dim + self.hidden_dim, 4 * self.hidden_dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (4 * self.hidden_dim,))
        h, c = state
        w_x = kernel[:, :, : self.input_dim, :]
        w_h = kernel[:, :, self.input_dim :, :]
        gates_x = (
            jax.lax.conv_general_dilated(
                x, w_x, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            + bias
        )
        return convlstm_step(gates_x, h, c, w_h)

    @staticmethod
    def init_state(batch: int, height: int, width: int, hidden_dim: int, dtype=jnp.float32):
        shape = (batch, height, width, hidden_dim)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


class ConvLSTMLayer(nn.Module):
    """One ConvLSTM layer scanned over the full time axis.

    ``backend='xla'`` runs the recurrence as `lax.scan` (autodiff-friendly,
    used in training).  ``backend='pallas'`` dispatches to the fused VMEM-
    resident TPU kernel over identical parameters (scoring path).
    """

    input_dim: int
    hidden_dim: int
    kernel_size: int = 3
    backend: str = "xla"
    remat: bool = False

    @nn.compact
    def __call__(self, x_seq: jnp.ndarray, initial_state=None, return_state: bool = False):
        """[B, T, H, W, input_dim] -> [B, T, H, W, hidden_dim].

        ``initial_state``: optional (h, c) carried across chunks for
        streaming inference; defaults to zeros.  With ``return_state`` the
        final (h, c) is returned alongside the hidden sequence.
        ``remat`` recomputes each step's activations in the backward pass
        (constant activation memory in T — the reference manages long-
        sequence memory by telling the user to shrink T, README.md:282-286).
        """
        b, t, hgt, wid, _ = x_seq.shape
        k = self.kernel_size
        kernel = self.param(
            "kernel", conv_init, (k, k, self.input_dim + self.hidden_dim, 4 * self.hidden_dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (4 * self.hidden_dim,))
        w_x = kernel[:, :, : self.input_dim, :]
        w_h = kernel[:, :, self.input_dim :, :]

        # Input contribution for every frame in one large batched conv —
        # MXU-parallel over B*T, hoisted out of the sequential recurrence.
        flat = x_seq.reshape(b * t, hgt, wid, self.input_dim)
        gates_x = (
            jax.lax.conv_general_dilated(
                flat, w_x, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            + bias
        ).reshape(b, t, hgt, wid, 4 * self.hidden_dim)

        if self.backend == "pallas":
            from vad_tpu.ops.convlstm_pallas import convlstm_recurrence_pallas

            # state enters and leaves in f32 even under a bf16 policy (the
            # kernel keeps (h, c) in f32 scratch and emits f32 finals), so
            # streaming chunks carry cell state without boundary rounding —
            # mirroring the scan path below.
            if initial_state is None:
                h0 = jnp.zeros((b, hgt, wid, self.hidden_dim), jnp.float32)
                c0 = jnp.zeros_like(h0)
            else:
                h0, c0 = (s.astype(jnp.float32) for s in initial_state)
            h_seq, final = convlstm_recurrence_pallas(gates_x, w_h, h0, c0)
            return (h_seq, final) if return_state else h_seq

        # The scan carry (h, c) stays f32 even under a bf16 policy: the cell
        # state integrates across the whole stream and would otherwise
        # accumulate bf16 rounding (utils/precision.py).  Only the per-step
        # hidden conv input and the emitted sequence are cast down.
        if initial_state is None:
            h0 = jnp.zeros((b, hgt, wid, self.hidden_dim), jnp.float32)
            c0 = jnp.zeros_like(h0)
        else:
            h0, c0 = (s.astype(jnp.float32) for s in initial_state)
        out_dtype = x_seq.dtype

        def step(carry, gates_x_t):
            h, c = carry
            h, c = convlstm_step(gates_x_t, h, c, w_h)
            return (h, c), h.astype(out_dtype)

        if self.remat:
            step = jax.checkpoint(step)

        # Scan over time (axis moved to leading): constant memory per step.
        final, h_seq = jax.lax.scan(step, (h0, c0), jnp.moveaxis(gates_x, 1, 0))
        out = jnp.moveaxis(h_seq, 0, 1)
        return (out, final) if return_state else out


class ConvLSTM(nn.Module):
    """Stack of ConvLSTM layers (reference video_autoencoder.py:94-179).

    Returns the last layer's full hidden sequence, matching the reference's
    ``return_all_layers=False`` default.
    """

    input_dim: int
    hidden_dim: int = 128
    num_layers: int = 2
    kernel_size: int = 3
    backend: str = "xla"
    remat: bool = False

    @nn.compact
    def __call__(self, x_seq: jnp.ndarray, initial_states=None, return_state: bool = False):
        """initial_states: optional tuple of per-layer (h, c) for streaming."""
        finals = []
        for i in range(self.num_layers):
            in_dim = self.input_dim if i == 0 else self.hidden_dim
            layer = ConvLSTMLayer(
                in_dim, self.hidden_dim, self.kernel_size,
                backend=self.backend, remat=self.remat,
            )
            init = initial_states[i] if initial_states is not None else None
            if return_state:
                x_seq, final = layer(x_seq, init, return_state=True)
                finals.append(final)
            else:
                x_seq = layer(x_seq, init)
        return (x_seq, tuple(finals)) if return_state else x_seq

    @staticmethod
    def zero_state(num_layers, batch, height, width, hidden_dim, dtype=jnp.float32):
        shape = (batch, height, width, hidden_dim)
        return tuple(
            (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)) for _ in range(num_layers)
        )


class VideoEncoder(nn.Module):
    """Per-frame spatial encoder: 4x (Conv3x3+BN+LeakyReLU+MaxPool).

    Channels 3->32->64->128->latent, spatial /16 total (reference
    video_autoencoder.py:182-231).  Accepts [B, H, W, C] or [B, T, H, W, C];
    sequences are flattened to one [B*T, ...] batch.
    """

    latent_dim: int = 128
    norm: str = "batch"
    stem: str = "pool"  # 'stride2': downsample in the conv, no max-pool

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        *,
        skip_first_block: bool = False,
        return_pyramid: bool = False,
    ):
        """``skip_first_block``: ``x`` is already the first block's pooled
        32-channel output (produced by the fused Pallas input kernel,
        ops/encoder_pallas.py) — run blocks 2-4 only.  Module names are
        pinned explicitly so both entry points address the same params.
        Only meaningful with the 'pool' stem (the fused kernel computes
        conv1+pool); stream_step_u8 asserts this.

        ``return_pyramid``: also return every block's pooled output (the
        multi-scale per-frame feature maps the latent-distance scorer
        fits on — eval/latent_score.py); parameters unchanged."""
        pyramid = []
        seq_shape = None
        if x.ndim == 5:
            b, t = x.shape[:2]
            seq_shape = (b, t)
            x = x.reshape(b * t, *x.shape[2:])
        strides = (2, 2) if self.stem == "stride2" else (1, 1)
        for i, w in enumerate((32, 64, 128, self.latent_dim)):
            if i == 0 and skip_first_block:
                continue
            x = nn.Conv(
                w, (3, 3), strides=strides, padding="SAME",
                kernel_init=conv_init, name=f"Conv_{i}",
            )(x)
            norm_name = ("BatchNorm" if self.norm == "batch" else "GroupNorm") + f"_{i}"
            x = make_norm(self.norm, train, name=norm_name)(x)
            if self.stem == "pool":
                # pool before the activation: LeakyReLU(0.2) is strictly
                # monotone, so 2x2 max-pool commutes with it bitwise
                # (identical outputs/gradients/checkpoints) and the activation
                # runs on 1/4 the pixels; end-to-end neutral (XLA fuses the
                # mask either way), kept as strictly-less-work — see
                # models/autoencoder.py EncoderBlock and tools/profile_train.py
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.leaky_relu(x, negative_slope=0.2)
            pyramid.append(x)
        if seq_shape is not None:
            x = x.reshape(*seq_shape, *x.shape[1:])
            pyramid = [f.reshape(*seq_shape, *f.shape[1:]) for f in pyramid]
        if return_pyramid:
            return x, tuple(pyramid)
        return x


class VideoDecoder(nn.Module):
    """Per-frame decoder: 4x ConvTranspose(2x2, stride 2), tanh output.

    Channels latent->128->64->32->out (reference
    video_autoencoder.py:234-276).
    """

    out_channels: int = 3
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        seq_shape = None
        if x.ndim == 5:
            b, t = x.shape[:2]
            seq_shape = (b, t)
            x = x.reshape(b * t, *x.shape[2:])
        for w in (128, 64, 32):
            x = nn.ConvTranspose(w, (2, 2), strides=(2, 2), padding="VALID", kernel_init=conv_init)(x)
            x = make_norm(self.norm, train)(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.out_channels, (2, 2), strides=(2, 2), padding="VALID", kernel_init=conv_init
        )(x)
        x = jnp.tanh(x)
        if seq_shape is not None:
            x = x.reshape(*seq_shape, *x.shape[1:])
        return x


class VideoAutoencoder(nn.Module):
    """Encoder -> ConvLSTM -> (1x1 projection) -> Decoder.

    API parity with reference video_autoencoder.py:279-384; the 1x1
    projection only exists when lstm_hidden_dim != latent_dim, exactly like
    the reference's Identity fallback (video_autoencoder.py:311-312).
    """

    in_channels: int = 3
    latent_dim: int = 128
    lstm_hidden_dim: int = 128
    lstm_layers: int = 2
    backend: str = "xla"
    remat: bool = False
    norm: str = "batch"  # 'group' = per-sample stats (models/norms.py)
    stem: str = "pool"  # 'stride2': see VideoEncoder (decoder unchanged)

    def setup(self) -> None:
        self.encoder = VideoEncoder(self.latent_dim, self.norm, self.stem)
        self.convlstm = ConvLSTM(
            input_dim=self.latent_dim,
            hidden_dim=self.lstm_hidden_dim,
            num_layers=self.lstm_layers,
            backend=self.backend,
            remat=self.remat,
        )
        if self.lstm_hidden_dim != self.latent_dim:
            self.proj = nn.Conv(self.latent_dim, (1, 1), kernel_init=conv_init)
        self.decoder = VideoDecoder(self.in_channels, self.norm)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """[B, T, H, W, C] -> reconstructed [B, T, H, W, C]."""
        z = self.encoder(x, train)
        z = self.convlstm(z)
        if self.lstm_hidden_dim != self.latent_dim:
            z = self.proj(z)  # 1x1 conv; flax Conv handles the [B, T] batch dims
        return self.decoder(z, train)

    def feature_pyramid(self, x: jnp.ndarray):
        """Per-block encoder feature maps (inference mode).

        Accepts frames [N, H, W, C] or windows [B, T, H, W, C]; returns a
        coarse-to-fine tuple of per-frame maps with the matching leading
        dims.  Input to the latent-distance scorer (eval/latent_score.py)
        — purely spatial, the ConvLSTM plays no role in that scorer."""
        _, pyramid = self.encoder(x, False, return_pyramid=True)
        return pyramid

    def temporal_features(self, x: jnp.ndarray):
        """Per-frame ConvLSTM hidden maps, 1-level pyramid of
        [B, T, h, w, hidden] (inference mode).

        Motion-context features for the temporal latent scorer
        (eval/latent_score.py): h_t integrates the window's history, so
        motion that contradicts it (e.g. a patch scrolling against the
        global flow) pushes h_t off the normal-state manifold even when
        every individual frame is a plausible appearance — the case
        where per-frame scorers (recon, latent) sit at chance by
        construction (data/synthetic.py textured_video)."""
        z = self.encoder(x, False)
        return (self.convlstm(z),)

    def stream_step(self, x: jnp.ndarray, states):
        """Streaming chunk inference carrying ConvLSTM state across calls.

        Args:
            x: chunk [B, T_chunk, H, W, C].
            states: per-layer (h, c) tuple from the previous chunk (use
                ConvLSTM.zero_state for the first).

        Returns:
            (recon, error_map [B,T,H,W], frame_scores [B,T], new_states).

        This is the long-video scoring path: each frame is encoded, scored,
        and decoded exactly once — unlike overlapping-window scoring which
        redoes the work sequence_length times (reference
        evaluate_video.py:309-404 with stride=1; SURVEY §3.4 note).
        """
        z = self.encoder(x, False)
        z, new_states = self.convlstm(z, initial_states=states, return_state=True)
        if self.lstm_hidden_dim != self.latent_dim:
            z = self.proj(z)
        recon = self.decoder(z, False)
        err = jnp.mean(jnp.square(x - recon), axis=-1)
        return recon, err, jnp.mean(err, axis=(2, 3)), new_states

    def stream_step_u8(
        self,
        u8_flat: jnp.ndarray,
        states,
        w_band: jnp.ndarray,
        bias_folded: jnp.ndarray,
        compute_err_map: bool = True,
    ):
        """``stream_step`` on RAW interleaved-RGB bytes (serving fast path).

        Args:
            u8_flat: [B, T, H, W*3] uint8 — NHWC frame bytes viewed flat
                (``arr.reshape(B, T, H, W*3)``, no data movement).  The
                flat view keeps every tensor 128-lane-aligned: a
                materialized [..., 3] tensor costs 42x its logical size
                in HBM traffic on TPU.
            states: per-layer (h, c) as in ``stream_step``.
            w_band, bias_folded: first-block weights from
                ops/encoder_pallas.fold_first_block_params(...) — input
                normalization + conv1 + BatchNorm folded together.
            compute_err_map: when False, the per-pixel error map output
                is None (saves one full-frame pass when only frame
                scores are consumed, e.g. bench.py).

        Returns (recon_flat [B,T,H,W*3], err_map or None, frame_scores,
        new_states); scores match ``stream_step`` to bf16 tolerance.
        """
        from vad_tpu.ops.encoder_pallas import fused_first_block

        if self.stem != "pool":
            raise ValueError(
                "stream_step_u8's fused input kernel computes conv1+max-pool; "
                "the stride2 stem has no pool (use stream_step — its first "
                "conv is already stride 2 and never materializes full res)"
            )
        b, t, h, w3 = u8_flat.shape
        dtype = w_band.dtype if jnp.issubdtype(w_band.dtype, jnp.floating) else jnp.float32
        z1 = fused_first_block(
            u8_flat.reshape(b * t, h, w3), w_band, bias_folded, out_dtype=dtype
        )
        z = self.encoder(
            z1.reshape(b, t, *z1.shape[1:]), False, skip_first_block=True
        )
        z, new_states = self.convlstm(z, initial_states=states, return_state=True)
        if self.lstm_hidden_dim != self.latent_dim:
            z = self.proj(z)
        recon = self.decoder(z, False)
        xf = u8_flat.astype(dtype) / jnp.asarray(127.5, dtype) - jnp.asarray(1.0, dtype)
        rf = recon.reshape(b, t, h, w3)
        sq = jnp.square(xf - rf)
        frame_scores = jnp.mean(sq, axis=(2, 3))  # mean over H, W*3 == frame mean
        err = None
        if compute_err_map:
            err = jnp.mean(sq.reshape(b, t, h, w3 // 3, 3), axis=-1)
        return rf, err, frame_scores, new_states

    def stream_step_fast(self, x: jnp.ndarray, states, folded, compute_err_map: bool = True):
        """``stream_step`` with the decoder run as folded quadtree matmuls.

        The ConvTranspose(2x2, s2) decoder is mathematically four dense
        per-pixel matmuls (ops/decoder_fast.py); ``folded`` comes from
        ``fold_decoder_params(variables)`` (inference BatchNorm baked in,
        so norm='batch' models only).  Frame scores are computed in
        quadtree row order and match ``stream_step`` to bf16 tolerance.

        MEASURED 39%% SLOWER than ``stream_step`` end-to-end on v5e
        (11.2k vs 18.3k frames/s — see ops/decoder_fast.py for the
        layout-level attribution); kept as a tested engineering record,
        not used by the serving path.

        Returns (recon_quadtree [B*T*H*W, C], err_map or None,
        frame_scores [B, T], new_states); convert recon with
        ``decoder_fast.raster_from_quadtree`` when full frames are needed.
        """
        from vad_tpu.ops.decoder_fast import (
            decode_quadtree,
            quadtree_view,
            raster_from_quadtree,
        )

        z = self.encoder(x, False)
        z, new_states = self.convlstm(z, initial_states=states, return_state=True)
        if self.lstm_hidden_dim != self.latent_dim:
            z = self.proj(z)
        recon_q = decode_quadtree(z, folded)
        b, t, h, w, _ = x.shape
        xq = quadtree_view(x)
        pix = jnp.mean(jnp.square(xq - recon_q.astype(xq.dtype)), axis=-1)
        frame_scores = jnp.mean(pix.reshape(b, t, -1), axis=-1)
        err = None
        if compute_err_map:
            err = raster_from_quadtree(pix[:, None], (b, t), h, w)[..., 0]
        return recon_q, err, frame_scores, new_states

    def error_map(self, x: jnp.ndarray) -> jnp.ndarray:
        """Per-pixel, per-frame anomaly map [B, T, H, W]."""
        recon = self(x, train=False)
        return jnp.mean(jnp.square(x - recon), axis=-1)

    def prediction_error(
        self, x: jnp.ndarray, per_frame: bool = False, per_pixel: bool = False
    ) -> jnp.ndarray:
        """Future-frame prediction error (beyond-reference objective).

        The ConvLSTM is causal, so output t is a function of frames <= t;
        pairing it against frame t+1 scores how predictable the NEXT frame
        is — sensitive to purely temporal anomalies (e.g. frozen motion)
        that reconstruction barely penalizes.  Shapes: [B], [B, T-1], or
        [B, T-1, H, W]; scores align to frames 1..T-1 of the window.
        """
        recon = self(x, train=False)
        err = jnp.mean(jnp.square(x[:, 1:] - recon[:, :-1]), axis=-1)
        if per_pixel:
            return err
        if per_frame:
            return jnp.mean(err, axis=(2, 3))
        return jnp.mean(err, axis=(1, 2, 3))

    def reconstruction_error(
        self, x: jnp.ndarray, per_frame: bool = False, per_pixel: bool = False
    ) -> jnp.ndarray:
        """Anomaly scores at sequence [B], frame [B, T], or pixel [B, T, H, W]
        granularity — reduction order per reference
        video_autoencoder.py:356-384."""
        err = self.error_map(x)
        if per_pixel:
            return err
        if per_frame:
            return jnp.mean(err, axis=(2, 3))
        return jnp.mean(err, axis=(1, 2, 3))


if __name__ == "__main__":
    # smoke check mirroring reference video_autoencoder.py:388-413
    import jax
    import numpy as np

    model = VideoAutoencoder()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, 256, 256, 3)), train=False)
    total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    print(f"Total parameters: {total:,}")
    x = jnp.zeros((2, 16, 256, 256, 3))
    print("Input shape:", x.shape)
    print("Output shape:", model.apply(variables, x, train=False).shape)
    for kwargs, name in (
        ({}, "Sequence"),
        ({"per_frame": True}, "Per-frame"),
        ({"per_pixel": True}, "Per-pixel"),
    ):
        e = model.apply(variables, x, method=VideoAutoencoder.reconstruction_error, **kwargs)
        print(f"{name} error shape:", e.shape)
