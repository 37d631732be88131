"""Convolutional autoencoder for image anomaly detection (Flax / NHWC).

Capability parity with reference models/autoencoder.py (1,546,147 params at
defaults), designed TPU-first rather than translated:

- NHWC activation layout (TPU-preferred); callers at the numpy boundary
  work in HWC images directly, no NCHW transposes on device.
- BatchNorm via Flax ``batch_stats`` collection with explicit
  train/inference switching (reference relies on nn.Module.train()/eval()).
- Scoring (`reconstruction_error`) reproduces the reference's reduction
  order exactly: squared error, mean over channels first, then optional
  spatial mean (reference autoencoder.py:199-221) — the published score
  values and the 0.004 UI threshold depend on it.

The model is trained only on normal images; anomalies score high because
the decoder never learned to reproduce them.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from vad_tpu.models.norms import make_norm

# Xavier/Glorot normal for conv kernels, zeros for bias — matches the
# reference init policy (autoencoder.py:170-179).  JAX computes conv fan-in
# as in_channels * receptive_field, same as torch.
conv_init = nn.initializers.xavier_normal()


class EncoderBlock(nn.Module):
    """Two Conv3x3+BN+LeakyReLU(0.2) stages followed by 2x2 max-pool.

    One block halves the spatial dims (reference autoencoder.py:38-79).

    ``stem='stride2'`` is the TPU-first downsampling variant: the FIRST
    conv runs with stride 2 and the max-pool disappears.  Same parameter
    shapes and count (both convs stay 3x3 at the same widths), same
    output shape — but the full-resolution intermediate is never
    materialized.  The round-3 profiles pinned both measured training/
    serving floors to exactly that tensor: block1's 6.18 ms forward is a
    256²x32 padded-layout materialization cost and the 5.7 ms max-pool
    backward sits at select-and-scatter parity; a stride-2 stem removes
    both by construction (COMPONENTS.md round-4 table has the measured
    result).  Opt-in (``--stem stride2``) because it is a different
    function: checkpoints record it and are NOT interchangeable with the
    pool variant.
    """

    features: int
    norm: str = "batch"
    stem: str = "pool"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        first_strides = (2, 2) if self.stem == "stride2" else (1, 1)
        x = nn.Conv(
            self.features, (3, 3), strides=first_strides, padding="SAME",
            kernel_init=conv_init,
        )(x)
        x = make_norm(self.norm, train)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(self.features, (3, 3), padding="SAME", kernel_init=conv_init)(x)
        x = make_norm(self.norm, train)(x)
        if self.stem == "stride2":
            return nn.leaky_relu(x, negative_slope=0.2)
        # pool BEFORE the activation: LeakyReLU(0.2) is strictly monotone,
        # so max-pool commutes with it bitwise — identical outputs,
        # gradients and checkpoints — and the activation then runs on 1/4
        # the pixels.  Measured end-to-end NEUTRAL on the training step
        # (tools/profile_train.py: 31.2 ms either way — XLA fuses the
        # activation and its backward mask into the neighbors in both
        # orders); kept because it is strictly less work and free.
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return nn.leaky_relu(x, negative_slope=0.2)


class Encoder(nn.Module):
    """256x256x3 -> 16x16xlatent feature pyramid.

    Channels 3->32->64->128->latent, spatial /2 per block
    (reference autoencoder.py:24-86).
    """

    latent_dim: int = 256
    norm: str = "batch"
    stem: str = "pool"  # 'stride2': downsample in the first conv (TPU-first)

    @property
    def widths(self) -> Sequence[int]:
        return (32, 64, 128, self.latent_dim)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, *, return_pyramid: bool = False
    ):
        """``return_pyramid``: also return every block's pooled output
        (the multi-scale feature maps the latent-distance scorer fits its
        per-position Gaussians on — eval/latent_score.py).  Purely an
        extra output; parameters and the default path are unchanged."""
        pyramid = []
        for w in self.widths:
            x = EncoderBlock(w, self.norm, self.stem)(x, train)
            pyramid.append(x)
        if return_pyramid:
            return x, tuple(pyramid)
        return x


class DecoderBlock(nn.Module):
    """ConvTranspose(2x2, stride 2) upsample + Conv3x3 refine, BN+ReLU.

    Mirrors reference autoencoder.py:103-130.
    """

    features: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.ConvTranspose(
            self.features, (2, 2), strides=(2, 2), padding="VALID", kernel_init=conv_init
        )(x)
        x = make_norm(self.norm, train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", kernel_init=conv_init)(x)
        x = make_norm(self.norm, train)(x)
        return nn.relu(x)


class Decoder(nn.Module):
    """16x16xlatent -> 256x256xC reconstruction; tanh output in [-1, 1].

    Channel schedule latent->128->64->32->(32->C) with a final
    upsample+conv+tanh block (reference autoencoder.py:89-146).  The tanh
    matches the [-1, 1] input normalization contract (SURVEY §2.2).
    """

    out_channels: int = 3
    latent_dim: int = 256
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for w in (128, 64, 32):
            x = DecoderBlock(w, self.norm)(x, train)
        # Final block: upsample to full resolution, project to image
        # channels, squash to the input range.
        x = nn.ConvTranspose(32, (2, 2), strides=(2, 2), padding="VALID", kernel_init=conv_init)(x)
        x = make_norm(self.norm, train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", kernel_init=conv_init)(x)
        return jnp.tanh(x)


class ConvAutoencoder(nn.Module):
    """Encoder∘Decoder with anomaly scoring.

    API parity with reference autoencoder.py:149-221 (`forward`,
    `get_latent`, `get_reconstruction_error`) via ``method=`` apply calls:
    ``model.apply(vars, x, method=ConvAutoencoder.reconstruction_error)``.
    """

    in_channels: int = 3
    latent_dim: int = 256
    norm: str = "batch"  # 'group' = per-sample stats (models/norms.py)
    stem: str = "pool"  # 'stride2': see EncoderBlock (decoder unchanged)

    def setup(self) -> None:
        self.encoder = Encoder(self.latent_dim, self.norm, self.stem)
        self.decoder = Decoder(self.in_channels, self.latent_dim, self.norm)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.decoder(self.encoder(x, train), train)

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Latent representation without decoding."""
        return self.encoder(x, train)

    def feature_pyramid(self, x: jnp.ndarray):
        """Per-block encoder feature maps (inference mode), coarse-to-fine
        tuple of [B, H/2^k, W/2^k, C_k] — input to the latent-distance
        scorer (eval/latent_score.py)."""
        _, pyramid = self.encoder(x, train=False, return_pyramid=True)
        return pyramid

    def error_map(self, x: jnp.ndarray) -> jnp.ndarray:
        """Per-pixel anomaly map [B, H, W]: channel-mean squared error."""
        recon = self(x, train=False)
        return jnp.mean(jnp.square(x - recon), axis=-1)

    def reconstruction_error(self, x: jnp.ndarray, per_pixel: bool = False) -> jnp.ndarray:
        """Anomaly score: [B, H, W] map if per_pixel else [B] scalars.

        Channel-mean first, then spatial mean — the reference's exact
        reduction order (autoencoder.py:211-221).
        """
        err = self.error_map(x)
        if per_pixel:
            return err
        return jnp.mean(err, axis=(1, 2))


if __name__ == "__main__":
    # smoke check: param count + forward/error shapes (the reference keeps
    # the same kind of runnable block at autoencoder.py:225-242)
    import jax
    import numpy as np

    model = ConvAutoencoder()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)), train=False)
    total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    print(f"Total parameters: {total:,}")
    x = jnp.zeros((4, 256, 256, 3))
    print("Input shape:", x.shape)
    print("Output shape:", model.apply(variables, x, train=False).shape)
    emap = model.apply(variables, x, per_pixel=True, method=ConvAutoencoder.reconstruction_error)
    esc = model.apply(variables, x, method=ConvAutoencoder.reconstruction_error)
    print("Error map shape:", emap.shape)
    print("Error scalar shape:", esc.shape)
