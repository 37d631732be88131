"""Reconstruction losses: MSE, SSIM, and their weighted combination.

Functional JAX equivalents of reference utils/losses.py with identical
constants: 11x11 Gaussian window with sigma=1.5, C1=0.01^2, C2=0.03^2
(losses.py:34-49, 83-84).  SSIM's local statistics are depthwise
convolutions, which map 1:1 onto `lax.conv_general_dilated` with
``feature_group_count=C`` — XLA fuses the surrounding elementwise algebra.

All functions take NHWC (or [B, T, H, W, C], flattened internally) arrays
in the framework's [-1, 1] range and return scalar losses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _gaussian_window(size: int, sigma: float):
    """Normalized 2D Gaussian [size, size] (outer product of 1D).

    Returns host numpy: caching a traced jnp value would leak tracers
    across jit scopes (it did — a jitted combined-loss train step used a
    stale tracer from its first trace).
    """
    import numpy as np

    coords = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / np.sum(g)
    return np.outer(g, g)


def _flatten_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim == 5:  # [B, T, H, W, C] video batches
        return x.reshape(-1, *x.shape[2:])
    return x


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over all elements."""
    return jnp.mean(jnp.square(pred - target))


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM map between two NHWC batches.

    Local means/variances/covariance via Gaussian-weighted depthwise conv
    with SAME padding, then the standard SSIM ratio (reference
    losses.py:70-90).
    """
    pred = _flatten_to_nhwc(pred)
    target = _flatten_to_nhwc(target)
    channels = pred.shape[-1]
    # Depthwise kernel [k, k, 1, C] with feature_group_count=C.
    win = jnp.asarray(_gaussian_window(window_size, sigma), pred.dtype)
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, channels))

    conv = functools.partial(
        jax.lax.conv_general_dilated,
        rhs=kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
    )

    mu_p = conv(pred)
    mu_t = conv(target)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t

    var_p = conv(pred * pred) - mu_pp
    var_t = conv(target * target) - mu_tt
    cov = conv(pred * target) - mu_pt

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2.0 * mu_pt + c1) * (2.0 * cov + c2)) / (
        (mu_pp + mu_tt + c1) * (var_p + var_t + c2)
    )
    return jnp.mean(ssim_map)


def ssim_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """1 - SSIM, so lower is better (reference losses.py:93)."""
    return 1.0 - ssim(pred, target, window_size, sigma)


def combined_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    alpha: float = 0.5,
    window_size: int = 11,
) -> jnp.ndarray:
    """(1-alpha)*MSE + alpha*SSIM-loss (reference losses.py:96-121)."""
    return (1.0 - alpha) * mse_loss(pred, target) + alpha * ssim_loss(
        pred, target, window_size
    )


def mse_per_sample(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-sample MSE [B]; mean(mse_per_sample) == mse_loss."""
    d = jnp.square(pred - target)
    return jnp.mean(d.reshape(d.shape[0], -1), axis=1)


def ssim_per_sample(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Per-sample SSIM loss [B] (1 - mean SSIM map per sample).

    The batch SSIM map mean equals the mean of per-sample map means when
    all samples share a shape, so mean(ssim_per_sample) == ssim_loss —
    used for exact masked aggregation over padded eval batches.
    """

    def one(p, t):
        return 1.0 - ssim(p[None], t[None], window_size, sigma)

    if pred.ndim == 5:  # [B, T, H, W, C]: treat frames of one sample jointly
        def one_video(p, t):
            return 1.0 - ssim(p, t, window_size, sigma)

        return jax.vmap(one_video)(pred, target)
    return jax.vmap(one)(pred, target)


def combined_per_sample(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    alpha: float = 0.5,
    window_size: int = 11,
) -> jnp.ndarray:
    return (1.0 - alpha) * mse_per_sample(pred, target) + alpha * ssim_per_sample(
        pred, target, window_size
    )


def make_per_sample_loss_fn(name: str, ssim_weight: float = 0.5):
    """Per-sample variant of make_loss_fn, for masked eval aggregation."""
    if name == "mse":
        return mse_per_sample
    if name == "ssim":
        return ssim_per_sample
    if name == "combined":
        return functools.partial(combined_per_sample, alpha=ssim_weight)
    raise ValueError(f"unknown loss '{name}' (expected mse|ssim|combined)")


def make_loss_fn(name: str, ssim_weight: float = 0.5):
    """Resolve a loss by CLI name {mse, ssim, combined} (reference
    train.py:149-158)."""
    if name == "mse":
        return mse_loss
    if name == "ssim":
        return ssim_loss
    if name == "combined":
        return functools.partial(combined_loss, alpha=ssim_weight)
    raise ValueError(f"unknown loss '{name}' (expected mse|ssim|combined)")


if __name__ == "__main__":
    # smoke check mirroring reference losses.py:125-138
    import numpy as np

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.normal(size=(4, 256, 256, 3)), jnp.float32)
    img2 = img1 + 0.1 * jnp.asarray(rng.normal(size=img1.shape), jnp.float32)
    img3 = jnp.asarray(rng.normal(size=img1.shape), jnp.float32)
    print("SSIM Loss (similar images):", float(ssim_loss(img1, img2)))
    print("SSIM Loss (different images):", float(ssim_loss(img1, img3)))
    print("Combined Loss (similar):", float(combined_loss(img1, img2)))
    print("Combined Loss (different):", float(combined_loss(img1, img3)))
