"""Loss tests vs a from-scratch numpy/scipy oracle.

The SSIM constants (11x11 window, sigma=1.5, C1=0.01^2, C2=0.03^2) must
match reference utils/losses.py:34-84 exactly; parity of the published
score values depends on it.
"""

import numpy as np
import pytest
from scipy.signal import convolve2d

from vad_tpu.ops.losses import combined_loss, make_loss_fn, mse_loss, ssim_loss


def numpy_ssim(pred, target, size=11, sigma=1.5):
    """Straightforward per-channel SSIM with Gaussian window, SAME padding."""
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    win = np.outer(g, g)

    def filt(img):  # img [H, W]
        return convolve2d(img, win, mode="same", boundary="fill")

    vals = []
    c1, c2 = 0.01**2, 0.03**2
    for b in range(pred.shape[0]):
        for c in range(pred.shape[-1]):
            p = pred[b, :, :, c].astype(np.float64)
            t = target[b, :, :, c].astype(np.float64)
            mp, mt = filt(p), filt(t)
            vp = filt(p * p) - mp * mp
            vt = filt(t * t) - mt * mt
            cov = filt(p * t) - mp * mt
            smap = ((2 * mp * mt + c1) * (2 * cov + c2)) / (
                (mp * mp + mt * mt + c1) * (vp + vt + c2)
            )
            vals.append(smap)
    return np.mean(vals)


@pytest.fixture
def image_pair(rng):
    a = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    b = (a + 0.1 * rng.normal(size=a.shape)).astype(np.float32)
    return a, b


def test_mse(image_pair):
    a, b = image_pair
    assert np.isclose(float(mse_loss(a, b)), np.mean((a - b) ** 2), rtol=1e-6)


def test_ssim_matches_numpy_oracle(image_pair):
    a, b = image_pair
    ours = float(ssim_loss(a, b))
    # convolve2d correlates with a flipped kernel, but the Gaussian window
    # is symmetric so convolution == correlation here.
    oracle = 1.0 - numpy_ssim(a, b)
    # f32 depthwise conv vs f64 scipy oracle: ~1e-3 relative agreement
    assert np.isclose(ours, oracle, rtol=5e-3, atol=1e-4)


def test_ssim_identity_is_zero(image_pair):
    a, _ = image_pair
    assert float(ssim_loss(a, a)) < 1e-5


def test_ssim_orders_similarity(rng, image_pair):
    a, near = image_pair
    far = rng.normal(size=a.shape).astype(np.float32)
    assert float(ssim_loss(a, near)) < float(ssim_loss(a, far))


def test_combined_is_weighted_sum(image_pair):
    a, b = image_pair
    alpha = 0.3
    expect = (1 - alpha) * float(mse_loss(a, b)) + alpha * float(ssim_loss(a, b))
    assert np.isclose(float(combined_loss(a, b, alpha=alpha)), expect, rtol=1e-6)


def test_make_loss_fn_names(image_pair):
    a, b = image_pair
    assert np.isclose(float(make_loss_fn("mse")(a, b)), float(mse_loss(a, b)))
    assert np.isclose(float(make_loss_fn("ssim")(a, b)), float(ssim_loss(a, b)))
    assert np.isclose(
        float(make_loss_fn("combined", 0.5)(a, b)), float(combined_loss(a, b, 0.5))
    )
    with pytest.raises(ValueError):
        make_loss_fn("nope")


def test_ssim_under_jit_multiple_traces(rng):
    """Regression: the cached Gaussian window must not leak tracers when
    the loss is traced more than once (different shapes -> new traces)."""
    import jax

    f = jax.jit(ssim_loss)
    a = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    b = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    first = float(f(a, b))
    c = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    second = float(jax.jit(ssim_loss)(c, c))  # new trace, same cache entry
    assert np.isfinite(first)
    assert second < 1e-5


def test_video_batch_flattening(rng):
    v1 = rng.normal(size=(1, 3, 16, 16, 3)).astype(np.float32)
    v2 = rng.normal(size=(1, 3, 16, 16, 3)).astype(np.float32)
    flat = float(ssim_loss(v1.reshape(3, 16, 16, 3), v2.reshape(3, 16, 16, 3)))
    assert np.isclose(float(ssim_loss(v1, v2)), flat, rtol=1e-6)
