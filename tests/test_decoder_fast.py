"""Matmul (quadtree) decoder equivalence vs the Flax VideoDecoder.

Reference anchor: video_autoencoder.py:234-276 (the ConvTranspose
decoder this reformulates).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vad_tpu.models.video_autoencoder import VideoAutoencoder, VideoDecoder
from vad_tpu.ops.decoder_fast import (
    decode_quadtree,
    fold_decoder_params,
    quadtree_view,
    raster_from_quadtree,
)


def _randomized_model(seed=0, h=64, norm="batch"):
    """VideoAutoencoder variables with non-trivial BN stats so the fold
    is actually exercised (init stats are identity)."""
    rng = np.random.default_rng(seed)
    model = VideoAutoencoder(norm=norm)
    variables = model.init(jax.random.key(seed), jnp.zeros((1, 2, h, h, 3)), train=False)
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape).astype(np.float32) * 0.3),
        variables,
    )
    if "batch_stats" in variables:
        variables["batch_stats"] = jax.tree_util.tree_map(
            lambda a: jnp.abs(a) + 0.1, variables["batch_stats"]
        )
    return model, variables


def test_matches_flax_decoder():
    model, variables = _randomized_model()
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((3, 4, 4, 128)).astype(np.float32))

    ref = model.apply(
        variables, z, False, method=lambda m, z, train: m.decoder(z, train)
    )  # [3, 64, 64, 3]
    folded = fold_decoder_params(variables, dtype=jnp.float32)
    got_q = decode_quadtree(z, folded)

    # quadtree rows must equal the quadtree view of the raster reference
    ref_q = quadtree_view(ref)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q), atol=2e-5)

    # and the raster round-trip must reproduce the reference exactly
    got_r = raster_from_quadtree(got_q, (3,), 64, 64)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref), atol=2e-5)


def test_quadtree_view_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 5, 32, 32, 3)).astype(np.float32))
    q = quadtree_view(x)
    assert q.shape == (2 * 5 * 32 * 32, 3)
    back = raster_from_quadtree(q, (2, 5), 32, 32)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_frame_scores_order_invariant():
    """Frame-mean scores computed in quadtree order equal raster order."""
    model, variables = _randomized_model(h=32)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 3, 32, 32, 3)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((2 * 3, 2, 2, 128)).astype(np.float32))

    folded = fold_decoder_params(variables, dtype=jnp.float32)
    recon_q = decode_quadtree(z, folded)  # [2*3*32*32, 3]
    recon_r = raster_from_quadtree(recon_q, (2, 3), 32, 32)

    ref_scores = jnp.mean(jnp.square(x - recon_r), axis=(2, 3, 4))
    q_err = jnp.mean(jnp.square(quadtree_view(x) - recon_q), axis=-1)
    q_scores = jnp.mean(q_err.reshape(2, 3, -1), axis=-1)
    np.testing.assert_allclose(np.asarray(q_scores), np.asarray(ref_scores), rtol=1e-6)


def test_group_norm_rejected():
    model, variables = _randomized_model(norm="group")
    with pytest.raises(ValueError, match="group"):
        fold_decoder_params(variables)


def test_bf16_fold_no_worse_than_bf16_flax():
    """In the bf16 serving policy the folded decoder must be at least as
    close to f32 truth as the bf16 Flax decoder it replaces (it is in
    fact closer: the dots accumulate in f32)."""
    from vad_tpu.utils.precision import cast_floating

    model, variables = _randomized_model()
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.standard_normal((2, 4, 4, 128)).astype(np.float32))
    dec = lambda v, zz: model.apply(  # noqa: E731
        v, zz, False, method=lambda m, z, train: m.decoder(z, train)
    )
    ref32 = np.asarray(dec(variables, z))
    refb = np.asarray(
        dec(cast_floating(variables, jnp.bfloat16), z.astype(jnp.bfloat16))
    ).astype(np.float32)
    folded = fold_decoder_params(variables, dtype=jnp.bfloat16)
    got = np.asarray(
        raster_from_quadtree(
            decode_quadtree(z.astype(jnp.bfloat16), folded), (2,), 64, 64
        )
    ).astype(np.float32)
    err_fold = np.max(np.abs(got - ref32))
    err_flax = np.max(np.abs(refb - ref32))
    assert err_fold <= err_flax * 1.2 + 1e-4, (err_fold, err_flax)
