"""Latent-distance anomaly scoring: per-position Gaussians over encoder features.

A second detector family on the SAME trained autoencoder backbone
(beyond-reference — the reference scores only by reconstruction error,
evaluate.py:60-74 / evaluate_video.py:150-170).  Instead of asking "how
badly does the decoder reproduce this input?", it asks "how far do the
encoder's intermediate features sit from the distribution of features
seen on normal data?" — the PaDiM recipe (Defard et al. 2020, public):

1. Run the frozen encoder over normal (training-split) images and
   collect its multi-scale block outputs, resampled onto one G x G grid
   and concatenated channel-wise (optionally projected to D dims with a
   fixed seeded random matrix — a distance-preserving dimensionality
   reduction that keeps the covariance tractable).
2. Fit a Gaussian PER GRID POSITION: mean [P, D] and a shrinkage-
   regularized covariance [P, D, D], P = G*G.
3. Score a test image by the per-position Mahalanobis distance of its
   embedding — an anomaly map that needs no decoder at all.

Reconstruction error goes blind exactly where the decoder generalizes
too well (it happily reconstructs a defect it never saw); the feature
distribution still moves there.  This is the standard texture-anomaly
fix, which is why `--scorer latent` exists next to the parity `recon`.

TPU mapping: fitting is a streaming sum / outer-product accumulation
(einsum on the MXU, O(D^2) state per position, single pass, batch count
is static-shape-free); scoring is two batched contractions
``e @ precision @ e`` — all jitted, accumulation state donated, only
[B, G, G] maps leave the device.  The Cholesky/inverse runs once at fit
time on [P, D, D].

Everything here is shape-polymorphic over the backbone: it consumes any
coarse-to-fine feature pyramid (`ConvAutoencoder.feature_pyramid`,
`VideoAutoencoder.feature_pyramid`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PyramidFn = Callable[..., Tuple[jnp.ndarray, ...]]

DEFAULT_LAYERS = (0, 1, 2)  # skip the most abstract block by default
DEFAULT_PROJ_DIM = 128
DEFAULT_SHRINK = 0.01


@dataclasses.dataclass
class LatentStats:
    """Fitted per-position Gaussian statistics (device arrays f32)."""

    mean: jnp.ndarray  # [P, D]
    precision: jnp.ndarray  # [P, D, D] inverse covariance
    proj: Optional[jnp.ndarray]  # [C, D] fixed random projection (or None)
    grid: int  # G (maps are [B, G, G])
    layers: Tuple[int, ...]
    n_fit: int  # samples the fit saw

    @property
    def dim(self) -> int:
        return int(self.mean.shape[-1])


def _resample(f: jnp.ndarray, grid: int) -> jnp.ndarray:
    """[N, h, w, c] -> [N, grid, grid, c].

    Finer layers average-pool down (exact when h % grid == 0 — block
    outputs are power-of-two sized so the common case is exact); coarser
    layers nearest-repeat up.  Falls back to jax.image.resize for
    non-integer ratios (odd input sizes)."""
    h = f.shape[1]
    if h == grid:
        return f
    if h > grid and h % grid == 0:
        k = h // grid
        return jax.lax.reduce_window(
            f, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
        ) / float(k * k)
    if h < grid and grid % h == 0:
        k = grid // h
        return jnp.repeat(jnp.repeat(f, k, axis=1), k, axis=2)
    return jax.image.resize(f, (f.shape[0], grid, grid, f.shape[3]), "linear")


def pyramid_embed(
    feats: Sequence[jnp.ndarray],
    layers: Sequence[int],
    grid: int,
    proj: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Selected pyramid levels -> per-position embeddings [N, P, D]."""
    parts = [_resample(feats[i].astype(jnp.float32), grid) for i in layers]
    e = jnp.concatenate(parts, axis=-1)  # [N, G, G, C]
    n = e.shape[0]
    e = e.reshape(n, grid * grid, e.shape[-1])  # [N, P, C]
    if proj is not None:
        e = jnp.einsum("npc,cd->npd", e, proj)
    return e


DEFAULT_MAX_GRID = 32


def default_grid(feats: Sequence[jnp.ndarray], layers: Sequence[int]) -> int:
    """Middle selected layer's spatial size, capped at DEFAULT_MAX_GRID.

    The cap bounds the per-position state: grid G costs G^2 * D^2 floats
    of covariance/precision (G=64, D=128 -> 268 MB f32 — measured to
    slow every compile/save/transfer without a localization win over
    G=32 at MVTec-like defect sizes).  Pass ``grid=`` explicitly for
    finer maps."""
    sizes = sorted(int(feats[i].shape[1]) for i in layers)
    return min(sizes[len(sizes) // 2], DEFAULT_MAX_GRID)


def make_projection(
    n_channels: int, proj_dim: Optional[int], seed: int
) -> Optional[jnp.ndarray]:
    """Fixed Gaussian random projection [C, D] (seeded, so refitting with
    the same seed is deterministic); None when no reduction is needed."""
    if proj_dim is None or proj_dim >= n_channels:
        return None
    key = jax.random.key(seed)
    w = jax.random.normal(key, (n_channels, proj_dim), jnp.float32)
    return w / jnp.sqrt(jnp.float32(proj_dim))


def fit_latent_stats(
    pyramid_fn: PyramidFn,
    variables,
    batches: Iterable[np.ndarray],
    *,
    layers: Sequence[int] = DEFAULT_LAYERS,
    grid: Optional[int] = None,
    proj_dim: Optional[int] = DEFAULT_PROJ_DIM,
    shrink: float = DEFAULT_SHRINK,
    seed: int = 0,
) -> LatentStats:
    """Single streaming pass over normal images -> LatentStats.

    ``pyramid_fn(variables, x)`` maps an image batch [N, H, W, C] to the
    encoder's feature pyramid.  ``batches`` yields numpy image batches
    (any sizes).  Accumulation state (count, sum, sum of outer products)
    lives on device and is donated across updates; the Cholesky-based
    inversion runs once at the end.
    """
    layers = tuple(int(i) for i in layers)
    first = None
    it = iter(batches)
    try:
        first = next(it)
    except StopIteration:
        raise ValueError("fit_latent_stats needs at least one batch")

    feat_shapes = jax.eval_shape(pyramid_fn, variables, jnp.asarray(first))
    if max(layers) >= len(feat_shapes):
        raise ValueError(
            f"layers {layers} out of range for a {len(feat_shapes)}-level pyramid"
        )
    g = int(grid) if grid else default_grid(feat_shapes, layers)
    n_channels = sum(int(feat_shapes[i].shape[-1]) for i in layers)
    proj = make_projection(n_channels, proj_dim, seed)
    d = int(proj.shape[1]) if proj is not None else n_channels
    p = g * g

    @jax.jit
    def embed(v, x):
        return pyramid_embed(pyramid_fn(v, x), layers, g, proj)

    # Anchor-centered single-pass accumulation: on TPU, f32 einsums run
    # at bf16-grade matmul precision by default, so the textbook
    # E[ee^T] - mu mu^T cancels catastrophically for O(1)-mean features
    # (measured: NaN precisions on v5e, finite on CPU).  Subtracting a
    # first-batch anchor keeps the accumulated moments near zero mean,
    # and precision='highest' runs the true-f32 passes.
    # donate the accumulator: s2 is [P, D, D] (tens of MB at defaults),
    # so in-place reuse halves transient HBM during the fit.  ``k`` masks
    # rows past the real sample count: tail batches are PADDED up to the
    # leading batch size so every update hits one compiled executable —
    # a second shape costs a full recompile of the embedded encoder,
    # measured at ~75 s through the remote-compile tunnel.
    @partial(jax.jit, donate_argnums=(0,))
    def update(acc, e, anchor, k):
        count, s1, s2 = acc
        valid = (jnp.arange(e.shape[0]) < k)[:, None, None]
        e = jnp.where(valid, e - anchor, 0.0)
        return (
            count + k,
            s1 + jnp.sum(e, axis=0),
            s2 + jnp.einsum("npd,npe->pde", e, e, precision="highest"),
        )

    acc = (
        jnp.zeros((), jnp.float32),
        jnp.zeros((p, d), jnp.float32),
        jnp.zeros((p, d, d), jnp.float32),
    )
    anchor = None
    lead_n = int(np.asarray(first).shape[0])
    batch = first
    while batch is not None:
        x = np.asarray(batch)
        k = x.shape[0]
        if k < lead_n:  # pad tail batches: one compiled shape for the fit
            x = np.concatenate([x, np.repeat(x[-1:], lead_n - k, axis=0)])
        elif k > lead_n:
            raise ValueError(
                f"fit batches must not grow: got {k} after leading {lead_n}"
            )
        e = embed(variables, jnp.asarray(x))
        if anchor is None:
            anchor = jnp.mean(e, axis=0)  # [P, D]
        # pyramid_fn may expand samples (windows -> frames); padded input
        # rows expand to trailing embedding rows, so the mask scales by
        # the (static) expansion factor
        expansion = e.shape[0] // lead_n
        acc = update(acc, e, anchor, jnp.float32(k * expansion))
        batch = next(it, None)
    # embedding count, not input count: pyramid_fn may expand samples
    # (video windows -> per-frame features)
    n_fit = int(np.asarray(acc[0]))

    @jax.jit
    def finalize(acc, anchor):
        count, s1, s2 = acc
        delta = s1 / count  # residual mean after anchoring (near zero)
        mean = anchor + delta
        cov = s2 / count - jnp.einsum("pd,pe->pde", delta, delta)
        # unbiased + shrinkage toward a scaled identity: keeps every
        # position invertible even when n_fit < D
        cov = cov * (count / jnp.maximum(count - 1.0, 1.0))
        diag_mean = jnp.trace(cov, axis1=-2, axis2=-1) / d  # [P]
        eye = jnp.eye(d, dtype=jnp.float32)
        cov = cov + (shrink * diag_mean + 1e-6)[:, None, None] * eye
        chol = jax.scipy.linalg.cho_factor(cov, lower=True)[0]
        precision = jax.scipy.linalg.cho_solve(
            (chol, True), jnp.broadcast_to(eye, cov.shape)
        )
        return mean, precision

    mean, precision = finalize(acc, anchor)
    return LatentStats(
        mean=mean, precision=precision, proj=proj, grid=g, layers=layers, n_fit=n_fit
    )


def stats_state(stats: LatentStats):
    """The fitted arrays as a pytree to thread THROUGH jit boundaries.

    The precision tensor is large ([P, D, D]: 268 MB f32 at 256px image
    defaults) — closing over it bakes it into the compiled executable as
    a constant, which bloats compiles and overflows remote-compile
    transports (measured: HTTP 413 through the axon tunnel).  CLI paths
    must pass this state as a runtime argument instead."""
    return (stats.mean, stats.precision, stats.proj)


def make_distance_fn(pyramid_fn: PyramidFn, layers, grid: int):
    """``fn(variables, state, x) -> [N, G, G]`` Mahalanobis maps with the
    fitted statistics as an explicit argument (see `stats_state`).

    The heavy lifting is two batched contractions on the MXU; sqrt at
    the end so scores scale like a z-score rather than its square."""
    layers = tuple(int(i) for i in layers)
    g = int(grid)

    def fn(v, state, x):
        mean, precision, proj = state
        e = pyramid_embed(pyramid_fn(v, x), layers, g, proj) - mean  # [N, P, D]
        d2 = jnp.einsum("npd,pde,npe->np", e, precision, e, precision="highest")
        # N comes from the embedding, not the input: pyramid_fn may expand
        # samples (e.g. video windows -> per-frame features)
        return jnp.sqrt(jnp.maximum(d2, 0.0)).reshape(e.shape[0], g, g)

    return fn


def make_distance_step(pyramid_fn: PyramidFn, stats: LatentStats):
    """Closure variant of `make_distance_fn`: ``step(variables, x)``.

    Convenient for library/notebook use on modest grids; jitting it bakes
    the statistics in as constants, so CLI/serving paths use
    `make_distance_fn` + `stats_state` instead (268 MB constants break
    remote compilation — see `stats_state`)."""
    fn = make_distance_fn(pyramid_fn, stats.layers, stats.grid)
    state = stats_state(stats)

    def step(v, x):
        return fn(v, state, x)

    return step


def upsample_maps(maps: jnp.ndarray, size: int) -> jnp.ndarray:
    """[N, G, G] -> [N, size, size] bilinear, for pixel-level metrics."""
    return jax.image.resize(maps, (maps.shape[0], size, size), "linear")


def fit_or_load(
    pyramid_fn: PyramidFn,
    variables,
    batches: Iterable[np.ndarray],
    *,
    save_path=None,
    load_path=None,
    what: str = "samples",
    **fit_kwargs,
) -> LatentStats:
    """Shared CLI wiring: load persisted stats (``load_path``) or fit and
    persist (``save_path``), printing the standard one-line summary both
    CLIs show.  ``what`` names the fit unit ('images' / 'frames')."""
    if load_path is not None:
        stats = load_stats(load_path)
        print(
            f"  loaded latent stats: grid {stats.grid}x{stats.grid}, "
            f"embedding dim {stats.dim}, fitted on {stats.n_fit} {what} "
            f"({load_path})"
        )
        return stats
    stats = fit_latent_stats(pyramid_fn, variables, batches, **fit_kwargs)
    suffix = ""
    if save_path is not None:
        save_stats(save_path, stats)
        suffix = f" (stats -> {getattr(save_path, 'name', save_path)})"
    print(
        f"  grid {stats.grid}x{stats.grid}, embedding dim {stats.dim}, "
        f"fit on {stats.n_fit} {what}{suffix}"
    )
    return stats


def save_stats(path, stats: LatentStats) -> None:
    """Persist fitted stats (npz): inspectable, and reusable via
    ``--latent-stats`` / `load_stats` so repeat evals can skip the fit."""
    np.savez_compressed(
        path,
        mean=np.asarray(stats.mean),
        precision=np.asarray(stats.precision),
        proj=(np.asarray(stats.proj) if stats.proj is not None else np.zeros(0)),
        grid=stats.grid,
        layers=np.asarray(stats.layers),
        n_fit=stats.n_fit,
    )


def load_stats(path) -> LatentStats:
    z = np.load(path)
    proj = z["proj"]
    return LatentStats(
        mean=jnp.asarray(z["mean"]),
        precision=jnp.asarray(z["precision"]),
        proj=(jnp.asarray(proj) if proj.size else None),
        grid=int(z["grid"]),
        layers=tuple(int(i) for i in z["layers"]),
        n_fit=int(z["n_fit"]),
    )
