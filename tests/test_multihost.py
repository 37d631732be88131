"""Per-host sharded input feeding (parallel/multihost.py) on the
8-virtual-device CPU mesh — single process, with the slicing math
exercised via explicit process_count/process_index arguments.  The
REAL multi-process paths (jax.distributed.initialize + Gloo) execute
in tests/test_multiprocess.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vad_tpu.parallel.multihost import (
    host_batch_indices,
    local_sample_range,
    put_global_batch,
)
from vad_tpu.parallel.sharding import DATA_AXIS, get_mesh, shard_batch


def test_local_sample_range_partitions_batch():
    ranges = [local_sample_range(32, process_count=4, process_index=p) for p in range(4)]
    assert ranges == [(0, 8), (8, 8), (16, 8), (24, 8)]
    with pytest.raises(ValueError):
        local_sample_range(30, process_count=4, process_index=0)


def test_host_batch_indices_disjoint_and_complete():
    rng = np.random.default_rng(0)
    order = rng.permutation(64)
    got = []
    for p in range(2):
        for step in range(2):
            idx = host_batch_indices(order, step, 16, process_count=2, process_index=p)
            assert idx.shape == (8,)
            got.append((step, p, idx))
    # per step, the two hosts' slices tile the global batch exactly
    for step in range(2):
        union = np.concatenate(
            [idx for s, p, idx in got if s == step]
        )
        assert sorted(union) == sorted(order[step * 16 : (step + 1) * 16])


def test_put_global_batch_matches_shard_batch():
    mesh = get_mesh()
    rng = np.random.default_rng(1)
    batch = {
        "image": rng.normal(size=(16, 8, 8, 3)).astype(np.float32),
        "label": rng.integers(0, 2, size=(16,)).astype(np.int32),
        "meta": "passthrough",
    }
    a = put_global_batch(mesh, batch)
    b = shard_batch(mesh, batch)
    assert a["meta"] == "passthrough"
    for k in ("image", "label"):
        assert a[k].sharding.spec == b[k].sharding.spec
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_put_global_batch_feeds_jitted_step():
    mesh = get_mesh()
    n_data = mesh.shape[DATA_AXIS]
    batch = {"image": np.arange(n_data * 4 * 6, dtype=np.float32).reshape(n_data * 4, 6)}
    g = put_global_batch(mesh, batch)

    @jax.jit
    def step(x):
        return jnp.sum(x, axis=1)

    out = np.asarray(step(g["image"]))
    np.testing.assert_allclose(out, batch["image"].sum(axis=1), rtol=1e-6)
