"""MultiStreamScorer tests: slot lifecycle, state isolation, equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vad_tpu.eval.serving import MultiStreamScorer
from vad_tpu.models.video_autoencoder import VideoAutoencoder


@pytest.fixture(scope="module")
def scorer_setup():
    model = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32, lstm_layers=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, 64, 64, 3)), train=False)
    return model, variables


def make_frames(seed, n, size=64):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(n, size, size, 3), dtype=np.uint8)


def test_slot_lifecycle(scorer_setup):
    model, variables = scorer_setup
    s = MultiStreamScorer(model, variables, num_slots=4, chunk=4, image_size=64)
    a = s.attach()
    b = s.attach()
    assert {a, b} == {0, 1}
    with pytest.raises(RuntimeError):
        s.attach(slot=a)
    s.detach(a)
    assert list(s.active_slots) == [b]
    c = s.attach()
    assert c == a  # freed slot reused


def test_overflow_raises(scorer_setup):
    model, variables = scorer_setup
    s = MultiStreamScorer(model, variables, num_slots=2, chunk=4, image_size=64)
    s.attach()
    s.attach()
    with pytest.raises(RuntimeError, match="busy"):
        s.attach()


def test_inactive_slots_are_nan(scorer_setup):
    model, variables = scorer_setup
    s = MultiStreamScorer(model, variables, num_slots=3, chunk=4, image_size=64)
    slot = s.attach()
    batch = np.zeros((3, 4, 64, 64, 3), np.uint8)
    batch[slot] = make_frames(0, 4)
    scores = s.score_chunk(batch)
    assert np.all(np.isfinite(scores[slot]))
    inactive = [i for i in range(3) if i != slot]
    assert np.all(np.isnan(scores[inactive]))


def test_matches_single_stream_scoring(scorer_setup):
    """A stream scored in a busy scorer == the model scored alone."""
    model, variables = scorer_setup
    s = MultiStreamScorer(model, variables, num_slots=3, chunk=4, image_size=64)
    s0 = s.attach()
    s1 = s.attach()
    f0 = make_frames(1, 8)
    f1 = make_frames(2, 8)

    got = {s0: [], s1: []}
    for i in range(0, 8, 4):
        out = s.score_streams({s0: f0[i : i + 4], s1: f1[i : i + 4]})
        for k, v in out.items():
            got[k].extend(v.tolist())

    # reference: full-sequence forward per stream
    for frames, slot in ((f0, s0), (f1, s1)):
        x = jnp.asarray(frames[None].astype(np.float32) / 127.5 - 1.0)
        ref = model.apply(
            variables, x, per_frame=True, method=VideoAutoencoder.reconstruction_error
        )
        np.testing.assert_allclose(
            np.asarray(got[slot]), np.asarray(ref)[0], rtol=2e-4, atol=1e-6
        )


def test_detach_reattach_resets_state(scorer_setup):
    model, variables = scorer_setup
    s = MultiStreamScorer(model, variables, num_slots=2, chunk=4, image_size=64)
    slot = s.attach()
    frames = make_frames(3, 4)
    batch = np.zeros((2, 4, 64, 64, 3), np.uint8)
    batch[slot] = frames
    first = s.score_chunk(batch)[slot].copy()
    s.score_chunk(batch)  # advance state
    s.detach(slot)
    assert s.attach(slot) == slot  # re-claim same slot, state zeroed
    again = s.score_chunk(batch)[slot]
    np.testing.assert_allclose(again, first, rtol=1e-5, atol=1e-7)


def test_bf16_policy_close_to_f32(scorer_setup):
    """bf16 serving scores track the f32 scores within ~1% relative."""
    model, variables = scorer_setup
    f32 = MultiStreamScorer(model, variables, num_slots=2, chunk=4, image_size=64)
    bf16 = MultiStreamScorer(
        model, variables, num_slots=2, chunk=4, image_size=64, dtype=jnp.bfloat16
    )
    f32.attach(0)
    bf16.attach(0)
    batch = np.zeros((2, 4, 64, 64, 3), np.uint8)
    batch[0] = make_frames(9, 4)
    s32 = f32.score_chunk(batch)[0]
    s16 = bf16.score_chunk(batch)[0]
    assert s16.dtype == np.float32  # scores surfaced in f32 either way
    np.testing.assert_allclose(s16, s32, rtol=0.03)
    # the carried ConvLSTM (h, c) stays f32 under the bf16 policy: the
    # cell state integrates across the whole stream and must not
    # accumulate bf16 rounding (utils/precision.py)
    for h, c in bf16.states:
        assert h.dtype == jnp.float32 and c.dtype == jnp.float32


def test_bf16_long_stream_no_state_drift(scorer_setup):
    """Scores stay within the documented ~1% bound across MANY chunks —
    the failure mode of carrying (h, c) in bf16 is cumulative drift."""
    model, variables = scorer_setup
    f32 = MultiStreamScorer(model, variables, num_slots=1, chunk=4, image_size=64)
    bf16 = MultiStreamScorer(
        model, variables, num_slots=1, chunk=4, image_size=64, dtype=jnp.bfloat16
    )
    f32.attach(0)
    bf16.attach(0)
    for i in range(12):  # 48 frames of carried state
        batch = make_frames(100 + i, 4)[None]
        s32 = f32.score_chunk(batch)[0]
        s16 = bf16.score_chunk(batch)[0]
    np.testing.assert_allclose(s16, s32, rtol=0.03)


def test_chunk_invariance_chunk1_latency_mode(scorer_setup):
    """chunk=1 stepped N times == chunk=N stepped once, per frame.

    This is the guarantee behind `serve.py --chunk 1` (the low-latency
    serving mode, tools/measure_latency.py): the carried (h, c) threads
    the recurrence across chunk boundaries, so the chunk size is purely
    a batching/latency knob and NEVER changes a frame's score.  The
    scan body is identical at T=1 and T=N; only the hoisted input
    conv's batch shape differs (tolerance covers its reduction order).
    """
    model, variables = scorer_setup
    frames = make_frames(42, 8)
    by_chunk = {}
    for chunk in (1, 2, 8):
        s = MultiStreamScorer(model, variables, num_slots=1, chunk=chunk, image_size=64)
        s.attach(0)
        scores = []
        for i in range(0, 8, chunk):
            scores.extend(s.score_chunk(frames[None, i : i + chunk])[0].tolist())
        by_chunk[chunk] = np.asarray(scores)
    np.testing.assert_allclose(by_chunk[1], by_chunk[8], rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(by_chunk[2], by_chunk[8], rtol=2e-5, atol=1e-7)


def test_mesh_scores_match_single_device(scorer_setup):
    """Slots sharded over the 8-device 'data' axis produce the SAME scores
    as the unsharded scorer — the mesh only changes placement."""
    from jax.sharding import PartitionSpec as P

    from vad_tpu.parallel.sharding import get_mesh

    model, variables = scorer_setup
    mesh = get_mesh()  # (data=8, model=1)
    plain = MultiStreamScorer(model, variables, num_slots=8, chunk=4, image_size=64)
    sharded = MultiStreamScorer(
        model, variables, num_slots=8, chunk=4, image_size=64, mesh=mesh
    )
    for s in (plain, sharded):
        for slot in range(8):
            s.attach(slot)
    batch = np.stack([make_frames(20 + i, 4) for i in range(8)])
    for _ in range(3):  # carried state must agree across steps too
        want = plain.score_chunk(batch)
        got = sharded.score_chunk(batch)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)
    # the carried state actually lives sharded over 'data'
    for h, c in sharded.states:
        assert h.sharding.spec == P("data"), h.sharding
        assert c.sharding.spec == P("data"), c.sharding


def test_reload_variables_mesh(scorer_setup):
    """Hot-swapping weights on a mesh-sharded scorer re-replicates them and
    subsequent chunks score exactly like a fresh scorer built on the new
    weights — while carried state and slot map survive the swap."""
    model, variables = scorer_setup
    from vad_tpu.parallel.sharding import get_mesh

    mesh = get_mesh()
    v2 = model.init(jax.random.key(5), jnp.zeros((1, 2, 64, 64, 3)), train=False)

    s = MultiStreamScorer(model, variables, num_slots=8, chunk=4, image_size=64, mesh=mesh)
    fresh = MultiStreamScorer(model, v2, num_slots=8, chunk=4, image_size=64, mesh=mesh)
    slot = s.attach()
    fslot = fresh.attach()
    assert slot == fslot
    batch = np.zeros((8, 4, 64, 64, 3), np.uint8)
    batch[slot] = make_frames(3, 4)

    before = s.score_chunk(batch)
    # reset the slot state so the post-reload comparison starts from the
    # same zero state as the fresh scorer built on the new weights
    s.detach(slot)
    s.attach(slot)
    s.reload_variables(v2)
    assert list(s.active_slots) == [slot]  # slots survive the swap
    after = s.score_chunk(batch)
    want = fresh.score_chunk(batch)
    assert not np.allclose(before[slot], after[slot])  # weights changed
    np.testing.assert_array_equal(after[slot], want[slot])

    # wrong architecture rejected, scorer still serves
    tiny = VideoAutoencoder(latent_dim=16, lstm_hidden_dim=16)
    v_bad = tiny.init(jax.random.key(2), jnp.zeros((1, 2, 64, 64, 3)), train=False)
    with pytest.raises(ValueError, match="architecture"):
        s.reload_variables(v_bad)
    np.testing.assert_array_equal(
        s.score_chunk(batch)[slot], fresh.score_chunk(batch)[slot]
    )


def test_mesh_slot_isolation_and_reset(scorer_setup):
    """Attach/detach on the sharded scorer: per-slot state isolation is
    preserved (idle neighbours don't advance; reattach zeroes state)."""
    from jax.sharding import PartitionSpec as P

    from vad_tpu.parallel.sharding import get_mesh

    model, variables = scorer_setup
    mesh = get_mesh()
    s = MultiStreamScorer(model, variables, num_slots=8, chunk=4, image_size=64, mesh=mesh)
    a, b = s.attach(), s.attach()
    fa, fb = make_frames(30, 4), make_frames(31, 4)

    first = s.score_streams({a: fa, b: fb})
    first_a = first[a].copy()
    # advance only b: a's carried (h, c) must not move
    state_a_before = [np.asarray(h[a]) for h, _ in s.states]
    s.score_streams({b: fb})
    state_a_after = [np.asarray(h[a]) for h, _ in s.states]
    for x, y in zip(state_a_before, state_a_after):
        np.testing.assert_array_equal(x, y)

    # detach + reattach a: same first-chunk scores as a fresh stream
    s.detach(a)
    assert s.attach(a) == a
    again = s.score_streams({a: fa})[a]
    np.testing.assert_allclose(again, first_a, rtol=1e-5, atol=1e-7)
    # out-of-jit reset kept the state pinned to the 'data' layout
    for h, c in s.states:
        assert h.sharding.spec == P("data"), h.sharding


def test_mesh_works_under_tp_axis_too(scorer_setup):
    """A (data=4, model=2) mesh serves fine: slots ride 'data', the model
    axis replicates (scoring has no tp sharding to exploit)."""
    from vad_tpu.parallel.sharding import get_mesh

    model, variables = scorer_setup
    mesh = get_mesh(model_parallel=2)
    plain = MultiStreamScorer(model, variables, num_slots=4, chunk=4, image_size=64)
    sharded = MultiStreamScorer(
        model, variables, num_slots=4, chunk=4, image_size=64, mesh=mesh
    )
    plain.attach(1)
    sharded.attach(1)
    batch = np.zeros((4, 4, 64, 64, 3), np.uint8)
    batch[1] = make_frames(40, 4)
    np.testing.assert_allclose(
        sharded.score_chunk(batch)[1], plain.score_chunk(batch)[1],
        rtol=2e-5, atol=1e-7,
    )


def test_mesh_rejects_indivisible_slots(scorer_setup):
    from vad_tpu.parallel.sharding import get_mesh

    model, variables = scorer_setup
    with pytest.raises(ValueError, match="divide evenly"):
        MultiStreamScorer(model, variables, num_slots=6, chunk=4, image_size=64,
                          mesh=get_mesh())


def test_shape_validation(scorer_setup):
    model, variables = scorer_setup
    s = MultiStreamScorer(model, variables, num_slots=2, chunk=4, image_size=64)
    s.attach()
    with pytest.raises(ValueError, match="expected"):
        s.score_chunk(np.zeros((2, 3, 64, 64, 3), np.uint8))


def test_spatial_mesh_matches_plain(scorer_setup):
    """Spatial partitioning (image rows over 'model', slots over 'data')
    produces the same scores as the unsharded scorer across carried-state
    steps — XLA's halo exchanges are exact, not approximate."""
    from jax.sharding import PartitionSpec as P

    from vad_tpu.parallel.sharding import get_mesh

    model, variables = scorer_setup
    mesh = get_mesh(model_parallel=2)  # (data=4, model=2)
    plain = MultiStreamScorer(
        model, variables, num_slots=4, chunk=4, image_size=64, return_maps=True
    )
    sharded = MultiStreamScorer(
        model, variables, num_slots=4, chunk=4, image_size=64,
        return_maps=True, mesh=mesh, spatial=True,
    )
    for s in (plain, sharded):
        for slot in range(4):
            s.attach(slot)
    batch = np.stack([make_frames(50 + i, 4) for i in range(4)])
    for _ in range(3):  # carried state must agree across steps too
        want, want_maps = plain.score_chunk(batch)
        got, got_maps = sharded.score_chunk(batch)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(got_maps, want_maps, rtol=2e-4, atol=1e-6)
    # carried (h, c): slots over 'data', latent rows over 'model'
    for h, c in sharded.states:
        assert h.sharding.spec == P("data", "model"), h.sharding
        assert c.sharding.spec == P("data", "model"), c.sharding


def test_spatial_one_latent_row_per_shard(scorer_setup):
    """model_parallel=4 on a 64px input leaves ONE latent row per shard
    (latent 4x4 split 4 ways) — the hardest halo case: every 3x3 conv at
    the latent level needs both neighbors' rows.  Scores must still match
    the unsharded scorer."""
    from jax.sharding import PartitionSpec as P

    from vad_tpu.parallel.sharding import get_mesh

    model, variables = scorer_setup
    mesh = get_mesh(model_parallel=4)  # (data=2, model=4)
    plain = MultiStreamScorer(model, variables, num_slots=2, chunk=4, image_size=64)
    sharded = MultiStreamScorer(
        model, variables, num_slots=2, chunk=4, image_size=64, mesh=mesh, spatial=True
    )
    for s in (plain, sharded):
        s.attach(0), s.attach(1)
    batch = np.stack([make_frames(70 + i, 4) for i in range(2)])
    for _ in range(2):
        want = plain.score_chunk(batch)
        got = sharded.score_chunk(batch)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)
    for h, c in sharded.states:
        assert h.sharding.spec == P("data", "model"), h.sharding


def test_spatial_slot_reset_keeps_layout(scorer_setup):
    """Detach/reattach under spatial sharding: fresh-stream scores and the
    ('data', 'model') state layout both survive the out-of-jit reset."""
    from jax.sharding import PartitionSpec as P

    from vad_tpu.parallel.sharding import get_mesh

    model, variables = scorer_setup
    mesh = get_mesh(model_parallel=2)
    s = MultiStreamScorer(
        model, variables, num_slots=4, chunk=4, image_size=64, mesh=mesh, spatial=True
    )
    a = s.attach()
    fa = make_frames(60, 4)
    first = s.score_streams({a: fa})[a].copy()
    s.score_streams({a: fa})
    s.detach(a)
    assert s.attach(a) == a
    again = s.score_streams({a: fa})[a]
    np.testing.assert_allclose(again, first, rtol=1e-5, atol=1e-7)
    for h, _ in s.states:
        assert h.sharding.spec == P("data", "model"), h.sharding


def test_spatial_validation(scorer_setup):
    from vad_tpu.parallel.sharding import get_mesh

    model, variables = scorer_setup
    with pytest.raises(ValueError, match="requires a mesh"):
        MultiStreamScorer(model, variables, num_slots=4, image_size=64, spatial=True)
    mesh = get_mesh(model_parallel=2)
    pallas_model = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32, lstm_layers=2,
                                    backend="pallas")
    with pytest.raises(ValueError, match="xla"):
        MultiStreamScorer(pallas_model, variables, num_slots=4, image_size=64,
                          mesh=mesh, spatial=True)
    with pytest.raises(ValueError, match="fused_input"):
        MultiStreamScorer(model, variables, num_slots=4, image_size=64,
                          mesh=mesh, spatial=True, fused_input=True)
    with pytest.raises(ValueError, match="divide"):
        # H=48: 48/16=3 latent rows do not split over model axis of 2
        MultiStreamScorer(model, variables, num_slots=4, image_size=48,
                          mesh=mesh, spatial=True)


def test_rect_image_size(scorer_setup):
    """(H, W) tuple sizes run without retraining (fully-convolutional
    contract) and match a direct full-sequence forward at that size."""
    model, variables = scorer_setup
    s = MultiStreamScorer(model, variables, num_slots=2, chunk=4, image_size=(32, 64))
    slot = s.attach()
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, size=(4, 32, 64, 3), dtype=np.uint8)
    got = s.score_streams({slot: frames})[slot]
    x = jnp.asarray(frames[None].astype(np.float32) / 127.5 - 1.0)
    ref = model.apply(
        variables, x, per_frame=True, method=VideoAutoencoder.reconstruction_error
    )
    np.testing.assert_allclose(got, np.asarray(ref)[0], rtol=2e-5, atol=1e-7)
    with pytest.raises(ValueError, match="divisible by 16"):
        MultiStreamScorer(model, variables, num_slots=2, image_size=(40, 64))
