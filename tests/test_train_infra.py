"""Training-infrastructure tests: optimizer, plateau schedule, checkpoints,
and the SPMD train step over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vad_tpu.models.autoencoder import ConvAutoencoder
from vad_tpu.ops.losses import mse_per_sample
from vad_tpu.parallel.sharding import get_mesh, pad_batch_for_devices
from vad_tpu.train.state import (
    ReduceLROnPlateau,
    create_train_state,
    current_learning_rate,
    set_learning_rate,
)
from vad_tpu.train.steps import make_eval_step, make_train_step
from vad_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def small_state(lr=1e-3):
    model = ConvAutoencoder(latent_dim=32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    return model, create_train_state(model, variables, lr)


class TestPlateauScheduler:
    def test_min_mode_reduces_after_patience(self):
        sched = ReduceLROnPlateau(mode="min", factor=0.5, patience=2)
        lr = 1.0
        lr = sched.step(1.0, lr)  # best=1.0
        for _ in range(2):  # bad epochs 1, 2
            lr = sched.step(1.0, lr)
        assert lr == 1.0
        lr = sched.step(1.0, lr)  # bad epoch 3 > patience -> reduce
        assert lr == 0.5

    def test_improvement_resets(self):
        sched = ReduceLROnPlateau(mode="min", factor=0.5, patience=1)
        lr = 1.0
        lr = sched.step(1.0, lr)
        lr = sched.step(1.1, lr)  # bad 1
        lr = sched.step(0.5, lr)  # improvement resets
        lr = sched.step(0.6, lr)  # bad 1
        assert lr == 1.0
        lr = sched.step(0.6, lr)  # bad 2 -> reduce
        assert lr == 0.5

    def test_max_mode(self):
        sched = ReduceLROnPlateau(mode="max", factor=0.1, patience=0)
        lr = 1.0
        lr = sched.step(2.0, lr)  # best
        lr = sched.step(2.0, lr)  # not better -> immediate reduce (patience 0)
        assert np.isclose(lr, 0.1)


class TestTrainStep:
    def test_loss_decreases_on_overfit(self):
        model, state = small_state(lr=3e-3)
        step = make_train_step(mse_per_sample, get_mesh())
        x = np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.3
        first = None
        for i in range(30):
            state, loss = step(state, jnp.asarray(x), jnp.asarray(8))
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.7

    def test_padded_tail_does_not_affect_loss(self):
        model, state = small_state()
        step = make_eval_step(
            mse_per_sample, ConvAutoencoder.reconstruction_error, get_mesh()
        )
        x = np.random.default_rng(1).normal(size=(5, 32, 32, 3)).astype(np.float32)
        padded, n_real = pad_batch_for_devices({"image": x}, 8)
        assert n_real == 5
        losses, scores = step(state, padded["image"])
        # padded entries replicate the last sample
        np.testing.assert_allclose(np.asarray(scores)[5:], np.asarray(scores)[4], rtol=1e-5)

    def test_runs_on_eight_device_mesh(self):
        assert len(jax.devices()) == 8
        mesh = get_mesh()
        assert mesh.shape["data"] == 8
        model, state = small_state()
        step = make_train_step(mse_per_sample, mesh)
        x = np.zeros((16, 32, 32, 3), np.float32)
        state, loss = step(state, jnp.asarray(x), jnp.asarray(16))
        assert np.isfinite(float(loss))

    def test_cycled_pad_tail_step_equals_short_batch_step(self):
        """Training THROUGH a padded tail batch is the same optimizer step
        as the torch reference's short last batch (train.py:128-134):
        with the pad slots CYCLING the real samples (loader policy) and
        pad_to % n_real == 0, train-mode BN statistics over the padded
        batch equal the short batch's exactly, the masked loss equals the
        short-batch mean, and therefore the updated parameters match."""
        model, state_pad = small_state()
        _, state_short = small_state()
        # mesh=None: a 2-sample short batch cannot shard over the 8-device
        # data axis (that impossibility is exactly why the loader pads);
        # the property under test is mathematical, not a sharding one.
        step = make_train_step(mse_per_sample)
        x2 = np.random.default_rng(3).normal(size=(2, 32, 32, 3)).astype(np.float32)
        x_pad = np.resize(x2, (8, 32, 32, 3))  # cycles the 2 real samples
        state_pad, loss_pad = step(state_pad, jnp.asarray(x_pad), jnp.asarray(2))
        state_short, loss_short = step(state_short, jnp.asarray(x2), jnp.asarray(2))
        assert np.isclose(float(loss_pad), float(loss_short), rtol=1e-5)
        # BN running statistics advance identically (same batch stats)
        for a, b in zip(jax.tree.leaves(state_pad.batch_stats),
                        jax.tree.leaves(state_short.batch_stats)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )
        # gradient equality is asserted DIRECTLY, in float64: after one
        # Adam step the f32 params are not comparable (the step-1 update
        # ~ lr*g/(sqrt(g^2)+eps) amplifies reduction-order rounding of
        # near-zero gradients to O(lr)), and even raw f32 gradients carry
        # ~1e-5 cancellation noise through the BN chain — but in f64 the
        # padded objective is the same function to ~1e-14 (measured
        # 9e-15), which is the actual mathematical claim.
        model2, state0 = small_state()
        with jax.enable_x64():
            params64 = jax.tree.map(lambda p: p.astype(jnp.float64), state0.params)
            stats64 = jax.tree.map(
                lambda p: p.astype(jnp.float64), state0.batch_stats
            )

            def objective(params, x, n):
                recon, _ = model2.apply(
                    {"params": params, "batch_stats": stats64},
                    x, train=True, mutable=["batch_stats"],
                )
                losses = mse_per_sample(recon, x)
                mask = jnp.arange(x.shape[0]) < n
                return jnp.sum(jnp.where(mask, losses, 0.0)) / n

            g_pad = jax.grad(objective)(
                params64, jnp.asarray(x_pad, jnp.float64), 2
            )
            g_short = jax.grad(objective)(
                params64, jnp.asarray(x2, jnp.float64), 2
            )
        for a, b in zip(jax.tree.leaves(g_pad), jax.tree.leaves(g_short)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-13
            )

    def test_lr_injection_without_recompile(self):
        model, state = small_state(lr=1e-3)
        assert np.isclose(current_learning_rate(state), 1e-3)
        step = make_train_step(mse_per_sample, get_mesh())
        x = jnp.zeros((8, 32, 32, 3))
        state, _ = step(state, x, jnp.asarray(8))
        state = set_learning_rate(state, 5e-4)
        assert np.isclose(current_learning_rate(state), 5e-4)
        state, _ = step(state, x, jnp.asarray(8))  # same compiled fn


class TestMixedPrecision:
    """--precision bf16: compute in bfloat16, master state stays float32."""

    def test_bf16_state_stays_f32_and_loss_tracks_f32(self):
        model, state_a = small_state()
        _, state_b = small_state()
        x = np.random.default_rng(2).normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.3
        step_f32 = make_train_step(mse_per_sample, get_mesh())
        step_bf16 = make_train_step(
            mse_per_sample, get_mesh(), compute_dtype=jnp.bfloat16
        )
        state_a, loss_a = step_f32(state_a, jnp.asarray(x), jnp.asarray(8))
        state_b, loss_b = step_bf16(state_b, jnp.asarray(x), jnp.asarray(8))
        # same initial weights -> first-step losses agree to bf16 tolerance
        assert abs(float(loss_a) - float(loss_b)) / float(loss_a) < 0.02
        # master params, moments, and BN stats remain f32 after a bf16 step
        for leaf in jax.tree.leaves((state_b.params, state_b.opt_state,
                                     state_b.batch_stats)):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32
        # and the step actually updated the params
        diffs = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            state_a.params, state_b.params,
        )
        assert max(jax.tree.leaves(diffs)) < 1e-2  # trajectories stay close

    def test_bf16_training_converges(self):
        model, state = small_state(lr=3e-3)
        step = make_train_step(
            mse_per_sample, get_mesh(), compute_dtype=jnp.bfloat16
        )
        x = np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.3
        first = None
        for _ in range(30):
            state, loss = step(state, jnp.asarray(x), jnp.asarray(8))
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.7

    def test_bf16_video_step(self):
        from vad_tpu.models.video_autoencoder import VideoAutoencoder

        model = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32)
        x = np.random.default_rng(3).normal(size=(8, 3, 32, 32, 3)).astype(np.float32)
        variables = model.init(jax.random.key(0), jnp.asarray(x[:1, :2]), train=False)
        state = create_train_state(model, variables, 1e-3)
        step = make_train_step(
            mse_per_sample, get_mesh(), compute_dtype=jnp.bfloat16
        )
        state, loss = step(state, jnp.asarray(x), jnp.asarray(8))
        assert np.isfinite(float(loss))
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32


class TestGradAccum:
    """--accum-steps: scanned microbatches, one Adam update per batch."""

    @staticmethod
    def group_state(lr=1e-3):
        # GroupNorm normalizes per sample, so accumulation is EXACTLY
        # equivalent to the full batch (BatchNorm's microbatch statistics
        # are the one documented difference)
        model = ConvAutoencoder(latent_dim=32, norm="group")
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        return model, create_train_state(model, variables, lr)

    def test_accum_matches_full_batch_groupnorm(self):
        x = np.random.default_rng(5).normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.3
        trajectories = []
        for accum in (1, 2, 4):
            _, state = self.group_state()
            step = make_train_step(mse_per_sample, get_mesh(), accum_steps=accum)
            losses = []
            for _ in range(3):
                state, loss = step(state, jnp.asarray(x), jnp.asarray(8))
                losses.append(float(loss))
            trajectories.append(losses)
        # step 1 agrees to float-exactness; later steps drift only by
        # gradient summation ORDER (scan adds vs one fused reduce), which
        # Adam's rsqrt amplifies — observed ~1e-4 relative by step 3
        np.testing.assert_allclose(
            trajectories[0][0], [trajectories[1][0], trajectories[2][0]], rtol=1e-6
        )
        np.testing.assert_allclose(trajectories[0], trajectories[1], rtol=1e-3)
        np.testing.assert_allclose(trajectories[0], trajectories[2], rtol=1e-3)

    def test_accum_respects_padding_mask(self):
        # n_real=5 with accum=2: microbatch 2 is mostly padding; the padded
        # tail must not contribute to loss or gradients
        x = np.random.default_rng(6).normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.3
        x[5:] = 99.0  # poison the padded tail
        losses = {}
        for accum in (1, 2):
            _, state = self.group_state()
            step = make_train_step(mse_per_sample, get_mesh(), accum_steps=accum)
            state, loss = step(state, jnp.asarray(x), jnp.asarray(5))
            losses[accum] = float(loss)
        assert abs(losses[1] - losses[2]) / abs(losses[1]) < 1e-5
        assert losses[1] < 10.0  # poison (avg ~1e4 loss) did not leak in

    def test_accum_composes_with_remat_and_bf16_video(self):
        """The documented composition: --accum-steps + --remat + --precision
        bf16 on the video model in one compiled step."""
        from vad_tpu.models.video_autoencoder import VideoAutoencoder

        model = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32, remat=True)
        x = np.random.default_rng(9).normal(size=(8, 3, 32, 32, 3)).astype(np.float32)
        variables = model.init(jax.random.key(0), jnp.asarray(x[:1, :2]), train=False)
        state = create_train_state(model, variables, 1e-3)
        step = make_train_step(
            mse_per_sample, get_mesh(), accum_steps=2,
            compute_dtype=jnp.bfloat16,
        )
        state, loss = step(state, jnp.asarray(x), jnp.asarray(8))
        assert np.isfinite(float(loss))
        for leaf in jax.tree.leaves((state.params, state.opt_state)):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32

    def test_accum_batchnorm_converges_and_composes_with_bf16(self):
        _, state = small_state(lr=3e-3)
        step = make_train_step(
            mse_per_sample, get_mesh(), accum_steps=2,
            compute_dtype=jnp.bfloat16,
        )
        x = np.random.default_rng(7).normal(size=(8, 32, 32, 3)).astype(np.float32) * 0.3
        first = None
        for _ in range(30):
            state, loss = step(state, jnp.asarray(x), jnp.asarray(8))
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.7
        for leaf in jax.tree.leaves((state.params, state.opt_state)):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32


class TestCheckpoint:
    def test_rotate_epoch_checkpoints(self, tmp_path):
        """--keep-checkpoints N: oldest per-epoch ckpts removed, best/final
        never touched, numeric (not lexicographic) epoch ordering."""
        from vad_tpu.utils.checkpoint import (
            latest_checkpoint,
            rotate_epoch_checkpoints,
        )

        for e in (1, 2, 3, 10, 11):  # 10/11 sort before 2 lexicographically
            save_checkpoint(tmp_path / f"checkpoint_epoch_{e}.ckpt", {"epoch": e})
        save_checkpoint(tmp_path / "best_model.ckpt", {"epoch": 3})
        save_checkpoint(tmp_path / "final_model.ckpt", {"epoch": 11})
        assert rotate_epoch_checkpoints(tmp_path, keep=2) == 3
        left = sorted(p.name for p in tmp_path.glob("*.ckpt"))
        assert left == [
            "best_model.ckpt", "checkpoint_epoch_10.ckpt",
            "checkpoint_epoch_11.ckpt", "final_model.ckpt",
        ]
        assert latest_checkpoint(tmp_path).name == "checkpoint_epoch_11.ckpt"
        assert rotate_epoch_checkpoints(tmp_path, keep=5) == 0  # idempotent

    def test_roundtrip(self, tmp_path):
        model, state = small_state()
        payload = {
            "epoch": 3,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "args": {"latent_dim": 32, "category": "synthetic"},
            "history": {"train_loss": [1.0, 0.5]},
        }
        path = save_checkpoint(tmp_path / "best_model.ckpt", payload)
        loaded = load_checkpoint(path)
        assert loaded["epoch"] == 3
        assert loaded["args"]["latent_dim"] == 32
        chex_tree = jax.tree.map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
            state.params,
            loaded["params"],
        )
        assert all(jax.tree.leaves(chex_tree))

    def test_atomic_write_leaves_no_tmp(self, tmp_path):
        model, state = small_state()
        save_checkpoint(tmp_path / "m.ckpt", {"params": state.params})
        assert list(tmp_path.glob("*.tmp")) == []


class TestRemat:
    def test_remat_grad_matches(self):
        """jax.checkpoint over the scan step changes memory, not values."""
        import jax
        import jax.numpy as jnp
        from vad_tpu.models.video_autoencoder import VideoAutoencoder
        from vad_tpu.ops.losses import mse_loss

        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 4, 32, 32, 3)), jnp.float32
        )
        base = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32)
        variables = base.init(jax.random.key(0), x[:, :2], train=False)
        remat = VideoAutoencoder(latent_dim=32, lstm_hidden_dim=32, remat=True)

        def loss_for(model):
            def f(params):
                recon, _ = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                )
                return mse_loss(recon, x)
            return f

        g_base = jax.grad(loss_for(base))(variables["params"])
        g_remat = jax.grad(loss_for(remat))(variables["params"])
        for a, b in zip(jax.tree.leaves(g_base), jax.tree.leaves(g_remat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_compilation_cache_configured():
    import jax

    from vad_tpu.core.runtime import setup_compilation_cache

    setup_compilation_cache()
    assert jax.config.jax_compilation_cache_dir  # set unless opted out
