"""Data-layer tests: folder semantics, window indexing, labeling, loaders."""

import numpy as np
import pytest

from vad_tpu.data.image_dataset import MVTecDataset
from vad_tpu.data.loader import Loader, collate, device_prefetch
from vad_tpu.data.video_dataset import (
    IPADDataset,
    VideoDataset,
    VideoFileDataset,
    detect_video_dataset_class,
)


class TestImageDataset:
    def test_split_sizes(self, synthetic_image_root):
        train = MVTecDataset(synthetic_image_root, "synthetic", "train", image_size=64)
        test = MVTecDataset(synthetic_image_root, "synthetic", "test", image_size=64)
        assert len(train) == 12
        assert len(test) == 10  # 4 good + 6 defect

    def test_labels_and_masks(self, synthetic_image_root):
        test = MVTecDataset(synthetic_image_root, "synthetic", "test", image_size=64)
        labels = test.labels
        assert labels.sum() == 6  # defects
        for i in range(len(test)):
            s = test[i]
            assert s["image"].shape == (64, 64, 3)
            assert s["image"].min() >= -1.0 and s["image"].max() <= 1.0
            assert s["mask"].shape == (64, 64)
            if s["label"] == 0:
                assert s["mask"].max() == 0.0
            else:
                assert s["mask"].max() > 0.0  # gt mask present and nonzero

    def test_train_is_all_normal(self, synthetic_image_root):
        train = MVTecDataset(synthetic_image_root, "synthetic", "train", image_size=64)
        assert train.labels.sum() == 0

    def test_missing_category_raises(self, synthetic_image_root):
        with pytest.raises(ValueError):
            MVTecDataset(synthetic_image_root, "does_not_exist")


class TestLoader:
    def test_batching_and_remainder(self, synthetic_image_root):
        ds = MVTecDataset(synthetic_image_root, "synthetic", "test", image_size=64)
        loader = Loader(ds, batch_size=4, num_workers=2)
        batches = list(loader)
        assert [b["image"].shape[0] for b in batches] == [4, 4, 2]
        assert batches[0]["image"].shape == (4, 64, 64, 3)

    def test_drop_remainder(self, synthetic_image_root):
        ds = MVTecDataset(synthetic_image_root, "synthetic", "test", image_size=64)
        loader = Loader(ds, batch_size=4, drop_remainder=True, num_workers=0)
        assert [b["image"].shape[0] for b in loader] == [4, 4]

    def test_shuffle_changes_order_but_not_content(self, synthetic_image_root):
        ds = MVTecDataset(synthetic_image_root, "synthetic", "test", image_size=64)
        loader = Loader(ds, batch_size=10, shuffle=True, num_workers=0, seed=1)
        e1 = np.concatenate([b["label"] for b in loader])
        e2 = np.concatenate([b["label"] for b in loader])  # next epoch reshuffles
        assert sorted(e1.tolist()) == sorted(e2.tolist())

    def test_device_prefetch_passthrough(self, synthetic_image_root):
        ds = MVTecDataset(synthetic_image_root, "synthetic", "test", image_size=64)
        loader = Loader(ds, batch_size=4, num_workers=2)
        n = 0
        for batch in device_prefetch(iter(loader)):
            assert batch["image"].shape[1:] == (64, 64, 3)
            n += batch["image"].shape[0]
        assert n == len(ds)

    def test_collate_meta_keys(self):
        samples = [
            {"x": np.zeros(2), "path": "a"},
            {"x": np.ones(2), "path": "b"},
        ]
        batch = collate(samples)
        assert batch["x"].shape == (2, 2)
        assert batch["path"] == ["a", "b"]


class TestVideoDatasets:
    def test_ipad_window_count(self, synthetic_video_root):
        # 24 frames, L=8, stride 4 -> (24-8)/4+1 = 5 windows per video
        ds = IPADDataset(
            synthetic_video_root, "S01", "train", sequence_length=8, stride=4, image_size=64
        )
        assert len(ds) == 2 * 5
        s = ds[0]
        assert s["frames"].shape == (8, 64, 64, 3)
        assert s["label"] == 0

    def test_ipad_any_frame_labeling(self, synthetic_video_root):
        ds = IPADDataset(
            synthetic_video_root, "S01", "test", sequence_length=8, stride=4, image_size=64
        )
        assert ds.has_frame_labels
        # middle windows overlap the anomalous range -> label 1
        labels = ds.labels
        assert labels.max() == 1 and labels.min() == 0
        for w in ds.windows:
            assert w.label == int(np.any(w.frame_labels == 1))

    def test_detect_dataset_class(self, synthetic_video_root, tmp_path):
        assert detect_video_dataset_class(synthetic_video_root, "S01") is IPADDataset
        (tmp_path / "cat" / "train" / "good").mkdir(parents=True)
        assert detect_video_dataset_class(str(tmp_path), "cat") is VideoDataset

    def test_generic_video_dataset_from_frame_folders(self, tmp_path, synthetic_video_root):
        import shutil

        # build generic layout from the IPAD fixture's frame folders
        src = f"{synthetic_video_root}/S01/training/frames"
        dst = tmp_path / "cat" / "train" / "good"
        dst.mkdir(parents=True)
        shutil.copytree(f"{src}/00", dst / "00")
        ds = VideoDataset(str(tmp_path), "cat", "train", sequence_length=8, stride=8, image_size=64)
        assert len(ds) == 3  # (24-8)/8+1
        assert ds[0]["frames"].shape == (8, 64, 64, 3)

    def test_video_file_dataset(self, tmp_path):
        from vad_tpu.data.synthetic import create_synthetic_video_file

        path = create_synthetic_video_file(
            str(tmp_path / "clip.mp4"), n_frames=30, image_size=64
        )
        ds = VideoFileDataset(path, sequence_length=8, stride=4, image_size=64)
        assert len(ds) == (30 - 8) // 4 + 1
        s = ds[0]
        assert s["frames"].shape == (8, 64, 64, 3)
        assert s["original_frames"].shape == (8, 64, 64, 3)
        assert s["original_frames"].dtype == np.uint8

    def test_capture_handles_released_on_close(self, tmp_path):
        """Dataset teardown must release cv2.VideoCapture handles — the UI
        and serving churn through datasets in one long-lived process."""
        from vad_tpu.data.synthetic import create_synthetic_video_file

        path = create_synthetic_video_file(
            str(tmp_path / "clip3.mp4"), n_frames=16, image_size=64
        )
        ds = VideoFileDataset(path, sequence_length=4, stride=4, image_size=64)
        ds[0]
        assert ds._caps.open_handles() == 1
        ds.close()
        assert ds._caps.open_handles() == 0
        # still usable after close: handles reopen lazily
        s = ds[1]
        assert s["frames"].shape == (4, 64, 64, 3)
        assert ds._caps.open_handles() == 1
        # context-manager teardown
        with VideoFileDataset(path, sequence_length=4, stride=4, image_size=64) as ds2:
            ds2[0]
            assert ds2._caps.open_handles() == 1
        assert ds2._caps.open_handles() == 0

    def test_capture_pool_caps_per_thread_handles(self, tmp_path):
        """The per-thread pool is bounded: N distinct files keep at most
        max_per_thread open captures (oldest released first)."""
        from vad_tpu.data.synthetic import create_synthetic_video_file
        from vad_tpu.data.video_dataset import _CaptureCache

        paths = [
            create_synthetic_video_file(
                str(tmp_path / f"c{i}.mp4"), n_frames=6, image_size=64, seed=i
            )
            for i in range(4)
        ]
        cache = _CaptureCache(max_per_thread=2)
        for p in paths:
            frames = cache.read_window(p, 0, 2)
            assert len(frames) == 2
        assert cache.open_handles() == 2
        cache.close()
        assert cache.open_handles() == 0

    def test_frame_cache_concurrent_build_matches_serial_decode(self, tmp_path):
        """Cache construction decodes sources concurrently (one thread per
        source, per-thread capture stores). On an 8-video dataset every
        cached window must equal the uncached per-window decode."""
        from vad_tpu.data.synthetic import create_synthetic_video_file

        good = tmp_path / "cat" / "train" / "good"
        good.mkdir(parents=True)
        for i in range(8):
            create_synthetic_video_file(
                str(good / f"v{i}.mp4"), n_frames=12, image_size=64, seed=i
            )
        cached = VideoDataset(
            str(tmp_path), "cat", "train", sequence_length=4, stride=4, image_size=64
        )
        assert len(cached._cache) == 8  # all sources decoded up front
        uncached = VideoDataset(
            str(tmp_path), "cat", "train", sequence_length=4, stride=4,
            image_size=64, cache_frames=False,
        )
        assert not uncached._cache
        assert len(cached) == len(uncached) == 8 * 3  # (12-4)/4+1 per video
        for i in range(len(cached)):
            np.testing.assert_array_equal(
                cached[i]["frames"], uncached[i]["frames"]
            )

    def test_sequential_read_consistency(self, tmp_path):
        """Cached sequential decode must agree with fresh seeks."""
        from vad_tpu.data.synthetic import create_synthetic_video_file

        path = create_synthetic_video_file(
            str(tmp_path / "clip2.mp4"), n_frames=24, image_size=64
        )
        ds1 = VideoFileDataset(path, sequence_length=4, stride=4, image_size=64)
        seq_order = [ds1[i]["frames"] for i in range(len(ds1))]
        ds2 = VideoFileDataset(path, sequence_length=4, stride=4, image_size=64)
        rev_order = [ds2[i]["frames"] for i in reversed(range(len(ds2)))][::-1]
        for a, b in zip(seq_order, rev_order):
            np.testing.assert_array_equal(a, b)


class TestDataAcquisition:
    """kagglehub download path (reference download_data.py:56-82) with
    graceful degradation, and the manual category installer."""

    def test_install_mvtec_categories(self, tmp_path):
        from vad_tpu.data.synthetic import install_mvtec_categories

        src = tmp_path / "download"
        for cat in ("bottle", "cable"):
            (src / cat / "train" / "good").mkdir(parents=True)
            (src / cat / "train" / "good" / "0.png").write_bytes(b"x")
        dst = tmp_path / "data"
        (dst / "bottle").mkdir(parents=True)  # pre-existing: must be skipped
        install_mvtec_categories(src, dst)
        assert (dst / "cable" / "train" / "good" / "0.png").exists()
        assert not (dst / "bottle" / "train").exists()  # untouched

    def test_kagglehub_missing_degrades(self, capsys):
        """No kagglehub in this image: must print instructions, not raise."""
        from vad_tpu.data.synthetic import download_with_kagglehub

        assert download_with_kagglehub("/tmp/nonexistent-data") is None
        out = capsys.readouterr().out
        assert "manual" in out and "mvtec-ad" in out

    def test_kagglehub_download_failure_degrades(self, monkeypatch, capsys):
        import sys
        import types

        fake = types.ModuleType("kagglehub")
        fake.dataset_download = lambda name: (_ for _ in ()).throw(
            ConnectionError("no egress")
        )
        monkeypatch.setitem(sys.modules, "kagglehub", fake)
        from vad_tpu.data.synthetic import download_with_kagglehub

        assert download_with_kagglehub("/tmp/nonexistent-data") is None
        out = capsys.readouterr().out
        assert "Download failed: no egress" in out and "manual" in out

    def test_kagglehub_success_installs(self, monkeypatch, tmp_path):
        import sys
        import types

        src = tmp_path / "kaggle_cache"
        (src / "bottle" / "train" / "good").mkdir(parents=True)
        fake = types.ModuleType("kagglehub")
        fake.dataset_download = lambda name: str(src)
        monkeypatch.setitem(sys.modules, "kagglehub", fake)
        from vad_tpu.data.synthetic import download_with_kagglehub

        dst = tmp_path / "data"
        assert download_with_kagglehub(str(dst)) == str(src)
        assert (dst / "bottle" / "train" / "good").exists()

    def test_cli_kagglehub_method(self, capsys):
        from vad_tpu.data.synthetic import main

        main(["--method", "kagglehub", "--data-dir", "/tmp/nonexistent-data"])
        assert "mvtec-ad" in capsys.readouterr().out


class TestTexturedSynthetic:
    def test_layout_and_masks(self, tmp_path):
        from vad_tpu.data.synthetic import create_synthetic_textured_data

        base = create_synthetic_textured_data(
            str(tmp_path), "tex", n_train=3, n_test_good=2, n_test_defect=3,
            image_size=64,
        )
        ds = MVTecDataset(str(tmp_path), "tex", "test", image_size=64)
        assert len(ds) == 5
        for i in range(len(ds)):
            s = ds[i]
            if s["label"] == 1:
                assert s["mask"].max() > 0  # GT mask paired
        # deterministic regeneration
        import numpy as np
        from PIL import Image

        first = np.asarray(Image.open(base / "train" / "good" / "000.png"))
        create_synthetic_textured_data(
            str(tmp_path), "tex", n_train=3, n_test_good=2, n_test_defect=3,
            image_size=64,
        )
        again = np.asarray(Image.open(base / "train" / "good" / "000.png"))
        np.testing.assert_array_equal(first, again)

    def test_defects_are_subtle(self, tmp_path):
        """Textured defects shift pixels far less than the circle fixture."""
        from vad_tpu.data.synthetic import _textured_defect, _textured_surface
        import numpy as np

        img, mask = _textured_defect(7, 128)
        clean = _textured_surface(7, 128)
        m = mask > 0
        assert m.any()
        mean_shift = np.abs(
            img[m].astype(np.int16) - clean[m].astype(np.int16)
        ).mean()
        assert 3 <= mean_shift <= 60  # perturbed but low-contrast


def test_textured_video_fixture(tmp_path):
    """Temporal-anomaly fixture: patch motion is discordant, frames remain
    individually plausible texture."""
    from vad_tpu.data.synthetic import create_synthetic_textured_video_data
    from PIL import Image

    base = create_synthetic_textured_video_data(
        str(tmp_path), "tv", n_train_videos=1, n_test_videos=2,
        frames_per_video=20, image_size=64,
    )
    ds = IPADDataset(str(tmp_path), "tv", "test", sequence_length=8, stride=4, image_size=64)
    labels = ds.labels
    assert labels.max() == 1 and labels.min() == 0

    def best_shift_mismatch(a, b):
        # min over candidate global velocities of the pixel mismatch
        # between frame b and frame a shifted by that velocity (texture is
        # periodic, so np.roll models the scroll exactly)
        best = 1.0
        for vx in range(-3, 4):
            for vy in range(-3, 4):
                if vx == 0 and vy == 0:
                    continue
                rolled = np.roll(np.roll(a, -vy, axis=0), -vx, axis=1)
                best = min(best, float((rolled != b).any(axis=-1).mean()))
        return best

    la = np.load(base / "test_label" / "00.npy")
    anom = np.flatnonzero(la)
    frames_dir = base / "testing" / "frames" / "00"
    f = lambda t: np.asarray(Image.open(frames_dir / f"{t:04d}.png"))
    # normal consecutive pair: one global shift explains (almost) all pixels
    normal_mismatch = best_shift_mismatch(f(0), f(1))
    # anomalous consecutive pair: the counter-scrolling patch cannot be
    # explained by any single global shift
    mid = anom[len(anom) // 2]
    anom_mismatch = best_shift_mismatch(f(int(mid)), f(int(mid) + 1))
    assert normal_mismatch < 0.02
    assert anom_mismatch > normal_mismatch + 0.02


class _FakeDataset:
    """Indexable dataset whose samples encode their own index."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.float32), "label": np.int64(i % 2)}


class TestDistributedLoader:
    def test_host_slices_partition_every_global_batch(self):
        """Union of the P hosts' slices == the global batch, disjointly,
        for every step — simulated with explicit process_count/index."""
        from vad_tpu.data.loader import DistributedLoader
        from vad_tpu.parallel.sharding import get_mesh

        mesh = get_mesh()
        ds = _FakeDataset(10)
        pc = 4
        per_host = []
        for pi in range(pc):
            loader = DistributedLoader(
                ds, batch_size=8, mesh=mesh, pad_to=8, shuffle=True, seed=3,
                num_workers=0, process_count=pc, process_index=pi, assemble=False,
            )
            per_host.append(list(iter(loader)))
        n_batches = len(per_host[0])
        assert n_batches == 2  # ceil(10 / 8)
        for step in range(n_batches):
            slices = [per_host[pi][step][0]["x"][:, 0].astype(int) for pi in range(pc)]
            n_reals = {per_host[pi][step][1] for pi in range(pc)}
            assert len(n_reals) == 1  # every host agrees on the real count
            assert all(len(s) == 2 for s in slices)  # pad_to / pc each
            merged = np.concatenate(slices)
            assert len(merged) == 8
        # across the whole epoch the REAL samples cover the dataset exactly
        real = []
        for step in range(n_batches):
            n_real = per_host[0][step][1]
            merged = np.concatenate(
                [per_host[pi][step][0]["x"][:, 0].astype(int) for pi in range(pc)]
            )
            real.extend(merged[:n_real].tolist())
        assert sorted(real) == list(range(10))

    def test_padding_cycles_real_indices(self):
        """Pad slots cycle the real indices (not repeat-last): train-mode
        BN statistics over the padded batch then equal the unpadded
        batch's exactly whenever pad_to % n_real == 0 — the procedure-
        parity contract for training through tail batches (the torch
        reference trains its short last batch, train.py:128-134)."""
        from vad_tpu.data.loader import DistributedLoader
        from vad_tpu.parallel.sharding import get_mesh

        ds = _FakeDataset(5)
        loader = DistributedLoader(
            ds, batch_size=8, mesh=get_mesh(), pad_to=8, num_workers=0,
            process_count=1, process_index=0, assemble=False,
        )
        (batch, n_real), = list(iter(loader))
        assert n_real == 5
        vals = batch["x"][:, 0].astype(int)
        assert vals[:5].tolist() == [0, 1, 2, 3, 4]
        assert vals[5:].tolist() == [0, 1, 2]  # tail = cycled real indices

    def test_assembled_batches_are_data_sharded(self):
        """assemble=True yields global jax.Arrays sharded over 'data',
        numerically equal to the padded host batch."""
        import jax
        from jax.sharding import PartitionSpec as P

        from vad_tpu.data.loader import DistributedLoader
        from vad_tpu.parallel.sharding import get_mesh

        mesh = get_mesh()
        ds = _FakeDataset(12)
        loader = DistributedLoader(ds, batch_size=8, mesh=mesh, num_workers=2)
        batches = list(iter(loader))
        assert [n for _, n in batches] == [8, 4]
        for batch, n_real in batches:
            assert isinstance(batch["x"], jax.Array)
            assert batch["x"].sharding.spec == P("data")
            assert batch["x"].shape[0] == 8
        # shuffle off: contents are the identity order + cycled tail
        got = np.asarray(batches[1][0]["x"])[:, 0].astype(int)
        assert got.tolist() == [8, 9, 10, 11, 8, 9, 10, 11]

    def test_drop_remainder_and_epoch_reshuffle(self):
        from vad_tpu.data.loader import DistributedLoader
        from vad_tpu.parallel.sharding import get_mesh

        ds = _FakeDataset(12)
        loader = DistributedLoader(
            ds, batch_size=8, mesh=get_mesh(), shuffle=True, seed=0,
            num_workers=0, drop_remainder=True,
        )
        e1 = [np.asarray(b["x"])[:, 0].astype(int).tolist() for b, _ in iter(loader)]
        e2 = [np.asarray(b["x"])[:, 0].astype(int).tolist() for b, _ in iter(loader)]
        assert len(e1) == 1 and len(e2) == 1  # 12 // 8
        assert e1 != e2  # epoch-dependent shuffle

    def test_explicit_topology_requires_assemble_false(self):
        from vad_tpu.data.loader import DistributedLoader
        from vad_tpu.parallel.sharding import get_mesh

        with pytest.raises(ValueError, match="assemble"):
            DistributedLoader(
                _FakeDataset(4), 4, get_mesh(), process_count=2, process_index=0
            )
