"""REAL multi-process execution (jax.distributed.initialize + Gloo CPU
collectives): 2 spawned processes x 4 virtual devices each run the
actual training stack — DistributedLoader per-host slicing,
put_global_batch assembly, compiled sharded train steps with the
gradient all-reduce crossing the process boundary, checkpoint save on
process 0 — and the loss trajectory must match a single-process
8-device run of the same program.

This is the counterpart to tests/test_multihost.py, which covers the
slicing math with spoofed process indices; here `multihost.py`'s
``process_count > 1`` branches execute under an actual distributed
runtime (the round-3 review's §5.8 caveat)."""

import json

from vad_tpu.parallel.multiprocess_check import launch


def test_two_process_training_matches_single_process(tmp_path):
    result = launch(processes=2, local_devices=4, steps=2,
                    out_dir=str(tmp_path), timeout=900.0)
    assert result["ok"]
    assert len(result["multiproc_losses"]) == 2
    # per-process records really came from a 2-process runtime
    for p in range(2):
        rec = json.loads((tmp_path / "multiproc" / f"proc{p}.json").read_text())
        assert rec["process_count"] == 2
        assert rec["local_devices"] == 4
        assert rec["global_devices"] == 8


def test_two_process_tensor_parallel_matches_single_process(tmp_path):
    """Cross-process tp: the video model's gate convs shard over a
    'model' axis interleaved across the 2 processes, so the tp psum /
    checkpoint all-gather cross Gloo; trajectory must still match the
    single-process (2,2)-mesh control (§5.8 residual caveat)."""
    result = launch(processes=2, local_devices=2, steps=2,
                    out_dir=str(tmp_path), timeout=900.0, model_parallel=2)
    assert result["ok"]
    assert result["model_parallel"] == 2
    assert len(result["multiproc_losses"]) == 2
    for p in range(2):
        rec = json.loads((tmp_path / "multiproc" / f"proc{p}.json").read_text())
        assert rec["process_count"] == 2
        assert rec["local_devices"] == 2
        assert rec["global_devices"] == 4
