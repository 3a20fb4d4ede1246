"""Checkpoint/resume for chunked sweeps (parallel/checkpoint.py) and the
profiling hooks (utils/profiling.py) — SURVEY.md §5.1/§5.4 subsystems."""

import numpy as np
import pytest

from pyaudiolocalization_tpu.parallel import (
    SweepSpec, run_sweep_checkpointed, load_checkpoint)
from pyaudiolocalization_tpu.utils import profiling

SPEC = SweepSpec(fs=16000.0, duration=0.05, signal_type="noise",
                 source_box_lo=(0.2, 0.2, 0.2), source_box_hi=(0.8, 0.8, 0.8),
                 snr_db=(25.0, 35.0))


def test_checkpointed_sweep_runs_and_persists(tmp_path):
    path = str(tmp_path / "sweep.npz")
    out = run_sweep_checkpointed(SPEC, seed=7, num_scenes=8, chunk_scenes=4,
                                 checkpoint_path=path)
    assert out.results.estimate.shape == (8, 3)
    state = load_checkpoint(path)
    assert state is not None
    done, chunk, seed, spec_repr, results = state
    assert (done, chunk, seed) == (2, 4, 7)
    assert "16000.0" in spec_repr
    np.testing.assert_array_equal(results.error, np.asarray(out.results.error))


def test_checkpointed_sweep_resumes_bit_identical(tmp_path):
    full_path = str(tmp_path / "full.npz")
    full = run_sweep_checkpointed(SPEC, seed=3, num_scenes=8, chunk_scenes=4,
                                  checkpoint_path=full_path)

    # Simulate an interruption: run only the first chunk, then resume.
    part_path = str(tmp_path / "part.npz")
    run_sweep_checkpointed(SPEC, seed=3, num_scenes=4, chunk_scenes=4,
                           checkpoint_path=part_path)
    logs = []
    resumed = run_sweep_checkpointed(SPEC, seed=3, num_scenes=8,
                                     chunk_scenes=4,
                                     checkpoint_path=part_path,
                                     log_fn=logs.append)
    assert any("resuming at chunk 1" in m for m in logs)
    np.testing.assert_array_equal(np.asarray(resumed.results.estimate),
                                  np.asarray(full.results.estimate))
    np.testing.assert_allclose(float(resumed.rmse), float(full.rmse))


def test_checkpoint_mismatched_params_restart(tmp_path):
    """A checkpoint from a different chunking/seed/spec is ignored."""
    path = str(tmp_path / "sweep.npz")
    run_sweep_checkpointed(SPEC, seed=1, num_scenes=4, chunk_scenes=4,
                           checkpoint_path=path)
    logs = []
    out = run_sweep_checkpointed(SPEC, seed=2, num_scenes=4, chunk_scenes=4,
                                 checkpoint_path=path, log_fn=logs.append)
    assert not any("resuming" in m for m in logs)
    assert out.results.estimate.shape == (4, 3)
    # Different SPEC with same seed/chunking must also restart.
    other = SweepSpec(fs=16000.0, duration=0.05, signal_type="chirp",
                      source_box_lo=(0.2, 0.2, 0.2),
                      source_box_hi=(0.8, 0.8, 0.8), snr_db=(25.0, 35.0))
    logs2 = []
    run_sweep_checkpointed(other, seed=2, num_scenes=4, chunk_scenes=4,
                           checkpoint_path=path, log_fn=logs2.append)
    assert not any("resuming" in m for m in logs2)


def test_checkpoint_old_layout_restarts(tmp_path):
    """A pre-covariance checkpoint (older SceneResult layout) is treated
    as incompatible — load returns None instead of KeyError mid-resume."""
    path = str(tmp_path / "old.npz")
    np.savez(path, estimate=np.zeros((4, 3)), source=np.zeros((4, 3)),
             error=np.zeros(4), cost=np.zeros(4), tdoas=np.zeros((4, 6)),
             completed_chunks=np.asarray(1), chunk_scenes=np.asarray(4),
             seed=np.asarray(1), spec_repr=np.asarray("x"))
    assert load_checkpoint(path) is None


def test_checkpoint_validation(tmp_path):
    with pytest.raises(ValueError, match="multiple"):
        run_sweep_checkpointed(SPEC, seed=0, num_scenes=5, chunk_scenes=4,
                               checkpoint_path=str(tmp_path / "x.npz"))


def test_profiling_stage_registry():
    profiling.reset()
    with profiling.stage("unit-test-stage"):
        pass
    with profiling.stage("unit-test-stage"):
        pass
    rep = profiling.report()
    assert rep["unit-test-stage"]["calls"] == 2
    assert rep["unit-test-stage"]["total_s"] >= 0.0
    profiling.reset()
    assert "unit-test-stage" not in profiling.report()


def test_throughput_counter():
    c = profiling.ThroughputCounter()
    c.add(10)
    assert c.per_second > 0
