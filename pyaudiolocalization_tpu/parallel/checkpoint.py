"""Checkpoint/resume for long Monte-Carlo sweeps.

The reference has no persistence at all (SURVEY.md §5.4 — its only outputs
are a result dict and PNGs).  Large sweeps (BASELINE config 5: 10k+ scenes)
need restartability: ``run_sweep_checkpointed`` executes the sweep in chunks,
appends per-scene results to an .npz checkpoint after every chunk, and — keys
being derived deterministically from (seed, chunk index) — resumes exactly
where it stopped after a crash or preemption.
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
from typing import Optional

import jax
import numpy as np

from .sweep import SweepSpec, SceneResult, SweepSummary, monte_carlo_sweep

_FIELDS = ("estimate", "source", "error", "cost", "tdoas", "covariance")


def save_checkpoint(path: str, spec: SweepSpec, seed: int,
                    completed_chunks: int, chunk_scenes: int,
                    results: SceneResult) -> None:
    """Atomically write the sweep state + accumulated per-scene results."""
    payload = {f: np.asarray(getattr(results, f)) for f in _FIELDS}
    payload["completed_chunks"] = np.asarray(completed_chunks)
    payload["chunk_scenes"] = np.asarray(chunk_scenes)
    payload["seed"] = np.asarray(seed)
    payload["spec_repr"] = np.asarray(repr(dataclasses.asdict(spec)))
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str):
    """Returns (completed_chunks, chunk_scenes, seed, spec_repr,
    SceneResult) or None."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        if any(f not in z for f in _FIELDS):
            # Checkpoint from an older SceneResult layout: incompatible —
            # treat like a spec mismatch (restart) rather than KeyError.
            return None
        results = SceneResult(*(z[f] for f in _FIELDS))
        return (int(z["completed_chunks"]), int(z["chunk_scenes"]),
                int(z["seed"]), str(z["spec_repr"]), results)


def _concat(a: SceneResult, b: SceneResult) -> SceneResult:
    return SceneResult(*(np.concatenate([np.asarray(x), np.asarray(y)], 0)
                         for x, y in zip(a, b)))


def run_sweep_checkpointed(spec: SweepSpec,
                           seed: int,
                           num_scenes: int,
                           chunk_scenes: int,
                           checkpoint_path: str,
                           mesh=None,
                           hit_threshold: float = 0.1,
                           resume: bool = True,
                           log_fn=None) -> SweepSummary:
    """Run ``num_scenes`` scenes in chunks of ``chunk_scenes``, checkpointing
    after each chunk; a rerun with the same arguments resumes from the last
    completed chunk and produces bit-identical results to an uninterrupted
    run (chunk keys are fold_in(seed-key, chunk_index))."""
    if num_scenes % chunk_scenes != 0:
        raise ValueError("num_scenes must be a multiple of chunk_scenes")
    num_chunks = num_scenes // chunk_scenes
    base_key = jax.random.PRNGKey(seed)

    start = 0
    accumulated: Optional[SceneResult] = None
    if resume:
        state = load_checkpoint(checkpoint_path)
        if state is not None:
            done, saved_chunk, saved_seed, saved_spec, results = state
            # A checkpoint from a different spec/seed/chunking must not be
            # continued — mixed-sweep results would be silently wrong.
            if (saved_chunk == chunk_scenes and saved_seed == seed
                    and saved_spec == repr(dataclasses.asdict(spec))):
                start = done
                accumulated = results
                if log_fn:
                    log_fn(f"resuming at chunk {start}/{num_chunks}")

    for idx in range(start, num_chunks):
        key = jax.random.fold_in(base_key, idx)
        summary = monte_carlo_sweep(spec, key, chunk_scenes, mesh=mesh,
                                    hit_threshold=hit_threshold)
        chunk_np = SceneResult(*(np.asarray(x) for x in summary.results))
        accumulated = chunk_np if accumulated is None else _concat(
            accumulated, chunk_np)
        save_checkpoint(checkpoint_path, spec, seed, idx + 1, chunk_scenes,
                        accumulated)
        if log_fn:
            log_fn(f"chunk {idx + 1}/{num_chunks} done "
                   f"({(idx + 1) * chunk_scenes} scenes)")

    err = np.asarray(accumulated.error)
    return SweepSummary(
        rmse=np.sqrt(np.mean(err ** 2)),
        mean_error=np.mean(err),
        hit_rate=np.mean(err < hit_threshold),
        results=accumulated)
