"""Benchmark: batched GCC-PHAT + end-to-end localization on the real chip.

Prints ONE JSON line. Headline metric = GCC-PHAT mic-pairs/sec at
44.1 kHz x 1 s (BASELINE.md: reference serial CPU = 23.3 pairs/s, measured
on phat_correlation, utils.py:108-119). Extras carry the end-to-end
scenes/sec (reference 1.23 scenes/s, main.py:126-333).

Timing protocol: the axon tunnel's ``block_until_ready`` is a no-op, so each
step returns a SMALL output (scalar / (B,3)) and we enqueue ``iters`` steps
back-to-back, then fetch the last output to the host — the device queue is
serial, so the wall time covers all enqueued executions.
"""

import json
import os
import time

import jax

# Persistent compile cache: the axon remote-compile path takes minutes for
# sizable graphs; cached reruns start in seconds.
os.makedirs("/root/.cache/jaxcomp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from pyaudiolocalization_tpu.ops import gccphat
from pyaudiolocalization_tpu.parallel import (SweepSpec, localize_batch,
                                              monte_carlo_sweep)

BASELINE_PAIRS_PER_SEC = 23.3   # BASELINE.md row 1
BASELINE_SCENES_PER_SEC = 1.23  # BASELINE.md row 3

FS = 44100.0
N = 44100           # 1 s
NUM_MICS = 4
PAIRS_I = np.array([0, 0, 0, 1, 1, 2], np.int32)
PAIRS_J = np.array([1, 2, 3, 2, 3, 3], np.int32)
NFFT = 131072       # next power of two above n1+n2-1 = 88199


def _sync(x):
    """Force completion: fetch (a small piece of) x to the host."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf)


def _time(fn, *args, iters=8, warmup=2):
    """Median-free honest mean: enqueue ``iters`` steps, one sync at the end.
    fn must return a small array (so the final fetch is cheap)."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync(outs[-1])
    return (time.perf_counter() - t0) / iters


def bench_gcc_phat(batch: int = 256):
    """Batched all-pairs GCC-PHAT: (B, M, N) -> (B, P, NFFT) -> scalar."""
    key = jax.random.PRNGKey(0)
    signals = jax.random.normal(key, (batch, NUM_MICS, N), jnp.float32)

    @jax.jit
    def step(sigs):
        corr = gccphat.gcc_phat_all_pairs(sigs, PAIRS_I, PAIRS_J, nfft=NFFT)
        # Tiny reduction so the step's output transfer is one float.
        return jnp.max(corr)

    dt = _time(step, signals)
    pairs = batch * PAIRS_I.shape[0]
    return pairs / dt


def bench_localize(batch: int = 256):
    """End-to-end estimation (filter -> GCC-PHAT -> TDOA -> clustered init ->
    multi-start LM) on 4-mic scenes at 44.1 kHz x 1 s."""
    spec = SweepSpec(fs=FS, duration=1.0, signal_type="noise",
                     source_box_lo=(0.1, 0.1, 0.1),
                     source_box_hi=(0.9, 0.9, 0.9))
    mics = jnp.asarray(spec.mic_positions, jnp.float32)
    key = jax.random.PRNGKey(1)
    # Synthetic broadband inputs: bench measures the estimation path.
    signals = jax.random.normal(key, (batch, NUM_MICS, spec.num_samples),
                                jnp.float32)

    @jax.jit
    def step(sigs, k):
        est, cost, td = localize_batch(spec, sigs, mics, k)
        return est

    dt = _time(step, signals, jax.random.PRNGKey(2), iters=6, warmup=1)
    return batch / dt


def bench_full_sweep(batch: int = 512):
    """FULL pipeline throughput: randomized scene -> multipath simulate ->
    filter -> GCC-PHAT -> TDOA -> solve, all on device (44.1 kHz x 1 s,
    4 mics).  The reference needs 0.485 s (simulate) + 0.814 s (localize)
    per scene serially."""
    spec = SweepSpec(fs=FS, duration=1.0, signal_type="noise",
                     source_box_lo=(0.1, 0.1, 0.1),
                     source_box_hi=(0.9, 0.9, 0.9), snr_db=(20.0, 40.0))

    def step(i):
        return monte_carlo_sweep(spec, jax.random.PRNGKey(i), batch)

    out = step(0)
    _sync(out.rmse)
    t0 = time.perf_counter()
    iters = 3
    outs = [step(1 + i) for i in range(iters)]
    _sync(outs[-1].rmse)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, float(outs[-1].rmse)


def bench_multi_source(batch: int = 128):
    """Two simultaneous incoherent sources per scene, localized with
    suppression SRP-PHAT over an 8-mic cube (new capability — the
    reference is strictly single-source)."""
    mics8 = ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
             (0.0, 0.0, 1.0), (1.0, 1.0, 0.0), (1.0, 0.0, 1.0),
             (0.0, 1.0, 1.0), (1.0, 1.0, 1.0))
    spec = SweepSpec(fs=16000.0, duration=0.25, signal_type="noise",
                     mic_positions=mics8, solver="srp", num_sources=2,
                     source_min_separation=0.4,
                     source_box_lo=(0.1, 0.1, 0.1),
                     source_box_hi=(0.9, 0.9, 0.9), snr_db=(20.0, 40.0))

    def step(i):
        return monte_carlo_sweep(spec, jax.random.PRNGKey(i), batch)

    out = step(0)
    _sync(out.rmse)
    t0 = time.perf_counter()
    iters = 3
    outs = [step(1 + i) for i in range(iters)]
    _sync(outs[-1].rmse)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, float(outs[-1].rmse)


def main():
    pairs_per_sec = bench_gcc_phat()
    scenes_per_sec = bench_localize()
    sweep_per_sec, sweep_rmse = bench_full_sweep()
    multi_per_sec, multi_rmse = bench_multi_source()
    print(json.dumps({
        "metric": "gccphat_pairs_per_sec_44k1x1s",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 1),
        "extra": {
            "localize_scenes_per_sec": round(scenes_per_sec, 2),
            "localize_vs_baseline": round(
                scenes_per_sec / BASELINE_SCENES_PER_SEC, 1),
            "full_sweep_scenes_per_sec": round(sweep_per_sec, 2),
            "full_sweep_rmse_m": round(sweep_rmse, 4),
            "multi_source_scenes_per_sec": round(multi_per_sec, 2),
            "multi_source_rmse_m": round(multi_rmse, 4),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
