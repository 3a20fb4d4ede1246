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


def _time(fn, *args, iters=8, warmup=2, blocks=1):
    """Median-free honest mean: enqueue ``iters`` steps, one sync at the end.
    fn must return a small array (so the final fetch is cheap).
    ``blocks`` > 1 repeats the whole enqueue-sync block and also returns the
    relative spread across blocks (tunnel variance bars — VERDICT.md r1 §6)."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    dts = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        _sync(outs[-1])
        dts.append((time.perf_counter() - t0) / iters)
    if blocks == 1:
        return dts[0]
    mean = sum(dts) / blocks
    rel_spread = (max(dts) - min(dts)) / mean
    return mean, rel_spread


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

    dt, spread = _sweep_time(step, batch)
    return batch / dt, float(np.asarray(step(0).rmse)), spread


def bench_reverberant_sweep(batch: int = 512):
    """Reverberant-room pipeline: 6 reflective planes at order 2 = 37
    render paths per mic (the EVALUATION.md hard-regime room), SRP-PHAT
    solver, 16 kHz x 0.25 s.  Exercises the multipath render at high path
    count — the rank-P MXU ramp synthesis is the difference between ~8.3
    us/scene/path and a flat ~70 us/scene render here."""
    spec = SweepSpec(fs=16000.0, duration=0.25, signal_type="noise",
                     source_box_lo=(0.2, 0.2, 0.2),
                     source_box_hi=(0.8, 0.8, 0.8), snr_db=(10.0, 25.0),
                     solver="srp",
                     plane_coeffs=((1.0, 0, 0, 0.5), (1.0, 0, 0, -5.5),
                                   (0, 1.0, 0, 0.5), (0, 1.0, 0, -6.5),
                                   (0, 0, 1.0, 0.5), (0, 0, 1.0, -3.0)),
                     plane_material_ids=(1, 1, 2, 2, 1, 1),
                     max_reflections=2)

    def step(i):
        return monte_carlo_sweep(spec, jax.random.PRNGKey(i), batch)

    dt, spread = _sweep_time(step, batch)
    return batch / dt, float(np.asarray(step(0).rmse)), spread


def _sweep_time(step, batch, iters=3, blocks=3):
    """Blocked sweep timing with a relative spread across blocks."""
    out = step(0)
    _sync(out.rmse)
    dts = []
    for b in range(blocks):
        t0 = time.perf_counter()
        outs = [step(1 + b * iters + i) for i in range(iters)]
        _sync(outs[-1].rmse)
        dts.append((time.perf_counter() - t0) / iters)
    mean = sum(dts) / blocks
    return mean, (max(dts) - min(dts)) / mean


def bench_bootstrap(num_bootstrap: int = 1000,
                    bootstrap_mode: str = "permutation", iters: int = 4):
    """The reference's dominant cost: the bootstrap significance test over
    all 6 pairs at 1000 PHAT resamples each (≈258 s of the 274 s default
    run — /root/reference/utils.py:183-216, BASELINE.md rows 4-5).  Here
    the resamples are chunked packed-pair FFTs inside one jitted call.
    Measured in BOTH modes: 'permutation' (parity-exact; per-draw sort
    dominates) and 'noise' (the physical-mode surrogate — in-kernel noise
    rows, no sort; distribution-equal, tests/test_bootstrap_noise.py)."""
    from pyaudiolocalization_tpu.models import tdoa as tdoa_ops

    key = jax.random.PRNGKey(5)
    signals = jax.random.normal(key, (NUM_MICS, N), jnp.float32)

    @jax.jit
    def step(sigs, k):
        thr = jax.vmap(
            lambda s1, s2, kk: tdoa_ops.bootstrap_significance(
                s1, s2, kk, num_bootstrap=num_bootstrap, nfft=NFFT,
                bootstrap_mode=bootstrap_mode)
        )(jnp.take(sigs, PAIRS_I, 0), jnp.take(sigs, PAIRS_J, 0),
          jax.random.split(k, PAIRS_I.shape[0]))
        return jnp.max(thr)

    dt = _time(step, signals, jax.random.PRNGKey(6), iters=iters, warmup=1)
    return PAIRS_I.shape[0] * num_bootstrap / dt


def bench_analyze_run():
    """End-to-end wall time of the reference's full default ``__main__``
    (chirp calibration + analyze_correlation localization with 1000
    bootstraps + saved figures — main.py:335-347; reference: 274.4 s,
    BASELINE.md row 4).  Warm timing: one compile pass, then a timed run
    with a different seed (seed feeds PRNG key VALUES, so no recompile)."""
    import logging
    logging.disable(logging.INFO)  # demo logs are not part of the metric
    from pyaudiolocalization_tpu.__main__ import main as demo_main
    try:
        demo_main(["--no-plots", "--seed", "0"])   # compile/cache warmup
        t0 = time.perf_counter()
        demo_main(["--no-plots", "--seed", "1"])
        return time.perf_counter() - t0
    finally:
        logging.disable(logging.NOTSET)


def bench_single_scene_latency():
    """Warm single-scene latency of physical-mode localize_sound_source
    (analyze/visualize off) INCLUDING host orchestration — the
    reference-shaped API's interactive cost (reference: 0.814 s,
    BASELINE.md row 3).  Eligible shapes dispatch the fused windowed
    Pallas core (api._estimation_core_fast)."""
    import copy
    from pyaudiolocalization_tpu import localize_sound_source, DEFAULT_CONFIG

    cfg = copy.deepcopy(DEFAULT_CONFIG)
    cfg["signal_type"] = "noise"
    loc = cfg["localization"]
    loc.update(lag_mode="physical", sync_mode="none",
               analyze_correlation=False, visualize_correlation=False,
               max_expected_delay=0.05)

    def run(seed):
        return localize_sound_source(cfg, use_simulation=True,
                                     show_plots=False,
                                     key=jax.random.PRNGKey(seed))

    run(0)  # compile
    times = []
    for s in range(1, 6):
        t0 = time.perf_counter()
        run(s)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


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

    dt, spread = _sweep_time(step, batch)
    return batch / dt, float(np.asarray(step(0).rmse)), spread


def bench_hbm_roofline(batch: int = 192):
    """Roofline check: achieved HBM bytes/s of the production fused GCC
    path vs the chip's measured elementwise copy floor (~50 GB/s effective
    through the tunnel — CLAUDE.md key measured fact).  Makes the
    "HBM-bound, nothing left on the table" claim falsifiable from bench
    output: the fused path's *useful* traffic (inputs once + padded staging
    + windowed outputs, counted analytically below) should run at >=~0.8x
    the floor; a traffic regression shows up as a falling ratio.

    Floor protocol: an in-jit lax.scan of ``rep`` elementwise steps over a
    256 MB carry — each step must round-trip HBM (carry >> VMEM), so
    bytes = rep * 2 * size, and the single dispatch amortizes the ~3 ms
    host call cost."""
    from pyaudiolocalization_tpu.ops import pallas_fft

    size = 64 * 2 ** 20                      # elements; 256 MB f32 >> VMEM
    rep = 8
    x = jax.random.normal(jax.random.PRNGKey(9), (size,), jnp.float32)

    @jax.jit
    def copy_step(x):
        def body(c, _):
            return c * 1.0000001, None
        y, _ = jax.lax.scan(body, x, None, length=rep)
        return y[:8].sum()

    dt = _time(copy_step, x, iters=4, warmup=2)
    floor_gbps = rep * 2.0 * size * 4 / dt / 1e9

    # Fused windowed GCC: the sweep/API fast path's kernel.  Traffic model
    # (f32): read signals (M, N) once; write+read the nfft-padded staging
    # block the pallas_call consumes (2 * M * nfft); write the (P, 2*wq*128)
    # window slices + (P, 3) stats.
    n = N
    nfft = 65536                             # circular next_pow2(n)
    wq = 6                                   # covers the 4-mic array's lags
    assert pallas_fft.bfly_gcc_eligible(nfft, NUM_MICS, jnp.float32)
    signals = jax.random.normal(jax.random.PRNGKey(10),
                                (batch, NUM_MICS, n), jnp.float32)

    @jax.jit
    def gcc_step(sigs):
        win, stats = pallas_fft.bfly_gcc_windowed(sigs, PAIRS_I, PAIRS_J,
                                                  nfft, wq)
        return jnp.max(stats)

    dt_gcc = _time(gcc_step, signals, iters=8, warmup=2)
    p = PAIRS_I.shape[0]
    per_scene = 4.0 * (NUM_MICS * n + 2 * NUM_MICS * nfft
                       + p * 2 * wq * 128 + p * 3)
    gcc_gbps = batch * per_scene / dt_gcc / 1e9
    return floor_gbps, gcc_gbps, dt_gcc, (batch, NUM_MICS, p, nfft)


def _bfly_flops(nfft: int, num_transforms: int, num_whitens: int,
                ramp_paths_x_mics: int = 0):
    """Analytic implemented-FLOP model of the butterfly kernels, split by
    execution unit (VERDICT r3 #6: report MFU-style utilization, not just
    multipliers).

    Per length-nfft transform (fwd or packed inverse — same chain):
      MXU: the 128-point lane DFT = 4 real (N2,128)@(128,128) matmuls
           = 8 * 128 * nfft flops (the only super-FFT term).
      VPU: log2(N2) radix-2 stages at ~10 flops per butterfly (5/elt)
           + the long-twiddle complex multiply (6/elt).
    Whitening per pair: cross-spectrum + magnitude + divide,
    ~20 flops/elt.  The render's rank-P MXU ramp synthesis contracts the
    path axis twice (hr, hi) per mic: ~8 flops/elt per (mic x path)."""
    import math
    n2 = nfft // 128
    mxu = num_transforms * 8 * 128 * nfft \
        + ramp_paths_x_mics * 8 * nfft
    vpu = num_transforms * (5 * math.log2(n2) + 6) * nfft \
        + num_whitens * 20 * nfft
    return mxu, vpu


def bench_scene_kernel(batch: int = 128, paths: int = 10):
    """Whole-scene mono kernel (render + noise + GCC + window) at the sweep
    production shape, for the utilization report."""
    from pyaudiolocalization_tpu.ops import pallas_fft

    n = N
    nfft = 65536
    wq = 6
    base = jax.random.normal(jax.random.PRNGKey(14), (batch, n), jnp.float32)
    delays = jax.random.uniform(jax.random.PRNGKey(15),
                                (batch, NUM_MICS, paths), jnp.float32,
                                0.0, 0.01)
    gains = jax.random.uniform(jax.random.PRNGKey(16),
                               (batch, NUM_MICS, paths), jnp.float32,
                               0.1, 1.0)

    @jax.jit
    def step(b, d, g):
        win, stats = pallas_fft.bfly_scene_windowed(
            b, d, g, PAIRS_I, PAIRS_J, FS, nfft, n, wq)
        return jnp.max(stats)

    dt = _time(step, base, delays, gains, iters=6, warmup=2)
    return dt, (batch, NUM_MICS, PAIRS_I.shape[0], paths, nfft)


def bench_compute_roofline():
    """Measured per-unit peaks at the kernels' own precision/contraction
    shapes, so the utilization figures divide by an achievable number, not
    a datasheet.  Two failure modes had to be engineered out (both
    "measured" ceilings BELOW what the kernels themselves achieve):
    per-step work too small -> issue-latency/dispatch bound; and lax.scan
    carries round-tripping HBM every step -> HBM bound (a (16384,128)
    matmul chain clocked exactly its 16 MB-per-step HBM time).  So:
      VPU: scan whose BODY is several INDEPENDENT unrolled FMA chains —
           XLA fuses the unrolled ops into one kernel (each element loaded
           once per body, HBM amortized away) and the independent chains
           expose ILP across the FMA latency (measured on-chip: 1 chain
           2.38 TF, 4 chains 3.20, 8 chains 3.75; one long dependent
           chain only 0.67).
      MXU: a dependent chain of (4096,4096) HIGHEST-precision f32 matmuls
           (arithmetic intensity ~1365 flops/byte — compute-bound by
           construction).  K=N=128 is the MXU's native tile, so this
           big-contraction ceiling is the right roofline for the kernels'
           VMEM-resident (N2,128)@(128,128) lane-DFT matmuls too."""
    x = jax.random.normal(jax.random.PRNGKey(11), (512, 4096), jnp.float32)
    vpu_unroll, vpu_chains, vpu_len = 32, 8, 64

    @jax.jit
    def vpu_step(x):
        def body(c, _):
            cs = [c * (1.0 + 1e-7 * k) for k in range(vpu_chains)]
            for _ in range(vpu_unroll):
                cs = [ci * 1.0000001 + 1e-7 for ci in cs]
            out = cs[0]
            for ci in cs[1:]:
                out = out + ci
            return out, None
        y, _ = jax.lax.scan(body, x, None, length=vpu_len)
        return y[0, :8].sum()

    dt = _time(vpu_step, x, iters=4, warmup=2)
    # FMAs are 2 flops; the per-chain setup muls and cross-chain adds 1.
    vpu_flops_per_el = (2 * vpu_unroll * vpu_chains + 2 * vpu_chains - 1)
    vpu_peak = vpu_len * vpu_flops_per_el * float(x.size) / dt / 1e12

    w = jax.random.normal(jax.random.PRNGKey(12), (4096, 4096), jnp.float32)
    a = jax.random.normal(jax.random.PRNGKey(13), (4096, 4096), jnp.float32)
    mxu_len = 8

    @jax.jit
    def mxu_step(a, w):
        def body(c, _):
            return jnp.dot(c, w, precision=jax.lax.Precision.HIGHEST), None
        y, _ = jax.lax.scan(body, a, None, length=mxu_len)
        return y[0, :8].sum()

    dt = _time(mxu_step, a, w, iters=4, warmup=2)
    mxu_peak = mxu_len * 2.0 * 4096.0 ** 3 / dt / 1e12
    return vpu_peak, mxu_peak


BASELINE_ANALYZE_RUN_S = 274.4        # BASELINE.md row 4
BASELINE_BOOTSTRAP_PAIRS_PER_SEC = 6000.0 / 258.0  # row 5: 6 pairs x 1000
BASELINE_SINGLE_SCENE_S = 0.814       # row 3 (per-scene latency)


def main():
    pairs_per_sec = bench_gcc_phat()
    scenes_per_sec = bench_localize()
    sweep_per_sec, sweep_rmse, sweep_spread = bench_full_sweep()
    reverb_per_sec, reverb_rmse, reverb_spread = bench_reverberant_sweep()
    multi_per_sec, multi_rmse, multi_spread = bench_multi_source()
    boot_noise_pps = bench_bootstrap(bootstrap_mode="noise", iters=8)
    boot_perm_pps = bench_bootstrap(bootstrap_mode="permutation")
    floor_gbps, gcc_gbps, dt_gcc, gcc_shape = bench_hbm_roofline()
    vpu_peak, mxu_peak = bench_compute_roofline()
    dt_scene, scene_shape = bench_scene_kernel()
    latency_s = bench_single_scene_latency()
    analyze_s = bench_analyze_run()

    # MFU-style utilization (VERDICT r3 #6): analytic implemented flops /
    # wall time, vs the MEASURED per-unit peaks at the kernels' own shapes.
    gb, gm, gp, gnfft = gcc_shape
    gcc_mxu, gcc_vpu = _bfly_flops(gnfft, gm + (gp + 1) // 2, gp)
    gcc_mxu_tflops = gb * gcc_mxu / dt_gcc / 1e12
    gcc_vpu_tflops = gb * gcc_vpu / dt_gcc / 1e12
    sb, sm, sp, spaths, snfft = scene_shape
    s_mxu, s_vpu = _bfly_flops(
        snfft, 1 + (sm + 1) // 2 + sm + (sp + 1) // 2, sp,
        ramp_paths_x_mics=sm * spaths)
    scene_mxu_tflops = sb * s_mxu / dt_scene / 1e12
    scene_vpu_tflops = sb * s_vpu / dt_scene / 1e12
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
            "full_sweep_rel_spread": round(sweep_spread, 3),
            "reverb_scenes_per_sec": round(reverb_per_sec, 2),
            "reverb_rmse_m": round(reverb_rmse, 4),
            "reverb_rel_spread": round(reverb_spread, 3),
            "multi_source_scenes_per_sec": round(multi_per_sec, 2),
            "multi_source_rmse_m": round(multi_rmse, 4),
            "multi_source_rel_spread": round(multi_spread, 3),
            "bootstrap_pair_resamples_per_sec": round(boot_noise_pps, 1),
            "bootstrap_vs_baseline": round(
                boot_noise_pps / BASELINE_BOOTSTRAP_PAIRS_PER_SEC, 1),
            "bootstrap_permutation_resamples_per_sec": round(
                boot_perm_pps, 1),
            "bootstrap_permutation_vs_baseline": round(
                boot_perm_pps / BASELINE_BOOTSTRAP_PAIRS_PER_SEC, 1),
            "hbm_floor_gbps": round(floor_gbps, 2),
            "gcc_fused_hbm_gbps": round(gcc_gbps, 2),
            "gcc_fused_vs_floor": round(gcc_gbps / floor_gbps, 3),
            "vpu_peak_tflops": round(vpu_peak, 2),
            "mxu_f32_peak_tflops": round(mxu_peak, 2),
            "gcc_fused_mxu_tflops": round(gcc_mxu_tflops, 2),
            "gcc_fused_mxu_util": round(gcc_mxu_tflops / mxu_peak, 3),
            "gcc_fused_vpu_tflops": round(gcc_vpu_tflops, 2),
            "gcc_fused_vpu_util": round(gcc_vpu_tflops / vpu_peak, 3),
            "scene_kernel_mxu_tflops": round(scene_mxu_tflops, 2),
            "scene_kernel_mxu_util": round(scene_mxu_tflops / mxu_peak, 3),
            "scene_kernel_vpu_tflops": round(scene_vpu_tflops, 2),
            "scene_kernel_vpu_util": round(scene_vpu_tflops / vpu_peak, 3),
            "analyze_run_s": round(analyze_s, 3),
            "analyze_run_vs_baseline": round(
                BASELINE_ANALYZE_RUN_S / analyze_s, 1),
            "single_scene_latency_s": round(latency_s, 4),
            "single_scene_vs_baseline": round(
                BASELINE_SINGLE_SCENE_S / latency_s, 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
