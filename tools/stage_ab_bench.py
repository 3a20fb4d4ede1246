"""A/B microbench: hybrid sliced-stage butterfly vs the all-roll schedule.

The butterfly engine is VPU-compute-bound in its radix-2 stages (CLAUDE.md
round-3 measured fact: fused GCC reaches ~44 GB/s vs the healthy tunnel's
~300 GB/s HBM floor).  The all-roll schedule evaluates BOTH butterfly
branches over the full plane and selects (2x flops) and spends 4 sublane
rolls per stage; stages with half-distance h >= 8 sublanes can instead
pair contiguous 8-aligned block halves on a (blocks, m, 128) view — exact
flops, zero rolls.  This tool measures both schedules on the fused GCC
kernels at the production shapes and checks on-chip numerical agreement.

Usage:  PYTHONPATH=/root/.axon_site:/root/repo python tools/stage_ab_bench.py
"""

import os
import time

import jax

os.makedirs("/root/.cache/jaxcomp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from pyaudiolocalization_tpu.ops import pallas_fft

PAIRS_I = np.array([0, 0, 0, 1, 1, 2], np.int32)
PAIRS_J = np.array([1, 2, 3, 2, 3, 3], np.int32)
_PROD_RADIX4 = pallas_fft._RADIX4_SLICED
_PROD_ILP_FWD = pallas_fft._ILP_FWD
_PROD_ILP_INV = pallas_fft._ILP_INV
_PROD_BF3 = pallas_fft._LANE_BF16X3


def _time(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters


# (sliced-stages flag, within-tile mode, radix4, ilp chains, bf16x3
# lane-DFT flag) per named schedule.  'sliced' was round 3's production
# schedule; 'sliced+tile8' replaces the h=4,2,1 roll+select stages with
# the composed 8x8 tile transform; 'ilp2' stacks two independent
# transforms per cascade (VERDICT r4 #2 — fill dependency/issue stalls
# with independent work); 'bf3'/'ilp2+bf3' drop the lane-DFT matmul
# from HIGHEST (bf16_6x) to a manual bf16x3 split (3 native MXU passes) — re-probe of the round-1
# negative now that the sliced/tile8/radix-4 work shrank the VPU share.
SCHEDULES = {
    "all-roll": (False, "roll", False, 1, False),
    "sliced": (True, "roll", False, 1, False),
    "tile8": (True, "slice", False, 1, False),
    "bcast": (True, "bcast", False, 1, False),
    "subslice": (True, "subslice", False, 1, False),
    "radix4": (True, "bcast", True, 1, False),
    "prod": (True, "bcast", True, 1, False),
    "ilp2": (True, "bcast", True, 2, False),
    "ilpfwd": (True, "bcast", True, (2, 1), False),
    "ilpinv": (True, "bcast", True, (1, 2), False),
    "bf3": (True, "bcast", True, 1, True),
    "ilp2+bf3": (True, "bcast", True, 2, True),
}


def _set_schedule(schedule):
    sliced, tile8, radix4, ilp, bf3 = SCHEDULES[schedule]
    pallas_fft._SLICED_STAGES = sliced
    pallas_fft._TILE8_MODE = tile8
    pallas_fft._RADIX4_SLICED = radix4
    fwd, inv = ilp if isinstance(ilp, tuple) else (ilp, ilp)
    pallas_fft._ILP_FWD = fwd
    pallas_fft._ILP_INV = inv
    pallas_fft._LANE_BF16X3 = bf3


def ab(batch, m, n, nfft, wq=None,
       schedules=("sliced", "tile8", "bcast", "subslice")):
    key = jax.random.PRNGKey(0)
    sigs = jax.random.normal(key, (batch, m, n), jnp.float32)
    if m == 4:
        pi, pj = PAIRS_I, PAIRS_J
    else:
        pairs = np.array([(i, j) for i in range(m)
                          for j in range(i + 1, m)], np.int32)
        pi, pj = pairs[:, 0], pairs[:, 1]

    def run(schedule, windowed):
        _set_schedule(schedule)

        # Reduce ON DEVICE: fetching the full (B, P, nfft) tensor through
        # the tunnel would dominate (and wildly vary) the measurement.
        if windowed:
            @jax.jit
            def fn(s):
                w, st = pallas_fft.bfly_gcc_windowed(s, pi, pj, nfft, wq)
                return jnp.max(w), jnp.sum(w), jnp.max(st)
        else:
            @jax.jit
            def fn(s):
                c = pallas_fft.bfly_gcc_all_pairs(s, pi, pj, nfft=nfft)
                return jnp.max(c), jnp.sum(c), jnp.float32(0)
        dt = _time(fn, sigs)
        return dt, np.asarray(jnp.stack(fn(sigs)))

    base = schedules[0]
    for windowed in ([False, True] if wq else [False]):
        dt_base, out_base = run(base, windowed)
        tag = "win " if windowed else "full"
        line = (f"B={batch:4d} M={m:2d} n={n:6d} nfft={nfft:6d} {tag}: "
                f"{base} {dt_base*1e3:7.2f} ms")
        scale = np.max(np.abs(out_base)) or 1.0
        for sched in schedules[1:]:
            dt, out = run(sched, windowed)
            err = np.max(np.abs(out_base - out)) / scale
            line += (f"  {sched} {dt*1e3:7.2f} ms "
                     f"({dt_base/dt:5.2f}x, err {err:.1e})")
        print(line, flush=True)
    # restore the production schedule
    pallas_fft._SLICED_STAGES = True
    pallas_fft._TILE8_MODE = "bcast"
    pallas_fft._RADIX4_SLICED = _PROD_RADIX4
    pallas_fft._ILP_FWD = _PROD_ILP_FWD
    pallas_fft._ILP_INV = _PROD_ILP_INV
    pallas_fft._LANE_BF16X3 = _PROD_BF3


def render_abs(batch, m, paths, n, nfft):
    """Absolute render-kernel timing (tracks the separable-ramp change —
    the old full-plane cos/sin ramp synthesis is gone, so this is not an
    in-process A/B; compare against the committed history)."""
    key = jax.random.PRNGKey(1)
    base = jax.random.normal(key, (batch, n), jnp.float32)
    delays = jax.random.uniform(jax.random.PRNGKey(2), (batch, m, paths),
                                jnp.float32, 0.0, 0.05)
    gains = jax.random.uniform(jax.random.PRNGKey(3), (batch, m, paths),
                               jnp.float32, 0.1, 1.0)

    @jax.jit
    def fn(b, d, g):
        out = pallas_fft.bfly_delay_sum(b, d, g, 16000.0, nfft, n,
                                        finalize=True)
        return jnp.max(out), jnp.sum(out)

    dt = _time(fn, base, delays, gains)
    print(f"B={batch:4d} M={m:2d} paths={paths} n={n:6d} nfft={nfft:6d} "
          f"render: {dt*1e3:7.2f} ms  ({dt/batch*1e6:6.1f} us/scene)",
          flush=True)


def scene_mono_vs_split(batch, m, paths, n, nfft, wq=6):
    """Whole-scene mono kernel vs the render-kernel -> windowed-GCC split
    (round-1 measurement: mono was SLOWER, 106 vs 87.5 us/scene at the
    all-roll schedule; re-probed after the sliced stages + MXU ramps)."""
    key = jax.random.PRNGKey(1)
    base = jax.random.normal(key, (batch, n), jnp.float32)
    delays = jax.random.uniform(jax.random.PRNGKey(2), (batch, m, paths),
                                jnp.float32, 0.0, 0.01)
    gains = jax.random.uniform(jax.random.PRNGKey(3), (batch, m, paths),
                               jnp.float32, 0.1, 1.0)
    if m == 4:
        pi, pj = PAIRS_I, PAIRS_J
    else:
        pairs = np.array([(i, j) for i in range(m)
                          for j in range(i + 1, m)], np.int32)
        pi, pj = pairs[:, 0], pairs[:, 1]
    fs = 16000.0

    @jax.jit
    def split(b, d, g):
        sigs = pallas_fft.bfly_delay_sum(b, d, g, fs, nfft, n,
                                         finalize=True)
        w, st = pallas_fft.bfly_gcc_windowed(sigs, pi, pj, nfft, wq)
        return jnp.max(w), jnp.max(st)

    @jax.jit
    def mono(b, d, g):
        w, st = pallas_fft.bfly_scene_windowed(b, d, g, pi, pj, fs, nfft,
                                               n, wq)
        return jnp.max(w), jnp.max(st)

    dt_s = _time(split, base, delays, gains)
    dt_m = _time(mono, base, delays, gains)
    print(f"B={batch:4d} M={m:2d} paths={paths} n={n:6d} nfft={nfft:6d} "
          f"split {dt_s/batch*1e6:6.1f} us/scene  "
          f"mono {dt_m/batch*1e6:6.1f} us/scene  s/m {dt_s/dt_m:5.2f}",
          flush=True)


if __name__ == "__main__":
    import sys
    print("devices:", jax.devices(), flush=True)
    if "ilp" in sys.argv:
        # Focused A/B: production schedule vs stacked-chain ILP and the
        # lane-DFT precision re-probe (VERDICT r4 #2).
        S = ("prod", "ilp2", "ilpfwd", "ilpinv", "bf3", "ilp2+bf3")
        ab(256, 4, 44100, 131072, schedules=S)
        ab(192, 4, 44100, 65536, wq=6, schedules=S)
        ab(256, 4, 4000, 8192, wq=6, schedules=S)
        ab(128, 8, 16000, 32768, wq=6, schedules=S)
    elif "radix4" in sys.argv:
        # Focused A/B: production bcast schedule vs radix-4 fused pairs.
        ab(256, 4, 44100, 131072, schedules=("bcast", "radix4"))
        ab(192, 4, 44100, 65536, wq=6, schedules=("bcast", "radix4"))
        ab(256, 4, 4000, 8192, wq=6, schedules=("bcast", "radix4"))
        ab(128, 8, 16000, 32768, wq=6, schedules=("bcast", "radix4"))
    else:
        ab(256, 4, 44100, 131072)
        ab(192, 4, 44100, 65536, wq=6)
        ab(256, 4, 4000, 8192, wq=6)
        ab(128, 8, 16000, 32768, wq=6)
        render_abs(128, 4, 10, 44100, 65536)
        render_abs(128, 4, 10, 4000, 8192)
        scene_mono_vs_split(128, 4, 10, 44100, 65536)
