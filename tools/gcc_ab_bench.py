"""A/B microbench: Pallas butterfly GCC vs the pure-XLA path on the real chip.

Round-2's "butterfly = 2.1-2.3x XLA" was measured while the axon tunnel
throttled the chip to a ~50 GB/s effective copy floor; round-3's healthy
tunnel measures a ~300 GB/s floor, so the comparison had to be re-run —
the butterfly kernel is VPU-bound (sublane-roll radix-2 stages), while
the XLA path was presumed HBM-bound, and a 6x faster HBM could have moved
the crossover.

MEASURED (2026-08-18, TPU v5e, healthy tunnel, 300 GB/s copy floor):
the butterfly still wins at every production shape — the XLA path does
not reach the HBM floor either (its rfft/irfft are also compute-limited
at these lengths), so the crossover never moved:

    B= 256 M= 4 n= 44100 nfft=131072  pallas  37.4 ms  xla  88.8 ms  x/p 2.37
    B= 192 M= 4 n= 44100 nfft= 65536  pallas  12.4 ms  xla  33.4 ms  x/p 2.70
                                      windowed-pallas 11.9 ms
    B= 256 M= 4 n=  4000 nfft=  8192  pallas   4.0 ms  xla   4.8 ms  x/p 1.20
    B= 128 M= 8 n= 16000 nfft= 32768  pallas  11.1 ms  xla  34.3 ms  x/p 3.10
                                      windowed-pallas 11.5 ms

The auto dispatch in ops/gccphat.gcc_phat_all_pairs therefore stands.

Usage:  PYTHONPATH=/root/.axon_site:/root/repo python tools/gcc_ab_bench.py
"""

import os
import time

import jax

os.makedirs("/root/.cache/jaxcomp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from pyaudiolocalization_tpu.ops import gccphat, pallas_fft

PAIRS_I = np.array([0, 0, 0, 1, 1, 2], np.int32)
PAIRS_J = np.array([1, 2, 3, 2, 3, 3], np.int32)


def _time(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters


def ab(batch, m, n, nfft, wq=None):
    key = jax.random.PRNGKey(0)
    sigs = jax.random.normal(key, (batch, m, n), jnp.float32)
    if m == 4:
        pi, pj = PAIRS_I, PAIRS_J
    else:
        pairs = np.array([(i, j) for i in range(m)
                          for j in range(i + 1, m)], np.int32)
        pi, pj = pairs[:, 0], pairs[:, 1]
    p = len(pi)

    @jax.jit
    def full_pallas(s):
        return jnp.max(gccphat.gcc_phat_all_pairs(s, pi, pj, nfft=nfft,
                                                  use_pallas="always"))

    @jax.jit
    def full_xla(s):
        return jnp.max(gccphat.gcc_phat_all_pairs(s, pi, pj, nfft=nfft,
                                                  use_pallas="never"))

    dt_p = _time(full_pallas, sigs)
    dt_x = _time(full_xla, sigs)
    line = (f"B={batch:4d} M={m:2d} n={n:6d} nfft={nfft:6d} P={p:3d}  "
            f"full: pallas {dt_p*1e3:7.2f} ms  xla {dt_x*1e3:7.2f} ms  "
            f"ratio x/p {dt_x/dt_p:5.2f}")
    if wq is not None and pallas_fft.bfly_gcc_eligible(nfft, m, jnp.float32):
        @jax.jit
        def win_pallas(s):
            w, st = pallas_fft.bfly_gcc_windowed(s, pi, pj, nfft, wq)
            return jnp.max(st)

        dt_w = _time(win_pallas, sigs)
        line += f"  windowed-pallas {dt_w*1e3:7.2f} ms"
    print(line, flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    # Headline bench shape (44.1 kHz x 1 s, alias-free nfft).
    ab(256, 4, 44100, 131072)
    # Sweep fast-path shape (circular pow2 nfft) + the windowed kernel.
    ab(192, 4, 44100, 65536, wq=6)
    # 16 kHz x 0.25 s scenes (hard-regime shape).
    ab(256, 4, 4000, 8192, wq=6)
    # 8-mic cube (28 pairs).
    ab(128, 8, 16000, 32768, wq=6)
