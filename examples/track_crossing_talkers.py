"""Track two CROSSING talkers with identity maintenance.

Two movers walk through each other's paths; the per-segment multi-source
SRP fixes come back in power order (which flips between segments), and at
the crossing a nearest-neighbor pairing would swap the tracks.
``track_multiple`` keeps identities with a momentum-gated exact K!
assignment + per-track Kalman/RTS smoothing; ``OnlineTracker`` does the
same causally, one hop at a time (streaming).

The first capture is piecewise-static (each segment renders the sources
at their segment-centre positions) to show the association layer on
clean per-segment fixes.  The last section renders the same walkers with
the genuinely MOVING WOLA render and runs ``motion='compensated'``:
intra-segment smear drops static per-segment multi-source detections to
~0.2-0.5 m, and the rate matched-filter bank + lag claiming +
prediction-steered refinement restores ~2-3 cm.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pyaudiolocalization_tpu.models import tracking
from pyaudiolocalization_tpu.models.online import (OnlineTracker,
                                                   StreamingLocalizer)
from pyaudiolocalization_tpu.models.simulator import simulate_signals_fast

FS, C = 16000.0, 343.0
MICS = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0],
                 [1.5, 3.0, 0.0], [1.5, 1.5, 2.0]])
LOWER = np.array([0.0, 0.0, 0.0])
UPPER = np.array([3.2, 3.2, 2.2])
SEG = 2048
NUM_SEG = 12
START_A, VEL_A = np.array([0.7, 1.0, 0.6]), np.array([1.2, 0.3, 0.0])
START_B, VEL_B = np.array([2.26, 1.0, 1.1]), np.array([-1.2, 0.3, 0.0])

blocks = []
for s in range(NUM_SEG):
    t = (s * SEG + SEG / 2.0) / FS
    a = simulate_signals_fast(
        START_A + t * VEL_A, MICS, FS, C, SEG / FS, "noise", 500.0, None,
        None, jnp.asarray([0.01]), jnp.asarray([1e-6]), 0, 1e-4,
        key=jax.random.PRNGKey(2 * s + 1))[:, :SEG]
    b = simulate_signals_fast(
        START_B + t * VEL_B, MICS, FS, C, SEG / FS, "noise", 500.0, None,
        None, jnp.asarray([0.01]), jnp.asarray([1e-6]), 0, 1e-4,
        key=jax.random.PRNGKey(2 * s + 2))[:, :SEG]
    blocks.append(np.asarray(a) + np.asarray(b))
capture = np.concatenate(blocks, axis=-1)

print("== batch: track_multiple (K! assignment + Kalman/RTS) ==")
mt = tracking.track_multiple(
    jnp.asarray(capture), jnp.asarray(MICS), FS, C,
    jnp.asarray(LOWER), jnp.asarray(UPPER), num_sources=2,
    segment=SEG, hop=SEG, coarse_n=32, fine_n=12, max_speed=3.0)
for s, t in enumerate(np.asarray(mt.times)):
    pa = np.asarray(mt.smoothed)[s, 0]
    pb = np.asarray(mt.smoothed)[s, 1]
    ta = START_A + t * VEL_A
    tb = START_B + t * VEL_B
    ea = min(np.linalg.norm(pa - ta), np.linalg.norm(pb - ta))
    print(f"t={t:5.2f}s  track0=({pa[0]:5.2f},{pa[1]:5.2f},{pa[2]:5.2f})  "
          f"track1=({pb[0]:5.2f},{pb[1]:5.2f},{pb[2]:5.2f})  "
          f"|truthA err|~{ea:.3f} m")

print("\n== streaming: OnlineTracker (causal, O(1) state) ==")
loc = StreamingLocalizer(MICS, FS, C, LOWER, UPPER, frame=2048, hop=1024,
                         ema=0.4, num_sources=2, coarse_n=32, fine_n=12)
trk = OnlineTracker(loc, max_speed=3.0)
pos, pw, ok = trk.run(capture)
print(f"{pos.shape[0]} hops; final tracks "
      f"{np.round(pos[-1, 0], 2)} / {np.round(pos[-1, 1], 2)} "
      f"(truth A ends ~{np.round(START_A + 1.47 * VEL_A, 2)}, "
      f"B ~{np.round(START_B + 1.47 * VEL_B, 2)})")

print("\n== moving WOLA render: motion='compensated' vs 'static' ==")
from pyaudiolocalization_tpu.models.simulator import simulate_moving_source

dur = NUM_SEG * SEG / FS
wa = simulate_moving_source(START_A, VEL_A, MICS, FS, C, dur, "noise",
                            key=jax.random.PRNGKey(11))
wb = simulate_moving_source(START_B, VEL_B, MICS, FS, C, dur, "noise",
                            key=jax.random.PRNGKey(22))
moving = np.asarray(wa) + np.asarray(wb)
for motion in ("static", "compensated"):
    mt = tracking.track_multiple(
        jnp.asarray(moving), jnp.asarray(MICS), FS, C,
        jnp.asarray(LOWER), jnp.asarray(UPPER), num_sources=2,
        segment=SEG, hop=SEG, coarse_n=32, fine_n=12, max_speed=3.0,
        motion=motion)
    times = np.asarray(mt.times)
    pos2 = np.asarray(mt.positions)
    ta = START_A + times[:, None] * VEL_A
    tb = START_B + times[:, None] * VEL_B
    ia = int(np.argmin(np.linalg.norm(pos2[0] - ta[0][None], axis=-1)))
    ea = np.linalg.norm(pos2[:, ia] - ta, axis=-1)
    eb = np.linalg.norm(pos2[:, 1 - ia] - tb, axis=-1)
    print(f"motion='{motion}': per-segment detection error "
          f"A mean {ea.mean():.3f} m, B mean {eb.mean():.3f} m "
          f"(final {ea[-1]:.3f} / {eb[-1]:.3f})")

print("\n== CAUSAL moving tracking: OnlineTracker + motion='compensated' ==")
loc_mc = StreamingLocalizer(MICS, FS, C, LOWER, UPPER, frame=2048,
                            hop=1024, ema=0.4, num_sources=2, coarse_n=32,
                            fine_n=12, motion="compensated", max_speed=3.0)
trk_mc = OnlineTracker(loc_mc, max_speed=3.0)
pos3, pw3, ok3 = trk_mc.run(moving)
times3 = np.arange(trk_mc.warmup - 1, moving.shape[-1] // 1024) * 1024 / FS
times3 = times3[:pos3.shape[0]]
ta3 = START_A + times3[:, None] * VEL_A
tb3 = START_B + times3[:, None] * VEL_B
ia3 = int(np.argmin(np.linalg.norm(pos3[0] - ta3[0][None], axis=-1)))
ea3 = np.linalg.norm(pos3[:, ia3] - ta3, axis=-1)
eb3 = np.linalg.norm(pos3[:, 1 - ia3] - tb3, axis=-1)
print(f"per-hop error A mean {ea3.mean():.3f} m, B mean {eb3.mean():.3f} m "
      f"(final {ea3[-1]:.3f} / {eb3[-1]:.3f}, associated {ok3.mean():.0%})")
