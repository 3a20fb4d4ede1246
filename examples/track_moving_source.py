"""Track a moving source through a long capture (models/tracking.py).

The capture comes from ``simulate_moving_source`` — a time-varying-delay
WOLA render, so the source genuinely moves WITHIN each tracking segment
(not a concatenation of static scenes).  Each overlapping segment
localizes independently via GCC-PHAT -> SRP-PHAT (all segments in one
vmapped XLA graph) and a smoother stabilizes the track: either a causal
EMA (``smoother='ema'``) or a power-weighted constant-velocity Kalman
filter + RTS backward smoother (``smoother='kalman'``).

``motion='compensated'`` drops the static-source-per-segment assumption:
a brisk walker drifts each pair delay by tens of samples within a
segment, smearing the segment-long correlation and biasing the 'static'
tracker by tens of centimetres; the compensated path estimates each
pair's delay RATE from subframe GCCs, aligns the subframe correlations
to the segment centre, and also recovers the source velocity from the
delay rates (``Track.velocities``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pyaudiolocalization_tpu.models.tracking import localize_trajectory
from pyaudiolocalization_tpu.models.simulator import simulate_moving_source
from pyaudiolocalization_tpu.models.acoustics import speed_of_sound

FS = 16000.0
# Non-coplanar (tetrahedral) array: a near-coplanar array has a mirror
# ghost across its plane that SRP can lock onto.
MICS = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0],
                 [1.5, 3.0, 0.0], [1.5, 1.5, 2.0]])
C = float(speed_of_sound(20.0, 50.0))
START = np.array([0.8, 1.2, 0.7])
VEL = np.array([1.5, 0.4, 0.0])      # a brisk walk, mostly along x

capture = simulate_moving_source(START, VEL, MICS, FS, C, duration=2.0,
                                 signal_type="noise", frame=512,
                                 key=jax.random.PRNGKey(0))
print(f"capture: {capture.shape[0]} mics x {capture.shape[1]} samples "
      f"({capture.shape[1] / FS:.2f} s), |v| = {np.linalg.norm(VEL):.2f} m/s")

for motion in ("static", "compensated"):
    track = localize_trajectory(
        capture, jnp.asarray(MICS), FS, C,
        jnp.zeros(3), jnp.asarray([3.2, 3.2, 2.2]), segment=4096,
        coarse_n=32, fine_n=12, smoother="kalman", motion=motion,
        max_speed=3.0)
    truth = START[None, :] + np.asarray(track.times)[:, None] * VEL[None, :]
    err = np.linalg.norm(np.asarray(track.positions) - truth, axis=-1)
    print(f"\nmotion='{motion}': mean error {err.mean():.3f} m")
    for i in range(0, len(err), 4):
        t = float(np.asarray(track.times)[i])
        p = np.asarray(track.positions)[i]
        line = (f"t={t:5.2f}s  est=({p[0]:.3f},{p[1]:.3f},{p[2]:.3f})  "
                f"err={err[i]:.3f} m")
        if track.velocities is not None:
            v = np.asarray(track.velocities)[i]
            line += f"  vel=({v[0]:+.2f},{v[1]:+.2f},{v[2]:+.2f})"
        print(line)
