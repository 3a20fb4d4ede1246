"""Track a moving source through a long capture (models/tracking.py).

A quasi-static source walks across the room; each overlapping segment
localizes independently via GCC-PHAT -> SRP-PHAT (all segments in one
vmapped XLA graph) and a smoother stabilizes the track: either a causal
EMA (``smoother='ema'``) or a power-weighted constant-velocity Kalman
filter + RTS backward smoother (``smoother='kalman'``) that also recovers
per-segment velocity and down-weights low-confidence segments.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pyaudiolocalization_tpu.models.tracking import localize_trajectory
from pyaudiolocalization_tpu.models.simulator import simulate_signals
from pyaudiolocalization_tpu.models.acoustics import speed_of_sound

FS = 16000.0
MICS = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                 [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
C = float(speed_of_sound(20.0, 50.0))

# Source path: 8 waypoints across the room, 0.25 s each.
path = np.stack([np.linspace(0.2, 0.8, 8),
                 np.linspace(0.3, 0.6, 8),
                 np.full(8, 0.4)], axis=-1)
capture = jnp.asarray(np.concatenate(
    [np.asarray(simulate_signals(w, MICS, FS, C, duration=0.25,
                                 signal_type="noise",
                                 key=jax.random.PRNGKey(i)))
     for i, w in enumerate(path)], axis=-1))
print(f"capture: {capture.shape[0]} mics x {capture.shape[1]} samples "
      f"({capture.shape[1] / FS:.2f} s)")

track = localize_trajectory(
    capture, jnp.asarray(MICS), FS, C,
    jnp.zeros(3), jnp.ones(3), segment=2048, hop=1024, smoother="kalman")

for t, p, s in zip(np.asarray(track.times)[::4],
                   np.asarray(track.positions)[::4],
                   np.asarray(track.smoothed)[::4]):
    print(f"t={t:5.2f}s  raw=({p[0]:.3f},{p[1]:.3f},{p[2]:.3f})  "
          f"smoothed=({s[0]:.3f},{s[1]:.3f},{s[2]:.3f})")
