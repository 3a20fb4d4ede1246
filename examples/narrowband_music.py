"""Narrowband localization: Bartlett beamformer vs MUSIC super-resolution.

Pure tones defeat correlation-based TDOA (the whitened correlation is
periodic in the carrier), so narrowband scenes need phase-based estimators:
the Bartlett steered-power scan (models/beamformer.py) and the MUSIC
subspace localizer (models/music.py).  This example shows where they
differ: two tones 12 Hz apart — the SAME 62.5 Hz analysis bin — from
sources 25 cm apart.  The Bartlett map merges them into one lobe; MUSIC's
noise-subspace projection separates both to millimeters.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pyaudiolocalization_tpu.models import music
from pyaudiolocalization_tpu.models.acoustics import speed_of_sound
from pyaudiolocalization_tpu.models.beamformer import beamform_locate
from pyaudiolocalization_tpu.models.simulator import simulate_signals

FS = 16000.0
C = float(speed_of_sound(20.0, 50.0))
# 8-mic unit cube: dense enough spatial sampling for sub-kHz tones.
MICS = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                 [0.0, 0.0, 1.0], [1.0, 1.0, 0.0], [1.0, 0.0, 1.0],
                 [0.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
LO = jnp.zeros(3)
HI = jnp.ones(3)


def tone_scene(src, freq, key, snr_db=25.0):
    sigs = jnp.asarray(simulate_signals(np.asarray(src), MICS, FS, C,
                                        duration=0.2, signal_type="sine",
                                        freq=freq, key=jax.random.PRNGKey(0)))
    noise = jax.random.normal(key, sigs.shape, sigs.dtype)
    return sigs + jnp.std(sigs) * 10.0 ** (-snr_db / 20.0) * noise


# --- single tone: both estimators work -----------------------------------
src = np.array([0.3, 0.6, 0.4])
sigs = tone_scene(src, 800.0, jax.random.PRNGKey(1))
beam = beamform_locate(sigs, jnp.asarray(MICS), FS, C, LO, HI)
mus = music.music_locate(sigs, jnp.asarray(MICS), FS, C, LO, HI)
print(f"single 800 Hz tone at {src}:")
print(f"  bartlett -> {np.asarray(beam.position).round(3)}  "
      f"err {np.linalg.norm(np.asarray(beam.position) - src) * 1000:.1f} mm")
print(f"  music    -> {np.asarray(mus.position).round(3)}  "
      f"err {np.linalg.norm(np.asarray(mus.position) - src) * 1000:.1f} mm")

# --- two tones in the SAME bin, sources 25 cm apart ----------------------
srcs = np.array([[0.35, 0.4, 0.5], [0.6, 0.45, 0.5]])
sigs2 = (tone_scene(srcs[0], 600.0, jax.random.PRNGKey(2))
         + tone_scene(srcs[1], 612.0, jax.random.PRNGKey(3)))
beam2 = beamform_locate(sigs2, jnp.asarray(MICS), FS, C, LO, HI)
multi = music.music_locate_multi(sigs2, jnp.asarray(MICS), FS, C, LO, HI,
                                 num_sources=2, frame=256,
                                 min_separation=0.12)
got = np.asarray(multi.positions)
e_fwd = np.linalg.norm(got - srcs, axis=-1)
e_rev = np.linalg.norm(got - srcs[::-1], axis=-1)
errs = e_fwd if e_fwd.max() <= e_rev.max() else e_rev
print(f"\ntwo tones 600/612 Hz (same 62.5 Hz bin) at {srcs.tolist()}:")
print(f"  bartlett -> {np.asarray(beam2.position).round(3)}  "
      f"(one lobe; {np.linalg.norm(np.asarray(beam2.position) - srcs[0]):.2f} m"
      f" / {np.linalg.norm(np.asarray(beam2.position) - srcs[1]):.2f} m"
      f" from the two sources)")
for k in range(2):
    print(f"  music #{k + 1} -> {got[k].round(3)}  err {errs[k] * 1000:.1f} mm")

# --- Capon/MVDR: a 10x-louder interferer must not drown the target -------
from pyaudiolocalization_tpu.models import capon

tgt = np.array([0.25, 0.3, 0.35])
intf = np.array([0.75, 0.7, 0.6])
sigs3 = (tone_scene(tgt, 600.0, jax.random.PRNGKey(4))
         + 10.0 * tone_scene(intf, 612.0, jax.random.PRNGKey(5)))
beam3 = beamform_locate(sigs3, jnp.asarray(MICS), FS, C, LO, HI)
cap = capon.capon_locate_multi(sigs3, jnp.asarray(MICS), FS, C, LO, HI,
                               num_sources=2, min_separation=0.2)
cp = np.asarray(cap.positions)
print(f"\nweak 600 Hz target at {tgt.tolist()} + 10x-louder 612 Hz "
      f"interferer at {intf.tolist()}:")
print(f"  bartlett -> {np.asarray(beam3.position).round(3)}  "
      f"({np.linalg.norm(np.asarray(beam3.position) - tgt):.2f} m from the "
      f"target: the interferer wins the whole map)")
print(f"  capon #1 -> {cp[0].round(3)}  "
      f"(interferer, err {np.linalg.norm(cp[0] - intf) * 1000:.1f} mm)")
print(f"  capon #2 -> {cp[1].round(3)}  "
      f"(target, err {np.linalg.norm(cp[1] - tgt) * 1000:.1f} mm)")
