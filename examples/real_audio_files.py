"""Reference README Example 2: localize from real multi-channel WAV files.

No microphone hardware here, so the script first records a simulated scene
to four WAV files (write_wav), then runs the real-audio ingest path:
RIFF decode -> mono downmix -> Kaiser resample -> normalize/compress ->
localization (reference utils.py:459-482 + main.py:185).
"""

import os
import tempfile

import jax
import numpy as np

from pyaudiolocalization_tpu import (localize_sound_source,
                                     simulate_signals_with_multipath)
from pyaudiolocalization_tpu.models.acoustics import speed_of_sound
from pyaudiolocalization_tpu.utils.audio_io import write_wav

FS = 16000
MICS = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
SOURCE = [0.4, 0.3, 0.6]

# 1. "Record" the scene: simulate and write one WAV per microphone.
c = float(speed_of_sound(20.0, 50.0))
signals = simulate_signals_with_multipath(
    SOURCE, MICS, FS, c, duration=0.5, signal_type="noise",
    key=jax.random.PRNGKey(0))
tmpdir = tempfile.mkdtemp(prefix="pyal_wavs_")
audio_files = []
for i, sig in enumerate(signals):
    path = os.path.join(tmpdir, f"mic{i + 1}.wav")
    write_wav(path, sig, FS, bits=32)
    audio_files.append(path)
print("Wrote:", audio_files)

# 2. Localize from the files (use_simulation=False path).
config = {
    "fs": FS,
    "celsius": 20,
    "humidity": 50,
    "mic_positions": MICS,
    "localization": {
        "filter_method": "butterworth",
        "clustering_method": "kmeans",
        "max_expected_delay": 0.05,
        "lag_mode": "physical",
        "sync_mode": "none",
    },
}
results = localize_sound_source(config, use_simulation=False,
                                audio_files=audio_files, show_plots=False)
est = np.asarray(results["estimated_position"])
print("Estimated Position of Sound Source:", est)
print("Error vs simulated source: %.4f m" % np.linalg.norm(est - np.asarray(SOURCE)))
