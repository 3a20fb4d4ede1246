"""GCC weighting family (no reference counterpart — the reference is
PHAT-only, utils.py:108-119): pick the Knapp-Carter frequency weighting
that matches the regime.

  * 'phat'  — the default; sharpest peaks at moderate/high SNR.
  * 'cc'    — unweighted cross-correlation; below ~0 dB SNR, PHAT's
              unit-magnitude normalization turns noise-only bins into
              full-weight random phasors, while CC keeps the
              source-shaped spectral weighting (see EVALUATION.md's
              "GCC weighting at low SNR" table: at -5 dB CC holds 100%
              hit where PHAT drops).
  * 'scot'  — invariant to per-channel gain/coloration (mismatched mic
              frequency responses).
  * 'roth'  — the Wiener/least-squares weighting.
  * 'ml'    — Hannan-Thomson maximum likelihood; needs Welch-averaged
              spectra, so it lives on the streaming paths.

Run on CPU:  JAX_PLATFORMS=cpu python examples/gcc_weightings.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from pyaudiolocalization_tpu import DEFAULT_CONFIG, localize_sound_source
from pyaudiolocalization_tpu.models.online import StreamingLocalizer
from pyaudiolocalization_tpu.models.simulator import simulate_signals
from pyaudiolocalization_tpu.models.acoustics import speed_of_sound
from pyaudiolocalization_tpu.parallel import SweepSpec, monte_carlo_sweep

import copy

# --- Batch API: one config key selects the weighting (physical mode) ----
cfg = copy.deepcopy(DEFAULT_CONFIG)
cfg["fs"] = 8000
cfg["duration"] = 0.25
cfg["signal_type"] = "noise"
cfg["source_position"] = [0.3, 0.6, 0.4]
cfg["localization"].update(dict(lag_mode="physical", sync_mode="none",
                                filter_method="wiener",
                                max_expected_delay=0.05))
for weighting in ("phat", "scot", "cc"):
    cfg["localization"]["gcc_weighting"] = weighting
    res = localize_sound_source(cfg, use_simulation=True, show_plots=False,
                                key=jax.random.PRNGKey(3))
    err = np.linalg.norm(res["estimated_position"]
                         - np.array(cfg["source_position"]))
    print(f"batch  {weighting:5s} error {err * 1000:7.2f} mm")

# --- Low-SNR sweep: where CC earns its keep ----------------------------
for weighting in ("phat", "cc"):
    spec = SweepSpec(fs=16000.0, duration=0.1, signal_type="noise",
                     source_box_lo=(0.2,) * 3, source_box_hi=(0.8,) * 3,
                     snr_db=(-5.0, -5.0), gcc_weighting=weighting)
    out = monte_carlo_sweep(spec, jax.random.PRNGKey(42), 16)
    print(f"sweep  {weighting:5s} @ -5 dB: rmse {float(out.rmse):.4f} m, "
          f"hit {float(out.hit_rate):.0%}")

# --- Streaming: Hannan-Thomson ML on the EMA Welch averages ------------
fs, c = 16000.0, float(speed_of_sound(20.0, 50.0))
mics = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                 [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
src = np.array([0.35, 0.55, 0.45])
sigs = np.asarray(simulate_signals(src, mics, fs, c, duration=0.5,
                                   signal_type="noise",
                                   key=jax.random.PRNGKey(4)))
for weighting in ("phat", "ml"):
    loc = StreamingLocalizer(mics, fs, c, [0.0] * 3, [1.0] * 3,
                             frame=2048, hop=512, weighting=weighting)
    positions, _ = loc.run(sigs)
    err = np.linalg.norm(positions[-1] - src)
    print(f"stream {weighting:5s} final error {err * 1000:7.2f} mm")
