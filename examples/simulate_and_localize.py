"""Reference README Example 1: simulate a multipath scene and localize.

Mirrors the reference's usage (README.md:64-112) with the same config dict;
the two rebuild extensions shown here (lag_mode / sync_mode) switch from
defect-exact reference parity to correct physics.
"""

import numpy as np

from pyaudiolocalization_tpu import localize_sound_source

config = {
    "fs": 44100,
    "duration": 1.0,
    "celsius": 20,
    "humidity": 50,
    "mic_positions": [
        [0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
    ],
    "source_position": [0.3, 0.6, 0.4],
    "signal_type": "noise",        # broadband beats a pure sine for TDOA
    "freq": 1000,
    "reflective_planes": [
        {"plane": [1, 0, 0, -5], "material": "wood"},
        {"plane": [0, 1, 0, -5], "material": "metal"},
        {"plane": [0, 0, 1, -5], "material": "wood"},
    ],
    "localization": {
        "max_reflections": 3,
        "filter_method": "butterworth",
        "absorption_threshold": 0.01,
        "analyze_correlation": True,
        "visualize_correlation": False,
        "clustering_method": "kmeans",
        "max_expected_delay": 0.05,
        # Rebuild extensions: correct physics instead of reference defects
        # Q1/Q4 (SURVEY.md appendix).
        "lag_mode": "physical",
        "sync_mode": "none",
    },
}

results = localize_sound_source(config, use_simulation=True, show_plots=False)
est = np.asarray(results["estimated_position"])
true = np.asarray(config["source_position"])
print("Estimated Position of Sound Source:", est)
print("Error: %.4f m" % np.linalg.norm(est - true))

# Solver selection through the same entry point (physical mode): the
# SRP-PHAT grid search is the robust choice in reverberant scenes, where
# reflection peaks corrupt per-pair TDOAs and LM chases them.
config["localization"]["solver"] = "srp"
config["localization"]["search_box"] = ((-0.5, -0.5, -0.5),
                                        (1.5, 1.5, 1.5))
results = localize_sound_source(config, use_simulation=True, show_plots=False)
est = np.asarray(results["estimated_position"])
print("SRP-PHAT Estimated Position:", est)
print("Error: %.4f m" % np.linalg.norm(est - true))
