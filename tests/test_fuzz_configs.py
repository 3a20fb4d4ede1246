"""Configuration fuzz: random mic counts / signal types / filter and mode
combinations through the full public pipeline.  Asserts no crashes and
finite outputs (accuracy is covered elsewhere)."""

import numpy as np
import pytest

from pyaudiolocalization_tpu import localize_sound_source


def _config(rng, num_mics, signal_type, filter_method, lag_mode, sync_mode,
            analyze):
    mics = rng.uniform(0.0, 1.0, (num_mics, 3)).round(3).tolist()
    return {
        "fs": 8000,
        "duration": 0.1,
        "celsius": float(rng.uniform(-10, 40)),
        "humidity": float(rng.uniform(10, 90)),
        "mic_positions": mics,
        "source_position": rng.uniform(0.2, 0.8, 3).round(3).tolist(),
        "signal_type": signal_type,
        "freq": 900,
        "reflective_planes": [
            {"plane": [1, 0, 0, -4], "material": "wood"},
        ],
        "localization": {
            "max_reflections": 1,
            "filter_method": filter_method,
            "analyze_correlation": analyze,
            "num_bootstrap": 16,
            "max_expected_delay": 0.05,
            "lag_mode": lag_mode,
            "sync_mode": sync_mode,
        },
        "seed": int(rng.integers(0, 2**31)),
    }


CASES = [
    (3, "noise", "wiener", "physical", "none", False),
    (4, "chirp", "butterworth", "physical", "none", True),
    (5, "speech", "fir", "physical", "none", False),
    (4, "sine", "butterworth", "reference", "reference", False),
    (2, "noise", "wiener", "reference", "reference", False),
    (6, "noise", "butterworth", "physical", "reference", False),
]


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_fuzz_pipeline(case_idx):
    num_mics, sig, filt, lag, sync, analyze = CASES[case_idx]
    # Deterministic per-case seed: Python hash() is salt-randomized per
    # process, which would make failures irreproducible.
    rng = np.random.default_rng(1000 + case_idx)
    cfg = _config(rng, num_mics, sig, filt, lag, sync, analyze)
    out = localize_sound_source(cfg, use_simulation=True, show_plots=False)
    est = np.asarray(out["estimated_position"])
    assert est.shape == (3,)
    assert np.all(np.isfinite(est))
    assert len(out["tdoas"]) == num_mics * (num_mics - 1) // 2
    if analyze:
        assert len(out["correlation_metrics"]) == len(out["tdoas"])
