"""Smoke tests for the matplotlib plotting layer (utils/plotting.py —
reference plotting.py + calibration.py:53-72).  Agg backend; files written
to tmp_path and checked for existence."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from pyaudiolocalization_tpu.utils import plotting

MICS = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                 [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])


def test_correlation_heatmap(tmp_path):
    path = str(tmp_path / "heatmap.png")
    m = np.random.default_rng(0).uniform(0, 1, (4, 4))
    m = (m + m.T) / 2
    plotting.plot_correlation_heatmap(m, MICS, show_plot=False, save_path=path)
    assert (tmp_path / "heatmap.png").stat().st_size > 0


def test_correlation_3d(tmp_path):
    path = str(tmp_path / "c3d.png")
    rng = np.random.default_rng(1)
    pairs = [(0, 1), (0, 2), (1, 2)]
    corr = [rng.standard_normal(257) for _ in pairs]
    plotting.plot_correlation_3d(corr, pairs, 8000.0, show_plot=False,
                                 save_path=path)
    assert (tmp_path / "c3d.png").stat().st_size > 0


def test_localization_3d(tmp_path):
    path = str(tmp_path / "loc.png")
    plotting.plot_localization_3d(MICS, np.array([0.5, 0.5, 0.5]),
                                  np.array([0.52, 0.48, 0.5]),
                                  show_plot=False, save_path=path)
    assert (tmp_path / "loc.png").stat().st_size > 0


def test_calibration_results(tmp_path):
    path = str(tmp_path / "cal.png")
    results = [{"delay": 0.002 * i, "amplitude": 10.0 + i} for i in range(4)]
    plotting.plot_calibration_results(results, show_plot=False,
                                      save_path=path)
    assert (tmp_path / "cal.png").stat().st_size > 0
