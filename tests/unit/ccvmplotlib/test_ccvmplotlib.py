"""Smoke + error-path tests for the plotting API (the reference's
``test_ccvmplotlib.py`` is entirely commented out, ``:8-111``; these cover
what it intended)."""

import json
import os

import matplotlib

matplotlib.use("Agg")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from ccvm_tpu.ccvmplotlib import ccvmplotlib  # noqa: E402

GAPS = [
    "optimal",
    "one_percent",
    "two_percent",
    "three_percent",
    "four_percent",
    "five_percent",
    "ten_percent",
]


def _metadata(tmp_path, perf_by_size, name="meta"):
    results = []
    for size, perf in perf_by_size.items():
        for i in range(3):
            results.append(
                {
                    "problem_size": size,
                    "batch_size": 1000,
                    "instance_name": f"i{size}-{i}",
                    "iterations": 15000,
                    "solve_time": 0.01,
                    "pp_time": 0.001,
                    "optimal_value": 100.0,
                    "best_value": 99.0,
                    "num_frac_values": 5,
                    "solution_vector": None,
                    "evolution_file": None,
                    "solution_performance": dict(zip(GAPS, perf)),
                    "best_objective_value": 99.5,
                }
            )
    path = tmp_path / f"{name}.json"
    path.write_text(json.dumps({"device": "tpu", "result_metadata": results}))
    return str(path)


def _time_func(dataframe=None, problem_size=None, **_):
    return 1e-3


def _energy_func(dataframe=None, problem_size=None, **_):
    return 5.0e-3


class TestPlotTTS:
    def test_returns_fig_ax_and_saves(self, tmp_path):
        path = _metadata(
            tmp_path, {20: [0.5] * 7, 30: [0.3] * 7}
        )
        fig, ax = ccvmplotlib.plot_TTS(path, "BoxQP", _time_func)
        assert ax.get_yscale() == "log"
        ccvmplotlib.apply_default_tts_styling(fig, ax)
        out = os.path.join(tmp_path, "tts.png")
        fig.savefig(out)
        assert os.path.getsize(out) > 0

    def test_all_unsolved_raises(self, tmp_path):
        path = _metadata(tmp_path, {20: [0.0] * 7})
        with pytest.raises(ValueError, match="too large to plot"):
            ccvmplotlib.plot_TTS(path, "BoxQP", _time_func)

    def test_invalid_problem_raises(self, tmp_path):
        path = _metadata(tmp_path, {20: [0.5] * 7})
        with pytest.raises(ValueError):
            ccvmplotlib.plot_TTS(path, "TSP", _time_func)


class TestPlotETS:
    def test_returns_fig_ax(self, tmp_path):
        path = _metadata(tmp_path, {20: [0.5] * 7, 30: [0.3] * 7})
        fig, ax = ccvmplotlib.plot_ETS(path, "BoxQP", _energy_func)
        ccvmplotlib.apply_default_ets_styling(fig, ax)
        assert fig is not None and ax is not None


class TestPlotSuccessProb:
    def test_returns_fig_ax(self, tmp_path):
        path = _metadata(tmp_path, {20: [0.5] * 7, 30: [0.3] * 7})
        fig, ax = ccvmplotlib.plot_success_prob(path, "BoxQP")
        ccvmplotlib.apply_default_succ_prob_styling(fig, ax)
        assert ax.get_yscale() == "log"

    def test_all_zero_raises(self, tmp_path):
        path = _metadata(tmp_path, {20: [0.0] * 7})
        with pytest.raises(ValueError, match="all 0.0"):
            ccvmplotlib.plot_success_prob(path, "BoxQP")


class TestMetricUtilities:
    def test_imean_ivariance(self):
        from ccvm_tpu.ccvmplotlib.utils import utilities

        data = [1.0, 2.0, 3.0, 4.0]
        assert utilities.imean(iter(data)) == pytest.approx(2.5)
        assert utilities.ivariance(iter(data)) == pytest.approx(np.var(data))

    def test_num_solutions_per_result_mismatch_raises(self):
        from ccvm_tpu.ccvmplotlib.utils.metric import Metric

        with pytest.raises(ValueError):
            Metric.num_solutions_per_result([[1, 2], [1]])
