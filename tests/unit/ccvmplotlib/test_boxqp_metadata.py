"""Tests for metadata ingest + plot-data generation (modeled on the
reference's ``tests/unit/ccvmplotlib/test_BoxQP_metadata.py`` with injected
machine-time/energy callables)."""

import json

import numpy as np
import pytest

from ccvm_tpu.ccvmplotlib.problem_metadata import (
    BoxQPMetadata,
    ProblemMetadataFactory,
    ProblemType,
)

GAPS = [
    "optimal",
    "one_percent",
    "two_percent",
    "three_percent",
    "four_percent",
    "five_percent",
    "ten_percent",
]


def _result(size, name, perf, solve_time=0.01, pp_time=0.001):
    return {
        "problem_size": size,
        "batch_size": 1000,
        "instance_name": name,
        "iterations": 15000,
        "solve_time": solve_time,
        "pp_time": pp_time,
        "optimal_value": 100.0,
        "best_value": 99.0,
        "num_frac_values": 5,
        "solution_vector": None,
        "evolution_file": None,
        "solution_performance": dict(zip(GAPS, perf)),
        "best_objective_value": 99.5,
    }


@pytest.fixture
def metadata_file(tmp_path):
    """Two sizes x three instances, monotone success fractions."""
    results = []
    for size in (20, 30):
        for i in range(3):
            p_opt = 0.5 if size == 20 else 0.2
            perf = [p_opt, 0.6, 0.7, 0.8, 0.9, 0.95, 1.0]
            results.append(_result(size, f"inst{size}-{i}", perf))
    path = tmp_path / "metadata.json"
    path.write_text(json.dumps({"device": "tpu", "result_metadata": results}))
    return str(path)


@pytest.fixture
def unsolved_metadata_file(tmp_path):
    """All success probabilities zero at every gap."""
    results = [
        _result(20, f"inst{i}", [0.0] * 7) for i in range(3)
    ]
    path = tmp_path / "zero.json"
    path.write_text(json.dumps({"device": "tpu", "result_metadata": results}))
    return str(path)


def _machine_time(dataframe=None, problem_size=None, **_):
    return 1.0


class TestIngest:
    def test_factory_valid(self):
        pm = ProblemMetadataFactory.create_problem_metadata("BoxQP")
        assert isinstance(pm, BoxQPMetadata)
        assert pm.problem == ProblemType.BoxQP

    def test_factory_invalid(self):
        with pytest.raises(ValueError):
            ProblemMetadataFactory.create_problem_metadata("TSP")

    def test_ingest_builds_dataframe(self, metadata_file):
        pm = ProblemMetadataFactory.create_problem_metadata("BoxQP")
        pm.ingest_metadata(metadata_file)
        df = pm.generate_success_prob_plot_data()
        assert list(df.index) == [20, 30]
        assert set(df.columns.levels[0]) == set(GAPS)


class TestPlotData:
    def test_tts_plot_data_finite_when_solved(self, metadata_file):
        pm = ProblemMetadataFactory.create_problem_metadata("BoxQP")
        pm.ingest_metadata(metadata_file)
        df = pm.generate_plot_data(metric_func=_machine_time)
        for pct in ("25", "50", "75"):
            val = df.at[20, ("optimal", pct)]
            assert np.isfinite(val)
            assert val >= 1.0  # machine_time * R99 >= machine_time

    def test_percentiles_are_monotone(self, metadata_file):
        pm = ProblemMetadataFactory.create_problem_metadata("BoxQP")
        pm.ingest_metadata(metadata_file)
        df = pm.generate_plot_data(metric_func=_machine_time)
        for size in (20, 30):
            p25 = df.at[size, ("optimal", "25")]
            p75 = df.at[size, ("optimal", "75")]
            assert p25 <= p75

    def test_unsolved_gives_inf(self, unsolved_metadata_file):
        pm = ProblemMetadataFactory.create_problem_metadata("BoxQP")
        pm.ingest_metadata(unsolved_metadata_file)
        df = pm.generate_plot_data(metric_func=_machine_time)
        assert df.at[20, ("optimal", "50")] == np.inf

    def test_metric_func_receives_dataframe(self, metadata_file):
        seen = {}

        def probe(dataframe=None, problem_size=None, **_):
            seen[problem_size] = dataframe["solve_time"].mean()
            return 2.0

        pm = ProblemMetadataFactory.create_problem_metadata("BoxQP")
        pm.ingest_metadata(metadata_file)
        pm.generate_plot_data(metric_func=probe)
        assert set(seen) == {20, 30}
        assert seen[20] == pytest.approx(0.01)

    def test_success_prob_means(self, metadata_file):
        pm = ProblemMetadataFactory.create_problem_metadata("BoxQP")
        pm.ingest_metadata(metadata_file)
        df = pm.generate_success_prob_plot_data()
        assert df.at[20, ("optimal", "success_prob")] == pytest.approx(0.5)
        assert df.at[30, ("optimal", "success_prob")] == pytest.approx(0.2)
        assert df.at[20, ("ten_percent", "success_prob")] == pytest.approx(1.0)


class TestInvalidMetadata:
    """Mirrors the reference's invalid-metadata fixtures
    (tests/data/metadata/invalid_*_metadata.json)."""

    def _write(self, tmp_path, results):
        import json
        p = tmp_path / "meta.json"
        p.write_text(json.dumps({"device": "cpu", "result_metadata": results}))
        return str(p)

    def test_zero_performance_makes_tts_unplottable(self, tmp_path):
        """All-zero success probabilities -> R99 inf at every percentile ->
        plot_TTS raises (reference invalid_zero_performance_metadata)."""
        import matplotlib
        matplotlib.use("Agg")
        import pytest
        from ccvm_tpu.ccvmplotlib import ccvmplotlib

        zero_perf = {k: 0.0 for k in (
            "optimal", "one_percent", "two_percent", "three_percent",
            "four_percent", "five_percent", "ten_percent")}
        results = [
            {"problem_size": 20, "batch_size": 10, "instance_name": f"i{j}",
             "iterations": 100, "solve_time": 0.1, "pp_time": 0.01,
             "optimal_value": 1.0, "best_value": 1.0, "num_frac_values": 0,
             "solution_vector": None, "device": "cpu",
             "solution_performance": dict(zero_perf)}
            for j in range(3)
        ]
        path = self._write(tmp_path, results)
        with pytest.raises(ValueError, match="too large to plot"):
            ccvmplotlib.plot_TTS(
                path, "BoxQP",
                machine_time_func=lambda dataframe, problem_size: 1.0,
            )

    def test_missing_field_fails_ingest_or_plot(self, tmp_path):
        """A result row missing solution_performance cannot be ingested
        (reference invalid_incorrect_field_metadata)."""
        import pytest
        from ccvm_tpu.ccvmplotlib.problem_metadata import (
            ProblemMetadataFactory,
        )

        results = [{"problem_size": 20, "batch_size": 10, "solve_time": 0.1}]
        path = self._write(tmp_path, results)
        meta = ProblemMetadataFactory.create_problem_metadata("BoxQP")
        with pytest.raises((KeyError, ValueError)):
            meta.ingest_metadata(path)
            meta.generate_plot_data(lambda dataframe, problem_size: 1.0)
