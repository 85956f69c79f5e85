"""Golden-value and statistical tests for the R99/TTS bootstrap machinery
(modeled on the reference's test strategy for
``ccvm_simulators/ccvmplotlib/utils/sampleTTSmetric.py``; math cited at
``sampleTTSmetric.py:123-214``)."""

import numpy as np
import pytest

from ccvm_tpu.ccvmplotlib.utils.sampleTTSmetric import SampleTTSMetric


@pytest.fixture
def metric():
    return SampleTTSMetric(tau_attribute="time", percentile=50, seed=7)


class TestCalcR99:
    def test_half_probability_golden(self, metric):
        # R99 = ln(0.01)/ln(0.5) = 6.64386...
        assert metric.calc_R99(0.5) == pytest.approx(6.643856, abs=1e-5)

    def test_probability_one(self, metric):
        assert metric.calc_R99(1.0) == 1.0

    def test_probability_zero_is_inf(self, metric):
        assert metric.calc_R99(0.0) == np.inf

    def test_clamped_to_at_least_one(self, metric):
        # p=0.999 -> raw R99 = ln(.01)/ln(.001) = 2/3 -> clamp to 1
        assert metric.calc_R99(0.999) == 1.0

    def test_invalid_confidence_raises(self):
        with pytest.raises(ValueError):
            SampleTTSMetric(tau_attribute="time", confidence=1.5)


class TestR99Distribution:
    def test_shape_and_bounds(self, metric):
        probs = np.array([0.2, 0.5, 0.9, 0.0, 1.0])
        dist = metric.calc_R99_distribution(probs, num_repeats=100)
        assert dist.shape == (100,)
        assert np.all(dist >= 1.0)

    def test_seeded_determinism(self):
        probs = np.array([0.3, 0.6, 0.9])
        a = SampleTTSMetric(tau_attribute="time", seed=3).calc_R99_distribution(
            probs, num_repeats=50
        )
        b = SampleTTSMetric(tau_attribute="time", seed=3).calc_R99_distribution(
            probs, num_repeats=50
        )
        np.testing.assert_array_equal(a, b)

    def test_different_seeds_differ(self):
        probs = np.array([0.3, 0.6, 0.9])
        a = SampleTTSMetric(tau_attribute="time", seed=1).calc_R99_distribution(
            probs, num_repeats=50
        )
        b = SampleTTSMetric(tau_attribute="time", seed=2).calc_R99_distribution(
            probs, num_repeats=50
        )
        assert not np.array_equal(a, b)

    def test_high_success_prob_gives_small_r99(self):
        metric = SampleTTSMetric(tau_attribute="time", percentile=50, seed=0)
        dist = metric.calc_R99_distribution(
            np.full(10, 0.99), num_repeats=1000
        )
        # p ~= .99 -> R99 ~= 1; the bootstrap should stay close.
        assert np.mean(dist) < 2.0

    def test_low_success_prob_gives_large_r99(self):
        metric = SampleTTSMetric(tau_attribute="time", percentile=50, seed=0)
        dist = metric.calc_R99_distribution(
            np.full(10, 0.01), num_repeats=1000
        )
        # p ~= .01 -> R99 ~= ln(.01)/ln(.99) ~= 458
        assert 200 < np.mean(dist) < 1000


class TestSuccessProbability:
    def test_counts_below_best_energy(self, metric):
        solutions = [
            {"best_energy": 1.0},
            {"best_energy": 2.0},
            {"best_energy": 3.0},
            {"best_energy": 4.0},
        ]
        assert metric.calc_success_probability(solutions, 2.5) == 0.5

    def test_vector_version(self, metric):
        results = [[{"best_energy": 1.0}], [{"best_energy": 9.0}]]
        probs = metric.calc_success_probabilities(results, [5.0, 5.0])
        np.testing.assert_array_equal(probs, [1.0, 0.0])


class TestCalc:
    def _results(self, energies, times):
        return [
            [{"best_energy": e, "time": t}] for e, t in zip(energies, times)
        ]

    def test_unsolved_below_percentile_fills_in(self):
        metric = SampleTTSMetric(
            tau_attribute="time", percentile=50, seed=0,
            failure_fill_in_value=1e300,
        )
        results = self._results([10.0, 10.0], [1.0, 1.0])
        mean_tts, std_tts = metric.calc(results, [0.0, 0.0])
        assert mean_tts == 1e300
        assert std_tts == 1e300

    def test_solved_gives_finite_tts(self):
        metric = SampleTTSMetric(tau_attribute="time", percentile=50, seed=0)
        results = self._results([0.0, 0.0], [2.0, 2.0])
        mean_tts, std_tts = metric.calc(results, [1.0, 1.0])
        assert np.isfinite(mean_tts)
        # tau = 2.0 everywhere; p = 1 but with num_repeats=1 the Beta(1.5, .5)
        # posterior is wide, so R99 is a few units: TTS = R99 * 2 stays small.
        assert 2.0 <= mean_tts < 50.0
