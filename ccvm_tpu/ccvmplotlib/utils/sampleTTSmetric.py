"""Time-to-solution (TTS) metric with Beta-posterior bootstrap.

Statistical parity with ``ccvm_simulators/ccvmplotlib/utils/sampleTTSmetric.py``:
R99 = ln(1-confidence)/ln(1-p) clamped >= 1; success probabilities get a
Beta(0.5, 0.5)-prior posterior, bootstrap resampling draws (index, cdf-value)
pairs from a seeded ``numpy.random.RandomState`` in the same order as the
reference, so seeded results are bit-identical — but the inner per-element
Python loop is replaced by vectorized ``beta.ppf`` calls.
"""

from __future__ import annotations

import sys
from typing import Union

import numpy
from scipy.stats import beta as beta_distribution

from ccvm_tpu.ccvmplotlib.utils.metric import Metric


class SampleTTSMetric(Metric):
    """Time to solution (TTS) metric."""

    def __init__(
        self,
        tau_attribute: str,
        percentile: float = 50.0,
        confidence: float = 0.99,
        num_bootstraps: int = 100,
        failure_fill_in_value: float = sys.float_info.max,
        tolerance: float = 1e-5,
        seed: int = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self._rng = numpy.random.RandomState(seed)

        self.name = "tts"
        self.tau_attribute = tau_attribute
        self.percentile = percentile
        self.confidence = confidence
        self.num_bootstraps = num_bootstraps
        self.failure_fill_in_value = failure_fill_in_value
        self.tolerance = tolerance

        if not 0 < self.confidence < 1:
            raise ValueError("confidence must be between 0 and 1")

    def calc(self, results, best_known_energies, **kwargs):
        """Mean and std of the sample TTS at the configured percentile."""
        success_probabilities = self.calc_success_probabilities(
            results, best_known_energies
        )

        frac_solved = (success_probabilities > 0).mean()
        if frac_solved < self.percentile / 100.0:
            mean_TTS = numpy.inf
            std_TTS = numpy.inf
        else:
            num_repeats = self.num_solutions_per_result(results)
            R99_distribution = self.calc_R99_distribution(
                success_probabilities, num_repeats
            )
            mean_tau = self.overall_mean(results, self.tau_attribute)
            var_tau = self.overall_variance(results, self.tau_attribute)
            mean_R99 = numpy.mean(R99_distribution)
            var_R99 = numpy.var(R99_distribution)
            mean_TTS = mean_R99 * mean_tau
            std_TTS = (
                (var_R99 * var_tau)
                + (mean_R99**2 * var_tau)
                + (mean_tau**2 * var_R99)
            ) ** 0.5

        if self.failure_fill_in_value is not None:
            mean_TTS = self.fill_in_value(mean_TTS, self.failure_fill_in_value)
            std_TTS = self.fill_in_value(std_TTS, self.failure_fill_in_value)

        return mean_TTS, std_TTS

    def calc_R99(self, success_probability: float) -> float:
        """R99: independent runs needed to hit the best known energy at least
        once with 99% confidence; clamped to >= 1."""
        if not 0 < self.confidence < 1:
            raise ValueError("confidence must be between 0 and 1")
        if success_probability == 0:
            return numpy.inf
        if success_probability == 1:
            return 1.0
        R99 = numpy.log(1 - self.confidence) / numpy.log(1 - success_probability)
        return max(R99, 1.0)

    def calc_R99_distribution(
        self, success_probabilities, num_repeats: int
    ) -> numpy.ndarray:
        """Bootstrap the given percentile of R99 over a Beta(0.5, 0.5)-prior
        posterior per problem; one percentile per bootstrap sample."""
        success_probabilities = numpy.asarray(success_probabilities, dtype=float)
        n = len(success_probabilities)
        # Beta posterior parameters: 0.5 + successes, 0.5 + failures
        alphas = 0.5 + success_probabilities * num_repeats
        betas = 0.5 + (1 - success_probabilities) * num_repeats

        R99_distribution = numpy.empty(self.num_bootstraps, dtype=float)
        log_conf = numpy.log(1 - self.confidence)
        for i in range(self.num_bootstraps):
            # Same draw order as the reference: indices first, then cdf values
            random_indices = self._rng.randint(0, n, n)
            cdf_values = self._rng.uniform(0, 1, n)
            sampled_p = beta_distribution.ppf(
                cdf_values, alphas[random_indices], betas[random_indices]
            )
            with numpy.errstate(divide="ignore", invalid="ignore"):
                R99 = numpy.where(
                    sampled_p >= 1.0,
                    1.0,
                    numpy.where(
                        sampled_p <= 0.0,
                        numpy.inf,
                        log_conf / numpy.log(1 - sampled_p),
                    ),
                )
            R99 = numpy.maximum(R99, 1.0)
            R99_distribution[i] = numpy.percentile(R99, self.percentile)

        return R99_distribution

    def calc_R99_quartile_means(
        self, success_probabilities, num_repeats: int, percentiles=(25, 50, 75)
    ) -> dict:
        """Mean (over bootstraps) of several R99 percentiles from ONE set of
        bootstrap draws.

        Fully vectorized: all ``num_bootstraps`` resamples are drawn as one
        (B, n) matrix, the Beta-posterior ppf is evaluated in one call, and
        every requested percentile is read off the same R99 matrix — the
        per-percentile statistic matches ``calc_R99_distribution`` exactly in
        distribution (the reference re-runs the bootstrap loop per
        percentile, which only changes which random draws are used).
        """
        p = numpy.asarray(success_probabilities, dtype=float)
        n = len(p)
        alphas = 0.5 + p * num_repeats
        betas = 0.5 + (1 - p) * num_repeats

        B = self.num_bootstraps
        idx = self._rng.randint(0, n, (B, n))
        cdf = self._rng.uniform(0, 1, (B, n))
        sampled = beta_distribution.ppf(cdf, alphas[idx], betas[idx])
        log_conf = numpy.log(1 - self.confidence)
        with numpy.errstate(divide="ignore", invalid="ignore"):
            r99 = numpy.where(
                sampled >= 1.0,
                1.0,
                numpy.where(
                    sampled <= 0.0, numpy.inf, log_conf / numpy.log(1 - sampled)
                ),
            )
        r99 = numpy.maximum(r99, 1.0)
        per_boot = numpy.percentile(r99, list(percentiles), axis=1)  # (P, B)
        return {
            pct: float(numpy.mean(per_boot[k]))
            for k, pct in enumerate(percentiles)
        }

    def calc_success_probabilities(self, results, best_known_energies):
        """Success probability for each problem."""
        probabilities = numpy.empty(len(results), dtype=float)
        for i, (result, energy) in enumerate(zip(results, best_known_energies)):
            probabilities[i] = self.calc_success_probability(result, energy)
        return probabilities

    def calc_success_probability(
        self, solutions: Union[list, dict], best_known_energy: float
    ) -> float:
        """Fraction of solutions at or below best_known_energy + tolerance."""
        n_success = sum(
            1
            for solution in solutions
            if solution["best_energy"] < best_known_energy + self.tolerance
        )
        return n_success / float(len(solutions))
