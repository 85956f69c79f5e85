"""Base Metric class (parity with
``ccvm_simulators/ccvmplotlib/utils/metric.py``)."""

import numpy

from ccvm_tpu.ccvmplotlib.utils import utilities
from ccvm_tpu.ccvmplotlib.utils.mixins import StrDictMixIn


class Metric(StrDictMixIn):
    """Parent Metric class: inherit all other metrics from this class."""

    def __init__(self, goal="minimize"):
        self.goal = goal

    def calc(self, results, best_known_energies, **kwargs):
        """Placeholder: calculate the metric value."""

    @staticmethod
    def overall_mean(results, key):
        """Overall average of the quantity corresponding to ``key``."""
        iterator = (el[key] for result in results for el in result)
        return utilities.imean(iterator)

    @staticmethod
    def overall_variance(results, key):
        """Variance of the quantity corresponding to ``key``."""
        iterator = (el[key] for result in results for el in result)
        return utilities.ivariance(iterator)

    @staticmethod
    def num_solutions_per_result(results) -> int:
        """Number of solutions per result; all results must agree."""
        if len(results) == 0:
            return 0
        num_solutions = None
        for result in results:
            if not num_solutions:
                num_solutions = len(result)
            elif num_solutions != len(result):
                raise ValueError("Number of solutions not the same for all results")
        return num_solutions

    @staticmethod
    def fill_in_value(value: float, failure_fill_in_value: float) -> float:
        """Replace NaN/Inf with the fill-in value."""
        if numpy.isnan(value) or numpy.isinf(value):
            return failure_fill_in_value
        return value
