"""Iterator statistics helpers (parity with
``ccvm_simulators/ccvmplotlib/utils/utilities.py``)."""


def imean(iterator) -> float:
    """Mean of an iterator's elements."""
    sum_ = 0.0
    n = 0
    for el in iterator:
        sum_ += el
        n += 1
    return sum_ / n


def ivariance(iterator) -> float:
    """Variance of an iterator's elements."""
    sum_ = 0.0
    sum_2 = 0.0
    n = 0
    for e in iterator:
        sum_ += e
        sum_2 += e**2
        n += 1
    return (sum_2 - (sum_**2 / n)) / n
