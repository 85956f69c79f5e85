"""Post-processor interface (API-parity port of
``ccvm_simulators/post_processor/post_processor.py``)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from enum import Enum

import numpy as np


class MethodType(str, Enum):
    BFGS = "bfgs"
    LBFGS = "lbfgs"
    Adam = "adam"
    ASGD = "asgd"
    GradDescent = "grad-descent"


def require_array(name, x):
    """Raise TypeError when ``x`` is not an array, mirroring the reference's
    "parameter ... must be a tensor" guards (e.g. ``grad_descent.py:48-55``)."""
    import jax

    if not isinstance(x, (np.ndarray, jax.Array)):
        raise TypeError(f"parameter {name} must be a tensor")
    return x


class PostProcessor(ABC):
    """Post-processor interface; concrete classes refine solver output with a
    few steps of box-projected optimization on the relaxed objective."""

    @abstractmethod
    def postprocess(self):
        """Refine a batch of candidate solutions."""

    def func_post(self, c, *args):
        """Scalar objective 0.5 cQc + Vc as numpy (reference ``:22-36``)."""
        q_matrix = np.asarray(args[0])
        v_vector = np.asarray(args[1])
        energy1 = np.einsum("i, ij, j", c, q_matrix, c)
        energy2 = np.einsum("i, i", c, v_vector)
        return 0.5 * energy1 + energy2

    def func_post_jac(self, c, *args):
        """Jacobian Qc + V as numpy (reference ``:38-57``)."""
        q_matrix = np.asarray(args[0])
        v_vector = np.asarray(args[1])
        return np.einsum("ij,j->i", q_matrix, c) + v_vector
