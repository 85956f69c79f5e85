"""Functional SDE dynamics cores (pure step functions + scanned solvers)."""

from ccvm_tpu.dynamics.common import AdamHyperparameters  # noqa: F401
