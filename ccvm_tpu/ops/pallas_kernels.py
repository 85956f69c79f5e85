"""Pallas TPU kernel implementations (placeholder until the kernel milestone).

All entry points return None, signalling the façade to use the lax.scan path.
"""

from __future__ import annotations


def langevin_solve(key, q_matrix, v_vector, params, *, iterations, batch_size):
    return None


def pumped_langevin_solve(
    key, q_matrix, v_vector, params, *, iterations, batch_size, pump_rate_flag
):
    return None


def dl_solve(
    key, q_matrix, v_vector, params, *, iterations, batch_size, pump_rate_flag,
    pump_is_gt_one,
):
    return None


def mf_solve(
    key, q_matrix, v_vector, params, *, iterations, batch_size, pump_rate_flag
):
    return None
