"""Fused Pallas TPU kernels for the CCVM SDE solves.

Each kernel runs the ENTIRE Euler-Maruyama loop on-chip: problem data (Q, V)
and the trajectory state live in VMEM, noise comes from the TPU hardware PRNG,
and the MXU does the batched matvec — one kernel launch per solve instead of
the reference's one Python iteration per step (``dl_solver.py:523``).

Each ``*_solve`` function returns ``None`` when the kernel cannot be used for
the given configuration (caller falls back to the lax.scan path, which is
also the numerical oracle in tests).
"""

from __future__ import annotations


def langevin_solve(
    key, q_matrix, v_vector, params, *, iterations, batch_size,
    rng="popcount32", hp=None,
):
    """Fused Langevin solve; implemented in ops/pallas_kernels.py.
    ``hp`` runs the fused Adam-in-loop variant (moments in VMEM scratch)."""
    from ccvm_tpu.ops import pallas_kernels

    return pallas_kernels.langevin_solve(
        key, q_matrix, v_vector, params, iterations=iterations,
        batch_size=batch_size, rng=rng, hp=hp,
    )


def pumped_langevin_solve(
    key, q_matrix, v_vector, params, *, iterations, batch_size,
    pump_rate_flag, rng="popcount32",
):
    from ccvm_tpu.ops import pallas_kernels

    return pallas_kernels.pumped_langevin_solve(
        key, q_matrix, v_vector, params, iterations=iterations,
        batch_size=batch_size, pump_rate_flag=pump_rate_flag, rng=rng,
    )


def dl_solve(
    key, q_matrix, v_vector, params, *, iterations, batch_size, pump_rate_flag,
    pump_is_gt_one, rng="popcount32", hp=None,
):
    from ccvm_tpu.ops import pallas_kernels

    return pallas_kernels.dl_solve(
        key, q_matrix, v_vector, params, iterations=iterations,
        batch_size=batch_size, pump_rate_flag=pump_rate_flag,
        pump_is_gt_one=pump_is_gt_one, rng=rng, hp=hp,
    )


def mf_solve(
    key, q_matrix, v_vector, params, *, iterations, batch_size,
    pump_rate_flag, rng="popcount32",
):
    from ccvm_tpu.ops import pallas_kernels

    return pallas_kernels.mf_solve(
        key, q_matrix, v_vector, params, iterations=iterations,
        batch_size=batch_size, pump_rate_flag=pump_rate_flag, rng=rng,
    )
