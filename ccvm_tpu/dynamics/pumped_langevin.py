"""Pumped Langevin dynamics for BoxQP (TPU-native functional core).

SDE (reference ``pumped_langevin_solver.py:95-147``, ``:232-309``):
    p(i)   = pump * (i + 1) / T          (or constant pump)
    grads  = -((x @ Q) * (u-l)/(2S) + V * (u-l)/(2S)),  x = c*(u-l)/(2S) + (u+l)/2
    drift  = (-1 + p(i) - c^2) * c + feedback_scale * grads
    c     += dt * drift + sigma * sqrt(dt) * N(0,1);  c = clip(c, -S, S)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ccvm_tpu.dynamics import common
from ccvm_tpu.dynamics.common import AdamHyperparameters


class PumpedLangevinParams(NamedTuple):
    """Traced per-solve parameters (``pumped_langevin_solver.py:74-93``)."""

    pump: jax.Array
    S: jax.Array
    dt: jax.Array
    sigma: jax.Array
    feedback_scale: jax.Array
    lower_limit: jax.Array
    upper_limit: jax.Array
    iterations: jax.Array  # total T, used by the pump schedule


def grads_boxqp(c, q_matrix, v_vector, lower_limit=0, upper_limit=1, S=1,
                matvec=common.dense_matvec):
    """Feedback gradient (``pumped_langevin_solver.py:118-147``)."""
    scale = (upper_limit - lower_limit) / (2 * S)
    x = c * scale + (upper_limit + lower_limit) / 2
    qx = matvec(x, q_matrix)
    return -qx * scale - v_vector * scale


def pump_field(p: PumpedLangevinParams, i, pump_rate_flag: bool):
    """p(i) = pump*(i+1)/T when rate-scaled, else pump
    (``pumped_langevin_solver.py:279-282``)."""
    if pump_rate_flag:
        return p.pump * (i + 1.0) / p.iterations
    return p.pump


def make_step(q_matrix, v_vector, p: PumpedLangevinParams, pump_rate_flag: bool,
              matvec=common.dense_matvec):
    sqrt_dt = jnp.sqrt(p.dt)

    def step(c, i, key):
        g = grads_boxqp(c, q_matrix, v_vector, p.lower_limit, p.upper_limit,
                        p.S, matvec)
        pump_i = pump_field(p, i, pump_rate_flag)
        drift = (-1.0 + pump_i - jnp.square(c)) * c + p.feedback_scale * g
        w = common.normal(key, c.shape, c.dtype) * sqrt_dt
        c = c + p.dt * drift + p.sigma * w
        return jnp.clip(c, -p.S, p.S)

    return step


def make_adam_step(
    q_matrix,
    v_vector,
    p: PumpedLangevinParams,
    pump_rate_flag: bool,
    hp: AdamHyperparameters,
    matvec=common.dense_matvec,
):
    """Adam variant (``pumped_langevin_solver.py:311-449``): only the feedback
    gradient goes through Adam; the pump drift stays physical."""
    sqrt_dt = jnp.sqrt(p.dt)

    def step(state, i, key):
        c, m, v = state
        g = grads_boxqp(c, q_matrix, v_vector, p.lower_limit, p.upper_limit,
                        p.S, matvec)
        g, m, v = common.adam_moment_update(g, m, v, i, hp)
        pump_i = pump_field(p, i, pump_rate_flag)
        c_pump = (-1.0 + pump_i - jnp.square(c)) * c
        w = common.normal(key, c.shape, c.dtype) * sqrt_dt
        c = c + p.dt * (c_pump + p.feedback_scale * g) + p.sigma * w
        return (jnp.clip(c, -p.S, p.S), m, v)

    return step


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "batch_size", "pump_rate_flag", "hp", "shard"),
)
def solve(
    key,
    q_matrix,
    v_vector,
    params: PumpedLangevinParams,
    *,
    iterations: int,
    batch_size: int,
    pump_rate_flag: bool = True,
    hp: AdamHyperparameters | None = None,
    shard=None,
):
    n = q_matrix.shape[0]
    c0 = jnp.zeros((batch_size, n), q_matrix.dtype)
    if shard is not None:
        c0 = jax.lax.with_sharding_constraint(c0, shard)
    if hp is None:
        step = make_step(q_matrix, v_vector, params, pump_rate_flag)
        return common.scan_steps(step, c0, key, iterations)
    step = make_adam_step(q_matrix, v_vector, params, pump_rate_flag, hp)
    zeros = jnp.zeros_like(c0)
    c, _, _ = common.scan_steps(step, (c0, zeros, zeros), key, iterations)
    return c


@functools.partial(
    jax.jit, static_argnames=("batch_size", "pump_rate_flag", "hp")
)
def solve_sampled(
    key,
    q_matrix,
    v_vector,
    params: PumpedLangevinParams,
    segments,
    *,
    batch_size: int,
    pump_rate_flag: bool = True,
    hp: AdamHyperparameters | None = None,
):
    """One-jit solve with a c sample after each segment (see
    :func:`ccvm_tpu.dynamics.common.scan_steps_segmented`)."""
    n = q_matrix.shape[0]
    c0 = jnp.zeros((batch_size, n), q_matrix.dtype)
    if hp is None:
        step = make_step(q_matrix, v_vector, params, pump_rate_flag)
        return common.scan_steps_segmented(step, c0, key, segments)
    step = make_adam_step(q_matrix, v_vector, params, pump_rate_flag, hp)
    zeros = jnp.zeros_like(c0)
    final, samples = common.scan_steps_segmented(
        step, (c0, zeros, zeros), key, segments
    )
    return final[0], samples[0]


@functools.partial(jax.jit, static_argnames=("num", "pump_rate_flag", "hp"))
def solve_segment(
    key,
    q_matrix,
    v_vector,
    params: PumpedLangevinParams,
    state,
    start,
    *,
    num: int,
    pump_rate_flag: bool = True,
    hp: AdamHyperparameters | None = None,
):
    if hp is None:
        step = make_step(q_matrix, v_vector, params, pump_rate_flag)
    else:
        step = make_adam_step(q_matrix, v_vector, params, pump_rate_flag, hp)
    return common.scan_steps_from(step, state, key, start, num)
