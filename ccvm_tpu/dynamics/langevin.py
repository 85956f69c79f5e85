"""Langevin dynamics for BoxQP (TPU-native functional core).

SDE (reference ``langevin_solver.py:368-435``):
    x      = c * (u - l) / (2 S) + (u + l) / 2
    drift  = -((x @ Q) + V) * (u - l) / (2 S)
    c     += dt * feedback_scale * drift + sigma * sqrt(dt) * N(0, 1)
    c      = clip(c, -S, S)                      (every step)

The Adam variant (``langevin_solver.py:437-561``) runs the same gradient
through bias-corrected Adam moments before the update.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ccvm_tpu.dynamics import common
from ccvm_tpu.dynamics.common import AdamHyperparameters


class LangevinParams(NamedTuple):
    """Traced per-solve parameters (reference parameter_key keys
    ``langevin_solver.py:96-115`` plus the box bounds)."""

    S: jax.Array
    dt: jax.Array
    sigma: jax.Array
    feedback_scale: jax.Array
    lower_limit: jax.Array
    upper_limit: jax.Array


def drift_boxqp(c, q_matrix, v_vector, lower_limit=0, upper_limit=1, S=1,
                matvec=common.dense_matvec):
    """Langevin drift (identical to grads, ``langevin_solver.py:117-166``).

    ``matvec`` selects the x @ Q implementation — dense by default,
    :func:`common.tp_matvec` for a model-sharded solve under ``shard_map``.
    """
    scale = (upper_limit - lower_limit) / (2 * S)
    x = c * scale + (upper_limit + lower_limit) / 2
    qx = matvec(x, q_matrix)
    return -(qx + v_vector) * scale


def make_step(q_matrix, v_vector, p: LangevinParams,
              matvec=common.dense_matvec):
    """Original-dynamics step function."""
    sqrt_dt = jnp.sqrt(p.dt)

    def step(c, i, key):
        d = drift_boxqp(c, q_matrix, v_vector, p.lower_limit, p.upper_limit,
                        p.S, matvec)
        w = common.normal(key, c.shape, c.dtype) * sqrt_dt
        c = c + p.dt * p.feedback_scale * d + p.sigma * w
        return jnp.clip(c, -p.S, p.S)

    return step


def make_adam_step(q_matrix, v_vector, p: LangevinParams, hp: AdamHyperparameters,
                   matvec=common.dense_matvec):
    """Adam-filtered step; carry is (c, m, v) (``langevin_solver.py:437-561``)."""
    sqrt_dt = jnp.sqrt(p.dt)

    def step(state, i, key):
        c, m, v = state
        grads = drift_boxqp(c, q_matrix, v_vector, p.lower_limit, p.upper_limit,
                            p.S, matvec)
        grads, m, v = common.adam_moment_update(grads, m, v, i, hp)
        w = common.normal(key, c.shape, c.dtype) * sqrt_dt
        c = c + p.dt * p.feedback_scale * grads + p.sigma * w
        return (jnp.clip(c, -p.S, p.S), m, v)

    return step


@functools.partial(
    jax.jit, static_argnames=("iterations", "batch_size", "hp", "shard")
)
def solve(
    key,
    q_matrix,
    v_vector,
    params: LangevinParams,
    *,
    iterations: int,
    batch_size: int,
    hp: AdamHyperparameters | None = None,
    shard=None,
):
    """Full Langevin solve: zeros init, `iterations` fused steps, final c.

    ``shard``: optional :class:`jax.sharding.NamedSharding` for the (batch, n)
    trajectory tensor — batch-axis data parallelism over a device mesh.
    """
    n = q_matrix.shape[0]
    c0 = jnp.zeros((batch_size, n), q_matrix.dtype)
    if shard is not None:
        c0 = jax.lax.with_sharding_constraint(c0, shard)
    if hp is None:
        step = make_step(q_matrix, v_vector, params)
        return common.scan_steps(step, c0, key, iterations)
    step = make_adam_step(q_matrix, v_vector, params, hp)
    zeros = jnp.zeros_like(c0)
    c, _, _ = common.scan_steps(step, (c0, zeros, zeros), key, iterations)
    return c


@functools.partial(jax.jit, static_argnames=("batch_size", "hp"))
def solve_sampled(
    key,
    q_matrix,
    v_vector,
    params: LangevinParams,
    segments,
    *,
    batch_size: int,
    hp: AdamHyperparameters | None = None,
):
    """Whole solve in one jit with a c sample after each segment (in-jit
    evolution recording).  Returns (c_final, c_samples[num_segments, b, n]);
    trajectories are bit-identical to chaining :func:`solve_segment`."""
    n = q_matrix.shape[0]
    c0 = jnp.zeros((batch_size, n), q_matrix.dtype)
    if hp is None:
        step = make_step(q_matrix, v_vector, params)
        final, samples = common.scan_steps_segmented(step, c0, key, segments)
        return final, samples
    step = make_adam_step(q_matrix, v_vector, params, hp)
    zeros = jnp.zeros_like(c0)
    final, samples = common.scan_steps_segmented(
        step, (c0, zeros, zeros), key, segments
    )
    return final[0], samples[0]


@functools.partial(jax.jit, static_argnames=("num", "hp"))
def solve_segment(
    key,
    q_matrix,
    v_vector,
    params: LangevinParams,
    state,
    start,
    *,
    num: int,
    hp: AdamHyperparameters | None = None,
):
    """Advance an existing state by ``num`` iterations starting at absolute
    iteration ``start`` — building block for evolution sampling."""
    if hp is None:
        step = make_step(q_matrix, v_vector, params)
    else:
        step = make_adam_step(q_matrix, v_vector, params, hp)
    return common.scan_steps_from(step, state, key, start, num)
