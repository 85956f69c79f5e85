"""DL-CCVM (delay-line) dynamics for BoxQP (TPU-native functional core).

Two-quadrature pump-saturated SDE (reference ``dl_solver.py:117-172``,
``:468-569``):
    rate        = (i+1)/T  (or 1)
    nr_i        = (noise_ratio - 1) * exp(-3 (i+1)/T) + 1
    S_d         = sqrt(pump - 1) if pump > 1 else S      (drift-only override!)
    c_grad_1    = 0.25 * ((c*(u-l)/S_d + (u+l)) @ Q) * (u-l)/S_d
    c_grad_2    = (-1 + pump*rate - c^2 - s^2) * c
    c_grad_3    = V * (u-l) / (2 S_d)
    fs_dyn      = feedback_scale * (0.5 + rate)
    c_drift     = -fs_dyn * (c_grad_1 + c_grad_3) + c_grad_2
    s_drift     = likewise with (-1 - pump*rate - ...) * s
    diff        = 2 g sqrt(c^2 + s^2 + 0.5)
    c          += dt*c_drift + diff * sqrt(dt)*nr_i * N(0,1)
    s          += dt*s_drift + diff * sqrt(dt)/nr_i * N(0,1)
Final c is clamped to the *original* +-S only after the loop (``:567``).

The Adam variant follows ``dl_solver.py:571-769``; note the reference's own
``__call__`` passes a stray argument and cannot reach it (``:906-923``) — we
implement it working, as documented behavioural fix.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ccvm_tpu.dynamics import common
from ccvm_tpu.dynamics.common import AdamHyperparameters


class DLParams(NamedTuple):
    """Traced per-solve parameters (``dl_solver.py:96-115`` + call args).

    ``ramp_power``/``ramp_fraction`` generalise the reference's linear pump
    ramp (a TPU-native extension; both ``None`` reproduces the reference
    schedule exactly): rate(i) = min((i+1)/(fraction*T), 1)**power.  A
    fraction < 1 gives a ramp-then-plateau schedule; power != 1 bends the
    ramp (concave < 1 rises fast early, convex > 1 anneals slowly).  Kept
    out of the reference's ``parameter_key`` validation for API parity;
    set through ``DLSolver.__call__(pump_ramp=...)``.
    """

    pump: jax.Array
    S: jax.Array  # user-facing saturation (clamp / change of variables)
    dt: jax.Array
    noise_ratio: jax.Array
    feedback_scale: jax.Array
    g: jax.Array
    lower_limit: jax.Array
    upper_limit: jax.Array
    iterations: jax.Array
    ramp_power: jax.Array | None = None
    ramp_fraction: jax.Array | None = None


def drift_saturation(p: DLParams, pump_is_gt_one: bool):
    """The drift-internal saturation override S_d (``dl_solver.py:140-141``).

    ``pump > 1`` is a host-side decision in the reference (numpy float), so it
    is a static specialization here as well.
    """
    if pump_is_gt_one:
        return jnp.sqrt(p.pump - 1.0)
    return p.S


def grads_boxqp(c, s, q_matrix, v_vector, lower_limit=0, upper_limit=1, S=1,
                matvec=common.dense_matvec):
    """Feedback-only gradients (``dl_solver.py:174-217``)."""
    span = upper_limit - lower_limit
    mid = upper_limit + lower_limit

    def one(z):
        x = z * span / S + mid
        return 0.25 * matvec(x, q_matrix) * span / S

    g3 = v_vector * span / (2 * S)
    return -one(c) - g3, -one(s) - g3


def drift_boxqp(
    c, s, q_matrix, v_vector, pump, rate, feedback_scale=100,
    lower_limit=0, upper_limit=1, S=1, matvec=common.dense_matvec,
):
    """Full drift for both quadratures (``dl_solver.py:117-172``).

    ``S`` here must already be the drift-internal S_d.
    """
    span = upper_limit - lower_limit
    mid = upper_limit + lower_limit
    c_pow = jnp.square(c)
    s_pow = jnp.square(s)

    def feedback(z):
        x = z * span / S + mid
        return 0.25 * matvec(x, q_matrix) * span / S

    g3 = v_vector * span / (2 * S)
    fs_dyn = feedback_scale * (0.5 + rate)
    c_drift = -fs_dyn * (feedback(c) + g3) + (-1 + pump * rate - c_pow - s_pow) * c
    s_drift = -fs_dyn * (feedback(s) + g3) + (-1 - pump * rate - c_pow - s_pow) * s
    return c_drift, s_drift


def noise_ratio_schedule(p: DLParams, i):
    """nr_i = (nr-1) e^{-3(i+1)/T} + 1 (``dl_solver.py:527``)."""
    return (p.noise_ratio - 1.0) * jnp.exp(-(i + 1.0) / p.iterations * 3.0) + 1.0


def pump_rate_schedule(p: DLParams, i, pump_rate_flag: bool):
    """Pump ramp rate(i) (reference ``dl_solver.py:524``: (i+1)/T).

    With the generalised-ramp fields unset this is exactly the reference's
    linear ramp (the ``None`` branch compiles the identical expression, so
    default solves stay bit-identical and Pallas-kernel-eligible).
    """
    if not pump_rate_flag:
        return jnp.float32(1.0)
    rate = (i + 1.0) / p.iterations
    if p.ramp_power is None and p.ramp_fraction is None:
        return rate
    if p.ramp_fraction is not None:
        rate = jnp.minimum(rate / p.ramp_fraction, 1.0)
    if p.ramp_power is not None:
        rate = jnp.power(rate, p.ramp_power)
    return rate


def make_step(
    q_matrix, v_vector, p: DLParams, pump_rate_flag: bool, pump_is_gt_one: bool,
    matvec=common.dense_matvec,
):
    sqrt_dt = jnp.sqrt(p.dt)
    s_drift_sat = drift_saturation(p, pump_is_gt_one)

    def step(state, i, key):
        c, s = state
        rate = pump_rate_schedule(p, i, pump_rate_flag)
        nr_i = noise_ratio_schedule(p, i)
        c_drift, s_drift = drift_boxqp(
            c, s, q_matrix, v_vector, p.pump, rate, p.feedback_scale,
            p.lower_limit, p.upper_limit, s_drift_sat, matvec,
        )
        kc, ks = jax.random.split(key)
        w_c = common.normal(kc, c.shape, c.dtype) * sqrt_dt * nr_i
        w_s = common.normal(ks, s.shape, s.dtype) * sqrt_dt / nr_i
        diff = 2.0 * p.g * jnp.sqrt(jnp.square(c) + jnp.square(s) + 0.5)
        c = c + p.dt * c_drift + diff * w_c
        s = s + p.dt * s_drift + diff * w_s
        return (c, s)

    return step


def make_adam_step(
    q_matrix,
    v_vector,
    p: DLParams,
    pump_rate_flag: bool,
    pump_is_gt_one: bool,
    hp: AdamHyperparameters,
    matvec=common.dense_matvec,
):
    """Adam variant (``dl_solver.py:571-769``): the feedback gradients are
    Adam-filtered; the pump drift uses pump_rate = pump*(i+1)/T."""
    sqrt_dt = jnp.sqrt(p.dt)
    s_grad_sat = drift_saturation(p, pump_is_gt_one)

    def step(state, i, key):
        c, s, m_c, v_c, m_s, v_s = state
        # pump_rate includes the pump amplitude in the Adam path (:627-632)
        pump_rate = p.pump * pump_rate_schedule(p, i, pump_rate_flag)
        nr_i = noise_ratio_schedule(p, i)
        c_grads, s_grads = grads_boxqp(
            c, s, q_matrix, v_vector, p.lower_limit, p.upper_limit, s_grad_sat,
            matvec,
        )
        c_grads, m_c, v_c = common.adam_moment_update(c_grads, m_c, v_c, i, hp)
        s_grads, m_s, v_s = common.adam_moment_update(s_grads, m_s, v_s, i, hp)
        c_pow = jnp.square(c)
        s_pow = jnp.square(s)
        c_drift = (-1.0 + pump_rate - c_pow - s_pow) * c
        s_drift = (-1.0 - pump_rate - c_pow - s_pow) * s
        kc, ks = jax.random.split(key)
        w_c = common.normal(kc, c.shape, c.dtype) * sqrt_dt * nr_i
        w_s = common.normal(ks, s.shape, s.dtype) * sqrt_dt / nr_i
        diff = 2.0 * p.g * jnp.sqrt(c_pow + s_pow + 0.5)
        c = c + p.dt * (c_drift + c_grads) + diff * w_c
        s = s + p.dt * (s_drift + s_grads) + diff * w_s
        return (c, s, m_c, v_c, m_s, v_s)

    return step


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "batch_size", "pump_rate_flag", "pump_is_gt_one", "hp",
        "shard",
    ),
)
def solve(
    key,
    q_matrix,
    v_vector,
    params: DLParams,
    *,
    iterations: int,
    batch_size: int,
    pump_rate_flag: bool = True,
    pump_is_gt_one: bool = False,
    hp: AdamHyperparameters | None = None,
    shard=None,
):
    """Full DL-CCVM solve; returns (c, s) with c clamped to the original +-S
    after the loop (``dl_solver.py:566-569``)."""
    n = q_matrix.shape[0]
    c0 = jnp.zeros((batch_size, n), q_matrix.dtype)
    if shard is not None:
        c0 = jax.lax.with_sharding_constraint(c0, shard)
    s0 = jnp.zeros_like(c0)
    if hp is None:
        step = make_step(q_matrix, v_vector, params, pump_rate_flag, pump_is_gt_one)
        c, s = common.scan_steps(step, (c0, s0), key, iterations)
    else:
        step = make_adam_step(
            q_matrix, v_vector, params, pump_rate_flag, pump_is_gt_one, hp
        )
        z = jnp.zeros_like(c0)
        c, s, *_ = common.scan_steps(step, (c0, s0, z, z, z, z), key, iterations)
    c = jnp.clip(c, -params.S, params.S)
    return c, s


@functools.partial(
    jax.jit,
    static_argnames=("batch_size", "pump_rate_flag", "pump_is_gt_one", "hp"),
)
def solve_sampled(
    key,
    q_matrix,
    v_vector,
    params: DLParams,
    segments,
    *,
    batch_size: int,
    pump_rate_flag: bool = True,
    pump_is_gt_one: bool = False,
    hp: AdamHyperparameters | None = None,
):
    """One-jit solve emitting (c, s) samples after each segment.

    Returns ``((c_final_clamped, s_final), (c_samples, s_samples))``; the
    final clamp matches :func:`solve` (``dl_solver.py:566-569``); samples are
    the raw pre-clamp states, as in the segmented driver this replaces."""
    n = q_matrix.shape[0]
    c0 = jnp.zeros((batch_size, n), q_matrix.dtype)
    s0 = jnp.zeros_like(c0)
    if hp is None:
        step = make_step(
            q_matrix, v_vector, params, pump_rate_flag, pump_is_gt_one
        )
        state0 = (c0, s0)
    else:
        step = make_adam_step(
            q_matrix, v_vector, params, pump_rate_flag, pump_is_gt_one, hp
        )
        z = jnp.zeros_like(c0)
        state0 = (c0, s0, z, z, z, z)
    final, samples = common.scan_steps_segmented(step, state0, key, segments)
    c = jnp.clip(final[0], -params.S, params.S)
    return (c, final[1]), (samples[0], samples[1])


@functools.partial(
    jax.jit, static_argnames=("num", "pump_rate_flag", "pump_is_gt_one", "hp")
)
def solve_segment(
    key,
    q_matrix,
    v_vector,
    params: DLParams,
    state,
    start,
    *,
    num: int,
    pump_rate_flag: bool = True,
    pump_is_gt_one: bool = False,
    hp: AdamHyperparameters | None = None,
):
    """Advance a DL state (no final clamp — that happens once at the end)."""
    if hp is None:
        step = make_step(q_matrix, v_vector, params, pump_rate_flag, pump_is_gt_one)
    else:
        step = make_adam_step(
            q_matrix, v_vector, params, pump_rate_flag, pump_is_gt_one, hp
        )
    return common.scan_steps_from(step, state, key, start, num)
