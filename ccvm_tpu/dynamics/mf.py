"""MF-CCVM (measurement-feedback) dynamics for BoxQP (TPU-native core).

Mean-field SDE over (mu, sigma) with a measured field mu_tilde (reference
``mf_solver.py:141-198``, ``:493-593``):

    j_i       = j * exp(-3 (i+1)/T)
    W         ~ N(0,1);  w_inc = W / sqrt(dt)          (note the division!)
    mu_tilde  = mu + sqrt(1/(4 j_i)) * w_inc;  mu_tilde_c = clip(mu_tilde,+-S)
    pump_inst = pump * rate + 1 + j_i,  rate = (i+1)/T (or 1)
    drift_mu  = (-(1+j_i) + pump_inst - g^2 mu^2) mu
                + fs * ( -(1/4) ((mu_tilde_c*(u-l)/S + (u+l)) @ Q) (u-l)/S
                         - V (u-l)/(2S) )
    drift_sig = 2(-(1+j_i) + pump_inst - 3 g^2 mu^2) sigma
                - 2 j_i (sigma - 1/2)^2 + (1+j_i) + 2 g^2 mu^2
    mu       += dt * (drift_mu + sqrt(j_i)(sigma - 1/2) w_inc)
    sigma    += dt * drift_sig

The *same* Wiener draw feeds both the measured field and the mu diffusion in
one iteration, and the readout is the clamped mu_tilde from the **last**
iteration (computed from the pre-update mu) — both subtleties are preserved
by carrying mu_tilde in the scan state.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ccvm_tpu.dynamics import common
from ccvm_tpu.dynamics.common import AdamHyperparameters


class MFParams(NamedTuple):
    """Traced per-solve parameters (``mf_solver.py:120-139`` + call args)."""

    pump: jax.Array
    S: jax.Array
    dt: jax.Array
    j: jax.Array
    feedback_scale: jax.Array
    g: jax.Array
    lower_limit: jax.Array
    upper_limit: jax.Array
    iterations: jax.Array


def feedback_terms(mu_tilde_c, q_matrix, v_vector, S, lower_limit, upper_limit,
                   matvec=common.dense_matvec):
    """fs-independent feedback terms (``mf_solver.py:176-189``)."""
    span = upper_limit - lower_limit
    mid = upper_limit + lower_limit
    x = mu_tilde_c * span / S + mid
    qx = matvec(x, q_matrix)
    term2_1 = -0.25 * qx * span / S
    term2_2 = -v_vector * span / (2 * S)
    return term2_1 + term2_2


def drift_boxqp(
    mu, mu_tilde, sigma, pump, j, g, S, fs, q_matrix, v_vector,
    lower_limit=0, upper_limit=1, matvec=common.dense_matvec,
):
    """Drift of mu and sigma (``mf_solver.py:141-198``). ``pump`` here is the
    instantaneous pump."""
    mu_pow = jnp.square(mu)
    mu_term1 = (-(1 + j) + pump - g**2 * mu_pow) * mu
    fb = feedback_terms(mu_tilde, q_matrix, v_vector, S, lower_limit,
                        upper_limit, matvec)
    sigma_term1 = 2 * (-(1 + j) + pump - 3 * g**2 * mu_pow) * sigma
    sigma_term2 = -2 * j * jnp.square(sigma - 0.5)
    sigma_term3 = (1 + j) + 2 * g**2 * mu_pow
    drift_mu = mu_term1 + fs * fb
    drift_sigma = sigma_term1 + sigma_term2 + sigma_term3
    return drift_mu, drift_sigma


def grads_boxqp(mu_tilde, S, fs, q_matrix, v_vector, lower_limit=0,
                upper_limit=1, matvec=common.dense_matvec):
    """Feedback-only gradient for the Adam path (``mf_solver.py:200-233``)."""
    return fs * feedback_terms(
        mu_tilde, q_matrix, v_vector, S, lower_limit, upper_limit, matvec
    )


def measurement_strength(p: MFParams, i):
    """j_i = j e^{-3(i+1)/T} (``mf_solver.py:550``)."""
    return p.j * jnp.exp(-(i + 1.0) / p.iterations * 3.0)


def make_step(q_matrix, v_vector, p: MFParams, pump_rate_flag: bool,
              matvec=common.dense_matvec):
    sqrt_dt = jnp.sqrt(p.dt)

    def step(state, i, key):
        mu, sigma, _ = state
        j_i = measurement_strength(p, i)
        w = common.normal(key, mu.shape, mu.dtype)
        w_inc = w / sqrt_dt
        mu_tilde = mu + jnp.sqrt(1.0 / (4.0 * j_i)) * w_inc
        mu_tilde_c = jnp.clip(mu_tilde, -p.S, p.S)
        rate = (i + 1.0) / p.iterations if pump_rate_flag else jnp.float32(1.0)
        pump_inst = p.pump * rate + 1.0 + j_i
        drift_mu, drift_sigma = drift_boxqp(
            mu, mu_tilde_c, sigma, pump_inst, j_i, p.g, p.S, p.feedback_scale,
            q_matrix, v_vector, p.lower_limit, p.upper_limit, matvec,
        )
        mu_diffusion = jnp.sqrt(j_i) * (sigma - 0.5) * w_inc
        mu = mu + p.dt * (drift_mu + mu_diffusion)
        sigma = sigma + p.dt * drift_sigma
        return (mu, sigma, mu_tilde)

    return step


def make_adam_step(
    q_matrix, v_vector, p: MFParams, pump_rate_flag: bool, hp: AdamHyperparameters,
    matvec=common.dense_matvec,
):
    """Adam variant (``mf_solver.py:595-764``)."""
    sqrt_dt = jnp.sqrt(p.dt)

    def step(state, i, key):
        mu, sigma, _, m_mu, v_mu = state
        j_i = measurement_strength(p, i)
        w = common.normal(key, mu.shape, mu.dtype)
        w_inc = w / sqrt_dt
        mu_tilde = mu + jnp.sqrt(1.0 / (4.0 * j_i)) * w_inc
        mu_tilde_c = jnp.clip(mu_tilde, -p.S, p.S)
        rate = (i + 1.0) / p.iterations if pump_rate_flag else jnp.float32(1.0)
        pump_inst = p.pump * rate + 1.0 + j_i
        grads_mu = grads_boxqp(
            mu_tilde_c, p.S, p.feedback_scale, q_matrix, v_vector,
            p.lower_limit, p.upper_limit, matvec,
        )
        grads_mu, m_mu, v_mu = common.adam_moment_update(grads_mu, m_mu, v_mu, i, hp)
        mu_pow = jnp.square(mu)
        mu_drift = (-(1.0 + j_i) + pump_inst - p.g**2 * mu_pow) * mu
        mu_drift = mu_drift + jnp.sqrt(j_i) * (sigma - 0.5) * w_inc
        new_mu = mu + p.dt * (grads_mu + mu_drift)
        sigma_drift = 2.0 * (-(1.0 + j_i) + pump_inst - 3.0 * p.g**2 * mu_pow) * sigma
        sigma_drift = sigma_drift - 2.0 * j_i * jnp.square(sigma - 0.5)
        sigma_drift = sigma_drift + (1.0 + j_i) + 2.0 * p.g**2 * mu_pow
        sigma = sigma + p.dt * sigma_drift
        return (new_mu, sigma, mu_tilde, m_mu, v_mu)

    return step


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "batch_size", "pump_rate_flag", "hp", "shard"),
)
def solve(
    key,
    q_matrix,
    v_vector,
    params: MFParams,
    *,
    iterations: int,
    batch_size: int,
    pump_rate_flag: bool = True,
    hp: AdamHyperparameters | None = None,
    shard=None,
):
    """Full MF-CCVM solve; returns (mu, mu_tilde_clamped, sigma) where the
    readout mu_tilde comes from the last iteration (``mf_solver.py:591-593``)."""
    n = q_matrix.shape[0]
    mu0 = jnp.zeros((batch_size, n), q_matrix.dtype)
    if shard is not None:
        mu0 = jax.lax.with_sharding_constraint(mu0, shard)
    sigma0 = jnp.full_like(mu0, 0.5)
    mt0 = jnp.zeros_like(mu0)
    if hp is None:
        step = make_step(q_matrix, v_vector, params, pump_rate_flag)
        mu, sigma, mu_tilde = common.scan_steps(
            step, (mu0, sigma0, mt0), key, iterations
        )
    else:
        step = make_adam_step(q_matrix, v_vector, params, pump_rate_flag, hp)
        z = jnp.zeros_like(mu0)
        mu, sigma, mu_tilde, _, _ = common.scan_steps(
            step, (mu0, sigma0, mt0, z, z), key, iterations
        )
    mu_tilde = jnp.clip(mu_tilde, -params.S, params.S)
    return mu, mu_tilde, sigma


@functools.partial(
    jax.jit, static_argnames=("batch_size", "pump_rate_flag", "hp")
)
def solve_sampled(
    key,
    q_matrix,
    v_vector,
    params: MFParams,
    segments,
    *,
    batch_size: int,
    pump_rate_flag: bool = True,
    hp: AdamHyperparameters | None = None,
):
    """One-jit solve emitting (mu, sigma) samples after each segment.

    Returns ``((mu, mu_tilde_clamped, sigma), (mu_samples, sigma_samples))``
    with the readout mu_tilde from the last iteration, like :func:`solve`."""
    n = q_matrix.shape[0]
    mu0 = jnp.zeros((batch_size, n), q_matrix.dtype)
    sigma0 = jnp.full_like(mu0, 0.5)
    mt0 = jnp.zeros_like(mu0)
    if hp is None:
        step = make_step(q_matrix, v_vector, params, pump_rate_flag)
        state0 = (mu0, sigma0, mt0)
    else:
        step = make_adam_step(q_matrix, v_vector, params, pump_rate_flag, hp)
        z = jnp.zeros_like(mu0)
        state0 = (mu0, sigma0, mt0, z, z)
    final, samples = common.scan_steps_segmented(step, state0, key, segments)
    mu, sigma = final[0], final[1]
    mu_tilde = jnp.clip(final[2], -params.S, params.S)
    return (mu, mu_tilde, sigma), (samples[0], samples[1])


@functools.partial(jax.jit, static_argnames=("num", "pump_rate_flag", "hp"))
def solve_segment(
    key,
    q_matrix,
    v_vector,
    params: MFParams,
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
