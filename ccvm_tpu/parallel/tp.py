"""Tensor + data parallel CCVM solve via shard_map with explicit collectives.

For problem sizes far beyond the bundled N<=70 set, the (batch, N) state and
the (N, N) coupling matrix both shard over a 2-D ("batch", "model") mesh:

* state c/s: P("batch", "model")  — trajectories over DP, features over TP
* Q:         P("model", None)    — rows over TP (the contraction dim)
* V:         P("model")          — features over TP

The per-step matvec computes local partials ``x_local @ q_local`` and
reduce-scatters them back to the feature sharding over the ICI
(``psum_scatter`` over "model"); the only other collectives are the tiny
energy/best-objective reductions at the end (``psum`` over "model",
``pmin`` over "batch").  This is the TPU-native answer to what the
reference could never do at all (strictly single device).
"""

from __future__ import annotations

import functools
import inspect

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ccvm_tpu.dynamics.dl import DLParams

# jax renamed shard_map's replication-check kwarg (check_rep -> check_vma in
# 0.7+); resolve the spelling once so we work on either side of the rename.
# If a future jax wraps shard_map so the signature is opaque (**kwargs), fall
# back to trying each spelling at call time.
try:
    _REP_KWARG = (
        {"check_vma": False}
        if "check_vma" in inspect.signature(shard_map).parameters
        else {"check_rep": False}
    )
except (ValueError, TypeError):  # signature unavailable
    _REP_KWARG = None


def _shard_map(fn, **kwargs):
    """shard_map with the replication check disabled, robust to the
    check_rep -> check_vma kwarg rename across jax versions."""
    if _REP_KWARG is not None:
        return shard_map(fn, **kwargs, **_REP_KWARG)
    try:
        return shard_map(fn, **kwargs, check_vma=False)
    except TypeError:
        return shard_map(fn, **kwargs, check_rep=False)


def _tp_matvec(x_local, q_local):
    """Row-sharded matvec with reduce-scatter back to feature sharding.

    x_local: (b_local, n_local) slice of x along features
    q_local: (n_local, n) slice of Q along rows (contraction dim)
    returns: (b_local, n_local) slice of x @ Q along output features
    """
    partial = jnp.einsum(
        "bi,ij->bj", x_local, q_local, preferred_element_type=x_local.dtype
    )
    return lax.psum_scatter(partial, "model", scatter_dimension=1, tiled=True)


def make_dl_sharded_solve(mesh, *, iterations: int, pump_rate_flag: bool = True,
                          pump_is_gt_one: bool = True):
    """Build a jitted, fully sharded DL-CCVM solve over a (batch, model) mesh.

    Returns ``solve(key, q, v, params, c0, s0) -> (c, s, objval, best)`` where
    c0/s0 are (batch, n) and may be passed unsharded (jit resolves the
    shardings from the shard_map specs).
    """

    def body(key, q_local, v_local, params: DLParams, c, s):
        # Decorrelate noise across both mesh axes.
        key = jax.random.fold_in(key, lax.axis_index("batch"))
        key = jax.random.fold_in(key, lax.axis_index("model"))

        span = params.upper_limit - params.lower_limit
        mid = params.upper_limit + params.lower_limit
        S_d = jnp.sqrt(params.pump - 1.0) if pump_is_gt_one else params.S
        sqrt_dt = jnp.sqrt(params.dt)

        def step(state, i):
            c, s = state
            rate = (
                (i + 1.0) / params.iterations if pump_rate_flag else jnp.float32(1.0)
            )
            nr_i = (params.noise_ratio - 1.0) * jnp.exp(
                -(i + 1.0) / params.iterations * 3.0
            ) + 1.0
            c_pow = jnp.square(c)
            s_pow = jnp.square(s)
            qx_c = _tp_matvec(c * span / S_d + mid, q_local)
            qx_s = _tp_matvec(s * span / S_d + mid, q_local)
            g3 = v_local * span / (2 * S_d)
            fs_dyn = params.feedback_scale * (0.5 + rate)
            c_drift = (
                -fs_dyn * (0.25 * qx_c * span / S_d + g3)
                + (-1 + params.pump * rate - c_pow - s_pow) * c
            )
            s_drift = (
                -fs_dyn * (0.25 * qx_s * span / S_d + g3)
                + (-1 - params.pump * rate - c_pow - s_pow) * s
            )
            k = jax.random.fold_in(key, i)
            kc, ks = jax.random.split(k)
            w_c = jax.random.normal(kc, c.shape, c.dtype) * sqrt_dt * nr_i
            w_s = jax.random.normal(ks, s.shape, s.dtype) * sqrt_dt / nr_i
            diff = 2.0 * params.g * jnp.sqrt(c_pow + s_pow + 0.5)
            return (c + params.dt * c_drift + diff * w_c,
                    s + params.dt * s_drift + diff * w_s), None

        (c, s), _ = lax.scan(step, (c, s), jnp.arange(iterations))
        c = jnp.clip(c, -params.S, params.S)

        # Objective on the changed variables (cross-feature psum, tiny)
        x = 0.5 * c / params.S * span + 0.5 * mid
        qx = jnp.einsum("bi,ij->bj", x, q_local, preferred_element_type=x.dtype)
        qx = lax.psum_scatter(qx, "model", scatter_dimension=1, tiled=True)
        e1 = lax.psum(jnp.sum(x * qx, axis=-1), "model")
        e2 = lax.psum(x @ v_local, "model")
        objval = 0.5 * e1 + e2
        best = lax.pmin(jnp.min(objval), "batch")
        return c, s, objval, -best

    sharded = _shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),                 # key (replicated)
            P("model", None),    # Q rows over TP
            P("model"),          # V features over TP
            P(),                 # params (replicated scalars)
            P("batch", "model"),  # c
            P("batch", "model"),  # s
        ),
        out_specs=(
            P("batch", "model"),  # c
            P("batch", "model"),  # s
            P("batch"),           # objective values
            P(),                  # best objective (replicated scalar)
        ),
    )
    return jax.jit(sharded)


def dl_sharded_solve(mesh, key, q, v, params: DLParams, batch_size: int,
                     *, iterations: int, pump_rate_flag: bool = True):
    """Convenience wrapper: zero-init state, run the sharded solve."""
    n = q.shape[0]
    c0 = jnp.zeros((batch_size, n), q.dtype)
    s0 = jnp.zeros((batch_size, n), q.dtype)
    pump_gt_one = bool(float(params.pump) > 1)
    solve = make_dl_sharded_solve(
        mesh, iterations=iterations, pump_rate_flag=pump_rate_flag,
        pump_is_gt_one=pump_gt_one,
    )
    return solve(key, q, v, params, c0, s0)
