"""Batched box-projected L-BFGS on device.

The reference's BFGS post-processor loops scipy ``L-BFGS-B`` over batch rows
on the host (``post_processor/bfgs.py:42-52``) and its LBFGS post-processor
loops ``torch.optim.LBFGS`` per row (``post_processor/lbfgs.py:48-63``) —
both serialize a 1000-row batch.  Here a fixed-iteration limited-memory BFGS
with projected Armijo backtracking runs fully vectorized (vmap over the
batch) inside ``jit`` on the accelerator.

Algorithm: standard two-loop recursion over a rolled (history, n) buffer,
gradient-direction fallback for the first step, curvature-guarded pair
updates, and projection onto the box after every trial point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _two_loop(g, S, Y, rho, num_pairs, history):
    """L-BFGS two-loop recursion; valid pairs occupy the trailing
    ``num_pairs`` rows of the rolled buffers (most recent last)."""
    alphas = jnp.zeros(history, g.dtype)

    def bwd(t, carry):
        q, alphas = carry
        j = history - 1 - t
        valid = t < num_pairs
        a = rho[j] * jnp.dot(S[j], q)
        a = jnp.where(valid, a, 0.0)
        q = q - a * Y[j]
        return q, alphas.at[j].set(a)

    q, alphas = lax.fori_loop(0, history, bwd, (g, alphas))

    last = history - 1
    yy = jnp.dot(Y[last], Y[last])
    gamma = jnp.where(num_pairs > 0, jnp.dot(S[last], Y[last]) / (yy + 1e-12), 1.0)
    r = gamma * q

    def fwd(j, r):
        valid = j >= history - num_pairs
        beta = rho[j] * jnp.dot(Y[j], r)
        upd = S[j] * (alphas[j] - beta)
        return r + jnp.where(valid, upd, 0.0)

    r = lax.fori_loop(0, history, fwd, r)
    return -r


def _lbfgs_single(
    x0, q_matrix, v_vector, lower, upper, max_iter, history, first_step_scale,
    max_backtracks,
):
    """Minimize 0.5 xQx + Vx over the box for ONE trajectory."""
    n = x0.shape[0]
    dtype = x0.dtype

    def value(x):
        qx = q_matrix @ x
        return 0.5 * jnp.dot(x, qx) + jnp.dot(v_vector, x)

    def grad(x):
        return q_matrix @ x + v_vector

    def body(k, state):
        x, f, g, S, Y, rho, num_pairs = state
        d = _two_loop(g, S, Y, rho, num_pairs, history)
        # Fall back to steepest descent if the direction is not a descent
        # direction (can happen on indefinite Q).
        descent = jnp.dot(g, d) < 0
        d = jnp.where(descent, d, -g)
        # torch-LBFGS-style conservative first step: t0 = min(1, 1/|g|_1)*scale
        t0 = jnp.where(
            num_pairs > 0,
            jnp.asarray(1.0, dtype),
            jnp.minimum(1.0, 1.0 / (jnp.sum(jnp.abs(g)) + 1e-12)) * first_step_scale,
        )

        def bt_body(carry):
            t, x_new, f_new, it = carry
            return (t * 0.5, x_new, f_new, it + 1)

        def bt_cond(carry):
            t, x_new, f_new, it = carry
            x_try = jnp.clip(x + t * d, lower, upper)
            f_try = value(x_try)
            ok = f_try <= f + 1e-4 * jnp.dot(g, x_try - x)
            return jnp.logical_and(~ok, it < max_backtracks)

        t_final, *_ = lax.while_loop(bt_cond, bt_body, (t0, x, f, 0))
        x_new = jnp.clip(x + t_final * d, lower, upper)
        f_new = value(x_new)
        # Reject the step entirely if it did not decrease the objective.
        improved = f_new < f
        x_new = jnp.where(improved, x_new, x)
        f_new = jnp.where(improved, f_new, f)
        g_new = grad(x_new)

        s = x_new - x
        y = g_new - g
        sy = jnp.dot(s, y)
        store = jnp.logical_and(improved, sy > 1e-10)

        def do_store(args):
            S, Y, rho, num_pairs = args
            S = jnp.roll(S, -1, axis=0).at[history - 1].set(s)
            Y = jnp.roll(Y, -1, axis=0).at[history - 1].set(y)
            rho = jnp.roll(rho, -1).at[history - 1].set(1.0 / sy)
            return S, Y, rho, jnp.minimum(num_pairs + 1, history)

        S, Y, rho, num_pairs = lax.cond(
            store, do_store, lambda a: a, (S, Y, rho, num_pairs)
        )
        return (x_new, f_new, g_new, S, Y, rho, num_pairs)

    x0 = jnp.clip(x0, lower, upper)
    init = (
        x0,
        value(x0),
        grad(x0),
        jnp.zeros((history, n), dtype),
        jnp.zeros((history, n), dtype),
        jnp.zeros(history, dtype),
        jnp.asarray(0, jnp.int32),
    )
    x, *_ = lax.fori_loop(0, max_iter, body, init)
    return x


@functools.partial(
    jax.jit,
    static_argnames=("max_iter", "history", "max_backtracks"),
)
def lbfgs_box_batch(
    c,
    q_matrix,
    v_vector,
    lower=0.0,
    upper=1.0,
    first_step_scale=1.0,
    *,
    max_iter=50,
    history=8,
    max_backtracks=25,
):
    """Box-projected L-BFGS over a (batch, n) set of starting points."""
    f = functools.partial(
        _lbfgs_single,
        q_matrix=q_matrix,
        v_vector=v_vector,
        lower=lower,
        upper=upper,
        max_iter=max_iter,
        history=history,
        first_step_scale=first_step_scale,
        max_backtracks=max_backtracks,
    )
    return jax.vmap(f)(c)
