"""Shared machinery for the CCVM SDE dynamics.

Design: each dynamics family (Langevin, pumped Langevin, DL-CCVM, MF-CCVM)
is a *pure* step function ``step(state, i, key) -> state`` closed over problem
data and parameters; the integrator is a single ``lax.scan`` inside ``jit``
(the reference runs the Euler-Maruyama loop at Python level, re-launching
kernels every iteration — ``dl_solver.py:523``).  Adam-filtered variants keep
the Adam moments in the scan carry.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class AdamHyperparameters(NamedTuple):
    """Static Adam hyperparameters (mirrors ``solvers/algorithms.py:1-46``).

    These are Python values resolved at trace time: ``beta2 == 1.0`` and
    ``add_assign`` select different update formulas in the reference
    (``dl_solver.py:644-686``), so they are specialization points, not traced
    scalars.
    """

    alpha: float
    beta1: float
    beta2: float
    add_assign: bool


def adam_moment_update(grads, m, v, i, hp: AdamHyperparameters):
    """One step of the reference's in-loop Adam filtering.

    Returns the effective (bias-corrected, optionally add-assigned) gradients
    plus updated moments.  Matches ``langevin_solver.py:513-540`` /
    ``dl_solver.py:689-727``: first moment always; second moment only when
    ``beta2 != 1.0``; ``add_assign`` adds the raw gradient back.
    """
    epsilon = 1e-8
    m = hp.beta1 * m + (1.0 - hp.beta1) * grads
    beta1i = 1.0 - hp.beta1 ** (i + 1.0)
    mhat = m / beta1i
    if hp.beta2 != 1.0:
        v = hp.beta2 * v + (1.0 - hp.beta2) * jnp.square(grads)
        beta2i = 1.0 - hp.beta2 ** (i + 1.0)
        vhat = v / beta2i
        update = hp.alpha * mhat / (jnp.sqrt(vhat) + epsilon)
    else:
        update = hp.alpha * mhat
    if hp.add_assign:
        effective = grads + update
    else:
        effective = update
    return effective, m, v


def dense_matvec(x, q_matrix):
    """The hot-path contraction x @ Q for a (batch, n) state (the dominant
    FLOPs of every dynamics family; reference ``dl_solver.py:529-537``)."""
    return jnp.einsum("bi,ij->bj", x, q_matrix, preferred_element_type=x.dtype)


def tp_matvec(axis_name: str = "model"):
    """Tensor-parallel matvec for use under ``shard_map``.

    ``x`` holds the local feature shard (batch_local, n_local); ``q_matrix``
    holds the matching row block (n_local, n) of Q — rows shard the
    contraction dimension, so each device computes a full-width partial sum
    and a ``psum_scatter`` over the ICI returns the result to the feature
    sharding.  This is the only per-step collective of a TP solve.
    """

    def matvec(x, q_rows):
        partial = jnp.einsum(
            "bi,ij->bj", x, q_rows, preferred_element_type=x.dtype
        )
        return lax.psum_scatter(
            partial, axis_name, scatter_dimension=1, tiled=True
        )

    return matvec


def normal(key, shape, dtype=jnp.float32):
    """Standard-normal Wiener draws.

    The reference samples ``(problem_size, batch)`` then transposes
    (``dl_solver.py:538-547``); results match only statistically, so we sample
    in the natural ``(batch, n)`` layout directly.
    """
    return jax.random.normal(key, shape, dtype)


def scan_steps(step_fn, init_state, key, iterations: int):
    """Run ``step_fn`` for ``iterations`` steps under ``lax.scan``.

    ``step_fn(state, i, key_i) -> state``. Returns the final state. The key is
    folded per-iteration so every step draws independent noise and results are
    reproducible for a fixed key regardless of batch sharding.
    """

    def body(state, i):
        k = jax.random.fold_in(key, i)
        return step_fn(state, i, k), None

    final_state, _ = lax.scan(body, init_state, jnp.arange(iterations))
    return final_state


def scan_steps_from(step_fn, init_state, key, start: int, num: int):
    """Like :func:`scan_steps` but for iterations [start, start+num) — used by
    the evolution-sampling segmented driver."""

    def body(state, i):
        k = jax.random.fold_in(key, i)
        return step_fn(state, i, k), None

    final_state, _ = lax.scan(body, init_state, start + jnp.arange(num))
    return final_state


def scan_steps_segmented(step_fn, init_state, key, segments):
    """Run the full iteration loop in ONE jit, emitting a state sample after
    each segment (evolution recording).

    ``segments`` is a 1-D int array of per-segment step counts (summing to
    the total iterations; see ``CCVMSolver._evolution_sample_plan``).  The
    per-iteration key derivation is identical to :func:`scan_steps` /
    :func:`scan_steps_from`, so trajectories are bit-identical to the
    segmented host-loop driver this replaces — but with a single dispatch and
    a single device sync instead of one per segment (SURVEY §7 plan).

    Returns ``(final_state, samples)`` where ``samples`` stacks the state
    pytree with a leading (num_segments,) axis.
    """
    seg = jnp.asarray(segments, jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(seg)[:-1]]
    )

    def outer(state, bounds):
        start, num = bounds

        def inner(j, st):
            i = start + j
            k = jax.random.fold_in(key, i)
            return step_fn(st, i, k)

        state = lax.fori_loop(0, num, inner, state)
        return state, state

    return lax.scan(outer, init_state, (starts, seg))


@jax.jit
def change_variables_boxqp(problem_variables, lower_limit=0, upper_limit=1, S=1):
    """Map solver amplitudes into the box (reference ``dl_solver.py:219-235``;
    identical in all four solvers).  Jitted: a single dispatch instead of four
    eager ops — dispatch latency dominates small host-driven ops on TPU."""
    return 0.5 * problem_variables / S * (upper_limit - lower_limit) + 0.5 * (
        upper_limit + lower_limit
    )


@jax.jit
def langevin_change_variables(c, S):
    """The Langevin-family readout map ``(c + S) / (2 S)`` applied BEFORE
    post-processing (reference ``langevin_solver.py:716-722``); hardcodes the
    [0, 1] box exactly like the reference does."""
    return (c + S) / (2 * S)


def fit_to_constraints_boxqp(c, lower_clamp, upper_clamp):
    """Clamp amplitudes into the box (reference ``dl_solver.py:237-250``)."""
    return jnp.clip(c, lower_clamp, upper_clamp)


@functools.partial(jax.jit, static_argnames=("multiplier",))
def scaling_factor(q_matrix, multiplier: float):
    """sqrt(sum |Q|) * multiplier (reference ``ccvm_solver.py:134-150``)."""
    return jnp.sqrt(jnp.sum(jnp.abs(q_matrix))) * multiplier
