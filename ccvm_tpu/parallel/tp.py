"""Tensor + data parallel CCVM solves via shard_map with explicit collectives.

For problem sizes far beyond the bundled N<=70 set, the (batch, N) state and
the (N, N) coupling matrix both shard over a 2-D ("batch", "model") mesh:

* state (c / s / mu / sigma / Adam moments): P("batch", "model")
* Q:  P("model", None) — rows over TP (the contraction dimension)
* V:  P("model")       — features over TP

Each per-step matvec computes local partials ``x_local @ q_rows`` and
reduce-scatters them back to the feature sharding over the ICI
(:func:`ccvm_tpu.dynamics.common.tp_matvec`); the readout energy reduction
is the only other collective.  This generalizes to **all four** dynamics
families because the engine reuses each family's ``make_step`` /
``make_adam_step`` with the pluggable matvec — no dynamics are re-derived
here.  (The reference is strictly single-device; this subsystem has no
counterpart there — SURVEY.md §2.7.)

Per-shard RNG: the solve key is folded with both mesh coordinates, so every
device integrates decorrelated trajectories; results match a single-device
run statistically (never bitwise), exactly like growing the batch.
"""

from __future__ import annotations

import functools
import inspect

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ccvm_tpu.dynamics import common
from ccvm_tpu.dynamics import dl as dyn_dl
from ccvm_tpu.dynamics import langevin as dyn_langevin
from ccvm_tpu.dynamics import mf as dyn_mf
from ccvm_tpu.dynamics import pumped_langevin as dyn_pumped
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


def _check_divisibility(mesh, batch_size, n):
    dp = mesh.shape["batch"]
    tp = mesh.shape["model"]
    if batch_size % dp != 0:
        raise ValueError(
            f"batch_size {batch_size} must divide over the batch axis ({dp})"
        )
    if n % tp != 0:
        raise ValueError(
            f"problem size {n} must divide over the model axis ({tp})"
        )
    return batch_size // dp, n // tp


def _make_engine(mesh, *, iterations, batch_size, n, build_step, build_init,
                 readout):
    """Build the jitted shard-mapped solve shared by every family.

    ``build_step(q_rows, v_local, matvec) -> step``: family step closure.
    ``build_init(b_local, n_local) -> state``: local scan carry.
    ``readout(state, ...) -> pytree``: applied to the (still sharded) final
    state outside the shard_map region.
    """
    b_local, n_local = _check_divisibility(mesh, batch_size, n)

    def body(key, q_rows, v_local, params):
        key = jax.random.fold_in(key, lax.axis_index("batch"))
        key = jax.random.fold_in(key, lax.axis_index("model"))
        step = build_step(q_rows, v_local, common.tp_matvec("model"))
        state = build_init(b_local, n_local)
        return common.scan_steps(step, state, key, iterations)

    state_proto = jax.eval_shape(lambda: build_init(b_local, n_local))
    out_specs = jax.tree_util.tree_map(
        lambda _: P("batch", "model"), state_proto
    )
    sharded = _shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("model", None), P("model"), P()),
        out_specs=out_specs,
    )

    def solve(key, q, v, params):
        return readout(sharded(key, q, v, params))

    return jax.jit(solve)


def _zeros(b, nl):
    return jnp.zeros((b, nl), jnp.float32)


def _require_scalar_s(params):
    import numpy as np

    if np.ndim(params.S) != 0:
        raise ValueError(
            "tensor-parallel solves require a scalar S (a per-variable S "
            "would need feature sharding of the clamp bounds; use the DP/lax "
            "path instead)"
        )


def _replicate_inputs(mesh, key, q, v, params):
    """Replicate solve inputs over the mesh: arrays committed to a single
    device (e.g. a ProblemInstance loaded before the mesh existed) would
    otherwise conflict with the mesh-spanning shard_map computation."""
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    return jax.device_put((key, q, v, params), rep)


# --------------------------------------------------------------------------
# Family entry points — signatures and return values mirror each
# ``ccvm_tpu.dynamics.<family>.solve`` so the façades can swap them in.
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _langevin_engine(mesh, n, iterations, batch_size, hp):
    def engine(key, q, v, params):
        def body_step(q_rows, v_local, mv):
            if hp is None:
                return dyn_langevin.make_step(q_rows, v_local, params, mv)
            return dyn_langevin.make_adam_step(q_rows, v_local, params, hp, mv)

        init = (
            (lambda b, nl: _zeros(b, nl)) if hp is None
            else (lambda b, nl: (_zeros(b, nl), _zeros(b, nl), _zeros(b, nl)))
        )
        read = (lambda st: st) if hp is None else (lambda st: st[0])
        return _make_engine(
            mesh, iterations=iterations, batch_size=batch_size, n=n,
            build_step=body_step, build_init=init, readout=read,
        )(key, q, v, params)

    return jax.jit(engine)


def langevin_solve(mesh, key, q, v, params, *, iterations, batch_size, hp=None):
    """Mesh-sharded Langevin solve; same contract as dynamics.langevin.solve."""
    _require_scalar_s(params)
    key, q, v, params = _replicate_inputs(mesh, key, q, v, params)
    return _langevin_engine(mesh, q.shape[0], iterations, batch_size, hp)(
        key, q, v, params
    )


@functools.lru_cache(maxsize=64)
def _pumped_engine(mesh, n, iterations, batch_size, pump_rate_flag, hp):
    def engine(key, q, v, params):
        def body_step(q_rows, v_local, mv):
            if hp is None:
                return dyn_pumped.make_step(
                    q_rows, v_local, params, pump_rate_flag, mv
                )
            return dyn_pumped.make_adam_step(
                q_rows, v_local, params, pump_rate_flag, hp, mv
            )

        init = (
            (lambda b, nl: _zeros(b, nl)) if hp is None
            else (lambda b, nl: (_zeros(b, nl), _zeros(b, nl), _zeros(b, nl)))
        )
        read = (lambda st: st) if hp is None else (lambda st: st[0])
        return _make_engine(
            mesh, iterations=iterations, batch_size=batch_size, n=n,
            build_step=body_step, build_init=init, readout=read,
        )(key, q, v, params)

    return jax.jit(engine)


def pumped_langevin_solve(mesh, key, q, v, params, *, iterations, batch_size,
                          pump_rate_flag=True, hp=None):
    """Mesh-sharded pumped-Langevin solve (contract of dynamics.pumped.solve)."""
    _require_scalar_s(params)
    key, q, v, params = _replicate_inputs(mesh, key, q, v, params)
    return _pumped_engine(
        mesh, q.shape[0], iterations, batch_size, pump_rate_flag, hp
    )(key, q, v, params)


@functools.lru_cache(maxsize=64)
def _dl_engine(mesh, n, iterations, batch_size, pump_rate_flag,
               pump_is_gt_one, hp):
    def engine(key, q, v, params):
        def body_step(q_rows, v_local, mv):
            if hp is None:
                return dyn_dl.make_step(
                    q_rows, v_local, params, pump_rate_flag, pump_is_gt_one, mv
                )
            return dyn_dl.make_adam_step(
                q_rows, v_local, params, pump_rate_flag, pump_is_gt_one, hp, mv
            )

        if hp is None:
            init = lambda b, nl: (_zeros(b, nl), _zeros(b, nl))  # noqa: E731
        else:
            init = lambda b, nl: tuple(_zeros(b, nl) for _ in range(6))  # noqa: E731

        def read(state):
            c, s = state[0], state[1]
            return jnp.clip(c, -params.S, params.S), s

        return _make_engine(
            mesh, iterations=iterations, batch_size=batch_size, n=n,
            build_step=body_step, build_init=init, readout=read,
        )(key, q, v, params)

    return jax.jit(engine)


def dl_solve(mesh, key, q, v, params, *, iterations, batch_size,
             pump_rate_flag=True, pump_is_gt_one=False, hp=None):
    """Mesh-sharded DL-CCVM solve -> (c, s), c clamped (dynamics.dl.solve)."""
    _require_scalar_s(params)
    key, q, v, params = _replicate_inputs(mesh, key, q, v, params)
    return _dl_engine(
        mesh, q.shape[0], iterations, batch_size, pump_rate_flag,
        pump_is_gt_one, hp,
    )(key, q, v, params)


@functools.lru_cache(maxsize=64)
def _mf_engine(mesh, n, iterations, batch_size, pump_rate_flag, hp):
    def engine(key, q, v, params):
        def body_step(q_rows, v_local, mv):
            if hp is None:
                return dyn_mf.make_step(
                    q_rows, v_local, params, pump_rate_flag, mv
                )
            return dyn_mf.make_adam_step(
                q_rows, v_local, params, pump_rate_flag, hp, mv
            )

        def init(b, nl):
            mu0 = _zeros(b, nl)
            sigma0 = jnp.full_like(mu0, 0.5)
            if hp is None:
                return (mu0, sigma0, _zeros(b, nl))
            return (mu0, sigma0, _zeros(b, nl), _zeros(b, nl), _zeros(b, nl))

        def read(state):
            mu, sigma, mu_tilde = state[0], state[1], state[2]
            return mu, jnp.clip(mu_tilde, -params.S, params.S), sigma

        return _make_engine(
            mesh, iterations=iterations, batch_size=batch_size, n=n,
            build_step=body_step, build_init=init, readout=read,
        )(key, q, v, params)

    return jax.jit(engine)


def mf_solve(mesh, key, q, v, params, *, iterations, batch_size,
             pump_rate_flag=True, hp=None):
    """Mesh-sharded MF-CCVM solve -> (mu, mu_tilde_clamped, sigma)."""
    _require_scalar_s(params)
    key, q, v, params = _replicate_inputs(mesh, key, q, v, params)
    return _mf_engine(
        mesh, q.shape[0], iterations, batch_size, pump_rate_flag, hp
    )(key, q, v, params)


# --------------------------------------------------------------------------
# DL convenience wrapper kept for the driver entry point / sharding tests:
# returns (c, s, objective values, best objective) like round 1's API.
# --------------------------------------------------------------------------


def dl_sharded_solve(mesh, key, q, v, params: DLParams, batch_size: int,
                     *, iterations: int, pump_rate_flag: bool = True):
    """Sharded DL solve + readout energy: (c, s, objval, best)."""
    pump_gt_one = bool(float(params.pump) > 1)

    @jax.jit
    def readout(c, s, q, v, params):
        span = params.upper_limit - params.lower_limit
        mid = params.upper_limit + params.lower_limit
        x = 0.5 * c / params.S * span + 0.5 * mid
        qx = jnp.einsum("bi,ij->bj", x, q, preferred_element_type=x.dtype)
        objval = 0.5 * jnp.sum(x * qx, axis=-1) + x @ v
        return objval, -jnp.min(objval)

    c, s = dl_solve(
        mesh, key, q, v, params, iterations=iterations,
        batch_size=batch_size, pump_rate_flag=pump_rate_flag,
        pump_is_gt_one=pump_gt_one,
    )
    objval, best = readout(c, s, q, v, params)
    return c, s, objval, best
