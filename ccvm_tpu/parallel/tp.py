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
# One spec per family: how to build its step closure, its scan carry, and
# its readout; the engine machinery is shared.
# --------------------------------------------------------------------------


def _moment_zeros(base, hp, extra):
    """Append ``extra`` zero moment arrays per state array when hp is set."""
    if hp is None:
        return base
    proto = base[0] if isinstance(base, tuple) else base
    pads = tuple(jnp.zeros_like(proto) for _ in range(extra))
    return (base if isinstance(base, tuple) else (base,)) + pads


_FAMILIES = {
    "langevin": dict(
        step=lambda q, v, p, flags, hp, mv: (
            dyn_langevin.make_step(q, v, p, mv) if hp is None
            else dyn_langevin.make_adam_step(q, v, p, hp, mv)
        ),
        init=lambda b, nl, hp: _moment_zeros(_zeros(b, nl), hp, 2),
        read=lambda st, p, hp: st if hp is None else st[0],
    ),
    "pumped": dict(
        step=lambda q, v, p, flags, hp, mv: (
            dyn_pumped.make_step(q, v, p, flags["pump_rate_flag"], mv)
            if hp is None
            else dyn_pumped.make_adam_step(
                q, v, p, flags["pump_rate_flag"], hp, mv
            )
        ),
        init=lambda b, nl, hp: _moment_zeros(_zeros(b, nl), hp, 2),
        read=lambda st, p, hp: st if hp is None else st[0],
    ),
    "dl": dict(
        step=lambda q, v, p, flags, hp, mv: (
            dyn_dl.make_step(
                q, v, p, flags["pump_rate_flag"], flags["pump_is_gt_one"], mv
            )
            if hp is None
            else dyn_dl.make_adam_step(
                q, v, p, flags["pump_rate_flag"], flags["pump_is_gt_one"],
                hp, mv,
            )
        ),
        init=lambda b, nl, hp: _moment_zeros(
            (_zeros(b, nl), _zeros(b, nl)), hp, 4
        ),
        read=lambda st, p, hp: (jnp.clip(st[0], -p.S, p.S), st[1]),
    ),
    "mf": dict(
        step=lambda q, v, p, flags, hp, mv: (
            dyn_mf.make_step(q, v, p, flags["pump_rate_flag"], mv)
            if hp is None
            else dyn_mf.make_adam_step(
                q, v, p, flags["pump_rate_flag"], hp, mv
            )
        ),
        init=lambda b, nl, hp: _moment_zeros(
            (_zeros(b, nl), jnp.full((b, nl), 0.5, jnp.float32),
             _zeros(b, nl)),
            hp, 2,
        ),
        read=lambda st, p, hp: (
            st[0], jnp.clip(st[2], -p.S, p.S), st[1]
        ),
    ),
}


@functools.lru_cache(maxsize=64)
def _family_engine(family, mesh, n, iterations, batch_size, hp, flags):
    spec = _FAMILIES[family]
    flags = dict(flags)

    def engine(key, q, v, params):
        return _make_engine(
            mesh, iterations=iterations, batch_size=batch_size, n=n,
            build_step=lambda qr, vl, mv: spec["step"](
                qr, vl, params, flags, hp, mv
            ),
            build_init=lambda b, nl: spec["init"](b, nl, hp),
            readout=lambda st: spec["read"](st, params, hp),
        )(key, q, v, params)

    return jax.jit(engine)


def _run_family(family, mesh, key, q, v, params, iterations, batch_size, hp,
                **flags):
    _require_scalar_s(params)
    key, q, v, params = _replicate_inputs(mesh, key, q, v, params)
    return _family_engine(
        family, mesh, q.shape[0], iterations, batch_size, hp,
        tuple(sorted(flags.items())),
    )(key, q, v, params)


def langevin_solve(mesh, key, q, v, params, *, iterations, batch_size, hp=None):
    """Mesh-sharded Langevin solve; same contract as dynamics.langevin.solve."""
    return _run_family(
        "langevin", mesh, key, q, v, params, iterations, batch_size, hp
    )


def pumped_langevin_solve(mesh, key, q, v, params, *, iterations, batch_size,
                          pump_rate_flag=True, hp=None):
    """Mesh-sharded pumped-Langevin solve (contract of dynamics.pumped.solve)."""
    return _run_family(
        "pumped", mesh, key, q, v, params, iterations, batch_size, hp,
        pump_rate_flag=pump_rate_flag,
    )


def dl_solve(mesh, key, q, v, params, *, iterations, batch_size,
             pump_rate_flag=True, pump_is_gt_one=False, hp=None):
    """Mesh-sharded DL-CCVM solve -> (c, s), c clamped (dynamics.dl.solve)."""
    return _run_family(
        "dl", mesh, key, q, v, params, iterations, batch_size, hp,
        pump_rate_flag=pump_rate_flag, pump_is_gt_one=pump_is_gt_one,
    )


def mf_solve(mesh, key, q, v, params, *, iterations, batch_size,
             pump_rate_flag=True, hp=None):
    """Mesh-sharded MF-CCVM solve -> (mu, mu_tilde_clamped, sigma)."""
    return _run_family(
        "mf", mesh, key, q, v, params, iterations, batch_size, hp,
        pump_rate_flag=pump_rate_flag,
    )


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
