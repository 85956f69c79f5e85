"""Instance-sweep parallelism: solve MANY same-size instances in ONE jit.

The reference iterates instance files in a serial Python loop, one solve per
file (``examples/ccvm_boxqp_dl.py:28``).  TPU-natively the stacked instances
become a leading vmap axis: Q -> (I, N, N), V -> (I, N), keys -> (I,), and the
whole sweep is a single vmapped ``lax.scan`` — the batched matvec turns into
one big (I, B, N) x (I, N, N) contraction on the MXU, and with a mesh the
instance axis shards across chips (embarrassingly parallel, zero hot-path
collectives; SURVEY.md section 2.7 "instance-sweep parallel").

Per-solver readout asymmetries (SURVEY.md section 2.1 quirks) are preserved by
dispatching on the solver class, exactly mirroring each facade's ``__call__``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ccvm_tpu.solution import Solution


def _readback(x):
    """ONE device->host transfer of a sweep result.

    When the mesh spans multiple processes the array's shards are not all
    host-addressable and ``np.asarray`` raises, so gather across hosts first
    (every host then builds identical Solutions; the coordinator writes)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def _stack_instances(solver, instances):
    """Validate and stack instances into (I, N, N) / (I, N) arrays."""
    if not instances:
        raise ValueError("No instances given to sweep_solve.")
    size = instances[0].problem_size
    for inst in instances:
        if inst.problem_size != size:
            raise ValueError(
                "All instances in a sweep must share one problem size; got "
                f"{inst.problem_size} and {size}."
            )
        if inst.device != solver.device:
            raise ValueError(
                f"The device type of the instance ({inst.device}) and the"
                f" solver ({solver.device}) must match."
            )
    qs = jnp.stack([jnp.asarray(i.q_matrix, jnp.float32) for i in instances])
    vs = jnp.stack([jnp.asarray(i.v_vector, jnp.float32) for i in instances])
    return qs, vs, size


def _get_params(solver, size):
    try:
        return dict(solver.parameter_key[size])
    except (TypeError, KeyError) as e:
        raise KeyError(
            f"The parameter key for problem size {size} is not defined."
        ) from e


def _shard_instance_axis(mesh, num_instances, *arrays):
    """Shard the leading (instance) axis over the mesh's "batch" axis when it
    divides evenly; replicate otherwise."""
    if mesh is None:
        return arrays
    from jax.sharding import NamedSharding, PartitionSpec

    n_shards = mesh.shape["batch"]
    if num_instances % n_shards == 0:
        out = []
        for a in arrays:
            s = NamedSharding(mesh, PartitionSpec("batch", *([None] * (a.ndim - 1))))
            out.append(jax.device_put(a, s))
        return tuple(out)
    replicated = NamedSharding(mesh, PartitionSpec())
    return tuple(jax.device_put(a, replicated) for a in arrays)


@jax.jit
def _stacked_energies(confs, qs, vs, scales):
    """(2, I, B): per-instance f32 energies and their abs-value bound
    inputs, all in one device dispatch."""
    from ccvm_tpu.problem_classes.boxqp.problem_instance import _energy_kernel

    def one(c, q, v, s):
        e = _energy_kernel(c, q, v, s)
        a = _energy_kernel(jnp.abs(c), jnp.abs(q), jnp.abs(v), jnp.abs(s))
        return jnp.stack([e, a])

    return jax.vmap(one, in_axes=(0, 0, 0, 0), out_axes=1)(
        confs, qs, vs, scales
    )


def _sweep_readout64(instances, confs, qs, vs):
    """Batched mixed-precision readout for a stacked sweep (see the call
    site in :func:`sweep_solve`).  Returns float64 energies of shape
    (I, batch) with every Solution statistic identical to the full-f64
    path (rigorous per-row bounds; ProblemInstance.compute_energy_readout64
    documents the contract)."""
    from ccvm_tpu.problem_classes.boxqp.problem_instance import (
        ambiguous_readout_rows,
    )

    num_instances, batch, n = confs.shape
    scales = jnp.asarray(
        [float(inst.scaled_by) for inst in instances], jnp.float32
    )
    both = np.asarray(
        _stacked_energies(confs, qs, vs, scales), np.float64
    )
    e_all, abs_all = both[0], both[1]

    flat_idx, per_inst_idx = [], []
    for i, inst in enumerate(instances):
        if inst.optimal_sol is None:
            idx = np.arange(batch)
        else:
            idx = np.flatnonzero(
                ambiguous_readout_rows(
                    e_all[i], inst.optimal_sol, n, abs_e=abs_all[i]
                )
            )
        per_inst_idx.append(idx)
        flat_idx.append(idx + i * batch)
    cat = np.concatenate(flat_idx)
    if cat.size:
        rows = np.asarray(
            jnp.take(
                confs.reshape(num_instances * batch, n),
                jnp.asarray(cat), axis=0,
            )
        )
        off = 0
        for i, inst in enumerate(instances):
            k = per_inst_idx[i].size
            if k:
                e_all[i, per_inst_idx[i]] = inst.compute_energy_host64(
                    rows[off : off + k]
                )
                # Clamp kept-f32 rows to the recomputed best (see
                # compute_energy_readout64): best_objective_value is then
                # always a float64 evaluation, and the shift is below every
                # kept row's gap margin.
                e_all[i] = np.maximum(
                    e_all[i], e_all[i, per_inst_idx[i]].min()
                )
            off += k
    return e_all


def sweep_solve(
    solver,
    instances,
    post_processor=None,
    algorithm_parameters=None,
    seed=0,
    scale=False,
    mesh=None,
    g=None,
    pump_rate_flag=True,
):
    """Solve every instance in one vmapped, optionally mesh-sharded jit.

    Args:
        solver: a CCVM solver facade with ``parameter_key`` set for the
            instances' problem size.  Its ``batch_size`` is used per instance.
        instances: list of same-size :class:`ProblemInstance` objects.
        post_processor: only "grad-descent" (the default/primary
            post-processor, used by 3 of 5 reference examples) is supported
            inside the sweep; None disables.
        algorithm_parameters: optional :class:`AdamParameters` — runs the
            Adam-in-the-loop dynamics variant for the whole sweep.
        seed: instance ``i`` uses ``jax.random.PRNGKey(seed + i)`` — identical
            to solving serially with ``solver(inst, seed=seed + i)`` on the
            same backend.  The lax path feeds the keys straight into the
            vmapped dynamics; the fused-kernel path derives instance ``i``'s
            hardware-PRNG seed from the same ``PRNGKey(seed + i)`` and folds
            in only the batch-tile id, so its in-kernel streams are
            bit-identical to a serial fused-kernel solve of that instance.
        scale: when True, applies ``instance.scale_coefs(get_scaling_factor)``
            to every instance first (skip if the caller already scaled).
        mesh: optional Mesh; the instance axis shards over its "batch" axis.
        g: solver-specific ``g`` used by DL (default 0.05) / MF (default 0.01)
            facades; ignored for the Langevin family.

    Returns:
        list[Solution]: one per instance, same order.
    """
    from ccvm_tpu.post_processor.grad_descent import _gd_refine

    cls = solver.__class__.__name__
    if post_processor not in (None, "grad-descent", "adam", "asgd",
                              "bfgs", "lbfgs"):
        raise ValueError(
            f"sweep_solve does not know post-processor {post_processor!r};"
            " expected one of grad-descent/adam/asgd/bfgs/lbfgs/None."
        )

    if scale:
        for inst in instances:
            inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))

    qs, vs, size = _stack_instances(solver, instances)
    num_instances = len(instances)
    batch_size = solver.batch_size
    solver.solution_bounds = instances[0].solution_bounds
    lo, hi = solver.solution_bounds
    pk = _get_params(solver, size)
    iterations = pk["iterations"]

    hp = (
        algorithm_parameters.to_hyperparameters()
        if algorithm_parameters is not None
        else None
    )

    keys = jnp.stack(
        [jax.random.PRNGKey(int(seed) + i) for i in range(num_instances)]
    )
    qs, vs, keys = _shard_instance_axis(mesh, num_instances, qs, vs, keys)

    # Fused stacked Pallas kernel when eligible (single real chip, original
    # dynamics, scalar S): one kernel launch integrates EVERY instance's full
    # trajectory batch — grid (instances, batch_tiles), Q per instance in VMEM.
    use_pallas = (
        hp is None
        and mesh is None
        and solver.backend in ("auto", "pallas")
        and (solver.backend == "pallas" or jax.default_backend() == "tpu")
    )

    t0 = time.time()

    if cls == "LangevinSolver":
        from ccvm_tpu.dynamics import langevin as dyn

        params = solver._make_params(
            pk["S"], pk["dt"], pk["sigma"], pk["feedback_scale"]
        )
        raw = None
        if use_pallas:
            from ccvm_tpu.ops import pallas_kernels as kernels

            raw = kernels.langevin_solve(
                keys, qs, vs, params,
                iterations=iterations, batch_size=batch_size,
                rng=getattr(solver, "kernel_rng", "popcount32"),
            )
        if raw is None:
            raw = jax.vmap(
                lambda k, q, v: dyn.solve(
                    k, q, v, params, iterations=iterations,
                    batch_size=batch_size, hp=hp,
                )
            )(keys, qs, vs)
        from ccvm_tpu.dynamics import common as _common

        pp_input = _common.langevin_change_variables(raw, params.S)
        needs_final_cv = False
        extra_vars = {}
    elif cls == "PumpedLangevinSolver":
        from ccvm_tpu.dynamics import pumped_langevin as dyn

        params = solver._make_params(
            pk["pump"], pk["S"], pk["dt"], pk["sigma"], pk["feedback_scale"],
            iterations,
        )
        raw = None
        if use_pallas:
            from ccvm_tpu.ops import pallas_kernels as kernels

            raw = kernels.pumped_langevin_solve(
                keys, qs, vs, params,
                iterations=iterations, batch_size=batch_size,
                pump_rate_flag=pump_rate_flag,
                rng=getattr(solver, "kernel_rng", "popcount32"),
            )
        if raw is None:
            raw = jax.vmap(
                lambda k, q, v: dyn.solve(
                    k, q, v, params, iterations=iterations,
                    batch_size=batch_size, pump_rate_flag=pump_rate_flag,
                    hp=hp,
                )
            )(keys, qs, vs)
        from ccvm_tpu.dynamics import common as _common

        pp_input = _common.langevin_change_variables(raw, params.S)
        needs_final_cv = False
        extra_vars = {}
    elif cls == "DLSolver":
        from ccvm_tpu.dynamics import dl as dyn
        from ccvm_tpu.dynamics import common

        params = solver._make_params(
            pk["pump"], solver.S, pk["dt"], pk["noise_ratio"],
            pk["feedback_scale"], 0.05 if g is None else g, iterations,
        )
        out = None
        if use_pallas:
            from ccvm_tpu.ops import pallas_kernels as kernels

            out = kernels.dl_solve(
                keys, qs, vs, params,
                iterations=iterations, batch_size=batch_size,
                pump_rate_flag=pump_rate_flag,
                rng=getattr(solver, "kernel_rng", "popcount32"),
                pump_is_gt_one=bool(pk["pump"] > 1),
            )
        if out is None:
            out = jax.vmap(
                lambda k, q, v: dyn.solve(
                    k, q, v, params, iterations=iterations,
                    batch_size=batch_size, pump_rate_flag=pump_rate_flag,
                    pump_is_gt_one=bool(pk["pump"] > 1), hp=hp,
                )
            )(keys, qs, vs)
        c, s = out
        raw = c
        pp_input = common.change_variables_boxqp(c, lo, hi, params.S)
        # The reference applies change_variables again after post-processing
        # (dl_solver.py:941-958) — preserved, as in the DL facade.
        needs_final_cv = True
        extra_vars = {"s": s}
    elif cls == "MFSolver":
        from ccvm_tpu.dynamics import mf as dyn
        from ccvm_tpu.dynamics import common

        params = solver._make_params(
            pk["pump"], pk["S"], pk["dt"], pk["j"], pk["feedback_scale"],
            0.01 if g is None else g, iterations,
        )
        out = None
        if use_pallas:
            from ccvm_tpu.ops import pallas_kernels as kernels

            out = kernels.mf_solve(
                keys, qs, vs, params,
                iterations=iterations, batch_size=batch_size,
                pump_rate_flag=pump_rate_flag,
                rng=getattr(solver, "kernel_rng", "popcount32"),
            )
        if out is None:
            out = jax.vmap(
                lambda k, q, v: dyn.solve(
                    k, q, v, params, iterations=iterations,
                    batch_size=batch_size, pump_rate_flag=pump_rate_flag,
                    hp=hp,
                )
            )(keys, qs, vs)
        mu, mu_tilde, sigma_out = out
        raw = mu_tilde
        pp_input = common.change_variables_boxqp(mu_tilde, lo, hi, params.S)
        needs_final_cv = False
        extra_vars = {"mu": mu, "sigma": sigma_out}
    else:
        raise ValueError(f"sweep_solve does not support solver class {cls}.")

    pp_input = jax.block_until_ready(pp_input)
    solve_wall = time.time() - t0

    # Post-processing: the per-instance refinement cores of the serial
    # post-processors, vmapped over the instance axis with each method's
    # facade defaults (grad-descent: 10 steps at 0.1; adam/asgd: 1 scanned
    # step; bfgs: 50 projected L-BFGS iterations with the reference's
    # 0.5(c+1) / 2(x-0.5) in/out convention; lbfgs: 1 iteration).
    pp_wall = 0.0
    if post_processor is not None:
        if post_processor == "grad-descent":
            def refine(c, q, v):
                return _gd_refine(
                    c, q, v, jnp.float32(lo), jnp.float32(hi),
                    jnp.float32(0.1), 10,
                )
        elif post_processor == "adam":
            from ccvm_tpu.post_processor.adam import _adam_refine

            def refine(c, q, v):
                return _adam_refine(
                    c, q, v, jnp.float32(lo), jnp.float32(hi), 1
                )
        elif post_processor == "asgd":
            from ccvm_tpu.post_processor.asgd import _asgd_refine

            def refine(c, q, v):
                return _asgd_refine(
                    c, q, v, jnp.float32(lo), jnp.float32(hi), 1
                )
        elif post_processor == "bfgs":
            from ccvm_tpu.ops.lbfgs import lbfgs_box_batch

            def refine(c, q, v):
                x = lbfgs_box_batch(
                    0.5 * (c + 1.0), q, v, lower=0.0, upper=1.0, max_iter=50
                )
                return 2.0 * (x - 0.5)
        else:  # lbfgs
            from ccvm_tpu.ops.lbfgs import lbfgs_box_batch

            def refine(c, q, v):
                return lbfgs_box_batch(
                    c, q, v, lower=jnp.float32(lo), upper=jnp.float32(hi),
                    first_step_scale=0.001, max_iter=1,
                )

        t1 = time.time()
        problem_variables = jax.vmap(refine)(pp_input, qs, vs)
        problem_variables = jax.block_until_ready(problem_variables)
        pp_wall = time.time() - t1
    elif needs_final_cv:
        # DL without post-processing: problem_variables are the raw amplitudes
        # (dl_solver.py:936-958).
        problem_variables = raw
    else:
        problem_variables = pp_input

    if needs_final_cv:
        from ccvm_tpu.dynamics import common

        confs = common.change_variables_boxqp(problem_variables, lo, hi, params.S)
    else:
        confs = problem_variables

    # Mixed-precision readout, batched over the WHOLE sweep: f32 (and
    # abs-bound) energies for every instance come from ONE vmapped device
    # call, a single (2, I, batch) transfer replaces the (I, batch, n) bulk
    # readback, and float64 re-evaluates only the rows the per-row rounding
    # bound cannot classify (ambiguous_readout_rows), gathered across all
    # instances in one more transfer.  Multi-process meshes fall back to
    # the gathered full-precision path (shards not host-addressable).
    if jax.process_count() > 1:
        confs_np = _readback(confs)
        objvals = np.stack(
            [
                inst.compute_energy_host64(confs_np[i])
                for i, inst in enumerate(instances)
            ]
        )
    else:
        objvals = _sweep_readout64(instances, confs, qs, vs)

    # Per-instance Solutions; wall time attributed evenly across the sweep
    # then batch-normalized (reference solve-time semantics, dl_solver.py:933).
    solve_time = solve_wall / (num_instances * batch_size)
    pp_time = pp_wall / (num_instances * batch_size)
    solutions = []
    for i, inst in enumerate(instances):
        objval = objvals[i]
        variables = {"problem_variables": problem_variables[i]}
        for k, v in extra_vars.items():
            variables[k] = v[i]
        solutions.append(
            Solution(
                problem_size=size,
                batch_size=batch_size,
                instance_name=inst.name,
                iterations=iterations,
                objective_values=objval,
                solve_time=solve_time,
                pp_time=pp_time,
                optimal_value=inst.optimal_sol,
                best_value=inst.best_sol,
                num_frac_values=inst.num_frac_values,
                solution_vector=inst.solution_vector,
                variables=variables,
                device=solver.device,
            )
        )
    return solutions
