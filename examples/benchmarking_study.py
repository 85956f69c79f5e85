"""Benchmarking sweep: all solvers x sizes x instances -> metadata + TTS.

The reference's ``examples/benchmarking_study.py`` is an unimplemented stub
(commented pseudocode with an invalid module-level ``return``, ``:8-20``);
this is the real thing.  For every selected solver and problem size it solves
every instance in the set, accumulates Solution metadata (identical JSON
schema to the reference so ccvmplotlib consumes it directly), writes one
metadata file per solver, and prints a success-probability / wall-clock
summary.  On TPU each solve runs the fused Pallas kernel; with ``--mesh N``
the trajectory batch is sharded over an N-device mesh instead.

Usage:
    python examples/benchmarking_study.py --instances-dir ./benchmarking_instances \
        [--solvers dl,mf,langevin,pumped] [--sizes 20,30] [--batch-size 1000] \
        [--iterations 15000] [--post-processor grad-descent] [--output-dir ./metadata] \
        [--plots] [--mesh N]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccvm_tpu.metadata import Metadata  # noqa: E402
from ccvm_tpu.problem_classes.boxqp import ProblemInstance  # noqa: E402
from ccvm_tpu.runtime import default_device  # noqa: E402
from ccvm_tpu.solvers import (  # noqa: E402
    DLSolver,
    LangevinSolver,
    MFSolver,
    PumpedLangevinSolver,
)

# Paper-default parameters (docs/source/ccvm_equations_of_motion.rst table and
# the reference examples); one entry per solver, applied to every size.
DEFAULTS = {
    "dl": {
        "pump": 8.0, "feedback_scale": 100, "dt": 0.001, "noise_ratio": 10,
    },
    "mf": {
        "pump": 0.0, "feedback_scale": 4000, "j": 5.0, "S": 20.0, "dt": 0.0025,
    },
    "langevin": {
        "dt": 0.002, "S": 0.5, "sigma": 0.5, "feedback_scale": 1.0,
    },
    "pumped": {
        "pump": 2.0, "dt": 0.002, "S": 0.5, "sigma": 0.5, "feedback_scale": 1.0,
    },
}

SOLVER_CLASSES = {
    "dl": DLSolver,
    "mf": MFSolver,
    "langevin": LangevinSolver,
    "pumped": PumpedLangevinSolver,
}

MACHINES = {"dl": "dl-ccvm", "mf": "mf-ccvm", "langevin": "fpga", "pumped": "cpu"}
# Energy models for the ETS plots (same per-solver machines; pumped has no
# solver-specific hardware model in the reference, so it reports CPU energy).
ENERGY_MACHINES = dict(MACHINES)


def build_solver(name, device, batch_size, sizes, iterations, mesh=None,
                 tuned=None):
    solver = SOLVER_CLASSES[name](device=device, batch_size=batch_size, mesh=mesh)
    key = {}
    for size in sizes:
        params = dict(DEFAULTS[name])
        params["iterations"] = iterations
        if tuned:
            params.update(tuned.get(name, {}).get(str(size), {}))
        key[size] = params
    solver.parameter_key = key
    return solver


def run_sweep(args):
    from ccvm_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    device = default_device()
    mesh = None
    if args.mesh:
        from ccvm_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh)

    # Multi-host: each process takes its contiguous shard of the instance
    # files (ccvm_tpu.parallel.multihost); host 0 writes metadata/plots.
    from ccvm_tpu.parallel import multihost

    sizes = [int(s) for s in args.sizes.split(",") if s]
    solver_names = [s.strip() for s in args.solvers.split(",") if s.strip()]
    os.makedirs(args.output_dir, exist_ok=True)

    tuned = None
    if args.params:
        import json

        with open(args.params) as f:
            tuned = json.load(f)
        print(f"using tuned parameters from {args.params}")

    optima_override = {}
    if getattr(args, "optima_override", ""):
        import json

        with open(args.optima_override) as f:
            optima_override = json.load(f)
        print(f"scoring against {len(optima_override)} corrected optima "
              f"from {args.optima_override}")

    def _apply_override(instance, size):
        # Corrected-optima scoring: headers proven to understate the true
        # optimum (see QUALITY.md header audit) are overridden so the
        # 0.1%-gap statistic is not inflated.
        val = optima_override.get(f"Size{size}/{instance.name}")
        if val is not None:
            # Corrections exist because headers UNDERSTATE the optimum; an
            # override below the header means the file almost certainly
            # belongs to a different instance set that happens to share the
            # filename (e.g. reference corrections applied to the bundled
            # set) — scoring against it would silently corrupt P(0.1%).
            if float(val) < instance.optimal_sol - 1e-6 * abs(
                    instance.optimal_sol):
                raise ValueError(
                    f"optima override for Size{size}/{instance.name} "
                    f"({float(val):.6f}) is BELOW the file's own optimum "
                    f"({instance.optimal_sol:.6f}); the override file does "
                    "not match this instance set."
                )
            instance.optimal_sol = float(val)
        return instance

    summary = []
    for name in solver_names:
        # DL ships without post-processing (like the reference's own DL
        # example): the reference's DL readout applies change_variables to
        # post-processed output a second time (dl_solver.py:941-958), which
        # we replicate for behavioural parity — so post-processing corrupts
        # DL solutions by design.  Langevin/MF examples use grad-descent.
        pp = args.post_processor or None
        if name == "dl" and args.post_processor == "grad-descent":
            pp = None
            print(
                "[dl] post-processor disabled (the reference DL readout "
                "applies change_variables to post-processed output a second "
                "time, dl_solver.py:941-958; pass --post-processor adam to "
                "force one anyway)"
            )
        solver = build_solver(
            name, device, args.batch_size, sizes, args.iterations, mesh,
            tuned=tuned,
        )
        metadata = Metadata(device=device)
        for size in sizes:
            pattern = os.path.join(args.instances_dir, f"Size{size}", "*.in")
            files = sorted(glob.glob(pattern))
            if not files:
                print(f"[{name}] no instances for size {size} ({pattern})")
                continue
            lo_f, hi_f = multihost.local_shard_bounds(len(files))
            files = files[lo_f:hi_f]
            if not files:
                continue
            n_opt = 0
            t0 = time.perf_counter()
            if args.sweep:
                # One vmapped jit over ALL instances of this size
                # (ccvm_tpu.parallel.sweep) instead of a serial per-file loop.
                from ccvm_tpu.parallel import sweep_solve

                instances = [
                    _apply_override(
                        ProblemInstance(
                            instance_type="tuning", file_path=f, device=device
                        ),
                        size,
                    )
                    for f in files
                ]
                solutions = sweep_solve(
                    solver,
                    instances,
                    post_processor=pp,
                    seed=args.seed,
                    scale=True,
                    mesh=mesh,
                )
                for solution in solutions:
                    metadata.add_to_result_metadata(solution.get_metadata_dict())
                    n_opt += solution.solution_performance["optimal"]
            else:
                # Failure-tolerant serial path: a transient per-solve failure
                # re-queues the instance instead of aborting the sweep.
                def solve_one(work):
                    idx, instance_file = work
                    instance = _apply_override(
                        ProblemInstance(
                            instance_type="tuning",
                            file_path=instance_file,
                            device=device,
                        ),
                        size,
                    )
                    instance.scale_coefs(
                        solver.get_scaling_factor(instance.q_matrix)
                    )
                    return solver(
                        instance,
                        post_processor=pp,
                        seed=args.seed + idx,
                    )

                results, failed = multihost.run_resilient(
                    list(enumerate(files)), solve_one
                )
                for idx in sorted(results):
                    solution = results[idx]
                    metadata.add_to_result_metadata(solution.get_metadata_dict())
                    n_opt += solution.solution_performance["optimal"]
                for idx, exc in sorted(failed.items()):
                    print(f"[{name}] FAILED after retries: {files[idx]}: {exc}")
            wall = time.perf_counter() - t0
            mean_opt = n_opt / len(files)
            summary.append((name, size, len(files), mean_opt, wall))
            print(
                f"[{name}] size {size}: {len(files)} instances, "
                f"mean P(optimal)={mean_opt:.3f}, wall {wall:.2f}s"
            )
        suffix = (
            "" if multihost.is_coordinator()
            else f"_host{__import__('jax').process_index()}"
        )
        metadata_path = metadata.save_metadata_to_file(
            file_dir=args.output_dir, file_name=f"{name}_benchmark{suffix}"
        )
        print(f"[{name}] metadata -> {metadata_path}")

        if args.plots:
            import matplotlib

            matplotlib.use("Agg")
            from ccvm_tpu.ccvmplotlib import ccvmplotlib

            # Plot failures (e.g. all-inf TTS when a solver never reaches a
            # gap level) must not abort the remaining solvers' sweeps.
            try:
                fig, ax = ccvmplotlib.plot_TTS(
                    metadata_filepath=metadata_path,
                    problem="BoxQP",
                    machine_time_func=solver.machine_time(machine=MACHINES[name]),
                )
                ccvmplotlib.apply_default_tts_styling(fig, ax)
                plot_path = os.path.join(args.output_dir, f"{name}_TTS.png")
                fig.savefig(plot_path)
                print(f"[{name}] TTS plot -> {plot_path}")
            except ValueError as e:
                print(f"[{name}] TTS plot skipped: {e}")
            try:
                fig, ax = ccvmplotlib.plot_success_prob(
                    metadata_filepath=metadata_path, problem="BoxQP"
                )
                ccvmplotlib.apply_default_succ_prob_styling(fig, ax)
                plot_path = os.path.join(args.output_dir, f"{name}_success_prob.png")
                fig.savefig(plot_path)
                print(f"[{name}] success-prob plot -> {plot_path}")
            except ValueError as e:
                print(f"[{name}] success-prob plot skipped: {e}")
            try:
                fig, ax = ccvmplotlib.plot_ETS(
                    metadata_filepath=metadata_path,
                    problem="BoxQP",
                    machine_energy_func=solver.machine_energy(
                        machine=ENERGY_MACHINES[name]
                    ),
                )
                ccvmplotlib.apply_default_ets_styling(fig, ax)
                plot_path = os.path.join(args.output_dir, f"{name}_ETS.png")
                fig.savefig(plot_path)
                print(f"[{name}] ETS plot -> {plot_path}")
            except ValueError as e:
                print(f"[{name}] ETS plot skipped: {e}")

    print("\n=== Sweep summary ===")
    print(f"{'solver':<10}{'size':>6}{'n':>5}{'P(optimal)':>12}{'wall_s':>9}")
    for name, size, n, p, wall in summary:
        print(f"{name:<10}{size:>6}{n:>5}{p:>12.3f}{wall:>9.2f}")
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--instances-dir",
        default=os.path.join(os.path.dirname(__file__), "benchmarking_instances"),
    )
    ap.add_argument("--solvers", default="dl,mf,langevin,pumped")
    ap.add_argument("--sizes", default="20,30,40,50,60,70")
    ap.add_argument("--batch-size", type=int, default=1000)
    ap.add_argument("--iterations", type=int, default=15000)
    ap.add_argument("--post-processor", default="grad-descent")
    ap.add_argument("--output-dir", default="./metadata")
    ap.add_argument("--plots", action="store_true")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the batch over an N-device mesh")
    ap.add_argument("--sweep", action="store_true",
                    help="vmap all instances of a size into one jit "
                         "(instance-sweep parallelism)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--optima-override", default="",
                    help="JSON {'SizeN/instance': value} of corrected optima "
                         "to score against (see QUALITY.md header audit)")
    ap.add_argument("--params", default="",
                    help="JSON file of tuned per-solver per-size parameters "
                         "(see tools/tune_benchmark_set.py)")
    run_sweep(ap.parse_args())
