"""Headline benchmark: DL-CCVM SDE throughput across problem sizes.

Headline workload is the BASELINE.json north star: N=70 BoxQP, 15,000
Euler-Maruyama iterations on one chip at the throughput-optimal trajectory
batch (65536), at demonstrated success probability (printed alongside).  A
per-size (20..70) table at the reference example's batch 1000 goes to
stderr as comment lines.

Baseline assumption (stated here because no reference-CUDA run is possible
in this environment): the reference publishes no N=70 throughput at all; its
only documented number for this workload family is 15.929 s for the N=20
batch-1000 15k-iteration DL example (``docs/source/dl_ccvm_sde.rst``), i.e.
941.6k trajectory-iterations/s.  ``vs_baseline`` divides our measured N=70
rate by that documented N=20 rate — conservative, since the reference's
per-iteration cost grows with N (the N x N matvec) while the divisor is its
small-N rate.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

ITERATIONS = 15000
BATCH = 1000
SIZES = (20, 30, 40, 50, 60, 70)
HEADLINE_N = 70
# The headline run grows the trajectory batch (the workload's natural scale
# axis — more independent trajectories per second at the same per-trajectory
# success probability); the per-size table stays at the reference example's
# batch 1000.
HEADLINE_BATCH = 65536
BASELINE_WALL_S = 15.929  # reference docs example block (N=20, same workload)
BASELINE_RATE = ITERATIONS * BATCH / BASELINE_WALL_S  # 941.6k traj-iter/s

INSTANCES_DIR = os.path.join(REPO, "examples", "benchmarking_instances")


def _first_instance(size):
    files = sorted(glob.glob(os.path.join(INSTANCES_DIR, f"Size{size}", "*.in")))
    return files[0] if files else None


# Paper defaults per solver (docs/source/ccvm_equations_of_motion.rst);
# the tuned table overrides per size.
DEFAULTS = {
    "dl": {"pump": 8.0, "feedback_scale": 100, "dt": 0.001, "noise_ratio": 10},
    "mf": {"pump": 0.0, "feedback_scale": 4000, "j": 5.0, "S": 20.0,
           "dt": 0.0025},
    "langevin": {"dt": 0.002, "S": 0.5, "sigma": 0.5, "feedback_scale": 1.0},
    "pumped": {"pump": 2.0, "dt": 0.002, "S": 0.5, "sigma": 0.5,
               "feedback_scale": 1.0},
}
# Hardware model used for each solver's TTS machine time (same table as
# examples/benchmarking_study.py; reference machine models in each solver).
MACHINES = {"dl": "dl-ccvm", "mf": "mf-ccvm", "langevin": "fpga",
            "pumped": "cpu"}


def _tuned_params(size, solver="dl"):
    """Per-size solver parameters: tuned table when present, paper defaults
    otherwise (iterations pinned to the benchmark workload)."""
    params = dict(DEFAULTS[solver])
    tuned_path = os.path.join(REPO, "examples", "tuned_parameters.json")
    if os.path.exists(tuned_path):
        with open(tuned_path) as f:
            table = json.load(f).get(solver, {})
        params.update(table.get(str(size), {}))
    params["iterations"] = ITERATIONS
    return params


def _tts_at_optimal(name, solver, size):
    """Median TTS at the 0.1% gap for ``size`` from the committed sweep of
    the reference's Gurobi-certified instance set, using the reference's
    statistic (``sampleTTSmetric.py:123-214``: machine_time x mean
    bootstrapped R99 median; BASELINE.md "TTS statistic definition" row).

    Returns None when the swept metadata or the machine model is missing.
    """
    path = os.path.join(
        REPO, "benchmark_results_reference", f"{name}_benchmark.json"
    )
    if not os.path.exists(path):
        return None
    from ccvm_tpu.ccvmplotlib.problem_metadata.boxqp_metadata import (
        BoxQPMetadata,
    )
    from ccvm_tpu.ccvmplotlib.problem_metadata.problem_metadata import (
        ProblemType,
    )

    md = BoxQPMetadata(ProblemType.BoxQP)
    md.ingest_metadata(path)
    table = md.generate_plot_data(
        solver.machine_time(machine=MACHINES[name])
    )
    try:
        return float(table.loc[size, ("optimal", "50")])
    except KeyError:
        return None


def _device_rate(name, solver, instance, pk, reps=4):
    """Amortised device throughput in trajectory-iterations/s.

    Dispatches ``reps`` raw solves back-to-back without intermediate host
    syncs and blocks once at the end, so the per-dispatch tunnel round trip
    (the dominant source of the ~50% session-to-session e2e wall variance,
    docs/perf_analysis.md "Measurement honesty") amortises away.  This is
    the stable, reproducible figure; the e2e wall is reported alongside it.
    """
    import jax

    solver.q_matrix = instance.q_matrix
    solver.v_vector = instance.v_vector
    solver.solution_bounds = instance.solution_bounds
    iterations = pk["iterations"]

    def dispatch(seed):
        key = jax.random.PRNGKey(seed)
        if name == "dl":
            params = solver._make_params(
                pk["pump"], solver.S, pk["dt"], pk["noise_ratio"],
                pk["feedback_scale"], 0.05, iterations,
            )
            return solver._solve(
                key, params, iterations, True, pk["pump"] > 1, None
            )
        if name == "mf":
            params = solver._make_params(
                pk["pump"], pk["S"], pk["dt"], pk["j"], pk["feedback_scale"],
                0.01, iterations,
            )
            return solver._solve(key, params, iterations, True, None)
        if name == "langevin":
            params = solver._make_params(
                pk["S"], pk["dt"], pk["sigma"], pk["feedback_scale"]
            )
            return solver._solve(key, params, iterations, None)
        params = solver._make_params(
            pk["pump"], pk["S"], pk["dt"], pk["sigma"], pk["feedback_scale"],
            iterations,
        )
        return solver._solve(key, params, iterations, True, None)

    jax.block_until_ready(dispatch(0))  # warm-up (shapes already compiled)
    t0 = time.perf_counter()
    outs = [dispatch(rep + 1) for rep in range(reps)]
    jax.block_until_ready(outs)
    wall = time.perf_counter() - t0
    return iterations * solver.batch_size * reps / wall


def main():
    import jax

    from ccvm_tpu import DLSolver, ProblemInstance
    from ccvm_tpu.runtime import default_device, enable_compilation_cache

    enable_compilation_cache()
    device = default_device()
    # timing="async": one device sync per solve (identical work; drops an
    # artificial mid-pipeline barrier that costs a tunnel round trip).
    solver = DLSolver(device=device, batch_size=BATCH, timing="async")
    solver.parameter_key = {size: _tuned_params(size) for size in SIZES}

    rows = []
    for size in SIZES:
        path = _first_instance(size)
        if path is None:
            continue
        instance = ProblemInstance(
            instance_type="tuning", file_path=path, device=device
        )
        instance.scale_coefs(solver.get_scaling_factor(instance.q_matrix))
        solver(instance, seed=0)  # warm-up (compile)
        # Best of 7: per-run wall includes one tunneled host<->device round
        # trip whose latency jitters by tens of ms.
        best_wall, solution = float("inf"), None
        for rep in range(7):
            t0 = time.perf_counter()
            sol = solver(instance, seed=rep + 1)
            wall = time.perf_counter() - t0
            if wall < best_wall:
                best_wall, solution = wall, sol
        rate = ITERATIONS * BATCH / best_wall
        rows.append((size, best_wall, rate, solution, path))

    # Headline: the N=70 workload at the throughput-optimal batch.
    headline_size = HEADLINE_N if any(r[0] == HEADLINE_N for r in rows) \
        else rows[-1][0]
    big = DLSolver(device=device, batch_size=HEADLINE_BATCH, timing="async")
    big.parameter_key = {headline_size: _tuned_params(headline_size)}
    path = _first_instance(headline_size)
    instance = ProblemInstance(
        instance_type="tuning", file_path=path, device=device
    )
    instance.scale_coefs(big.get_scaling_factor(instance.q_matrix))
    big(instance, seed=0)  # warm-up
    best_wall, solution = float("inf"), None
    for rep in range(5):
        t0 = time.perf_counter()
        sol = big(instance, seed=rep + 1)
        wall = time.perf_counter() - t0
        if wall < best_wall:
            best_wall, solution = wall, sol
    rate = ITERATIONS * HEADLINE_BATCH / best_wall
    dev_rate = _device_rate(
        "dl", big, instance, _tuned_params(headline_size), reps=4
    )
    print(
        json.dumps(
            {
                "metric": f"dl_ccvm_sde_throughput_n{headline_size}"
                          f"_b{HEADLINE_BATCH}_i{ITERATIONS}",
                "value": round(rate, 1),
                "unit": "trajectory-iterations/s",
                "vs_baseline": round(rate / BASELINE_RATE, 2),
                "device_amortised_rate": round(dev_rate, 1),
            }
        )
    )
    perf = solution.solution_performance
    print(
        f"# headline: N={headline_size} batch={HEADLINE_BATCH} wall="
        f"{best_wall:.3f}s device-amortised {dev_rate/1e6:.0f}M traj-iter/s"
        f" (e2e wall includes one tunnel round trip; +-50% across sessions,"
        f" docs/perf_analysis.md)"
        f" P(0.1%)={perf['optimal']:.3f}"
        f" P(1%)={perf['one_percent']:.3f}"
        f" best={solution.best_objective_value:.3f}"
        f"/{solution.optimal_value:.3f}",
        file=sys.stderr,
    )
    # Context table on stderr (driver reads stdout's single JSON line).
    print(
        f"# device={jax.devices()[0].device_kind}; baseline = reference's"
        f" documented N=20 rate {BASELINE_RATE:.0f} traj-iter/s"
        f" (docs/source/dl_ccvm_sde.rst 15.929 s; no N=70 or CUDA reference"
        f" number exists)",
        file=sys.stderr,
    )
    print("#  N    wall_s    traj-iter/s   P(0.1%)  P(1%)  best/optimal",
          file=sys.stderr)
    for size, wall, r, sol, p in rows:
        perf = sol.solution_performance
        print(
            f"# {size:3d}  {wall:8.4f}  {r:12.0f}   {perf['optimal']:.3f}"
            f"   {perf['one_percent']:.3f}  "
            f"{sol.best_objective_value:.3f}/{sol.optimal_value:.3f}"
            f"  ({os.path.basename(p)})",
            file=sys.stderr,
        )

    # Per-solver BASELINE metrics (BASELINE.json: "TTS (0.1% gap) and SDE
    # iterations/s/chip" for the framework, not just DL): N=70 throughput at
    # the headline batch, P(0.1%), and the reference-statistic TTS from the
    # committed sweep of the certified instance set.
    from ccvm_tpu import LangevinSolver, MFSolver, PumpedLangevinSolver

    classes = {
        "dl": DLSolver, "mf": MFSolver, "langevin": LangevinSolver,
        "pumped": PumpedLangevinSolver,
    }
    print(
        f"# all-solver BASELINE table (N={headline_size},"
        f" batch={HEADLINE_BATCH}; TTS = machine_time x mean R99 median,"
        f" certified reference set):",
        file=sys.stderr,
    )
    print(
        "# CAVEAT: TTS columns use each solver's own simulated machine model"
        f" ({', '.join(f'{k}: {v}' for k, v in MACHINES.items())})"
        " — pumped has no reference hardware model, so its TTS clock is the"
        " simulated-CPU one; TTS is NOT comparable across solvers.",
        file=sys.stderr,
    )
    print("# solver      wall_s   traj-iter/s   device-amortised   P(0.1%)"
          "   TTS50@0.1%(s)",
          file=sys.stderr)
    path = _first_instance(headline_size)
    for name, cls in classes.items():
        solver = cls(device=device, batch_size=HEADLINE_BATCH, timing="async")
        solver.parameter_key = {
            headline_size: _tuned_params(headline_size, name)
        }
        instance = ProblemInstance(
            instance_type="tuning", file_path=path, device=device
        )
        instance.scale_coefs(solver.get_scaling_factor(instance.q_matrix))
        pp = None if name == "dl" else "grad-descent"
        solver(instance, post_processor=pp, seed=0)  # warm-up
        best_wall, sol = float("inf"), None
        for rep in range(3):
            t0 = time.perf_counter()
            s = solver(instance, post_processor=pp, seed=rep + 1)
            wall = time.perf_counter() - t0
            if wall < best_wall:
                best_wall, sol = wall, s
        r = ITERATIONS * HEADLINE_BATCH / best_wall
        dr = _device_rate(name, solver, instance,
                          _tuned_params(headline_size, name), reps=3)
        tts = _tts_at_optimal(name, solver, headline_size)
        tts_s = "n/a" if tts is None else (
            "inf" if tts == float("inf") else f"{tts:.4g}"
        )
        print(
            f"# {name:<10}  {best_wall:6.3f}  {r:12.0f}   {dr:12.0f}   "
            f"{sol.solution_performance['optimal']:.3f}     {tts_s}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
