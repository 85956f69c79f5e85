"""Head-to-head: the reference's EXECUTABLE solvers vs ccvm_tpu on identical instances.

Runs the reference implementation (torch CPU, imported from ``/root/reference``:
``ccvm_simulators/solvers/dl_solver.py:771`` ``__call__``, ``mf_solver.py:766``,
``langevin_solver.py:563``, ``pumped_langevin_solver.py:451``) and our framework
on the SAME Gurobi-certified instances with IDENTICAL parameters, batch size and
iteration count, then reports per-solver per-size P(0.1%) / P(1%) side by side.

This converts the profile-level doc-table comparison in QUALITY.md into direct
parity evidence against executed reference code, and settles whether behaviours
like DL's large-N P(0.1%) decay are dynamics-inherent or implementation defects.

Usage (both sides write resumable JSONL keyed by solver|size|instance|params):
    python tools/reference_head_to_head.py ref   --params tuned --out h2h_ref.jsonl
    python tools/reference_head_to_head.py ours  --params tuned --out h2h_ours.jsonl
    python tools/reference_head_to_head.py report --ref h2h_ref.jsonl --ours h2h_ours.jsonl
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
INSTANCE_ROOT = os.path.join(REFERENCE, "examples", "benchmarking_instances")

# The reference's own example/paper defaults (examples/ccvm_boxqp_dl.py:16-24,
# ccvm_boxqp_mf.py:16-25, langevin_boxqp.py:16-24, pumped_langevin_boxqp.py:16-25),
# size-independent by construction.
PAPER_PARAMS = {
    "dl": {"pump": 8.0, "feedback_scale": 100, "dt": 0.001, "noise_ratio": 10},
    "mf": {"pump": 0.0, "feedback_scale": 4000, "j": 5.0, "S": 20.0, "dt": 0.0025},
    "langevin": {"dt": 0.002, "S": 0.5, "sigma": 0.5, "feedback_scale": 1.0},
    "pumped": {"pump": 2.0, "dt": 0.002, "S": 0.5, "sigma": 0.5, "feedback_scale": 1.0},
}

# grad-descent refinement for MF/Langevin/pumped, none for DL — the reference's
# own example configuration, and the one QUALITY.md's sweeps use.
POST_PROCESSOR = {"dl": None, "mf": "grad-descent", "langevin": "grad-descent",
                  "pumped": "grad-descent"}

SOLVER_ORDER = ["dl", "mf", "langevin", "pumped"]


def instance_files(size, ninst):
    files = sorted(glob.glob(os.path.join(INSTANCE_ROOT, f"Size{size}", "*.in")))
    return files[:ninst]


def load_params(params_tag, solver_name, size):
    if params_tag == "paper":
        p = dict(PAPER_PARAMS[solver_name])
    else:
        with open(os.path.join(REPO, "examples", "tuned_parameters.json")) as f:
            tuned = json.load(f)
        p = dict(tuned[solver_name][str(size)])
    return p


def result_key(solver_name, size, inst_name, params_tag):
    return f"{solver_name}|{size}|{inst_name}|{params_tag}"


def existing_keys(out_path):
    done = set()
    if os.path.exists(out_path):
        with open(out_path) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["key"])
                except Exception:
                    pass
    return done


def append_result(out_path, rec):
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()


def run_side(side, args):
    solvers = args.solvers.split(",")
    sizes = [int(s) for s in args.sizes.split(",")]
    done = existing_keys(args.out)

    if side == "ref":
        sys.path.insert(0, REFERENCE)
        import torch
        torch.set_num_threads(args.threads)
        from ccvm_simulators.problem_classes.boxqp import ProblemInstance
        from ccvm_simulators.solvers import (DLSolver, LangevinSolver, MFSolver,
                                             PumpedLangevinSolver)
        classes = {"dl": DLSolver, "mf": MFSolver, "langevin": LangevinSolver,
                   "pumped": PumpedLangevinSolver}
        device = "cpu"
    else:
        sys.path.insert(0, REPO)
        from ccvm_tpu.problem_classes.boxqp import ProblemInstance
        from ccvm_tpu.runtime import default_device
        from ccvm_tpu.solvers import (DLSolver, LangevinSolver, MFSolver,
                                      PumpedLangevinSolver)
        classes = {"dl": DLSolver, "mf": MFSolver, "langevin": LangevinSolver,
                   "pumped": PumpedLangevinSolver}
        device = default_device()

    for solver_name in solvers:
        for size in sizes:
            params = load_params(args.params, solver_name, size)
            params = dict(params, iterations=args.iters)
            solver = classes[solver_name](device=device, batch_size=args.batch)
            solver.parameter_key = {size: params}
            for inst_idx, path in enumerate(instance_files(size, args.ninst)):
                inst_name = os.path.basename(path)
                key = result_key(solver_name, size, inst_name, args.params)
                if key in done:
                    continue
                kwargs = {}
                if side == "ref":
                    import torch
                    torch.manual_seed(1000 * size + inst_idx)
                else:
                    # Deterministic per-instance seed so the ours side is
                    # re-runnable row for row, mirroring the ref side's
                    # torch.manual_seed.
                    kwargs["seed"] = 1000 * size + inst_idx
                inst = ProblemInstance(instance_type="test", file_path=path,
                                       device=device)
                inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
                t0 = time.time()
                pp = POST_PROCESSOR[solver_name]
                if pp is not None:
                    kwargs["post_processor"] = pp
                sol = solver(inst, **kwargs)
                wall = time.time() - t0
                perf = {k: float(v) for k, v in sol.solution_performance.items()}
                rec = {
                    "key": key, "side": side, "solver": solver_name, "size": size,
                    "instance": inst_name, "params_tag": args.params,
                    "params": params, "batch": args.batch, "iters": args.iters,
                    "post_processor": pp,
                    "p_optimal": perf.get("optimal"),
                    "p_one_percent": perf.get("one_percent"),
                    "performance": perf,
                    "best_objective": float(sol.best_objective_value),
                    "optimal_value": float(inst.optimal_sol),
                    "solve_time": float(sol.solve_time),
                    "wall": wall,
                }
                append_result(args.out, rec)
                print(f"{key}: P(0.1%)={rec['p_optimal']:.3f} "
                      f"P(1%)={rec['p_one_percent']:.3f} wall={wall:.1f}s",
                      flush=True)


def load_rows(path):
    rows = {}
    if path and os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    rows[r["key"]] = r
                except Exception:
                    pass
    return rows


def report(args):
    ref = load_rows(args.ref)
    ours = load_rows(args.ours)
    combos = sorted({(r["solver"], r["size"], r["params_tag"])
                     for r in list(ref.values()) + list(ours.values())},
                    key=lambda t: (SOLVER_ORDER.index(t[0]), t[1], t[2]))
    print("| Solver | N | params | n inst | ref P(0.1%) | ours P(0.1%) | "
          "ref P(1%) | ours P(1%) | ref s/inst | ours s/inst |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for solver_name, size, tag in combos:
        rk = [r for r in ref.values()
              if (r["solver"], r["size"], r["params_tag"]) == (solver_name, size, tag)]
        ok = [r for r in ours.values()
              if (r["solver"], r["size"], r["params_tag"]) == (solver_name, size, tag)]
        # pair on instance name so means are over the identical instance subset
        names = sorted({r["instance"] for r in rk} & {r["instance"] for r in ok})
        if names:
            rk = [r for r in rk if r["instance"] in names]
            ok = [r for r in ok if r["instance"] in names]

        def mean(rows, field):
            vals = [r[field] for r in rows if r.get(field) is not None]
            return sum(vals) / len(vals) if vals else float("nan")

        print(f"| {solver_name} | {size} | {tag} | {len(names) or max(len(rk), len(ok))} "
              f"| {mean(rk, 'p_optimal'):.3f} | {mean(ok, 'p_optimal'):.3f} "
              f"| {mean(rk, 'p_one_percent'):.3f} | {mean(ok, 'p_one_percent'):.3f} "
              f"| {mean(rk, 'wall'):.1f} | {mean(ok, 'wall'):.2f} |")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for side in ("ref", "ours"):
        p = sub.add_parser(side)
        p.add_argument("--solvers", default="dl,mf,langevin,pumped")
        p.add_argument("--sizes", default="20,40,70")
        p.add_argument("--ninst", type=int, default=10)
        p.add_argument("--batch", type=int, default=1000)
        p.add_argument("--iters", type=int, default=15000)
        p.add_argument("--params", choices=["tuned", "paper"], default="tuned")
        p.add_argument("--threads", type=int, default=1)
        p.add_argument("--out", required=True)
    p = sub.add_parser("report")
    p.add_argument("--ref", required=True)
    p.add_argument("--ours", required=True)
    args = ap.parse_args()
    if args.cmd == "report":
        report(args)
    else:
        run_side(args.cmd, args)


if __name__ == "__main__":
    main()
