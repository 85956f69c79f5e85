"""Sweep generalised DL pump-ramp shapes on the certified reference set.

DL-CCVM's P(0.1%) dips at N=40/60/70 are dynamics-inherent (QUALITY.md
head-to-head: the reference's own executable DL lands at the same level).
The one lever the reference family never explores is the SHAPE of the pump
ramp — its rate(i) = (i+1)/T is hard-coded linear (``dl_solver.py:524``).
This tool measures whether a bent ramp rate(i) = min((i+1)/(rho*T), 1)**gamma
(``DLSolver.__call__(pump_ramp=(gamma, rho))``) moves DL's large-N quality,
at the per-size tuned parameters, scored against corrected optima
(``benchmark_results_reference/corrected_optima.json`` — 73 reference
headers are proven wrong, QUALITY.md).

Run on the TPU (e.g. through tools/tpu_worker.py):
    from tools.dl_pump_ramp_sweep import main
    main()

Writes ``benchmark_results_reference/dl_pump_ramp.json`` incrementally, so
an interrupted sweep resumes.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from ccvm_tpu import DLSolver, ProblemInstance  # noqa: E402

INSTANCE_ROOT = "/root/reference/examples/benchmarking_instances"
OUT_PATH = os.path.join(REPO, "benchmark_results_reference", "dl_pump_ramp.json")

SIZES = (40, 60, 70)
NINST = 10
SEEDS = (0, 1)
BATCH = 1000
# (gamma, rho); None = the reference's exact linear ramp (the baseline row).
RAMPS = (
    None,
    (0.5, 1.0),   # concave: fast early pump rise
    (2.0, 1.0),   # convex: slow early rise, late anneal
    (3.0, 1.0),
    (1.0, 0.5),   # linear to full pump at T/2, then plateau
    (1.0, 0.75),
    (2.0, 0.7),   # slow rise reaching full pump at 0.7 T
    (0.5, 0.7),   # fast rise, early plateau
)


def _corrected_optima():
    path = os.path.join(
        REPO, "benchmark_results_reference", "corrected_optima.json"
    )
    with open(path) as f:
        return json.load(f)


def _p_at_gap(objective_values, optimum, gap_pct=0.1):
    obj = -np.asarray(objective_values, np.float64)
    gap = (optimum - obj) * 100.0 / np.abs(obj)
    return float(np.mean(gap <= gap_pct))


def _select_files(size, ninst, select):
    files = sorted(glob.glob(os.path.join(INSTANCE_ROOT, f"Size{size}", "*.in")))
    if select == "first":
        return files[:ninst]
    # "top_dl": instances where the round-4 sweep's DL had the highest
    # P(0.1%) — per-instance DL success is bimodal and most large-N
    # instances score exactly 0, so a shape effect is only measurable on
    # the DL-facile subset.
    with open(os.path.join(
        REPO, "benchmark_results_reference", "dl_benchmark.json"
    )) as f:
        rm = json.load(f)["result_metadata"]
    p_by_name = {
        r["instance_name"]: r["solution_performance"]["optimal"]
        for r in rm if r.get("problem_size") == size
    }
    return sorted(
        files,
        key=lambda f: -p_by_name.get(
            os.path.splitext(os.path.basename(f))[0], 0.0
        ),
    )[:ninst]


def main(sizes=SIZES, ninst=NINST, seeds=SEEDS, ramps=RAMPS, batch=BATCH,
         select="first", out_path=OUT_PATH):
    with open(os.path.join(REPO, "examples", "tuned_parameters.json")) as f:
        tuned = json.load(f)["dl"]
    corrected = _corrected_optima()

    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    solver = DLSolver("tpu", batch_size=batch)
    for size in sizes:
        p = dict(tuned[str(size)])
        p["iterations"] = 15000
        solver.parameter_key = {size: p}
        files = _select_files(size, ninst, select)
        instances, optima = [], []
        for path in files:
            inst = ProblemInstance(
                instance_type="test", file_path=path, device="tpu"
            )
            # The reference workflow scales Q/V by the solver's scaling
            # factor before solving (examples/ccvm_boxqp_dl.py) — without
            # this the dynamics blow up and every P collapses to 0.
            inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
            name = os.path.splitext(os.path.basename(path))[0]
            instances.append(inst)
            optima.append(
                corrected.get(f"Size{size}/{name}", float(inst.optimal_sol))
            )
        for ramp in ramps:
            tag = "linear" if ramp is None else f"g{ramp[0]}_r{ramp[1]}"
            key = f"{size}|{tag}"
            if key in results:
                print(f"{key}: cached P={results[key]['p01_mean']:.3f}")
                continue
            per_inst = []
            for idx, (inst, opt) in enumerate(zip(instances, optima)):
                ps = []
                for seed in seeds:
                    # deterministic: size, per-instance index, seed replicate
                    sol = solver(
                        inst,
                        seed=1000 * size + 131 * seed + idx,
                        pump_ramp=ramp,
                    )
                    ps.append(_p_at_gap(sol.objective_values, opt))
                per_inst.append(float(np.mean(ps)))
            results[key] = {
                "size": size,
                "ramp": list(ramp) if ramp else None,
                "p01_mean": float(np.mean(per_inst)),
                "per_instance": per_inst,
                "batch": batch,
                "seeds": list(seeds),
                "params": p,
                "select": select,
                "instances": [os.path.basename(f) for f in files],
            }
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)
            print(f"{key}: P(0.1%)={results[key]['p01_mean']:.3f}", flush=True)

    print("\nsummary (P(0.1%), mean over instances x seeds):")
    tags = ["linear"] + [f"g{r[0]}_r{r[1]}" for r in ramps if r]
    print("ramp      " + "  ".join(f"N={s}" for s in sizes))
    for tag in tags:
        row = [results.get(f"{s}|{tag}", {}).get("p01_mean") for s in sizes]
        print(f"{tag:10s}" + "  ".join(
            f"{v:.3f}" if v is not None else "  -  " for v in row))
    return results


if __name__ == "__main__":
    main()
