"""Cross-validate benchmark-set best-knowns with a multi-solver consensus.

For sizes where exact certification (``tools/certify_boxqp.py``) is too
expensive, the recorded optima are best-knowns from a multi-start L-BFGS
sweep.  The SDE solvers explore differently and occasionally beat that
record (observed: Langevin/MF found 979.3577 on an N=70 instance whose
header said 978.9605).  Gap/success statistics anchored to a beatable
record are wrong in the flattering direction (VERDICT round 2, item 3), so
this tool runs a strong consensus pass — Langevin, MF and pumped-Langevin at
large batch with paper-default parameters plus an exact active-set polish of
each solver's best trajectory — and rewrites any header it beats (solution
vector included).  Certified headers (``optimality True``) are asserted
unbeatable, never modified.

Run it through tools/tpu_worker.py (single-chip client attaches are sticky):
    echo 'import tools.update_best_known as u; u.main("examples/benchmarking_instances", sizes=[40,50,60,70])' > /tmp/tpuq/job.py
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.certify_boxqp import _active_set_polish, load_raw, write_raw  # noqa: E402


def _make_solvers(device, batch_size, sizes, iterations):
    from ccvm_tpu import LangevinSolver, MFSolver, PumpedLangevinSolver

    specs = [
        (LangevinSolver, {"dt": 0.002, "S": 0.5, "sigma": 0.5,
                          "feedback_scale": 1.0}),
        (MFSolver, {"pump": 0.0, "feedback_scale": 4000, "j": 5.0, "S": 20.0,
                    "dt": 0.0025}),
        (PumpedLangevinSolver, {"pump": 2.0, "dt": 0.002, "S": 0.5,
                                "sigma": 0.5, "feedback_scale": 1.0}),
    ]
    solvers = []
    for cls, params in specs:
        solver = cls(device=device, batch_size=batch_size, timing="async")
        p = dict(params)
        p["iterations"] = iterations
        solver.parameter_key = {s: dict(p) for s in sizes}
        solvers.append(solver)
    return solvers


def update_file(path, solvers, device, seeds=(11, 12)):
    """Returns (improved: bool, new_best: float)."""
    from ccvm_tpu import ProblemInstance

    n, hdr, v, q, sol_vec = load_raw(path)
    recorded = float(hdr[1])
    certified = hdr[3] == "True"

    best_val, best_x = recorded, None
    for solver in solvers:
        inst = ProblemInstance(instance_type="tuning", file_path=path,
                               device=device)
        inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
        for seed in seeds:
            sol = solver(inst, post_processor="grad-descent", seed=seed)
            pv = np.asarray(sol.variables["problem_variables"], np.float64)
            vals = 0.5 * np.einsum("bi,ij,bj->b", pv, q, pv) + pv @ v
            k = int(np.argmax(vals))
            x_p, val_p = _active_set_polish(q, v, np.clip(pv[k], 0, 1))
            # Threshold above the header's 6-decimal print rounding so
            # epsilon-level polish churn doesn't rewrite converged records.
            if val_p > best_val + 5e-4:
                best_val, best_x = val_p, x_p

    if best_x is None:
        return False, recorded
    if certified:
        raise AssertionError(
            f"{path}: a solver beat a CERTIFIED optimum "
            f"({best_val:.6f} > {recorded:.6f}) — certification bug!"
        )
    hdr[1] = hdr[2] = f"{best_val:.6f}"
    hdr[7] = str(int(np.sum((best_x > 1e-6) & (best_x < 1 - 1e-6))))
    write_raw(path, hdr, v, q, best_x)
    print(f"  {os.path.basename(path)}: record {recorded:.6f} -> "
          f"{best_val:.6f}")
    return True, best_val


def main(instance_dir, sizes=(40, 50, 60, 70), batch_size=4096,
         iterations=15000, device=None):
    if device is None:
        from ccvm_tpu.runtime import default_device

        device = default_device()
    solvers = _make_solvers(device, batch_size, sizes, iterations)
    n_improved = n_total = 0
    for size in sizes:
        files = sorted(
            glob.glob(os.path.join(instance_dir, f"Size{size}", "*.in"))
        )
        for path in files:
            improved, _ = update_file(path, solvers, device)
            n_improved += improved
            n_total += 1
        print(f"Size{size}: done ({n_total} so far, {n_improved} improved)")
    print(f"updated {n_improved}/{n_total} best-knowns")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "examples/benchmarking_instances")
