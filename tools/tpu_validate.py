"""Noise-on statistical validation of the Pallas kernels on real TPU.

Runs every solver through both backends (fused Pallas kernel vs the lax.scan
oracle) on the N=20 single-test instance and compares success probabilities
at each optimality gap.  The two backends use different RNGs (TPU hardware
PRNG vs threefry), so agreement is distributional: with batch B the binomial
std of a success fraction p is sqrt(p(1-p)/B); we assert agreement within
5 combined sigmas (plus a small absolute floor for p near 0/1).

Usage: PYTHONPATH=. python tools/tpu_validate.py [--batch 4096] [--iterations 15000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from ccvm_tpu.problem_classes.boxqp import ProblemInstance  # noqa: E402
from ccvm_tpu.runtime import default_device  # noqa: E402
from ccvm_tpu.solvers import (  # noqa: E402
    DLSolver,
    LangevinSolver,
    MFSolver,
    PumpedLangevinSolver,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INSTANCE_CANDIDATES = [
    "/root/reference/examples/benchmarking_instances/single_test_instance/"
    "tuningH020-100-0.in",
    os.path.join(REPO, "examples", "benchmarking_instances",
                 "single_test_instance", "tuningH020-100-0.in"),
]

PARAMS = {
    "dl": (DLSolver, {"pump": 8.0, "feedback_scale": 100, "dt": 0.001,
                      "noise_ratio": 10}),
    "mf": (MFSolver, {"pump": 0.0, "feedback_scale": 4000, "j": 5.0,
                      "S": 20.0, "dt": 0.0025}),
    "langevin": (LangevinSolver, {"dt": 0.002, "S": 0.5, "sigma": 0.5,
                                  "feedback_scale": 1.0}),
    "pumped": (PumpedLangevinSolver, {"pump": 2.0, "dt": 0.002, "S": 0.5,
                                      "sigma": 0.5, "feedback_scale": 1.0}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iterations", type=int, default=15000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--rng", default="popcount32",
                    choices=("popcount32", "popcount", "box_muller"),
                    help="hardware-PRNG scheme used by the Pallas backend")
    args = ap.parse_args()

    device = default_device()
    if device != "tpu":
        print("WARNING: no TPU found; validating on", device)
    instance_path = next(p for p in INSTANCE_CANDIDATES if os.path.exists(p))
    print(f"instance: {instance_path}  batch={args.batch} "
          f"iterations={args.iterations}")

    from ccvm_tpu.solvers.algorithms import AdamParameters

    failures = []
    # (variant label, algorithm_parameters): every solver is validated both
    # with the original dynamics and with the fused Adam-in-loop kernels.
    variants = [
        ("", None),
        ("+adam", AdamParameters(alpha=0.1, beta1=0.9, beta2=0.999,
                                 add_assign=True)),
    ]
    for name, (cls, base) in PARAMS.items():
        for suffix, algo in variants:
            perf = {}
            for backend in ("pallas", "lax"):
                solver = cls(device=device, batch_size=args.batch,
                             backend=backend, kernel_rng=args.rng)
                params = dict(base)
                params["iterations"] = args.iterations
                solver.parameter_key = {20: params}
                inst = ProblemInstance(
                    instance_type="test", file_path=instance_path,
                    device=device,
                )
                inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
                sol = solver(inst, seed=args.seed, algorithm_parameters=algo)
                perf[backend] = sol.solution_performance
            print(f"\n{name}{suffix}:")
            for gap in perf["pallas"]:
                p_pal, p_lax = perf["pallas"][gap], perf["lax"][gap]
                sig = np.sqrt(
                    max(p_pal * (1 - p_pal), p_lax * (1 - p_lax), 1e-6)
                    / args.batch
                ) * np.sqrt(2)
                tol = 5 * sig + 0.01
                ok = abs(p_pal - p_lax) <= tol
                mark = "ok " if ok else "FAIL"
                print(f"  {mark} {gap:<13} pallas={p_pal:.4f} "
                      f"lax={p_lax:.4f} tol={tol:.4f}")
                if not ok:
                    failures.append((name + suffix, gap, p_pal, p_lax))

    if failures:
        print("\nFAILURES:", failures)
        sys.exit(1)
    print("\nAll solvers: pallas and lax backends statistically agree.")


if __name__ == "__main__":
    main()
