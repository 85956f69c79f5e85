"""Tune per-solver per-size parameters on the benchmark set.

Runs :func:`ccvm_tpu.tuning.tune_solver` (working grid search; the
reference's ``tune()`` is a crashing placeholder, ``dl_solver.py:327-329``)
for every solver over a small per-size grid centred on the paper defaults,
scoring by P(0.1% gap) on the first few instances of each size, and writes
the winners to ``examples/tuned_parameters.json`` for
``examples/benchmarking_study.py --params``.

Run through tools/tpu_worker.py on the TPU.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ccvm_tpu import (  # noqa: E402
    DLSolver,
    LangevinSolver,
    MFSolver,
    ProblemInstance,
    PumpedLangevinSolver,
)
from ccvm_tpu.tuning import tune_solver  # noqa: E402

DEFAULTS = {
    "dl": {"pump": 8.0, "feedback_scale": 100, "dt": 0.001, "noise_ratio": 10},
    "mf": {"pump": 0.0, "feedback_scale": 4000, "j": 5.0, "S": 20.0,
           "dt": 0.0025},
    "langevin": {"dt": 0.002, "S": 0.5, "sigma": 0.5, "feedback_scale": 1.0},
    "pumped": {"pump": 2.0, "dt": 0.002, "S": 0.5, "sigma": 0.5,
               "feedback_scale": 1.0},
}

# Small grids centred on the paper defaults (docs parameter table); kept
# deliberately coarse — the tuner scores every (candidate, size, instance)
# with a full solve.
GRIDS = {
    "dl": {"pump": [4.0, 8.0, 12.0], "feedback_scale": [60.0, 100.0, 150.0],
           "noise_ratio": [5.0, 10.0, 15.0]},
    "mf": {"j": [1.0, 5.0, 20.0],
           "feedback_scale": [2000.0, 4000.0, 8000.0]},
    "langevin": {"sigma": [0.25, 0.5, 1.0],
                 "feedback_scale": [0.5, 1.0, 2.0]},
    "pumped": {"pump": [1.0, 2.0, 4.0], "sigma": [0.25, 0.5, 1.0]},
}

CLASSES = {
    "dl": DLSolver,
    "mf": MFSolver,
    "langevin": LangevinSolver,
    "pumped": PumpedLangevinSolver,
}

POST = {"dl": None, "mf": "grad-descent", "langevin": "grad-descent",
        "pumped": "grad-descent"}


def main(instance_dir="examples/benchmarking_instances",
         out_path="examples/tuned_parameters.json",
         sizes=(20, 30, 40, 50, 60, 70), per_size=3, iterations=15000,
         tuning_batch_size=256, device=None, solvers=None):
    if device is None:
        from ccvm_tpu.runtime import default_device

        device = default_device()
    instances = []
    for size in sizes:
        files = sorted(
            glob.glob(os.path.join(instance_dir, f"Size{size}", "*.in"))
        )[:per_size]
        for f in files:
            instances.append(
                ProblemInstance(instance_type="tuning", file_path=f,
                                device=device)
            )

    out = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            out = json.load(f)
    for name in solvers or CLASSES:
        solver = CLASSES[name](device=device, batch_size=tuning_batch_size,
                               timing="async")
        base = dict(DEFAULTS[name])
        base["iterations"] = iterations
        solver.parameter_key = {s: dict(base) for s in sizes}
        # The tuner scales each instance per solver; use fresh copies so the
        # scale_coefs stacking of a previous solver doesn't leak in.
        insts = [
            ProblemInstance(instance_type="tuning", file_path=i.file_path,
                            device=device)
            for i in instances
        ]
        for inst in insts:
            inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
        best = solver.tune(
            insts, post_processor=POST[name], parameter_ranges=GRIDS[name],
            tuning_batch_size=tuning_batch_size, seed=7,
        )
        # Merge per size so a partial (subset-of-sizes) tuning run refines
        # the existing table instead of replacing it.
        out.setdefault(name, {}).update({
            str(size): {
                k: v for k, v in params.items() if k != "iterations"
            }
            for size, params in best.items()
        })
        print(f"{name}: {json.dumps(out[name])}")
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
