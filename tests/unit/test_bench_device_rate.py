"""Pin bench.py's raw-dispatch measurement against facade signature drift.

``bench._device_rate`` reaches into each solver facade's ``_make_params`` /
``_solve`` plumbing (the amortised device-throughput measurement cannot go
through ``__call__``, whose per-call host sync is the thing being excluded).
A facade signature change must fail HERE, not at benchmark time on the
driver's chip.
"""

import importlib.util
import os

import numpy as np
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "..", "bench.py")
)
bench = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench)

from ccvm_tpu.problem_classes.boxqp import ProblemInstance  # noqa: E402
from ccvm_tpu.solvers import (  # noqa: E402
    DLSolver,
    LangevinSolver,
    MFSolver,
    PumpedLangevinSolver,
)

N = 8
PARAMS = {
    "dl": {"pump": 2.0, "feedback_scale": 10, "dt": 0.01, "noise_ratio": 10,
           "iterations": 20},
    "mf": {"pump": 0.0, "feedback_scale": 50, "j": 5.0, "S": 2.0, "dt": 0.01,
           "iterations": 20},
    "langevin": {"dt": 0.02, "S": 0.5, "sigma": 0.5, "feedback_scale": 1.0,
                 "iterations": 20},
    "pumped": {"pump": 2.0, "dt": 0.02, "S": 0.5, "sigma": 0.5,
               "feedback_scale": 1.0, "iterations": 20},
}
CLASSES = {"dl": DLSolver, "mf": MFSolver, "langevin": LangevinSolver,
           "pumped": PumpedLangevinSolver}


def _instance(tmp_path):
    rng = np.random.RandomState(0)
    a = rng.randn(N, N)
    q = (a + a.T) / 2
    v = rng.randn(N)
    lines = [f"{N}\t10.0\t9.0\t90.0\t0.1\t0.1\t0\t0\n"]
    lines.append("\t".join(f"{x:.6f}" for x in v) + "\n")
    for row in q:
        lines.append("\t".join(f"{x:.6f}" for x in row) + "\n")
    path = tmp_path / "i.in"
    path.write_text("".join(lines))
    return ProblemInstance(instance_type="tuning", file_path=str(path),
                           device="cpu")


@pytest.mark.parametrize("name", ["dl", "mf", "langevin", "pumped"])
def test_device_rate_matches_facade_signatures(name, tmp_path):
    solver = CLASSES[name](device="cpu", batch_size=16, backend="lax")
    solver.parameter_key = {N: dict(PARAMS[name])}
    inst = _instance(tmp_path)
    inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
    rate = bench._device_rate(name, solver, inst, dict(PARAMS[name]), reps=2)
    assert np.isfinite(rate) and rate > 0
