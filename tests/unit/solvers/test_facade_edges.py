"""Facade edge-case tests (VERDICT round 3 item 10): the backend="pallas"
fallback warning, timing="async" solve-time accounting, and the full
solver x machine mismatch matrix for machine_time/machine_energy
(reference dispatch: ``ccvm_solver.py:301-350,394-444``)."""

from __future__ import annotations

import logging

import numpy as np
import pytest

from ccvm_tpu.problem_classes.boxqp import ProblemInstance
from ccvm_tpu.solvers import (
    DLSolver,
    LangevinSolver,
    MFSolver,
    PumpedLangevinSolver,
)

N = 8

PARAMS = {
    "DLSolver": {"pump": 2.0, "feedback_scale": 10.0, "dt": 0.002,
                 "noise_ratio": 2.0, "iterations": 30},
    "MFSolver": {"pump": 0.0, "feedback_scale": 400.0, "j": 5.0, "S": 2.0,
                 "dt": 0.0025, "iterations": 30},
    "LangevinSolver": {"dt": 0.02, "S": 0.5, "sigma": 0.5,
                       "feedback_scale": 1.0, "iterations": 30},
    "PumpedLangevinSolver": {"pump": 2.0, "dt": 0.02, "S": 0.5, "sigma": 0.5,
                             "feedback_scale": 1.0, "iterations": 30},
}

ALL_SOLVERS = [DLSolver, MFSolver, LangevinSolver, PumpedLangevinSolver]
# machine name -> the one solver class allowed to use it (None = any)
MACHINE_OWNERS = {
    "cpu": None,
    "gpu": None,
    "dl-ccvm": DLSolver,
    "mf-ccvm": MFSolver,
    "fpga": LangevinSolver,
}


@pytest.fixture
def instance(tmp_path):
    rng = np.random.RandomState(0)
    a = rng.randn(N, N)
    q = (a + a.T) / 2
    v = rng.randn(N)
    lines = [f"{N}\t10.0\t9.0\t90.0\t0.1\t0.1\t0\t0\n"]
    lines.append("\t".join(f"{x:.6f}" for x in v) + "\n")
    for row in q:
        lines.append("\t".join(f"{x:.6f}" for x in row) + "\n")
    path = tmp_path / "t.in"
    path.write_text("".join(lines))
    return ProblemInstance(
        instance_type="tuning", file_path=str(path), device="cpu"
    )


def _make(cls, **kw):
    solver = cls(device="cpu", batch_size=16, **kw)
    solver.parameter_key = {N: dict(PARAMS[cls.__name__])}
    return solver


# ---------------------------------------------------------------------------
# backend="pallas" fallback warning (base.py _use_pallas)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cls", ALL_SOLVERS)
def test_pallas_requested_fallback_warns_and_still_solves(
    cls, instance, caplog, tmp_path
):
    """An explicit backend="pallas" that a feature forces onto the lax path
    logs the reason instead of silently degrading — evolution sampling is
    such a feature for every solver."""
    solver = _make(cls, backend="pallas")
    instance.scale_coefs(solver.get_scaling_factor(instance.q_matrix))
    with caplog.at_level(logging.WARNING, logger="ccvm_tpu.solvers.base"):
        solution = solver(
            instance, evolution_step_size=10,
            evolution_file=str(tmp_path / "evo.txt"), seed=0,
        )
    assert solution.batch_size == 16
    messages = [r.message for r in caplog.records]
    assert any("falling back to lax" in m for m in messages)
    assert any("evolution sampling" in m for m in messages)


def test_pallas_requested_per_variable_S_warns(instance, caplog):
    """A per-variable S vector is another lax-only feature."""
    solver = _make(LangevinSolver, backend="pallas")
    solver.parameter_key = {
        N: {**PARAMS["LangevinSolver"], "S": np.full(N, 0.5, np.float32)}
    }
    instance.scale_coefs(solver.get_scaling_factor(instance.q_matrix))
    with caplog.at_level(logging.WARNING, logger="ccvm_tpu.solvers.base"):
        solver(instance, seed=0)
    assert any(
        "per-variable S" in r.message for r in caplog.records
    )


@pytest.mark.parametrize("cls", ALL_SOLVERS)
def test_backend_auto_cpu_falls_back_silently(cls, instance, caplog):
    """backend="auto" off-TPU takes the lax path without any warning."""
    solver = _make(cls)
    instance.scale_coefs(solver.get_scaling_factor(instance.q_matrix))
    with caplog.at_level(logging.WARNING, logger="ccvm_tpu.solvers.base"):
        solver(instance, seed=0)
    assert not [r for r in caplog.records if "falling back" in r.message]


# ---------------------------------------------------------------------------
# timing="async" accounting
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cls", [LangevinSolver, MFSolver])
def test_async_timing_accounts_pp_time_separately(cls, instance):
    """timing="async" reports solve_time as (total wall - pp_time)/batch:
    both components positive, and the reported solve_time excludes the
    post-processing wall."""
    solver = _make(cls, timing="async")
    instance.scale_coefs(solver.get_scaling_factor(instance.q_matrix))
    solution = solver(instance, post_processor="grad-descent", seed=0)
    assert solution.pp_time > 0.0
    assert solution.solve_time > 0.0
    meta = solution.get_metadata_dict()
    assert meta["solve_time"] == pytest.approx(solution.solve_time)
    assert meta["pp_time"] == pytest.approx(solution.pp_time)


@pytest.mark.parametrize("cls", ALL_SOLVERS)
def test_async_and_sync_agree_on_results(cls, instance):
    """The timing mode changes only the wall-clock bookkeeping, never the
    solution itself (same seed => identical objective values)."""
    instance.scale_coefs(
        _make(cls).get_scaling_factor(instance.q_matrix)
    )
    sol_sync = _make(cls, timing="sync")(instance, seed=4)
    sol_async = _make(cls, timing="async")(instance, seed=4)
    np.testing.assert_array_equal(
        np.sort(np.asarray(sol_sync.objective_values)),
        np.sort(np.asarray(sol_async.objective_values)),
    )


def test_invalid_timing_rejected():
    with pytest.raises(ValueError, match="timing"):
        LangevinSolver(device="cpu", timing="bogus")


# ---------------------------------------------------------------------------
# machine_time / machine_energy mismatch matrix
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cls", ALL_SOLVERS)
@pytest.mark.parametrize("machine", list(MACHINE_OWNERS))
@pytest.mark.parametrize("method", ["machine_time", "machine_energy"])
def test_machine_solver_matrix(cls, machine, method):
    """Every solver x machine x {time, energy} cell: owners (and the generic
    cpu/gpu machines) get a callable, everyone else the reference's exact
    mismatch error."""
    solver = _make(cls)
    owner = MACHINE_OWNERS[machine]
    if owner is None or owner is cls:
        assert callable(getattr(solver, method)(machine=machine))
    else:
        with pytest.raises(ValueError, match="Mismatch between the solver"):
            getattr(solver, method)(machine=machine)


@pytest.mark.parametrize("method", ["machine_time", "machine_energy"])
def test_unknown_machine_rejected(method):
    solver = _make(LangevinSolver)
    with pytest.raises(ValueError, match="machine type is not valid"):
        getattr(solver, method)(machine="abacus")
