"""Pumped Langevin solver tests."""

import os

import numpy as np
import pytest

from ccvm_tpu import AdamParameters, ProblemInstance, PumpedLangevinSolver

DATA = os.path.join(os.path.dirname(__file__), "..", "..", "data")
TEST020 = os.path.join(DATA, "test020.in")

PARAMS20 = {
    20: {
        "pump": 2.0,
        "dt": 0.002,
        "S": 0.5,
        "iterations": 1500,
        "sigma": 0.5,
        "feedback_scale": 1.0,
    }
}


@pytest.fixture
def solver():
    s = PumpedLangevinSolver(device="cpu", batch_size=100)
    s.parameter_key = PARAMS20
    return s


@pytest.fixture
def instance(solver):
    inst = ProblemInstance(instance_type="test", file_path=TEST020, device="cpu")
    inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
    return inst


class TestDrift:
    def test_matches_numpy(self, solver, instance):
        """drift = (-1 + p - c^2) c + fs * grads (pumped_langevin:95-147)."""
        solver.q_matrix = instance.q_matrix
        solver.v_vector = instance.v_vector
        solver.solution_bounds = (0.0, 1.0)
        rng = np.random.RandomState(3)
        c = rng.uniform(-0.5, 0.5, (4, 20)).astype(np.float32)
        p, S, fs = 1.3, 0.5, 2.0
        got = np.asarray(solver._calculate_drift_boxqp(c, p, S, fs))
        q = np.asarray(instance.q_matrix)
        v = np.asarray(instance.v_vector)
        scale = 1.0 / (2 * S)
        x = c * scale + 0.5
        grads = -(x @ q) * scale - v * scale
        want = (-1 + p - c**2) * c + fs * grads
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestSolve:
    def test_statistical_acceptance(self, solver, instance):
        solution = solver(instance, post_processor="grad-descent", seed=17)
        assert solution.solution_performance["optimal"] >= 0.9
        assert solution.best_objective_value == pytest.approx(
            instance.optimal_sol, rel=2e-3
        )

    def test_pump_rate_flag_off(self, solver, instance):
        solution = solver(instance, pump_rate_flag=False, seed=18)
        assert np.isfinite(solution.best_objective_value)

    def test_adam(self, solver, instance):
        solution = solver(
            instance,
            post_processor="grad-descent",
            seed=19,
            algorithm_parameters=AdamParameters(
                alpha=0.001, beta1=0.9, beta2=0.999, add_assign=True
            ),
        )
        assert solution.solution_performance["ten_percent"] >= 0.5

    def test_deterministic(self, solver, instance):
        a = solver(instance, seed=44)
        b = solver(instance, seed=44)
        np.testing.assert_array_equal(
            np.asarray(a.objective_values), np.asarray(b.objective_values)
        )


class TestParameterKey:
    def test_invalid(self, solver):
        with pytest.raises(ValueError, match="not valid for this solver"):
            solver.parameter_key = {
                20: {"dt": 0.002, "S": 0.5, "iterations": 10, "sigma": 0.5,
                     "feedback_scale": 1.0}
            }


def test_evolution_file(solver, instance, tmp_path):
    """Evolution sampling writes the best trajectory's c block, tab-delimited
    (the reference's pumped writer crashes on a missing arg,
    ``pumped_langevin_solver.py:632-636`` — documented fix)."""
    path = str(tmp_path / "evo.txt")
    solution = solver(
        instance, evolution_step_size=20, evolution_file=path, seed=3
    )
    assert solution.evolution_file == path
    lines = open(path).read().strip().split("\n")
    assert len(lines) == instance.problem_size
    first_row = [t for t in lines[0].split("\t") if t]
    # samples at iterations 0, 20, 40, ... and the final iteration
    assert len(first_row) >= 2


def test_device_mismatch(solver):
    from ccvm_tpu import ProblemInstance

    class FakeInstance:
        device = "cuda"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="must match"):
        solver(FakeInstance())
