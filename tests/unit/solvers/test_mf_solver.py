"""MF solver tests: numeric drift/grads golden values on ones-matrices (the
reference's own strongest solver test pattern), readout subtleties, and
statistical acceptance."""

import os

import numpy as np
import pytest

from ccvm_tpu import AdamParameters, MFSolver, ProblemInstance

DATA = os.path.join(os.path.dirname(__file__), "..", "..", "data")
TEST020 = os.path.join(DATA, "test020.in")

PARAMS20 = {
    20: {
        "pump": 0.0,
        "feedback_scale": 4000,
        "j": 5.0,
        "S": 20.0,
        "dt": 0.0025,
        "iterations": 1500,
    }
}


@pytest.fixture
def solver():
    s = MFSolver(device="cpu", batch_size=100)
    s.parameter_key = PARAMS20
    return s


@pytest.fixture
def instance(solver):
    inst = ProblemInstance(instance_type="test", file_path=TEST020, device="cpu")
    inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
    return inst


class TestDriftGolden:
    """Golden values on all-ones problem data, hand-derived from the SDE in
    mf_solver.py:141-198."""

    def _ones_setup(self, solver, n=4, batch=2):
        solver.q_matrix = np.ones((n, n), np.float32)
        solver.v_vector = np.ones((n,), np.float32)
        solver.solution_bounds = (0.0, 1.0)
        mu = np.ones((batch, n), np.float32)
        mu_tilde = np.ones((batch, n), np.float32)
        sigma = np.ones((batch, n), np.float32)
        return mu, mu_tilde, sigma

    def test_drift_mu_golden(self, solver):
        mu, mu_tilde, sigma = self._ones_setup(solver)
        n = 4
        # S=1, lo=0, hi=1: x = mu_tilde*1/1 + 1 = 2 -> x@Q row sum = 2n
        # term2_1 = -0.25 * 2n = -2; term2_2 = -0.5
        # fs=1: drift_mu = (-(1+j) + pump - g^2) * 1 + (-2 - 0.5)
        pump, j, g, S, fs = 2.0, 1.0, 0.1, 1.0, 1.0
        got_mu, got_sigma = solver._calculate_drift_boxqp(
            mu, mu_tilde, sigma, pump, j, g, S, fs, 0, 1
        )
        want_mu = (-(1 + j) + pump - g**2) * 1.0 + (-0.25 * 2 * n - 0.5)
        np.testing.assert_allclose(np.asarray(got_mu), want_mu, rtol=1e-5)
        # sigma: 2(-(1+j)+pump-3g^2)*1 - 2j*(0.5)^2 + (1+j) + 2g^2
        want_sigma = (
            2 * (-(1 + j) + pump - 3 * g**2) - 2 * j * 0.25 + (1 + j) + 2 * g**2
        )
        np.testing.assert_allclose(
            np.asarray(got_sigma), want_sigma, rtol=1e-5
        )

    def test_grads_golden(self, solver):
        mu, mu_tilde, sigma = self._ones_setup(solver)
        # grads = fs * (term2_1 + term2_2) = 10 * (-2 - 0.5) = -25
        got = solver._calculate_grads_boxqp(mu_tilde, 1.0, 10.0, 0, 1)
        np.testing.assert_allclose(np.asarray(got), -25.0, rtol=1e-5)


class TestHelpers:
    def test_change_variables(self, solver):
        out = solver._change_variables_boxqp(
            np.array([[-20.0, 0.0, 20.0]], np.float32), 0, 1, 20.0
        )
        np.testing.assert_allclose(np.asarray(out), [[0.0, 0.5, 1.0]])

    def test_fit_to_constraints(self, solver):
        out = solver._fit_to_constraints_boxqp(
            np.array([[-30.0, 5.0, 30.0]], np.float32), -20.0, 20.0
        )
        np.testing.assert_allclose(np.asarray(out), [[-20.0, 5.0, 20.0]])


class TestSolve:
    def test_statistical_acceptance(self, solver, instance):
        solution = solver(instance, post_processor="grad-descent", seed=11)
        assert solution.solution_performance["optimal"] >= 0.9
        assert solution.best_objective_value == pytest.approx(
            instance.optimal_sol, rel=2e-3
        )

    def test_deterministic(self, solver, instance):
        a = solver(instance, seed=9)
        b = solver(instance, seed=9)
        np.testing.assert_array_equal(
            np.asarray(a.objective_values), np.asarray(b.objective_values)
        )

    def test_adam(self, solver, instance):
        solution = solver(
            instance,
            post_processor="grad-descent",
            seed=13,
            algorithm_parameters=AdamParameters(
                alpha=0.001, beta1=0.9, beta2=0.999, add_assign=False
            ),
        )
        assert solution.solution_performance["ten_percent"] >= 0.5

    def test_variables_exposed(self, solver, instance):
        solution = solver(instance, seed=4)
        assert set(solution.variables) == {"problem_variables", "mu", "sigma"}
        assert np.asarray(solution.variables["sigma"]).shape == (100, 20)

    def test_device_mismatch(self, solver, instance):
        instance.device = "cuda"
        with pytest.raises(ValueError, match="must match"):
            solver(instance)

    def test_evolution_file(self, solver, instance, tmp_path):
        evo = str(tmp_path / "mf_evo.txt")
        solver.batch_size = 10
        solution = solver(
            instance, evolution_step_size=750, evolution_file=evo, seed=2
        )
        lines = open(evo).read().strip().split("\n")
        # mu block (20 rows) + sigma block (20 rows)
        assert len(lines) == 40
        assert solution.evolution_file == evo


class TestParameterKey:
    def test_invalid(self, solver):
        with pytest.raises(ValueError, match="not valid for this solver"):
            solver.parameter_key = {20: {"pump": 1.0}}
