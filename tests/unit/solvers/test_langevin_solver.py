"""Langevin solver unit tests: drift golden values (independent numpy
oracle), clamping, change of variables, determinism, and an end-to-end
statistical acceptance test on an exactly-solved instance."""

import os

import numpy as np
import pytest

from ccvm_tpu import AdamParameters, LangevinSolver, ProblemInstance

DATA = os.path.join(os.path.dirname(__file__), "..", "..", "data")
TEST020 = os.path.join(DATA, "test020.in")

PARAMS20 = {
    20: {"dt": 0.002, "S": 0.5, "iterations": 1500, "sigma": 0.5, "feedback_scale": 1.0}
}


@pytest.fixture
def solver():
    s = LangevinSolver(device="cpu", batch_size=100)
    s.parameter_key = PARAMS20
    return s


@pytest.fixture
def instance(solver):
    inst = ProblemInstance(instance_type="test", file_path=TEST020, device="cpu")
    inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
    return inst


class TestParameterKey:
    def test_valid(self, solver):
        assert solver.parameter_key == PARAMS20
        assert solver.is_tuned is False

    def test_invalid_keys(self, solver):
        with pytest.raises(ValueError, match="parameter key is not valid"):
            solver.parameter_key = {20: {"dt": 0.1}}


class TestDriftOracle:
    def test_matches_numpy_formula(self, solver, instance):
        """Drift must equal -((x@Q)+V)*(u-l)/(2S) with x = c*(u-l)/(2S)+(u+l)/2
        (independent numpy evaluation of langevin_solver.py:117-139)."""
        solver.q_matrix = instance.q_matrix
        solver.v_vector = instance.v_vector
        solver.solution_bounds = (0.0, 1.0)
        rng = np.random.RandomState(1)
        c = rng.uniform(-0.5, 0.5, (7, 20)).astype(np.float32)
        S, lo, hi = 0.5, 0.0, 1.0
        got = np.asarray(solver._calculate_drift_boxqp(c, lo, hi, S))
        q = np.asarray(instance.q_matrix)
        v = np.asarray(instance.v_vector)
        x = c * (hi - lo) / (2 * S) + (hi + lo) / 2
        want = -((x @ q) + v) * (hi - lo) / (2 * S)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_grads_equals_drift(self, solver, instance):
        solver.q_matrix = instance.q_matrix
        solver.v_vector = instance.v_vector
        c = np.random.RandomState(2).uniform(-1, 1, (3, 20)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(solver._calculate_grads_boxqp(c, 0, 1, 0.5)),
            np.asarray(solver._calculate_drift_boxqp(c, 0, 1, 0.5)),
        )


class TestHelpers:
    def test_change_variables(self, solver):
        c = np.array([[-0.5, 0.0, 0.5]], np.float32)
        out = np.asarray(solver._change_variables_boxqp(c, 0, 1, 0.5))
        np.testing.assert_allclose(out, [[0.0, 0.5, 1.0]])

    def test_fit_to_constraints(self, solver):
        c = np.array([[-2.0, 0.3, 2.0]], np.float32)
        out = np.asarray(solver._fit_to_constraints_boxqp(c, -0.5, 0.5))
        np.testing.assert_allclose(out, [[-0.5, 0.3, 0.5]])

    def test_scaling_factor(self, solver, instance):
        # get_scaling_factor = sqrt(sum|Q|) * 0.05; instance already scaled,
        # verify on the current matrix directly
        q = np.asarray(instance.q_matrix)
        want = np.sqrt(np.abs(q).sum()) * 0.05
        got = float(solver.get_scaling_factor(instance.q_matrix))
        assert got == pytest.approx(want, rel=1e-5)


class TestSolve:
    def test_device_mismatch_raises(self, solver, instance):
        instance.device = "cuda"
        with pytest.raises(ValueError, match="must match"):
            solver(instance)

    def test_missing_parameter_size(self, solver, instance):
        solver.parameter_key = {
            30: {"dt": 0.002, "S": 0.5, "iterations": 10, "sigma": 0.5,
                 "feedback_scale": 1.0}
        }
        with pytest.raises(KeyError, match="not defined"):
            solver(instance)

    def test_deterministic_given_seed(self, solver, instance):
        s1 = solver(instance, seed=123)
        s2 = solver(instance, seed=123)
        np.testing.assert_array_equal(
            np.asarray(s1.objective_values), np.asarray(s2.objective_values)
        )

    def test_statistical_acceptance(self, solver, instance):
        """On the exactly-solved concave N=20 instance the Langevin solver with
        grad-descent post-processing should solve essentially every
        trajectory to the 0.1% gap (observed 1.0)."""
        solution = solver(instance, post_processor="grad-descent", seed=7)
        assert solution.solution_performance["optimal"] >= 0.95
        assert solution.best_objective_value == pytest.approx(
            instance.optimal_sol, rel=2e-3
        )

    def test_adam_variant(self, solver, instance):
        solution = solver(
            instance,
            post_processor="grad-descent",
            seed=5,
            algorithm_parameters=AdamParameters(
                alpha=0.001, beta1=0.9, beta2=0.999, add_assign=False
            ),
        )
        assert solution.solution_performance["ten_percent"] >= 0.5

    def test_invalid_algorithm_parameters(self, solver, instance):
        with pytest.raises(ValueError, match="not supported"):
            solver(instance, algorithm_parameters="adam")

    def test_output_in_box(self, solver, instance):
        solution = solver(instance, seed=3)
        pv = np.asarray(solution.variables["problem_variables"])
        assert pv.min() >= 0.0 - 1e-6
        assert pv.max() <= 1.0 + 1e-6

    def test_evolution_file(self, solver, instance, tmp_path):
        evo = str(tmp_path / "evo.txt")
        solver.batch_size = 10
        solution = solver(
            instance, evolution_step_size=500, evolution_file=evo, seed=1
        )
        assert solution.evolution_file == evo
        lines = open(evo).read().strip().split("\n")
        # problem_size rows, num_samples columns each
        assert len(lines) == 20
        # samples at iters 0, 500, 1000, 1499 -> buffer is 4 (=1500/500+1)
        assert len(lines[0].split("\t")) >= 4


class TestAsyncTiming:
    """timing="async" drops the mid-pipeline barrier but must produce
    identical Solutions (same work, single end-of-pipeline sync)."""

    def test_async_matches_sync_given_seed(self, instance):
        sync_solver = LangevinSolver(device="cpu", batch_size=100)
        sync_solver.parameter_key = PARAMS20
        async_solver = LangevinSolver(device="cpu", batch_size=100, timing="async")
        async_solver.parameter_key = PARAMS20
        s_sync = sync_solver(instance, seed=11)
        s_async = async_solver(instance, seed=11)
        np.testing.assert_array_equal(
            np.asarray(s_sync.objective_values),
            np.asarray(s_async.objective_values),
        )
        assert s_async.solve_time > 0
        assert s_async.solution_performance == s_sync.solution_performance

    def test_invalid_timing_rejected(self):
        with pytest.raises(ValueError, match="timing"):
            LangevinSolver(device="cpu", batch_size=10, timing="nope")
