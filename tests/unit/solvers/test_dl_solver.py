"""DL solver tests: drift oracle vs independent numpy evaluation, pump>1
saturation override, machine models, statistical behaviour."""

import os

import numpy as np
import pandas as pd
import pytest

from ccvm_tpu import AdamParameters, DLSolver, ProblemInstance

DATA = os.path.join(os.path.dirname(__file__), "..", "..", "data")
TEST020 = os.path.join(DATA, "test020.in")

PARAMS20 = {
    20: {
        "pump": 8.0,
        "feedback_scale": 100,
        "dt": 0.001,
        "iterations": 1500,
        "noise_ratio": 10,
    }
}


@pytest.fixture
def solver():
    s = DLSolver(device="cpu", batch_size=100)
    s.parameter_key = PARAMS20
    return s


@pytest.fixture
def instance(solver):
    inst = ProblemInstance(instance_type="test", file_path=TEST020, device="cpu")
    inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
    return inst


def _numpy_dl_drift(c, s, q, v, pump, rate, fs, lo, hi, S):
    """Independent numpy transcription of dl_solver.py:117-172."""
    if pump > 1:
        S = np.sqrt(pump - 1)
    span, mid = hi - lo, hi + lo
    c_pow, s_pow = c**2, s**2
    c1 = 0.25 * ((c * span / S + mid) @ q) * span / S
    c2 = (-1 + pump * rate - c_pow - s_pow) * c
    c3 = v * span / (2 * S)
    s1 = 0.25 * ((s * span / S + mid) @ q) * span / S
    s2 = (-1 - pump * rate - c_pow - s_pow) * s
    fs_dyn = fs * (0.5 + rate)
    return -fs_dyn * (c1 + c3) + c2, -fs_dyn * (s1 + c3) + s2


class TestDrift:
    @pytest.mark.parametrize("pump", [0.5, 8.0])
    def test_matches_numpy(self, solver, instance, pump):
        solver.q_matrix = instance.q_matrix
        solver.v_vector = instance.v_vector
        solver.solution_bounds = (0.0, 1.0)
        rng = np.random.RandomState(0)
        c = rng.uniform(-1, 1, (5, 20)).astype(np.float32)
        s = rng.uniform(-1, 1, (5, 20)).astype(np.float32)
        got_c, got_s = solver._calculate_drift_boxqp(
            c, s, pump, 0.7, 100.0, 0, 1, 1.0
        )
        want_c, want_s = _numpy_dl_drift(
            c, s, np.asarray(instance.q_matrix), np.asarray(instance.v_vector),
            pump, 0.7, 100.0, 0.0, 1.0, 1.0,
        )
        np.testing.assert_allclose(np.asarray(got_c), want_c, rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=2e-4, atol=1e-4)


class TestMachineModels:
    def test_optics_machine_time(self, solver):
        df = pd.DataFrame({"iterations": [1000], "pp_time": [0.5]})
        t = solver.machine_time(machine="dl-ccvm")(dataframe=df, problem_size=20)
        # N * laser_clock * iters + pp = 20 * 10e-12 * 1000 + 0.5
        assert t == pytest.approx(20 * 10e-12 * 1000 + 0.5)

    def test_optics_machine_energy_positive(self, solver):
        df = pd.DataFrame({"iterations": [1000], "pp_time": [0.5]})
        e = solver.machine_energy(machine="dl-ccvm")(dataframe=df, problem_size=20)
        assert e > 0

    def test_mismatched_machine(self, solver):
        with pytest.raises(ValueError, match="Mismatch"):
            solver.machine_time(machine="fpga")

    def test_invalid_machine(self, solver):
        with pytest.raises(ValueError, match="not valid"):
            solver.machine_time(machine="abacus")

    def test_cpu_machine_time(self, solver):
        df = pd.DataFrame({"solve_time": [1.0, 3.0]})
        t = solver.machine_time(machine="cpu")(dataframe=df)
        assert t == pytest.approx(2.0)


class TestSolve:
    def test_matches_reference_statistics(self, solver, instance):
        """The DL result (with its double change-of-variables quirk) should
        land in the same objective range as the reference (~30.65 on this
        instance with these parameters)."""
        solution = solver(instance, seed=21)
        assert 28.0 < solution.best_objective_value < 33.0

    def test_adam_variant_works(self, solver, instance):
        """DL+Adam raises TypeError in the reference (dl_solver.py:906-923);
        ours must work (documented fix)."""
        solution = solver(
            instance,
            seed=22,
            algorithm_parameters=AdamParameters(
                alpha=0.001, beta1=0.9, beta2=0.999, add_assign=False
            ),
        )
        assert np.isfinite(solution.best_objective_value)

    def test_s_quadrature_exposed(self, solver, instance):
        solution = solver(instance, seed=23)
        assert np.asarray(solution.variables["s"]).shape == (100, 20)

    def test_deterministic(self, solver, instance):
        a = solver(instance, seed=31)
        b = solver(instance, seed=31)
        np.testing.assert_array_equal(
            np.asarray(a.objective_values), np.asarray(b.objective_values)
        )

    def test_evolution_file(self, solver, instance, tmp_path):
        evo = str(tmp_path / "dl_evo.txt")
        solver.batch_size = 8
        solver(instance, evolution_step_size=500, evolution_file=evo, seed=1)
        lines = open(evo).read().strip().split("\n")
        assert len(lines) == 40  # c block (20) + s block (20)


class TestParameterKey:
    def test_invalid(self, solver):
        with pytest.raises(ValueError, match="not valid for this solver"):
            solver.parameter_key = {20: {"pump": 1.0, "dt": 0.001}}
