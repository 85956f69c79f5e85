"""Base-class behaviour tests (pattern follows the reference's
``test_ccvm_solver.py`` DummyConcreteSolver approach)."""

import numpy as np
import pandas as pd
import pytest

from ccvm_tpu.solvers.base import CCVMSolver


class DummyConcreteSolver(CCVMSolver):
    """Stub all abstract methods to test base-class behaviour."""

    def __init__(self, device):
        super().__init__(device)
        self._scaling_multiplier = 0.1

    def tune(self):
        pass

    def _solve(self):
        pass

    def _solve_adam(self):
        pass

    def _calculate_drift_boxqp(self, **kwargs):
        pass

    def _calculate_grads_boxqp(self, **kwargs):
        pass

    def _change_variables_boxqp(self, **kwargs):
        pass

    def _fit_to_constraints_boxqp(self, **kwargs):
        pass


@pytest.fixture
def solver():
    return DummyConcreteSolver(device="cpu")


class TestConstruction:
    def test_invalid_device(self):
        with pytest.raises(ValueError, match="not available"):
            DummyConcreteSolver(device="hal9000")

    @pytest.mark.parametrize("device", ["cpu", "cuda", "tpu"])
    def test_valid_devices(self, device):
        assert DummyConcreteSolver(device=device).device == device

    def test_initial_state(self, solver):
        assert solver.is_tuned is False
        assert solver.parameter_key is None


class TestScalingFactor:
    def test_value(self, solver):
        q = np.array([[1.0, -2.0], [3.0, -4.0]], np.float32)
        got = float(solver.get_scaling_factor(q))
        assert got == pytest.approx(np.sqrt(10.0) * 0.1, rel=1e-6)


class TestMethodSelector:
    def test_boxqp_binds_methods(self, solver):
        solver._method_selector("boxqp")
        assert solver.calculate_drift == solver._calculate_drift_boxqp
        assert solver.calculate_grads == solver._calculate_grads_boxqp
        assert solver.change_variables == solver._change_variables_boxqp
        assert solver.fit_to_constraints == solver._fit_to_constraints_boxqp

    def test_invalid_category(self, solver):
        with pytest.raises(ValueError, match="not a valid problem category"):
            solver._method_selector("tsp")


class TestMachineDispatch:
    def test_cpu_energy(self, solver):
        df = pd.DataFrame({"solve_time": [2.0]})
        e = solver.machine_energy(machine="cpu")(dataframe=df, problem_size=20)
        assert e == pytest.approx(4.93 * 2.0)

    def test_gpu_energy(self, solver):
        df = pd.DataFrame({"solve_time": [2.0]})
        e = solver.machine_energy(machine="gpu")(dataframe=df, problem_size=20)
        assert e == pytest.approx(28.93 * 2.0)

    def test_cpu_energy_custom_params_missing_key(self, solver):
        with pytest.raises(ValueError, match="cpu_power"):
            solver.machine_energy(machine="cpu", machine_parameters={"x": 1})

    def test_energy_missing_solve_time_column(self, solver):
        df = pd.DataFrame({"other": [1.0]})
        with pytest.raises(ValueError, match="solve_time"):
            solver.machine_energy(machine="cpu")(dataframe=df, problem_size=20)

    def test_dl_machine_on_non_dl_solver_raises(self, solver):
        with pytest.raises(ValueError, match="Mismatch"):
            solver.machine_energy(machine="dl-ccvm")

    def test_invalid_machine(self, solver):
        with pytest.raises(ValueError, match="not valid"):
            solver.machine_energy(machine="quantum")

    def test_cpu_time(self, solver):
        df = pd.DataFrame({"solve_time": [1.0, 2.0, 3.0]})
        t = solver.machine_time(machine="cpu")(dataframe=df)
        assert t == pytest.approx(2.0)

    def test_dataframe_column_validation(self, solver):
        df = pd.DataFrame({"pp_time": [0.1]})
        with pytest.raises(ValueError, match="missing the following columns"):
            solver._validate_machine_energy_dataframe_columns(df)


class TestMachineTimeGoldenValues:
    """Hand-computed golden values from the reference's own test suite
    (``tests/unit/solvers/test_ccvm_solver.py:372-398`` -> 553.0 and
    ``:448-472`` -> 2983.0) — cross-implementation parity of the machine-time
    models."""

    def test_dl_optics_machine_time_golden(self):
        import pandas as pd

        from ccvm_tpu.solvers import DLSolver

        dl = DLSolver(device="cpu")
        mp = {
            "laser_power": 10e-12, "modulators_power": 10e-3,
            "squeezing_power": 180e-3, "electronics_power": 0.0,
            "amplifiers_power": 222.2e-3, "electronics_latency": 1e-9,
            "laser_clock": 9, "postprocessing_power": {20: 4.96},
        }
        f = dl.machine_time(machine="dl-ccvm", machine_parameters=mp)
        df = pd.DataFrame(data={"iterations": [4, 2], "pp_time": [16.0, 10.0]})
        assert f(dataframe=df, problem_size=20) == 553.0

    def test_mf_optics_machine_time_golden(self):
        import pandas as pd

        from ccvm_tpu.solvers import MFSolver

        mf = MFSolver(device="cpu")
        mp = {
            "laser_clock": 2, "FPGA_clock": 5, "FPGA_fixed": 7,
            "FPGA_var_fac": 9, "buffer_time": 15, "FPGA_power": {20: 15.74},
            "laser_power": 1000e-6, "postprocessing_power": {20: 4.87},
        }
        f = mf.machine_time(machine="mf-ccvm", machine_parameters=mp)
        df = pd.DataFrame(data={"iterations": [4, 2], "pp_time": [16.0, 10.0]})
        assert f(dataframe=df, problem_size=20) == 2983.0
