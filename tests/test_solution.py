"""Solution dataclass tests (gap statistics, metadata dict, tensor saving)."""

import numpy as np
import pytest

from ccvm_tpu.solution import Solution


def make_solution(objective_values, optimal_value=100.0, **kw):
    defaults = dict(
        problem_size=4,
        batch_size=len(objective_values),
        instance_name="toy",
        iterations=100,
        objective_values=np.asarray(objective_values, np.float32),
        solve_time=0.5,
        pp_time=0.1,
        optimal_value=optimal_value,
        best_value=optimal_value,
        num_frac_values=0,
        solution_vector=[1, 0, 1, 0],
        variables={"problem_variables": np.zeros((len(objective_values), 4))},
        device="cpu",
    )
    defaults.update(kw)
    return Solution(**defaults)


class TestStats:
    def test_best_objective_value(self):
        # stored objective values are minimization energies; best = max(-E)
        sol = make_solution([-99.0, -100.0, -90.0])
        assert sol.best_objective_value == pytest.approx(100.0)

    def test_gap_fractions(self):
        # gaps vs optimal=100: values 100 (0%), 99 (1.0101%), 95, 50
        sol = make_solution([-100.0, -99.0, -95.0, -50.0])
        perf = sol.solution_performance
        assert perf["optimal"] == pytest.approx(0.25)
        assert perf["one_percent"] == pytest.approx(0.25)
        assert perf["two_percent"] == pytest.approx(0.5)
        assert perf["ten_percent"] == pytest.approx(0.75)

    def test_all_optimal(self):
        sol = make_solution([-100.0] * 5)
        assert sol.solution_performance["optimal"] == 1.0

    def test_rounding_to_four_digits(self):
        sol = make_solution([-100.0] + [-50.0] * 2)
        assert sol.solution_performance["optimal"] == pytest.approx(
            round(1 / 3, 4)
        )


class TestMetadata:
    def test_excludes_array_fields(self):
        sol = make_solution([-1.0, -2.0])
        md = sol.get_metadata_dict()
        assert "objective_values" not in md
        assert "variables" not in md
        assert md["instance_name"] == "toy"
        assert md["solution_performance"]["optimal"] >= 0

    def test_metadata_json_serializable(self):
        import json

        sol = make_solution([-1.0, -2.0])
        json.dumps(sol.get_metadata_dict())


class TestSaveTensor:
    def test_save_and_reload(self, tmp_path):
        sol = make_solution([-1.0, -2.0])
        sol.save_tensor_to_file("problem_variables", str(tmp_path))
        loaded = np.load(tmp_path / "problem_variables.npy")
        assert loaded.shape == (2, 4)

    def test_missing_tensor_name(self, tmp_path):
        sol = make_solution([-1.0])
        with pytest.raises(Exception, match="Cannot find"):
            sol.save_tensor_to_file("nonexistent", str(tmp_path))

    def test_non_tensor_value(self, tmp_path):
        sol = make_solution([-1.0])
        sol.variables["not_array"] = 42
        with pytest.raises(Exception, match="cannot be obtained"):
            sol.save_tensor_to_file("not_array", str(tmp_path))
