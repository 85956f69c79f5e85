"""Problem-instance tests (strategy mirrors the reference's
``tests/unit/problem_classes/test_problem_instance.py``, with golden values
from our exactly-solved bundled instances)."""

import os

import numpy as np
import pytest

from ccvm_tpu.problem_classes.boxqp import ProblemInstance

DATA = os.path.join(os.path.dirname(__file__), "..", "..", "data")
TEST002 = os.path.join(DATA, "test002.in")
TEST004 = os.path.join(DATA, "test004.in")
TEST020 = os.path.join(DATA, "test020.in")


class TestConstruction:
    def test_defaults(self):
        inst = ProblemInstance()
        assert inst.device == "cpu"
        assert inst.instance_type == "tuning"
        assert inst.problem_size is None
        assert inst.scaled_by == 1

    def test_invalid_instance_type(self):
        with pytest.raises(ValueError, match="tuning or test"):
            ProblemInstance(instance_type="bogus")

    def test_invalid_device(self):
        with pytest.raises(ValueError, match="not available"):
            ProblemInstance(device="quantum")

    def test_custom_name_kept_after_load(self):
        inst = ProblemInstance(name="myname", file_path=TEST002)
        assert inst.name == "myname"

    def test_name_from_file(self):
        inst = ProblemInstance(file_path=TEST002)
        assert inst.name == "test002"

    def test_load_without_path_raises(self):
        inst = ProblemInstance()
        with pytest.raises(Exception, match="No file path"):
            inst.load_instance()


class TestLoadGoldenValues:
    def test_header_metadata(self):
        inst = ProblemInstance(file_path=TEST002)
        assert inst.problem_size == 2
        assert inst.optimal_sol == pytest.approx(2.0)
        assert inst.best_sol == pytest.approx(2.0)
        assert inst.optimality is True
        assert inst.sol_time_gb == pytest.approx(0.01)
        assert inst.num_frac_values == 0

    def test_signs_negated_on_load(self):
        """Files store a maximization problem; loader negates Q and V
        (reference problem_instance.py:181-188)."""
        inst = ProblemInstance(file_path=TEST002)
        np.testing.assert_allclose(
            np.asarray(inst.q_matrix), [[2.0, -1.0], [-1.0, 2.0]]
        )
        np.testing.assert_allclose(np.asarray(inst.v_vector), [-2.0, -1.0])

    def test_solution_vector_parsed(self):
        inst = ProblemInstance(file_path=TEST002)
        assert inst.solution_vector == [1.0, 1.0]

    def test_compute_energy_at_optimum(self):
        """Energy of the stored argmax must equal -optimal (minimization
        convention)."""
        inst = ProblemInstance(file_path=TEST004)
        x = np.asarray(inst.solution_vector)[None, :]
        e = float(inst.compute_energy(x)[0])
        assert e == pytest.approx(-inst.optimal_sol, abs=1e-4)

    def test_compute_energy_batch(self):
        inst = ProblemInstance(file_path=TEST002)
        confs = np.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]], np.float32)
        e = np.asarray(inst.compute_energy(confs))
        # f_min(x) = 0.5 x^T[[2,-1],[-1,2]]x + [-2,-1]x
        np.testing.assert_allclose(e, [0.0, -2.0, -1.25], atol=1e-6)


class TestScaling:
    def test_scale_coefs_divides_and_stacks(self):
        inst = ProblemInstance(file_path=TEST002)
        q0 = np.asarray(inst.q_matrix).copy()
        inst.scale_coefs(2.0)
        inst.scale_coefs(2.0)
        np.testing.assert_allclose(np.asarray(inst.q_matrix), q0 / 4.0)
        assert inst.scaled_by == pytest.approx(4.0)

    def test_energy_invariant_under_scaling(self):
        inst = ProblemInstance(file_path=TEST020)
        confs = np.random.RandomState(0).uniform(0, 1, (5, 20)).astype(np.float32)
        e0 = np.asarray(inst.compute_energy(confs))
        inst.scale_coefs(3.7)
        e1 = np.asarray(inst.compute_energy(confs))
        np.testing.assert_allclose(e0, e1, rtol=1e-5)


class TestSolutionBounds:
    def test_default(self):
        inst = ProblemInstance(file_path=TEST002)
        assert inst.solution_bounds == (0.0, 1.0)

    def test_wrong_length(self):
        with pytest.raises(ValueError, match="tuple of size 2"):
            ProblemInstance(file_path=TEST002, solution_bounds=(0.0, 1.0, 2.0))

    def test_min_ge_max(self):
        with pytest.raises(ValueError, match="less than maximum"):
            ProblemInstance(file_path=TEST002, solution_bounds=(1.0, 0.0))


class TestHostFloat64Energy:
    """compute_energy_host64 — the readout-precision path (round 3)."""

    def _inst(self):
        import os
        from ccvm_tpu import ProblemInstance

        data = os.path.join(
            os.path.dirname(__file__), "..", "..", "data", "test020.in"
        )
        return ProblemInstance(
            instance_type="test", file_path=data, device="cpu"
        )

    def test_matches_device_energy_to_f32_tolerance(self):
        import numpy as np

        inst = self._inst()
        rng = np.random.RandomState(0)
        x = rng.uniform(0, 1, (8, inst.problem_size)).astype(np.float32)
        e32 = np.asarray(inst.compute_energy(x))
        e64 = inst.compute_energy_host64(x)
        assert e64.dtype == np.float64
        np.testing.assert_allclose(e64, e32, rtol=2e-4, atol=1e-3)

    def test_independent_of_scaling(self):
        """The f64 path evaluates ORIGINAL coefficients, so scaling the
        instance must not change its values (compute_energy's scaled_by
        round trip holds only to f32 precision)."""
        import numpy as np

        inst = self._inst()
        rng = np.random.RandomState(1)
        x = rng.uniform(0, 1, (4, inst.problem_size))
        before = inst.compute_energy_host64(x)
        inst.scale_coefs(3.7)
        after = inst.compute_energy_host64(x)
        np.testing.assert_array_equal(before, after)

    def test_leading_batch_dims(self):
        import numpy as np

        inst = self._inst()
        rng = np.random.RandomState(2)
        x = rng.uniform(0, 1, (3, 5, inst.problem_size))
        e = inst.compute_energy_host64(x)
        assert e.shape == (3, 5)
        np.testing.assert_allclose(
            e[1], inst.compute_energy_host64(x[1]), rtol=1e-12
        )


class TestMixedPrecisionReadout:
    """compute_energy_readout64 must yield IDENTICAL Solution statistics to
    the full-transfer compute_energy_host64 path: float64-exact energies on
    every gap-boundary-adjacent row and on the best rows."""

    def _instance(self, tmp_path, seed):
        import numpy as np

        rng = np.random.RandomState(seed)
        n = 16
        a = rng.randn(n, n) * 10
        q = (a + a.T) / 2
        v = rng.randn(n) * 5
        lines = [f"{n}\t{100 + seed:.6f}\t90.0\tTrue\t0.1\t0.1\t0\t0\n"]
        lines.append("\t".join(f"{x:.6f}" for x in v) + "\n")
        for row in q:
            lines.append("\t".join(f"{x:.6f}" for x in row) + "\n")
        path = tmp_path / f"m{seed}.in"
        path.write_text("".join(lines))
        from ccvm_tpu.problem_classes.boxqp import ProblemInstance

        inst = ProblemInstance(
            instance_type="tuning", file_path=str(path), device="cpu"
        )
        return inst

    def test_statistics_identical_to_host64(self, tmp_path):
        import numpy as np

        from ccvm_tpu.solution import Solution

        for seed in range(4):
            inst = self._instance(tmp_path, seed)
            rng = np.random.RandomState(100 + seed)
            confs = rng.uniform(0, 1, (512, 16)).astype(np.float32)
            # plant rows right at gap boundaries: x with energy near
            # optimal*(100/(100+thr)) is not constructible directly, so just
            # rely on the dense random batch + the margin test below.
            e_ref = inst.compute_energy_host64(confs)
            e_mix = inst.compute_energy_readout64(confs)
            kw = dict(
                problem_size=16, batch_size=512, instance_name="m",
                iterations=1, solve_time=0.0, pp_time=0.0,
                optimal_value=inst.optimal_sol, best_value=inst.best_sol,
                num_frac_values=0, solution_vector=None, variables={},
            )
            s_ref = Solution(objective_values=e_ref, **kw)
            s_mix = Solution(objective_values=e_mix, **kw)
            assert s_mix.solution_performance == s_ref.solution_performance
            assert s_mix.best_objective_value == s_ref.best_objective_value

    def test_boundary_rows_are_float64_exact(self, tmp_path):
        import numpy as np

        inst = self._instance(tmp_path, 7)
        rng = np.random.RandomState(9)
        confs = rng.uniform(0, 1, (256, 16)).astype(np.float32)
        e_ref = inst.compute_energy_host64(confs)
        e_mix = inst.compute_energy_readout64(confs, gap_margin=np.inf)
        # with an all-covering margin every row is recomputed in f64
        np.testing.assert_array_equal(e_mix, e_ref)

    def test_no_optimum_falls_back(self, tmp_path):
        import numpy as np

        inst = self._instance(tmp_path, 11)
        inst.optimal_sol = None  # no recorded optimum: margin undefined
        rng = np.random.RandomState(3)
        confs = rng.uniform(0, 1, (32, 16)).astype(np.float32)
        e_ref = inst.compute_energy_host64(confs)
        e_mix = inst.compute_energy_readout64(confs)
        np.testing.assert_allclose(e_mix, e_ref, rtol=1e-5)

    def test_rigorous_margin_recomputes_few_rows(self, tmp_path, monkeypatch):
        """The per-row error-bound margin transfers only ambiguous rows: on
        a spread-out random batch the float64 recheck touches a small
        fraction (plus the top_k block), not the whole batch."""
        import numpy as np

        inst = self._instance(tmp_path, 5)
        rng = np.random.RandomState(4)
        confs = rng.uniform(0, 1, (2048, 16)).astype(np.float32)

        counted = {"rows": 0}
        real = type(inst).compute_energy_host64

        def counting(self_, x):
            x = np.atleast_2d(np.asarray(x))
            counted["rows"] += x.shape[0]
            return real(self_, x)

        monkeypatch.setattr(type(inst), "compute_energy_host64", counting)
        inst.compute_energy_readout64(confs, top_k=64)
        assert counted["rows"] < 2048 // 2, counted


class TestAmbiguousReadoutRows:
    """Mask-logic edges of the shared row-flagging helper."""

    def _rows(self, **kw):
        from ccvm_tpu.problem_classes.boxqp.problem_instance import (
            ambiguous_readout_rows,
        )

        return ambiguous_readout_rows(**kw)

    def test_fixed_margin_flags_rows_near_thresholds(self):
        import numpy as np

        opt = 100.0
        # rows 1/2 sit exactly AT the 0.1% / 1% thresholds (distance 0);
        # row 0 is at gap 0 (distance 0.1 to the nearest threshold) and
        # row 3 at gap 100 — both safely classified at margin 0.05.
        pos = np.array([100.0, 100.0 / 1.001, 100.0 / 1.01, 50.0])
        e = -pos
        near = self._rows(e=e, opt=opt, n=16, gap_margin=0.05, top_k=0)
        assert not near[0] and near[1] and near[2] and not near[3]

    def test_top_k_always_flagged(self):
        import numpy as np

        e = np.linspace(-100.0, -50.0, 32)  # best (most negative) first
        near = self._rows(e=e, opt=1e4, n=8, gap_margin=1e-9, top_k=4)
        assert near[:4].all() and not near[4:].any()

    def test_nonfinite_and_tiny_energies_flagged(self):
        import numpy as np

        e = np.array([-1e-9, np.nan, np.inf, -50.0])
        near = self._rows(e=e, opt=100.0, n=8, gap_margin=1e-9, top_k=0)
        assert near[0] and near[1] and near[2]
        assert not near[3]

    def test_per_row_bound_uses_abs_energy(self):
        import numpy as np

        opt = 100.0
        pos = np.full(4, 100.0 / 1.002)  # gap = 0.2, distance 0.1 to thr 0.1
        e = -pos
        tiny = np.full(4, 1.0)      # tight bound -> not flagged
        huge = np.full(4, 1e7)      # loose bound -> flagged
        assert not self._rows(e=e, opt=opt, n=16, abs_e=tiny, top_k=0).any()
        assert self._rows(e=e, opt=opt, n=16, abs_e=huge, top_k=0).all()
