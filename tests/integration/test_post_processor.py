"""Integration: every post-processor improves (or preserves) the energy of
real solver output on a real instance, and produces NaN/Inf-free results —
the reference's integration-test invariant
(``tests/integration/test_post_processor.py:45-157``)."""

import os

import numpy as np
import pytest

from ccvm_tpu import LangevinSolver, ProblemInstance
from ccvm_tpu.post_processor import PostProcessorFactory

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
TEST020 = os.path.join(DATA, "test020.in")


@pytest.fixture(scope="module")
def solved():
    solver = LangevinSolver(device="cpu", batch_size=50)
    solver.parameter_key = {
        20: {"dt": 0.002, "S": 0.5, "iterations": 300, "sigma": 0.5,
             "feedback_scale": 1.0}
    }
    inst = ProblemInstance(instance_type="test", file_path=TEST020, device="cpu")
    inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
    solution = solver(inst, seed=99)
    c = np.asarray(solution.variables["problem_variables"])
    return c, inst


@pytest.mark.parametrize("method", ["grad-descent", "adam", "asgd", "lbfgs"])
def test_energy_monotone_on_real_instance(method, solved):
    c, inst = solved
    pp = PostProcessorFactory.create_postprocessor(method)
    out = np.asarray(pp.postprocess(c, inst.q_matrix, inst.v_vector))
    e_in = np.asarray(inst.compute_energy(c))
    e_out = np.asarray(inst.compute_energy(out))
    assert np.isfinite(e_out).all()
    assert (e_out <= e_in + 1e-3).all()


def test_bfgs_on_real_instance(solved):
    c, inst = solved
    pp = PostProcessorFactory.create_postprocessor("bfgs")
    c_in = 2 * c - 1  # bfgs convention maps 0.5(c+1) in and 2(x-0.5) out
    out = np.asarray(pp.postprocess(c_in, inst.q_matrix, inst.v_vector))
    x = 0.5 * (out + 1)
    e_in = np.asarray(inst.compute_energy(c))
    e_out = np.asarray(inst.compute_energy(x))
    assert np.isfinite(e_out).all()
    assert (e_out <= e_in + 1e-3).all()
