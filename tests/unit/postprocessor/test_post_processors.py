"""Post-processor unit tests: output types/shapes, pp_time, type guards,
factory dispatch, and energy-descent behaviour for every method."""

import numpy as np
import pytest

from ccvm_tpu.post_processor import PostProcessorFactory
from ccvm_tpu.post_processor.post_processor import MethodType

METHODS = ["grad-descent", "adam", "asgd", "bfgs", "lbfgs"]


@pytest.fixture
def problem():
    rng = np.random.RandomState(5)
    n, batch = 8, 16
    a = rng.uniform(-1, 1, (n, n)).astype(np.float32)
    q = (a + a.T) / 2
    q[np.diag_indices(n)] -= n / 2
    v = rng.uniform(-1, 0, n).astype(np.float32)  # minimization coefficients
    c = rng.uniform(0, 1, (batch, n)).astype(np.float32)
    return c, q, v


def energy(c, q, v):
    return 0.5 * np.einsum("bi,ij,bj->b", c, q, c) + c @ v


class TestFactory:
    @pytest.mark.parametrize("method", METHODS)
    def test_create_valid(self, method):
        pp = PostProcessorFactory.create_postprocessor(method)
        assert hasattr(pp, "postprocess")

    def test_create_invalid(self):
        with pytest.raises(AssertionError, match="not valid"):
            PostProcessorFactory.create_postprocessor("magic")

    def test_method_type_enum(self):
        assert MethodType.GradDescent.value == "grad-descent"


@pytest.mark.parametrize("method", METHODS)
class TestEachMethod:
    def test_shape_preserved(self, method, problem):
        c, q, v = problem
        pp = PostProcessorFactory.create_postprocessor(method)
        out = np.asarray(pp.postprocess(c, q, v))
        assert out.shape == c.shape
        assert np.isfinite(out).all()

    def test_pp_time_positive(self, method, problem):
        c, q, v = problem
        pp = PostProcessorFactory.create_postprocessor(method)
        pp.postprocess(c, q, v)
        assert pp.pp_time > 0

    def test_type_guard(self, method, problem):
        _, q, v = problem
        pp = PostProcessorFactory.create_postprocessor(method)
        with pytest.raises(TypeError, match="must be a tensor"):
            pp.postprocess([[0.1, 0.2]], q, v)


@pytest.mark.parametrize("method", ["grad-descent", "bfgs"])
def test_energy_never_increases(method, problem):
    """Refinement must not worsen the (minimization) energy — the reference's
    integration-test invariant (tests/integration/test_post_processor.py)."""
    c, q, v = problem
    pp = PostProcessorFactory.create_postprocessor(method)
    if method == "bfgs":
        # bfgs maps through c0=0.5(c+1); feed amplitudes in [-1,1]
        c_in = 2 * c - 1
        out = np.asarray(pp.postprocess(c_in, q, v))
        e_in = energy(0.5 * (c_in + 1), q, v)
        e_out = energy(0.5 * (out + 1), q, v)
    else:
        out = np.asarray(pp.postprocess(c, q, v))
        e_in = energy(c, q, v)
        e_out = energy(np.asarray(out), q, v)
    assert (e_out <= e_in + 1e-4).all()
