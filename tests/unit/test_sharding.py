"""Multi-device sharding consistency: a mesh-sharded solve must produce the
same results as the single-device solve (same PRNG keys, same math) — run on
the 8-device virtual CPU platform configured in conftest.py."""

import os

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from ccvm_tpu import LangevinSolver, MFSolver, ProblemInstance

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
TEST020 = os.path.join(DATA, "test020.in")


@pytest.fixture(scope="module")
def mesh():
    devices = np.array(jax.devices())
    assert len(devices) == 8, "conftest should provide 8 virtual devices"
    return Mesh(devices, ("batch",))


def _solve(solver_cls, pkey, mesh, seed, **call_kw):
    solver = solver_cls(device="cpu", batch_size=64, mesh=mesh)
    solver.parameter_key = pkey
    inst = ProblemInstance(instance_type="test", file_path=TEST020, device="cpu")
    inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
    return solver(inst, seed=seed, **call_kw)


LANGEVIN_KEY = {
    20: {"dt": 0.002, "S": 0.5, "iterations": 200, "sigma": 0.5,
         "feedback_scale": 1.0}
}
MF_KEY = {
    20: {"pump": 0.0, "feedback_scale": 4000, "j": 5.0, "S": 20.0,
         "dt": 0.0025, "iterations": 200}
}


def test_langevin_sharded_matches_single_device(mesh):
    sharded = _solve(LangevinSolver, LANGEVIN_KEY, mesh, seed=5)
    single = _solve(LangevinSolver, LANGEVIN_KEY, None, seed=5)
    np.testing.assert_allclose(
        np.asarray(sharded.objective_values),
        np.asarray(single.objective_values),
        rtol=1e-5,
        atol=1e-5,
    )


def test_dl_tensor_parallel_solve_objective_consistent():
    """2-D (batch x model) shard_map solve: the TP-reduced objective must
    equal the objective recomputed from the gathered final state (regression
    for the shard_map kwarg rename — this is the dryrun_multichip path)."""
    import jax.numpy as jnp

    from ccvm_tpu.dynamics.dl import DLParams
    from ccvm_tpu.parallel import dl_sharded_solve, make_mesh

    mesh2d = make_mesh(8, tp=2)
    n, batch = 16, 32
    key = jax.random.PRNGKey(3)
    kq, kv = jax.random.split(key)
    q = jax.random.normal(kq, (n, n), jnp.float32)
    q = 0.5 * (q + q.T)
    v = jax.random.normal(kv, (n,), jnp.float32)
    pump = 8.0
    params = DLParams(
        pump=pump, dt=0.001, iterations=50, noise_ratio=10.0,
        feedback_scale=100.0, g=0.01,
        # S must equal the dynamics' internal saturation S_d = sqrt(pump - 1)
        # (applied when pump > 1) for the objective recompute below to use the
        # same change of variables the solver used.
        S=jnp.sqrt(pump - 1.0),
        lower_limit=0.0, upper_limit=1.0,
    )
    c, s, objval, best = dl_sharded_solve(
        mesh2d, jax.random.PRNGKey(0), q, v, params, batch, iterations=50
    )
    assert c.shape == (batch, n) and objval.shape == (batch,)
    assert np.isfinite(np.asarray(objval)).all()
    # Recompute the objective from the gathered amplitudes on one device.
    span = params.upper_limit - params.lower_limit
    mid = params.upper_limit + params.lower_limit
    x = 0.5 * np.asarray(c) / float(params.S) * span + 0.5 * mid
    qn, vn = np.asarray(q), np.asarray(v)
    expected = 0.5 * np.einsum("bi,ij,bj->b", x, qn, x) + x @ vn
    np.testing.assert_allclose(np.asarray(objval), expected, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(float(best), -expected.min(), rtol=1e-4,
                               atol=1e-4)


def test_mf_sharded_matches_single_device(mesh):
    sharded = _solve(MFSolver, MF_KEY, mesh, seed=6)
    single = _solve(MFSolver, MF_KEY, None, seed=6)
    np.testing.assert_allclose(
        np.asarray(sharded.objective_values),
        np.asarray(single.objective_values),
        rtol=1e-4,
        atol=1e-4,
    )
