"""Generalised DL pump ramp (TPU-native extension; reference has only the
linear ramp, ``dl_solver.py:524``).

Contract: ``pump_ramp=None`` or ``(1.0, 1.0)`` must be bit-identical to the
reference-exact linear schedule (and stay kernel-eligible); other shapes bend
the ramp as rate(i) = min((i+1)/(fraction*T), 1)**power.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ccvm_tpu import DLSolver, ProblemInstance
from ccvm_tpu.dynamics import dl as dyn

INSTANCE = (
    "examples/benchmarking_instances/single_test_instance/tuningH020-100-0.in"
)


def _solver(batch=32, iters=120):
    s = DLSolver("cpu", batch_size=batch)
    s.parameter_key = {
        20: {"pump": 8.0, "dt": 0.001, "iterations": iters,
             "noise_ratio": 10, "feedback_scale": 100}
    }
    return s


def _params(ramp_power=None, ramp_fraction=None, iterations=1000.0):
    return dyn.DLParams(
        pump=np.float32(8.0), S=np.float32(1.0), dt=np.float32(0.001),
        noise_ratio=np.float32(10.0), feedback_scale=np.float32(100.0),
        g=np.float32(0.05), lower_limit=np.float32(0.0),
        upper_limit=np.float32(1.0), iterations=np.float32(iterations),
        ramp_power=ramp_power, ramp_fraction=ramp_fraction,
    )


def test_schedule_math():
    p = _params(ramp_power=np.float32(2.0), ramp_fraction=np.float32(0.5))
    # (i+1)/T = 0.25 -> min(.25/.5, 1)^2 = 0.25; at and past the knee -> 1.
    assert np.isclose(dyn.pump_rate_schedule(p, jnp.float32(249.0), True), 0.25)
    assert np.isclose(dyn.pump_rate_schedule(p, jnp.float32(499.0), True), 1.0)
    assert np.isclose(dyn.pump_rate_schedule(p, jnp.float32(899.0), True), 1.0)
    # pump_rate_flag=False bypasses the ramp entirely.
    assert np.isclose(dyn.pump_rate_schedule(p, jnp.float32(10.0), False), 1.0)
    # default fields reproduce the reference's linear expression exactly
    d = _params()
    i = jnp.float32(137.0)
    assert float(dyn.pump_rate_schedule(d, i, True)) == float((i + 1.0) / 1000.0)


def test_identity_ramp_is_bit_identical_and_kernel_eligible():
    inst = ProblemInstance(file_path=INSTANCE, device="cpu")
    s = _solver()
    base = s(inst, seed=11)
    ident = s(inst, seed=11, pump_ramp=(1.0, 1.0))
    assert np.array_equal(
        np.asarray(base.objective_values), np.asarray(ident.objective_values)
    )
    # (1.0, 1.0) must normalise to the default (None) fields so the fused
    # kernel stays eligible on TPU.
    p = s._make_params(8.0, 1.0, 0.001, 10, 100, 0.05, 100,
                       pump_ramp=(1.0, 1.0))
    assert p.ramp_power is None and p.ramp_fraction is None


def test_nondefault_ramp_changes_dynamics_and_is_finite():
    inst = ProblemInstance(file_path=INSTANCE, device="cpu")
    s = _solver()
    base = s(inst, seed=11)
    bent = s(inst, seed=11, pump_ramp=(2.0, 0.7))
    a = np.asarray(base.objective_values)
    b = np.asarray(bent.objective_values)
    assert not np.array_equal(a, b)
    assert np.all(np.isfinite(b))


def test_ramp_with_adam_variant_runs():
    from ccvm_tpu.solvers.algorithms import AdamParameters

    inst = ProblemInstance(file_path=INSTANCE, device="cpu")
    s = _solver(batch=16, iters=60)
    sol = s(inst, seed=3, pump_ramp=(0.5, 0.8),
            algorithm_parameters=AdamParameters(alpha=0.1))
    assert np.all(np.isfinite(np.asarray(sol.objective_values)))


def test_invalid_ramp_raises():
    inst = ProblemInstance(file_path=INSTANCE, device="cpu")
    s = _solver(batch=8, iters=20)
    with pytest.raises(ValueError, match="fraction"):
        s(inst, pump_ramp=(1.0, 0.0))
    with pytest.raises(ValueError, match="power"):
        s(inst, pump_ramp=(-1.0, 1.0))
