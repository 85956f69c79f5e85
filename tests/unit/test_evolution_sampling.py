"""In-jit evolution sampling must be bit-identical to the segmented driver.

``scan_steps_segmented`` replaces the per-segment host loop (VERDICT round 2
item 7): same per-iteration key derivation, same step functions, so every
sample and the final state must match ``solve_segment`` chaining exactly.
"""

import jax
import numpy as np
import pytest

from ccvm_tpu.dynamics import dl as dyn_dl
from ccvm_tpu.dynamics import langevin as dyn_langevin
from ccvm_tpu.dynamics import mf as dyn_mf
from ccvm_tpu.dynamics import pumped_langevin as dyn_pumped
from ccvm_tpu.dynamics.dl import DLParams
from ccvm_tpu.dynamics.langevin import LangevinParams
from ccvm_tpu.dynamics.mf import MFParams
from ccvm_tpu.dynamics.pumped_langevin import PumpedLangevinParams

N, BATCH = 12, 16
SEGMENTS = [1, 7, 7, 7, 4]  # sums to 26 iterations, uneven tail


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(7)
    off = rng.normal(0, 28.7 / np.sqrt(N), (N, N))
    q = np.triu(off, 1)
    q = q + q.T
    np.fill_diagonal(q, rng.normal(0, 57.4 / np.sqrt(N), N))
    v = rng.normal(0, 21, N)
    import jax.numpy as jnp

    return jnp.asarray(q, jnp.float32), jnp.asarray(v, jnp.float32)


def _chain_segments(dyn, key, q, v, params, state, **kw):
    samples = []
    start = 0
    for seg in SEGMENTS:
        state = dyn.solve_segment(key, q, v, params, state, start, num=seg, **kw)
        samples.append(state)
        start += seg
    return state, samples


def test_langevin_sampled_bit_identical(problem):
    import jax.numpy as jnp

    q, v = problem
    p = LangevinParams(
        S=np.float32(0.5), dt=np.float32(0.002), sigma=np.float32(0.5),
        feedback_scale=np.float32(1.0), lower_limit=np.float32(0),
        upper_limit=np.float32(1),
    )
    key = jax.random.PRNGKey(11)
    c, samples = dyn_langevin.solve_sampled(
        key, q, v, p, np.asarray(SEGMENTS, np.int32), batch_size=BATCH
    )
    c0 = jnp.zeros((BATCH, N), jnp.float32)
    c_ref, ref_samples = _chain_segments(dyn_langevin, key, q, v, p, c0)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))
    for k in range(len(SEGMENTS)):
        np.testing.assert_array_equal(
            np.asarray(samples[k]), np.asarray(ref_samples[k])
        )


def test_pumped_sampled_bit_identical(problem):
    import jax.numpy as jnp

    q, v = problem
    p = PumpedLangevinParams(
        pump=np.float32(2.0), S=np.float32(0.5), dt=np.float32(0.002),
        sigma=np.float32(0.5), feedback_scale=np.float32(1.0),
        lower_limit=np.float32(0), upper_limit=np.float32(1),
        iterations=np.float32(sum(SEGMENTS)),
    )
    key = jax.random.PRNGKey(12)
    c, samples = dyn_pumped.solve_sampled(
        key, q, v, p, np.asarray(SEGMENTS, np.int32), batch_size=BATCH
    )
    c0 = jnp.zeros((BATCH, N), jnp.float32)
    c_ref, ref_samples = _chain_segments(dyn_pumped, key, q, v, p, c0)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))
    np.testing.assert_array_equal(
        np.asarray(samples[-1]), np.asarray(ref_samples[-1])
    )


def test_dl_sampled_bit_identical(problem):
    import jax.numpy as jnp

    q, v = problem
    p = DLParams(
        pump=np.float32(8.0), S=jnp.sqrt(jnp.float32(7.0)),
        dt=np.float32(0.001), noise_ratio=np.float32(10),
        feedback_scale=np.float32(100), g=np.float32(0.01),
        lower_limit=np.float32(0), upper_limit=np.float32(1),
        iterations=np.float32(sum(SEGMENTS)),
    )
    key = jax.random.PRNGKey(13)
    (c, s), (c_samp, s_samp) = dyn_dl.solve_sampled(
        key, q, v, p, np.asarray(SEGMENTS, np.int32), batch_size=BATCH,
        pump_is_gt_one=True,
    )
    z = jnp.zeros((BATCH, N), jnp.float32)
    state, ref_samples = _chain_segments(
        dyn_dl, key, q, v, p, (z, z), pump_is_gt_one=True
    )
    c_ref = jnp.clip(state[0], -p.S, p.S)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(state[1]))
    for k in range(len(SEGMENTS)):
        np.testing.assert_array_equal(
            np.asarray(c_samp[k]), np.asarray(ref_samples[k][0])
        )
        np.testing.assert_array_equal(
            np.asarray(s_samp[k]), np.asarray(ref_samples[k][1])
        )


def test_mf_sampled_bit_identical(problem):
    import jax.numpy as jnp

    q, v = problem
    p = MFParams(
        pump=np.float32(0.0), S=np.float32(20.0), dt=np.float32(0.0025),
        j=np.float32(5.0), feedback_scale=np.float32(4000),
        g=np.float32(0.001), lower_limit=np.float32(0),
        upper_limit=np.float32(1), iterations=np.float32(sum(SEGMENTS)),
    )
    key = jax.random.PRNGKey(14)
    (mu, mu_tilde, sigma), (mu_samp, sg_samp) = dyn_mf.solve_sampled(
        key, q, v, p, np.asarray(SEGMENTS, np.int32), batch_size=BATCH
    )
    z = jnp.zeros((BATCH, N), jnp.float32)
    state, ref_samples = _chain_segments(
        dyn_mf, key, q, v, p, (z, jnp.full_like(z, 0.5), z)
    )
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(state[0]))
    np.testing.assert_array_equal(
        np.asarray(mu_tilde),
        np.asarray(jnp.clip(state[2], -p.S, p.S)),
    )
    for k in range(len(SEGMENTS)):
        np.testing.assert_array_equal(
            np.asarray(mu_samp[k]), np.asarray(ref_samples[k][0])
        )
        np.testing.assert_array_equal(
            np.asarray(sg_samp[k]), np.asarray(ref_samples[k][1])
        )


def test_facade_evolution_single_dispatch(problem, tmp_path):
    """Facade evolution path produces a well-formed evolution file."""
    import os

    from ccvm_tpu import LangevinSolver, ProblemInstance

    data = os.path.join(os.path.dirname(__file__), "..", "data", "test020.in")
    solver = LangevinSolver(device="cpu", batch_size=8)
    solver.parameter_key = {
        20: {"dt": 0.002, "S": 0.5, "iterations": 40, "sigma": 0.5,
             "feedback_scale": 1.0}
    }
    inst = ProblemInstance(instance_type="test", file_path=data, device="cpu")
    evo = str(tmp_path / "evo.txt")
    solution = solver(inst, evolution_step_size=10, evolution_file=evo, seed=3)
    assert solution.evolution_file == evo
    lines = [ln for ln in open(evo).read().splitlines() if ln.strip()]
    assert len(lines) == 20  # problem_size rows of samples
    # num_samples columns each (0,10,20,30 + final 39)
    assert all(len(ln.split("\t")) >= 5 for ln in lines)

def test_facade_sample_stack_stays_on_device(tmp_path):
    """The per-batch evolution sample stack is a device array, not a host
    buffer: at the headline batch 65536 the old np.zeros staging buffer was
    ~300 MB of host RAM (VERDICT round 3 item 6).  Only the best row's
    (n, num_samples) slice is transferred when the file is written."""
    from ccvm_tpu.problem_classes.boxqp import ProblemInstance
    from ccvm_tpu.solvers import LangevinSolver

    n = 8
    rng = np.random.RandomState(0)
    a = rng.randn(n, n)
    q = (a + a.T) / 2
    v = rng.randn(n)
    lines = [f"{n}\t10.0\t9.0\t90.0\t0.1\t0.1\t0\t0\n"]
    lines.append("\t".join(f"{x:.6f}" for x in v) + "\n")
    for row in q:
        lines.append("\t".join(f"{x:.6f}" for x in row) + "\n")
    path = tmp_path / "t.in"
    path.write_text("".join(lines))
    inst = ProblemInstance(
        instance_type="tuning", file_path=str(path), device="cpu"
    )

    solver = LangevinSolver(device="cpu", batch_size=16, backend="lax")
    solver.parameter_key = {
        n: {"dt": 0.002, "S": 0.5, "iterations": 26, "sigma": 0.5,
            "feedback_scale": 1.0}
    }
    inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))
    evo = tmp_path / "evo.txt"
    solver(inst, evolution_step_size=7, evolution_file=str(evo), seed=0)
    assert isinstance(solver.c_sample, jax.Array)
    assert not isinstance(solver.c_sample, np.ndarray)
    # padded like the reference's buffer: num_samples columns
    assert solver.c_sample.shape == (16, n, 5)
    assert evo.exists() and evo.stat().st_size > 0
