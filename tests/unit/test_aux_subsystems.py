"""Tests for the auxiliary subsystems the reference lacks entirely
(SURVEY.md section 5): checkpoint/resume, profiling counters, multi-host
helpers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvm_tpu import checkpoint, profiling
from ccvm_tpu.dynamics import langevin as lgv
from ccvm_tpu.dynamics import dl as dldyn

N = 8
BATCH = 4
ITERS = 40


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(0)
    a = rng.randn(N, N).astype(np.float32)
    return jnp.asarray((a + a.T) / 2), jnp.asarray(
        rng.randn(N).astype(np.float32)
    )


def _lgv_params():
    return lgv.LangevinParams(
        S=jnp.float32(0.5), dt=jnp.float32(0.02), sigma=jnp.float32(0.5),
        feedback_scale=jnp.float32(1.0), lower_limit=jnp.float32(0.0),
        upper_limit=jnp.float32(1.0),
    )


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        state = (jnp.ones((3, 4)), jnp.zeros((3, 4)))
        path = str(tmp_path / "ck.npz")
        checkpoint.save_state(path, state, iteration=17, meta={"tag": "x"})
        loaded, it, meta = checkpoint.load_state(path, like=state)
        assert it == 17
        assert meta["tag"] == "x"
        np.testing.assert_array_equal(loaded[0], state[0])
        np.testing.assert_array_equal(loaded[1], state[1])

    def test_checkpointed_equals_uninterrupted(self, problem, tmp_path):
        """Snapshot/resume must be bit-identical to one straight solve (keys
        fold from absolute iteration indices)."""
        q, v = problem
        key = jax.random.PRNGKey(0)
        p = _lgv_params()
        straight = lgv.solve(key, q, v, p, iterations=ITERS, batch_size=BATCH)

        init = jnp.zeros((BATCH, N), jnp.float32)
        path = str(tmp_path / "lgv.npz")
        final = checkpoint.checkpointed_solve(
            lgv.solve_segment, key, q, v, p, init, ITERS, every=7, path=path
        )
        np.testing.assert_array_equal(np.asarray(final), np.asarray(straight))

    def test_resume_after_interruption(self, problem, tmp_path):
        q, v = problem
        key = jax.random.PRNGKey(1)
        p = _lgv_params()
        init = jnp.zeros((BATCH, N), jnp.float32)
        path = str(tmp_path / "lgv.npz")

        # "Crash" after 16 of 40 iterations...
        checkpoint.checkpointed_solve(
            lgv.solve_segment, key, q, v, p, init, 16, every=8, path=path
        )
        _, it, _ = checkpoint.load_state(path, like=init)
        assert it == 16
        # ...then resume to completion in a fresh call.
        final = checkpoint.checkpointed_solve(
            lgv.solve_segment, key, q, v, p, init, ITERS, every=8, path=path
        )
        straight = lgv.solve(key, q, v, p, iterations=ITERS, batch_size=BATCH)
        np.testing.assert_array_equal(np.asarray(final), np.asarray(straight))

    def test_dl_tuple_state(self, problem, tmp_path):
        """Pytree (c, s) states checkpoint and resume too; the final clamp is
        applied after the loop like dl.solve does."""
        q, v = problem
        key = jax.random.PRNGKey(2)
        p = dldyn.DLParams(
            pump=jnp.float32(2.0), S=jnp.float32(1.0), dt=jnp.float32(0.01),
            noise_ratio=jnp.float32(10.0), feedback_scale=jnp.float32(10.0),
            g=jnp.float32(0.05), lower_limit=jnp.float32(0.0),
            upper_limit=jnp.float32(1.0), iterations=jnp.float32(ITERS),
        )
        z = jnp.zeros((BATCH, N), jnp.float32)
        path = str(tmp_path / "dl.npz")
        c_fin, s_fin = checkpoint.checkpointed_solve(
            dldyn.solve_segment, key, q, v, p, (z, z), ITERS, every=9,
            path=path, pump_rate_flag=True, pump_is_gt_one=True,
        )
        c_fin = jnp.clip(c_fin, -p.S, p.S)
        c_ref, s_ref = dldyn.solve(
            key, q, v, p, iterations=ITERS, batch_size=BATCH,
            pump_rate_flag=True, pump_is_gt_one=True,
        )
        np.testing.assert_array_equal(np.asarray(c_fin), np.asarray(c_ref))
        np.testing.assert_array_equal(np.asarray(s_fin), np.asarray(s_ref))

    def test_atomic_write_leaves_no_tmp(self, tmp_path):
        path = str(tmp_path / "ck.npz")
        checkpoint.save_state(path, jnp.ones(3), iteration=1)
        assert os.path.exists(path)
        assert not os.path.exists(path + ".tmp")


class TestProfiling:
    def test_solve_rate_counters(self):
        class Sol:
            solve_time = 0.001  # per-batch normalized
            batch_size = 100
            iterations = 1000

        rates = profiling.solve_rate(Sol(), num_chips=4)
        assert rates["iterations_per_sec"] == pytest.approx(1000 / 0.1)
        assert rates["trajectory_iterations_per_sec"] == pytest.approx(1e6)
        assert rates["trajectory_iterations_per_sec_per_chip"] == pytest.approx(
            2.5e5
        )

    def test_timer_normalizes_by_batch(self):
        timer = profiling.Timer(batch_size=10)
        out, per_batch = timer(lambda: jnp.ones(4))
        assert per_batch == pytest.approx(timer.elapsed / 10)
        assert out.shape == (4,)

    def test_annotate_contextmanager(self):
        with profiling.annotate("test-region"):
            jnp.ones(2).block_until_ready()

    def test_trace_writes_files(self, tmp_path):
        with profiling.trace(str(tmp_path / "trace")):
            jax.jit(lambda x: x * 2)(jnp.ones(8)).block_until_ready()
        assert any((tmp_path / "trace").rglob("*"))


class TestMultihost:
    def test_single_process_helpers(self):
        from ccvm_tpu.parallel import multihost

        assert multihost.is_coordinator()
        mesh = multihost.global_batch_mesh()
        assert mesh.axis_names == ("batch",)
        assert mesh.size == jax.device_count()

    def test_local_shard_bounds_cover_everything(self):
        from ccvm_tpu.parallel import multihost

        start, end = multihost.local_shard_bounds(13)
        assert (start, end) == (0, 13)  # single process owns all

    def test_initialize_is_safe_single_process(self):
        from ccvm_tpu.parallel import multihost

        multihost.initialize()  # must not raise without a coordinator


class TestRunResilient:
    """Failure-tolerant sweep work loop (ccvm_tpu.parallel.multihost)."""

    def test_all_succeed(self):
        from ccvm_tpu.parallel.multihost import run_resilient

        results, failures = run_resilient([1, 2, 3], lambda x: x * 10)
        assert results == {0: 10, 1: 20, 2: 30}
        assert failures == {}

    def test_transient_failure_requeues(self):
        from ccvm_tpu.parallel.multihost import run_resilient

        attempts = {}

        def flaky(x):
            attempts[x] = attempts.get(x, 0) + 1
            if x == 2 and attempts[x] < 3:
                raise RuntimeError("transient")
            return x

        results, failures = run_resilient([1, 2, 3], flaky, max_attempts=3)
        assert results == {0: 1, 1: 2, 2: 3}
        assert failures == {}
        assert attempts[2] == 3  # re-queued twice, succeeded third time

    def test_permanent_failure_reported(self):
        from ccvm_tpu.parallel.multihost import run_resilient

        seen = []

        def bad(x):
            if x == "b":
                raise ValueError("always broken")
            return x.upper()

        results, failures = run_resilient(
            ["a", "b"], bad, max_attempts=2,
            on_failure=lambda item, exc, att: seen.append((item, att)),
        )
        assert results == {0: "A"}
        assert list(failures) == [1]
        assert isinstance(failures[1], ValueError)
        assert seen == [("b", 1), ("b", 2)]
