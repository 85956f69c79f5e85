"""Profiling and observability hooks.

The reference's only instrumentation is ``time.time()`` spans divided by the
batch size (``dl_solver.py:851,929-933``) plus tqdm bars in post-processors —
no tracing of any kind (SURVEY.md section 5).  Here the same solve_time/pp_time
semantics are kept on the Solution object, and this module adds what a TPU
deployment actually needs:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of the XLA/Pallas execution;
* :func:`annotate` — named trace regions visible in the profile timeline;
* :func:`solve_rate` — iterations/s and trajectory-iterations/s/chip counters
  from a finished Solution.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace for everything inside the ``with`` block.

    Usage::

        with ccvm_tpu.profiling.trace("/tmp/ccvm-trace"):
            solution = solver(instance, seed=0)

    View with TensorBoard's profile plugin (or pass
    ``create_perfetto_link=True`` for a Perfetto URL).
    """
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Wrote jax profiler trace to %s", log_dir)


def annotate(name: str):
    """Named region in the profiler timeline (``jax.profiler.TraceAnnotation``)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Wall-clock span with the reference's per-batch normalization semantics.

    ``Timer(batch_size)(fn, *args)`` returns ``(result, per_batch_seconds)``,
    matching how the reference divides solve_time by batch size
    (``dl_solver.py:929-933``).
    """

    def __init__(self, batch_size: int = 1):
        self.batch_size = batch_size
        self.elapsed = 0.0

    def __call__(self, fn, *args, **kwargs):
        import jax

        start = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kwargs))
        self.elapsed = time.perf_counter() - start
        return out, self.elapsed / self.batch_size


def solve_rate(solution, num_chips: int = 1) -> dict:
    """Throughput counters for a finished Solution.

    Returns a dict with:
      * ``iterations_per_sec`` — SDE steps per wall second,
      * ``trajectory_iterations_per_sec`` — steps x batch per wall second,
      * ``trajectory_iterations_per_sec_per_chip`` — the BASELINE.json metric.

    ``solution.solve_time`` is per-batch-normalized (reference semantics), so
    the raw wall time is ``solve_time * batch_size``.
    """
    wall = solution.solve_time * solution.batch_size
    if wall <= 0:
        return {
            "iterations_per_sec": float("inf"),
            "trajectory_iterations_per_sec": float("inf"),
            "trajectory_iterations_per_sec_per_chip": float("inf"),
        }
    it_rate = solution.iterations / wall
    traj_rate = it_rate * solution.batch_size
    return {
        "iterations_per_sec": it_rate,
        "trajectory_iterations_per_sec": traj_rate,
        "trajectory_iterations_per_sec_per_chip": traj_rate / max(num_chips, 1),
    }
