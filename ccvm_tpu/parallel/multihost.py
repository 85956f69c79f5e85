"""Multi-host (pod-slice) runtime helpers.

The reference is strictly single-process (no torch.distributed/NCCL/MPI
anywhere — SURVEY.md section 2.7).  TPU-natively, multi-host scaling is:
``jax.distributed.initialize()`` once per host process, a global mesh over
every chip in the slice, batch/instance axes sharded over it, and XLA placing
the (tiny) final reductions on ICI within a slice and DCN across slices.
Host 0 writes Solution/Metadata artifacts.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize the JAX distributed runtime (idempotent).

    On Cloud TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for other launchers.  Must be called before any jax
    computation in every host process.
    """
    global _initialized
    if _initialized:
        return
    try:
        # NOTE: must run before anything initializes the XLA backend — even
        # jax.process_count() counts, so no backend queries happen first.
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        logger.info(
            "jax.distributed initialized: process %d/%d, %d local / %d global devices",
            jax.process_index(),
            jax.process_count(),
            jax.local_device_count(),
            jax.device_count(),
        )
    except (RuntimeError, ValueError) as e:
        if "must be called before" in str(e) and jax.process_count() > 1:
            # Already initialized by the launcher — idempotent success.
            _initialized = True
            return
        if coordinator_address is not None or num_processes is not None:
            # The caller explicitly configured a pod run; degrading to one
            # host here would silently compute 1/N of the sweep.
            raise RuntimeError(
                "jax.distributed.initialize failed for the explicitly "
                f"configured pod run (coordinator={coordinator_address!r}, "
                f"num_processes={num_processes!r}): {e}"
            ) from e
        # Auto-detect found no pod environment: single-process runs (tests,
        # one-chip benches) land here and that is fine.
        logger.info("jax.distributed not initialized (%s); single-process run", e)


def is_coordinator() -> bool:
    """True on the host that should write metadata/plots (process 0)."""
    return jax.process_index() == 0


def global_batch_mesh():
    """1-D "batch" mesh over every chip in the slice (all hosts)."""
    from ccvm_tpu.parallel.mesh import make_batch_mesh

    return make_batch_mesh(devices=jax.devices())


def local_shard_bounds(total: int) -> tuple[int, int]:
    """[start, end) rows of a length-``total`` globally sharded axis owned by
    this host — for host-side work distribution (e.g. which instance files
    this process loads in a multi-host benchmark sweep)."""
    per = -(-total // jax.process_count())
    start = min(per * jax.process_index(), total)
    return start, min(start + per, total)


def run_resilient(items, fn, *, max_attempts=3, on_failure=None):
    """Failure-tolerant work loop for benchmark sweeps (SURVEY.md section 5).

    Runs ``fn(item)`` for every work item; an item whose attempt raises is
    re-queued at the back (up to ``max_attempts`` attempts each) so one bad
    solve — a transient device error, an OOM on an oversized stacked batch, a
    compile failure for an odd shape — doesn't abort a multi-hour sweep.

    Scope (honest limits): this recovers *per-item* failures within a live
    process.  Losing a whole host in a multi-host run kills the collective
    runtime itself; recovery there is restart + :mod:`ccvm_tpu.checkpoint`
    resume, not re-queuing.

    Args:
        items: iterable of hashable-by-index work items.
        fn: ``fn(item) -> result``; exceptions mark the attempt failed.
        max_attempts: attempts per item before it lands in ``failures``.
        on_failure: optional ``on_failure(item, exc, attempt)`` callback.
            Returning ``False`` cancels further attempts for that item —
            use it to classify deterministic failures (a shape-dependent
            compile error, an OOM at a fixed batch) whose retries would
            burn the tail of the sweep on guaranteed re-failures.

    Returns:
        (results, failures): ``results[i]`` is ``fn(items[i])`` for items that
        succeeded; ``failures[i]`` is the last exception for items that
        exhausted their attempts.  Indices refer to the input order.
    """
    queue = [(i, item, 1) for i, item in enumerate(items)]
    results, failures = {}, {}
    while queue:
        idx, item, attempt = queue.pop(0)
        try:
            results[idx] = fn(item)
        except Exception as exc:  # noqa: BLE001 — any solve failure re-queues
            retry = True
            if on_failure is not None and on_failure(item, exc, attempt) is False:
                retry = False
            logger.warning(
                "work item %d failed (attempt %d/%d%s): %s",
                idx, attempt, max_attempts,
                "" if retry else ", cancelled by on_failure", exc,
            )
            if retry and attempt < max_attempts:
                queue.append((idx, item, attempt + 1))
            else:
                failures[idx] = exc
    return results, failures
