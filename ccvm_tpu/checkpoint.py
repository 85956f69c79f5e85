"""Checkpoint / resume for long SDE solves.

The reference has NO solver-state checkpointing: a crashed solve loses
everything (SURVEY.md section 5 "Checkpoint / resume"); its only persistence
artifacts are evolution-file dumps and ``Solution.save_tensor_to_file``.  Here
the scan carry (the full SDE state pytree, including Adam moments when the
Adam variant runs) snapshots to a ``.npz`` every K iterations and a restarted
process resumes from the last snapshot — the dynamics' ``solve_segment``
functions integrate ``[start, start+num)`` with the per-iteration PRNG key
folded from the absolute iteration index, so a resumed solve is bit-identical
to an uninterrupted one.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_state(path: str, state, iteration: int, meta: dict | None = None):
    """Snapshot a state pytree + iteration counter to ``path`` (.npz).

    Atomic: writes to ``path + '.tmp'`` then renames, so a crash mid-write
    never corrupts the previous snapshot.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    payload["__meta__"] = np.frombuffer(
        json.dumps(
            {
                "iteration": int(iteration),
                "num_leaves": len(leaves),
                "treedef": str(treedef),
                **(meta or {}),
            }
        ).encode("utf-8"),
        dtype=np.uint8,
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_state(path: str, like=None):
    """Load a snapshot; returns ``(state, iteration, meta)``.

    ``like``: optional example pytree — when given, the flat leaves are
    unflattened into its structure (use the same ``init_state`` you would pass
    to the solve).  Without it, the state is returned as a tuple of arrays
    (or a single array if only one leaf).
    """
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode("utf-8"))
        leaves = [data[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        state = jax.tree_util.tree_unflatten(treedef, leaves)
    elif len(leaves) == 1:
        state = leaves[0]
    else:
        state = tuple(leaves)
    return state, meta["iteration"], meta


def checkpointed_solve(
    solve_segment,
    key,
    q_matrix,
    v_vector,
    params,
    init_state,
    iterations: int,
    every: int,
    path: str,
    resume: bool = True,
    **flags,
):
    """Run a dynamics ``solve_segment`` loop with periodic snapshots.

    Args:
        solve_segment: one of ``ccvm_tpu.dynamics.<family>.solve_segment``.
        init_state: the t=0 state pytree (e.g. zeros ``(batch, n)`` for
            Langevin; ``(c, s)`` for DL; ``(mu, mu_tilde, sigma)`` for MF;
            append Adam moment zeros for the hp variants).
        iterations: total iterations.
        every: snapshot period (iterations).
        path: snapshot file; overwritten atomically each period.
        resume: when True and ``path`` exists, continue from its iteration.
        **flags: static flags forwarded to solve_segment (pump_rate_flag,
            pump_is_gt_one, hp).

    Returns:
        The final state pytree (identical to an uninterrupted solve for the
        same key, since per-step keys are folded from absolute indices).
    """
    start = 0
    state = init_state
    if resume and os.path.exists(path):
        state, start, _ = load_state(path, like=init_state)
        state = jax.tree_util.tree_map(lambda x: jax.numpy.asarray(x), state)
    while start < iterations:
        num = min(every, iterations - start)
        state = solve_segment(
            key, q_matrix, v_vector, params, state, start, num=num, **flags
        )
        state = jax.block_until_ready(state)
        start += num
        save_state(path, state, start)
    return state
