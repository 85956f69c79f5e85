"""Two-process jax.distributed smoke test on the CPU backend.

Validates the real multi-host path end-to-end without pod hardware: two
local processes initialize the distributed runtime against a localhost
coordinator, build the global mesh, split the instance list with
``local_shard_bounds``, run a small batch-sharded Langevin solve each, and
the coordinator cross-checks a ``process_allgather`` of the per-host best
objectives.

Usage (parent spawns both workers):
    python tools/multihost_smoke.py            # exit 0 on success
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = int(os.environ.get("CCVM_SMOKE_PORT", "7799"))


def worker(process_id: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ccvm_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2

    # Host-side work split: 5 items over 2 hosts -> 3 + 2.
    lo, hi = multihost.local_shard_bounds(5)
    assert (hi - lo) in (2, 3), (lo, hi)

    # Batch-sharded solve over the global mesh — the BASELINE.json pod
    # config in miniature: an N=70 dense BoxQP with the trajectory batch
    # sharded across both hosts (fewer iterations; this is a CPU smoke).
    import jax.numpy as jnp
    import numpy as np

    from ccvm_tpu.dynamics import langevin as dyn
    from ccvm_tpu.dynamics.langevin import LangevinParams
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = multihost.global_batch_mesh()
    rng = np.random.RandomState(0)
    n = 70
    q = rng.normal(0, 28.7 / np.sqrt(n), (n, n))
    q = (q + q.T) / 2
    v = rng.normal(0, 21, n)
    params = LangevinParams(
        S=np.float32(0.5), dt=np.float32(0.002), sigma=np.float32(0.5),
        feedback_scale=np.float32(1.0), lower_limit=np.float32(0),
        upper_limit=np.float32(1),
    )
    rep = NamedSharding(mesh, P())
    key, qj, vj, params = jax.device_put(
        (jax.random.PRNGKey(0), jnp.asarray(q, jnp.float32),
         jnp.asarray(v, jnp.float32), params), rep,
    )
    with mesh:
        c = dyn.solve(
            key, qj, vj, params, iterations=50, batch_size=1024,
            shard=NamedSharding(mesh, P("batch", None)),
        )
        # Global best-objective reduction over the cross-host sharded batch
        # (XLA inserts the collective from the sharding).
        x = (c + params.S) / (2 * params.S)
        qx = jnp.einsum("bi,ij->bj", x, qj)
        objval = 0.5 * jnp.sum(x * qx, axis=-1) + x @ vj
        best = jnp.max(objval)
    best = float(best)
    assert np.isfinite(best)
    # Per-host summary over addressable shards + cross-host gather; also the
    # tiled full-array gather the sweep readback uses.
    from jax.experimental import multihost_utils

    local_best = max(
        float(np.max(-np.sum(np.square(np.asarray(s.data)), axis=-1)))
        for s in c.addressable_shards
    )
    gathered = multihost_utils.process_allgather(local_best)
    assert np.isfinite(np.asarray(gathered)).all()
    c_full = multihost_utils.process_allgather(c, tiled=True)
    assert np.asarray(c_full).shape == (1024, n)
    # Every host computed the identical global best.
    bests = multihost_utils.process_allgather(best)
    assert np.allclose(np.asarray(bests), best)
    if multihost.is_coordinator():
        print(f"coordinator OK: gathered {np.asarray(gathered)}")
    print(f"process {process_id} OK")


def main() -> int:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # no virtual multi-device; one device per proc
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(pid)], env=env
        )
        for pid in (0, 1)
    ]
    rc = 0
    for p in procs:
        try:
            rc |= p.wait(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            rc |= 1
    print("multihost smoke:", "PASS" if rc == 0 else "FAIL")
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        sys.exit(main())
