"""True 2-process jax.distributed integration (CPU backend).

Runs tools/multihost_smoke.py, which spawns two worker processes against a
localhost coordinator and exercises the real multi-host path: distributed
init, global mesh, local_shard_bounds work split, a batch-sharded solve,
and cross-host process_allgather (scalar and tiled full-array).
"""

import os
import subprocess
import sys

TOOL = os.path.join(
    os.path.dirname(__file__), "..", "..", "tools", "multihost_smoke.py"
)


def test_two_process_distributed_smoke():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers use one real CPU device each
    env["CCVM_SMOKE_PORT"] = "7821"
    proc = subprocess.run(
        [sys.executable, TOOL], env=env, capture_output=True, text=True,
        timeout=580,
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "PASS" in proc.stdout
