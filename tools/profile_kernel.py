"""Micro-profile the fused DL kernel: decompose step cost into RNG / matvec /
elementwise shares by timing variants on the real chip.

Usage: python tools/profile_kernel.py [--batch B] [--iters I]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready does not actually wait on the tunneled "axon"
    # platform; a device-to-host readback of one element does.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[0, 0]))


def timeit(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=15000)
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    from ccvm_tpu.dynamics.dl import DLParams
    from ccvm_tpu.ops import pallas_kernels as pk

    n = args.n
    rng = np.random.default_rng(0)
    q = rng.normal(size=(n, n)).astype(np.float32)
    q = 0.5 * (q + q.T)
    v = rng.normal(size=(n,)).astype(np.float32)
    qj = jnp.asarray(q)
    vj = jnp.asarray(v)
    params = DLParams(
        pump=8.0, dt=0.001, iterations=args.iters, noise_ratio=10.0,
        feedback_scale=100.0, g=0.01, S=np.sqrt(7.0),
        lower_limit=0.0, upper_limit=1.0,
    )
    key = jax.random.PRNGKey(0)

    configs = [
        ("dl noise=popcount", dict(noise_scale=1.0, rng="popcount")),
        ("dl noise=box_muller", dict(noise_scale=1.0, rng="box_muller")),
        ("dl noise=OFF", dict(noise_scale=0.0, rng="popcount")),
    ]
    i1, i2 = args.iters, args.iters * 5
    for label, kw in configs:
        run = lambda iters: timeit(
            pk.dl_solve, key, qj, vj, params,
            iterations=iters, batch_size=args.batch,
            pump_rate_flag=True, pump_is_gt_one=True, **kw,
        )
        w1, w2 = run(i1), run(i2)
        # Marginal per-step cost excludes the fixed tunnel round-trip.
        step_us = (w2 - w1) / (i2 - i1) * 1e6
        rate = args.batch / step_us  # M traj-iter/s, compute-bound
        print(f"{label:24s} wall@{i1}={w1*1e3:7.2f} ms"
              f"  marginal {step_us:7.3f} us/step"
              f"  compute-bound {rate:9.1f} M traj-iter/s")


if __name__ == "__main__":
    main()
