"""Generate a standalone BoxQP benchmark instance set.

The reference ships 6 sizes x 50 instances (100% density) solved with Gurobi
(``examples/benchmarking_instances/``, ``examples/README.md:16-23``).  We do
not copy those data files; this tool generates our own set with the same file
format (``examples/README.md:26-40``):

    line 1: N  optimal  best  optimality(bool)  certify_time  bfgs_time  seed  num_frac
    line 2: V (tab-separated)
    lines 3..N+2: rows of Q
    line N+3 (optional): a best-known solution vector

Instance distribution is fit to the reference set's empirical statistics
(measured over all 300 bundled instances):

    Q off-diagonal ~ N(0, 28.7/sqrt(N))     -- eigen-spread constant in N
    Q diagonal     ~ N(0, 57.4/sqrt(N))     -- 2x the off-diagonal scale
    V              ~ N(0, 21)
    per-instance scale jitter U(0.75, 1.25) -- reproduces the reference's
        mild cross-instance difficulty spread (pooled excess kurtosis ~0.25)

matching the reference's observed per-size std table (Size20: V 21.5 /
Qdiag 12.8 / Qoff 6.4; Size70: V 20.3 / Qdiag 7.2 / Qoff 3.5) and its
eigenvalue range (~[-75, +72] at every size).  With this distribution the
paper-default solver parameters transfer, unlike the uniform-draw set this
tool produced previously.

Best-known optima: a massive multi-start box-projected L-BFGS sweep runs on
the accelerator (``ccvm_tpu.ops.lbfgs.lbfgs_box_batch``, 8192 starts), the
top candidates are polished on the host with an exact active-set solve, and
corner-rounding moves are tried from each.  ``optimality`` is written as
False here; ``tools/certify_boxqp.py`` proves global optimality for the
sizes where branch-and-bound is affordable and rewrites the header in place.

Usage:
    python tools/make_benchmark_set.py OUT_DIR [--sizes 20,30,...] \
        [--per-size 50] [--starts 8192] [--single-test]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

# Fit to the reference set (see module docstring).
QOFF_COEF = 28.7
QDIAG_COEF = 57.4
V_STD = 21.0
SCALE_JITTER = 0.25


def sample_instance(n: int, seed: int):
    rng = np.random.RandomState(seed * 1009 + n)
    scale = 1.0 + rng.uniform(-SCALE_JITTER, SCALE_JITTER)
    off = rng.normal(0.0, QOFF_COEF / np.sqrt(n), (n, n))
    q = np.triu(off, 1)
    q = q + q.T
    np.fill_diagonal(q, rng.normal(0.0, QDIAG_COEF / np.sqrt(n), n))
    q *= scale
    v = rng.normal(0.0, V_STD, n) * scale
    return np.round(q, 6), np.round(v, 6)


def _objective(q, v, x):
    return 0.5 * x @ q @ x + v @ x


def _active_set_polish(q, v, x, max_rounds=50):
    """Fix near-bound variables, solve the free block exactly, iterate.

    For an indefinite Q this converges to a KKT point at least as good as the
    input when the free block is solvable and improves the objective.
    """
    best_x, best_val = x.copy(), _objective(q, v, x)
    for _ in range(max_rounds):
        lo = best_x < 1e-9
        hi = best_x > 1 - 1e-9
        free = ~(lo | hi)
        x_new = np.where(hi, 1.0, 0.0)
        if free.any():
            qff = q[np.ix_(free, free)]
            rhs = -(v[free] + q[np.ix_(free, ~free)] @ x_new[~free])
            try:
                xf = np.linalg.solve(qff, rhs)
            except np.linalg.LinAlgError:
                break
            if np.any(xf < -1e-9) or np.any(xf > 1 + 1e-9):
                break
            x_new[free] = np.clip(xf, 0.0, 1.0)
        val = _objective(q, v, x_new)
        if val <= best_val + 1e-12:
            break
        best_x, best_val = x_new, val
    return best_x, best_val


def _corner_flips(q, v, x):
    """Greedy single-coordinate bound flips from a candidate, then polish."""
    best_x, best_val = x.copy(), _objective(q, v, x)
    improved = True
    while improved:
        improved = False
        g = q @ best_x + v
        for i in np.argsort(-np.abs(g)):
            for target in (0.0, 1.0):
                if abs(best_x[i] - target) < 1e-12:
                    continue
                x_try = best_x.copy()
                x_try[i] = target
                x_try, val = _active_set_polish(q, v, x_try)
                if val > best_val + 1e-10:
                    best_x, best_val = x_try, val
                    improved = True
                    break
            if improved:
                break
    return best_x, best_val


def best_known_max(q, v, starts=8192, seed=0, top_k=32):
    """Best-known maximum of 0.5 xQx + Vx over [0,1]^n.

    Accelerator multi-start (vmapped projected L-BFGS), host-side active-set
    polish + greedy corner flips on the distinct leaders.
    """
    import jax.numpy as jnp

    from ccvm_tpu.ops.lbfgs import lbfgs_box_batch

    n = q.shape[0]
    rng = np.random.RandomState(seed)
    # Minimize the negated objective.
    qm = jnp.asarray(-q, jnp.float32)
    vm = jnp.asarray(-v, jnp.float32)
    x0 = rng.uniform(0, 1, (starts, n)).astype(np.float32)
    # Seed a few structured starts: interior KKT point and its rounding.
    try:
        xin = np.clip(np.linalg.lstsq(q, -v, rcond=None)[0], 0, 1)
        x0[0] = xin
        x0[1] = np.round(xin)
    except np.linalg.LinAlgError:
        pass
    x0[2] = 0.0
    x0[3] = 1.0
    xs = np.asarray(lbfgs_box_batch(jnp.asarray(x0), qm, vm,
                                    max_iter=120, history=8))
    vals = 0.5 * np.einsum("bi,ij,bj->b", xs, q, xs) + xs @ v
    order = np.argsort(-vals)
    best_x, best_val = None, -np.inf
    seen = set()
    taken = 0
    for idx in order:
        key = tuple(np.round(xs[idx], 3))
        if key in seen:
            continue
        seen.add(key)
        x_p, val_p = _active_set_polish(q, v, xs[idx].astype(np.float64))
        if val_p > best_val:
            best_x, best_val = x_p, val_p
        taken += 1
        if taken >= top_k:
            break
    best_x, best_val = _corner_flips(q, v, best_x)
    return best_val, best_x


def write_instance(path, n, seed, q, v, opt, x, optimality=False,
                   certify_time=0.0, search_time=0.0):
    num_frac = int(np.sum((x > 1e-6) & (x < 1 - 1e-6)))
    with open(path, "w") as f:
        f.write(
            f"{n}\t{opt:.6f}\t{opt:.6f}\t{optimality}\t{certify_time:.4f}"
            f"\t{search_time:.4f}\t{seed}\t{num_frac}\n"
        )
        f.write("\t".join(f"{val:.6f}" for val in v) + "\n")
        for row in q:
            f.write("\t".join(f"{val:.6f}" for val in row) + "\n")
        f.write("\t".join(f"{val:.6f}" for val in x) + "\n")


def make_set(out_dir, sizes, per_size, starts, single_test=False,
             seed_offset=0, prefix="tuningH0"):
    # seed_offset > 0 produces a disjoint (held-out) instance set: the
    # reference's InstanceType enum distinguishes "tuning" from "test"
    # instances (problem_instance.py:12-17 both repos) precisely so
    # parameters are never fitted on the instances they are scored on.
    for n in sizes:
        size_dir = os.path.join(out_dir, f"Size{n}")
        os.makedirs(size_dir, exist_ok=True)
        for seed in range(seed_offset, seed_offset + per_size):
            q, v = sample_instance(n, seed)
            t0 = time.perf_counter()
            opt, x = best_known_max(q, v, starts=starts, seed=seed)
            st = time.perf_counter() - t0
            path = os.path.join(size_dir, f"{prefix}{n}-100-{seed}.in")
            write_instance(path, n, seed, q, v, opt, x, search_time=st)
            print(f"wrote {path}: best-known {opt:.6f} ({st:.1f}s)")
    if single_test:
        st_dir = os.path.join(out_dir, "single_test_instance")
        os.makedirs(st_dir, exist_ok=True)
        q, v = sample_instance(20, 0)
        t0 = time.perf_counter()
        opt, x = best_known_max(q, v, starts=max(starts, 16384), seed=0)
        st = time.perf_counter() - t0
        path = os.path.join(st_dir, "tuningH020-100-0.in")
        write_instance(path, 20, 0, q, v, opt, x, search_time=st)
        print(f"wrote {path}: best-known {opt:.6f} ({st:.1f}s)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--sizes", default="20,30,40,50,60,70")
    ap.add_argument("--per-size", type=int, default=50)
    ap.add_argument("--starts", type=int, default=8192)
    ap.add_argument("--single-test", action="store_true")
    ap.add_argument("--seed-offset", type=int, default=0)
    ap.add_argument("--prefix", default="tuningH0")
    args = ap.parse_args()
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sizes = [int(s) for s in args.sizes.split(",") if s]
    make_set(args.out_dir, sizes, args.per_size, args.starts,
             args.single_test, seed_offset=args.seed_offset,
             prefix=args.prefix)
