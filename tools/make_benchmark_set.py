"""Generate a standalone BoxQP benchmark instance set.

The reference ships 6 sizes x 50 instances (100% density) solved with Gurobi
(``examples/benchmarking_instances/``, ``examples/README.md:16-23``).  We do
not copy those data files; this tool generates our own set with the same file
format (``examples/README.md:26-40``):

    line 1: N  optimal  best  optimality(bool)  gurobi_time  bfgs_time  seed  num_frac
    line 2: V (tab-separated)
    lines 3..N+2: rows of Q
    line N+3 (optional): a best-known solution vector

Instance distribution matches the reference's observed scale: dense symmetric
Q with off-diagonal entries ~U(-15, 15) and diagonal ~U(-10, 30) (indefinite,
so the box-QP has many local optima — "fractional-solution-hard"), V ~
U(-50, 20).  Optima are best-known values from a dense multi-start projected
L-BFGS-B sweep plus an exact active-set polish; ``optimality`` is written as
False to record that they are not certified (the reference used Gurobi).

Usage:
    python tools/make_benchmark_set.py OUT_DIR [--sizes 20,30,...] \
        [--per-size 5] [--starts 512] [--single-test]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.optimize import minimize


def sample_instance(n: int, seed: int):
    rng = np.random.RandomState(seed * 1009 + n)
    q = rng.uniform(-15.0, 15.0, (n, n))
    q = (q + q.T) / 2
    np.fill_diagonal(q, rng.uniform(-10.0, 30.0, n))
    v = rng.uniform(-50.0, 20.0, n)
    return np.round(q, 6), np.round(v, 6)


def _objective(q, v, x):
    return 0.5 * x @ q @ x + v @ x


def _active_set_polish(q, v, x, max_rounds=50):
    """Fix near-bound variables, solve the free block exactly, iterate.

    For an indefinite Q this converges to a KKT point at least as good as the
    input when the free block is solvable and improves the objective.
    """
    n = q.shape[0]
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


def best_known_max(q, v, starts=512, seed=0):
    """Multi-start projected L-BFGS-B maximization of 0.5 xQx + Vx over
    [0,1]^n, with active-set polish of the winner."""
    n = q.shape[0]
    rng = np.random.RandomState(seed)
    bounds = [(0.0, 1.0)] * n

    def neg_f(x):
        return -(0.5 * x @ q @ x + v @ x)

    def neg_grad(x):
        return -(q @ x + v)

    best_val, best_x = -np.inf, None
    x0s = [np.clip(np.linalg.lstsq(q, -v, rcond=None)[0], 0, 1)]
    x0s += [rng.uniform(0, 1, n) for _ in range(starts - 1)]
    # Rounded corners of the relaxation often dominate for indefinite Q
    x0s += [np.round(x0s[0])]
    for x0 in x0s:
        res = minimize(
            neg_f, x0, jac=neg_grad, method="L-BFGS-B", bounds=bounds,
            options={"ftol": 1e-14, "gtol": 1e-12, "maxiter": 500},
        )
        if -res.fun > best_val:
            best_val, best_x = -res.fun, res.x
    best_x, best_val = _active_set_polish(q, v, best_x)
    return best_val, best_x


def write_instance(path, n, seed, q, v, opt, x, optimality=False):
    num_frac = int(np.sum((x > 1e-6) & (x < 1 - 1e-6)))
    with open(path, "w") as f:
        f.write(
            f"{n}\t{opt:.6f}\t{opt:.6f}\t{optimality}\t0.0\t0.0\t{seed}\t{num_frac}\n"
        )
        f.write("\t".join(f"{val:.6f}" for val in v) + "\n")
        for row in q:
            f.write("\t".join(f"{val:.6f}" for val in row) + "\n")
        f.write("\t".join(f"{val:.6f}" for val in x) + "\n")


def make_set(out_dir, sizes, per_size, starts, single_test=False):
    for n in sizes:
        size_dir = os.path.join(out_dir, f"Size{n}")
        os.makedirs(size_dir, exist_ok=True)
        for seed in range(per_size):
            q, v = sample_instance(n, seed)
            opt, x = best_known_max(q, v, starts=starts, seed=seed)
            path = os.path.join(size_dir, f"tuningH0{n}-100-{seed}.in")
            write_instance(path, n, seed, q, v, opt, x)
            print(f"wrote {path}: best-known {opt:.6f}")
    if single_test:
        st_dir = os.path.join(out_dir, "single_test_instance")
        os.makedirs(st_dir, exist_ok=True)
        q, v = sample_instance(20, 0)
        opt, x = best_known_max(q, v, starts=max(starts, 1024), seed=0)
        path = os.path.join(st_dir, "tuningH020-100-0.in")
        write_instance(path, 20, 0, q, v, opt, x)
        print(f"wrote {path}: best-known {opt:.6f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--sizes", default="20,30,40,50,60,70")
    ap.add_argument("--per-size", type=int, default=5)
    ap.add_argument("--starts", type=int, default=512)
    ap.add_argument("--single-test", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",") if s]
    make_set(args.out_dir, sizes, args.per_size, args.starts, args.single_test)
