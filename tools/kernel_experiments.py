"""Scratch harness: DL-kernel variants raced against the production kernel.

Knobs: RNG scheme, fused c/s matvec, fori_loop unroll. Winners get folded
back into ccvm_tpu/ops/pallas_kernels.py.
"""

from __future__ import annotations

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from ccvm_tpu.ops import pallas_kernels as pk

LANE = 128


def _sync(out):
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
    return best, out


# --- RNG variants ------------------------------------------------------------

_POPC1_INV_STD = float(1.0 / np.sqrt(8.0))  # Binomial(32,1/2): var 8


def noise_popcount1(shape):
    """One random word per normal: popcount(b) - 16, var 8, rescaled.

    Matches mean/variance exactly; lattice spacing 0.354 sigma; weak-order-1
    Euler only needs matched first/second moments (Kloeden-Platen weak
    schemes), so SDE statistics are preserved.
    """
    from jax.experimental.pallas import tpu as pltpu

    def one():
        b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
        pc = jax.lax.population_count(b)
        return (pc - 16).astype(jnp.float32) * jnp.float32(_POPC1_INV_STD)

    return one(), one()


_POPC2_INV_STD = float(1.0 / np.sqrt(16.0))


def noise_popcount2(shape):
    """Two words per normal (no uniform smoothing): var 16."""
    from jax.experimental.pallas import tpu as pltpu

    def one():
        b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
        pc = jax.lax.population_count(b1) + jax.lax.population_count(b2)
        return (pc - 32).astype(jnp.float32) * jnp.float32(_POPC2_INV_STD)

    return one(), one()


RNGS = {
    "popcount3(prod)": pk._normal_pair_popcount,
    "popcount2": noise_popcount2,
    "popcount1": noise_popcount1,
}


# --- DL kernel variant -------------------------------------------------------


def _dl_kernel_v2(
    iterations, n, noise_fn, fuse_matvec, unroll,
    seed_ref, params_ref, q_ref, v_ref, c_ref, s_ref,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0, 0] + pid)

    pump = params_ref[0, 0]
    dt = params_ref[0, 2]
    noise_ratio = params_ref[0, 3]
    fs = params_ref[0, 4]
    g = params_ref[0, 5]
    lo = params_ref[0, 6]
    hi = params_ref[0, 7]
    T = params_ref[0, 8]
    S_user = params_ref[0, 1]
    S_d = jnp.sqrt(pump - 1.0)
    sqrt_dt = jnp.sqrt(dt)
    span = hi - lo
    mid = hi + lo
    g3 = v_ref[0, 0, :] * span / (2.0 * S_d)
    batch, np_ = c_ref.shape
    mask = pk._col_mask(batch, np_, n)

    c_ref[:] = jnp.zeros((batch, np_), jnp.float32)
    s_ref[:] = jnp.zeros((batch, np_), jnp.float32)

    def step(c, s, fi):
        rate = (fi + 1.0) / T
        nr_i = (noise_ratio - 1.0) * jnp.exp(-(fi + 1.0) / T * 3.0) + 1.0
        c_pow = jnp.square(c)
        s_pow = jnp.square(s)
        if fuse_matvec:
            x = jnp.concatenate(
                [c * (span / S_d) + mid, s * (span / S_d) + mid], axis=0
            )
            fb = 0.25 * jnp.dot(
                x, q_ref[:], preferred_element_type=jnp.float32
            ) * (span / S_d)
            fb_c = fb[:batch]
            fb_s = fb[batch:]
        else:
            x_c = c * (span / S_d) + mid
            x_s = s * (span / S_d) + mid
            fb_c = 0.25 * jnp.dot(
                x_c, q_ref[:], preferred_element_type=jnp.float32
            ) * (span / S_d)
            fb_s = 0.25 * jnp.dot(
                x_s, q_ref[:], preferred_element_type=jnp.float32
            ) * (span / S_d)
        fs_dyn = fs * (0.5 + rate)
        c_drift = -fs_dyn * (fb_c + g3) + (-1.0 + pump * rate - c_pow - s_pow) * c
        s_drift = -fs_dyn * (fb_s + g3) + (-1.0 - pump * rate - c_pow - s_pow) * s
        z1, z2 = noise_fn((batch, np_))
        w_c = z1 * (mask * (sqrt_dt * nr_i))
        w_s = z2 * (mask * (sqrt_dt / nr_i))
        diff = 2.0 * g * jnp.sqrt(c_pow + s_pow + 0.5)
        return (c + dt * c_drift + diff * w_c, s + dt * s_drift + diff * w_s)

    assert iterations % unroll == 0

    def body(i, _):
        c = c_ref[:]
        s = s_ref[:]
        base = (i * unroll).astype(jnp.float32)
        for u in range(unroll):
            c, s = step(c, s, base + float(u))
        c_ref[:] = c
        s_ref[:] = s
        return 0

    jax.lax.fori_loop(0, iterations // unroll, body, 0)
    c_ref[:] = jnp.clip(c_ref[:], -S_user, S_user)


@functools.partial(
    jax.jit, static_argnames=("iterations", "batch_size", "rng_name",
                              "fuse_matvec", "unroll"),
)
def dl_v2(key, q_matrix, v_vector, params_vec, *, iterations, batch_size,
          rng_name, fuse_matvec, unroll):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, v, n, np_, num_instances, pack = pk._pad_problem(q_matrix, v_vector)
    pb, tile, k = pk._tile_plan(pk._packed_rows(batch_size, pack), np_, 2)
    kernel = functools.partial(
        _dl_kernel_v2, iterations, n * pack, RNGS[rng_name], fuse_matvec,
        unroll,
    )
    tile_spec = pk._out_spec(pl, pltpu, tile, np_, k)
    c, s = pl.pallas_call(
        kernel,
        grid=(num_instances, k),
        out_shape=(
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
        ),
        in_specs=pk._in_specs(pl, pltpu, params_vec.shape, np_),
        out_specs=(tile_spec, tile_spec),
    )(pk._seed_from_key(key), params_vec, q, v)
    return c, s


# --- v3: winner + Q-prescale + no mask ---------------------------------------


def _dl_kernel_v3(
    iterations, n, noise_fn, unroll,
    seed_ref, params_ref, q_ref, v_ref, c_ref, s_ref,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0, 0] + pid)

    pump = params_ref[0, 0]
    dt = params_ref[0, 2]
    noise_ratio = params_ref[0, 3]
    fs = params_ref[0, 4]
    g = params_ref[0, 5]
    lo = params_ref[0, 6]
    hi = params_ref[0, 7]
    T = params_ref[0, 8]
    S_user = params_ref[0, 1]
    S_d = jnp.sqrt(pump - 1.0)
    sqrt_dt = jnp.sqrt(dt)
    span = hi - lo
    mid = hi + lo
    batch, np_ = c_ref.shape

    # Fold the change of variables into the matvec once, before the loop:
    #   fb(z) = 0.25*(z*span/S_d + mid)@Q*span/S_d = z@Q' + qrow
    # with Q' = Q * (0.25*span^2/S_d^2), qrow = 0.25*mid*span/S_d * colsum(Q).
    alpha = 0.25 * span / S_d
    qcol = alpha * mid * jnp.sum(q_ref[:], axis=0, keepdims=True)
    g3 = v_ref[0, 0, :] * span / (2.0 * S_d)
    fb0 = qcol[0, :] + g3  # constant feedback offset

    c_ref[:] = jnp.zeros((batch, np_), jnp.float32)
    s_ref[:] = jnp.zeros((batch, np_), jnp.float32)

    qs = alpha * (span / S_d)

    def step(c, s, fi):
        rate = (fi + 1.0) / T
        nr_i = (noise_ratio - 1.0) * jnp.exp(-(fi + 1.0) / T * 3.0) + 1.0
        c_pow = jnp.square(c)
        s_pow = jnp.square(s)
        fb_c = jnp.dot(c, q_ref[:], preferred_element_type=jnp.float32) * qs
        fb_s = jnp.dot(s, q_ref[:], preferred_element_type=jnp.float32) * qs
        fs_dyn = fs * (0.5 + rate)
        sum_pow = c_pow + s_pow
        c_drift = -fs_dyn * (fb_c + fb0) + (-1.0 + pump * rate - sum_pow) * c
        s_drift = -fs_dyn * (fb_s + fb0) + (-1.0 - pump * rate - sum_pow) * s
        z1, z2 = noise_fn((batch, np_))
        diff = 2.0 * g * jnp.sqrt(sum_pow + 0.5)
        return (
            c + dt * c_drift + (diff * (sqrt_dt * nr_i)) * z1,
            s + dt * s_drift + (diff * (sqrt_dt / nr_i)) * z2,
        )

    main_iters = (iterations // unroll) * unroll

    def body(i, _):
        c = c_ref[:]
        s = s_ref[:]
        base = (i * unroll).astype(jnp.float32)
        for u in range(unroll):
            c, s = step(c, s, base + float(u))
        c_ref[:] = c
        s_ref[:] = s
        return 0

    jax.lax.fori_loop(0, main_iters // unroll, body, 0)
    if main_iters != iterations:
        def tail(i, _):
            c, s = step(c_ref[:], s_ref[:], i.astype(jnp.float32))
            c_ref[:] = c
            s_ref[:] = s
            return 0
        jax.lax.fori_loop(main_iters, iterations, tail, 0)
    c_ref[:] = jnp.clip(c_ref[:], -S_user, S_user)


@functools.partial(
    jax.jit, static_argnames=("iterations", "batch_size", "rng_name", "unroll"),
)
def dl_v3(key, q_matrix, v_vector, params_vec, *, iterations, batch_size,
          rng_name, unroll):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, v, n, np_, num_instances, pack = pk._pad_problem(q_matrix, v_vector)
    pb, tile, k = pk._tile_plan(pk._packed_rows(batch_size, pack), np_, 2)
    kernel = functools.partial(
        _dl_kernel_v3, iterations, n * pack, RNGS[rng_name], unroll,
    )
    tile_spec = pk._out_spec(pl, pltpu, tile, np_, k)
    c, s = pl.pallas_call(
        kernel,
        grid=(num_instances, k),
        out_shape=(
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
        ),
        in_specs=pk._in_specs(pl, pltpu, params_vec.shape, np_),
        out_specs=(tile_spec, tile_spec),
    )(pk._seed_from_key(key), params_vec, q, v)
    return c, s


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=15000)
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n = args.n
    q = rng.normal(size=(n, n)).astype(np.float32)
    q = 0.5 * (q + q.T)
    v = rng.normal(size=(n,)).astype(np.float32)
    qj, vj = jnp.asarray(q), jnp.asarray(v)
    params_vec = np.array(
        [8.0, np.sqrt(7.0), 0.001, 10.0, 100.0, 0.01, 0.0, 1.0,
         float(args.iters)], np.float32,
    ).reshape(1, -1)
    key = jax.random.PRNGKey(0)

    # Huge iteration counts so kernel compute dwarfs the ~30-60 ms tunnel
    # jitter: w(i2)-w(i1) over 1.6M steps gives ~0.04 us/step resolution.
    i1, i2 = 400_000, 2_000_000
    print(f"batch={args.batch} n={n}", flush=True)

    def measure(label, fn, **kw):
        run = lambda iters: timeit(
            fn, key, qj, vj, params_vec, iterations=iters,
            batch_size=args.batch, reps=5, **kw,
        )[0]
        w1 = run(i1)
        w2 = run(i2)
        step_us = (w2 - w1) / (i2 - i1) * 1e6
        print(f"{label:44s} marginal {step_us:7.4f} us/step"
              f"  compute-bound {args.batch/step_us:9.1f} M traj-it/s",
              flush=True)

    measure("v2 popcount1 fuse0 unroll8 (prev best)", dl_v2,
            rng_name="popcount1", fuse_matvec=False, unroll=8)
    for unroll in (8, 16):
        for rng_name in ("popcount1", "popcount2"):
            measure(f"v3 {rng_name} unroll{unroll}", dl_v3,
                    rng_name=rng_name, unroll=unroll)


if __name__ == "__main__":
    main()
