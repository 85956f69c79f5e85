"""Fused Pallas TPU kernels: the ENTIRE SDE solve in one kernel launch.

The reference integrates its Euler-Maruyama loops at Python level — one (or
several) CUDA kernel launches *per iteration* for 15k iterations
(``ccvm_simulators/solvers/dl_solver.py:523``).  The lax.scan path already
fuses per-step work; these kernels go further and keep the whole loop
on-chip:

  * Q (padded to 128x128 lanes) and V live in VMEM for the entire solve;
  * the trajectory state (batch, n) stays in VMEM — zero HBM traffic in the
    hot loop for the bundled problem sizes (N <= 70, batch <= ~8k);
  * the batched matvec runs on the MXU (``jnp.dot`` with
    ``preferred_element_type=float32``);
  * Wiener increments come from the TPU hardware PRNG
    (``pltpu.prng_random_bits``) through a popcount-based exact-moment
    binomial transform (or Box-Muller for exact Gaussians) — no HBM noise
    tensors, no host RNG;
  * the Euler-Maruyama loop runs 8 steps per Mosaic loop body
    (:func:`_run_unrolled`) to amortise per-iteration loop overhead;
  * iteration-dependent schedules (pump rate, noise ratio, measurement
    strength) are computed on the scalar unit in-loop.

Numerical parity: drift math matches :mod:`ccvm_tpu.dynamics` exactly (tested
noise-free against the lax oracle); noise matches distributionally (the
reference's torch RNG can only ever match statistically anyway — SURVEY.md
section 7 "RNG semantics").

Every ``*_solve`` returns ``None`` when the configuration doesn't fit the
kernel (too big for VMEM, sharded mesh run, non-scalar S) so callers fall
back to the lax.scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128
_SUBLANE = 8
# Budget for state + temporaries (bytes) against the ~16 MB scoped-vmem
# limit, with headroom for Mosaic's own stack allocations.
_VMEM_BUDGET = 12 * 1024 * 1024
# Per-row temporaries Mosaic materializes beyond the named state arrays
# (measured: an MF tile of 2736 rows x 3 state arrays peaked at ~13.3
# rows-worth of scoped vmem -> ~10 temporaries).
_TEMP_ROWS = 10
_TWO_PI = 6.283185307179586


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_problem(q_matrix, v_vector):
    """Zero-pad stacked problems for the kernels, packing lanes when n < 128.

    Accepts ``(n, n)``/``(n,)`` (one instance) or ``(I, n, n)``/``(I, n)``
    (instance-sweep stacking).

    **Lane packing**: with n = 20, a naive pad to the 128-lane tile wastes
    6.4x of every MXU flop and VPU op (noise generation dominates the VPU).
    Instead, ``k = NP // n`` trajectories pack into one row — Q becomes a
    block-diagonal (NP, NP) with k copies, V tiles k times, and all
    elementwise dynamics are layout-oblivious.  Row r's lane block b holds
    trajectory ``r * k + b``; the wrapper unpacks at the end.

    Q instances are folded into row-blocks — ``(I * NP, NP)`` — so a 2-D
    ``(instance, batch-tile)`` grid can index instance ``i``'s Q as plain
    block row ``i`` and every kernel body stays rank-2.

    Returns ``(q, v, n, np_, num_instances, k)``.
    """
    q3 = q_matrix if q_matrix.ndim == 3 else q_matrix[None]
    v2 = v_vector if v_vector.ndim == 2 else v_vector[None]
    num_instances, n = q3.shape[0], q3.shape[1]
    np_ = _round_up(max(n, LANE), LANE)
    k = np_ // n
    q = jnp.zeros((num_instances, np_, np_), jnp.float32)
    v = jnp.zeros((num_instances, 1, np_), jnp.float32)
    q3 = q3.astype(jnp.float32)
    v2 = v2.astype(jnp.float32)
    for b in range(k):
        q = q.at[:, b * n : (b + 1) * n, b * n : (b + 1) * n].set(q3)
        v = v.at[:, 0, b * n : (b + 1) * n].set(v2)
    # V is rank-3 (I, 1, NP): the TPU lowering requires the block's trailing
    # two dims to equal the array's (or be sublane/lane multiples), which a
    # (1, NP) block over an (I, NP) array violates for I > 1.
    q = q.reshape(num_instances * np_, np_)
    return q, v, n, np_, num_instances, k


def _seed_from_key(key):
    """Derive int32 kernel seeds from JAX PRNG key(s).

    A single key (shape ``(2,)``) maps to a ``(1, 1)`` seed; stacked
    per-instance keys (shape ``(I, 2)``, from :func:`sweep_solve`'s
    ``PRNGKey(seed + i)``) map to ``(I, 1)`` — instance ``i``'s grid row
    reads seed ``i``, so its hardware-PRNG streams are bit-identical to a
    serial kernel solve of that instance with ``PRNGKey(seed + i)``."""
    one = functools.partial(
        jax.random.randint,
        shape=(1,), minval=0, maxval=np.int32(2**31 - 1), dtype=jnp.int32,
    )
    if key.ndim == 2:
        return jax.vmap(one)(key)
    return one(key)[None]


def _vmem_per_row(np_: int, n_state_arrays: int) -> int:
    """Scoped-vmem bytes per state row: each state array counted twice
    (live block + Mosaic's double-buffered output DMA) plus temporaries."""
    return np_ * 4 * (2 * n_state_arrays + _TEMP_ROWS)


def _vmem_fixed(np_: int) -> int:
    return np_ * np_ * 4 + 4 * np_


def _vmem_ok(tile: int, np_: int, n_state_arrays: int) -> bool:
    return (tile * _vmem_per_row(np_, n_state_arrays) + _vmem_fixed(np_)
            <= _VMEM_BUDGET)


def _tile_plan(batch: int, np_: int, n_state_arrays: int):
    """(padded_batch, tile, grid) so each grid program's state fits VMEM.

    Grid programs run sequentially on the core; tiling costs only the Q/V
    revisit (free: constant index map) and padding waste, so we pick the
    largest tile that fits and split the batch as evenly as possible.

    The per-row budget counts each state array TWICE: Mosaic double-buffers
    the output DMA across grid steps, so at large grids the scoped-vmem
    stack holds the live state block plus the in-flight copy (observed as a
    compile-time scoped-vmem OOM for the 3-state MF kernel at batch 131072
    before this was accounted for).
    """
    pb = _round_up(batch, _SUBLANE)
    fixed = _vmem_fixed(np_)
    per_row = _vmem_per_row(np_, n_state_arrays)
    max_t = max((_VMEM_BUDGET - fixed) // per_row // _SUBLANE * _SUBLANE,
                _SUBLANE)
    if max_t >= pb:
        return pb, pb, 1
    k = -(-pb // max_t)
    tile = _round_up(-(-pb // k), _SUBLANE)
    return tile * k, tile, k


def _normal_pair_box_muller(shape):
    """Two independent N(0,1) arrays via Box-Muller over hardware PRNG bits.

    Uses 23-bit uniforms (exact in float32).  u1 is mapped to (0, 1] so the
    log is always finite.  Exact Gaussian, but the four transcendentals
    (log/sqrt/cos/sin) dominate the whole SDE step on the VPU — measured
    ~2.4 us/step for a (168, 128) state vs ~0.01 us for the popcount path.
    """
    from jax.experimental.pallas import tpu as pltpu

    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    m23 = jnp.int32(0x7FFFFF)
    inv = jnp.float32(1.0 / (1 << 23))
    u1 = ((b1 & m23).astype(jnp.float32) + 1.0) * inv  # (0, 1]
    u2 = (b2 & m23).astype(jnp.float32) * inv  # [0, 1)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


# Binomial(64) + uniform-smoothing normalisation: Var = 64/4 + 1/12.
_POPC_INV_STD = float(1.0 / np.sqrt(16.0 + 1.0 / 12.0))
# Binomial(32) normalisation: Var = 32/4.
_POPC32_INV_STD = float(1.0 / np.sqrt(8.0))

# Steps per fori_loop body.  The SDE loop is sequential, so unrolling cannot
# add parallelism across steps, but it amortises Mosaic's per-iteration loop
# overhead (bounds arithmetic, VMEM ref reload) over 8 steps — measured ~20%
# faster at (168, 128) state.  A scalar tail loop covers iterations % 8 != 0.
_UNROLL = 8


def _normal_one_popcount(shape):
    """One ~N(0,1) array from a single 32-bit word per element:
    ``popcount(b) - 16`` is Binomial(32, 1/2) centred (variance 8), rescaled
    to unit variance.  Mean/variance are exact, skew 0, excess kurtosis
    -1/16, lattice spacing 0.35 sigma, support +-5.7 sigma.  Weak-order-1
    Euler-Maruyama only requires the increment's first and second moments to
    match (Kloeden & Platen, weak Taylor schemes — even Bernoulli +-1 noise
    converges weakly), so SDE statistics are preserved; validated against the
    exact-Gaussian lax path by tools/tpu_validate.py's 5-sigma bands.  Runs
    on two cheap VPU integer ops — no transcendentals — making noise
    generation a rounding error instead of ~40% of the fused step.
    """
    from jax.experimental.pallas import tpu as pltpu

    b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    pc = jax.lax.population_count(b)
    return (pc - 16).astype(jnp.float32) * jnp.float32(_POPC32_INV_STD)


def _normal_pair_popcount(shape):
    """Two independent ~N(0,1) arrays via bit-population counts.

    Each normal is ``popcount(b1) + popcount(b2) - 32`` (Binomial(64, 1/2),
    centred, variance 16) plus an independent 23-bit uniform on
    [-1/2, 1/2) for continuity, scaled to unit variance.  Mean/variance are
    exact, skew 0, excess kurtosis -1/32, support bounded at ~8 sigma —
    indistinguishable from Gaussian for Euler-Maruyama Wiener increments
    (any per-step kurtosis defect enters the integrated SDE only at O(dt)
    and the CLT over thousands of steps erases it; validated against the
    exact-Gaussian lax path by tools/tpu_validate.py's 5-sigma bands).
    Runs entirely on cheap VPU integer ops — no transcendentals — which
    makes noise generation essentially free instead of ~70% of the step.
    """
    from jax.experimental.pallas import tpu as pltpu

    def one(_):
        b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
        b3 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
        pc = jax.lax.population_count(b1) + jax.lax.population_count(b2)
        u = (b3 & jnp.int32(0x7FFFFF)).astype(jnp.float32) * jnp.float32(
            1.0 / (1 << 23)
        )
        return ((pc - 32).astype(jnp.float32) + (u - 0.5)) * jnp.float32(
            _POPC_INV_STD
        )

    return one(0), one(1)


def _normal_pair_popcount16(shape):
    """Two ~N(0,1) arrays from ONE 32-bit word per element: the word's two
    16-bit halves give independent Binomial(16, 1/2) popcounts, centred and
    scaled (variance 4 -> x0.5).  Mean/variance exact, skew 0, excess
    kurtosis -1/8, lattice spacing 0.5 sigma, support +-4 sigma.  Halves the
    hardware-PRNG word generation of the pair draw, which roofline
    measurement showed to be ~47% of the fused DL step (popcount32's two
    word sets cost ~40 us/step of 86.6 at batch 65536, N=70); weak-order-1
    Euler-Maruyama only needs the first two moments (see
    _normal_one_popcount), and DL quality on the certified set is validated
    unchanged (QUALITY.md Adam/roofline notes, tools/tpu_validate.py).
    """
    from jax.experimental.pallas import tpu as pltpu

    b = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    lo = b & jnp.int32(0xFFFF)
    hi = jax.lax.shift_right_logical(b, 16) & jnp.int32(0xFFFF)
    z1 = (jax.lax.population_count(lo) - 8).astype(jnp.float32) * 0.5
    z2 = (jax.lax.population_count(hi) - 8).astype(jnp.float32) * 0.5
    return z1, z2


_RNG_NAMES = ("popcount32", "popcount16", "popcount", "box_muller")

# Safety clamp for the kernels whose dynamics have no per-step box clamp
# (DL quadratures, MF mu).  Their cubic/pump damping keeps trajectories at
# O(S) in all physical parameter ranges, but an explicit Euler step that
# ever crossed |c| ~ sqrt(2/dt) would overshoot sign-flipping with growing
# magnitude and cascade to Inf within a few steps — and one Inf in a PADDING
# lane (which has no restoring feedback of its own) would propagate NaN into
# every real lane through the matvec (NaN * 0 = NaN).  One clip per step at
# a bound far above any physical amplitude is ~1 VPU op against the step's
# dozens, never binds for legitimate dynamics, and makes the failure mode
# impossible (ADVICE round 2, pallas_kernels.py:213).
_DL_SAFETY_BOUND = 1.0e3
_MF_SAFETY_BOUND = 1.0e5


def _noise_pair(shape, noise_scale, rng="popcount32"):
    """Scaled normal pair; statically elides the PRNG when
    ``noise_scale == 0`` (the deterministic test mode — interpret-mode CPU
    runs lack the TPU PRNG primitives).

    Noise is NOT masked off the padding columns: padded Q/V rows are zero, so
    padding columns never contaminate real columns through the matvec, their
    own dynamics are self-limiting, and the wrapper slices them away — the
    mask multiply was pure overhead.
    """
    if noise_scale == 0.0:
        z = jnp.zeros(shape, jnp.float32)
        return z, z
    if rng == "popcount32":
        z1, z2 = _normal_one_popcount(shape), _normal_one_popcount(shape)
    elif rng == "popcount16":
        z1, z2 = _normal_pair_popcount16(shape)
    elif rng == "popcount":
        z1, z2 = _normal_pair_popcount(shape)
    elif rng == "box_muller":
        z1, z2 = _normal_pair_box_muller(shape)
    else:
        raise ValueError(f"rng must be one of {_RNG_NAMES}, got {rng!r}")
    if noise_scale == 1.0:
        return z1, z2
    return z1 * noise_scale, z2 * noise_scale


def _noise_one(shape, noise_scale, rng="popcount32"):
    """Single scaled normal array — for the kernels that consume only one
    Wiener draw per step (Langevin, pumped Langevin, MF), where generating a
    pair would waste half the PRNG words."""
    if noise_scale == 0.0:
        return jnp.zeros(shape, jnp.float32)
    if rng in ("popcount32", "popcount16"):
        # Single draws already use one word per element; the popcount16
        # half-word split only pays off for pair draws.
        z = _normal_one_popcount(shape)
    elif rng == "popcount":
        z, _ = _normal_pair_popcount(shape)
    elif rng == "box_muller":
        z, _ = _normal_pair_box_muller(shape)
    else:
        raise ValueError(f"rng must be one of {_RNG_NAMES}, got {rng!r}")
    if noise_scale == 1.0:
        return z
    return z * noise_scale


def _run_unrolled(iterations, refs, step, unroll=_UNROLL):
    """Drive ``step(state_tuple, fi) -> state_tuple`` for ``iterations`` steps
    over VMEM ``refs``, ``unroll`` steps per loop body (state stays in
    registers within a body; refs are read/written once per body).  A scalar
    tail loop covers ``iterations % unroll``."""
    main = (iterations // unroll) * unroll

    def body(i, _):
        st = tuple(r[:] for r in refs)
        base = (i * unroll).astype(jnp.float32)
        for u in range(unroll):
            st = step(st, base + float(u))
        for r, val in zip(refs, st):
            r[:] = val
        return 0

    jax.lax.fori_loop(0, main // unroll, body, 0)
    if main != iterations:

        def tail(i, _):
            st = step(tuple(r[:] for r in refs), i.astype(jnp.float32))
            for r, val in zip(refs, st):
                r[:] = val
            return 0

        jax.lax.fori_loop(main, iterations, tail, 0)


def _maybe_seed(seed_ref, noise_scale):
    """Seed the hardware PRNG with an independent stream per grid program.

    The grid is always 2-D ``(instance, batch_tile)``.  The whole ``(I, 1)``
    per-instance seed array sits in SMEM (Mosaic requires an SMEM block to
    equal the array's shape here) and is indexed by the instance program id;
    only the batch-tile id is folded in — a stacked sweep's instance ``i``
    then runs the exact streams of a serial solve of that instance (same
    seed, same tile ids)."""
    if noise_scale == 0.0:
        return
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[pl.program_id(0), 0] + pl.program_id(1))


def _col_mask(batch, np_, n):
    """(batch, np_) float32 mask: 1 on real columns, 0 on padding."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (batch, np_), dimension=1)
    return (cols < n).astype(jnp.float32)


def _seeds_for(key, num_instances):
    """Per-instance ``(I, 1)`` kernel seeds.  Stacked keys pass through
    :func:`_seed_from_key`; a single key for a stacked call is split first so
    every instance still gets an independent stream."""
    if key.ndim == 1 and num_instances > 1:
        key = jax.random.split(key, num_instances)
    return _seed_from_key(key)


def _in_specs(pl, pltpu, params_shape, np_, num_instances=1):
    """Input specs shared by all kernels: seeds + params in SMEM, Q and V in
    VMEM.  Q/V index by the instance grid axis only, so they are fetched once
    per instance and stay VMEM-resident across the batch-tile axis.  The
    whole per-instance seed array maps into SMEM; :func:`_maybe_seed`
    indexes it by the instance program id."""
    return [
        pl.BlockSpec(
            (num_instances, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(params_shape, lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((np_, np_), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 1, np_), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    ]


def _out_spec(pl, pltpu, tile, np_, tiles_per_instance):
    """Output spec: instance i's batch rows live at block rows
    [i * tiles_per_instance, (i + 1) * tiles_per_instance)."""
    return pl.BlockSpec(
        (tile, np_),
        lambda i, j: (i * tiles_per_instance + j, 0),
        memory_space=pltpu.VMEM,
    )


def _unstack(out, stacked, num_instances, pb, batch_size, n, k):
    """(I*pb, np_) packed kernel output -> (I, batch, n) (or (batch, n)).

    Row r's lane block b is trajectory r*k + b (see :func:`_pad_problem`).
    """
    out = out.reshape(num_instances, pb, -1)[:, :, : k * n]
    out = out.reshape(num_instances, pb * k, n)[:, :batch_size]
    return out if stacked else out[0]


def _packed_rows(batch_size: int, k: int) -> int:
    """Rows needed to hold ``batch_size`` trajectories at k per row."""
    return -(-batch_size // k)


def _matvec(x, q_ref):
    return jnp.dot(x, q_ref[:], preferred_element_type=jnp.float32)


# Below this many tile rows the DL step is MXU-latency-bound and fusing the
# two quadrature matvecs into ONE stacked matmul wins (measured: 42% faster
# at 168 packed rows, ~3% slower at 3336 where the MXU is saturated and the
# concatenate/split copies are pure overhead).
_STACK_MATVEC_MAX_ROWS = 1024


def _dual_matvec(x1, x2, q_ref):
    """Two same-shape matvecs against one Q; stacked into a single MXU call
    when the tile is small enough to be latency-bound.  Row blocks of a
    matmul are computed independently, so results are bit-identical."""
    if x1.shape[0] <= _STACK_MATVEC_MAX_ROWS:
        b = x1.shape[0]
        fb = jnp.dot(
            jnp.concatenate([x1, x2], axis=0), q_ref[:],
            preferred_element_type=jnp.float32,
        )
        return fb[:b], fb[b:]
    return _matvec(x1, q_ref), _matvec(x2, q_ref)


def _beta_pow(beta: float, fi):
    """beta ** (fi + 1) for a STATIC beta in (0, 1] and a traced float step.

    Mosaic cannot legalize ``math.powf`` with a traced exponent, so the
    power is computed as ``exp((fi + 1) * log(beta))`` with the log folded
    at trace time (exp is a supported VPU transcendental — the noise-ratio
    and measurement-strength schedules already use it).
    """
    import math

    if beta >= 1.0:
        return jnp.float32(1.0)
    return jnp.exp((fi + 1.0) * jnp.float32(math.log(beta)))


def _adam_update(grads, m, v, fi, hp):
    """In-kernel Adam moment filtering; matches
    :func:`ccvm_tpu.dynamics.common.adam_moment_update` exactly (static hp:
    ``beta2 == 1.0`` elides the second moment, ``add_assign`` adds the raw
    gradient back — reference ``dl_solver.py:644-686``)."""
    eps = jnp.float32(1e-8)
    m = hp.beta1 * m + (1.0 - hp.beta1) * grads
    mhat = m / (1.0 - _beta_pow(hp.beta1, fi))
    if hp.beta2 != 1.0:
        v = hp.beta2 * v + (1.0 - hp.beta2) * jnp.square(grads)
        vhat = v / (1.0 - _beta_pow(hp.beta2, fi))
        update = hp.alpha * mhat / (jnp.sqrt(vhat) + eps)
    else:
        update = hp.alpha * mhat
    effective = grads + update if hp.add_assign else update
    return effective, m, v


# ---------------------------------------------------------------------------
# Langevin
# ---------------------------------------------------------------------------


def _langevin_kernel(
    iterations, n, noise_scale, rng, seed_ref, params_ref, q_ref, v_ref, c_ref
):
    """dc = dt*fs*(-(xQ + V)*(u-l)/(2S)) + sigma*sqrt(dt)*dW; clamp each step
    (reference ``langevin_solver.py:368-435``)."""
    _maybe_seed(seed_ref, noise_scale)
    S = params_ref[0, 0]
    dt = params_ref[0, 1]
    sigma = params_ref[0, 2]
    fs = params_ref[0, 3]
    lo = params_ref[0, 4]
    hi = params_ref[0, 5]
    sqrt_dt = jnp.sqrt(dt)
    scale = (hi - lo) / (2.0 * S)
    mid = (hi + lo) / 2.0
    batch, np_ = c_ref.shape
    v_row = v_ref[0, 0, :]

    c_ref[:] = jnp.zeros((batch, np_), jnp.float32)

    def step(state, fi):
        (c,) = state
        x = c * scale + mid
        drift = -(_matvec(x, q_ref) + v_row) * scale
        w = _noise_one((batch, np_), noise_scale, rng)
        c = c + dt * fs * drift + (sigma * sqrt_dt) * w
        return (jnp.clip(c, -S, S),)

    _run_unrolled(iterations, (c_ref,), step)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "batch_size", "interpret", "noise_scale", "rng",
    ),
)
def _langevin_call(
    key, q_matrix, v_vector, params_vec, *, iterations, batch_size, interpret,
    noise_scale, rng,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stacked = q_matrix.ndim == 3
    q, v, n, np_, num_instances, pack = _pad_problem(q_matrix, v_vector)
    pb, tile, k = _tile_plan(_packed_rows(batch_size, pack), np_, 1)
    kernel = functools.partial(
        _langevin_kernel, iterations, n * pack, noise_scale, rng
    )
    c = pl.pallas_call(
        kernel,
        grid=(num_instances, k),
        out_shape=jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
        in_specs=_in_specs(pl, pltpu, params_vec.shape, np_, num_instances),
        out_specs=_out_spec(pl, pltpu, tile, np_, k),
        interpret=interpret,
    )(_seeds_for(key, num_instances), params_vec, q, v)
    return _unstack(c, stacked, num_instances, pb, batch_size, n, pack)


def langevin_solve(
    key, q_matrix, v_vector, params, *, iterations, batch_size,
    interpret=False, noise_scale=1.0, rng="popcount32", hp=None,
):
    """Fused Langevin solve, or None if the config doesn't fit the kernel.

    ``hp`` (AdamHyperparameters) selects the fused Adam-in-loop variant with
    the moment arrays in VMEM scratch."""
    if np.ndim(params.S) != 0:
        return None
    # Host-side numpy: zero eager device dispatches before the jit call.
    params_vec = np.array(
        [
            params.S,
            params.dt,
            params.sigma,
            params.feedback_scale,
            params.lower_limit,
            params.upper_limit,
        ],
        np.float32,
    ).reshape(1, -1)
    if hp is not None:
        return _langevin_adam_call(
            key, q_matrix, v_vector, params_vec,
            iterations=int(iterations), batch_size=int(batch_size),
            interpret=interpret, noise_scale=float(noise_scale), rng=rng,
            hp=hp,
        )
    return _langevin_call(
        key, q_matrix, v_vector, params_vec,
        iterations=int(iterations), batch_size=int(batch_size),
        interpret=interpret, noise_scale=float(noise_scale), rng=rng,
    )


def _langevin_adam_kernel(
    iterations, n, noise_scale, rng, hp,
    seed_ref, params_ref, q_ref, v_ref, c_ref, m_ref, v2_ref,
):
    """Langevin with Adam-filtered gradients (reference
    ``langevin_solver.py:437-561``); the moments live in VMEM scratch."""
    _maybe_seed(seed_ref, noise_scale)
    S = params_ref[0, 0]
    dt = params_ref[0, 1]
    sigma = params_ref[0, 2]
    fs = params_ref[0, 3]
    lo = params_ref[0, 4]
    hi = params_ref[0, 5]
    sqrt_dt = jnp.sqrt(dt)
    scale = (hi - lo) / (2.0 * S)
    mid = (hi + lo) / 2.0
    batch, np_ = c_ref.shape
    v_row = v_ref[0, 0, :]

    c_ref[:] = jnp.zeros((batch, np_), jnp.float32)
    m_ref[:] = jnp.zeros((batch, np_), jnp.float32)
    v2_ref[:] = jnp.zeros((batch, np_), jnp.float32)

    def step(state, fi):
        c, m, v2 = state
        x = c * scale + mid
        grads = -(_matvec(x, q_ref) + v_row) * scale
        eff, m, v2 = _adam_update(grads, m, v2, fi, hp)
        w = _noise_one((batch, np_), noise_scale, rng)
        c = c + dt * fs * eff + (sigma * sqrt_dt) * w
        return (jnp.clip(c, -S, S), m, v2)

    _run_unrolled(iterations, (c_ref, m_ref, v2_ref), step)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "batch_size", "interpret", "noise_scale", "rng", "hp",
    ),
)
def _langevin_adam_call(
    key, q_matrix, v_vector, params_vec, *, iterations, batch_size, interpret,
    noise_scale, rng, hp,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stacked = q_matrix.ndim == 3
    q, v, n, np_, num_instances, pack = _pad_problem(q_matrix, v_vector)
    pb, tile, k = _tile_plan(_packed_rows(batch_size, pack), np_, 3)
    kernel = functools.partial(
        _langevin_adam_kernel, iterations, n * pack, noise_scale, rng, hp
    )
    scratch = pltpu.VMEM((tile, np_), jnp.float32)
    c = pl.pallas_call(
        kernel,
        grid=(num_instances, k),
        out_shape=jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
        in_specs=_in_specs(pl, pltpu, params_vec.shape, np_, num_instances),
        out_specs=_out_spec(pl, pltpu, tile, np_, k),
        scratch_shapes=[scratch, scratch],
        interpret=interpret,
    )(_seeds_for(key, num_instances), params_vec, q, v)
    return _unstack(c, stacked, num_instances, pb, batch_size, n, pack)


# ---------------------------------------------------------------------------
# Pumped Langevin
# ---------------------------------------------------------------------------


def _pumped_langevin_kernel(
    iterations, n, pump_rate_flag, noise_scale, rng,
    seed_ref, params_ref, q_ref, v_ref, c_ref,
):
    """dc = dt*((-1 + p(i) - c^2)c + fs*grads) + sigma*sqrt(dt)*dW; clamp
    (reference ``pumped_langevin_solver.py:232-309``)."""
    _maybe_seed(seed_ref, noise_scale)
    pump = params_ref[0, 0]
    S = params_ref[0, 1]
    dt = params_ref[0, 2]
    sigma = params_ref[0, 3]
    fs = params_ref[0, 4]
    lo = params_ref[0, 5]
    hi = params_ref[0, 6]
    T = params_ref[0, 7]
    sqrt_dt = jnp.sqrt(dt)
    scale = (hi - lo) / (2.0 * S)
    mid = (hi + lo) / 2.0
    batch, np_ = c_ref.shape
    v_row = v_ref[0, 0, :]

    c_ref[:] = jnp.zeros((batch, np_), jnp.float32)

    def step(state, fi):
        (c,) = state
        pump_i = pump * (fi + 1.0) / T if pump_rate_flag else pump
        x = c * scale + mid
        grads = -_matvec(x, q_ref) * scale - v_row * scale
        drift = (-1.0 + pump_i - jnp.square(c)) * c + fs * grads
        w = _noise_one((batch, np_), noise_scale, rng)
        c = c + dt * drift + (sigma * sqrt_dt) * w
        return (jnp.clip(c, -S, S),)

    _run_unrolled(iterations, (c_ref,), step)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "batch_size", "pump_rate_flag", "interpret",
        "noise_scale", "rng",
    ),
)
def _pumped_langevin_call(
    key, q_matrix, v_vector, params_vec, *, iterations, batch_size,
    pump_rate_flag, interpret, noise_scale, rng,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stacked = q_matrix.ndim == 3
    q, v, n, np_, num_instances, pack = _pad_problem(q_matrix, v_vector)
    pb, tile, k = _tile_plan(_packed_rows(batch_size, pack), np_, 1)
    kernel = functools.partial(
        _pumped_langevin_kernel, iterations, n * pack, pump_rate_flag,
        noise_scale, rng,
    )
    c = pl.pallas_call(
        kernel,
        grid=(num_instances, k),
        out_shape=jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
        in_specs=_in_specs(pl, pltpu, params_vec.shape, np_, num_instances),
        out_specs=_out_spec(pl, pltpu, tile, np_, k),
        interpret=interpret,
    )(_seeds_for(key, num_instances), params_vec, q, v)
    return _unstack(c, stacked, num_instances, pb, batch_size, n, pack)


def pumped_langevin_solve(
    key, q_matrix, v_vector, params, *, iterations, batch_size,
    pump_rate_flag, interpret=False, noise_scale=1.0, rng="popcount32",
    hp=None,
):
    """Fused pumped-Langevin solve; ``hp`` (AdamHyperparameters) selects the
    fused Adam-in-loop variant with the moment arrays in VMEM scratch."""
    if np.ndim(params.S) != 0:
        return None
    params_vec = np.array(
        [
            params.pump,
            params.S,
            params.dt,
            params.sigma,
            params.feedback_scale,
            params.lower_limit,
            params.upper_limit,
            params.iterations,
        ],
        np.float32,
    ).reshape(1, -1)
    if hp is not None:
        return _pumped_langevin_adam_call(
            key, q_matrix, v_vector, params_vec,
            iterations=int(iterations), batch_size=int(batch_size),
            pump_rate_flag=bool(pump_rate_flag), interpret=interpret,
            noise_scale=float(noise_scale), rng=rng, hp=hp,
        )
    return _pumped_langevin_call(
        key, q_matrix, v_vector, params_vec,
        iterations=int(iterations), batch_size=int(batch_size),
        pump_rate_flag=bool(pump_rate_flag), interpret=interpret,
        noise_scale=float(noise_scale), rng=rng,
    )


def _pumped_langevin_adam_kernel(
    iterations, n, pump_rate_flag, noise_scale, rng, hp,
    seed_ref, params_ref, q_ref, v_ref, c_ref, m_ref, v2_ref,
):
    """Pumped Langevin with Adam-filtered feedback gradients (reference
    ``pumped_langevin_solver.py:311-449``): only the feedback gradient goes
    through Adam, the pump drift stays physical; the moments live in VMEM
    scratch.  Drift math mirrors
    :func:`ccvm_tpu.dynamics.pumped_langevin.make_adam_step`."""
    _maybe_seed(seed_ref, noise_scale)
    pump = params_ref[0, 0]
    S = params_ref[0, 1]
    dt = params_ref[0, 2]
    sigma = params_ref[0, 3]
    fs = params_ref[0, 4]
    lo = params_ref[0, 5]
    hi = params_ref[0, 6]
    T = params_ref[0, 7]
    sqrt_dt = jnp.sqrt(dt)
    scale = (hi - lo) / (2.0 * S)
    mid = (hi + lo) / 2.0
    batch, np_ = c_ref.shape
    v_row = v_ref[0, 0, :]

    c_ref[:] = jnp.zeros((batch, np_), jnp.float32)
    m_ref[:] = jnp.zeros((batch, np_), jnp.float32)
    v2_ref[:] = jnp.zeros((batch, np_), jnp.float32)

    def step(state, fi):
        c, m, v2 = state
        x = c * scale + mid
        grads = -_matvec(x, q_ref) * scale - v_row * scale
        eff, m, v2 = _adam_update(grads, m, v2, fi, hp)
        pump_i = pump * (fi + 1.0) / T if pump_rate_flag else pump
        c_pump = (-1.0 + pump_i - jnp.square(c)) * c
        w = _noise_one((batch, np_), noise_scale, rng)
        c = c + dt * (c_pump + fs * eff) + (sigma * sqrt_dt) * w
        return (jnp.clip(c, -S, S), m, v2)

    _run_unrolled(iterations, (c_ref, m_ref, v2_ref), step)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "batch_size", "pump_rate_flag", "interpret",
        "noise_scale", "rng", "hp",
    ),
)
def _pumped_langevin_adam_call(
    key, q_matrix, v_vector, params_vec, *, iterations, batch_size,
    pump_rate_flag, interpret, noise_scale, rng, hp,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stacked = q_matrix.ndim == 3
    q, v, n, np_, num_instances, pack = _pad_problem(q_matrix, v_vector)
    pb, tile, k = _tile_plan(_packed_rows(batch_size, pack), np_, 3)
    kernel = functools.partial(
        _pumped_langevin_adam_kernel, iterations, n * pack, pump_rate_flag,
        noise_scale, rng, hp,
    )
    scratch = pltpu.VMEM((tile, np_), jnp.float32)
    c = pl.pallas_call(
        kernel,
        grid=(num_instances, k),
        out_shape=jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
        in_specs=_in_specs(pl, pltpu, params_vec.shape, np_, num_instances),
        out_specs=_out_spec(pl, pltpu, tile, np_, k),
        scratch_shapes=[scratch, scratch],
        interpret=interpret,
    )(_seeds_for(key, num_instances), params_vec, q, v)
    return _unstack(c, stacked, num_instances, pb, batch_size, n, pack)


# ---------------------------------------------------------------------------
# DL-CCVM
# ---------------------------------------------------------------------------


def _dl_kernel(
    iterations, n, pump_rate_flag, pump_is_gt_one, noise_scale, rng,
    seed_ref, params_ref, q_ref, v_ref, c_ref, s_ref,
):
    """Two-quadrature pump-saturated SDE (reference ``dl_solver.py:468-569``);
    drift math mirrors :func:`ccvm_tpu.dynamics.dl.drift_boxqp`."""
    _maybe_seed(seed_ref, noise_scale)
    pump = params_ref[0, 0]
    S_user = params_ref[0, 1]
    dt = params_ref[0, 2]
    noise_ratio = params_ref[0, 3]
    fs = params_ref[0, 4]
    g = params_ref[0, 5]
    lo = params_ref[0, 6]
    hi = params_ref[0, 7]
    T = params_ref[0, 8]
    # Drift-internal saturation override S_d (dl_solver.py:140-141)
    S_d = jnp.sqrt(pump - 1.0) if pump_is_gt_one else S_user
    sqrt_dt = jnp.sqrt(dt)
    span = hi - lo
    mid = hi + lo
    g3 = v_ref[0, 0, :] * span / (2.0 * S_d)
    batch, np_ = c_ref.shape

    c_ref[:] = jnp.zeros((batch, np_), jnp.float32)
    s_ref[:] = jnp.zeros((batch, np_), jnp.float32)

    def step(state, fi):
        c, s = state
        rate = (fi + 1.0) / T if pump_rate_flag else jnp.float32(1.0)
        nr_i = (noise_ratio - 1.0) * jnp.exp(-(fi + 1.0) / T * 3.0) + 1.0
        c_pow = jnp.square(c)
        s_pow = jnp.square(s)
        x_c = c * span / S_d + mid
        x_s = s * span / S_d + mid
        qx_c, qx_s = _dual_matvec(x_c, x_s, q_ref)
        fb_c = 0.25 * qx_c * span / S_d
        fb_s = 0.25 * qx_s * span / S_d
        fs_dyn = fs * (0.5 + rate)
        c_drift = -fs_dyn * (fb_c + g3) + (-1.0 + pump * rate - c_pow - s_pow) * c
        s_drift = -fs_dyn * (fb_s + g3) + (-1.0 - pump * rate - c_pow - s_pow) * s
        w_c, w_s = _noise_pair((batch, np_), noise_scale, rng)
        diff = 2.0 * g * jnp.sqrt(c_pow + s_pow + 0.5)
        bound = jnp.float32(_DL_SAFETY_BOUND)  # see _DL_SAFETY_BOUND
        return (
            jnp.clip(c + dt * c_drift + (diff * (sqrt_dt * nr_i)) * w_c,
                     -bound, bound),
            jnp.clip(s + dt * s_drift + (diff * (sqrt_dt / nr_i)) * w_s,
                     -bound, bound),
        )

    _run_unrolled(iterations, (c_ref, s_ref), step)
    # Final clamp to the *original* +-S (dl_solver.py:567)
    c_ref[:] = jnp.clip(c_ref[:], -S_user, S_user)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "batch_size", "pump_rate_flag", "pump_is_gt_one",
        "interpret", "noise_scale", "rng",
    ),
)
def _dl_call(
    key, q_matrix, v_vector, params_vec, *, iterations, batch_size,
    pump_rate_flag, pump_is_gt_one, interpret, noise_scale, rng,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stacked = q_matrix.ndim == 3
    q, v, n, np_, num_instances, pack = _pad_problem(q_matrix, v_vector)
    pb, tile, k = _tile_plan(_packed_rows(batch_size, pack), np_, 2)
    kernel = functools.partial(
        _dl_kernel, iterations, n * pack, pump_rate_flag, pump_is_gt_one,
        noise_scale, rng,
    )
    tile_spec = _out_spec(pl, pltpu, tile, np_, k)
    c, s = pl.pallas_call(
        kernel,
        grid=(num_instances, k),
        out_shape=(
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
        ),
        in_specs=_in_specs(pl, pltpu, params_vec.shape, np_, num_instances),
        out_specs=(tile_spec, tile_spec),
        interpret=interpret,
    )(_seeds_for(key, num_instances), params_vec, q, v)
    return (
        _unstack(c, stacked, num_instances, pb, batch_size, n, pack),
        _unstack(s, stacked, num_instances, pb, batch_size, n, pack),
    )


def dl_solve(
    key, q_matrix, v_vector, params, *, iterations, batch_size,
    pump_rate_flag, pump_is_gt_one, interpret=False, noise_scale=1.0,
    rng="popcount32", hp=None,
):
    """Fused DL solve; ``hp`` selects the fused Adam-in-loop variant."""
    if np.ndim(params.S) != 0:
        return None
    params_vec = np.array(
        [
            params.pump,
            params.S,
            params.dt,
            params.noise_ratio,
            params.feedback_scale,
            params.g,
            params.lower_limit,
            params.upper_limit,
            params.iterations,
        ],
        np.float32,
    ).reshape(1, -1)
    if hp is not None:
        return _dl_adam_call(
            key, q_matrix, v_vector, params_vec,
            iterations=int(iterations), batch_size=int(batch_size),
            pump_rate_flag=bool(pump_rate_flag),
            pump_is_gt_one=bool(pump_is_gt_one), interpret=interpret,
            noise_scale=float(noise_scale), rng=rng, hp=hp,
        )
    return _dl_call(
        key, q_matrix, v_vector, params_vec,
        iterations=int(iterations), batch_size=int(batch_size),
        pump_rate_flag=bool(pump_rate_flag),
        pump_is_gt_one=bool(pump_is_gt_one), interpret=interpret,
        noise_scale=float(noise_scale), rng=rng,
    )


def _dl_adam_kernel(
    iterations, n, pump_rate_flag, pump_is_gt_one, noise_scale, rng, hp,
    seed_ref, params_ref, q_ref, v_ref, c_ref, s_ref,
    mc_ref, vc_ref, ms_ref, vs_ref,
):
    """DL-CCVM with Adam-filtered feedback gradients (reference
    ``dl_solver.py:571-769``): the pump drift stays physical with
    pump_rate = pump*(i+1)/T; the four moment arrays live in VMEM scratch.
    Drift math mirrors :func:`ccvm_tpu.dynamics.dl.make_adam_step`."""
    _maybe_seed(seed_ref, noise_scale)
    pump = params_ref[0, 0]
    S_user = params_ref[0, 1]
    dt = params_ref[0, 2]
    noise_ratio = params_ref[0, 3]
    fs = params_ref[0, 4]  # unused by the Adam drift; kept for layout parity
    g = params_ref[0, 5]
    lo = params_ref[0, 6]
    hi = params_ref[0, 7]
    T = params_ref[0, 8]
    del fs
    S_d = jnp.sqrt(pump - 1.0) if pump_is_gt_one else S_user
    sqrt_dt = jnp.sqrt(dt)
    span = hi - lo
    mid = hi + lo
    g3 = v_ref[0, 0, :] * span / (2.0 * S_d)
    batch, np_ = c_ref.shape

    for r in (c_ref, s_ref, mc_ref, vc_ref, ms_ref, vs_ref):
        r[:] = jnp.zeros((batch, np_), jnp.float32)

    def step(state, fi):
        c, s, m_c, v_c, m_s, v_s = state
        pump_rate = pump * (fi + 1.0) / T if pump_rate_flag else pump
        nr_i = (noise_ratio - 1.0) * jnp.exp(-(fi + 1.0) / T * 3.0) + 1.0
        x_c = c * span / S_d + mid
        x_s = s * span / S_d + mid
        qx_c, qx_s = _dual_matvec(x_c, x_s, q_ref)
        c_grads = -(0.25 * qx_c * span / S_d) - g3
        s_grads = -(0.25 * qx_s * span / S_d) - g3
        c_eff, m_c, v_c = _adam_update(c_grads, m_c, v_c, fi, hp)
        s_eff, m_s, v_s = _adam_update(s_grads, m_s, v_s, fi, hp)
        c_pow = jnp.square(c)
        s_pow = jnp.square(s)
        c_drift = (-1.0 + pump_rate - c_pow - s_pow) * c
        s_drift = (-1.0 - pump_rate - c_pow - s_pow) * s
        w_c, w_s = _noise_pair((batch, np_), noise_scale, rng)
        diff = 2.0 * g * jnp.sqrt(c_pow + s_pow + 0.5)
        bound = jnp.float32(_DL_SAFETY_BOUND)  # see _DL_SAFETY_BOUND
        return (
            jnp.clip(c + dt * (c_drift + c_eff)
                     + (diff * (sqrt_dt * nr_i)) * w_c, -bound, bound),
            jnp.clip(s + dt * (s_drift + s_eff)
                     + (diff * (sqrt_dt / nr_i)) * w_s, -bound, bound),
            m_c, v_c, m_s, v_s,
        )

    _run_unrolled(
        iterations, (c_ref, s_ref, mc_ref, vc_ref, ms_ref, vs_ref), step
    )
    c_ref[:] = jnp.clip(c_ref[:], -S_user, S_user)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "batch_size", "pump_rate_flag", "pump_is_gt_one",
        "interpret", "noise_scale", "rng", "hp",
    ),
)
def _dl_adam_call(
    key, q_matrix, v_vector, params_vec, *, iterations, batch_size,
    pump_rate_flag, pump_is_gt_one, interpret, noise_scale, rng, hp,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stacked = q_matrix.ndim == 3
    q, v, n, np_, num_instances, pack = _pad_problem(q_matrix, v_vector)
    pb, tile, k = _tile_plan(_packed_rows(batch_size, pack), np_, 6)
    kernel = functools.partial(
        _dl_adam_kernel, iterations, n * pack, pump_rate_flag, pump_is_gt_one,
        noise_scale, rng, hp,
    )
    tile_spec = _out_spec(pl, pltpu, tile, np_, k)
    scratch = pltpu.VMEM((tile, np_), jnp.float32)
    c, s = pl.pallas_call(
        kernel,
        grid=(num_instances, k),
        out_shape=(
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
        ),
        in_specs=_in_specs(pl, pltpu, params_vec.shape, np_, num_instances),
        out_specs=(tile_spec, tile_spec),
        scratch_shapes=[scratch] * 4,
        interpret=interpret,
    )(_seeds_for(key, num_instances), params_vec, q, v)
    return (
        _unstack(c, stacked, num_instances, pb, batch_size, n, pack),
        _unstack(s, stacked, num_instances, pb, batch_size, n, pack),
    )


# ---------------------------------------------------------------------------
# MF-CCVM
# ---------------------------------------------------------------------------


def _mf_kernel(
    iterations, n, pump_rate_flag, noise_scale, rng,
    seed_ref, params_ref, q_ref, v_ref, mu_ref, mt_ref, sigma_ref,
):
    """Measurement-feedback SDE over (mu, sigma) with measured field mu_tilde
    (reference ``mf_solver.py:493-593``).  The SAME Wiener draw feeds the
    measured field and the mu diffusion; the readout mu_tilde is the last
    iteration's (pre-update) value — both preserved here."""
    _maybe_seed(seed_ref, noise_scale)
    pump = params_ref[0, 0]
    S = params_ref[0, 1]
    dt = params_ref[0, 2]
    j = params_ref[0, 3]
    fs = params_ref[0, 4]
    g = params_ref[0, 5]
    lo = params_ref[0, 6]
    hi = params_ref[0, 7]
    T = params_ref[0, 8]
    sqrt_dt = jnp.sqrt(dt)
    span = hi - lo
    mid = hi + lo
    g_sq = jnp.square(g)
    batch, np_ = mu_ref.shape
    v_row = v_ref[0, 0, :]

    mu_ref[:] = jnp.zeros((batch, np_), jnp.float32)
    mt_ref[:] = jnp.zeros((batch, np_), jnp.float32)
    sigma_ref[:] = jnp.full((batch, np_), 0.5, jnp.float32)

    def step(state, fi):
        mu, _, sigma = state
        j_i = j * jnp.exp(-(fi + 1.0) / T * 3.0)
        w = _noise_one((batch, np_), noise_scale, rng)
        w_inc = w / sqrt_dt
        mu_tilde = mu + jnp.sqrt(1.0 / (4.0 * j_i)) * w_inc
        mu_tilde_c = jnp.clip(mu_tilde, -S, S)
        rate = (fi + 1.0) / T if pump_rate_flag else jnp.float32(1.0)
        pump_inst = pump * rate + 1.0 + j_i
        mu_pow = jnp.square(mu)
        x = mu_tilde_c * span / S + mid
        fb = -0.25 * _matvec(x, q_ref) * span / S - v_row * span / (2.0 * S)
        drift_mu = (-(1.0 + j_i) + pump_inst - g_sq * mu_pow) * mu + fs * fb
        drift_sigma = (
            2.0 * (-(1.0 + j_i) + pump_inst - 3.0 * g_sq * mu_pow) * sigma
            - 2.0 * j_i * jnp.square(sigma - 0.5)
            + (1.0 + j_i)
            + 2.0 * g_sq * mu_pow
        )
        mu_diffusion = jnp.sqrt(j_i) * (sigma - 0.5) * w_inc
        bound = jnp.float32(_MF_SAFETY_BOUND)  # see _MF_SAFETY_BOUND
        return (
            jnp.clip(mu + dt * (drift_mu + mu_diffusion), -bound, bound),
            mu_tilde,
            sigma + dt * drift_sigma,
        )

    _run_unrolled(iterations, (mu_ref, mt_ref, sigma_ref), step)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "batch_size", "pump_rate_flag", "interpret",
        "noise_scale", "rng",
    ),
)
def _mf_call(
    key, q_matrix, v_vector, params_vec, *, iterations, batch_size,
    pump_rate_flag, interpret, noise_scale, rng,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stacked = q_matrix.ndim == 3
    q, v, n, np_, num_instances, pack = _pad_problem(q_matrix, v_vector)
    pb, tile, k = _tile_plan(_packed_rows(batch_size, pack), np_, 3)
    kernel = functools.partial(
        _mf_kernel, iterations, n * pack, pump_rate_flag, noise_scale, rng
    )
    tile_spec = _out_spec(pl, pltpu, tile, np_, k)
    mu, mt, sigma = pl.pallas_call(
        kernel,
        grid=(num_instances, k),
        out_shape=(
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
        ),
        in_specs=_in_specs(pl, pltpu, params_vec.shape, np_, num_instances),
        out_specs=(tile_spec, tile_spec, tile_spec),
        interpret=interpret,
    )(_seeds_for(key, num_instances), params_vec, q, v)
    S = params_vec[0, 1]
    mt = jnp.clip(mt, -S, S)  # final readout clamp (mf_solver.py:591-593)
    return (
        _unstack(mu, stacked, num_instances, pb, batch_size, n, pack),
        _unstack(mt, stacked, num_instances, pb, batch_size, n, pack),
        _unstack(sigma, stacked, num_instances, pb, batch_size, n, pack),
    )


def mf_solve(
    key, q_matrix, v_vector, params, *, iterations, batch_size,
    pump_rate_flag, interpret=False, noise_scale=1.0, rng="popcount32",
    hp=None,
):
    """Fused MF solve; ``hp`` (AdamHyperparameters) selects the fused
    Adam-in-loop variant with the moment arrays in VMEM scratch."""
    if np.ndim(params.S) != 0:
        return None
    params_vec = np.array(
        [
            params.pump,
            params.S,
            params.dt,
            params.j,
            params.feedback_scale,
            params.g,
            params.lower_limit,
            params.upper_limit,
            params.iterations,
        ],
        np.float32,
    ).reshape(1, -1)
    if hp is not None:
        return _mf_adam_call(
            key, q_matrix, v_vector, params_vec,
            iterations=int(iterations), batch_size=int(batch_size),
            pump_rate_flag=bool(pump_rate_flag), interpret=interpret,
            noise_scale=float(noise_scale), rng=rng, hp=hp,
        )
    return _mf_call(
        key, q_matrix, v_vector, params_vec,
        iterations=int(iterations), batch_size=int(batch_size),
        pump_rate_flag=bool(pump_rate_flag), interpret=interpret,
        noise_scale=float(noise_scale), rng=rng,
    )


def _mf_adam_kernel(
    iterations, n, pump_rate_flag, noise_scale, rng, hp,
    seed_ref, params_ref, q_ref, v_ref, mu_ref, mt_ref, sigma_ref,
    m_ref, v2_ref,
):
    """MF-CCVM with Adam-filtered feedback gradients (reference
    ``mf_solver.py:595-764``): Adam filters the fs-scaled feedback only; the
    pump/measurement drift and the mu diffusion stay physical.  The moment
    arrays live in VMEM scratch.  Drift math mirrors
    :func:`ccvm_tpu.dynamics.mf.make_adam_step`."""
    _maybe_seed(seed_ref, noise_scale)
    pump = params_ref[0, 0]
    S = params_ref[0, 1]
    dt = params_ref[0, 2]
    j = params_ref[0, 3]
    fs = params_ref[0, 4]
    g = params_ref[0, 5]
    lo = params_ref[0, 6]
    hi = params_ref[0, 7]
    T = params_ref[0, 8]
    sqrt_dt = jnp.sqrt(dt)
    span = hi - lo
    mid = hi + lo
    g_sq = jnp.square(g)
    batch, np_ = mu_ref.shape
    v_row = v_ref[0, 0, :]

    mu_ref[:] = jnp.zeros((batch, np_), jnp.float32)
    mt_ref[:] = jnp.zeros((batch, np_), jnp.float32)
    sigma_ref[:] = jnp.full((batch, np_), 0.5, jnp.float32)
    m_ref[:] = jnp.zeros((batch, np_), jnp.float32)
    v2_ref[:] = jnp.zeros((batch, np_), jnp.float32)

    def step(state, fi):
        mu, _, sigma, m, v2 = state
        j_i = j * jnp.exp(-(fi + 1.0) / T * 3.0)
        w = _noise_one((batch, np_), noise_scale, rng)
        w_inc = w / sqrt_dt
        mu_tilde = mu + jnp.sqrt(1.0 / (4.0 * j_i)) * w_inc
        mu_tilde_c = jnp.clip(mu_tilde, -S, S)
        rate = (fi + 1.0) / T if pump_rate_flag else jnp.float32(1.0)
        pump_inst = pump * rate + 1.0 + j_i
        x = mu_tilde_c * span / S + mid
        grads = fs * (
            -0.25 * _matvec(x, q_ref) * span / S - v_row * span / (2.0 * S)
        )
        eff, m, v2 = _adam_update(grads, m, v2, fi, hp)
        mu_pow = jnp.square(mu)
        mu_drift = (-(1.0 + j_i) + pump_inst - g_sq * mu_pow) * mu
        mu_drift = mu_drift + jnp.sqrt(j_i) * (sigma - 0.5) * w_inc
        drift_sigma = (
            2.0 * (-(1.0 + j_i) + pump_inst - 3.0 * g_sq * mu_pow) * sigma
            - 2.0 * j_i * jnp.square(sigma - 0.5)
            + (1.0 + j_i)
            + 2.0 * g_sq * mu_pow
        )
        bound = jnp.float32(_MF_SAFETY_BOUND)  # see _MF_SAFETY_BOUND
        return (
            jnp.clip(mu + dt * (eff + mu_drift), -bound, bound),
            mu_tilde,
            sigma + dt * drift_sigma,
            m,
            v2,
        )

    _run_unrolled(
        iterations, (mu_ref, mt_ref, sigma_ref, m_ref, v2_ref), step
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "batch_size", "pump_rate_flag", "interpret",
        "noise_scale", "rng", "hp",
    ),
)
def _mf_adam_call(
    key, q_matrix, v_vector, params_vec, *, iterations, batch_size,
    pump_rate_flag, interpret, noise_scale, rng, hp,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stacked = q_matrix.ndim == 3
    q, v, n, np_, num_instances, pack = _pad_problem(q_matrix, v_vector)
    pb, tile, k = _tile_plan(_packed_rows(batch_size, pack), np_, 5)
    kernel = functools.partial(
        _mf_adam_kernel, iterations, n * pack, pump_rate_flag, noise_scale,
        rng, hp,
    )
    tile_spec = _out_spec(pl, pltpu, tile, np_, k)
    scratch = pltpu.VMEM((tile, np_), jnp.float32)
    mu, mt, sigma = pl.pallas_call(
        kernel,
        grid=(num_instances, k),
        out_shape=(
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
            jax.ShapeDtypeStruct((num_instances * pb, np_), jnp.float32),
        ),
        in_specs=_in_specs(pl, pltpu, params_vec.shape, np_, num_instances),
        out_specs=(tile_spec, tile_spec, tile_spec),
        scratch_shapes=[scratch, scratch],
        interpret=interpret,
    )(_seeds_for(key, num_instances), params_vec, q, v)
    S = params_vec[0, 1]
    mt = jnp.clip(mt, -S, S)  # final readout clamp (mf_solver.py:591-593)
    return (
        _unstack(mu, stacked, num_instances, pb, batch_size, n, pack),
        _unstack(mt, stacked, num_instances, pb, batch_size, n, pack),
        _unstack(sigma, stacked, num_instances, pb, batch_size, n, pack),
    )
