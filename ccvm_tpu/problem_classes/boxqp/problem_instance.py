"""BoxQP problem instances as JAX pytrees.

Functional parity with the reference loader/evaluator
(``ccvm_simulators/problem_classes/boxqp/problem_instance.py``):

* ``.in`` file format: header line ``size, optimal_sol, best_sol, optimality,
  sol_time_gb, sol_time_bfgs, seed, num_frac_values`` (``:154-172``), then the
  V vector, then N rows of Q, then an optional trailing solution vector
  (``:190-201``).
* Both V and Q are **negated** on load (``:181-188``): files store a
  maximization problem, solvers minimize, and ``Solution`` flips the sign
  back.
* ``compute_energy`` = ``(0.5 x Q x + V x) * scaled_by`` (``:226-241``).
* ``scale_coefs`` divides Q and V and multiplies ``scaled_by`` so consecutive
  scalings stack (``:243-255``).

The implementation is TPU-native: parsing happens once on the host into NumPy
(optionally via the C++ fast parser in :mod:`ccvm_tpu.native`), the arrays are
then placed on the requested device and the energy evaluation is a jitted
batched contraction.
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ccvm_tpu.runtime import put, validate_device


class InstanceType(enum.Enum):
    """Enumerate instance types (reference ``problem_instance.py:12-17``)."""

    TUNING = "tuning"
    TEST = "test"


@functools.partial(jax.jit)
def _energy_kernel(confs, q_matrix, v_vector, scaled_by):
    """Batched BoxQP objective 0.5 xQx + Vx, scaled (reference ``:236-241``).

    ``Precision.HIGHEST``: the TPU MXU's DEFAULT matmul precision truncates
    inputs to bfloat16 (~8e-3 relative error per product) — far beyond the
    float32 rounding model the mixed-precision readout's per-row bound
    assumes.  HIGHEST runs the f32-equivalent multi-pass mode; the energy
    pass is a rounding error of the solve either way.
    """
    qx = jnp.einsum(
        "bi,ij->bj", confs, q_matrix,
        preferred_element_type=confs.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    energy1 = jnp.sum(confs * qx, axis=-1) * scaled_by
    energy2 = jnp.einsum(
        "bi,i->b", confs, v_vector,
        precision=jax.lax.Precision.HIGHEST,
    )
    energy2 = energy2 * scaled_by
    return 0.5 * energy1 + energy2


@functools.partial(jax.jit)
def _energy_and_bound_kernel(confs, q_matrix, v_vector, scaled_by):
    """(2, batch): f32 energies and their abs-value rounding-bound inputs,
    one dispatch (see :func:`ambiguous_readout_rows`)."""
    e = _energy_kernel(confs, q_matrix, v_vector, scaled_by)
    a = _energy_kernel(
        jnp.abs(confs), jnp.abs(q_matrix), jnp.abs(v_vector),
        jnp.abs(scaled_by),
    )
    return jnp.stack([e, a])


def _apply_cv(pv, cv_mode, lo, hi, S):
    """Change of variables fused into the readout dispatch.

    Expressions are kept token-identical to the standalone maps
    (``dynamics.common.change_variables_boxqp`` /
    ``langevin_change_variables``).  XLA's fusion may still round kept-f32
    energies slightly differently than the two-dispatch path — within the
    per-row bound that triggers f64 re-evaluation, so readout statistics
    are unchanged (tests/unit/test_readout_fusion.py).
    """
    if cv_mode == "boxqp":
        return 0.5 * pv / S * (hi - lo) + 0.5 * (hi + lo)
    if cv_mode == "langevin":
        return (pv + S) / (2 * S)
    raise ValueError(f"unknown change-of-variables mode {cv_mode!r}")


@functools.partial(jax.jit, static_argnames=("cv_mode",))
def _cv_energy_and_bound_kernel(pv, q_matrix, v_vector, scaled_by,
                                cv_mode, lo, hi, S):
    """Change-of-variables + energies + rounding bound in ONE dispatch.

    Measured honestly (docs/ROADMAP.md "small-batch dispatch latency"):
    back-to-back dispatches PIPELINE through the TPU tunnel, so this
    fusion is wall-neutral vs the two-dispatch epilogue (74 vs 76 ms
    median at batch 1000, N=70, interleaved A/B).  What it still buys:
    one fewer dispatch in the tunnel queue and no materialised (batch, n)
    confs buffer — useful when many solves pipeline through one host."""
    confs = _apply_cv(pv, cv_mode, lo, hi, S)
    return _energy_and_bound_kernel(confs, q_matrix, v_vector, scaled_by)


@functools.partial(jax.jit, static_argnames=("cv_mode",))
def _cv_energy_kernel(pv, q_matrix, v_vector, scaled_by, cv_mode, lo, hi, S):
    confs = _apply_cv(pv, cv_mode, lo, hi, S)
    return _energy_kernel(confs, q_matrix, v_vector, scaled_by)


@functools.partial(jax.jit, static_argnames=("cv_mode",))
def _take_cv_kernel(pv, idx, cv_mode, lo, hi, S):
    """Gather ambiguous readout rows and apply the device cv.

    The rows are genuine f32 configurations cv(pv[idx]); their f64
    energies replace the ambiguous fused-pass values.  The fused pass may
    round kept-f32 rows slightly differently than this standalone cv, but
    only within the per-row rounding bound that defines ambiguity — so no
    gap statistic can differ between the fused and two-dispatch paths."""
    rows = jnp.take(pv, idx, axis=0)
    return _apply_cv(rows, cv_mode, lo, hi, S)


def ambiguous_readout_rows(e, opt, n, abs_e=None, gap_margin=None, top_k=64):
    """Bool mask of rows a float32 energy pass cannot safely classify.

    Shared by :meth:`ProblemInstance.compute_energy_readout64` and the
    sweep's batched readout.  ``e`` is the float32-computed (widened)
    minimization energy vector; a row is ambiguous when its optimality gap
    sits within the rounding margin of any gap threshold, its |energy| is
    too small for a well-conditioned relative gap, its gap is non-finite,
    or it is among the ``top_k`` best rows (exact best value / argmax).

    ``abs_e`` (the device-evaluated absolute-value energy) activates the
    rigorous per-row bound |fl(e) − e| ≤ γₙ·abs_e; otherwise the fixed
    ``gap_margin`` (in gap percentage points) applies.
    """
    pos = -e  # Solution's positive-objective convention
    with np.errstate(divide="ignore", invalid="ignore"):
        gap = (opt - pos) * 100.0 / np.abs(pos)
        if abs_e is not None:
            # gamma_n with headroom for coefficient-storage rounding, the
            # scaled_by multiply, XLA reduction order, and the MXU's
            # f32-equivalent multi-pass matmul mode.
            gamma = 16.0 * (n + 8) * 2.0 ** -23
            de = gamma * np.asarray(abs_e, np.float64) + 1e-12
            dgap = 100.0 * (abs(opt) + 2.0 * np.abs(pos)) / (pos * pos) * de
        else:
            dgap = float(gap_margin)
        thr = np.array([0.1, 1.0, 2.0, 3.0, 4.0, 5.0, 10.0])
        dist = np.abs(gap[:, None] - thr[None, :]).min(axis=1)
        near = dist < dgap
    near |= np.abs(pos) < 1e-3 * max(abs(opt), 1.0)
    near |= ~np.isfinite(gap)
    k = min(int(top_k), e.shape[0])
    if k:
        near[np.argpartition(e, k - 1)[:k]] = True
    return near


def parse_instance_file(file_path: str, file_delimiter: str = "\t"):
    """Parse a ``.in`` file into host NumPy arrays + metadata dict.

    Uses the C++ tokenizer from :mod:`ccvm_tpu.native` when available for
    O(N^2) values; falls back to pure Python. Sign conventions match the
    reference loader exactly (V and Q negated).
    """
    with open(file_path, "r") as stream:
        lines = stream.readlines()

    try:
        instance_info = lines[0].rstrip("\n").split(file_delimiter)
        problem_size = int(instance_info[0])
        meta = {
            "problem_size": problem_size,
            "optimal_sol": float(instance_info[1]),
            "best_sol": float(instance_info[2]),
            "optimality": instance_info[3].lower() == "true",
            "sol_time_gb": float(instance_info[4]),
            "sol_time_bfgs": float(instance_info[5]),
            # seed = instance_info[6] is discarded, as in the reference (:172)
            "num_frac_values": int(instance_info[7]),
        }

        from ccvm_tpu.native import fast_parse_matrix  # lazy; optional C++ path

        body = fast_parse_matrix(
            lines[1 : problem_size + 2], file_delimiter, problem_size
        )
        v_vector = -body[0, :]
        q_matrix = -body[1:, :]

        solution_vector = []
        if len(lines) > problem_size + 2:
            for tok in lines[problem_size + 2].rstrip("\n").split(file_delimiter):
                if tok != "":
                    solution_vector.append(float(tok))
    except Exception as e:  # match the reference's blanket error (:203-204)
        raise Exception("Error reading instance file: " + str(e))

    return (
        q_matrix.astype(np.float64),
        v_vector.astype(np.float64),
        solution_vector,
        meta,
    )


class ProblemInstance:
    """Defines a BoxQP problem instance (reference ``problem_instance.py:20``)."""

    def __init__(
        self,
        device="cpu",
        instance_type="tuning",
        file_path=None,
        file_delimiter="\t",
        name=None,
        solution_bounds=(0.0, 1.0),
    ):
        self.problem_size = None
        self.optimal_sol = None
        self.best_sol = None
        self.optimality = None
        self.sol_time_gb = None
        self.sol_time_bfgs = None
        self.num_frac_values = None
        self.q_matrix = None
        self.v_vector = None
        self.solution_vector = None
        self.scaled_by = 1
        self.device = validate_device(device)
        self._custom_name = False
        self.file_delimiter = file_delimiter
        self.file_path = file_path

        instance_values = set(item.value for item in InstanceType)
        if instance_type in instance_values:
            self.instance_type = instance_type
        else:
            raise ValueError("instance_type must be tuning or test")

        if name:
            self.name = name
            self._custom_name = True
        if file_path:
            self.load_instance(
                device=device,
                instance_type=instance_type,
                file_path=file_path,
                file_delimiter=file_delimiter,
            )
        self.problem_category = "boxqp"
        self.solution_bounds = solution_bounds

    @property
    def solution_bounds(self):
        """(min, max) allowed in the solution vector (reference ``:97-114``)."""
        return self._solution_bounds

    @solution_bounds.setter
    def solution_bounds(self, bounds):
        if len(bounds) != 2:
            raise ValueError(
                "solution_bounds must be a tuple of size 2, containing the"
                " minimum and maximum bounds (inclusive)"
            )
        elif bounds[0] >= bounds[1]:
            raise ValueError(
                "Minimum solution bound must be less than maximum solution bound"
            )
        else:
            self._solution_bounds = bounds

    def load_instance(
        self, device="cpu", instance_type="tuning", file_path=None, file_delimiter=None
    ):
        """Loads a box-constrained problem from a file (reference ``:116-224``)."""
        if not file_path and not self.file_path:
            raise Exception("No file path specified, cannot load instance.")
        if file_path:
            self.file_path = file_path
        file_path = self.file_path

        if file_delimiter:
            self.file_delimiter = file_delimiter
        file_delimiter = self.file_delimiter

        q_np, v_np, solution_vector, meta = parse_instance_file(
            file_path, file_delimiter
        )

        self.device = validate_device(device)
        self.instance_type = instance_type
        self.problem_size = meta["problem_size"]
        self.optimal_sol = meta["optimal_sol"]
        self.best_sol = meta["best_sol"]
        self.optimality = meta["optimality"]
        self.sol_time_gb = meta["sol_time_gb"]
        self.sol_time_bfgs = meta["sol_time_bfgs"]
        self.num_frac_values = meta["num_frac_values"]
        # Full-precision host copies for the float64 readout energy (the
        # device compute path stays float32).
        self._q64 = q_np
        self._v64 = v_np
        self.q_matrix = put(q_np.astype(np.float32), device)
        self.v_vector = put(v_np.astype(np.float32), device)
        self.solution_vector = solution_vector
        self.scaled_by = 1

        if not self._custom_name:
            # Name the instance after the file (reference :221-224)
            self.name = file_path.split("/")[-1].split(".")[0]

    def _mesh_matched_coefs(self, confs):
        """Q/V placed compatibly with ``confs``: when confs come out of a
        mesh-sharded solve, replicate the problem data over the same mesh so
        the reduction stays distributed."""
        q, v = self.q_matrix, self.v_vector
        sharding = getattr(confs, "sharding", None)
        mesh = getattr(sharding, "mesh", None)
        if mesh is not None and getattr(mesh, "size", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(mesh, PartitionSpec())
            q = jax.device_put(q, replicated)
            v = jax.device_put(v, replicated)
        return q, v

    def compute_energy(self, confs):
        """Objective value 0.5 xQx + Vx for a batch of configurations
        (reference ``:226-241``)."""
        confs = jnp.asarray(confs)
        q, v = self._mesh_matched_coefs(confs)
        return _energy_kernel(confs, q, v, jnp.float32(self.scaled_by))

    def compute_energy_host64(self, confs):
        """Objective value in float64 on the host (readout precision).

        Float32 evaluation of 0.5 xQx + Vx carries ~1e-4 relative rounding
        under the cancellations typical of these instances — enough to blur
        the 0.1% optimality-gap boundary and to "beat" a certified optimum by
        rounding.  Solution statistics therefore use this full-precision
        evaluation of the ORIGINAL (unscaled) coefficients; it costs one
        device->host transfer of the readout variables, which the Solution
        assembly performs anyway.  Accepts any leading batch dims.
        """
        x = np.asarray(confs, np.float64)
        q64 = getattr(self, "_q64", None)
        if q64 is not None:
            q, v, scale = q64, self._v64, 1.0
        else:  # programmatically-built instance: fall back to device coefs
            q = np.asarray(self.q_matrix, np.float64)
            v = np.asarray(self.v_vector, np.float64)
            scale = float(self.scaled_by)
        # Plain @ hits BLAS dgemm; einsum would take the slow C loop path.
        qx = x @ q
        e = 0.5 * np.sum(x * qx, axis=-1) + x @ v
        return e * scale

    def compute_energy_readout64(self, confs, gap_margin=None, top_k=64,
                                 change_vars=None):
        """float64-grade readout energies with a device-side f32 first pass.

        ``compute_energy_host64`` transfers the FULL (batch, n) readout to
        the host — ~18 MB at the headline batch 65536, which through the
        TPU tunnel costs ~1 s and dominates the end-to-end solve.  Only two
        things downstream actually need float64 precision: which side of
        each optimality-gap threshold a row falls on, and the best
        objective value.  So: compute f32 energies ON DEVICE (one batched
        contraction), transfer just the (batch,) energy vector, and
        re-evaluate in float64 only the rows that f32 cannot classify,
        plus the ``top_k`` best rows (exact best value / argmax) and any
        row whose tiny |energy| makes the relative gap ill-conditioned.
        Rows outside the margin keep their f32 value widened to f64 — they
        cannot change any Solution statistic.

        ``gap_margin=None`` (default) uses a **rigorous per-row bound**: a
        second device pass evaluates the absolute-value energy
        ``0.5 |x||Q||x| + |V||x|``, whose scaled sum bounds the f32
        rounding of the real energy (standard forward error analysis,
        |fl(e) − e| ≤ γ_n · Σ|terms| with γ_n ≈ n·u); propagated through
        the gap formula this gives each row its own margin — typically
        ~0.01 gap-points, so a converged batch clustered at gap ≈ 0 is NOT
        re-transferred just for sitting near the 0.1% threshold.  A float
        ``gap_margin`` overrides with a fixed margin in gap points.

        Falls back to :meth:`compute_energy_host64` when no optimum is
        recorded (margin undefined) or under multi-process execution
        (shards not host-addressable).

        ``change_vars``: optional ``(mode, lo, hi, S)`` with mode in
        {"boxqp", "langevin"} and scalar ``S`` — fuses the solver's
        change-of-variables map into the energy dispatch, so ``confs`` is
        the RAW readout variable and the box-coordinate configurations
        never cost their own dispatch or (batch, n) buffer.  Wall-neutral
        through the pipelining TPU tunnel (measured — see
        :func:`_cv_energy_and_bound_kernel`); readout statistics are
        unchanged (rows whose f32 rounding could matter are re-evaluated
        in f64 either way).
        """
        import jax

        confs = jnp.asarray(confs)
        opt = self.optimal_sol
        cv = None
        if change_vars is not None:
            mode, lo, hi, S = change_vars
            if np.ndim(S) != 0:
                raise ValueError(
                    "fused change_vars requires a scalar S (per-variable S "
                    "rows cannot be gathered consistently); apply the "
                    "change of variables before calling instead."
                )
            cv = (mode, jnp.float32(lo), jnp.float32(hi), jnp.float32(S))
        if opt is None or confs.ndim != 2 or jax.process_count() > 1:
            if cv is not None:
                confs = _take_cv_kernel(
                    confs, jnp.arange(confs.shape[0]), cv[0], *cv[1:]
                )
            return self.compute_energy_host64(np.asarray(confs))

        q, v = self._mesh_matched_coefs(confs)
        if gap_margin is None:
            # One device dispatch and ONE transfer for the f32 energies and
            # their abs-value rounding-bound inputs (a second np.asarray
            # costs another tunnel round trip, ~10-30 ms).
            if cv is not None:
                raw = _cv_energy_and_bound_kernel(
                    confs, q, v, jnp.float32(self.scaled_by), cv[0], *cv[1:]
                )
            else:
                raw = _energy_and_bound_kernel(
                    confs, q, v, jnp.float32(self.scaled_by)
                )
            both = np.asarray(raw, np.float64)
            e, abs_e = both[0], both[1]
        else:
            if cv is not None:
                raw = _cv_energy_kernel(
                    confs, q, v, jnp.float32(self.scaled_by), cv[0], *cv[1:]
                )
            else:
                raw = _energy_kernel(confs, q, v, jnp.float32(self.scaled_by))
            e = np.asarray(raw, np.float64)
            abs_e = None
        near = ambiguous_readout_rows(
            e, opt, confs.shape[-1], abs_e=abs_e, gap_margin=gap_margin,
            top_k=top_k,
        )
        idx = np.flatnonzero(near)
        if idx.size:
            if cv is not None:
                rows = np.asarray(
                    _take_cv_kernel(confs, jnp.asarray(idx), cv[0], *cv[1:])
                )
            else:
                rows = np.asarray(jnp.take(confs, jnp.asarray(idx), axis=0))
            e[idx] = self.compute_energy_host64(rows)
            # A kept-f32 row can undershoot the true (f64) best energy by up
            # to its rounding bound and steal max(-e); clamp kept rows to
            # the recomputed best.  The shift is below every kept row's gap
            # margin, so no gap statistic can change — and
            # best_objective_value is always a float64 evaluation.
            e = np.maximum(e, e[idx].min())
        return e

    def scale_coefs(self, scaling_factor):
        """Divide problem coefficients by ``scaling_factor``; consecutive calls
        stack multiplicatively (reference ``:243-255``)."""
        scaling_factor = jnp.asarray(scaling_factor)
        self.q_matrix = self.q_matrix / scaling_factor
        self.v_vector = self.v_vector / scaling_factor
        self.scaled_by = self.scaled_by * float(scaling_factor)
