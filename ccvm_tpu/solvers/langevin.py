"""Langevin solver façade (API parity with
``ccvm_simulators/solvers/langevin_solver.py``; compute in
:mod:`ccvm_tpu.dynamics.langevin` / :mod:`ccvm_tpu.ops.pallas_kernels`).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from pandas import DataFrame

from ccvm_tpu.dynamics import common
from ccvm_tpu.dynamics import langevin as dyn
from ccvm_tpu.native import write_sample_rows
from ccvm_tpu.post_processor.factory import PostProcessorFactory
from ccvm_tpu.solution import Solution
from ccvm_tpu.solvers.algorithms import AdamParameters
from ccvm_tpu.solvers.base import CCVMSolver

LANGEVIN_SCALING_MULTIPLIER = 0.05
"""Scaling multiplier used in get_scaling_factor (reference
``langevin_solver.py:12``)."""


class LangevinSolver(CCVMSolver):
    """Models typical Langevin dynamics as a system of SDEs
    (reference ``langevin_solver.py:17``)."""

    def __init__(
        self,
        device,
        problem_category="boxqp",
        batch_size=1000,
        mesh=None,
        backend="auto",
        timing="sync",
        kernel_rng="popcount32",
    ):
        """
        Args:
            device (str): "cpu", "cuda" or "tpu".
            problem_category (str): only "boxqp".
            batch_size (int): number of simultaneous trajectories.
            mesh: optional jax Mesh for batch-sharded multi-chip solves.
            backend (str): "auto" | "lax" | "pallas" — "pallas" runs the whole
                solve loop in a fused TPU kernel; "auto" picks it on TPU.
            timing (str): "sync" | "async" — see :class:`CCVMSolver`.
            kernel_rng (str): the Wiener-increment generator inside the fused
                kernel — "popcount32" (default; one PRNG word per normal,
                exact mean/variance, weak-order-1 correct), "popcount"
                (three words: binomial+uniform smoothing) or "box_muller"
                (exact Gaussian, ~4x slower steps).  All three pass the
                5-sigma solution-statistics bands of tools/tpu_validate.py;
                the lax backend always uses exact Gaussians.
        """
        super().__init__(device, mesh=mesh, timing=timing)
        self.batch_size = batch_size
        self.backend = backend
        self.kernel_rng = kernel_rng
        self._scaling_multiplier = LANGEVIN_SCALING_MULTIPLIER
        self._method_selector(problem_category)
        self._default_fpga_machine_parameters = {
            "fpga_power": {
                20: 17.18,
                30: 18.13,
                40: 18.45,
                50: 19.03,
                60: 19.22,
                70: 19.32,
            },
            "fpga_runtimes": {
                20: 133e-6,
                30: 265e-6,
                40: 327e-6,
                50: 437e-6,
                60: 511e-6,
                70: 662e-6,
            },
        }

    @property
    def parameter_key(self):
        """Per-problem-size solver parameters; keys must be exactly
        {dt, S, iterations, sigma, feedback_scale}
        (reference ``langevin_solver.py:66-114``)."""
        return self._parameter_key

    @parameter_key.setter
    def parameter_key(self, parameters):
        expected_lparameter_key_set = set(
            ["dt", "S", "iterations", "sigma", "feedback_scale"]
        )
        for parameter_key in parameters.values():
            if parameter_key.keys() != expected_lparameter_key_set:
                raise ValueError(
                    "The parameter key is not valid for this solver. Expected keys: "
                    + str(expected_lparameter_key_set)
                    + " Given keys: "
                    + str(parameter_key.keys())
                )
        self._parameter_key = parameters
        self._is_tuned = False

    ##################################
    # Problem-category methods       #
    ##################################

    def _calculate_drift_boxqp(self, c, lower_limit=0, upper_limit=1, S=1):
        """Langevin drift (reference ``langevin_solver.py:117-139``)."""
        return dyn.drift_boxqp(
            jnp.asarray(c), self.q_matrix, self.v_vector, lower_limit, upper_limit, S
        )

    def _calculate_grads_boxqp(self, c, lower_limit=0, upper_limit=1, S=1):
        """Gradients (identical expression, reference ``:141-166``)."""
        return dyn.drift_boxqp(
            jnp.asarray(c), self.q_matrix, self.v_vector, lower_limit, upper_limit, S
        )

    def _change_variables_boxqp(self, problem_variables, lower_limit=0, upper_limit=1, S=1):
        return common.change_variables_boxqp(
            jnp.asarray(problem_variables), lower_limit, upper_limit, S
        )

    def _fit_to_constraints_boxqp(self, c, lower_clamp, upper_clamp):
        return common.fit_to_constraints_boxqp(jnp.asarray(c), lower_clamp, upper_clamp)

    def _append_samples_to_file(self, c_sample, evolution_file_object):
        """Write sampled c values as tab-delimited rows (problem_size x
        num_samples), reference ``langevin_solver.py:201-230``.

        Note: the reference's call site omits the required ``s_sample`` and
        crashes (``:736-740``); we write the c block only — documented fix.
        """
        write_sample_rows(evolution_file_object, np.asarray(c_sample))

    def _validate_fpga_machine_parameters(self, machine_parameters):
        required_keys = ["fpga_power", "fpga_runtimes"]
        missing_keys = [key for key in required_keys if key not in machine_parameters]
        if missing_keys:
            raise ValueError(
                f"Invalid fpga_machine_parameters: Missing required keys - {missing_keys}"
            )

    def tune(self, instances, post_processor=None, parameter_ranges=None, **kwargs):
        """Grid-search the parameter space on tuning instances and set
        ``parameter_key`` to the best found (the reference's tune is an
        unimplemented placeholder that crashes, ``langevin_solver.py:250-267``).
        """
        from ccvm_tpu.tuning import tune_solver

        best = tune_solver(
            self, instances, parameter_ranges=parameter_ranges,
            post_processor=post_processor, **kwargs,
        )
        self._parameter_key = best
        self._is_tuned = True
        return best

    ##################################
    # Machine models                 #
    ##################################

    def _fpga_machine_energy(self, machine_parameters=None):
        """FPGA energy model (reference ``langevin_solver.py:269-303``)."""
        if machine_parameters is None:
            machine_parameters = self._default_fpga_machine_parameters
        else:
            self._validate_fpga_machine_parameters(machine_parameters)

        def _fpga_machine_energy_callable(dataframe: DataFrame, problem_size: int):
            machine_time = machine_parameters["fpga_runtimes"][problem_size]
            machine_power = machine_parameters["fpga_power"][problem_size]
            return machine_power * machine_time

        return _fpga_machine_energy_callable

    def _fpga_machine_time(self, machine_parameters: dict = None):
        """FPGA time model (reference ``langevin_solver.py:305-366``)."""
        if machine_parameters is None:
            machine_parameters = self._default_fpga_machine_parameters
        else:
            self._validate_fpga_machine_parameters(machine_parameters)

        def _fpga_machine_time_callable(dataframe: DataFrame, problem_size: int):
            try:
                postprocessing_time = np.mean(dataframe["pp_time"].values)
            except KeyError as e:
                raise ValueError(
                    f"The given dataframe is missing required column: {e.args[0]}"
                )
            try:
                machine_time = (
                    machine_parameters["fpga_runtimes"][problem_size]
                    + postprocessing_time
                )
            except KeyError:
                raise ValueError(
                    f"The fpga_runtimes dict in given machine_parameters does not"
                    f" have an entry for problem size {problem_size}."
                )
            return machine_time

        return _fpga_machine_time_callable

    ##################################
    # Solve paths                    #
    ##################################

    def _make_params(self, S, dt, sigma, feedback_scale):
        lo, hi = self.solution_bounds
        return dyn.LangevinParams(
            S=np.asarray(S, np.float32),
            dt=np.float32(dt),
            sigma=np.float32(sigma),
            feedback_scale=np.float32(feedback_scale),
            lower_limit=np.float32(lo),
            upper_limit=np.float32(hi),
        )

    def _solve(self, key, params, iterations, evolution_step_size, hp=None):
        """Run the scanned (or fused-kernel, or mesh-sharded) solve;
        optionally record evolution samples segment by segment."""
        # Evaluated on every solve (including evolution sampling) so an
        # explicit backend="pallas" that a feature forces onto the lax path
        # logs the reason instead of silently degrading.
        # hp_in_kernel: the Langevin Adam variant has a fused kernel
        # (moments in VMEM scratch), so Adam solves stay on the fast path.
        use_pallas = self._use_pallas(evolution_step_size, params.S, hp,
                                      hp_in_kernel=True)
        if not evolution_step_size:
            if use_pallas:
                from ccvm_tpu.ops import pallas_kernels as kernels

                c = kernels.langevin_solve(
                    key, self.q_matrix, self.v_vector, params,
                    iterations=iterations, batch_size=self.batch_size,
                    rng=self.kernel_rng, hp=hp,
                )
                if c is not None:
                    return c
            tp_mesh = self._tp_mesh()
            if tp_mesh is not None:
                from ccvm_tpu.parallel import tp

                return tp.langevin_solve(
                    tp_mesh, key, self.q_matrix, self.v_vector, params,
                    iterations=iterations, batch_size=self.batch_size, hp=hp,
                )
            key, q, v, params = self._replicate_for_mesh(
                key, self.q_matrix, self.v_vector, params
            )
            return dyn.solve(
                key, q, v, params,
                iterations=iterations, batch_size=self.batch_size, hp=hp,
                shard=self._batch_sharding(),
            )

        # In-jit evolution sampling (reference schedule,
        # langevin_solver.py:427-433): the whole loop runs as ONE jit that
        # emits a sample after each segment — a single dispatch and a single
        # device sync instead of one per segment.
        num_samples, segments = self._evolution_sample_plan(
            iterations, evolution_step_size
        )
        c, samples = dyn.solve_sampled(
            key, self.q_matrix, self.v_vector, params,
            np.asarray(segments, np.int32), batch_size=self.batch_size, hp=hp,
        )
        self.c_sample = self._device_sample_stack(samples, num_samples)
        return c

    def _solve_adam(self, key, params, iterations, evolution_step_size, hyperparameters):
        return self._solve(
            key, params, iterations, evolution_step_size,
            hp=hyperparameters,
        )

    def __call__(
        self,
        instance,
        post_processor=None,
        evolution_step_size=None,
        evolution_file=None,
        algorithm_parameters=None,
        seed=None,
    ):
        """Solve a problem instance (reference ``langevin_solver.py:563-762``).

        Args beyond the reference: ``seed`` fixes the PRNG key for
        reproducible solves (defaults to a time-derived seed).
        """
        if instance.device != self.device:
            raise ValueError(
                f"The device type of the instance ({instance.device}) and the solver"
                f" ({self.device}) must match."
            )

        problem_size = instance.problem_size
        self.q_matrix = instance.q_matrix
        self.v_vector = instance.v_vector
        self.solution_bounds = instance.solution_bounds

        batch_size = self.batch_size

        try:
            dt = self.parameter_key[problem_size]["dt"]
            S = self.parameter_key[problem_size]["S"]
            iterations = self.parameter_key[problem_size]["iterations"]
            sigma = self.parameter_key[problem_size]["sigma"]
            feedback_scale = self.parameter_key[problem_size]["feedback_scale"]
        except KeyError as e:
            raise KeyError(
                f"The parameter '{e.args[0]}' for the given instance size is not defined."
            ) from e

        # 1-D per-variable S broadcasts to (batch, n), reference :629-635
        S = np.asarray(S, np.float32) if not np.isscalar(S) else S
        if np.ndim(S) == 1:
            if S.shape[0] == problem_size:
                S = np.outer(np.ones(batch_size, np.float32), S)
            else:
                raise ValueError("Tensor S size should be equal to problem size.")

        solve_time_start = time.time()

        self.c_sample = None
        if evolution_step_size:
            if evolution_step_size < 1:
                raise ValueError(
                    "The evolution step size must be greater than or equal to 1."
                )
            if evolution_file is None:
                evolution_file = f"./{instance.name}_evolution.txt"

        params = self._make_params(S, dt, sigma, feedback_scale)
        if seed is None:
            seed = np.random.SeedSequence().entropy % (2**31)
        key = jax.random.PRNGKey(int(seed))

        if algorithm_parameters is None:
            c = self._solve(key, params, iterations, evolution_step_size)
        elif isinstance(algorithm_parameters, AdamParameters):
            c = self._solve_adam(
                key, params, iterations, evolution_step_size,
                algorithm_parameters.to_hyperparameters(),
            )
        else:
            raise ValueError(
                f"Solver option type {type(algorithm_parameters)} is not supported."
            )
        if self.timing == "sync":
            c = jax.block_until_ready(c)
        # Per-instance normalized solve time (reference :704-708)
        solve_time = (time.time() - solve_time_start) / batch_size

        # Change of variables happens BEFORE post-processing for Langevin
        # (reference :711-723); jitted single-dispatch helper
        c_prime = common.langevin_change_variables(c, params.S)
        if post_processor:
            post_processor_object = PostProcessorFactory.create_postprocessor(
                post_processor
            )
            problem_variables = post_processor_object.postprocess(
                c_prime, self.q_matrix, self.v_vector
            )
            pp_time = post_processor_object.pp_time / batch_size
        else:
            problem_variables = c_prime
            pp_time = 0.0

        # Float64 host readout energy: solution statistics need more than
        # float32 precision near the 0.1% gap; the mixed-precision readout
        # (compute_energy_readout64) keeps the big (batch, n) array on
        # device and transfers only the energies + boundary rows;
        # the device->host transfer doubles as the pipeline's single sync.
        objval = instance.compute_energy_readout64(problem_variables)

        if self.timing == "async":
            solve_time = (time.time() - solve_time_start) / batch_size - pp_time

        if evolution_step_size:
            open(evolution_file, "w").close()
            batch_index = int(jnp.argmax(-objval))
            with open(evolution_file, "a") as evolution_file_obj:
                self._append_samples_to_file(
                    c_sample=self.c_sample[batch_index],
                    evolution_file_object=evolution_file_obj,
                )

        solution = Solution(
            problem_size=instance.problem_size,
            batch_size=batch_size,
            instance_name=instance.name,
            iterations=iterations,
            objective_values=objval,
            solve_time=solve_time,
            pp_time=pp_time,
            optimal_value=instance.optimal_sol,
            best_value=instance.best_sol,
            num_frac_values=instance.num_frac_values,
            solution_vector=instance.solution_vector,
            variables={"problem_variables": problem_variables},
            device=self.device,
        )

        if evolution_step_size:
            solution.evolution_file = evolution_file

        return solution
