"""MF-CCVM solver façade (API parity with
``ccvm_simulators/solvers/mf_solver.py``)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from pandas import DataFrame

from ccvm_tpu.dynamics import common
from ccvm_tpu.dynamics import mf as dyn
from ccvm_tpu.native import write_sample_rows
from ccvm_tpu.post_processor.factory import PostProcessorFactory
from ccvm_tpu.solution import Solution
from ccvm_tpu.solvers.algorithms import AdamParameters
from ccvm_tpu.solvers.base import CCVMSolver

MF_SCALING_MULTIPLIER = 0.05
"""Reference ``mf_solver.py:12``."""


class MFSolver(CCVMSolver):
    """Measurement-feedback CCVM solver (reference ``mf_solver.py:17``)."""

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
        super().__init__(device, mesh=mesh, timing=timing)
        self.batch_size = batch_size
        self.backend = backend
        self.kernel_rng = kernel_rng
        self._default_optics_machine_parameters = {
            "laser_clock": 100e-12,
            "FPGA_clock": 3.33e-9,
            "FPGA_fixed": 34,
            "FPGA_var_fac": 0.1,
            "FPGA_power": {
                20: 15.74,
                30: 16.97,
                40: 18.54,
                50: 20.25,
                60: 22.08,
                70: 24.01,
            },
            "buffer_time": 3.33e-9,
            "laser_power": 1000e-6,
            "postprocessing_power": {
                20: 4.87,
                30: 5.14,
                40: 5.11,
                50: 5.08,
                60: 5.09,
                70: 5.3,
            },
        }
        self._scaling_multiplier = MF_SCALING_MULTIPLIER
        self._method_selector(problem_category)

    @property
    def parameter_key(self):
        """Keys must be exactly {pump, feedback_scale, j, S, dt, iterations}
        (reference ``mf_solver.py:120-139``)."""
        return self._parameter_key

    @parameter_key.setter
    def parameter_key(self, parameters):
        expected_mfparameter_key_set = set(
            ["pump", "feedback_scale", "j", "S", "dt", "iterations"]
        )
        for parameter_key in parameters.values():
            if parameter_key.keys() != expected_mfparameter_key_set:
                raise ValueError(
                    "The parameter key is not valid for this solver. Expected keys: "
                    + str(expected_mfparameter_key_set)
                    + " Given keys: "
                    + str(parameter_key.keys())
                )
        self._parameter_key = parameters
        self._is_tuned = False

    ##################################
    # Problem-category methods       #
    ##################################

    def _calculate_drift_boxqp(
        self, mu, mu_tilde, sigma, pump, j, g, S, fs, lower_limit=0, upper_limit=1
    ):
        """Drift of mu and sigma (reference ``mf_solver.py:141-198``)."""
        return dyn.drift_boxqp(
            jnp.asarray(mu), jnp.asarray(mu_tilde), jnp.asarray(sigma),
            pump, j, g, S, fs, self.q_matrix, self.v_vector,
            lower_limit, upper_limit,
        )

    def _calculate_grads_boxqp(self, mu_tilde, S, fs, lower_limit=0, upper_limit=1):
        return dyn.grads_boxqp(
            jnp.asarray(mu_tilde), S, fs, self.q_matrix, self.v_vector,
            lower_limit, upper_limit,
        )

    def _change_variables_boxqp(self, problem_variables, lower_limit=0, upper_limit=1, S=1):
        return common.change_variables_boxqp(
            jnp.asarray(problem_variables), lower_limit, upper_limit, S
        )

    def _fit_to_constraints_boxqp(self, mu_tilde, lower_clamp, upper_clamp):
        return common.fit_to_constraints_boxqp(
            jnp.asarray(mu_tilde), lower_clamp, upper_clamp
        )

    def _append_samples_to_file(self, mu_sample, sigma_sample, evolution_file_object):
        """Write mu then sigma sample blocks (reference ``mf_solver.py:267-300``;
        note the MF writer omits trailing tabs)."""
        write_sample_rows(
            evolution_file_object, np.asarray(mu_sample), append_trailing_tab=False
        )
        write_sample_rows(
            evolution_file_object, np.asarray(sigma_sample), append_trailing_tab=False
        )

    def _is_valid_optics_machine_parameters(self, machine_parameters):
        required_keys = [
            "laser_clock",
            "FPGA_clock",
            "FPGA_fixed",
            "FPGA_var_fac",
            "FPGA_power",
            "buffer_time",
            "laser_power",
            "postprocessing_power",
        ]
        missing_keys = [key for key in required_keys if key not in machine_parameters]
        if missing_keys:
            raise ValueError(
                f"Invalid optics_machine_parameters: Missing required keys - {missing_keys}"
            )

    def tune(self, instances, post_processor=None, parameter_ranges=None, **kwargs):
        """Working grid-search tuner (see :mod:`ccvm_tpu.tuning`)."""
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

    def _roundtrip_time(self, machine_parameters, problem_size):
        """FPGA+optics roundtrip (reference ``mf_solver.py:404-412``)."""
        return (
            (
                machine_parameters["FPGA_fixed"]
                + machine_parameters["FPGA_var_fac"] * float(problem_size)
            )
            * machine_parameters["FPGA_clock"]
            + float(problem_size) * machine_parameters["laser_clock"]
            + machine_parameters["buffer_time"]
        )

    def _optics_machine_energy(self, machine_parameters=None):
        """MF-CCVM optics energy model (reference ``mf_solver.py:348-428``)."""
        if machine_parameters is None:
            machine_parameters = self._default_optics_machine_parameters
        else:
            self._is_valid_optics_machine_parameters(machine_parameters)

        def _optics_machine_energy_callable(dataframe: DataFrame, problem_size: int):
            self._validate_machine_energy_dataframe_columns(dataframe)
            try:
                pump = self.parameter_key[problem_size]["pump"]
                measure_strength = self.parameter_key[problem_size]["j"]
            except KeyError as e:
                raise KeyError(
                    f"The parameter '{e.args[0]}' for the given instance size:"
                    f" {problem_size} is not defined."
                ) from e

            iterations = np.mean(dataframe["iterations"].values)
            postprocessing_time = np.mean(dataframe["pp_time"].values)
            roundtrip_time = self._roundtrip_time(machine_parameters, problem_size)
            optics_power = machine_parameters["FPGA_power"][
                problem_size
            ] + machine_parameters["laser_power"] * (pump + 1 + measure_strength)
            optics_energy = (
                roundtrip_time * optics_power
                - machine_parameters["FPGA_power"][problem_size]
                * machine_parameters["buffer_time"]
            ) * iterations
            postprocessing_energy = (
                machine_parameters["postprocessing_power"][problem_size]
                * postprocessing_time
            )
            return optics_energy + postprocessing_energy

        return _optics_machine_energy_callable

    def _optics_machine_time(self, machine_parameters: dict = None):
        """MF-CCVM optics time model: roundtrip(N) * iterations + pp_time
        (reference ``mf_solver.py:430-491``)."""
        if machine_parameters is None:
            machine_parameters = self._default_optics_machine_parameters
        else:
            self._is_valid_optics_machine_parameters(machine_parameters)

        def _optics_machine_time_callable(dataframe: DataFrame, problem_size: int):
            try:
                iterations = np.mean(dataframe["iterations"].values)
                postprocessing_time = np.mean(dataframe["pp_time"].values)
            except KeyError as e:
                raise KeyError(
                    f"The given dataframe is missing the {e.args[0]} column."
                    " Required columns are: ['iterations', 'pp_time']."
                )
            roundtrip_time = self._roundtrip_time(machine_parameters, problem_size)
            return roundtrip_time * iterations + postprocessing_time

        return _optics_machine_time_callable

    ##################################
    # Solve paths                    #
    ##################################

    def _make_params(self, pump, S, dt, j, feedback_scale, g, iterations):
        lo, hi = self.solution_bounds
        return dyn.MFParams(
            pump=np.float32(pump),
            S=np.asarray(S, np.float32),
            dt=np.float32(dt),
            j=np.float32(j),
            feedback_scale=np.float32(feedback_scale),
            g=np.float32(g),
            lower_limit=np.float32(lo),
            upper_limit=np.float32(hi),
            iterations=np.float32(iterations),
        )

    def _solve(
        self, key, params, iterations, pump_rate_flag, evolution_step_size, hp=None
    ):
        # Evaluated on every solve (including evolution sampling) so an
        # explicit backend="pallas" that a feature forces onto the lax path
        # logs the reason instead of silently degrading.
        # hp_in_kernel: the MF Adam variant has a fused kernel (moment
        # arrays in VMEM scratch), so Adam solves stay fused.
        use_pallas = self._use_pallas(evolution_step_size, params.S, hp,
                                      hp_in_kernel=True)
        if not evolution_step_size:
            if use_pallas:
                from ccvm_tpu.ops import pallas_kernels as kernels

                out = kernels.mf_solve(
                    key, self.q_matrix, self.v_vector, params,
                    iterations=iterations, batch_size=self.batch_size,
                    pump_rate_flag=pump_rate_flag, rng=self.kernel_rng,
                    hp=hp,
                )
                if out is not None:
                    return out
            tp_mesh = self._tp_mesh()
            if tp_mesh is not None:
                from ccvm_tpu.parallel import tp

                return tp.mf_solve(
                    tp_mesh, key, self.q_matrix, self.v_vector, params,
                    iterations=iterations, batch_size=self.batch_size,
                    pump_rate_flag=pump_rate_flag, hp=hp,
                )
            key, q, v, params = self._replicate_for_mesh(
                key, self.q_matrix, self.v_vector, params
            )
            return dyn.solve(
                key, q, v, params,
                iterations=iterations, batch_size=self.batch_size,
                pump_rate_flag=pump_rate_flag, hp=hp,
                shard=self._batch_sharding(),
            )

        # In-jit evolution sampling: one dispatch, one sync (see langevin.py);
        # the readout mu_tilde (last iteration, clamped) comes from
        # solve_sampled, matching dyn.solve.
        num_samples, segments = self._evolution_sample_plan(
            iterations, evolution_step_size
        )
        (mu, mu_tilde, sigma), (mu_samp, sigma_samp) = dyn.solve_sampled(
            key, self.q_matrix, self.v_vector, params,
            np.asarray(segments, np.int32), batch_size=self.batch_size,
            pump_rate_flag=pump_rate_flag, hp=hp,
        )
        self.mu_sample = self._device_sample_stack(mu_samp, num_samples)
        self.sigma_sample = self._device_sample_stack(sigma_samp, num_samples)
        return mu, mu_tilde, sigma

    def _solve_adam(
        self, key, params, iterations, pump_rate_flag, evolution_step_size,
        hyperparameters,
    ):
        return self._solve(
            key, params, iterations, pump_rate_flag, evolution_step_size,
            hp=hyperparameters,
        )

    def __call__(
        self,
        instance,
        post_processor=None,
        g=0.01,
        pump_rate_flag=True,
        evolution_step_size=None,
        evolution_file=None,
        algorithm_parameters=None,
        seed=None,
    ):
        """Solve an instance (reference ``mf_solver.py:766-989``)."""
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
            pump = self.parameter_key[problem_size]["pump"]
            dt = self.parameter_key[problem_size]["dt"]
            iterations = self.parameter_key[problem_size]["iterations"]
            j = self.parameter_key[problem_size]["j"]
            feedback_scale = self.parameter_key[problem_size]["feedback_scale"]
            S = self.parameter_key[problem_size]["S"]
            S = np.asarray(S, np.float32) if not np.isscalar(S) else S
            if np.ndim(S) == 1:
                if S.shape[0] == problem_size:
                    S = np.outer(np.ones(batch_size, np.float32), S)
                else:
                    raise ValueError("Tensor S size should be equal to problem size.")
        except KeyError as e:
            raise KeyError(
                f"The parameter '{e.args[0]}' for the given instance size is not"
                " defined."
            ) from e

        solve_time_start = time.time()

        self.mu_sample = None
        self.sigma_sample = None
        if evolution_step_size:
            if evolution_step_size < 1:
                raise ValueError(
                    "The evolution step size must be greater than or equal to 1."
                )
            if evolution_file is None:
                evolution_file = f"./{instance.name}_evolution.txt"

        params = self._make_params(pump, S, dt, j, feedback_scale, g, iterations)
        if seed is None:
            seed = np.random.SeedSequence().entropy % (2**31)
        key = jax.random.PRNGKey(int(seed))

        if algorithm_parameters is None:
            mu, mu_tilde, sigma = self._solve(
                key, params, iterations, pump_rate_flag, evolution_step_size
            )
        elif isinstance(algorithm_parameters, AdamParameters):
            mu, mu_tilde, sigma = self._solve_adam(
                key, params, iterations, pump_rate_flag, evolution_step_size,
                algorithm_parameters.to_hyperparameters(),
            )
        else:
            raise ValueError(
                f"Solver option type {type(algorithm_parameters)} is not supported."
            )
        if self.timing == "sync":
            mu_tilde = jax.block_until_ready(mu_tilde)
        solve_time = (time.time() - solve_time_start) / batch_size

        lo, hi = self.solution_bounds
        # MF post-processes the CHANGED variables and uses the post-processor
        # output directly (reference mf_solver.py:927-948)
        if post_processor:
            post_processor_object = PostProcessorFactory.create_postprocessor(
                post_processor
            )
            problem_variables = post_processor_object.postprocess(
                self.change_variables(mu_tilde, lo, hi, params.S),
                self.q_matrix,
                self.v_vector,
            )
            pp_time = post_processor_object.pp_time / batch_size
        else:
            problem_variables = self.change_variables(mu_tilde, lo, hi, params.S)
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
                    mu_sample=self.mu_sample[batch_index],
                    sigma_sample=self.sigma_sample[batch_index],
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
            variables={
                "problem_variables": problem_variables,
                "mu": mu,
                "sigma": sigma,
            },
            device=self.device,
        )

        if evolution_step_size:
            solution.evolution_file = evolution_file

        return solution
