"""Tensor + data parallel BoxQP solve over a 2-D device mesh.

Demonstrates the multi-chip path the reference cannot express (it is
strictly single-device; SURVEY.md §2.7): the trajectory batch shards over
the mesh's "batch" axis and the Q matvec contraction shards over "model"
with `psum_scatter` collectives riding the ICI
(`ccvm_tpu.parallel.tp`).  Any solver routes through it automatically when
its mesh has a nontrivial model axis.

Works on real multi-chip hardware as-is; on a single-host dev box, force a
virtual 8-device CPU platform:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/tensor_parallel_boxqp.py
"""

import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    # Default to a virtual 8-device mesh so the example runs anywhere.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

try:  # the TPU image's PJRT plugin overrides JAX_PLATFORMS; force through config
    jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))
except Exception:
    pass

from ccvm_tpu import LangevinSolver, ProblemInstance  # noqa: E402
from ccvm_tpu.parallel import make_mesh  # noqa: E402


def main():
    n_dev = len(jax.devices())
    tp = 2 if n_dev % 2 == 0 and n_dev >= 2 else 1
    mesh = make_mesh(n_dev, tp=tp)
    print(f"mesh: {dict(mesh.shape)} over {n_dev} {jax.devices()[0].platform} devices")

    instance = ProblemInstance(
        instance_type="test",
        file_path=os.path.join(
            os.path.dirname(__file__),
            "benchmarking_instances/single_test_instance/tuningH020-100-0.in",
        ),
        device="cpu" if jax.devices()[0].platform == "cpu" else "tpu",
    )

    solver = LangevinSolver(device=instance.device, batch_size=512, mesh=mesh)
    solver.parameter_key = {
        20: {"dt": 0.002, "S": 0.5, "iterations": 2000, "sigma": 0.5,
             "feedback_scale": 1.0}
    }
    instance.scale_coefs(solver.get_scaling_factor(instance.q_matrix))

    solution = solver(instance, post_processor="grad-descent", seed=42)
    print(f"best objective: {solution.best_objective_value:.6f} "
          f"(known optimum {instance.optimal_sol})")
    print(f"success fractions: {solution.solution_performance}")


if __name__ == "__main__":
    main()
