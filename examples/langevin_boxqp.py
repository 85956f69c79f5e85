"""Langevin-dynamics example with grad-descent post-processing (parity with
the reference's ``examples/langevin_boxqp.py``, params per its ``:16-24``)."""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from ccvm_tpu.problem_classes.boxqp import ProblemInstance
from ccvm_tpu.runtime import default_device
from ccvm_tpu.solvers import LangevinSolver

TEST_INSTANCES_DIR_NAME = "single_test_instance"
TEST_INSTANCES_PATH = f"./benchmarking_instances/{TEST_INSTANCES_DIR_NAME}/"

if __name__ == "__main__":
    batch_size = 1000
    solver = LangevinSolver(device=default_device(), batch_size=batch_size)

    solver.parameter_key = {
        20: {
            "dt": 0.002,
            "S": 0.5,
            "iterations": 1500,
            "sigma": 0.5,
            "feedback_scale": 1.0,
        },
    }

    test_instances_files = [f for f in glob.glob(TEST_INSTANCES_PATH + "*.in")]
    for instance_file in test_instances_files:
        boxqp_instance = ProblemInstance(
            instance_type="test",
            file_path=instance_file,
            device=solver.device,
        )

        boxqp_instance.scale_coefs(solver.get_scaling_factor(boxqp_instance.q_matrix))

        solution = solver(
            instance=boxqp_instance,
            post_processor="grad-descent",
        )

        print(solution)
