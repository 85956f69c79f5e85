"""DL-CCVM example: solve the bundled single test instance with a batch of
1000 trajectories (mirrors the reference's examples/ccvm_boxqp_dl.py against
our TPU-native framework)."""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from ccvm_tpu.problem_classes.boxqp import ProblemInstance
from ccvm_tpu.runtime import default_device
from ccvm_tpu.solvers import DLSolver

# Inputs
TEST_INSTANCES_DIR_NAME = "single_test_instance"
TEST_INSTANCES_PATH = f"./benchmarking_instances/{TEST_INSTANCES_DIR_NAME}/"

if __name__ == "__main__":
    batch_size = 1000
    solver = DLSolver(device=default_device(), batch_size=batch_size)

    solver.parameter_key = {
        20: {
            "pump": 8.0,
            "feedback_scale": 100,
            "dt": 0.001,
            "iterations": 1500,
            "noise_ratio": 10,
        },
    }

    test_instances_files = [f for f in glob.glob(TEST_INSTANCES_PATH + "*.in")]
    for instance_file in test_instances_files:
        boxqp_instance = ProblemInstance(
            instance_type="test",
            file_path=instance_file,
            device=solver.device,
        )

        # Scale the problem's coefficients for more stable optimization
        boxqp_instance.scale_coefs(solver.get_scaling_factor(boxqp_instance.q_matrix))

        # algorithm_parameters=AdamParameters(...) selects the Adam variant
        solution = solver(
            instance=boxqp_instance,
            post_processor=None,
        )

        print(solution)
