"""Full pipeline example: solve -> Metadata JSON -> TTS + ETS plots
(parity with the reference's ``examples/ccvm_boxqp_plot.py:48-114``)."""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import matplotlib

matplotlib.use("Agg")  # headless environments
import matplotlib.pyplot as plt  # noqa: E402

from ccvm_tpu.ccvmplotlib import ccvmplotlib  # noqa: E402
from ccvm_tpu.metadata import Metadata  # noqa: E402
from ccvm_tpu.problem_classes.boxqp import ProblemInstance  # noqa: E402
from ccvm_tpu.runtime import default_device  # noqa: E402
from ccvm_tpu.solvers import DLSolver  # noqa: E402

# Inputs
TEST_INSTANCES_DIR_NAME = "single_test_instance"
TEST_INSTANCES_PATH = f"./benchmarking_instances/{TEST_INSTANCES_DIR_NAME}/"

# Outputs
METADATA_DIR = "./metadata"
PLOT_OUTPUT_DIR = "./plots"
TTS_PLOT_OUTPUT_DEST = f"{PLOT_OUTPUT_DIR}/DL-CCVM_TTS_tpu_plot.png"
ETS_PLOT_OUTPUT_DEST = f"{PLOT_OUTPUT_DIR}/DL-CCVM_ETS_tpu_plot.png"


if __name__ == "__main__":
    batch_size = 1000
    solver = DLSolver(device=default_device(), batch_size=batch_size)

    solver.parameter_key = {
        20: {
            "pump": 8.0,
            "dt": 0.005,
            "iterations": 15000,
            "noise_ratio": 10,
            "feedback_scale": 100,
        },
    }

    metadata_obj = Metadata(device=solver.device)
    test_instances_files = [f for f in glob.glob(TEST_INSTANCES_PATH + "*.in")]
    for instance_file in test_instances_files:
        boxqp_instance = ProblemInstance(
            instance_type="test",
            file_path=instance_file,
            device=solver.device,
        )
        boxqp_instance.scale_coefs(solver.get_scaling_factor(boxqp_instance.q_matrix))
        solution = solver(instance=boxqp_instance, post_processor=None)
        metadata_obj.add_to_result_metadata(solution.get_metadata_dict())

    metadata_filepath = metadata_obj.save_metadata_to_file(METADATA_DIR)

    if not os.path.isdir(PLOT_OUTPUT_DIR):
        os.makedirs(PLOT_OUTPUT_DIR)
        print("Plot folder doesn't exist yet. Creating: ", PLOT_OUTPUT_DIR)

    tts_plot_fig, tts_plot_ax = ccvmplotlib.plot_TTS(
        metadata_filepath=metadata_filepath,
        problem="BoxQP",
        machine_time_func=solver.machine_time(machine="cpu"),
    )
    ccvmplotlib.apply_default_tts_styling(tts_plot_fig, tts_plot_ax)
    tts_plot_fig.savefig(TTS_PLOT_OUTPUT_DEST)
    print(f"Successfully saved the plot to {TTS_PLOT_OUTPUT_DEST}")

    # ETS with customized machine parameters
    machine_parameters = {
        "cpu_power": {20: 5.0, 30: 5.0, 40: 5.0, 50: 5.0, 60: 5.0, 70: 5.0}
    }
    ets_plot_fig, ets_plot_ax = ccvmplotlib.plot_ETS(
        metadata_filepath=metadata_filepath,
        problem="BoxQP",
        machine_energy_func=solver.machine_energy(
            machine="cpu", machine_parameters=machine_parameters
        ),
    )
    ccvmplotlib.apply_default_ets_styling(ets_plot_fig, ets_plot_ax)
    ets_plot_fig.savefig(ETS_PLOT_OUTPUT_DEST)
    print(f"Successfully saved the plot to {ETS_PLOT_OUTPUT_DEST}")

    plt.close("all")
