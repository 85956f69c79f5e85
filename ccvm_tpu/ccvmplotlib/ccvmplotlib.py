"""Plotting library for CCVM solver results (API parity with
``ccvm_simulators/ccvmplotlib/ccvmplotlib.py``): TTS, ETS and
success-probability plots with median + IQR styling, all host-side
matplotlib/pandas over the metadata JSON produced by :mod:`ccvm_tpu.metadata`.
"""

from __future__ import annotations

import math

import matplotlib
import matplotlib.pyplot as plt
import numpy as np
import pandas
from matplotlib import cm

from ccvm_tpu.ccvmplotlib.problem_metadata import ProblemMetadataFactory

TTS_UPPER_LIMIT = 1e20  # Approximate age of the universe in sec.
PERC_GAP_LABEL_MAP = {
    "optimal": r"0.1% gap",
    "one_percent": r"1% gap",
    "two_percent": r"2% gap",
    "three_percent": r"3% gap",
    "four_percent": r"4% gap",
    "five_percent": r"5% gap",
    "ten_percent": r"10% gap",
}


class ccvmplotlib:
    """A generic plotting library for problems solved by CCVM solvers."""

    @staticmethod
    def __plot_core(plotting_df, fig=None, ax=None):
        """Median line + IQR band per gap level."""
        x_data = plotting_df.index

        if not ax or not fig:
            fig, ax = plt.subplots()

        color_iter = cm.rainbow(
            np.linspace(0, 1, len(plotting_df.columns.levels[0]))
        )
        for lvl0_column_name, color in zip(plotting_df.columns.levels[0], color_iter):
            ax.fill_between(
                x_data,
                list(plotting_df[lvl0_column_name, "25"]),
                list(plotting_df[lvl0_column_name, "75"]),
                color=color,
                alpha=0.2,
            )
            ax.plot(
                x_data,
                plotting_df[lvl0_column_name, "50"],
                linestyle="-",
                marker="s",
                label=PERC_GAP_LABEL_MAP.get(lvl0_column_name, lvl0_column_name),
                color=color,
                linewidth=4.0,
            )

        ax.plot(
            [], [], linestyle="-", marker="s", label="(median)", color="black",
            linewidth=4.0,
        )
        ax.fill_between([], [], alpha=0.2, label="(IQR)")
        return (fig, ax)

    @staticmethod
    def plot_TTS(metadata_filepath, problem, machine_time_func, fig=None, ax=None):
        """Plot Time-To-Solution vs problem size.

        Raises:
            ValueError: When TTS medians exceed the plottable limit.
        """
        problem_metadata = ProblemMetadataFactory.create_problem_metadata(problem)
        problem_metadata.ingest_metadata(metadata_filepath)
        plotting_df = problem_metadata.generate_plot_data(
            metric_func=machine_time_func
        )

        (fig, ax) = ccvmplotlib.__plot_core(plotting_df, fig, ax)

        min_median = np.inf
        max_median = -np.inf
        for lvl0_column in plotting_df.columns.levels[0]:
            min_median = min(min_median, np.min(plotting_df[lvl0_column, "50"]))
            max_median = max(max_median, np.max(plotting_df[lvl0_column, "50"]))

        if min_median >= TTS_UPPER_LIMIT:
            raise ValueError(
                "TTS values are too large to plot. Please check the result"
                f" data. Minimum TTS median value: {min_median}"
            )
        upper_lim = 10 ** (
            math.ceil(np.log10(min(min_median * (1e6), max_median))) + 1
        )
        lower_lim = 10 ** (math.floor(np.log10(min_median)) - 1)

        ax.set_ylim(lower_lim, upper_lim)
        ax.set_yscale("log")
        ax.set_xticks(plotting_df.index)
        return (fig, ax)

    @staticmethod
    def plot_ETS(metadata_filepath, problem, machine_energy_func, fig=None, ax=None):
        """Plot Energy-To-Solution vs problem size."""
        problem_metadata = ProblemMetadataFactory.create_problem_metadata(problem)
        problem_metadata.ingest_metadata(metadata_filepath)
        plotting_df = problem_metadata.generate_plot_data(
            metric_func=machine_energy_func
        )

        (fig, ax) = ccvmplotlib.__plot_core(plotting_df, fig, ax)
        plt.yscale("log")
        ax.set_xticks(plotting_df.index)
        return (fig, ax)

    @staticmethod
    def plot_success_prob(metadata_filepath, problem, fig=None, ax=None):
        """Plot success probability vs problem size.

        Raises:
            ValueError: When all success probabilities are zero.
        """
        problem_metadata = ProblemMetadataFactory.create_problem_metadata(problem)
        problem_metadata.ingest_metadata(metadata_filepath)
        plotting_df = problem_metadata.generate_success_prob_plot_data()
        x_data = plotting_df.index.tolist()

        if not ax or not fig:
            fig, ax = plt.subplots()

        color_iter = cm.rainbow(
            np.linspace(0, 1, len(plotting_df.columns.levels[0]))
        )
        max_succ_prob = -np.inf
        for lvl0_column_name, color in zip(plotting_df.columns.levels[0], color_iter):
            max_succ_prob = max(
                max_succ_prob,
                np.max(plotting_df[lvl0_column_name, "success_prob"]),
            )
            ax.plot(
                x_data,
                plotting_df[lvl0_column_name, "success_prob"],
                linestyle="-",
                marker="s",
                label=PERC_GAP_LABEL_MAP.get(lvl0_column_name, lvl0_column_name),
                color=color,
            )
        if max_succ_prob == 0.0:
            raise ValueError(
                "Success Probability values are all 0.0. Please check the"
                " result data."
            )

        ax.set_yscale("log")
        ax.set_xticks(x_data)
        return (fig, ax)

    # ----- styling statics (parity with reference :240-404) -----

    @staticmethod
    def set_default_figsize(fig) -> None:
        fig.set_figwidth(8.0)
        fig.set_figheight(7.0)

    @staticmethod
    def set_default_xlabel(ax, xlabel: str) -> None:
        ax.set_xlabel(xlabel=xlabel, fontdict={"family": "serif", "size": 36})

    @staticmethod
    def set_default_ylabel(ax, ylabel: str) -> None:
        ax.set_ylabel(ylabel=ylabel, fontdict={"family": "serif", "size": 36})

    @staticmethod
    def set_default_ticks(ax) -> None:
        ax.tick_params(axis="x", labelsize=32)
        ax.tick_params(axis="y", labelsize=32)

    @staticmethod
    def set_default_legend(ax) -> None:
        handles, labels = plt.gca().get_legend_handles_labels()
        label_list = list(PERC_GAP_LABEL_MAP.values())
        label_list.extend(["(median)", "(IQR)"])
        legend_orders = []
        for label in label_list:
            try:
                legend_orders.append(labels.index(label))
            except Exception:
                pass
        ax.legend(
            [handles[idx] for idx in legend_orders],
            [labels[idx] for idx in legend_orders],
            loc="best",
            ncol=2,
        )

    @staticmethod
    def set_default_grid(ax) -> None:
        ax.grid(
            visible=True, which="major", axis="both", color="#666666",
            linestyle="--",
        )

    @staticmethod
    def _apply_default_styling(fig, ax, ylabel: str) -> None:
        ccvmplotlib.set_default_figsize(fig)
        ccvmplotlib.set_default_xlabel(ax, "Problem Size, $N$")
        ccvmplotlib.set_default_ylabel(ax, ylabel)
        ccvmplotlib.set_default_ticks(ax)
        ccvmplotlib.set_default_legend(ax)
        ccvmplotlib.set_default_grid(ax)
        fig.tight_layout()

    @staticmethod
    def apply_default_tts_styling(fig, ax) -> None:
        ccvmplotlib._apply_default_styling(fig, ax, "TTS (seconds)")

    @staticmethod
    def apply_default_ets_styling(fig, ax) -> None:
        ccvmplotlib._apply_default_styling(fig, ax, "ETS (joules)")

    @staticmethod
    def apply_default_succ_prob_styling(fig, ax) -> None:
        ccvmplotlib._apply_default_styling(fig, ax, "Success Probability")
