"""BoxQP metadata -> plotting data (parity with
``ccvm_simulators/ccvmplotlib/problem_metadata/boxqp_metadata.py``).

Deviation: the metadata JSON is read with the standard ``json`` module (the
reference streams it with the ``json_stream`` package, ``:57-81``); our files
are small host-side artifacts and the schema is identical.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from ccvm_tpu.ccvmplotlib.problem_metadata.problem_metadata import (
    ProblemMetadata,
    ProblemType,
)
from ccvm_tpu.ccvmplotlib.utils.sampleTTSmetric import SampleTTSMetric


class BoxQPMetadata(ProblemMetadata):
    """BoxQP problem-specific metadata -> TTS/ETS/success-prob plot data."""

    def __init__(self, problem: ProblemType) -> None:
        super().__init__(problem)
        self.__problem_size_list: list[int] = []
        self.__percent_gap_list: list[str] = []
        self.__percentile_list: list[str] = ["25", "50", "75", "success_prob"]
        self.__batch_size: int = 0
        self.__df: pd.DataFrame = pd.DataFrame()

    @staticmethod
    def __flatten_dict(result: dict) -> dict:
        """Flatten one nesting level (solution_performance keys float up)."""
        flattened_dict = {}
        for key_depth0, val_depth0 in result.items():
            if isinstance(val_depth0, dict):
                flattened_dict.update(val_depth0)
            else:
                flattened_dict[key_depth0] = val_depth0
        return flattened_dict

    def ingest_metadata(self, metadata_filepath: str) -> None:
        """Load a metadata JSON file into a DataFrame."""
        with open(metadata_filepath, "r") as f:
            data = json.load(f)

        results = data["result_metadata"]
        self.__percent_gap_list = list(results[0]["solution_performance"].keys())
        self.__df = pd.DataFrame([self.__flatten_dict(r) for r in results])
        self.__batch_size = self.__df["batch_size"][0]
        self.__problem_size_list = sorted(self.__df["problem_size"].unique().tolist())

    def generate_plot_data(self, metric_func) -> pd.DataFrame:
        """TTS (or ETS) vs problem size per gap and percentile:
        metric_value * mean(bootstrapped R99), inf when fewer than
        percentile% of instances were ever solved (reference ``:83-137``)."""
        plotting_df = pd.DataFrame(
            index=pd.Index(self.__problem_size_list, name="Problem Size (N)"),
            columns=pd.MultiIndex.from_product(
                [self.__percent_gap_list, self.__percentile_list],
                names=["Optimality Type", "Percentile"],
            ),
        )

        for percent_gap in self.__percent_gap_list:
            for problem_size in self.__problem_size_list:
                matching_df = self.__df.loc[
                    self.__df["problem_size"] == problem_size
                ]
                for percentile in self.__percentile_list[:-1]:
                    sampler = SampleTTSMetric(
                        tau_attribute="time",
                        percentile=int(percentile),
                        seed=1,
                        num_bootstraps=100,
                    )
                    metric_value = metric_func(
                        dataframe=matching_df, problem_size=problem_size
                    )
                    success_prob = matching_df[percent_gap].values
                    frac_solved = (success_prob > 0).mean()
                    if frac_solved < (int(percentile) / 100):
                        R99 = np.inf
                    else:
                        R99_distribution = sampler.calc_R99_distribution(
                            success_probabilities=success_prob,
                            num_repeats=self.__batch_size,
                        )
                        R99 = np.mean(R99_distribution)
                    plotting_df.at[problem_size, (percent_gap, percentile)] = (
                        metric_value * R99
                    )

        return plotting_df

    def generate_success_prob_plot_data(self) -> pd.DataFrame:
        """Mean success probability vs problem size per gap."""
        plotting_df = pd.DataFrame(
            index=pd.Index(self.__problem_size_list, name="Problem Size (N)"),
            columns=pd.MultiIndex.from_product(
                [self.__percent_gap_list, self.__percentile_list],
                names=["Optimality Type", "Percentile"],
            ),
        )

        for percent_gap in self.__percent_gap_list:
            for problem_size in self.__problem_size_list:
                matching_df = self.__df.loc[
                    self.__df["problem_size"] == problem_size
                ]
                success_prob_list = matching_df[percent_gap].values
                mean_success_prob = np.mean(
                    np.array([float(s) for s in success_prob_list])
                )
                plotting_df.at[problem_size, (percent_gap, "success_prob")] = (
                    mean_success_prob
                )

        return plotting_df
