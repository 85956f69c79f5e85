"""Schema-compatibility proof: the REFERENCE's own ccvmplotlib must consume
metadata produced by this framework.

Runs the reference checkout's plotting stack (read-only, mounted at
/root/reference in the build environment; skipped elsewhere) against our
committed benchmark metadata.  Two legacy deps the reference imports
(``future.utils.iteritems`` and ``json_stream``) are shimmed in-process
with functional equivalents — our JSON is plain, so a plain loader
satisfies the streaming interface.
"""

import json
import os
import sys
import types

import pytest

REFERENCE = "/root/reference"
METADATA = os.path.join(
    os.path.dirname(__file__), "..", "..", "benchmark_results",
    "mf_benchmark.json",
)


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "ccvm_simulators")),
    reason="reference checkout not mounted",
)
@pytest.mark.skipif(
    not os.path.exists(METADATA), reason="benchmark metadata not built"
)
def test_reference_plotting_stack_consumes_our_metadata(tmp_path):
    import matplotlib

    matplotlib.use("Agg")

    if "future" not in sys.modules:
        future = types.ModuleType("future")
        futils = types.ModuleType("future.utils")
        futils.iteritems = lambda d: iter(d.items())
        future.utils = futils
        sys.modules["future"] = future
        sys.modules["future.utils"] = futils
    if "json_stream" not in sys.modules:
        js = types.ModuleType("json_stream")
        js_base = types.ModuleType("json_stream.base")

        class TransientStreamingJSONObject(dict):
            pass

        js_base.TransientStreamingJSONObject = TransientStreamingJSONObject
        js.base = js_base
        js.load = lambda f: json.load(f)
        js.to_standard_types = lambda x: x
        sys.modules["json_stream"] = js
        sys.modules["json_stream.base"] = js_base

    sys.path.insert(0, REFERENCE)
    try:
        from ccvm_simulators.ccvmplotlib import ccvmplotlib as ref_plot

        fig, ax = ref_plot.plot_success_prob(
            metadata_filepath=METADATA, problem="BoxQP"
        )
        assert ax.get_yscale() == "log"
        fig2, ax2 = ref_plot.plot_TTS(
            metadata_filepath=METADATA,
            problem="BoxQP",
            machine_time_func=lambda dataframe, problem_size: 1e-3,
        )
        out = tmp_path / "ref_tts.png"
        fig2.savefig(out)
        assert out.stat().st_size > 0
    finally:
        sys.path.remove(REFERENCE)
