from ccvm_tpu.ccvmplotlib.utils.metric import Metric
from ccvm_tpu.ccvmplotlib.utils.sampleTTSmetric import SampleTTSMetric

__all__ = ["Metric", "SampleTTSMetric"]
