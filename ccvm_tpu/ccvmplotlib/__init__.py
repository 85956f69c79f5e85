from ccvm_tpu.ccvmplotlib.ccvmplotlib import ccvmplotlib

__all__ = ["ccvmplotlib"]
