"""Post-processor factory (API-parity port of
``ccvm_simulators/post_processor/factory.py``)."""

from __future__ import annotations

from ccvm_tpu.post_processor.adam import PostProcessorAdam
from ccvm_tpu.post_processor.asgd import PostProcessorASGD
from ccvm_tpu.post_processor.bfgs import PostProcessorBFGS
from ccvm_tpu.post_processor.grad_descent import PostProcessorGradDescent
from ccvm_tpu.post_processor.lbfgs import PostProcessorLBFGS
from ccvm_tpu.post_processor.post_processor import MethodType


class PostProcessorFactory:
    """The Factory Class (reference ``factory.py:9-35``)."""

    @staticmethod
    def create_postprocessor(method):
        """Create the relevant post processor from the given method name.

        Raises:
            AssertionError: Invalid method type is provided.
        """
        if method.lower() == MethodType.BFGS.value:
            return PostProcessorBFGS()
        elif method.lower() == MethodType.LBFGS.value:
            return PostProcessorLBFGS()
        elif method.lower() == MethodType.Adam.value:
            return PostProcessorAdam()
        elif method.lower() == MethodType.ASGD.value:
            return PostProcessorASGD()
        elif method.lower() == MethodType.GradDescent.value:
            return PostProcessorGradDescent()
        raise AssertionError(f"Method type is not valid. Provided: {method}")
