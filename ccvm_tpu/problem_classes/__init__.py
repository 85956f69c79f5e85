from ccvm_tpu.problem_classes.boxqp import InstanceType, ProblemInstance

__all__ = ["InstanceType", "ProblemInstance"]
