from ccvm_tpu.problem_classes.boxqp.problem_instance import (
    InstanceType,
    ProblemInstance,
    parse_instance_file,
)

__all__ = ["InstanceType", "ProblemInstance", "parse_instance_file"]
