from pregel_golang_implementation_spark.plans.spec import (
    AlgorithmSpec,
    combine_max,
    combine_min,
    combine_mode,
    combine_sum,
)
from pregel_golang_implementation_spark.plans.runner import PregelRunner, PregelResult, SuperstepMetrics

__all__ = [
    "AlgorithmSpec",
    "PregelRunner",
    "PregelResult",
    "SuperstepMetrics",
    "combine_min",
    "combine_max",
    "combine_sum",
    "combine_mode",
]
