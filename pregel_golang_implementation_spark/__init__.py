"""PySpark-native bulk-synchronous link-graph analytics engine.

A from-scratch re-imagination of the Pregel superstep model found in
zzerodream/Pregel-Golang-implementation (reference at /root/reference):
vertex compute, message combine, halt-voting, convergence detection and
checkpoint/resume (reference: Master.go:1014-1068, Worker.go:695-849,
Vertex.go:54-88) — expressed as iterative DataFrame passes.

Design mapping (SURVEY.md §1.4, §3.4):
  - graph           -> edges DataFrame (src: long, dst: long, weight: double)
  - vertex state    -> state DataFrame (id: long, value: double, active: bool)
  - message exchange-> a shuffle: frontier ⋈ edges → groupBy(dst).agg(combine)
  - superstep       -> one Spark job; the DAG scheduler IS the BSP barrier
  - master snapshot -> checkpointed state table + JSON manifest (no driver collect)
  - heartbeats / elections / repartition-restart -> delegated to the cluster manager
"""

from pregel_golang_implementation_spark.plans.spec import AlgorithmSpec
from pregel_golang_implementation_spark.plans.runner import PregelRunner, SuperstepMetrics

__all__ = ["AlgorithmSpec", "PregelRunner", "SuperstepMetrics"]
__version__ = "0.1.0"
