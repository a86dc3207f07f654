"""Round-6 profiling harness (guide §1: measure first).

Breaks the bench's headline queries into phases so the optimization
targets are evidence-based, not guessed:
  - pagerank: graph-prep wall vs per-superstep walls (runner metrics)
  - cc / sssp: same
Run on an idle box; numbers land on stdout as JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pregel_golang_implementation_spark.operators import (
    connected_components,
    pagerank,
    sssp,
)
from pregel_golang_implementation_spark.session import get_spark
from pregel_golang_implementation_spark.sources.graphs import (
    edges_from_lineitem,
    synthetic_edges,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="profile_r6", cores=cpus, shuffle_partitions=cpus, tmpfs_local_dir=True
    )
    out: dict = {"loadavg": round(os.getloadavg()[0], 2)}

    edges = edges_from_lineitem(spark, sf_dir).persist()
    edges.count()

    warm = synthetic_edges(spark, num_vertices=2000, avg_degree=4, seed=7)
    pagerank(spark, warm, tol=0.0, max_supersteps=2)

    # --- pagerank, warm run, phase breakdown
    for run in range(2):
        t0 = time.monotonic()
        pr = pagerank(spark, edges, tol=1e-6, max_supersteps=100)
        pr.state.count()
        total = time.monotonic() - t0
        steps = [round(m.wall_secs, 3) for m in pr.metrics]
        out[f"pagerank_run{run}"] = {
            "total": round(total, 3),
            "supersteps": pr.supersteps,
            "step_walls": steps,
            "sum_step_walls": round(sum(steps), 3),
            "prep_and_tail": round(total - sum(steps), 3),
        }

    for run in range(2):
        t0 = time.monotonic()
        cc = connected_components(spark, edges, steps_per_action=2)
        cc.state.count()
        total = time.monotonic() - t0
        steps = [round(m.wall_secs, 3) for m in cc.metrics]
        out[f"cc_run{run}"] = {
            "total": round(total, 3),
            "supersteps": cc.supersteps,
            "step_walls": steps,
            "sum_step_walls": round(sum(steps), 3),
            "prep_and_tail": round(total - sum(steps), 3),
        }

    src = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(F.min("l_orderkey")).first()[0]
    )
    for run in range(2):
        t0 = time.monotonic()
        sp = sssp(spark, edges, source=int(src), steps_per_action=2)
        sp.state.count()
        total = time.monotonic() - t0
        steps = [round(m.wall_secs, 3) for m in sp.metrics]
        out[f"sssp_run{run}"] = {
            "total": round(total, 3),
            "supersteps": sp.supersteps,
            "step_walls": steps,
            "sum_step_walls": round(sum(steps), 3),
            "prep_and_tail": round(total - sum(steps), 3),
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
