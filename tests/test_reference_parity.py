"""SSSP bit-parity with the reference engine on ITS OWN fixtures.

Runs our engine on /root/reference/Test/SampleNodes{N}.json (the reference's
native graph shape, loaded via sources.graphs.load_reference_graph) and
compares exact integer distances against the shipped goldens
Test/solution{N}.json — the same check the reference's own
Experiment-Util/compare_result.py:19-23 performs (integer equality),
source vertex 1 (Worker.go:873).
"""

from __future__ import annotations

import json
import math
import os

import pytest

from pregel_golang_implementation_spark.operators import sssp
from pregel_golang_implementation_spark.sources import load_reference_graph

REF = "/root/reference/Test"


# every size the reference ships a golden for (Test/solution{N}.json);
# 700 is the largest fixture (~342K edge entries) — the only one big
# enough to cross partition boundaries in the 8-partition test session
@pytest.mark.parametrize("size", [100, 200, 300, 500, 700])
def test_sssp_matches_reference_goldens(spark, size):
    fixture = os.path.join(REF, f"SampleNodes{size}.json")
    golden_path = os.path.join(REF, f"solution{size}.json")
    if not (os.path.exists(fixture) and os.path.exists(golden_path)):
        pytest.skip("reference fixtures not present")
    edges = load_reference_graph(spark, fixture)
    res = sssp(spark, edges, source=1)
    got = {int(r["id"]): r["value"] for r in res.state.collect()}
    with open(golden_path) as f:
        golden = {int(k): float(v) for k, v in json.load(f).items()}
    assert res.converged
    assert set(got) == set(golden)
    for v, want in golden.items():
        assert not math.isinf(got[v])
        assert int(got[v]) == int(want), f"vertex {v}: {got[v]} != {want}"
