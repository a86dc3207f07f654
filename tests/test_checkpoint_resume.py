"""Kill/resume semantics (SURVEY.md §4.4, reference Worker.go:601-654):
resume from the last committed snapshot must produce a final state
identical to an uninterrupted run, and the manifest must carry
per-partition lineage + counters (north_rule)."""

from __future__ import annotations

import json
import os

from pregel_golang_implementation_spark.operators.connected_components import (
    cc_spec,
    symmetrize,
)
from pregel_golang_implementation_spark.plans.runner import PregelRunner


def _chain_edges(spark, n=12):
    df = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n)], "src long, dst long, weight double"
    )
    return symmetrize(df)


def test_resume_matches_uninterrupted(spark, tmp_path):
    edges = _chain_edges(spark)
    ck = str(tmp_path / "ck")

    interrupted = PregelRunner(
        spark, cc_spec(), checkpoint_dir=ck, checkpoint_every=2
    ).run(edges, max_supersteps=3)
    assert not interrupted.converged  # "killed" mid-run

    resumed = PregelRunner(spark, cc_spec(), checkpoint_dir=ck).resume(edges)
    full = PregelRunner(spark, cc_spec()).run(edges)
    assert resumed.converged and full.converged
    a = {r["id"]: r["value"] for r in resumed.state.collect()}
    b = {r["id"]: r["value"] for r in full.state.collect()}
    assert a == b


def test_manifest_carries_lineage_and_counters(spark, tmp_path):
    edges = _chain_edges(spark, n=20)
    ck = str(tmp_path / "ck2")
    PregelRunner(spark, cc_spec(), checkpoint_dir=ck, checkpoint_every=2).run(
        edges, max_supersteps=2
    )
    found = PregelRunner.latest_checkpoint(ck)
    assert found is not None
    step, manifest = found
    assert step == 2
    assert manifest["algorithm"] == "connected_components"
    assert sum(p["rows"] for p in manifest["partition_lineage"]) == 21
    c = manifest["counters"]
    assert {"active_vertices", "messages_sent", "max_delta"} <= set(c)
    # the parquet snapshot itself must be readable and complete
    state = spark.read.parquet(os.path.join(ck, "step=000002", "state"))
    assert state.count() == 21


def test_resume_ignores_uncommitted_snapshot(spark, tmp_path):
    """A snapshot directory without MANIFEST.json (crash mid-write) must be
    skipped — manifest presence is the atomic commit marker."""
    edges = _chain_edges(spark, n=10)
    ck = str(tmp_path / "ck3")
    PregelRunner(spark, cc_spec(), checkpoint_dir=ck, checkpoint_every=1).run(
        edges, max_supersteps=2
    )
    # fake a torn step=3 write: state dir present, no manifest
    os.makedirs(os.path.join(ck, "step=000003", "state"), exist_ok=True)
    step, _ = PregelRunner.latest_checkpoint(ck)
    assert step == 2
