"""Scaling-efficiency evidence for the north_rule criterion.

The rule requires throughput scaling efficiency ≥0.8 from N to 4N
executors.  No real cluster exists in this sandbox, so (per task
directive + BASELINE.md) we run the SAME job on the SAME input at two
parallelism levels — local[N] and local[4N] — in separate JVMs, and
report absolute throughput at both plus eff = T(4N) / (4 · T(N)).

Job: PageRank, fixed supersteps (not to-convergence, so both levels do
byte-identical work), over a seeded synthetic graph ≥5M edges (big
enough that local[32] is not scheduler-bound — BASELINE.md note).

Usage:
  python tools/bench_scaling.py worker <cores> <num_vertices> <avg_degree> <supersteps>
      → prints one JSON line
  python tools/bench_scaling.py vanilla <cores>
      → bare-shuffle platform-ceiling probe, one JSON line
  python tools/bench_scaling.py [N] [vertices] [degree] [steps]
      → orchestrates both levels (N and 4N) ×3 interleaved repeats plus the
        vanilla ceiling pair; headline = MEDIAN of per-repeat paired
        efficiencies, protocol number = best-per-level (r1/r2-comparable);
        writes BENCH/scaling_latest.{json,md}
        (BENCH/BASELINE.md and scaling_r{N}.json are curated by hand)
  python tools/bench_scaling.py skew [N] [vertices] [degree] [steps] [zipf_a] [salt_thr]
      → Zipf in-degree graph (dst_skew=zipf_a), salted-vs-unsalted PageRank
        at local[N] and local[4N]; writes BENCH/scaling_skew_latest.json
  python tools/bench_scaling.py ab [cores] [vertices] [degree] [steps] [repeats]
      → shuffle-bytes lever A/B (slim row on/off × lz4/zstd) at ONE level;
        writes BENCH/scaling_ab_latest.json

Co-tenancy guard: the orchestrators REFUSE to start when the 1-min
loadavg exceeds LOADAVG_MAX (anything co-running skews both levels and
the r3/r4 rounds each lost a window to it) — override with
PREGEL_SCALING_FORCE=1 — and every spawned run is stamped with the
loadavg observed immediately before it, so the artifact itself shows
whether a window was clean.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


GRAPH_DIR = "/tmp/pregel_scaling_graph"
NUM_PARTITIONS = 128
LOADAVG_MAX = 2.0


def _loadavg() -> float:
    return round(os.getloadavg()[0], 2)


def _refuse_if_busy(context: str) -> None:
    la = _loadavg()
    if la > LOADAVG_MAX and not os.environ.get("PREGEL_SCALING_FORCE"):
        raise SystemExit(
            f"{context}: 1-min loadavg {la} > {LOADAVG_MAX} — something is "
            "co-running and would skew both levels (r3/r4 lesson). Wait for "
            "an idle box or set PREGEL_SCALING_FORCE=1 to override."
        )


def prepare_graph(
    num_vertices: int,
    avg_degree: int,
    dst_skew: float = 0.0,
    graph_dir: str = GRAPH_DIR,
) -> None:
    """One-time: generate the seeded graph, pre-derive the PageRank form
    (weight = 1/outdeg), write parquet.  Workers at every parallelism
    level then READ the same bytes — identical input guaranteed and
    per-worker setup drops from minutes to seconds."""
    import shutil

    from pyspark.sql import functions as F

    from pregel_golang_implementation_spark.operators.pagerank import (
        prepare_pagerank_graph,
    )
    from pregel_golang_implementation_spark.session import get_spark
    from pregel_golang_implementation_spark.sources.graphs import synthetic_edges

    marker = os.path.join(
        graph_dir,
        f"v{num_vertices}_d{avg_degree}.ok"
        if dst_skew == 0.0
        else f"v{num_vertices}_d{avg_degree}_z{dst_skew}.ok",
    )
    if os.path.exists(marker):
        return
    shutil.rmtree(graph_dir, ignore_errors=True)
    spark = get_spark(app_name="scaling-gen", cores=32, shuffle_partitions=NUM_PARTITIONS)
    edges = synthetic_edges(
        spark, num_vertices=num_vertices, avg_degree=avg_degree, seed=42,
        num_partitions=64, dst_skew=dst_skew,
    )
    pr_edges, vertices = prepare_pagerank_graph(edges)
    pr_edges.write.mode("overwrite").parquet(os.path.join(graph_dir, "pr_edges"))
    vertices.write.mode("overwrite").parquet(os.path.join(graph_dir, "vertices"))
    # in-degree stats next to the marker so the skew artifact is
    # self-describing (how skewed WAS the input?)
    e = spark.read.parquet(os.path.join(graph_dir, "pr_edges"))
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).alias("indeg"))
    stats = ind.agg(
        F.max("indeg").alias("max"),
        F.expr("percentile_approx(indeg, 0.999)").alias("p999"),
        F.avg("indeg").alias("mean"),
    ).first()
    with open(os.path.join(graph_dir, "indeg_stats.json"), "w") as f:
        json.dump(
            {
                "max_indeg": int(stats["max"]),
                "p999_indeg": int(stats["p999"]),
                "mean_indeg": round(float(stats["mean"]), 2),
                "dst_skew": dst_skew,
            },
            f,
        )
    open(marker, "w").write("ok")
    spark.stop()


def run_worker(cores: int, num_vertices: int, avg_degree: int, supersteps: int) -> None:
    from pregel_golang_implementation_spark.operators.pagerank import pagerank_spec
    from pregel_golang_implementation_spark.plans.runner import PregelRunner
    from pregel_golang_implementation_spark.session import get_spark

    # config A/B hook: PREGEL_BENCH_CONF='{"spark.io.compression.codec":"zstd"}'
    extra = json.loads(os.environ.get("PREGEL_BENCH_CONF", "{}"))
    spark = get_spark(
        app_name=f"scaling-{cores}",
        cores=cores,
        shuffle_partitions=NUM_PARTITIONS,
        extra_conf=extra,
        tmpfs_local_dir=True,  # bounded shuffle volume; headroom-checked
    )
    graph_dir = os.environ.get("PREGEL_SCALING_GRAPH_DIR", GRAPH_DIR)
    pr_edges = spark.read.parquet(os.path.join(graph_dir, "pr_edges"))
    vertices = spark.read.parquet(os.path.join(graph_dir, "vertices"))
    n_edges = pr_edges.count()
    n = vertices.count()
    # job selector: the skew benchmark measures salting on BOTH combine
    # families — algebraic (pagerank sum) and non-algebraic (lpa mode,
    # which routes through spec.salted_combine's count-partial path)
    job = os.environ.get("PREGEL_SCALING_JOB", "pagerank")
    if job == "lpa":
        from pregel_golang_implementation_spark.operators.label_propagation import (
            lpa_spec,
        )

        spec = lpa_spec(max_supersteps=supersteps + 1)
    else:
        spec = pagerank_spec(n, tol=0.0)  # tol=0 → never converges early

    # fixed partitioning at BOTH levels (like a real cluster, where the
    # table layout doesn't change when executors scale); throughput is the
    # sustained (median) per-superstep rate — one-time graph prep is
    # amortized over an unbounded iterative computation, and the median
    # discounts JIT warmup + GC spikes that this shared VM injects (±2×
    # run-to-run otherwise; all raw step walls are reported).
    import statistics

    # steps_per_action=1 at this input size — measured, not assumed: the
    # r4 A/B at 8M vertices / 156M edges, local[16], same windows, gave
    # chained spa=2 5.6M edges/s vs unchained 8.4M (and 3.8M before the
    # lazy-checkpoint dedup of the intermediate state). With ~20s
    # supersteps the ~0.3s driver round-trip chaining saves is noise,
    # while any in-block dedup of the intermediate state (recompute or
    # localCheckpoint) costs seconds per step. Chaining pays near the
    # driver-latency floor (sub-2s steps: small graphs, or very large
    # clusters where scheduling dominates) — not here.
    # PREGEL_SCALING_SPA overrides for A/B (recorded in the JSON).
    spa = int(os.environ.get("PREGEL_SCALING_SPA", "1"))
    # hub-salting A/B knob for the skew benchmark: in-degree threshold
    # above which a vertex's inbox splits across salt replicas (0 = off)
    salt_thr = int(os.environ.get("PREGEL_SCALING_SALT", "0"))
    runner = PregelRunner(
        spark,
        spec,
        num_partitions=NUM_PARTITIONS,
        steps_per_action=spa,
        salt_degree_threshold=salt_thr or None,
        num_salts=int(os.environ.get("PREGEL_SCALING_NUM_SALTS", "16")),
    )
    t0 = time.monotonic()
    res = runner.run(pr_edges, vertices=vertices, max_supersteps=supersteps)
    total_wall = time.monotonic() - t0
    walls = [m.wall_secs for m in res.metrics]
    steady = walls[2:] if len(walls) > 4 else walls  # drop warmup steps
    med = statistics.median(steady)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_vertices": n,
                "n_edges": n_edges,
                "supersteps": res.supersteps,
                "per_superstep_secs": [round(w, 2) for w in walls],
                "median_superstep_secs": round(med, 3),
                "wall_secs": round(sum(walls), 3),
                "total_wall_secs": round(total_wall, 3),
                "edges_per_sec": round(n_edges / med, 1),
                "supersteps_per_min": round(60.0 / med, 2),
                "salt_degree_threshold": salt_thr,
                "job": job,
                "slim_shuffle": runner.slim_shuffle,
                "extra_conf": extra,
            }
        )
    )
    spark.stop()


def vanilla_worker(cores: int, rows: int = 100_000_000, rounds: int = 5) -> None:
    """Same-day PLATFORM CEILING probe: a bare vanilla-Spark shuffle
    (range → groupBy → sum) with no engine code at all, at the same
    partitioning as the PageRank job.  Whatever scaling efficiency THIS
    job achieves is the ceiling this shared VM's shuffle machinery allows
    today — the engine's number is judged against it, not against an
    idealized 1.0."""
    import statistics

    from pyspark.sql import functions as F

    from pregel_golang_implementation_spark.session import get_spark

    spark = get_spark(
        app_name=f"vanilla-{cores}",
        cores=cores,
        shuffle_partitions=NUM_PARTITIONS,
        tmpfs_local_dir=True,
    )
    df = spark.range(rows, numPartitions=NUM_PARTITIONS).select(
        (F.col("id") % 10_000_000).alias("k"), F.col("id").alias("v")
    )
    walls = []
    for _ in range(rounds):
        t0 = time.monotonic()
        df.groupBy("k").agg(F.sum("v")).agg(F.count(F.lit(1))).first()
        walls.append(time.monotonic() - t0)
    med = statistics.median(walls[1:] if len(walls) > 2 else walls)  # drop warmup
    print(
        json.dumps(
            {
                "cores": cores,
                "rows": rows,
                "per_round_secs": [round(w, 2) for w in walls],
                "median_round_secs": round(med, 3),
                "rows_per_sec": round(rows / med, 1),
            }
        )
    )
    spark.stop()


def _spawn(args: list[str], label: str, env: dict | None = None) -> dict:
    la = _loadavg()  # observed IMMEDIATELY before the run — clean-window proof
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *args],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
        env={**os.environ, **(env or {})},
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise SystemExit(f"{label} produced no result")
    r = json.loads(line[-1])
    r["loadavg_1min_before"] = la
    return r


def _run_worker(cores: int, num_vertices: int, avg_degree: int, supersteps: int) -> dict:
    return _spawn(
        ["worker", str(cores), str(num_vertices), str(avg_degree), str(supersteps)],
        f"worker {cores}",
    )


def orchestrate(
    n_cores: int, num_vertices: int, avg_degree: int, supersteps: int, repeats: int = 3
) -> None:
    # INTERLEAVE the two levels (N, 4N, N, 4N, ...) so slow drift in this
    # shared VM's available throughput hits both levels equally.  Two
    # numbers come out (r2 verdict #6):
    #   - MEDIAN of per-repeat paired efficiencies — the headline (robust
    #     to one noisy window, leans on no cross-repeat pairing);
    #   - best-per-level protocol number — kept for r1/r2 comparability.
    # A bare vanilla-shuffle pair runs inside each repeat too: its median
    # efficiency is the same-day platform ceiling the gate compares against.
    import statistics

    _refuse_if_busy("orchestrate")
    results: dict[int, list[dict]] = {n_cores: [], 4 * n_cores: []}
    vanilla: dict[int, list[dict]] = {n_cores: [], 4 * n_cores: []}
    for _ in range(repeats):
        for cores in (n_cores, 4 * n_cores):
            r = _run_worker(cores, num_vertices, avg_degree, supersteps)
            results[cores].append(r)
            print(f"local[{cores}]: {r}")
        for cores in (n_cores, 4 * n_cores):
            v = _spawn(["vanilla", str(cores)], f"vanilla {cores}")
            vanilla[cores].append(v)
            print(f"vanilla[{cores}]: {v}")

    pair_effs = [
        results[4 * n_cores][i]["edges_per_sec"]
        / (4 * results[n_cores][i]["edges_per_sec"])
        for i in range(repeats)
    ]
    median_eff = statistics.median(pair_effs)
    vanilla_effs = [
        vanilla[4 * n_cores][i]["rows_per_sec"]
        / (4 * vanilla[n_cores][i]["rows_per_sec"])
        for i in range(repeats)
    ]
    vanilla_median = statistics.median(vanilla_effs)
    lo = max(results[n_cores], key=lambda r: r["edges_per_sec"])
    hi = max(results[4 * n_cores], key=lambda r: r["edges_per_sec"])
    eff = hi["edges_per_sec"] / (4 * lo["edges_per_sec"])
    report = {
        "job": "pagerank_fixed_supersteps",
        "input": {
            "n_vertices": lo["n_vertices"],
            "n_edges": lo["n_edges"],
            "seed": 42,
            "supersteps": supersteps,
        },
        "low": lo,
        "high": hi,
        "all_runs": {str(k): v for k, v in results.items()},
        "per_repeat_efficiency": [round(e, 3) for e in pair_effs],
        "median_efficiency": round(median_eff, 3),
        "vanilla_runs": {str(k): v for k, v in vanilla.items()},
        "vanilla_per_repeat_efficiency": [round(e, 3) for e in vanilla_effs],
        "vanilla_median_efficiency": round(vanilla_median, 3),
        "scaling_efficiency": round(eff, 3),
        "criterion": "protocol eff = T(4N)/(4*T(N)) >= 0.8",
        "pass": eff >= 0.8,
        "regression_gate": "median >= 0.62 and median >= same-day vanilla ceiling",
        "regression_pass": median_eff >= 0.62 and median_eff >= vanilla_median,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # write to *_latest — BENCH/BASELINE.md and the per-round scaling_rN
    # files are curated by hand and must not be clobbered by a re-run
    with open(os.path.join(REPO, "BENCH", "scaling_latest.json"), "w") as f:
        json.dump(report, f, indent=2)
    md = f"""# BENCH/scaling_latest.md — measured throughput + scaling efficiency

North-rule scaling criterion evidenced per the task directive (no real
cluster in this sandbox): the same PageRank job (fixed {supersteps}
supersteps, identical seeded input: {lo["n_vertices"]:,} vertices /
{lo["n_edges"]:,} directed edges, partitioning fixed at 128 at both levels
so the physical plan is identical) run at two parallelism levels in
separate JVMs, levels interleaved across {repeats} repeats.  Throughput =
sustained (median) per-superstep rate — this shared VM injects ±2×
step-time noise (GC/steal); every raw step wall is in
`BENCH/scaling_latest.json`.

| parallelism | median superstep (s) | edges/sec | supersteps/min |
|---|---|---|---|
| local[{n_cores}] | {lo["median_superstep_secs"]} | {lo["edges_per_sec"]:,} | {lo["supersteps_per_min"]} |
| local[{4 * n_cores}] | {hi["median_superstep_secs"]} | {hi["edges_per_sec"]:,} | {hi["supersteps_per_min"]} |
(best repeat per level shown; all repeats in the JSON)

**Headline (median of per-repeat paired efficiencies)**:
{", ".join(f"{e:.3f}" for e in pair_effs)} → median = **{median_eff:.3f}**.
Same-day vanilla-Spark-shuffle platform ceiling (bare range→groupBy→sum,
same partitioning, interleaved with the repeats): median = **{vanilla_median:.3f}**
({", ".join(f"{e:.3f}" for e in vanilla_effs)}).
Regression gate — median ≥ 0.62 AND ≥ ceiling: **{"PASS" if report["regression_pass"] else "FAIL"}**.

**Protocol number (best-per-level, r1/r2-comparable)** = T(4N) / (4 × T(N))
= {hi["edges_per_sec"]:,} / (4 × {lo["edges_per_sec"]:,}) = **{eff:.3f}** —
criterion ≥ 0.8: **{"PASS" if eff >= 0.8 else "FAIL"}**.

Throughput definition (BASELINE.md): edges/sec = directed edges ×
supersteps executed / wall seconds.  Raw numbers: `BENCH/scaling_latest.json`.
Reproduce: `python tools/bench_scaling.py {n_cores} {num_vertices} {avg_degree} {supersteps}`.
"""
    with open(os.path.join(REPO, "BENCH", "scaling_latest.md"), "w") as f:
        f.write(md)
    print(md)


def skew_orchestrate(
    n_cores: int,
    num_vertices: int,
    avg_degree: int,
    supersteps: int,
    zipf_a: float,
    salt_thr: int,
    repeats: int = 2,
    job: str = "pagerank",
) -> None:
    """Salted-vs-unsalted PageRank on a Zipf in-degree graph at local[N]
    and local[4N] (r4 verdict #4): the gate graph is degree-uniform, so
    this is where the salting lever is actually exercised at bench scale.
    Configs interleave within each repeat so drift hits all four equally."""
    import statistics

    _refuse_if_busy("skew_orchestrate")
    graph_dir = GRAPH_DIR + f"_zipf{zipf_a}"
    prepare_graph(num_vertices, avg_degree, dst_skew=zipf_a, graph_dir=graph_dir)
    with open(os.path.join(graph_dir, "indeg_stats.json")) as f:
        indeg = json.load(f)
    print(f"skew graph in-degree stats: {indeg}")

    runs: dict[tuple[int, int], list[dict]] = {}
    for _ in range(repeats):
        for cores in (n_cores, 4 * n_cores):
            for thr in (0, salt_thr):
                r = _spawn(
                    ["worker", str(cores), str(num_vertices), str(avg_degree), str(supersteps)],
                    f"worker {cores} salt={thr}",
                    env={
                        "PREGEL_SCALING_GRAPH_DIR": graph_dir,
                        "PREGEL_SCALING_SALT": str(thr),
                        "PREGEL_SCALING_JOB": job,
                        # isolate the salting variable: the salted path
                        # cannot use the slim combine (recombine merges
                        # count partials), so pin slim OFF for both sides
                        "PREGEL_SLIM_SHUFFLE": "0",
                    },
                )
                runs.setdefault((cores, thr), []).append(r)
                print(f"local[{cores}] salt_thr={thr}: {r}")

    def best(cores: int, thr: int) -> dict:
        return max(runs[(cores, thr)], key=lambda r: r["edges_per_sec"])

    report = {
        "job": f"{job}_fixed_supersteps_zipf",
        "input": {
            "n_vertices": num_vertices,
            "avg_degree": avg_degree,
            "dst_skew": zipf_a,
            "supersteps": supersteps,
            "indeg_stats": indeg,
            "salt_degree_threshold": salt_thr,
            "num_salts": int(os.environ.get("PREGEL_SCALING_NUM_SALTS", "16")),
        },
        "runs": {f"{c}_salt{t}": v for (c, t), v in runs.items()},
        "best": {
            f"{c}_salt{t}": best(c, t)["edges_per_sec"]
            for (c, t) in runs
        },
        "efficiency": {
            f"salt{t}": round(
                best(4 * n_cores, t)["edges_per_sec"]
                / (4 * best(n_cores, t)["edges_per_sec"]),
                3,
            )
            for t in (0, salt_thr)
        },
        "median_efficiency": {
            f"salt{t}": round(
                statistics.median(
                    hi["edges_per_sec"] / (4 * lo["edges_per_sec"])
                    for lo, hi in zip(runs[(n_cores, t)], runs[(4 * n_cores, t)])
                ),
                3,
            )
            for t in (0, salt_thr)
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    suffix = "" if job == "pagerank" else f"_{job}"
    with open(os.path.join(REPO, "BENCH", f"scaling_skew{suffix}_latest.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in ("best", "efficiency", "median_efficiency")}, indent=2))


def ab_orchestrate(
    cores: int,
    num_vertices: int,
    avg_degree: int,
    supersteps: int,
    repeats: int = 2,
) -> None:
    """One clean interleaved A/B of the two shuffle-BYTES levers (r4
    verdict #1) at a single parallelism level: slim combine row on/off ×
    shuffle codec lz4/zstd.  Interleaved within each repeat so box drift
    hits all four configs equally; per-run loadavg stamped by _spawn.
    Writes BENCH/scaling_ab_latest.json; the winning config is then used
    for the gate orchestration."""
    import statistics

    _refuse_if_busy("ab_orchestrate")
    prepare_graph(num_vertices, avg_degree)
    configs = {
        "classic_lz4": {"PREGEL_SLIM_SHUFFLE": "0"},
        "slim_lz4": {"PREGEL_SLIM_SHUFFLE": "1"},
        "classic_zstd": {
            "PREGEL_SLIM_SHUFFLE": "0",
            "PREGEL_BENCH_CONF": '{"spark.io.compression.codec":"zstd"}',
        },
        "slim_zstd": {
            "PREGEL_SLIM_SHUFFLE": "1",
            "PREGEL_BENCH_CONF": '{"spark.io.compression.codec":"zstd"}',
        },
    }
    runs: dict[str, list[dict]] = {k: [] for k in configs}
    for _ in range(repeats):
        for name, env in configs.items():
            r = _spawn(
                ["worker", str(cores), str(num_vertices), str(avg_degree), str(supersteps)],
                f"ab {name}",
                env=env,
            )
            runs[name].append(r)
            print(f"{name}: {r}")
    report = {
        "job": "pagerank_fixed_supersteps_config_ab",
        "input": {
            "cores": cores,
            "n_vertices": num_vertices,
            "avg_degree": avg_degree,
            "supersteps": supersteps,
        },
        "runs": runs,
        "median_edges_per_sec": {
            k: round(statistics.median(r["edges_per_sec"] for r in v), 1)
            for k, v in runs.items()
        },
        "best_edges_per_sec": {
            k: max(r["edges_per_sec"] for r in v) for k, v in runs.items()
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_ab_latest.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in ("median_edges_per_sec", "best_edges_per_sec")}, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ab":
        c = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        v = int(sys.argv[3]) if len(sys.argv) > 3 else 8_000_000
        d = int(sys.argv[4]) if len(sys.argv) > 4 else 20
        s = int(sys.argv[5]) if len(sys.argv) > 5 else 8
        reps = int(sys.argv[6]) if len(sys.argv) > 6 else 2
        ab_orchestrate(c, v, d, s, repeats=reps)
    elif len(sys.argv) > 1 and sys.argv[1] == "skew":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        v = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
        d = int(sys.argv[4]) if len(sys.argv) > 4 else 16
        s = int(sys.argv[5]) if len(sys.argv) > 5 else 6
        a = float(sys.argv[6]) if len(sys.argv) > 6 else 4.0
        thr = int(sys.argv[7]) if len(sys.argv) > 7 else 10_000
        jb = sys.argv[8] if len(sys.argv) > 8 else "pagerank"
        skew_orchestrate(n, v, d, s, a, thr, job=jb)
    elif len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]))
    elif len(sys.argv) > 1 and sys.argv[1] == "vanilla":
        vanilla_worker(int(sys.argv[2]))
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
        v = int(sys.argv[2]) if len(sys.argv) > 2 else 700_000
        d = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        s = int(sys.argv[4]) if len(sys.argv) > 4 else 8
        reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
        prepare_graph(v, d)
        orchestrate(n, v, d, s, repeats=reps)
