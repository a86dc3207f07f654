"""Extra benchmarks (r6): per-operator isolation the frozen bench.py
cannot carry.  Guide §1.4: results are computed into a noop sink (or a
count when the operator's contract is a count) so the measurement is
the computation, not an output write.  Prints ONE JSON line.

Usage: python bench_extra.py [op ...]   (default: all)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Each op runs twice; both raws and the min are reported (steady-state
throughput is the quantity of interest; a polluted window shows in raw).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from pregel_golang_implementation_spark.operators.dedup import (
    minhash_dedup,
    near_dup_clusters,
)
from pregel_golang_implementation_spark.operators.similarity import cosine_topk
from pregel_golang_implementation_spark.session import get_spark


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = set(sys.argv[1:])
    spark = get_spark(
        app_name="bench_extra", cores=cpus, shuffle_partitions=cpus,
        tmpfs_local_dir=True,
    )
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    ops = {
        "minhash_dedup": lambda: _noop(
            minhash_dedup(docs, shingle_n=3, num_hashes=16, rows_per_band=4, hash_fn="xxhash")
        ),
        "near_dup_resolve": lambda: near_dup_clusters(
            docs, threshold=0.5, max_bucket_size=10_000
        ).filter("NOT is_canonical").count(),
        "cosine_topk": lambda: _noop(cosine_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10)),
    }
    out: dict = {
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "loadavg_1min_at_start": round(os.getloadavg()[0], 2),
    }
    results = {}
    for name, fn in ops.items():
        if only and name not in only:
            continue
        raw = []
        for i in range(2):
            sc.setJobDescription(f"bench_extra: {name} (run {i})")
            t0 = time.monotonic()
            fn()
            raw.append(round(time.monotonic() - t0, 3))
        sc.setJobDescription(None)
        results[name] = {"raw": raw, "best": min(raw)}
    out["ops"] = results
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
