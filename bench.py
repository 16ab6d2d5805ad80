"""Benchmark harness (driver contract: ONE JSON line to stdout).

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

- kg_extract:  KG mention+triple extraction over the synthetic interleaved
               corpus (10x documents rows) — the hot Arrow-UDF path
- kg_e2e:      extraction + linking + canonicalization + triple rewrite
- dedup/sim/ta/rel: representative operators from each family

Prints: {"metric": "e2e_wall_sec", "value": <sum of query secs>,
         "unit": "sec", "queries": {...}, "sf": ..., "docs_per_sec": ...,
         "triples_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from gliner_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "kg_mentions",
    "kg_triples",
    "dd_minhash",
    "dd_simhash",
    "sim_topk",
    "ta_fingerprint",
    "rel_q1",
    "rel_revenue_region",
]

# round-2 operators, timed separately so `value` stays comparable to r1
EXTRA_QUERIES = [
    "kg_mentions_dense",
    "kg_relations_prompted",
    "kg_triples_scored",
    "kg_triples_spans",
    "sim_ivf_kmeans",
    "kg_eval_suite",
]


def main():
    spark = get_spark(app_name="gliner-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # warm up JVM + python workers once (tiny corpus) so query timings
    # measure steady-state throughput, not process spin-up
    qs["rel_q1"](spark, SF_DIR).count()

    # best-of-2 per query: co-tenant load on this VM varies minute to
    # minute (observed 10x swings on identical plans); min estimates the
    # uncontended wall
    timings = {}
    counts = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(2):
            t0 = time.time()
            counts[name] = qs[name](spark, SF_DIR).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    extra = {}
    for name in EXTRA_QUERIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        extra[name] = round(time.time() - t0, 3)

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count() * 10
    docs_per_sec = round(n_docs / timings["kg_mentions"], 1)
    triples_per_sec = round(counts["kg_triples"] / timings["kg_triples"], 1)

    out = {
        "metric": "e2e_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "n_docs": n_docs,
        "docs_per_sec": docs_per_sec,
        "triples_per_sec": triples_per_sec,
        "counts": counts,
        "extra_queries": extra,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
