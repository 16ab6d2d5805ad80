"""Benchmark harness (driver contract: ONE JSON line to stdout).

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Variance discipline (round-3, VERDICT r2 task 4): this VM is co-tenant and
identical plans have measured 2-10x apart minutes apart, so
- queries run INTERLEAVED (q1..qN, repeated ROUNDS times) rather than
  back-to-back, so a load spike hits all queries instead of one;
- per query we report min (uncontended-wall estimate, the headline),
  median, and the full per-round spread — a regression claim needs the
  SPREADS to separate, not just the mins;
- a pure-CPU spin probe runs before and after the query rounds and its
  rate is reported next to the timings, so a slow run is attributable to
  the box rather than the plan.

Prints: {"metric": "e2e_wall_sec", "value": <sum of per-query min secs>,
         "unit": "sec", "queries": {...}, "sf": ..., "docs_per_sec": ...,
         "triples_per_sec": ..., "legacy8_value": ..., "spread": {...}}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from gliner_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("BENCH_ROUNDS", "3"))

# the round-1/2 headline eight — kept as a named subset so `legacy8_value`
# stays comparable across BENCH_r01/r02/r03
LEGACY8 = [
    "kg_mentions",
    "kg_triples",
    "dd_minhash",
    "dd_simhash",
    "sim_topk",
    "ta_fingerprint",
    "rel_q1",
    "rel_revenue_region",
]

# round-2 operators, promoted into the headline set (VERDICT r2 task 4)
PROMOTED = [
    "kg_mentions_dense",
    "kg_relations_prompted",
    "kg_triples_scored",
    "kg_triples_spans",
    "sim_ivf_kmeans",
    "sim_neardup",
    "kg_eval_suite",
]

BENCH_QUERIES = LEGACY8 + PROMOTED

# round-3/4 operators, timed once per run (the kg_* gates re-run the full
# extraction pipeline for self-containment — too expensive for 3 headline
# rounds; their operator cost alone is agg/join-only over materialized
# triples, see BENCH.md)
EXTRA_QUERIES = [
    "kg_degree",
    "kg_two_hop",
    "kg_pagerank",
    "ta_clean_corpus",
    # round 4
    "kg_pagerank_dangling",
    "kg_mentions_encoder",
    "ta_token_budget",
    "kg_components",
    "ta_repetition",
    "ta_decontaminate",
    "ta_rarity",
    "rel_asof",
    "rel_range_join",
    "ta_cms_topk",
    "sim_pq",
    "sim_ivfpq",
    "ta_quantiles",
    # round 5
    "kg_constrained_labels",
    "sim_pq_refine",
    "sim_ivfpq_refine",
    "dd_clusters",
    "ta_bigram_support",
    "sim_semantic_clusters",
    "kg_triangles",
    "kg_clustering",
    "kg_ppr",
    # round 6
    "kg_node_similarity",
    "kg_kcore",
    "kg_link_prediction",
    "kg_bfs",
    "sim_sq8",
    "ev_mrr",
    "kg_lpa",
    "kg_hll",
    "ta_winnowing",
    "kg_modularity",
    "dd_winnow",
    "kg_schema",
    "kg_negatives",
    "kg_cooc",
    "kg_constraints",
    "kg_provenance",
    "ev_transe",
    "ev_distmult",
    "kg_metapath",
    "kg_fusion",
    "kg_factrank",
    "kg_walks",
    "kg_truss",
    "kg_wl",
    "kg_degree_hist",
    "kg_harmonic",
    # round 6, wave 2/3 document-table ops (graph/kg wave-2+3 ops are
    # benched against the materialized triples table below instead)
    "dd_containment",
    "dd_substrings",
    "dd_blocking",
    "dd_blocking_shingled",
    "ev_ranking",
    "kg_linking_eval",
    "kg_rdfs",
    "kg_subprop",
    "kg_optional",
    "kg_ntriples",
    "kg_summary",
    "kg_rpq",
]


def _w5(fn_name: str, mod: str, pkg: str = "gliner_spark.operators"):
    """Late-bound single-arg operator loader for the materialized-triples
    bench section (keeps the import block above unchanged)."""
    def run(t):
        m = __import__(f"{pkg}.{mod}", fromlist=[fn_name])
        return getattr(m, fn_name)(t)

    return run


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def spin_probe(procs: int) -> float:
    """Aggregate pure-CPU rate (iters/sec) across `procs` processes — the
    same-run hardware ceiling context for the query timings."""
    n = 3_000_000
    with mp.Pool(procs) as p:
        p.map(_spin, [1000] * procs)  # pool warmup
        t0 = time.time()
        p.map(_spin, [n] * procs)
        return round(procs * n / (time.time() - t0), 0)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spin_before = spin_probe(cpus)

    spark = get_spark(app_name="gliner-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # warm up JVM + python workers once (tiny corpus) so query timings
    # measure steady-state throughput, not process spin-up
    qs["rel_q1"](spark, SF_DIR).count()

    from gliner_spark.cache import release_caches

    samples = {name: [] for name in BENCH_QUERIES}
    counts = {}
    for _ in range(ROUNDS):
        for name in BENCH_QUERIES:
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            counts[name] = df.count()
            samples[name].append(round(time.time() - t0, 3))
            # free branch-point persists: an identical later round would
            # otherwise time a cached scan, not the plan (and leaked
            # caches can be substituted into OTHER queries' subplans)
            release_caches(df)

    extra = {}
    for name in EXTRA_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.count()
        extra[name] = round(time.time() - t0, 3)
        release_caches(df)

    # Graph operators over a PRE-MATERIALIZED triples table (VERDICT r5
    # ask #3): the self-contained kg_* gates above re-run the ~7s
    # extract->link->canonicalize chain per query, conflating chain with
    # operator. Deployment input for the graph family is the materialized
    # base/triples table (q_kg_degree docstring), so time each operator
    # against a saved sf triples parquet — these walls are the operator
    # cost a consumer actually pays. min of 2 reps (same variance
    # discipline as the headline set, cheaper because the ops are fast).
    graph_ops = {}
    try:
        import shutil
        import tempfile

        from gliner_spark.operators.graph_analytics import (
            bfs_distances,
            clustering_coefficients,
            degree_histogram,
            entity_components,
            entity_degrees,
            harmonic_centrality,
            kcore,
            ktruss,
            link_prediction,
            lpa_communities,
            node_similarity,
            pagerank,
            cardinality_constraints,
            entity_provenance,
            partition_modularity,
            schema_profile,
            triangle_counts,
            two_hop_paths,
            wl_colors,
        )
        from gliner_spark.operators.graph_analytics import (
            assortativity,
            distance_profile,
            hits,
            pagerank_weighted,
            pred_association,
            triad_census,
            metapath_counts,
            reciprocity,
            square_counts,
            stress_centrality,
            transitive_closure,
            egonet,
        )
        from pyspark.sql import functions as F

        from gliner_spark.operators.kg_query import conjunctive_match
        from gliner_spark.operators.kg_maintenance import (
            fact_timeline,
            snapshot_diff,
        )
        from gliner_spark.operators.kg_completion import (
            apply_rules,
            cooc_candidates,
            mine_rules,
            negative_samples,
            transe_margin_eval,
            walk_corpus,
        )
        from gliner_spark.operators.kg_fusion import fact_rank, fuse_functional
        from gliner_spark.operators.sketches import hll_distinct

        tdir = tempfile.mkdtemp(prefix="gs_bench_triples_")
        tpath = f"{tdir}/triples.parquet"
        t0 = time.time()
        src = qs["kg_triples"](spark, SF_DIR)
        src.write.mode("overwrite").parquet(tpath)
        release_caches(src)
        graph_ops["materialize_chain"] = round(time.time() - t0, 3)
        mat = spark.read.parquet(tpath)
        graph_op_fns = {
            "degree": entity_degrees,
            "two_hop": two_hop_paths,
            "pagerank": pagerank,
            "pagerank_dangling": lambda t: pagerank(t, dangling=True),
            "ppr": lambda t: pagerank(t, seed_prefix="person:"),
            "components": entity_components,
            "triangles": triangle_counts,
            "clustering": clustering_coefficients,
            "node_similarity": node_similarity,
            "kcore": kcore,
            "link_prediction": link_prediction,
            "bfs": bfs_distances,
            "lpa": lpa_communities,
            "hll": hll_distinct,
            "modularity": partition_modularity,
            "schema": schema_profile,
            "constraints": cardinality_constraints,
            "provenance": entity_provenance,
            "negatives": negative_samples,
            "cooc": cooc_candidates,
            "transe_eval": transe_margin_eval,
            "distmult_eval": lambda t: transe_margin_eval(
                t, scorer="distmult"
            ),
            "metapath": metapath_counts,
            "fusion": fuse_functional,
            "factrank": fact_rank,
            "walks": walk_corpus,
            "truss": ktruss,
            "wl": wl_colors,
            "degree_hist": degree_histogram,
            "harmonic": harmonic_centrality,
            "complex_eval": lambda t: transe_margin_eval(
                t, scorer="complex"
            ),
            "rules": mine_rules,
            "inference": apply_rules,
            "hits": hits,
            "reciprocity": reciprocity,
            "squares": square_counts,
            "stress": stress_centrality,
            "distances": distance_profile,
            "assortativity": assortativity,
            "pred_assoc": pred_association,
            "triads": triad_census,
            "pagerank_weighted": pagerank_weighted,
            "rotate_eval": lambda t: transe_margin_eval(
                t, scorer="rotate"
            ),
            "closure": transitive_closure,
            # rolling windows sized for the default sf0.1 bench corpus
            # (50k docs -> 60%/40% boundaries); at other SF dirs the
            # wall still measures the same two-aggregate + outer-join plan
            "diff": lambda t: snapshot_diff(
                t.filter(
                    F.expr("CAST(substring(doc_id, 5) AS BIGINT)")
                    < 30000
                ),
                t.filter(
                    F.expr("CAST(substring(doc_id, 5) AS BIGINT)")
                    >= 20000
                ),
            ),
            "timeline": fact_timeline,
            "egonet": egonet,
            "conjunctive": lambda t: conjunctive_match(
                t,
                [
                    ("?p", "works_at", "?o"),
                    ("?o", "based_in", "?l"),
                    ("?p", "visited", "?l"),
                ],
            ),
            # wave-5 triples consumers (operator cost without the chain)
            "ranking_eval": _w5("ranking_metrics", "kg_completion"),
            "rdfs_types": _w5("rdfs_types", "ontology"),
            "subproperty": _w5("subproperty_triples", "ontology"),
            "ntriples": _w5("to_ntriples", "sinks.rdf", pkg="gliner_spark"),
            "summary": _w5("summary_graph", "graph_analytics"),
            "rpq": lambda t: __import__(
                "gliner_spark.operators.rpq", fromlist=["rpq_match"]
            ).rpq_match(
                t,
                ("seq", ("plus", ("pred", "acquired")),
                 ("pred", "based_in")),
                5,
            ),
            "optional": lambda t: __import__(
                "gliner_spark.operators.kg_query",
                fromlist=["optional_match"],
            ).optional_match(
                t,
                [("?o", "based_in", "?l")],
                [[("?a", "acquired", "?o")], [("?f", "founded", "?o")]],
            ),
        }
        for name, fn in graph_op_fns.items():
            reps = []
            for _ in range(2):
                t0 = time.time()
                df = fn(mat)
                df.count()
                reps.append(round(time.time() - t0, 3))
                release_caches(df)
            graph_ops[name] = min(reps)
        shutil.rmtree(tdir, ignore_errors=True)
    except Exception as e:  # artifact, not a gate
        graph_ops = {"error": str(e)[:200]}

    # ANN recall artifact (VERDICT r4 ask #4): recall@5 vs the brute-force
    # cosine gate for the PQ family at multiple operating points (m =
    # subspace count -> code bytes/vector; nprobe = coarse cells probed).
    # r6 (VERDICT ask #8): 100 queries x k=5 = 500 gt pairs -> 0.002
    # recall granularity (10 queries gave 0.02 — too coarse to rank
    # operating points). Queries stay broadcast-side: still bounded work.
    NQ = 100
    ann_recall = {}
    try:
        from gliner_spark.operators.similarity import (
            _collect_training_sample,
            _quantized,
            KM_SAMPLE_TARGET,
            cosine_topk,
            ivfpq_topk,
            pq_topk,
            train_kmeans_cells,
            train_pq_codebooks,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        gt = {
            (r.query_id, r.vec_id)
            for r in cosine_topk(emb, n_queries=NQ, k=5).collect()
        }
        qz = _quantized(emb)
        rows_s = _collect_training_sample(qz, KM_SAMPLE_TARGET)

        def _recall(df):
            hits = {(r.query_id, r.vec_id) for r in df.collect()}
            return round(len(hits & gt) / max(len(gt), 1), 3)

        # PQ code-size sweep: the gated default (m=16, k=16 -> 4-bit
        # codes, 8 B/vector) vs byte-code operating points (k=256)
        ann_recall["pq_m16_k16_8B"] = _recall(
            pq_topk(emb, n_queries=NQ, books=train_pq_codebooks(qz, _rows=rows_s))
        )
        big = _collect_training_sample(qz, 2048)
        ann_recall["pq_m8_k256_8B"] = _recall(
            pq_topk(
                emb,
                n_queries=NQ,
                books=train_pq_codebooks(qz, m=8, k=256, iters=4, _rows=big),
            )
        )
        ann_recall["pq_m16_k256_16B"] = _recall(
            pq_topk(
                emb,
                n_queries=NQ,
                books=train_pq_codebooks(qz, m=16, k=256, iters=4, _rows=big),
            )
        )
        # PQ shortlist + exact re-rank (the production refine path)
        from gliner_spark.operators.similarity import pq_refine_topk

        books_d = train_pq_codebooks(qz, _rows=rows_s)
        ann_recall["pq_refine_short50"] = _recall(
            pq_refine_topk(emb, n_queries=NQ, shortlist=50, books=books_d)
        )
        ann_recall["pq_refine_short200"] = _recall(
            pq_refine_topk(emb, n_queries=NQ, shortlist=200, books=books_d)
        )
        # IVF-PQ nprobe sweep at the gated default codebooks
        cells = train_kmeans_cells(qz, _rows=rows_s)
        books = train_pq_codebooks(qz, _rows=rows_s)
        for nprobe in (1, 2, 4):
            ann_recall[f"ivfpq_nprobe{nprobe}"] = _recall(
                ivfpq_topk(emb, n_queries=NQ, nprobe=nprobe, cells=cells, books=books)
            )
        from gliner_spark.operators.similarity import ivfpq_refine_topk

        ann_recall["ivfpq_refine_np4_short50"] = _recall(
            ivfpq_refine_topk(
                emb, n_queries=NQ, shortlist=50, nprobe=4,
                cells=cells, books=books
            )
        )
        # SQ8 (r6): 1 byte/dim scalar quantization — the accuracy/size
        # point between raw vectors and PQ codes
        from gliner_spark.operators.similarity import sq8_topk

        ann_recall["sq8_1B_per_dim"] = _recall(sq8_topk(emb, n_queries=NQ))
    except Exception as e:  # recall is an artifact, not a gate
        ann_recall = {"error": str(e)[:200]}

    spin_after = spin_probe(cpus)

    timings = {n: min(s) for n, s in samples.items()}
    medians = {n: round(statistics.median(s), 3) for n, s in samples.items()}

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
        "legacy8_value": round(sum(timings[n] for n in LEGACY8), 3),
        "extra_queries": extra,
        "graph_ops_materialized": graph_ops,
        "median": medians,
        "ann_recall_at5": ann_recall,
        "spread": samples,
        "rounds": ROUNDS,
        "spin_probe_iters_per_sec": {
            "before": spin_before, "after": spin_after, "procs": cpus,
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
