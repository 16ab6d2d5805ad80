"""clean_corpus: the composed pre-training filter chain (exact dedup ->
lang -> quality -> near-dup) — stage-wise drop accounting + invariants."""

from pyspark.sql import functions as F

from gliner_spark.operators.dedup import exact_dedup, minhash_dedup
from gliner_spark.operators.text_analysis import clean_corpus

DOCS = "/root/testdata/sf0.01/documents.parquet"


def test_clean_corpus_invariants(spark):
    from gliner_spark.cache import release_caches

    docs = spark.read.parquet(DOCS)
    out = clean_corpus(docs)
    rows = out.collect()
    assert 0 < len(rows) < docs.count()  # filters something, keeps something
    # survivors satisfy every stage's predicate
    assert all(r.pred_lang == "en" for r in rows)
    assert all(r.n_tokens >= 5 and r.distinct_ratio >= 0.3 for r in rows)
    ids = {r.doc_id for r in rows}
    # exact-dup losers are gone (only group minima may survive)
    keepers = {r.keep_id for r in exact_dedup(docs).collect()}
    assert ids <= keepers
    # near-dup runs over the SURVIVORS of stages 1-3 (keep-first among
    # survivors): threshold > 1.0 disables the near-dup stage, exposing
    # the pre-neardup survivor set; the final output must equal exactly
    # that set minus the doc_b side of survivor-restricted verified pairs
    pre = clean_corpus(docs, neardup_threshold=1.1)
    pre_ids = {r.doc_id for r in pre.collect()}
    surv_docs = docs.join(
        pre.select("doc_id"), "doc_id", "left_semi"
    )
    pairs = minhash_dedup(surv_docs, threshold=0.5).collect()
    dup_b = {r.doc_b for r in pairs}
    assert ids == pre_ids - dup_b
    # keep-first representative actually in the output unless it is
    # itself the doc_b of another surviving pair
    for r in pairs:
        assert r.doc_a in ids or r.doc_a in dup_b
    # cache handles: every branch-point persist is released on request
    assert release_caches(out) > 0
    assert release_caches(out) == 0  # idempotent
    release_caches(pre)


def test_clean_corpus_deterministic_across_partitionings(spark):
    docs = spark.read.parquet(DOCS)
    a = clean_corpus(docs).collect()
    b = clean_corpus(docs.repartition(11)).collect()
    assert a == b


def test_mixture_sample_rates_and_determinism(spark):
    from gliner_spark.operators.text_analysis import mixture_sample

    docs = spark.read.parquet(DOCS)
    rates = {"src0": (1, 1), "src1": (0, 1)}
    out = mixture_sample(docs, rates, default=(1, 2))
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    assert by_src.get("src0") == 25        # keep-all source: every doc
    assert "src1" not in by_src           # keep-none source: zero docs
    # default 1/2 on the rest: strictly between none and all per source
    for s, n in by_src.items():
        if s != "src0":
            assert 0 < n < 25, (s, n)
    # retry/partitioning invariance — the property sample() lacks
    assert rows == mixture_sample(
        docs.repartition(13), rates, default=(1, 2)
    ).collect()


def test_token_budget_monotone_and_mixture_nested(spark):
    """Property pair, checked over a budget/denominator ladder (driver-side
    over one collected feature table — no per-example Spark jobs):
    - token budget monotonicity: a larger budget selects a SUPERSET;
    - mixture nesting: keep-rate num/den over the same hash is nested in
      num (num+1 keeps a superset) — the property that makes rate changes
      incremental (upsampling adds docs, never swaps them)."""
    from gliner_spark.operators.text_analysis import (
        mixture_sample,
        token_budget_select,
    )

    # NB: unpersist in finally — a leaked cache of this raw scan would make
    # Spark's CacheManager substitute InMemoryRelation for OTHER tests'
    # identical scans (test_plans' pushdown assertions would see no
    # PushedFilters)
    docs = spark.read.parquet(DOCS).persist()
    try:
        prev = set()
        for budget in (100, 300, 700, 1500):
            cur = {
                r.doc_id for r in token_budget_select(docs, budget).collect()
            }
            assert prev <= cur, budget
            prev = cur
        prev = set()
        for num in (1, 2, 3, 5):
            cur = {
                r.doc_id
                for r in mixture_sample(docs, {}, default=(num, 5)).collect()
            }
            assert prev <= cur, num
            prev = cur
    finally:
        docs.unpersist()


def test_token_budget_select_budget_and_order(spark):
    from gliner_spark.operators.text_analysis import token_budget_select

    docs = spark.read.parquet(DOCS)
    out = token_budget_select(docs, 400).collect()
    assert 0 < len(out) < docs.count()
    per_src_max = {}
    for r in out:
        assert r.cum_tokens <= 400
        per_src_max[r.source] = max(per_src_max.get(r.source, 0), r.cum_tokens)
    # selection is the doc_id-ordered PREFIX per source: the next doc
    # (smallest excluded id) must overflow the budget
    by_src_ids = {}
    for r in docs.select("doc_id", "source").collect():
        by_src_ids.setdefault(r.source, []).append(r.doc_id)
    kept = {}
    for r in out:
        kept.setdefault(r.source, set()).add(r.doc_id)
    for s, ids in by_src_ids.items():
        ks = kept.get(s, set())
        prefix = sorted(ids)[: len(ks)]
        assert set(prefix) == ks, s


def test_token_budget_two_phase_equals_single_window(spark):
    """The two-phase prefix sum (bucket totals -> offsets -> local cumsum)
    must be bit-identical to the naive per-source global window it
    replaced, across bucket widths that split sources into many / one /
    per-doc buckets."""
    from pyspark.sql import Window

    from gliner_spark.operators.text_analysis import token_budget_select

    docs = spark.read.parquet(DOCS)
    n = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = sorted(
        docs.select(
            "doc_id",
            "source",
            n.cast("long").alias("n_tokens"),
            F.sum(n).over(w).cast("long").alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= 900)
        .collect()
    )
    for width in (1, 7, 64, 1 << 40):
        got = sorted(token_budget_select(docs, 900, bucket_width=width).collect())
        assert got == ref, width


def test_repetition_stats_brute_force(spark):
    from gliner_spark.operators.text_analysis import repetition_stats

    rows = {
        r.doc_id: r
        for r in repetition_stats(spark.read.parquet(DOCS)).collect()
    }
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(DOCS).select("doc_id", "text").collect()
    }
    import random

    for doc_id in random.Random(5).sample(sorted(texts), 25):
        toks = texts[doc_id].split(" ")
        grams = list(zip(toks, toks[1:], toks[2:]))
        r = rows[doc_id]
        assert r.n_grams == len(grams)
        assert r.n_dup_grams == len(grams) - len(set(grams))
        assert abs(
            r.dup_token_ratio - (len(toks) - len(set(toks))) / len(toks)
        ) < 1e-9
        assert 0.0 <= r.dup_gram_ratio <= 1.0


def test_decontaminate_brute_force(spark):
    """Crafted corpus: doc 14 (benchmark: 14 % 7 == 0) shares an 8-token
    run with training docs 1 and 2; doc 3 shares only a 7-token run (not
    flagged); doc 4 is clean."""
    from pyspark.sql import functions as F

    from gliner_spark.operators.text_analysis import decontaminate

    run8 = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            (14, f"{run8} tail one"),
            (1, f"prefix {run8}"),
            (2, f"{run8} other words here"),
            (3, "a b c d e f g DIFFERENT"),
            (4, "totally unrelated text with many plain words"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_shared_grams for r in decontaminate(docs).collect()}
    # docs 1 and 2 each share exactly the one 8-gram with the benchmark
    assert got == {1: 1, 2: 1}


def test_rarity_stats_brute_force(spark):
    from collections import Counter

    from gliner_spark.operators.text_analysis import rarity_stats

    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    texts = {r.doc_id: r.text for r in docs.collect()}
    df = Counter()
    for t in texts.values():
        df.update(set(t.split(" ")))
    got = {r.doc_id: r for r in rarity_stats(docs).collect()}
    import random

    for doc_id in random.Random(9).sample(sorted(texts), 25):
        toks = set(texts[doc_id].split(" "))
        r = got[doc_id]
        assert r.n_distinct_tokens == len(toks)
        assert r.sum_df == sum(df[t] for t in toks)
        assert r.n_rare == sum(1 for t in toks if df[t] <= 2)


def test_token_budget_auto_width_handles_sparse_ids(spark):
    """bucket_width='auto' sizes buckets from the observed id range, so a
    sparse/offset numeric id space (hash-like ids) still produces a
    bounded offsets table and the identical selection."""
    docs = spark.read.parquet(DOCS)
    want = sorted(
        (r.doc_id, r.cum_tokens)
        for r in __import__(
            "gliner_spark.operators.text_analysis", fromlist=["x"]
        ).token_budget_select(docs, 900).collect()
    )
    sparse = docs.withColumn(
        "doc_id", F.col("doc_id") * 9_000_000_000 + 123_456_789
    )
    from gliner_spark.operators.text_analysis import token_budget_select

    got = sorted(
        ((r.doc_id - 123_456_789) // 9_000_000_000, r.cum_tokens)
        for r in token_budget_select(
            sparse, 900, bucket_width="auto"
        ).collect()
    )
    assert got == want


def test_length_quantiles_brute_force(spark):
    """Exact bounded-domain quantiles vs a python replay: quantile q is
    the smallest length whose cumulative count reaches ceil(q*N/100)."""
    import math

    from gliner_spark.operators.text_analysis import length_quantiles

    docs = spark.read.parquet(DOCS)
    by_src = {}
    for r in docs.select("source", "text").collect():
        by_src.setdefault(r.source, []).append(len(r.text.split(" ")))
    got = {(r.source, r.q): r.value for r in length_quantiles(docs).collect()}
    for src, lens in by_src.items():
        lens.sort()
        for q in (50, 90, 99):
            want = lens[math.ceil(q * len(lens) / 100) - 1]
            assert got[(src, q)] == want, (src, q)
    # every (source, q) pair present
    assert len(got) == len(by_src) * 3


def test_duplicate_clusters_invariants(spark):
    """r5: clusters are the transitive closure of verified pairs, the
    representative is the min doc_id, exactly one keep per cluster."""
    from gliner_spark.cache import release_caches
    from gliner_spark.operators.dedup import duplicate_clusters

    docs = spark.read.parquet(DOCS)
    out = duplicate_clusters(docs, threshold=0.5)
    rows = out.collect()
    release_caches(out)
    assert rows
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for cl, members in by_cluster.items():
        ids = [m.doc_id for m in members]
        assert cl == min(ids)  # representative = min reachable doc_id
        assert len(members) >= 2  # singletons never emitted
        assert sum(m.keep for m in members) == 1
        assert all(m.cluster_size == len(members) for m in members)
    # every verified pair lands in ONE cluster (closure covers the pairs)
    pairs = minhash_dedup(docs, threshold=0.5)
    prows = pairs.collect()
    release_caches(pairs)
    cmap = {r.doc_id: r.cluster for r in rows}
    assert all(cmap[p.doc_a] == cmap[p.doc_b] for p in prows)


def test_bigram_support_exact_counts(spark):
    """r5: corpus-bigram support replayed by hand on a planted corpus."""
    from gliner_spark.operators.text_analysis import bigram_support

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x"), (4, "a b c d")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_support(docs).collect()}
    # corpus bigram counts: "a b"=3, "b c"=2, "c d"=1, "b d"=1
    assert set(got) == {1, 2, 4}  # doc 3 has no bigrams
    assert (got[1].n_bigrams, got[1].support_sum, got[1].n_rare) == (2, 5, 0)
    assert (got[2].n_bigrams, got[2].support_sum, got[2].n_rare) == (2, 4, 1)
    assert (got[4].n_bigrams, got[4].support_sum, got[4].n_rare) == (3, 6, 1)
    assert got[2].rare_ratio == 0.5
    assert got[1].avg_support == 2.5


def test_bigram_support_min_count_pruning(spark):
    """r6 (VERDICT ask #7): min_count=2 pruning is LOSSLESS — a doc
    bigram absent from the pruned count table has corpus count exactly 1
    (the doc itself holds one occurrence), so coalescing to 1 reproduces
    the unpruned numbers bit-for-bit; and the filter is live BEFORE the
    join (min_count above every corpus count -> all bigrams floored to
    rare singletons)."""
    from gliner_spark.operators.text_analysis import bigram_support

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x"), (4, "a b c d")],
        "doc_id long, text string",
    )
    unpruned = sorted(
        bigram_support(docs, min_count=1).collect(), key=lambda r: r.doc_id
    )
    pruned = sorted(
        bigram_support(docs, min_count=2).collect(), key=lambda r: r.doc_id
    )
    assert unpruned == pruned
    # min_count above the max corpus count (3): every bigram pruned ->
    # treated as count-1 rare; proves the filter acts before the join
    floored = bigram_support(docs, min_count=100).collect()
    assert floored and all(
        r.avg_support == 1.0 and r.rare_ratio == 1.0 for r in floored
    )
    # the pruned count table drops the hapax tail in the physical plan
    import re

    p = bigram_support(docs, min_count=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert re.search(r">= 2", p), p[:2000]
