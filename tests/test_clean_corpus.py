"""clean_corpus: the composed pre-training filter chain (exact dedup ->
lang -> quality -> near-dup) — stage-wise drop accounting + invariants."""

from pyspark.sql import functions as F

from gliner_spark.operators.dedup import exact_dedup, minhash_dedup
from gliner_spark.operators.text_analysis import clean_corpus

DOCS = "/root/testdata/sf0.01/documents.parquet"


def test_clean_corpus_invariants(spark):
    docs = spark.read.parquet(DOCS)
    out = clean_corpus(docs).persist()
    rows = out.collect()
    assert 0 < len(rows) < docs.count()  # filters something, keeps something
    # survivors satisfy every stage's predicate
    assert all(r.pred_lang == "en" for r in rows)
    assert all(r.n_tokens >= 5 and r.distinct_ratio >= 0.3 for r in rows)
    ids = {r.doc_id for r in rows}
    # exact-dup losers are gone (only group minima may survive)
    keepers = {r.keep_id for r in exact_dedup(docs).collect()}
    assert ids <= keepers
    # near-dup doc_b's are gone
    dup_b = {r.doc_b for r in minhash_dedup(docs, threshold=0.5).collect()}
    assert not (ids & dup_b)


def test_clean_corpus_deterministic_across_partitionings(spark):
    docs = spark.read.parquet(DOCS)
    a = clean_corpus(docs).collect()
    b = clean_corpus(docs.repartition(11)).collect()
    assert a == b
