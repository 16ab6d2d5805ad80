"""Multitask relational heads over the mentions table (reference
gliner/multitask wrappers re-expressed without a second model pass)."""

import pytest
from pyspark.sql import functions as F

from gliner_spark.operators.extraction import extract_graph, mentions_table
from gliner_spark.operators.multitask import (
    answer_question,
    classify_docs,
    summarize_docs,
)
from gliner_spark.presets import default_model
from gliner_spark.sources.synth import synth_docs

MODEL = default_model()


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_docs(spark, 200, partitions=4).persist()
    mentions = mentions_table(extract_graph(docs, MODEL)).persist()
    mentions.count()
    return docs, mentions


def test_classify_covers_every_doc_with_other_default(spark, corpus):
    docs, mentions = corpus
    out = classify_docs(mentions, docs.select("doc_id"))
    assert out.count() == docs.count()
    labels = {r.label for r in out.select("label").distinct().collect()}
    assert labels <= {"person", "organization", "location", "date", "other"}
    others = out.filter(F.col("label") == "other")
    # span-free docs exist in the corpus and must default to ('other', 1.0)
    doc_ids_with = {r.doc_id for r in mentions.select("doc_id").distinct().collect()}
    expect_other = docs.count() - len(doc_ids_with)
    assert others.count() == expect_other
    assert all(r.score == 1.0 for r in others.collect())


def test_classify_argmax_against_counts(spark, corpus):
    docs, mentions = corpus
    out = {r.doc_id: r.label for r in classify_docs(mentions, docs.select("doc_id")).collect()}
    counts = {}
    for r in mentions.groupBy("doc_id", "label").count().collect():
        counts.setdefault(r.doc_id, {})[r.label] = r["count"]
    for doc_id, by_label in counts.items():
        best = max(by_label.values())
        want = min(l for l, c in by_label.items() if c == best)
        assert out[doc_id] == want, (doc_id, by_label)


def test_qa_types_and_ranking(spark, corpus):
    _, mentions = corpus
    out = answer_question(mentions, "who founded the company", k=2)
    rows = out.collect()
    assert rows and all(r.rank in (1, 2) for r in rows)
    # every answer is a person mention of that doc
    persons = {
        (r.doc_id, r.norm) for r in mentions.filter("label = 'person'").collect()
    }
    assert all((r.doc_id, r.answer) in persons for r in rows)
    with pytest.raises(ValueError, match="cannot map question"):
        answer_question(mentions, "how many roads")
    where = answer_question(mentions, "where is it based", k=1).first()
    locs = {r.norm for r in mentions.filter("label = 'location'").collect()}
    assert where.answer in locs


def test_summarize_is_start_ordered_span_join(spark, corpus):
    _, mentions = corpus
    out = {r.doc_id: r.summary for r in summarize_docs(mentions).collect()}
    one = mentions.orderBy("doc_id", "start").collect()
    by_doc = {}
    for r in one:
        by_doc.setdefault(r.doc_id, []).append(r.text)
    for doc_id, texts in by_doc.items():
        assert out[doc_id] == " ".join(texts), doc_id
