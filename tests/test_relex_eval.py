"""Relex word-span evaluator (reference evaluator.py:210-255: strict
(rel_label, h_span, t_span) matching)."""

import pytest
from pyspark.sql import functions as F

from gliner_spark.operators.evaluation import relex_prf
from gliner_spark.operators.extraction import extract_triples_with_spans
from gliner_spark.presets import default_model
from gliner_spark.sources.synth import synth_docs

MODEL = default_model()


def test_docred_set_f1_math(spark):
    from gliner_spark.operators.evaluation import docred_prf

    ddl = "doc_id string, source string, relation string, target string"
    pred = spark.createDataFrame(
        [("d1", "a", "r1", "b"), ("d1", "a", "r1", "b"),  # dup collapses
         ("d2", "c", "r2", "d"), ("d2", "x", "r9", "y")], ddl
    )
    gold = spark.createDataFrame(
        [("d1", "a", "r1", "b"), ("d2", "c", "r2", "d"), ("d3", "e", "r3", "f")],
        ddl,
    )
    r = docred_prf(pred, gold).first()
    assert (r.n_pred, r.n_gold, r.tp) == (3, 3, 2)
    assert r.f1 == pytest.approx(2 / 3)
    # global-string-set quirk (reference parity): the same triple string in
    # two docs counts once
    pred2 = spark.createDataFrame([("d1", "a", "r1", "b"), ("d9", "a", "r1", "b")], ddl)
    assert docred_prf(pred2, gold).first().n_pred == 1
    assert docred_prf(pred2, gold, per_doc=True).first().n_pred == 2


def test_squad_em_and_token_f1_math(spark):
    from gliner_spark.operators.evaluation import squad_prf

    pred = spark.createDataFrame(
        [("d1", "alice almeida"), ("d2", "bruno castillo"), ("d3", "keiko sato")],
        "doc_id string, answer string",
    )
    gold = spark.createDataFrame(
        [("d1", "alice almeida"), ("d2", "bruno borisov"), ("d3", "omar ueda")],
        "doc_id string, gold_answer string",
    )
    r = squad_prf(pred, gold).first()
    assert r.n == 3
    assert r.exact_match == pytest.approx(1 / 3, abs=1e-6)
    # d1 f1=1.0; d2: overlap 1 of 2/2 -> f1=0.5; d3: overlap 0 -> 0.0
    assert r.token_f1 == pytest.approx((1.0 + 0.5 + 0.0) / 3, abs=1e-6)


def test_relex_prf_self_and_perturbed(spark):
    docs = synth_docs(spark, 150, partitions=4)
    pred = extract_triples_with_spans(docs, MODEL).persist()
    assert pred.count() > 0

    # self-comparison: exact span+label match everywhere
    row = relex_prf(pred, pred).first()
    assert row.precision == row.recall == row.f1 == 1.0

    # shifting one tail span by a word breaks exactly that tuple
    first = pred.orderBy("doc_id", "h_ws", "t_ws").first()
    shifted = pred.withColumn(
        "t_ws",
        F.when(
            (F.col("doc_id") == first.doc_id)
            & (F.col("h_ws") == first.h_ws)
            & (F.col("t_ws") == first.t_ws)
            & (F.col("pred") == first.pred),
            F.col("t_ws") + 1,
        ).otherwise(F.col("t_ws")),
    )
    row2 = relex_prf(shifted, pred).first()
    assert row2.tp == row.tp - 1
    assert row2.precision < 1.0 and row2.recall < 1.0
