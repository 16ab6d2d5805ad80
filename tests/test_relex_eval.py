"""Relex word-span evaluator (reference evaluator.py:210-255: strict
(rel_label, h_span, t_span) matching)."""

import pytest
from pyspark.sql import functions as F

from gliner_spark.operators.evaluation import relex_prf
from gliner_spark.operators.extraction import extract_triples_with_spans
from gliner_spark.presets import default_model
from gliner_spark.sources.synth import synth_docs

MODEL = default_model()


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
