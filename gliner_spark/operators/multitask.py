"""Multitask pipelines over the extracted-mentions table.

Reference: the GLiNER multitask wrappers re-use the one NER engine for
classification / question answering / summarization / open extraction by
prompt-wrapping the text and post-processing the predicted spans
(gliner/multitask/classification.py:14-180, question_answering.py:14-137,
summarization.py:13-110, open_extraction.py:13-120). The Spark-first
re-expression: the span predictions already live in the mentions table, so
every task head is a RELATIONAL layer over it — pure DataFrame ops, no
second model pass, no UDF:

- classify_docs: predicted class = the type the model marks most in the doc
  (argmax mention count; softmax score over the class-count vector; 'other'
  with score 1.0 when no span is marked — classification.py:129-150);
- answer_question: wh-question -> answer type; answers = that type's spans
  ranked by (score desc, position asc) (question_answering.py:60-75);
- summarize_docs: extractive summary = marked spans joined in start order
  (summarization.py:50-63's exact post-processing).

Every head is oracle-gated (kg_classify / kg_qa / kg_summarize).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CLASSES = ["person", "organization", "location", "date"]

# wh-word -> answer entity type (the deterministic analog of the trained
# model answering "who/where/when/which organization" prompts)
QUESTION_TYPES = {
    "who": "person",
    "where": "location",
    "when": "date",
    "which organization": "organization",
}


def classify_docs(
    mentions: DataFrame,
    docs: DataFrame,
    classes: Optional[List[str]] = None,
) -> DataFrame:
    """(doc_id, label, score): class whose spans the model marks most.

    score = softmax over the per-class mention-count vector (the reference
    softmaxes its candidate scores, classification.py:140-144); docs with
    no marked span get ('other', 1.0) (:135-137)."""
    classes = classes or DEFAULT_CLASSES
    counts = (
        mentions.filter(F.col("label").isin(classes))
        .groupBy("doc_id")
        .pivot("label", classes)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    denom = None
    for c in classes:
        e = F.exp(F.col(c).cast("double"))
        denom = e if denom is None else denom + e
    best_n = F.greatest(*[F.col(c) for c in classes])
    pred = F.lit(None).cast("string")
    for c in reversed(sorted(classes)):  # ties -> lexicographically smallest
        pred = F.when(F.col(c) == best_n, F.lit(c)).otherwise(pred)
    scored = counts.select(
        "doc_id",
        pred.alias("label"),
        F.round(F.exp(best_n.cast("double")) / denom, 6).alias("score"),
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.lit("other")).alias("label"),
            F.coalesce("score", F.lit(1.0)).alias("score"),
        )
        .orderBy("doc_id")
    )


def answer_question(
    mentions: DataFrame, question: str, k: int = 3
) -> DataFrame:
    """(doc_id, answer, score, rank): top-k spans of the question's answer
    type, ranked by score desc then position asc (the reference sorts
    candidate answers by score, question_answering.py:60-67)."""
    q = question.strip().lower()
    qtype = None
    for key, t in QUESTION_TYPES.items():
        if q.startswith(key):
            qtype = t
            break
    if qtype is None:
        raise ValueError(
            f"cannot map question {question!r} to an answer type; "
            f"known prefixes: {sorted(QUESTION_TYPES)}"
        )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("start"), F.asc("end")
    )
    return (
        mentions.filter(F.col("label") == qtype)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("norm").alias("answer"),
            F.round("score", 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("doc_id", "rank")
    )


def summarize_docs(mentions: DataFrame) -> DataFrame:
    """(doc_id, summary): marked spans joined in start order — exactly the
    reference's post-processing (sort by start, join with spaces,
    summarization.py:50-63)."""
    return (
        mentions.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("start", F.col("text")))
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("summary")
        )
        .orderBy("doc_id")
    )
