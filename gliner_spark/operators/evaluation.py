"""Join-based micro P/R/F1 (reference evaluator semantics).

Mirrors gliner/evaluation/evaluator.py:33-194: exact-match counting of
(key...) tuples, micro-averaged — expressed as joins + counts (SURVEY §2.4),
never a collect.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def micro_prf(pred: DataFrame, gold: DataFrame, keys: List[str]) -> DataFrame:
    """One-row (n_pred, n_gold, tp, precision, recall, f1).

    Exact-match on `keys`, duplicates collapsed (set semantics, matching the
    reference's set-style counting).
    """
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    tp = p.join(g, keys, "inner").count()
    n_pred = p.count()
    n_gold = g.count()
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    spark = pred.sparkSession
    return spark.createDataFrame(
        [(n_pred, n_gold, tp, precision, recall, f1)],
        "n_pred long, n_gold long, tp long, precision double, recall double, f1 double",
    )


def span_prf(pred_mentions: DataFrame, gold_mentions: DataFrame) -> DataFrame:
    """Span micro-F1 on (doc_id, label, start, end) — evaluator.py:132-194."""
    return micro_prf(pred_mentions, gold_mentions, ["doc_id", "label", "start", "end"])


def triple_prf(pred_triples: DataFrame, gold_triples: DataFrame) -> DataFrame:
    """Triple micro-F1 on (doc_id, subj, pred, obj) — evaluator.py:210-255."""
    return micro_prf(pred_triples, gold_triples, ["doc_id", "subj", "pred", "obj"])


def keyword_extractor_prf(docs: DataFrame, set_a: List[str], set_b: List[str]) -> DataFrame:
    """Fully-relational P/R/F1 between two deterministic keyword extractors
    over documents — the oracle-checkable instance of the evaluator operator
    (one dataflow; pred = tokens in set_a, gold = tokens in set_b)."""
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    pred = toks.filter(F.col("tok").isin(set_a))
    gold = toks.filter(F.col("tok").isin(set_b))
    tp = pred.join(gold, ["doc_id", "tok"], "inner").count()
    n_pred, n_gold = pred.count(), gold.count()
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return docs.sparkSession.createDataFrame(
        [(n_pred, n_gold, tp, precision, recall, f1)],
        "n_pred long, n_gold long, tp long, precision double, recall double, f1 double",
    )
