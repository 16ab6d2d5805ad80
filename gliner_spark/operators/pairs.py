"""Relational entity-pair construction (SURVEY §2.3 / §3.2).

The reference's build_all_entity_pairs (modeling/utils.py:294-353) is,
relationally, a per-document self-join: all directed (head, tail) pairs
with head != tail. The production path keeps pair building INSIDE the
extraction UDF (the E x E set is per-document and tiny — shipping it
through a shuffle would be pure overhead); this operator is the DataFrame
plan for consumers that want pairs as a table (e.g. distant-supervision
labeling joins), with the same per-doc cap the UDF applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_pair_table(mentions: DataFrame, max_pairs_per_doc: int = 512) -> DataFrame:
    """mentions -> directed pair rows (doc_id, head_idx, tail_idx, head/tail
    surface+type). Self-join on doc_id (equi-join + theta residual); the
    top-sqrt(cap) mention guard mirrors the UDF's bound."""
    keep = int(max_pairs_per_doc ** 0.5) + 1
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("ent_idx"))
    capped = (
        mentions.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= keep)
        .drop("_rk")
    )
    h = capped.select(
        "doc_id",
        F.col("ent_idx").alias("head_idx"),
        F.col("norm").alias("head"),
        F.col("label").alias("head_type"),
    )
    t = capped.select(
        "doc_id",
        F.col("ent_idx").alias("tail_idx"),
        F.col("norm").alias("tail"),
        F.col("label").alias("tail_type"),
    )
    return h.join(t, "doc_id").filter(F.col("head_idx") != F.col("tail_idx"))
