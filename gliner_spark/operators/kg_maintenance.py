"""KG maintenance operators: snapshot-to-snapshot diffing and temporal
fact versioning — what keeps a continuously-rebuilt graph consumable
(churn auditing, incremental publishing, "what changed since the last
crawl" reports).

- snapshot_diff: fact-level delta between two triple snapshots sharing
  a canonical id space (the invariant the incremental-canonicalization
  path maintains, linking.incremental_canonicalize): added / removed /
  kept status per (subj, pred, obj) with distinct-doc support on both
  sides.
- fact_timeline: per-fact observation window (first/last seen, doc
  support) plus the per-(subj, pred) CURRENT-object flag by recency —
  the temporal resolution a rolling corpus needs where fusion's
  support vote answers the static question.

Reference scope note: urchade/GLiNER emits per-document predictions
(model.py predict_entities); maintaining the accumulated graph across
corpus versions is the beyond-reference pipeline mandate
(SURVEY.md §2.11).

Determinism contract: supports are exact distinct-doc counts; recency
uses the numeric document index with object-string tie-breaks —
bit-replayable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gliner_spark.cache import forward_caches


def _fact_support(triples: DataFrame, suffix: str) -> DataFrame:
    return (
        triples.select("subj", "pred", "obj", "doc_id")
        .distinct()
        .groupBy("subj", "pred", "obj")
        .agg(F.count(F.lit(1)).cast("long").alias(f"n_docs_{suffix}"))
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Fact-level delta between two triple snapshots: one row per
    (subj, pred, obj) present in either side, with status `added`
    (new only), `removed` (old only) or `kept`, distinct-doc support
    on each side, and the support delta. Requires both snapshots to
    share a canonical entity-id space (the contract the incremental
    canonicalization path maintains across corpus versions).

    Shape at scale: two map-side-combined distinct+count aggregates
    and ONE full-outer equi-join on the fact key — work is
    proportional to the union of fact sets, never to the raw
    assertion streams; no windows, no driver state."""
    o = _fact_support(old, "old")
    n = _fact_support(new, "new")
    out = (
        o.join(n, ["subj", "pred", "obj"], "full_outer")
        .select(
            "subj",
            "pred",
            "obj",
            F.when(F.col("n_docs_old").isNull(), "added")
            .when(F.col("n_docs_new").isNull(), "removed")
            .otherwise("kept")
            .alias("status"),
            F.coalesce("n_docs_old", F.lit(0)).alias("n_docs_old"),
            F.coalesce("n_docs_new", F.lit(0)).alias("n_docs_new"),
            (
                F.coalesce("n_docs_new", F.lit(0))
                - F.coalesce("n_docs_old", F.lit(0))
            ).alias("support_delta"),
        )
        .orderBy("subj", "pred", "obj")
    )
    return forward_caches(out, old, new)


def _doc_index(col: str = "doc_id"):
    # "doc-0000000147" -> 147; the synthetic corpus's monotone document
    # index doubles as the observation timestamp (a real deployment
    # passes an actual event-time column through the same expressions)
    return F.expr(f"CAST(substring({col}, 5) AS BIGINT)")


def fact_timeline(triples: DataFrame) -> DataFrame:
    """Temporal fact versioning: per (subj, pred, obj) the observation
    window (first_seen / last_seen document index, distinct-doc
    support) and, per (subj, pred), an `is_current` flag on the object
    most recently asserted (max last_seen; ties break on the LARGEST
    object string so the flag is a pure function of the data). This is
    the recency counterpart to kg_fusion.fuse_functional's support
    vote: a rolling corpus wants "what does the graph say NOW", not
    "what was asserted most often ever".

    Shape at scale: one distinct + grouped aggregate to the fact grain
    (map-side combined), then one window over the (subj, pred) groups
    — bounded by objects-per-fact-key, never corpus-width."""
    facts = (
        triples.select(
            "subj", "pred", "obj", _doc_index().alias("t")
        )
        .distinct()
        .groupBy("subj", "pred", "obj")
        .agg(
            F.min("t").cast("long").alias("first_seen"),
            F.max("t").cast("long").alias("last_seen"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
    )
    w = Window.partitionBy("subj", "pred").orderBy(
        F.desc("last_seen"), F.desc("obj")
    )
    out = (
        facts.withColumn("rn", F.row_number().over(w))
        .select(
            "subj",
            "pred",
            "obj",
            "first_seen",
            "last_seen",
            "n_docs",
            F.when(F.col("rn") == 1, 1).otherwise(0)
            .cast("long")
            .alias("is_current"),
        )
        .orderBy("subj", "pred", "obj")
    )
    return forward_caches(out, triples)
