"""Knowledge-fusion operators over the constructed graph: conflict
resolution and fact ranking — what a consumer runs on the triples table
right before publishing an entity.

- fuse_functional: single-truth selection for conflicting object
  assertions — the knowledge-fusion vote of Dong et al. 2014 (Knowledge
  Vault) / Dong et al. 2009 (truth discovery), reduced to its
  deterministic core: per (subj, pred) with >= 2 distinct asserted
  objects, pick the object with the most distinct supporting documents
  and report how contested the choice was.
- fact_rank: top-m fact selection per entity for entity-card /
  summarization use (the LinkSum / RELIN shape, Thalhammer et al.
  2016): rank a subject's facts by support x inverse predicate
  frequency so rare-predicate, well-attested facts rise above
  boilerplate.

Reference scope note: urchade/GLiNER emits mentions/relations
(model.py predict_entities); fusing the emitted triples into a
publishable graph is the beyond-reference pipeline mandate
(SURVEY.md §2.11).

Determinism contract: votes are exact distinct-doc counts, scores are
integer products with floor-division rarity units, ties break on the
lexicographically smallest object / (pred, obj) — bit-replayable in
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gliner_spark.cache import forward_caches

FUSE_MIN_OBJECTS = 2   # emit only genuinely contested (subj, pred) groups
FACT_TOP_M = 3         # facts kept per entity card
FR_UNIT = 1_000_000    # rarity micro-units (1.0 == 1e6)


def fuse_functional(
    triples: DataFrame, min_objects: int = FUSE_MIN_OBJECTS
) -> DataFrame:
    """Resolve conflicting object assertions per (subj, pred) by
    distinct-document vote.

    For every (subj, pred) carrying at least `min_objects` distinct
    objects, emit the winning object (most distinct supporting docs;
    ties to the lexicographically smallest object) plus the contest
    profile: how many rival objects, the total vote mass, and the
    winner's share in integer permille. Media objects are excluded —
    they are refs, not competing truth claims (same rule as
    cooc_candidates).

    Shape at scale: one distinct-doc vote aggregate on
    (subj, pred, obj), then a window over (subj, pred) whose width is
    the number of DISTINCT objects asserted for one subject-predicate —
    a Zipf-small contest set (rival truth claims, not corpus rows), so
    no cap is needed: the window sorts claims, it never joins them.
    """
    votes = (
        triples.filter(F.col("obj_type") != "media")
        .groupBy("subj", "pred", "obj")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_support"))
    )
    g = Window.partitionBy("subj", "pred")
    w = Window.partitionBy("subj", "pred").orderBy(
        F.desc("n_support"), F.asc("obj")
    )
    out = (
        votes.withColumn("n_objects", F.count(F.lit(1)).over(g).cast("long"))
        .withColumn("total_votes", F.sum("n_support").over(g).cast("long"))
        .withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("rn") == 1) & (F.col("n_objects") >= min_objects)
        )
        .select(
            "subj",
            "pred",
            F.col("obj").alias("obj_fused"),
            "n_support",
            "n_objects",
            "total_votes",
            F.expr("1000 * n_support DIV total_votes").alias(
                "confidence_permille"
            ),
        )
        .orderBy("subj", "pred")
    )
    return forward_caches(out, triples)


def fact_rank(triples: DataFrame, top_m: int = FACT_TOP_M) -> DataFrame:
    """Top-m facts per subject entity for an entity card.

    Score = n_support * (FR_UNIT DIV n_facts(pred)): distinct-doc
    support scaled by inverse predicate frequency (rarity in integer
    micro-units over the DISTINCT-fact count of the predicate), the
    exponent-free core of the tf-idf-style fact ranking entity
    summarizers use (LinkSum's frequency backlink mix) — a
    well-attested rare-predicate fact beats an equally-attested
    boilerplate one. Ties break on (pred, obj) so ranks are total.

    Shape at scale: one vote aggregate on (subj, pred, obj), one tiny
    per-predicate distinct-fact count broadcast back, one window over
    subj whose width is the entity's own fact count (bounded by the
    extractor's per-doc emission, not the corpus).
    """
    facts = triples.groupBy("subj", "pred", "obj").agg(
        F.countDistinct("doc_id").cast("long").alias("n_support")
    )
    predfreq = facts.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_facts_pred")
    )
    w = Window.partitionBy("subj").orderBy(
        F.desc("fact_score"), F.asc("pred"), F.asc("obj")
    )
    out = (
        facts.join(F.broadcast(predfreq), "pred")
        .withColumn("rarity", F.expr(f"{FR_UNIT} DIV n_facts_pred"))
        .withColumn(
            "fact_score",
            (F.col("n_support") * F.col("rarity")).cast("long"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_m)
        .select(
            F.col("subj").alias("entity"),
            F.col("rank").cast("long").alias("rank"),
            "pred",
            "obj",
            "n_support",
            "fact_score",
        )
        .orderBy("entity", "rank")
    )
    return forward_caches(out, triples)
