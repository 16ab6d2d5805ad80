"""Deduplication family over documents(doc_id, text):

- exact (hash groupBy)
- MinHash + LSH banding (shingle -> minhash -> band -> bucket join)
- SimHash (bit-plane majority)
- n-gram Jaccard verification
- embedding-cosine near-dup (see operators/similarity.py)

All arithmetic hashing over dense token ids -> exact ANSI-SQL oracles.

Scale notes (100 TB):
- exact dedup is a single hash aggregate (map-side partial) on md5(text) —
  never ships full text twice; at petabyte scale substitute length+md5 to
  cheapen the shuffle key.
- minhash signatures are per-doc aggregates of the exploded token table
  (one shuffle keyed by doc_id — co-partitioned with every other per-doc
  aggregate in this module, so AQE reuses the exchange).
- candidate pairs come only from LSH band-bucket equi-joins (never a cross
  join); oversized buckets are the Zipf/boilerplate skew case -> capped with
  a window count, same defense as operators/linking.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gliner_spark.functions.text import (
    MINHASH_BANDS,
    MINHASH_ROWS,
    P31,
    affine_hash,
    token_ids,
)

MAX_BUCKET = 200  # LSH band-bucket cap (candidate-pair skew guard)


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5(text)."""
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .orderBy("text_hash")
    )


def minhash_signatures(docs: DataFrame, ids: DataFrame = None) -> DataFrame:
    """(doc_id, mh_0..mh_{R-1}) minhash over distinct token ids."""
    if ids is None:
        ids = token_ids(docs).select("doc_id", "token_id").distinct()
    aggs = [
        F.min(affine_hash(F.col("token_id"), j)).alias(f"mh_{j}")
        for j in range(MINHASH_ROWS)
    ]
    return ids.groupBy("doc_id").agg(*aggs)


def _band_buckets(sigs: DataFrame) -> DataFrame:
    per = MINHASH_ROWS // MINHASH_BANDS
    bands = []
    for b in range(MINHASH_BANDS):
        key = F.lit(0).cast("long")
        for j in range(b * per, (b + 1) * per):
            key = (key * 1000003 + F.col(f"mh_{j}")) % F.lit(P31)
        bands.append(F.struct(F.lit(b).alias("band"), key.alias("bkey")))
    return sigs.select(
        "doc_id", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bkey")


def candidate_pairs(docs: DataFrame, ids: DataFrame = None) -> DataFrame:
    """LSH candidate pairs (doc_a < doc_b), dedup'd across bands."""
    buckets = _band_buckets(minhash_signatures(docs, ids=ids))
    w = Window.partitionBy("band", "bkey")
    buckets = (
        buckets.withColumn("n", F.count(F.lit(1)).over(w))
        .filter(F.col("n") <= MAX_BUCKET)
        .drop("n")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_dedup(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs: LSH candidates verified by exact token-set Jaccard.

    The distinct (doc_id, token_id) table feeds four branches (signatures,
    per-doc counts, both sides of the intersection join) — persisted so the
    tokenize+vocab-join subtree runs once; production at corpus scale
    materializes it as a table instead.
    """
    ids = token_ids(docs).select("doc_id", "token_id").distinct().persist()
    pairs = candidate_pairs(docs, ids=ids)
    na = ids.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))

    # intersection via relational join on token_id (oracle-identical plan)
    ta = ids.select(F.col("doc_id").alias("doc_a"), "token_id")
    tb = ids.select(F.col("doc_id").alias("doc_b"), "token_id")
    inter = (
        pairs.join(ta, "doc_a")
        .join(tb, ["doc_b", "token_id"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(na.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_tok", "n_a"), "doc_a")
        .join(na.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_tok", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )
    return out


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Per-doc SimHash: bit b of h(token_id) votes +1/-1; sign -> bit.

    simhash = sum_b [sum_tokens (2*bit_b(h(id)) - 1) > 0] * 2^b
    """
    ids = token_ids(docs).select("doc_id", "token_id")
    h = affine_hash(F.col("token_id"), 7)
    votes = [
        F.sum(
            (F.floor(h / F.lit(1 << b)) % 2 * 2 - 1).cast("long")
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    per_doc = ids.groupBy("doc_id").agg(*votes)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(F.col(f"v_{b}") > 0, F.lit(1 << b)).otherwise(0)
    return per_doc.select("doc_id", sim.alias("simhash")).orderBy("doc_id")


def ngram_jaccard_dedup(
    docs: DataFrame, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """LSH candidates verified by word n-gram (shingle) Jaccard."""
    pairs = candidate_pairs(docs)
    ids = token_ids(docs)
    g1, g2, g3 = ids.alias("g1"), ids.alias("g2"), ids.alias("g3")
    grams = (
        g1.join(
            g2,
            (F.col("g1.doc_id") == F.col("g2.doc_id"))
            & (F.col("g2.pos") == F.col("g1.pos") + 1),
        )
        .join(
            g3,
            (F.col("g1.doc_id") == F.col("g3.doc_id"))
            & (F.col("g3.pos") == F.col("g1.pos") + 2),
        )
        .select(
            F.col("g1.doc_id").alias("doc_id"),
            (
                (((F.col("g1.token_id") * 1009 + F.col("g2.token_id")) % P31) * 1013
                 + F.col("g3.token_id")) % P31
            ).alias("gram"),
        )
        .distinct()
    )
    cnt = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_g"))
    ga = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    gb = grams.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        pairs.join(ga, "doc_a")
        .join(gb, ["doc_b", "gram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(cnt.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_g", "n_a"), "doc_a")
        .join(cnt.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_g", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )
